"""HunyuanVideo DiT (hyvideo HYVideoDiffusionTransformer) in Flax.

Functionally equivalent to the model the reference drives via the
HunyuanVideo submodule (models/hunyuan_video.py: double/single blocks with
separate offloaders, get_cu_seqlens varlen attention, 3D RoPE): 20
dual-stream + 40 single-stream blocks at 3072 hidden (24 heads x 128), a
2-block token refiner on the LLaMA text features, CLIP-L pooled + timestep +
(distilled) guidance conditioning, joint attention over [img, txt] with RoPE
on image tokens only and a text validity mask instead of cu_seqlens packing.

Key layout notes for weight conversion: attention qkv are FUSED single
linears (img_attn_qkv / txt_attn_qkv / linear1), per-head RMS qk-norm.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from .layers import (
    LoraDense,
    RMSNorm,
    apply_rope,
    layer_norm_no_affine,
    modulate,
    remat_wrap,
    rope_frequencies,
    sinusoidal_timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class HunyuanVideoConfig:
    in_channels: int = 16
    out_channels: int = 16
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    num_attention_heads: int = 24
    attention_head_dim: int = 128
    num_layers: int = 20          # double blocks
    num_single_layers: int = 40
    mlp_ratio: float = 4.0
    text_dim: int = 4096          # LLaMA hidden
    pooled_projection_dim: int = 768  # CLIP-L
    rope_axes_dim: Tuple[int, ...] = (16, 56, 56)
    rope_theta: float = 256.0
    guidance_embeds: bool = True
    refiner_layers: int = 2
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16
    base_kernel_dtype: Any = None
    int8_matmul: bool = False
    lora_rank: int = 0
    lora_alpha: float = 0.0
    lora_dropout: float = 0.0
    lora_dtype: Any = jnp.float32
    lora_type: str = "lora"
    lokr_factor: int = -1
    lokr_rank_dropout: float = 0.0
    remat: bool = False
    sequence_sharding: bool = False
    # Exact-N blocks_to_swap: the reference runs SEPARATE double/single
    # offloaders with double = N//2, single = (N - N//2)*2 + 1 (reference
    # models/hunyuan_video.py:492-512, same Musubi split as flux). The
    # deepest tail of each stack lives in a "<stack>_swap" scan streamed
    # from host (parallel/offload.py apply_swap_split).
    offload_tail_double: int = 0
    offload_tail_single: int = 0

    @property
    def double_split(self):
        from ..parallel.offload import swap_split_of

        return swap_split_of(self.num_layers, self.offload_tail_double)

    @property
    def single_split(self):
        from ..parallel.offload import swap_split_of

        return swap_split_of(self.num_single_layers,
                             self.offload_tail_single)

    @property
    def hidden_size(self):
        return self.num_attention_heads * self.attention_head_dim

    @property
    def lora_kwargs(self):
        return dict(
            lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            lora_dropout=self.lora_dropout, lora_dtype=self.lora_dtype,
            lora_type=self.lora_type, lokr_factor=self.lokr_factor,
            lokr_rank_dropout=self.lokr_rank_dropout,
        )

    @staticmethod
    def tiny(**kw):
        d = dict(
            num_attention_heads=4, attention_head_dim=32, num_layers=2,
            num_single_layers=2, text_dim=32, pooled_projection_dim=16,
            rope_axes_dim=(8, 12, 12), refiner_layers=1,
            dtype=jnp.float32, param_dtype=jnp.float32,
        )
        d.update(kw)
        return HunyuanVideoConfig(**d)


class TokenRefinerBlock(nn.Module):
    """hyvideo IndividualTokenRefinerBlock: LN + self-attn + LN + MLP with
    per-token gating from (timestep + pooled-context) embedding c."""

    config: HunyuanVideoConfig

    @nn.compact
    def __call__(self, x, c, txt_mask):
        cfg = self.config
        dim = cfg.hidden_size
        heads = cfg.num_attention_heads
        hd = cfg.attention_head_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, s, _ = x.shape

        gates = LoraDense(2 * dim, name="adaLN_linear", **dd)(nn.silu(c))
        gate_msa, gate_mlp = jnp.split(gates, 2, axis=-1)

        scale1 = self.param("norm1_scale", nn.initializers.ones_init(), (dim,),
                            cfg.param_dtype)
        bias1 = self.param("norm1_bias", nn.initializers.zeros_init(), (dim,),
                           cfg.param_dtype)
        y = layer_norm_no_affine(x) * scale1.astype(x.dtype) + bias1.astype(x.dtype)
        qkv = LoraDense(3 * dim, name="self_attn_qkv", **dd)(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, heads, hd)
        k = k.reshape(b, s, heads, hd)
        v = v.reshape(b, s, heads, hd)
        attn = dot_product_attention(q, k, v, txt_mask).reshape(b, s, dim)
        attn = LoraDense(dim, name="self_attn_proj", **dd)(attn)
        x = x + attn * gate_msa[:, None, :]

        scale2 = self.param("norm2_scale", nn.initializers.ones_init(), (dim,),
                            cfg.param_dtype)
        bias2 = self.param("norm2_bias", nn.initializers.zeros_init(), (dim,),
                           cfg.param_dtype)
        y = layer_norm_no_affine(x) * scale2.astype(x.dtype) + bias2.astype(x.dtype)
        y = LoraDense(int(dim * cfg.mlp_ratio), name="mlp_in", **dd)(y)
        y = nn.silu(y)
        y = LoraDense(dim, name="mlp_out", **dd)(y)
        return x + y * gate_mlp[:, None, :]


class HunyuanDoubleBlock(nn.Module):
    config: HunyuanVideoConfig

    @nn.compact
    def __call__(self, carry, vec, rope_cos, rope_sin, txt_mask):
        img, txt = carry
        cfg = self.config
        dim = cfg.hidden_size
        heads = cfg.num_attention_heads
        hd = cfg.attention_head_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  kernel_dtype=cfg.base_kernel_dtype,
                  int8_matmul=cfg.int8_matmul)
        lora = cfg.lora_kwargs
        b, si = img.shape[:2]
        st = txt.shape[1]

        img_mod = LoraDense(6 * dim, name="img_mod", **dd, **lora)(nn.silu(vec))
        txt_mod = LoraDense(6 * dim, name="txt_mod", **dd, **lora)(nn.silu(vec))
        (i_s1, i_sc1, i_g1, i_s2, i_sc2, i_g2) = jnp.split(img_mod, 6, -1)
        (t_s1, t_sc1, t_g1, t_s2, t_sc2, t_g2) = jnp.split(txt_mod, 6, -1)

        img_n = modulate(layer_norm_no_affine(img), i_s1, i_sc1)
        txt_n = modulate(layer_norm_no_affine(txt), t_s1, t_sc1)

        iqkv = LoraDense(3 * dim, name="img_attn_qkv", **dd, **lora)(img_n)
        iq, ik, iv = [u.reshape(b, si, heads, hd)
                      for u in jnp.split(iqkv, 3, -1)]
        iq = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="img_attn_q_norm")(iq)
        ik = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="img_attn_k_norm")(ik)
        iq = apply_rope(iq, rope_cos, rope_sin)
        ik = apply_rope(ik, rope_cos, rope_sin)

        tqkv = LoraDense(3 * dim, name="txt_attn_qkv", **dd, **lora)(txt_n)
        tq, tk, tv = [u.reshape(b, st, heads, hd)
                      for u in jnp.split(tqkv, 3, -1)]
        tq = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="txt_attn_q_norm")(tq)
        tk = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="txt_attn_k_norm")(tk)

        # joint attention, IMG FIRST then TXT (hyvideo order)
        q = jnp.concatenate([iq, tq], axis=1)
        k = jnp.concatenate([ik, tk], axis=1)
        v = jnp.concatenate([iv, tv], axis=1)
        kv_mask = None
        if txt_mask is not None:
            kv_mask = jnp.concatenate(
                [jnp.ones((b, si), jnp.int32), txt_mask.astype(jnp.int32)], 1
            )
        attn = dot_product_attention(q, k, v, kv_mask).reshape(b, si + st, dim)
        img_attn, txt_attn = attn[:, :si], attn[:, si:]

        img = img + i_g1[:, None] * LoraDense(
            dim, name="img_attn_proj", **dd, **lora
        )(img_attn)
        y = modulate(layer_norm_no_affine(img), i_s2, i_sc2)
        y = LoraDense(int(dim * cfg.mlp_ratio), name="img_mlp_fc1", **dd,
                      **lora)(y)
        y = nn.gelu(y, approximate=True)
        img = img + i_g2[:, None] * LoraDense(
            dim, name="img_mlp_fc2", **dd, **lora
        )(y)

        txt = txt + t_g1[:, None] * LoraDense(
            dim, name="txt_attn_proj", **dd, **lora
        )(txt_attn)
        y = modulate(layer_norm_no_affine(txt), t_s2, t_sc2)
        y = LoraDense(int(dim * cfg.mlp_ratio), name="txt_mlp_fc1", **dd,
                      **lora)(y)
        y = nn.gelu(y, approximate=True)
        txt = txt + t_g2[:, None] * LoraDense(
            dim, name="txt_mlp_fc2", **dd, **lora
        )(y)
        return (img, txt), None


class HunyuanSingleBlock(nn.Module):
    config: HunyuanVideoConfig
    img_len: int = 0

    @nn.compact
    def __call__(self, x, vec, rope_cos, rope_sin, kv_mask):
        img_len = self.img_len
        cfg = self.config
        dim = cfg.hidden_size
        heads = cfg.num_attention_heads
        hd = cfg.attention_head_dim
        mlp_dim = int(dim * cfg.mlp_ratio)
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  kernel_dtype=cfg.base_kernel_dtype,
                  int8_matmul=cfg.int8_matmul)
        lora = cfg.lora_kwargs
        b, s = x.shape[:2]

        mod = LoraDense(3 * dim, name="modulation", **dd, **lora)(nn.silu(vec))
        shift, scale, gate = jnp.split(mod, 3, -1)
        x_n = modulate(layer_norm_no_affine(x), shift, scale)

        y = LoraDense(3 * dim + mlp_dim, name="linear1", **dd, **lora)(x_n)
        qkv, mlp = y[..., : 3 * dim], y[..., 3 * dim :]
        q, k, v = [u.reshape(b, s, heads, hd) for u in jnp.split(qkv, 3, -1)]
        q = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="q_norm")(q)
        k = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="k_norm")(k)
        # rope on image tokens only ([img, txt] order)
        qi = apply_rope(q[:, :img_len], rope_cos, rope_sin)
        ki = apply_rope(k[:, :img_len], rope_cos, rope_sin)
        q = jnp.concatenate([qi, q[:, img_len:]], axis=1)
        k = jnp.concatenate([ki, k[:, img_len:]], axis=1)
        attn = dot_product_attention(q, k, v, kv_mask).reshape(b, s, dim)
        y = LoraDense(dim, name="linear2", **dd, **lora)(
            jnp.concatenate([attn, nn.gelu(mlp, approximate=True)], axis=-1)
        )
        return x + gate[:, None] * y, None


class HunyuanVideoTransformer(nn.Module):
    config: HunyuanVideoConfig

    @nn.compact
    def __call__(
        self,
        x,            # [B, C, F, H, W] latents
        t,            # [B] in [0, 1000]
        text_states,  # [B, S, text_dim] LLaMA hidden states (template-cropped)
        text_mask,    # [B, S] validity
        pooled,       # [B, pooled_projection_dim] CLIP-L pooled
        guidance=None,  # [B] (distilled guidance, *1000)
    ):
        cfg = self.config
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, c, f, h, w = x.shape
        pt, ph, pw = cfg.patch_size
        gf, gh, gw = f // pt, h // ph, w // pw
        img_len = gf * gh * gw

        # patchify via conv
        xe = jnp.transpose(x, (0, 2, 3, 4, 1)).astype(cfg.dtype)
        xe = nn.Conv(dim, cfg.patch_size, strides=cfg.patch_size,
                     padding="VALID", dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype, name="img_in")(xe)
        img = xe.reshape(b, img_len, dim)
        from .layers import seq_shard

        img = seq_shard(img, cfg.sequence_sharding)

        # conditioning vector: timestep + guidance + pooled text
        temb = sinusoidal_timestep_embedding(t.astype(jnp.float32), 256)
        vec = LoraDense(dim, name="time_in_1", **dd)(temb.astype(cfg.dtype))
        vec = LoraDense(dim, name="time_in_2", **dd)(nn.silu(vec))
        pv = LoraDense(dim, name="vector_in_1", **dd)(pooled.astype(cfg.dtype))
        pv = LoraDense(dim, name="vector_in_2", **dd)(nn.silu(pv))
        vec = vec + pv
        if cfg.guidance_embeds and guidance is not None:
            ge = sinusoidal_timestep_embedding(guidance.astype(jnp.float32), 256)
            g = LoraDense(dim, name="guidance_in_1", **dd)(ge.astype(cfg.dtype))
            g = LoraDense(dim, name="guidance_in_2", **dd)(nn.silu(g))
            vec = vec + g

        # token refiner on text (time + masked-mean-pooled text conditioning)
        txt = LoraDense(dim, name="txt_in_proj", **dd)(
            text_states.astype(cfg.dtype)
        )
        tm = text_mask.astype(jnp.float32)
        pooled_txt = jnp.sum(
            text_states.astype(jnp.float32) * tm[..., None], axis=1
        ) / jnp.maximum(jnp.sum(tm, axis=1, keepdims=True), 1.0)
        rc = LoraDense(dim, name="refiner_t_embed_1", **dd)(
            sinusoidal_timestep_embedding(t.astype(jnp.float32), 256).astype(
                cfg.dtype
            )
        )
        rc = LoraDense(dim, name="refiner_t_embed_2", **dd)(nn.silu(rc))
        rp = LoraDense(dim, name="refiner_c_embed_1", **dd)(
            pooled_txt.astype(cfg.dtype)
        )
        rp = LoraDense(dim, name="refiner_c_embed_2", **dd)(nn.silu(rp))
        refiner_c = rc + rp
        for i in range(cfg.refiner_layers):
            txt = TokenRefinerBlock(cfg, name=f"refiner_{i}")(
                txt, refiner_c, text_mask
            )

        # rope over the (f, h, w) grid
        fi = jnp.repeat(jnp.arange(gf), gh * gw)
        hi = jnp.tile(jnp.repeat(jnp.arange(gh), gw), gf)
        wi = jnp.tile(jnp.arange(gw), gf * gh)
        ids = jnp.stack([fi, hi, wi], axis=-1)
        rope_cos, rope_sin = rope_frequencies(
            ids, cfg.rope_axes_dim, cfg.rope_theta
        )

        from ..parallel.offload import apply_swap_split

        def _scan(b_cls, length, name, streamed, *mod_args):
            b_ = b_cls
            if streamed:
                from ..parallel.offload import stream_params_from_host

                b_ = stream_params_from_host(b_)
            if cfg.remat:
                b_ = remat_wrap(b_, cfg.remat)
            return nn.scan(
                b_,
                variable_axes={"params": 0}, split_rngs={"params": True},
                in_axes=nn.broadcast, length=length,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )(cfg, *mod_args, name=name)

        def apply_double(carry, length, name, streamed):
            carry, _ = _scan(HunyuanDoubleBlock, length, name, streamed)(
                carry, vec, rope_cos, rope_sin, text_mask)
            return carry

        # exact-N blocks_to_swap: the deepest tail of each stack streams
        # from host in a "<stack>_swap" scan (reference dual offloaders,
        # models/hunyuan_video.py:508-512)
        img, txt = apply_swap_split(
            (img, txt), cfg.double_split, apply_double,
            base="double_blocks")

        xcat = jnp.concatenate([img, txt], axis=1)
        kv_mask = jnp.concatenate(
            [jnp.ones((b, img_len), jnp.int32), text_mask.astype(jnp.int32)], 1
        )

        def apply_single(carry, length, name, streamed):
            carry, _ = _scan(HunyuanSingleBlock, length, name, streamed,
                             img_len)(
                carry, vec, rope_cos, rope_sin, kv_mask)
            return carry

        xcat = apply_swap_split(
            xcat, cfg.single_split, apply_single, base="single_blocks")
        img = xcat[:, :img_len]

        # final adaLN head
        mod = LoraDense(2 * dim, name="final_mod", **dd)(nn.silu(vec))
        shift, scale = jnp.split(mod, 2, -1)
        img = modulate(layer_norm_no_affine(img), shift, scale)
        out = LoraDense(pt * ph * pw * cfg.out_channels, name="final_linear",
                        dtype=jnp.float32, param_dtype=cfg.param_dtype)(img)
        out = out.reshape(b, gf, gh, gw, pt, ph, pw, cfg.out_channels)
        out = jnp.einsum("bfhwpqrc->bcfphqwr", out)
        return out.reshape(b, cfg.out_channels, gf * pt, gh * ph, gw * pw)
