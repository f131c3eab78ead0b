"""Chroma DiT (lodestones flow `Chroma`) in Flax.

Flux-schnell-derived architecture the reference drives via the `flow`
submodule (models/chroma.py): no CLIP/pooled branch and no guidance embed;
ALL adaLN modulation vectors come from one small "distilled guidance"
Approximator MLP instead of per-block linears. T5 padding is masked in
attention (reference chroma.py "masked attention from T5 padding").

Approximator: for each modulation slot i in [0, mod_index_length), input =
concat(timestep_proj(16), guidance_proj(16), index_proj(32)) -> in_dim 64,
then n_layers=5 residual MLP at hidden 5120 -> 3072 per slot.

Slot layout (flow repo distribute_modulations): single blocks first
(3 per block), then double blocks (6 img + 6 txt per block), then the final
layer (2). Verify against pretrained weights before relying on converted
checkpoints.
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
    remat_wrap,
    rope_frequencies,
    sinusoidal_timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class ChromaConfig:
    in_channels: int = 64
    out_channels: int = 64
    num_layers: int = 19
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    rope_theta: float = 10000.0
    mlp_ratio: float = 4.0
    approximator_in_dim: int = 64
    approximator_hidden: int = 5120
    approximator_layers: int = 5
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

    @property
    def hidden_size(self):
        return self.num_attention_heads * self.attention_head_dim

    @property
    def mod_index_length(self):
        return 3 * self.num_single_layers + 12 * self.num_layers + 2

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
            num_layers=2, num_single_layers=2, attention_head_dim=32,
            num_attention_heads=4, joint_attention_dim=64,
            axes_dims_rope=(8, 12, 12), approximator_hidden=64,
            approximator_layers=2, dtype=jnp.float32, param_dtype=jnp.float32,
        )
        d.update(kw)
        return ChromaConfig(**d)


class Approximator(nn.Module):
    config: ChromaConfig

    @nn.compact
    def __call__(self, timestep, guidance):
        """timestep/guidance: [B] -> [B, mod_index_length, hidden]."""
        cfg = self.config
        dim = cfg.hidden_size
        n = cfg.mod_index_length
        b = timestep.shape[0]
        t_emb = sinusoidal_timestep_embedding(
            timestep.astype(jnp.float32) * 1000.0, 16
        )
        g_emb = sinusoidal_timestep_embedding(
            guidance.astype(jnp.float32) * 1000.0, 16
        )
        idx_emb = sinusoidal_timestep_embedding(
            jnp.arange(n, dtype=jnp.float32), 32
        )  # [n, 32]
        tg = jnp.concatenate([t_emb, g_emb], axis=-1)  # [B, 32]
        inp = jnp.concatenate(
            [jnp.broadcast_to(tg[:, None], (b, n, 32)),
             jnp.broadcast_to(idx_emb[None], (b, n, 32))],
            axis=-1,
        )
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        # flow Approximator: x = in_proj(inp); per layer
        # x = x + MLPEmbedder(norms[i](x)) with MLPEmbedder =
        # out_layer(silu(in_layer(.))); then out_proj (no final norm)
        h = LoraDense(cfg.approximator_hidden, name="in_proj", **dd)(
            inp.astype(cfg.dtype)
        )
        for i in range(cfg.approximator_layers):
            xn = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                         name=f"norms_{i}")(h)
            y = LoraDense(cfg.approximator_hidden, name=f"layers_{i}_in",
                          **dd)(xn)
            y = LoraDense(cfg.approximator_hidden, name=f"layers_{i}_out",
                          **dd)(nn.silu(y))
            h = h + y
        return LoraDense(dim, name="out_proj", **dd)(h)


def _mod(vec, shift, scale):
    return vec * (1.0 + scale[:, None, :]) + shift[:, None, :]


class ChromaDoubleBlock(nn.Module):
    config: ChromaConfig

    @nn.compact
    def __call__(self, carry, mods, rope_cos, rope_sin, txt_mask):
        """mods: [B, 12, D]: img(shift,scale,gate x2), txt(same)."""
        img, txt = carry
        cfg = self.config
        dim = cfg.hidden_size
        heads = cfg.num_attention_heads
        hd = cfg.attention_head_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  kernel_dtype=cfg.base_kernel_dtype,
                  int8_matmul=cfg.int8_matmul)
        lora = cfg.lora_kwargs

        (i_s1, i_c1, i_g1, i_s2, i_c2, i_g2,
         t_s1, t_c1, t_g1, t_s2, t_c2, t_g2) = [mods[:, i] for i in range(12)]

        img_n = _mod(layer_norm_no_affine(img), i_s1, i_c1)
        txt_n = _mod(layer_norm_no_affine(txt), t_s1, t_c1)

        def qkv(x, prefix):
            q = LoraDense(dim, name=f"{prefix}_q", **dd, **lora)(x)
            k = LoraDense(dim, name=f"{prefix}_k", **dd, **lora)(x)
            v = LoraDense(dim, name=f"{prefix}_v", **dd, **lora)(x)
            b, s = x.shape[:2]
            qh = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                         name=f"{prefix}_norm_q")(q.reshape(b, s, heads, hd))
            kh = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                         name=f"{prefix}_norm_k")(k.reshape(b, s, heads, hd))
            return qh, kh, v.reshape(b, s, heads, hd)

        iq, ik, iv = qkv(img_n, "attn_to")
        tq, tk, tv = qkv(txt_n, "attn_add")
        q = jnp.concatenate([tq, iq], axis=1)
        k = jnp.concatenate([tk, ik], axis=1)
        v = jnp.concatenate([tv, iv], axis=1)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        kv_mask = None
        if txt_mask is not None:
            kv_mask = jnp.concatenate(
                [txt_mask.astype(jnp.int32),
                 jnp.ones((img.shape[0], img.shape[1]), jnp.int32)], axis=1
            )
        attn = dot_product_attention(q, k, v, kv_mask)
        b, s = attn.shape[:2]
        attn = attn.reshape(b, s, dim)
        txt_len = txt.shape[1]
        txt_attn, img_attn = attn[:, :txt_len], attn[:, txt_len:]

        img = img + i_g1[:, None] * LoraDense(dim, name="attn_to_out", **dd,
                                              **lora)(img_attn)
        y = _mod(layer_norm_no_affine(img), i_s2, i_c2)
        y = LoraDense(int(dim * cfg.mlp_ratio), name="ff_in", **dd, **lora)(y)
        y = nn.gelu(y, approximate=True)
        img = img + i_g2[:, None] * LoraDense(dim, name="ff_out", **dd,
                                              **lora)(y)

        txt = txt + t_g1[:, None] * LoraDense(dim, name="attn_to_add_out",
                                              **dd, **lora)(txt_attn)
        y = _mod(layer_norm_no_affine(txt), t_s2, t_c2)
        y = LoraDense(int(dim * cfg.mlp_ratio), name="ff_context_in", **dd,
                      **lora)(y)
        y = nn.gelu(y, approximate=True)
        txt = txt + t_g2[:, None] * LoraDense(dim, name="ff_context_out", **dd,
                                              **lora)(y)
        return (img, txt), None


class ChromaSingleBlock(nn.Module):
    config: ChromaConfig

    @nn.compact
    def __call__(self, x, mods, rope_cos, rope_sin, kv_mask):
        """mods: [B, 3, D] (shift, scale, gate)."""
        cfg = self.config
        dim = cfg.hidden_size
        heads = cfg.num_attention_heads
        hd = cfg.attention_head_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  kernel_dtype=cfg.base_kernel_dtype,
                  int8_matmul=cfg.int8_matmul)
        lora = cfg.lora_kwargs
        b, s = x.shape[:2]

        shift, scale, gate = mods[:, 0], mods[:, 1], mods[:, 2]
        x_n = _mod(layer_norm_no_affine(x), shift, scale)
        q = LoraDense(dim, name="attn_to_q", **dd, **lora)(x_n)
        k = LoraDense(dim, name="attn_to_k", **dd, **lora)(x_n)
        v = LoraDense(dim, name="attn_to_v", **dd, **lora)(x_n)
        q = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="attn_norm_q")(q.reshape(b, s, heads, hd))
        k = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="attn_norm_k")(k.reshape(b, s, heads, hd))
        v = v.reshape(b, s, heads, hd)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        attn = dot_product_attention(q, k, v, kv_mask).reshape(b, s, dim)
        mlp = LoraDense(int(dim * cfg.mlp_ratio), name="proj_mlp", **dd,
                        **lora)(x_n)
        mlp = nn.gelu(mlp, approximate=True)
        out = LoraDense(dim, name="proj_out", **dd, **lora)(
            jnp.concatenate([attn, mlp], axis=-1)
        )
        return x + gate[:, None] * out, None


class ChromaTransformer(nn.Module):
    config: ChromaConfig

    @nn.compact
    def __call__(self, hidden_states, encoder_hidden_states, timestep,
                 img_ids, txt_ids, guidance=None, txt_mask=None,
                 img_seq_len: Optional[int] = None):
        cfg = self.config
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b = hidden_states.shape[0]

        img = LoraDense(dim, name="x_embedder", **dd)(
            hidden_states.astype(cfg.dtype)
        )
        txt = LoraDense(dim, name="context_embedder", **dd)(
            encoder_hidden_states.astype(cfg.dtype)
        )
        if guidance is None:
            guidance = jnp.zeros((b,), jnp.float32)
        mod_vectors = Approximator(cfg, name="distilled_guidance_layer")(
            timestep, guidance
        )  # [B, n, D]

        ns, nd = cfg.num_single_layers, cfg.num_layers
        single_mods = mod_vectors[:, : 3 * ns].reshape(b, ns, 3, dim)
        double_mods = mod_vectors[:, 3 * ns : 3 * ns + 12 * nd].reshape(
            b, nd, 12, dim
        )
        final_mods = mod_vectors[:, -2:]

        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        rope_cos, rope_sin = rope_frequencies(
            ids, cfg.axes_dims_rope, cfg.rope_theta
        )

        dblock, sblock = ChromaDoubleBlock, ChromaSingleBlock
        if cfg.remat:
            dblock = remat_wrap(dblock, cfg.remat)
            sblock = remat_wrap(sblock, cfg.remat)
        (img, txt), _ = nn.scan(
            dblock, variable_axes={"params": 0}, split_rngs={"params": True},
            in_axes=(1, nn.broadcast, nn.broadcast, nn.broadcast),
            length=nd, metadata_params={nn.PARTITION_NAME: "layers"},
        )(cfg, name="double_blocks")((img, txt), double_mods, rope_cos,
                                     rope_sin, txt_mask)

        x = jnp.concatenate([txt, img], axis=1)
        kv_mask = None
        if txt_mask is not None:
            kv_mask = jnp.concatenate(
                [txt_mask.astype(jnp.int32),
                 jnp.ones((img.shape[0], img.shape[1]), jnp.int32)], axis=1
            )
        x, _ = nn.scan(
            sblock, variable_axes={"params": 0}, split_rngs={"params": True},
            in_axes=(1, nn.broadcast, nn.broadcast, nn.broadcast),
            length=ns, metadata_params={nn.PARTITION_NAME: "layers"},
        )(cfg, name="single_blocks")(x, single_mods, rope_cos, rope_sin,
                                     kv_mask)

        txt_len = txt.shape[1]
        out = x[:, txt_len:]
        if img_seq_len is not None:
            out = out[:, :img_seq_len]
        shift, scale = final_mods[:, 0], final_mods[:, 1]
        out = _mod(layer_norm_no_affine(out), shift, scale)
        return LoraDense(cfg.out_channels, name="proj_out", **dd)(out)
