"""SD3 / SD3.5 MMDiT (diffusers SD3Transformer2DModel) in Flax.

Joint text+image dual-stream blocks like flux's double blocks but with a
cropped fixed 2D sincos position embedding instead of RoPE, optional qk
RMS-norm (SD3.5), and a context_pre_only final block whose text stream has
no output path. Driven by the reference as layer wrappers
(models/sd3.py:179-249); inputs follow that contract:
(latents NCHW, t*1000, prompt_embeds [B,S,4096], pooled [B,2048]).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention
from .layers import (
    LoraDense,
    PixArtAlphaTextProjection,
    RMSNorm,
    TimestepEmbedder,
    layer_norm_no_affine,
    modulate,
    remat_wrap,
)


@dataclasses.dataclass(frozen=True)
class SD3Config:
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    num_layers: int = 24
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    pooled_projection_dim: int = 2048
    pos_embed_max_size: int = 192
    sample_size: int = 128
    qk_norm: bool = False           # True for SD3.5
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
    def hidden_size(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def num_scan_layers(self) -> int:
        """Blocks in the scan stack (the last joint block is separate,
        context_pre_only)."""
        return self.num_layers - 1

    @property
    def lora_kwargs(self) -> dict:
        return dict(
            lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            lora_dropout=self.lora_dropout, lora_dtype=self.lora_dtype,
            lora_type=self.lora_type, lokr_factor=self.lokr_factor,
            lokr_rank_dropout=self.lokr_rank_dropout,
        )

    @staticmethod
    def tiny(**kw):
        d = dict(
            num_layers=2, attention_head_dim=16, num_attention_heads=4,
            joint_attention_dim=64, pooled_projection_dim=32,
            pos_embed_max_size=32, sample_size=16,
            dtype=jnp.float32, param_dtype=jnp.float32,
        )
        d.update(kw)
        return SD3Config(**d)


def sincos_2d_pos_embed(embed_dim: int, grid_size: int, base_size: int):
    """diffusers get_2d_sincos_pos_embed (interpolation_scale=1): first half
    from the w index, second half from the h index, row-major (h, w)."""
    pos = np.arange(grid_size, dtype=np.float64) / (grid_size / base_size)
    wg, hg = np.meshgrid(pos, pos)  # both [gh, gw], w varies along columns

    def embed_1d(dim, p):
        omega = 1.0 / 10000 ** (np.arange(dim // 2, dtype=np.float64) / (dim / 2.0))
        out = np.einsum("m,d->md", p.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb = np.concatenate(
        [embed_1d(embed_dim // 2, wg), embed_1d(embed_dim // 2, hg)], axis=1
    )
    return emb.astype(np.float32)  # [grid*grid, D]


class SD3JointBlock(nn.Module):
    config: SD3Config
    context_pre_only: bool = False

    @nn.compact
    def __call__(self, carry, temb):
        img, txt = carry
        cfg = self.config
        dim = cfg.hidden_size
        heads = cfg.num_attention_heads
        hd = cfg.attention_head_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  kernel_dtype=cfg.base_kernel_dtype,
                  int8_matmul=cfg.int8_matmul)
        lora = cfg.lora_kwargs

        mod_img = LoraDense(6 * dim, name="norm1_linear", **dd, **lora)(
            nn.silu(temb)
        )
        (i_shift, i_scale, i_gate, i_shift_mlp, i_scale_mlp,
         i_gate_mlp) = jnp.split(mod_img, 6, axis=-1)
        if self.context_pre_only:
            mod_txt = LoraDense(2 * dim, name="norm1_context_linear", **dd,
                                **lora)(nn.silu(temb))
            t_scale, t_shift = jnp.split(mod_txt, 2, axis=-1)
            txt_n = modulate(layer_norm_no_affine(txt), t_shift, t_scale)
        else:
            mod_txt = LoraDense(6 * dim, name="norm1_context_linear", **dd,
                                **lora)(nn.silu(temb))
            (t_shift, t_scale, t_gate, t_shift_mlp, t_scale_mlp,
             t_gate_mlp) = jnp.split(mod_txt, 6, axis=-1)
            txt_n = modulate(layer_norm_no_affine(txt), t_shift, t_scale)
        img_n = modulate(layer_norm_no_affine(img), i_shift, i_scale)

        def qkv(x, prefix):
            q = LoraDense(dim, name=f"{prefix}_q", kernel_axes=(None, "tensor"),
                          **dd, **lora)(x)
            k = LoraDense(dim, name=f"{prefix}_k", kernel_axes=(None, "tensor"),
                          **dd, **lora)(x)
            v = LoraDense(dim, name=f"{prefix}_v", kernel_axes=(None, "tensor"),
                          **dd, **lora)(x)
            b, s = x.shape[:2]
            qh = q.reshape(b, s, heads, hd)
            kh = k.reshape(b, s, heads, hd)
            vh = v.reshape(b, s, heads, hd)
            if cfg.qk_norm:
                qh = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                             name=f"{prefix}_norm_q")(qh)
                kh = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                             name=f"{prefix}_norm_k")(kh)
            return qh, kh, vh

        iq, ik, iv = qkv(img_n, "attn_to")
        tq, tk, tv = qkv(txt_n, "attn_add")
        q = jnp.concatenate([tq, iq], axis=1)
        k = jnp.concatenate([tk, ik], axis=1)
        v = jnp.concatenate([tv, iv], axis=1)
        attn = dot_product_attention(q, k, v)
        b, s = attn.shape[:2]
        attn = attn.reshape(b, s, dim)
        txt_len = txt.shape[1]
        txt_attn, img_attn = attn[:, :txt_len], attn[:, txt_len:]

        img_attn = LoraDense(dim, name="attn_to_out",
                             kernel_axes=("tensor", None), **dd, **lora)(img_attn)
        img = img + i_gate[:, None, :] * img_attn
        img_m = modulate(layer_norm_no_affine(img), i_shift_mlp, i_scale_mlp)
        img_m = LoraDense(4 * dim, name="ff_in", kernel_axes=(None, "tensor"),
                          **dd, **lora)(img_m)
        img_m = nn.gelu(img_m, approximate=True)
        img_m = LoraDense(dim, name="ff_out", kernel_axes=("tensor", None),
                          **dd, **lora)(img_m)
        img = img + i_gate_mlp[:, None, :] * img_m

        if not self.context_pre_only:
            txt_attn = LoraDense(dim, name="attn_to_add_out",
                                 kernel_axes=("tensor", None), **dd, **lora)(
                txt_attn
            )
            txt = txt + t_gate[:, None, :] * txt_attn
            txt_m = modulate(
                layer_norm_no_affine(txt), t_shift_mlp, t_scale_mlp
            )
            txt_m = LoraDense(4 * dim, name="ff_context_in",
                              kernel_axes=(None, "tensor"), **dd, **lora)(txt_m)
            txt_m = nn.gelu(txt_m, approximate=True)
            txt_m = LoraDense(dim, name="ff_context_out",
                              kernel_axes=("tensor", None), **dd, **lora)(txt_m)
            txt = txt + t_gate_mlp[:, None, :] * txt_m
        return (img, txt), None


class SD3Transformer(nn.Module):
    config: SD3Config

    @nn.compact
    def __call__(self, hidden_states, timestep, encoder_hidden_states,
                 pooled_projections):
        """hidden_states: [B, C, H, W]; timestep: [B] already *1000."""
        cfg = self.config
        dim = cfg.hidden_size
        p = cfg.patch_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, c, h, w = hidden_states.shape
        gh, gw = h // p, w // p

        x = jnp.transpose(hidden_states, (0, 2, 3, 1)).astype(cfg.dtype)
        x = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, gh * gw, p * p * c)
        img = LoraDense(dim, name="pos_embed_proj", **dd)(x)

        # cropped fixed sincos table (diffusers PatchEmbed.cropped_pos_embed)
        table = sincos_2d_pos_embed(
            dim, cfg.pos_embed_max_size, cfg.sample_size // p
        ).reshape(cfg.pos_embed_max_size, cfg.pos_embed_max_size, dim)
        top = (cfg.pos_embed_max_size - gh) // 2
        left = (cfg.pos_embed_max_size - gw) // 2
        pos = jnp.asarray(
            table[top : top + gh, left : left + gw].reshape(1, gh * gw, dim)
        )
        img = img + pos.astype(img.dtype)

        temb = TimestepEmbedder(dim, **dd, name="timestep_embedder")(
            timestep.astype(jnp.float32) * 1.0
        )
        temb = temb + PixArtAlphaTextProjection(dim, **dd, name="text_embedder")(
            pooled_projections.astype(cfg.dtype)
        )
        temb = nn.silu(temb)

        txt = LoraDense(dim, name="context_embedder", **dd)(
            encoder_hidden_states.astype(cfg.dtype)
        )

        block = SD3JointBlock
        if cfg.remat:
            block = remat_wrap(block, cfg.remat)
        (img, txt), _ = nn.scan(
            block,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=nn.broadcast,
            length=cfg.num_layers - 1,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )(cfg, name="blocks")((img, txt), temb)
        # final joint block drops the context stream output
        (img, _), _ = SD3JointBlock(cfg, context_pre_only=True,
                                    name="final_block")((img, txt), temb)

        mod = LoraDense(2 * dim, name="norm_out_linear", **dd)(nn.silu(temb))
        scale, shift = jnp.split(mod, 2, axis=-1)  # diffusers (scale, shift)
        img = modulate(layer_norm_no_affine(img), shift, scale)
        out = LoraDense(p * p * cfg.out_channels, name="proj_out", **dd)(img)
        out = out.reshape(b, gh, gw, p, p, cfg.out_channels)
        out = out.transpose(0, 5, 1, 3, 2, 4).reshape(b, cfg.out_channels, h, w)
        return out
