"""Cosmos-Predict2 MiniTrainDIT in Flax.

Faithful re-implementation of the reference's vendored model
(models/cosmos_predict2_modeling.py): adaLN(+LoRA)-modulated blocks of
self-attention (3D NTK-scaled RoPE, half-rotation convention, per-head RMS
qk-norm), cross-attention to old-T5 features, and GPT2 MLPs; patch embedding
with a concatenated padding-mask channel; raw t in [0,1] feeds the sinusoidal
embedder (the reference passes t unscaled, cosmos_predict2.py:405-408) and —
with use_adaln_lora — the RMS-normed SINUSOIDAL projection (not the MLP
output) is the per-block modulation input (modeling.py:697-733).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention
from .layers import LoraDense, RMSNorm, remat_wrap


@dataclasses.dataclass(frozen=True)
class CosmosPredict2Config:
    in_channels: int = 16
    out_channels: int = 16
    patch_spatial: int = 2
    patch_temporal: int = 1
    model_channels: int = 2048
    num_blocks: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    crossattn_emb_channels: int = 1024
    concat_padding_mask: bool = True
    use_adaln_lora: bool = True
    adaln_lora_dim: int = 256
    rope_h_extrapolation_ratio: float = 1.0
    rope_w_extrapolation_ratio: float = 1.0
    rope_t_extrapolation_ratio: float = 1.0
    rope_enable_fps_modulation: bool = False
    base_fps: int = 24
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

    @property
    def head_dim(self):
        return self.model_channels // self.num_heads

    @property
    def lora_kwargs(self):
        return dict(
            lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            lora_dropout=self.lora_dropout, lora_dtype=self.lora_dtype,
            lora_type=self.lora_type, lokr_factor=self.lokr_factor,
            lokr_rank_dropout=self.lokr_rank_dropout,
        )

    @staticmethod
    def p2b_2b(**kw):
        d = dict(model_channels=2048, num_blocks=28, num_heads=16)
        d.update(kw)
        return CosmosPredict2Config(**d)

    @staticmethod
    def tiny(**kw):
        d = dict(model_channels=64, num_blocks=2, num_heads=4,
                 crossattn_emb_channels=32, adaln_lora_dim=16,
                 dtype=jnp.float32, param_dtype=jnp.float32)
        d.update(kw)
        return CosmosPredict2Config(**d)


def cosmos_rope_angles(cfg: CosmosPredict2Config, t: int, h: int, w: int,
                       fps: Optional[float] = None) -> np.ndarray:
    """[L, head_dim] rotation angles (modeling.py:560-618): per-axis dims
    (dim_h = dim//6*2 = dim_w, dim_t = rest), NTK-scaled thetas, layout
    cat([t_half, h_half, w_half] * 2)."""
    dim = cfg.head_dim
    dim_h = dim // 6 * 2
    dim_t = dim - 2 * dim_h
    h_theta = 10000.0 * cfg.rope_h_extrapolation_ratio ** (dim_h / (dim_h - 2))
    w_theta = 10000.0 * cfg.rope_w_extrapolation_ratio ** (dim_h / (dim_h - 2))
    t_theta = 10000.0 * cfg.rope_t_extrapolation_ratio ** (dim_t / (dim_t - 2))
    sp_range = np.arange(0, dim_h, 2)[: dim_h // 2] / dim_h
    t_range = np.arange(0, dim_t, 2)[: dim_t // 2] / dim_t
    h_freqs = 1.0 / h_theta**sp_range
    w_freqs = 1.0 / w_theta**sp_range
    t_freqs = 1.0 / t_theta**t_range
    seq_t = np.arange(t, dtype=np.float64)
    if cfg.rope_enable_fps_modulation and fps is not None and t > 1:
        seq_t = seq_t / fps * cfg.base_fps
    emb_t = np.outer(seq_t, t_freqs)
    emb_h = np.outer(np.arange(h), h_freqs)
    emb_w = np.outer(np.arange(w), w_freqs)
    half = np.concatenate(
        [
            np.broadcast_to(emb_t[:, None, None, :], (t, h, w, emb_t.shape[1])),
            np.broadcast_to(emb_h[None, :, None, :], (t, h, w, emb_h.shape[1])),
            np.broadcast_to(emb_w[None, None, :, :], (t, h, w, emb_w.shape[1])),
        ],
        axis=-1,
    ).reshape(t * h * w, dim // 2)
    return np.concatenate([half, half], axis=-1).astype(np.float32)


def apply_rope_half(x, cos, sin):
    """Half-rotation rope (modeling.py:30-49, interleaved=False):
    out = x*cos + (-x2, x1)*sin. x: [B, S, H, D]; cos/sin: [S, D]."""
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (x.astype(jnp.float32) * c + rotated * s).astype(x.dtype)


class CosmosBlock(nn.Module):
    config: CosmosPredict2Config

    @nn.compact
    def __call__(self, x, emb, adaln_lora, context, rope_cos, rope_sin):
        cfg = self.config
        dim = cfg.model_channels
        heads, hd = cfg.num_heads, cfg.head_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype, use_bias=False,
                  kernel_dtype=cfg.base_kernel_dtype,
                  int8_matmul=cfg.int8_matmul)
        lora = cfg.lora_kwargs
        b, s, _ = x.shape

        def modulation(name):
            if cfg.use_adaln_lora:
                y = LoraDense(cfg.adaln_lora_dim, use_bias=False,
                              dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                              name=f"{name}_1")(nn.silu(emb))
                y = LoraDense(3 * dim, use_bias=False, dtype=cfg.dtype,
                              param_dtype=cfg.param_dtype,
                              name=f"{name}_2")(y)
                y = y + adaln_lora
            else:
                y = LoraDense(3 * dim, use_bias=False, dtype=cfg.dtype,
                              param_dtype=cfg.param_dtype,
                              name=f"{name}_1")(nn.silu(emb))
            return jnp.split(y, 3, axis=-1)

        def ln(y):
            yf = y.astype(jnp.float32)
            mean = jnp.mean(yf, -1, keepdims=True)
            var = jnp.var(yf, -1, keepdims=True)
            return ((yf - mean) * jax.lax.rsqrt(var + 1e-6)).astype(y.dtype)

        def rms(name, y):
            return RMSNorm(eps=1e-6, dtype=cfg.dtype,
                           param_dtype=cfg.param_dtype, name=name)(y)

        # self attention
        shift, scale, gate = modulation("adaln_modulation_self_attn")
        y = ln(x) * (1 + scale[:, None]) + shift[:, None]
        q = rms("self_attn_q_norm",
                LoraDense(dim, name="self_attn_q", **dd, **lora)(y)
                .reshape(b, s, heads, hd))
        k = rms("self_attn_k_norm",
                LoraDense(dim, name="self_attn_k", **dd, **lora)(y)
                .reshape(b, s, heads, hd))
        v = LoraDense(dim, name="self_attn_v", **dd, **lora)(y).reshape(
            b, s, heads, hd)
        q = apply_rope_half(q, rope_cos, rope_sin)
        k = apply_rope_half(k, rope_cos, rope_sin)
        y = dot_product_attention(q, k, v).reshape(b, s, dim)
        y = LoraDense(dim, name="self_attn_o", **dd, **lora)(y)
        x = x + gate[:, None] * y

        # cross attention
        shift, scale, gate = modulation("adaln_modulation_cross_attn")
        y = ln(x) * (1 + scale[:, None]) + shift[:, None]
        lc = context.shape[1]
        qc = rms("cross_attn_q_norm",
                 LoraDense(dim, name="cross_attn_q", **dd, **lora)(y)
                 .reshape(b, s, heads, hd))
        kc = rms("cross_attn_k_norm",
                 LoraDense(dim, name="cross_attn_k", **dd, **lora)(context)
                 .reshape(b, lc, heads, hd))
        vc = LoraDense(dim, name="cross_attn_v", **dd, **lora)(
            context).reshape(b, lc, heads, hd)
        y = dot_product_attention(qc, kc, vc).reshape(b, s, dim)
        y = LoraDense(dim, name="cross_attn_o", **dd, **lora)(y)
        x = x + gate[:, None] * y

        # mlp (exact GELU, modeling.py:245-270)
        shift, scale, gate = modulation("adaln_modulation_mlp")
        y = ln(x) * (1 + scale[:, None]) + shift[:, None]
        y = LoraDense(int(dim * cfg.mlp_ratio), name="mlp_1", **dd, **lora)(y)
        y = nn.gelu(y, approximate=False)
        y = LoraDense(dim, name="mlp_2", **dd, **lora)(y)
        x = x + gate[:, None] * y
        return x, None


class CosmosPredict2Transformer(nn.Module):
    config: CosmosPredict2Config

    @nn.compact
    def __call__(self, x, t, context, fps: Optional[float] = None,
                 padding_mask=None):
        """x: [B, C, T, H, W]; t: [B] in [0, 1] (raw); context: [B, Lc, 1024]."""
        cfg = self.config
        dim = cfg.model_channels
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, c, tt, hh, ww = x.shape
        ps, pt = cfg.patch_spatial, cfg.patch_temporal
        gt, gh, gw = tt // pt, hh // ps, ww // ps
        seq = gt * gh * gw

        if cfg.concat_padding_mask:
            pm = (padding_mask if padding_mask is not None
                  else jnp.zeros((b, 1, tt, hh, ww), x.dtype))
            x = jnp.concatenate([x, pm.astype(x.dtype)], axis=1)
            c = c + 1
        # PatchEmbed: "b c (t r) (h m) (w n) -> b t h w (c r m n)" + Linear
        xe = x.reshape(b, c, gt, pt, gh, ps, gw, ps)
        xe = jnp.einsum("bctrhmwn->bthwcrmn", xe).reshape(
            b, seq, c * pt * ps * ps
        )
        xe = LoraDense(dim, use_bias=False, name="x_embedder", **dd)(
            xe.astype(cfg.dtype)
        )
        from .layers import seq_shard

        xe = seq_shard(xe, cfg.sequence_sharding)

        # timestep embedding: sinusoidal proj (cos|sin) -> (adaLN-LoRA path)
        half = dim // 2
        exponent = jnp.exp(
            -math.log(10000) * jnp.arange(half, dtype=jnp.float32) / half
        )
        args = t.astype(jnp.float32)[:, None] * exponent[None]
        sincos = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        e1 = LoraDense(dim, use_bias=not cfg.use_adaln_lora,
                       name="t_embedder_1", **dd)(sincos.astype(cfg.dtype))
        e2 = LoraDense(3 * dim if cfg.use_adaln_lora else dim, use_bias=False,
                       name="t_embedder_2", **dd)(nn.silu(e1))
        if cfg.use_adaln_lora:
            emb, adaln_lora = sincos.astype(cfg.dtype), e2
        else:
            emb, adaln_lora = e2, jnp.zeros((b, 3 * dim), cfg.dtype)
        emb = RMSNorm(eps=1e-6, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                      name="t_embedding_norm")(emb)

        angles = jnp.asarray(cosmos_rope_angles(cfg, gt, gh, gw, fps))
        rope_cos, rope_sin = jnp.cos(angles), jnp.sin(angles)

        block = CosmosBlock
        if cfg.remat:
            block = remat_wrap(block, cfg.remat)
        xe, _ = nn.scan(
            block,
            variable_axes={"params": 0}, split_rngs={"params": True},
            in_axes=nn.broadcast, length=cfg.num_blocks,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )(cfg, name="blocks")(xe, emb, adaln_lora, context.astype(cfg.dtype),
                              rope_cos, rope_sin)

        # final layer (modeling.py:859-935)
        if cfg.use_adaln_lora:
            y = LoraDense(cfg.adaln_lora_dim, use_bias=False,
                          name="final_adaln_1", **dd)(nn.silu(emb))
            y = LoraDense(2 * dim, use_bias=False, name="final_adaln_2",
                          **dd)(y)
            y = y + adaln_lora[:, : 2 * dim]
        else:
            y = LoraDense(2 * dim, use_bias=False, name="final_adaln_1",
                          **dd)(nn.silu(emb))
        shift, scale = jnp.split(y, 2, axis=-1)
        xf = xe.astype(jnp.float32)
        mean = jnp.mean(xf, -1, keepdims=True)
        var = jnp.var(xf, -1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
        xf = xf * (1 + scale[:, None].astype(jnp.float32)) + shift[
            :, None
        ].astype(jnp.float32)
        out = LoraDense(ps * ps * pt * cfg.out_channels, use_bias=False,
                        name="final_linear", dtype=jnp.float32,
                        param_dtype=cfg.param_dtype)(xf)
        # unpatchify: the OUTPUT packs (p1 p2 t C) — spatial patch slowest,
        # channel fastest — unlike the input's (c r m n)
        # (reference unpatchify rearrange, modeling.py:905-913)
        out = out.reshape(b, gt, gh, gw, ps, ps, pt, cfg.out_channels)
        out = jnp.einsum("bthwmnrc->bctrhmwn", out)
        return out.reshape(b, cfg.out_channels, gt * pt, gh * ps, gw * ps)
