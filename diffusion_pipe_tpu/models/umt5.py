"""UMT5 encoder (Wan's text encoder) in Flax.

Re-implements the reference's vendored UMT5-XXL encoder
(models/wan/t5.py: T5LayerNorm / T5Attention without scaling /
gated-GELU feed-forward / PER-LAYER relative position bias with
bidirectional bucketing, umt5_xxl config at t5.py:446-459) as a jitted XLA
program for the caching phase. Weight conversion from ComfyUI-repacked
safetensors (t5.py:462-520 key mapping).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class UMT5Config:
    vocab: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    max_dist: int = 128
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16

    @staticmethod
    def xxl():
        return UMT5Config()

    @staticmethod
    def tiny():
        return UMT5Config(vocab=128, dim=32, dim_attn=32, dim_ffn=64,
                          num_heads=4, num_layers=2,
                          dtype=jnp.float32, param_dtype=jnp.float32)


def relative_position_buckets(qlen: int, klen: int, num_buckets: int,
                              max_dist: int) -> np.ndarray:
    """Bidirectional T5 bucketing (reference t5.py:232-258)."""
    ctx = np.arange(qlen)[:, None]
    mem = np.arange(klen)[None, :]
    rel_pos = mem - ctx
    nb = num_buckets // 2
    rel_buckets = (rel_pos > 0).astype(np.int64) * nb
    rel_pos = np.abs(rel_pos)
    max_exact = nb // 2
    large = max_exact + (
        np.log(np.maximum(rel_pos, 1) / max_exact)
        / math.log(max_dist / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    rel_buckets += np.where(rel_pos < max_exact, rel_pos, large)
    return rel_buckets  # [qlen, klen]


class UMT5Block(nn.Module):
    config: UMT5Config

    @nn.compact
    def __call__(self, x, mask, rel_buckets):
        cfg = self.config
        heads = cfg.num_heads
        hd = cfg.dim_attn // heads
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype, use_bias=False)
        b, s, _ = x.shape

        def t5_norm(name, y):
            scale = self.param(name, nn.initializers.ones_init(), (cfg.dim,),
                               cfg.param_dtype)
            yf = y.astype(jnp.float32)
            yf = yf * jax.lax.rsqrt(
                jnp.mean(yf * yf, axis=-1, keepdims=True) + 1e-6
            )
            return (scale.astype(jnp.float32) * yf).astype(y.dtype)

        # per-layer relative position bias
        rel_emb = self.param(
            "pos_embedding",
            nn.initializers.normal(
                (2 * cfg.num_buckets * cfg.num_heads) ** -0.5
            ),
            (cfg.num_buckets, heads), cfg.param_dtype,
        )
        pos_bias = rel_emb[rel_buckets]  # [s, s, H]
        pos_bias = jnp.transpose(pos_bias, (2, 0, 1))[None]  # [1, H, s, s]

        y = t5_norm("norm1", x)
        q = nn.Dense(cfg.dim_attn, name="attn_q", **dd)(y).reshape(b, s, heads, hd)
        k = nn.Dense(cfg.dim_attn, name="attn_k", **dd)(y).reshape(b, s, heads, hd)
        v = nn.Dense(cfg.dim_attn, name="attn_v", **dd)(y).reshape(b, s, heads, hd)
        logits = jnp.einsum("binc,bjnc->bnij", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits + pos_bias.astype(jnp.float32)
        if mask is not None:
            neg = jnp.asarray(-0.7 * jnp.finfo(jnp.float32).max)
            logits = jnp.where((mask > 0)[:, None, None, :], logits, neg)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bnij,bjnc->binc", attn, v).reshape(b, s, cfg.dim_attn)
        x = x + nn.Dense(cfg.dim, name="attn_o", **dd)(o)

        y = t5_norm("norm2", x)
        gate = nn.gelu(
            nn.Dense(cfg.dim_ffn, name="ffn_gate", **dd)(y), approximate=True
        )
        h = nn.Dense(cfg.dim_ffn, name="ffn_fc1", **dd)(y) * gate
        x = x + nn.Dense(cfg.dim, name="ffn_fc2", **dd)(h)
        return x


class UMT5Encoder(nn.Module):
    config: UMT5Config

    @nn.compact
    def __call__(self, ids, mask=None):
        cfg = self.config
        emb = nn.Embed(cfg.vocab, cfg.dim, name="token_embedding",
                       param_dtype=cfg.param_dtype, dtype=cfg.dtype)
        x = emb(ids)
        rel_buckets = jnp.asarray(
            relative_position_buckets(
                ids.shape[1], ids.shape[1], cfg.num_buckets, cfg.max_dist
            )
        )
        for i in range(cfg.num_layers):
            x = UMT5Block(cfg, name=f"block_{i}")(x, mask, rel_buckets)
        # final norm
        scale = self.param("final_norm", nn.initializers.ones_init(),
                           (cfg.dim,), cfg.param_dtype)
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + 1e-6)
        return (scale.astype(jnp.float32) * xf).astype(cfg.dtype)


def convert_umt5_comfy(sd, cfg: UMT5Config):
    """ComfyUI-repacked UMT5 keys -> flax params. Key scheme (reference
    t5.py:462-520): encoder.block.N.layer.0.SelfAttention.{q,k,v,o},
    .relative_attention_bias, layer.0.layer_norm, layer.1.DenseReluDense
    .{wi_0 (gate), wi_1 (fc1), wo}, layer.1.layer_norm, shared (embedding),
    encoder.final_layer_norm."""
    def lin(key):
        return {"kernel": np.ascontiguousarray(np.asarray(sd[key]).T)}

    params = {
        "token_embedding": {"embedding": np.asarray(sd["shared.weight"])},
        "final_norm": np.asarray(sd["encoder.final_layer_norm.weight"]),
    }
    for i in range(cfg.num_layers):
        p = f"encoder.block.{i}"
        params[f"block_{i}"] = {
            "norm1": np.asarray(sd[f"{p}.layer.0.layer_norm.weight"]),
            "attn_q": lin(f"{p}.layer.0.SelfAttention.q.weight"),
            "attn_k": lin(f"{p}.layer.0.SelfAttention.k.weight"),
            "attn_v": lin(f"{p}.layer.0.SelfAttention.v.weight"),
            "attn_o": lin(f"{p}.layer.0.SelfAttention.o.weight"),
            "pos_embedding": np.asarray(
                sd[f"{p}.layer.0.SelfAttention.relative_attention_bias.weight"]
            ),
            "norm2": np.asarray(sd[f"{p}.layer.1.layer_norm.weight"]),
            "ffn_gate": lin(f"{p}.layer.1.DenseReluDense.wi_0.weight"),
            "ffn_fc1": lin(f"{p}.layer.1.DenseReluDense.wi_1.weight"),
            "ffn_fc2": lin(f"{p}.layer.1.DenseReluDense.wo.weight"),
        }
    return {"params": params}
