"""Trainable LLMAdapter for Anima (cosmos_predict2 with a Qwen3 tower).

Reference: models/llm_adapter.py (LLMAdapter:164-199, Attention:72-115,
TransformerBlock:118-160). Maps frozen Qwen3-0.6B hidden states (source)
into the old-T5 embedding space the MiniTrainDIT was trained on: T5 token
embeddings of the caption are the query stream, refined by N cross-attn
blocks over the Qwen states (rope on both sides, per-head RMS qk-norm,
bias-free projections, RMS pre-norms, GELU MLP), then out_proj + RMSNorm.

The adapter is TRAINED alongside the LoRA (reference trains it with its
own llm_adapter_lr param group); its parameters live under 'llm_adapter'
in the param tree and are matched by the trainable predicate when
model.train_llm_adapter is on.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import LoraDense, RMSNorm

Dtype = Any


@dataclasses.dataclass(frozen=True)
class LLMAdapterConfig:
    source_dim: int = 1024      # Qwen3-0.6B hidden
    target_dim: int = 1024      # T5 embedding width the DiT expects
    model_dim: int = 1024
    num_layers: int = 6
    num_heads: int = 16
    vocab: int = 32128          # T5 vocab
    self_attn: bool = False
    rope_theta: float = 10000.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def head_dim(self):
        return self.model_dim // self.num_heads

    @staticmethod
    def tiny(**kw):
        d = dict(source_dim=16, target_dim=24, model_dim=32, num_layers=2,
                 num_heads=4, vocab=64)
        d.update(kw)
        return LLMAdapterConfig(**d)


def _rope(positions, head_dim, theta):
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float32)
                           / head_dim))
    freqs = positions[:, None] * inv[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rope(x, cos, sin):
    """x: [B, S, H, D] llama rotate-half."""
    c = cos[None, :, None, :].astype(x.dtype)
    s = sin[None, :, None, :].astype(x.dtype)
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return x * c + jnp.concatenate([-x2, x1], -1) * s


class _AdapterAttention(nn.Module):
    config: LLMAdapterConfig

    @nn.compact
    def __call__(self, x, context, rope_q, rope_k, kv_mask=None):
        cfg = self.config
        H, D = cfg.num_heads, cfg.head_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype, use_bias=False)
        b, sq = x.shape[:2]
        sk = context.shape[1]
        q = LoraDense(H * D, name="q_proj", **dd)(x).reshape(b, sq, H, D)
        k = LoraDense(H * D, name="k_proj", **dd)(context).reshape(b, sk, H, D)
        v = LoraDense(H * D, name="v_proj", **dd)(context).reshape(b, sk, H, D)
        q = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="q_norm")(q)
        k = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="k_norm")(k)
        q = _apply_rope(q, *rope_q)
        k = _apply_rope(k, *rope_k)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(D)
        if kv_mask is not None:
            neg = jnp.finfo(jnp.float32).min
            logits = jnp.where((kv_mask > 0)[:, None, None, :], logits, neg)
        attn = jax.nn.softmax(logits, -1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, sq, H * D)
        return LoraDense(x.shape[-1], name="o_proj", **dd)(o)


def convert_llm_adapter(sd) -> dict:
    """torch LLMAdapter state dict -> our flax param subtree.

    Accepts the standalone `llm_adapter_path` file layout AND the keys
    embedded inside an Anima DiT checkpoint under the `llm_adapter.`
    prefix (reference models/cosmos_predict2.py:274-300). Reference
    module names: models/llm_adapter.py LLMAdapter:164-199 (embed,
    in_proj, blocks.N.{norm_self_attn,self_attn,norm_cross_attn,
    cross_attn,norm_mlp,mlp.{0,2}}, out_proj, norm); rotary_emb.inv_freq
    is a non-persistent buffer and never appears."""
    sd = {
        (k[len("llm_adapter."):] if k.startswith("llm_adapter.") else k):
            np.asarray(v)
        for k, v in sd.items()
    }
    # layer_norm=True checkpoints use nn.LayerNorm (weight+bias, mean
    # subtraction) where we build RMSNorm; converting them silently would
    # be numerically wrong. The reference hardcodes layer_norm=False for
    # Anima (cosmos_predict2_modeling.py:1257-1263), so only guard.
    ln_bias = [k for k in sd
               if k.endswith(".bias") and ".norm" in f".{k}"]
    if ln_bias:
        raise ValueError(
            "LLMAdapter checkpoint has LayerNorm biases "
            f"({ln_bias[:3]}…): layer_norm=True adapters are not "
            "supported (Anima uses RMSNorm / layer_norm=False)")
    out: dict = {}

    def lin(dst, src):
        entry = {"kernel": np.ascontiguousarray(sd[src + ".weight"].T)}
        if src + ".bias" in sd:
            entry["bias"] = sd[src + ".bias"]
        out[dst] = entry

    def attn(dst, src):
        d = {}
        for t in ("q_proj", "k_proj", "v_proj", "o_proj"):
            d[t] = {"kernel": np.ascontiguousarray(
                sd[f"{src}.{t}.weight"].T)}
        d["q_norm"] = {"scale": sd[f"{src}.q_norm.weight"]}
        d["k_norm"] = {"scale": sd[f"{src}.k_norm.weight"]}
        out[dst] = d

    out["embed"] = {"embedding": sd["embed.weight"]}
    if "in_proj.weight" in sd:
        lin("in_proj", "in_proj")
    n = 0
    while f"blocks.{n}.norm_cross_attn.weight" in sd:
        n += 1
    for i in range(n):
        p = f"blocks.{i}"
        if f"{p}.norm_self_attn.weight" in sd:
            out[f"blocks_{i}_norm_self"] = {
                "scale": sd[f"{p}.norm_self_attn.weight"]}
            attn(f"blocks_{i}_self_attn", f"{p}.self_attn")
        out[f"blocks_{i}_norm_cross"] = {
            "scale": sd[f"{p}.norm_cross_attn.weight"]}
        attn(f"blocks_{i}_cross_attn", f"{p}.cross_attn")
        out[f"blocks_{i}_norm_mlp"] = {"scale": sd[f"{p}.norm_mlp.weight"]}
        lin(f"blocks_{i}_mlp1", f"{p}.mlp.0")
        lin(f"blocks_{i}_mlp2", f"{p}.mlp.2")
    lin("out_proj", "out_proj")
    out["norm"] = {"scale": sd["norm.weight"]}
    return out


class LLMAdapter(nn.Module):
    config: LLMAdapterConfig

    @nn.compact
    def __call__(self, source_hidden_states, target_input_ids,
                 target_mask=None, source_mask=None):
        cfg = self.config
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        x = nn.Embed(cfg.vocab, cfg.target_dim, name="embed",
                     param_dtype=cfg.param_dtype,
                     dtype=cfg.dtype)(target_input_ids)
        if cfg.model_dim != cfg.target_dim:
            x = LoraDense(cfg.model_dim, name="in_proj", **dd)(x)
        rope_q = _rope(np.arange(x.shape[1], dtype=np.float32),
                       cfg.head_dim, cfg.rope_theta)
        rope_k = _rope(np.arange(source_hidden_states.shape[1],
                                 dtype=np.float32),
                       cfg.head_dim, cfg.rope_theta)
        ctx = source_hidden_states.astype(cfg.dtype)
        for i in range(cfg.num_layers):
            if cfg.self_attn:
                y = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                            name=f"blocks_{i}_norm_self")(x)
                x = x + _AdapterAttention(
                    cfg, name=f"blocks_{i}_self_attn")(
                        y, y, rope_q, rope_q, target_mask)
            y = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                        name=f"blocks_{i}_norm_cross")(x)
            x = x + _AdapterAttention(
                cfg, name=f"blocks_{i}_cross_attn")(
                    y, ctx, rope_q, rope_k, source_mask)
            y = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                        name=f"blocks_{i}_norm_mlp")(x)
            y = LoraDense(int(cfg.model_dim * 4), name=f"blocks_{i}_mlp1",
                          **dd)(y)
            y = nn.gelu(y, approximate=False)
            x = x + LoraDense(cfg.model_dim, name=f"blocks_{i}_mlp2", **dd)(y)
        x = LoraDense(cfg.target_dim, name="out_proj", **dd)(x)
        return RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                       name="norm")(x)
