"""Decoder-only LLM text encoders (Llama / Qwen2.5 / Qwen3 / Gemma-2 / Gemma-3
/ Mistral) in Flax, for caption-embedding caching.

The reference loads these towers through torch transformers or ComfyUI CLIP
loaders and runs them frozen inside the caching workers:
  - LLaVA-LLaMA-3-8B: hunyuan_video.py (template + crop_start)
  - Qwen2.5-VL text tower: qwen_image.py:182-185, omnigen2.py,
    hunyuan_image.py, hunyuan_video_15.py
  - Qwen3: z_image.py, flux2.py (Klein), ideogram4.py / krea2.py (VL text)
  - Gemma-2-2B: lumina_2.py; Gemma-3-12B: ltx2.py
  - Mistral-3: flux2.py (Dev); Ministral-3: ernie_image.py
Here one configurable module covers the whole family; per-model differences
(GQA widths, qk-norm, Gemma sandwich norms + (1+w) RMSNorm + soft-capping,
sliding-window layer patterns, dual RoPE bases) are config flags, and
`CausalLMConfig.from_hf_config` reads them straight from an HF config.json.

Everything is forward-only (frozen encoder), bf16-friendly, static-shape.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CausalLMConfig:
    vocab: int
    dim: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    ffn_dim: int
    act: str = "silu"  # 'silu' (SwiGLU) | 'gelu_tanh' (Gemma GeGLU)
    rope_theta: float = 500000.0
    rope_local_theta: float = 10000.0  # gemma3 sliding layers
    rope_scaling_factor: float = 1.0  # linear scaling on full-attn layers
    rms_eps: float = 1e-6
    qkv_bias: bool = False  # qwen2/2.5
    qk_norm: bool = False  # qwen3, gemma3
    gemma_norm: bool = False  # RMSNorm scale = (1 + w); embed *= sqrt(dim)
    post_norms: bool = False  # gemma2/3 post-attn / post-ffn sandwich norms
    attn_softcap: float = 0.0  # gemma2: 50.0
    query_scale: Optional[float] = None  # gemma query_pre_attn_scalar**-0.5
    sliding_window: int = 0
    # per-layer 'full' | 'sliding'; empty = all full
    layer_types: Tuple[str, ...] = ()
    # Qwen2.5-VL multimodal rope: contiguous (t, h, w) frequency sections
    # of head_dim/2; empty = plain 1D rope
    mrope_section: Tuple[int, ...] = ()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.bfloat16

    def layer_type(self, i: int) -> str:
        if not self.layer_types:
            return "sliding" if self.sliding_window else "full"
        return self.layer_types[i]

    @staticmethod
    def from_hf_config(cfg: dict, dtype=jnp.bfloat16) -> "CausalLMConfig":
        """Build from a transformers config.json dict (use the nested
        text_config for VL checkpoints)."""
        if "text_config" in cfg:
            cfg = {**cfg, **cfg["text_config"]}
        mt = cfg.get("model_type", "llama")
        heads = cfg["num_attention_heads"]
        dim = cfg["hidden_size"]
        kw: dict = dict(
            vocab=cfg["vocab_size"],
            dim=dim,
            num_layers=cfg["num_hidden_layers"],
            num_heads=heads,
            num_kv_heads=cfg.get("num_key_value_heads", heads),
            head_dim=cfg.get("head_dim") or dim // heads,
            ffn_dim=cfg["intermediate_size"],
            rope_theta=cfg.get("rope_theta", 10000.0),
            rms_eps=cfg.get("rms_norm_eps", 1e-6),
            dtype=dtype,
            param_dtype=dtype,
        )
        sliding = cfg.get("sliding_window") or 0
        layer_types = cfg.get("layer_types")
        if mt in ("qwen2", "qwen2_vl", "qwen2_5_vl", "qwen2_5_vl_text"):
            kw["qkv_bias"] = True
            rs = cfg.get("rope_scaling") or {}
            if rs.get("mrope_section"):
                kw["mrope_section"] = tuple(rs["mrope_section"])
            # HF applies sliding only above max_window_layers; in practice
            # the text towers we cache disable it.
            sliding = 0
        elif mt == "qwen3":
            kw["qk_norm"] = True
        elif mt == "gemma2":
            kw.update(
                act="gelu_tanh",
                gemma_norm=True,
                post_norms=True,
                attn_softcap=cfg.get("attn_logit_softcapping") or 0.0,
                query_scale=cfg.get("query_pre_attn_scalar", 256) ** -0.5,
            )
            if layer_types is None and sliding:
                # HF Gemma2: even layers sliding, odd layers full
                layer_types = [
                    "sliding_attention" if i % 2 == 0 else "full_attention"
                    for i in range(kw["num_layers"])
                ]
        elif mt in ("gemma3", "gemma3_text"):
            kw.update(
                act="gelu_tanh",
                gemma_norm=True,
                post_norms=True,
                qk_norm=True,
                query_scale=cfg.get("query_pre_attn_scalar", 256) ** -0.5,
                rope_local_theta=cfg.get("rope_local_base_freq", 10000.0),
            )
            rs = cfg.get("rope_scaling") or {}
            if rs.get("rope_type", rs.get("type")) == "linear":
                kw["rope_scaling_factor"] = rs.get("factor", 1.0)
            if layer_types is None and sliding:
                # 5 sliding : 1 full pattern
                pat = cfg.get("sliding_window_pattern", 6)
                layer_types = [
                    "full_attention" if (i + 1) % pat == 0 else "sliding_attention"
                    for i in range(kw["num_layers"])
                ]
        elif mt in ("mistral", "mistral3", "ministral", "llama", "llava",
                    "llava_llama"):
            pass
        if layer_types:
            kw["layer_types"] = tuple(
                "sliding" if t.startswith("sliding") else "full"
                for t in layer_types
            )
        kw["sliding_window"] = sliding
        return CausalLMConfig(**kw)

    @staticmethod
    def tiny(**over) -> "CausalLMConfig":
        d = dict(
            vocab=256, dim=32, num_layers=2, num_heads=4, num_kv_heads=2,
            head_dim=8, ffn_dim=64, dtype=jnp.float32, param_dtype=jnp.float32,
        )
        d.update(over)
        return CausalLMConfig(**d)


def _rms(x, scale, eps, gemma: bool):
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    s = scale.astype(jnp.float32)
    s = 1.0 + s if gemma else s
    return (xf * s).astype(x.dtype)


def _mrope_cos_sin(position_ids, head_dim: int, theta: float,
                   sections) -> tuple:
    """Qwen2.5-VL mrope tables. position_ids: [B, 3, S]; contiguous
    frequency sections (in head_dim/4 units per transformers convention:
    sum(sections) == head_dim // 2 // ... here sections are given in
    frequency-PAIR counts summing to head_dim // 2)."""
    half = head_dim // 2
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float32)
                           / head_dim))  # [half]
    axis_of = np.zeros((half,), np.int32)
    start = 0
    for ax, n in enumerate(sections):
        axis_of[start:start + n] = ax
        start += n
    pos = jnp.take_along_axis(
        position_ids.astype(jnp.float32),
        jnp.asarray(axis_of)[None, :, None].repeat(position_ids.shape[0], 0),
        axis=1,
    )  # [B, half, S]
    freqs = jnp.transpose(pos, (0, 2, 1)) * jnp.asarray(inv)[None, None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [B, S, D]
    return jnp.cos(emb), jnp.sin(emb)


def _rope_cos_sin(positions, head_dim: int, theta: float, scaling: float):
    """HF llama-style rotate-half RoPE tables. positions: [S] float."""
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    freqs = (positions[:, None] / scaling) * inv[None, :]  # [S, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [S, D]
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rope(x, cos, sin):
    """x: [B, S, H, D]; cos/sin: [S, D] or per-batch [B, S, D] (mrope)."""
    if cos.ndim == 3:
        c = cos[:, :, None, :].astype(x.dtype)
        s = sin[:, :, None, :].astype(x.dtype)
    else:
        c = cos[None, :, None, :].astype(x.dtype)
        s = sin[None, :, None, :].astype(x.dtype)
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * c + rotated * s


class DecoderLayer(nn.Module):
    config: CausalLMConfig
    layer_idx: int

    @nn.compact
    def __call__(self, x, mask_full, mask_sliding, rope_full, rope_sliding):
        cfg = self.config
        b, s, _ = x.shape
        H, KV, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        eps, gn = cfg.rms_eps, cfg.gemma_norm
        is_sliding = cfg.layer_type(self.layer_idx) == "sliding"
        mask = mask_sliding if is_sliding else mask_full
        cos, sin = rope_sliding if is_sliding else rope_full

        def norm(name, y):
            scale = self.param(name, nn.initializers.zeros_init()
                               if gn else nn.initializers.ones_init(),
                               (y.shape[-1],), cfg.param_dtype)
            return _rms(y, scale, eps, gn)

        h = norm("norm_in", x)
        q = nn.Dense(H * D, use_bias=cfg.qkv_bias, name="attn_q", **dd)(h)
        k = nn.Dense(KV * D, use_bias=cfg.qkv_bias, name="attn_k", **dd)(h)
        v = nn.Dense(KV * D, use_bias=cfg.qkv_bias, name="attn_v", **dd)(h)
        q = q.reshape(b, s, H, D)
        k = k.reshape(b, s, KV, D)
        v = v.reshape(b, s, KV, D)
        if cfg.qk_norm:
            qs = self.param("q_norm", nn.initializers.zeros_init()
                            if gn else nn.initializers.ones_init(),
                            (D,), cfg.param_dtype)
            ks = self.param("k_norm", nn.initializers.zeros_init()
                            if gn else nn.initializers.ones_init(),
                            (D,), cfg.param_dtype)
            q = _rms(q, qs, eps, gn)
            k = _rms(k, ks, eps, gn)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        if KV != H:
            rep = H // KV
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        scale = cfg.query_scale if cfg.query_scale is not None else D ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        if cfg.attn_softcap > 0.0:
            logits = cfg.attn_softcap * jnp.tanh(logits / cfg.attn_softcap)
        neg = jnp.asarray(jnp.finfo(jnp.float32).min)
        logits = jnp.where(mask, logits, neg)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, s, H * D)
        o = nn.Dense(cfg.dim, use_bias=False, name="attn_o", **dd)(o)
        if cfg.post_norms:
            o = norm("norm_post_attn", o)
        x = x + o

        h = norm("norm_pre_ffn" if cfg.post_norms else "norm_post_attn", x)
        gate = nn.Dense(cfg.ffn_dim, use_bias=False, name="ffn_gate", **dd)(h)
        up = nn.Dense(cfg.ffn_dim, use_bias=False, name="ffn_up", **dd)(h)
        if cfg.act == "gelu_tanh":
            gate = nn.gelu(gate, approximate=True)
        else:
            gate = nn.silu(gate)
        f = nn.Dense(cfg.dim, use_bias=False, name="ffn_down", **dd)(gate * up)
        if cfg.post_norms:
            f = norm("norm_post_ffn", f)
        return x + f


class CausalLM(nn.Module):
    """Decoder-only transformer, hidden states only (no LM head).

    Returns (final_normed_hidden, per_layer_hiddens) where per_layer_hiddens
    mirrors transformers' output_hidden_states list exactly: entry 0 is the
    embedding output, entry i (1 <= i < N) the output of layer i-1, and the
    last entry is the final NORMED hidden state — so models that consume
    intermediate states (hunyuan-video crop/skip-layer, HiDream per-block
    Llama injection) can index it the same way the reference does.
    """

    config: CausalLMConfig

    @nn.compact
    def __call__(self, ids, attn_mask=None, collect_hidden: bool = False,
                 input_embeds=None, position_ids=None):
        """position_ids: optional [B, 3, S] multimodal (t, h, w) ids used
        with cfg.mrope_section (Qwen2.5-VL); input_embeds: optional
        pre-merged embeddings [B, S, dim] (vision tokens spliced in)."""
        cfg = self.config
        emb = nn.Embed(cfg.vocab, cfg.dim, name="token_embedding",
                       param_dtype=cfg.param_dtype, dtype=cfg.dtype)
        if input_embeds is not None:
            x = input_embeds.astype(cfg.dtype)
            b, s = x.shape[:2]
        else:
            b, s = ids.shape
            x = emb(ids)
        if cfg.gemma_norm:
            # HF Gemma rounds the normalizer through the compute dtype
            x = x * jnp.asarray(cfg.dim ** 0.5, cfg.dtype)

        if position_ids is not None and cfg.mrope_section:
            rope_full = _mrope_cos_sin(position_ids, cfg.head_dim,
                                       cfg.rope_theta, cfg.mrope_section)
            rope_sliding = rope_full
        else:
            pos = np.arange(s, dtype=np.float32)
            rope_full = _rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta,
                                      cfg.rope_scaling_factor)
            rope_sliding = _rope_cos_sin(
                pos, cfg.head_dim, cfg.rope_local_theta, 1.0)

        q_idx = jnp.arange(s)[:, None]
        k_idx = jnp.arange(s)[None, :]
        causal = k_idx <= q_idx
        if attn_mask is not None:
            causal = causal[None] & (attn_mask > 0)[:, None, :]
        else:
            causal = causal[None]
        mask_full = causal[:, None, :, :]  # [B or 1, 1, S, S]
        if cfg.sliding_window:
            in_window = (q_idx - k_idx) < cfg.sliding_window
            mask_sliding = mask_full & in_window[None, None]
        else:
            mask_sliding = mask_full

        hiddens = [x] if collect_hidden else []
        for i in range(cfg.num_layers):
            x = DecoderLayer(cfg, i, name=f"layer_{i}")(
                x, mask_full, mask_sliding, rope_full, rope_sliding
            )
            if collect_hidden:
                hiddens.append(x)
        scale = self.param("final_norm",
                           nn.initializers.zeros_init()
                           if cfg.gemma_norm else nn.initializers.ones_init(),
                           (cfg.dim,), cfg.param_dtype)
        out = _rms(x, scale, cfg.rms_eps, cfg.gemma_norm)
        if collect_hidden:
            # transformers' hidden_states list ends with the NORMED output
            # (the raw last-layer output is never exposed); mirror that so
            # reference-style negative indexing lines up.
            hiddens[-1] = out
        return out, hiddens


def convert_hf_causal_lm(sd: dict, cfg: CausalLMConfig, prefix: str = "model."):
    """HF state dict (numpy/torch tensors) -> CausalLM flax params.

    `prefix` strips the outer module path: 'model.' for plain LMs,
    'model.language_model.' / 'language_model.model.' for VL checkpoints.
    Key scheme: transformers Llama/Qwen/Gemma naming (q_proj, k_proj, ...,
    input_layernorm, post_attention_layernorm, pre/post_feedforward_layernorm,
    q_norm/k_norm, embed_tokens, norm).
    """

    def g(key):
        t = sd[prefix + key]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return np.asarray(t)

    def lin(key):
        return {"kernel": np.ascontiguousarray(g(key + ".weight").T)}

    def lin_b(key):
        d = lin(key)
        if prefix + key + ".bias" in sd:
            d["bias"] = g(key + ".bias")
        return d

    p: dict = {
        "token_embedding": {"embedding": g("embed_tokens.weight")},
        "final_norm": g("norm.weight"),
    }
    for i in range(cfg.num_layers):
        lp = f"layers.{i}."
        layer = {
            "attn_q": lin_b(lp + "self_attn.q_proj"),
            "attn_k": lin_b(lp + "self_attn.k_proj"),
            "attn_v": lin_b(lp + "self_attn.v_proj"),
            "attn_o": lin(lp + "self_attn.o_proj"),
            "ffn_gate": lin(lp + "mlp.gate_proj"),
            "ffn_up": lin(lp + "mlp.up_proj"),
            "ffn_down": lin(lp + "mlp.down_proj"),
            "norm_in": g(lp + "input_layernorm.weight"),
        }
        if cfg.post_norms:
            layer["norm_post_attn"] = g(lp + "post_attention_layernorm.weight")
            layer["norm_pre_ffn"] = g(lp + "pre_feedforward_layernorm.weight")
            layer["norm_post_ffn"] = g(lp + "post_feedforward_layernorm.weight")
        else:
            layer["norm_post_attn"] = g(lp + "post_attention_layernorm.weight")
        if cfg.qk_norm:
            layer["q_norm"] = g(lp + "self_attn.q_norm.weight")
            layer["k_norm"] = g(lp + "self_attn.k_norm.weight")
        p[f"layer_{i}"] = layer
    return {"params": p}


class LLMTextEncoder:
    """Frozen decoder-LM caption encoder for the caching pipeline.

    Mirrors the reference's prompt-template handling: an optional template
    wraps the caption (LLaVA/Qwen chat templates), `crop_start` tokens are
    dropped from the hidden states (reference hunyuan_video.py crop_start,
    qwen_image.py drop_idx), and `hidden_layer` selects which hidden state
    feeds the DiT (-1 = final norm output; k = per-layer index into the
    transformers-style hidden_states list).
    """

    def __init__(self, path: str, max_length: int,
                 template: str = "{}",
                 crop_start: int = 0,
                 hidden_layer: int = -1,
                 tokenizer_path: Optional[str] = None,
                 dtype=jnp.bfloat16,
                 hf_prefix: str = "model.",
                 fp8: bool = False):
        self.path = Path(path)
        self.max_length = max_length
        self.template = template
        self.crop_start = crop_start
        self.hidden_layer = hidden_layer
        self.tokenizer_path = tokenizer_path or path
        self.dtype = dtype
        self.hf_prefix = hf_prefix
        self.fp8 = fp8
        self._model = None
        self._params = None
        self._tokenizer = None
        self._jitted = None

    def _load(self):
        if self._model is not None:
            return
        from transformers import AutoTokenizer

        from .weights import load_safetensors_dir

        with open(self.path / "config.json") as f:
            hf_cfg = json.load(f)
        cfg = CausalLMConfig.from_hf_config(hf_cfg, dtype=self.dtype)
        self._model = CausalLM(cfg)
        sd = load_safetensors_dir(str(self.path))
        # VL checkpoints nest the text tower; autodetect the prefix
        prefix = self.hf_prefix
        if not any(k.startswith(prefix + "layers.") for k in sd):
            for cand in ("model.language_model.", "language_model.model.",
                         "model.text_model.", ""):
                if any(k.startswith(cand + "layers.") for k in sd):
                    prefix = cand
                    break
        self._params = convert_hf_causal_lm(sd, cfg, prefix=prefix)
        if self.fp8:
            # text_encoder_fp8 / llama3_4bit analogue (see
            # text_encoders.cast_te_params_fp8)
            from .text_encoders import cast_te_params_fp8

            self._params = cast_te_params_fp8(self._params)
        self._tokenizer = AutoTokenizer.from_pretrained(str(self.tokenizer_path))
        collect = self.hidden_layer != -1

        def run(ids, mask):
            out, hiddens = self._model.apply(
                self._params, ids, mask, collect_hidden=collect
            )
            h = out if self.hidden_layer == -1 else hiddens[self.hidden_layer]
            return h

        self._jitted = jax.jit(run)

    def encode(self, captions, return_mask: bool = True):
        self._load()
        texts = [self.template.format(c) for c in captions]
        enc = self._tokenizer(
            texts, padding="max_length", truncation=True,
            max_length=self.max_length + self.crop_start, return_tensors="np",
        )
        ids = jnp.asarray(enc["input_ids"])
        mask = jnp.asarray(enc["attention_mask"])
        h = self._jitted(ids, mask)
        if self.crop_start:
            h = h[:, self.crop_start:]
            mask = mask[:, self.crop_start:]
        if return_mask:
            return np.asarray(h), np.asarray(mask)
        return np.asarray(h)
