"""Lumina 2 (NextDiT) model + pipeline (reference models/lumina_2.py).

Pipeline semantics are exact from the reference (lumina_2.py:150-340):
rectified flow with TARGET = latents - noise and model timestep input 1 - t
(sign-flipped vs flux, lumina_2.py:176-179); joint [caption, image] single
stream; 3-axis position ids where caption tokens advance axis 0 and image
tokens sit at axis0 = cap_len with 2D (row, col); 2-block context refiner on
captions (no adaLN) and 2-block noise refiner on image tokens (with adaLN);
Gemma-2-2B caption features (cached).

Block internals follow NextDiT: sandwich RMS-norms around attention and the
SwiGLU FFN, grouped-query attention with qk RMS-norm, and a 4-way adaLN
(scale_msa, gate_msa, scale_mlp, gate_mlp). Verify head/GQA splits against
pretrained checkpoints before converted-weight training.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention
from ..training.flow import TimestepDistribution, sample_timesteps
from . import register_model
from .base import BasePipeline
from .layers import (
    LoraDense,
    RMSNorm,
    apply_rope,
    remat_spec,
    remat_wrap,
    rope_frequencies,
    sinusoidal_timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class Lumina2Config:
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    dim: int = 2304
    num_layers: int = 26
    num_refiner_layers: int = 2
    num_heads: int = 24
    num_kv_heads: int = 8
    cap_dim: int = 2304           # Gemma-2-2B hidden
    axes_dims_rope: Any = (32, 32, 32)
    rope_theta: float = 10000.0
    # Z-Image starts caption axis-0 positions at 1 and puts image tokens at
    # cap_len + 1 (reference z_image.py:188-196); Lumina-2 starts at 0.
    rope_cap_offset: int = 0
    # Z-Image pads image tokens to a multiple of this with a LEARNED pad
    # token appended after x_embedder, rope ids (0,0,0) (reference
    # z_image.py:200-202); the checkpoint carries x_pad_token and
    # cap_pad_token (z_image.py:23 keep_in_high_precision). None disables
    # (Lumina-2 / OmniGen2 have no pad tokens).
    pad_tokens_multiple: Any = None
    ffn_dim_multiplier: float = 8.0 / 3.0
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
    def head_dim(self):
        return self.dim // self.num_heads

    @property
    def ffn_hidden(self):
        return int(self.dim * self.ffn_dim_multiplier)

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
        d = dict(dim=48, num_layers=2, num_refiner_layers=1, num_heads=4,
                 num_kv_heads=2, cap_dim=32, axes_dims_rope=(4, 4, 4),
                 dtype=jnp.float32, param_dtype=jnp.float32)
        d.update(kw)
        return Lumina2Config(**d)


class Lumina2Block(nn.Module):
    config: Lumina2Config
    use_adaln: bool = True

    @nn.compact
    def __call__(self, x, mask, rope_cos, rope_sin, adaln_input=None):
        cfg = self.config
        dim = cfg.dim
        heads, kv_heads, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype, use_bias=False,
                  kernel_dtype=cfg.base_kernel_dtype,
                  int8_matmul=cfg.int8_matmul)
        lora = cfg.lora_kwargs
        b, s, _ = x.shape

        if self.use_adaln and adaln_input is not None:
            mod = LoraDense(4 * dim, use_bias=True, dtype=cfg.dtype,
                            param_dtype=cfg.param_dtype,
                            name="adaLN_modulation")(nn.silu(adaln_input))
            scale_msa, gate_msa, scale_mlp, gate_mlp = jnp.split(mod, 4, -1)
            scale_msa, scale_mlp = 1 + scale_msa[:, None], 1 + scale_mlp[:, None]
            gate_msa, gate_mlp = jnp.tanh(gate_msa)[:, None], jnp.tanh(
                gate_mlp)[:, None]
        else:
            scale_msa = scale_mlp = 1.0
            gate_msa = gate_mlp = 1.0

        def rms(name, y, d=None):
            return RMSNorm(eps=1e-5, dtype=cfg.dtype,
                           param_dtype=cfg.param_dtype, name=name)(y)

        # sandwich-normed GQA attention
        y = rms("attention_norm1", x) * scale_msa
        q = rms("attn_q_norm",
                LoraDense(heads * hd, name="attn_wq", **dd, **lora)(y)
                .reshape(b, s, heads, hd))
        k = rms("attn_k_norm",
                LoraDense(kv_heads * hd, name="attn_wk", **dd, **lora)(y)
                .reshape(b, s, kv_heads, hd))
        v = LoraDense(kv_heads * hd, name="attn_wv", **dd, **lora)(y).reshape(
            b, s, kv_heads, hd)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        rep = heads // kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        y = dot_product_attention(q, k, v, mask).reshape(b, s, heads * hd)
        y = LoraDense(dim, name="attn_wo", **dd, **lora)(y)
        x = x + gate_msa * rms("attention_norm2", y)

        # sandwich-normed SwiGLU
        y = rms("ffn_norm1", x) * scale_mlp
        g = LoraDense(cfg.ffn_hidden, name="ffn_w1", **dd, **lora)(y)
        u = LoraDense(cfg.ffn_hidden, name="ffn_w3", **dd, **lora)(y)
        y = LoraDense(dim, name="ffn_w2", **dd, **lora)(nn.silu(g) * u)
        x = x + gate_mlp * rms("ffn_norm2", y)
        return x


class _MainBlock(nn.Module):
    config: Lumina2Config

    @nn.compact
    def __call__(self, carry, mask, rope_cos, rope_sin, adaln_input):
        x = Lumina2Block(self.config)(carry, mask, rope_cos, rope_sin,
                                      adaln_input)
        return x, None


class Lumina2Transformer(nn.Module):
    config: Lumina2Config

    @nn.compact
    def __call__(self, x, t, cap_feats, cap_mask):
        """x: [B, C, H, W]; t: [B] (already 1 - noise-level);
        cap_feats: [B, Lc, cap_dim]; cap_mask: [B, Lc]."""
        cfg = self.config
        dim = cfg.dim
        p = cfg.patch_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, c, hh, ww = x.shape
        gh, gw = hh // p, ww // p
        img_len = gh * gw
        cap_len = cap_feats.shape[1]

        # t embedder (scaled by 1000 inside sinusoidal like other DiTs? the
        # reference NextDiT embeds raw t in [0,1] * 1.0 with freq 256)
        temb = sinusoidal_timestep_embedding(t.astype(jnp.float32) * 1000.0, 256)
        temb = LoraDense(min(dim, 1024), name="t_embedder_1", **dd)(
            temb.astype(cfg.dtype))
        temb = LoraDense(min(dim, 1024), name="t_embedder_2", **dd)(
            nn.silu(temb))
        adaln_input = temb

        cap = RMSNorm(eps=1e-5, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                      name="cap_embedder_norm")(cap_feats.astype(cfg.dtype))
        cap = LoraDense(dim, name="cap_embedder", **dd)(cap)

        # position ids (reference lumina_2.py:243-256): caption gets axis-0
        # 0..cap_len (masked rows keep their index harmlessly), image tokens
        # axis0 = cap_len with 2D (row, col)
        off = cfg.rope_cap_offset
        cap_ids = jnp.stack(
            [jnp.arange(cap_len) + off, jnp.zeros(cap_len), jnp.zeros(cap_len)],
            -1,
        )
        row = jnp.repeat(jnp.arange(gh), gw)
        col = jnp.tile(jnp.arange(gw), gh)
        img_ids = jnp.stack(
            [jnp.full((img_len,), cap_len + off), row, col], -1
        )
        # learned image pad tokens (reference z_image.py:200-206: pad x to a
        # multiple AFTER x_embedder, pos ids zero-padded, pads attended)
        pad_extra = ((-img_len) % cfg.pad_tokens_multiple
                     if cfg.pad_tokens_multiple else 0)
        if cfg.pad_tokens_multiple:
            img_ids = jnp.concatenate(
                [img_ids, jnp.zeros((pad_extra, 3), img_ids.dtype)], 0)
        cap_cos, cap_sin = rope_frequencies(
            cap_ids, tuple(cfg.axes_dims_rope), cfg.rope_theta
        )
        img_cos, img_sin = rope_frequencies(
            img_ids, tuple(cfg.axes_dims_rope), cfg.rope_theta
        )
        full_cos = jnp.concatenate([cap_cos, img_cos], 0)
        full_sin = jnp.concatenate([cap_sin, img_sin], 0)

        # context refiner (no adaLN)
        for i in range(cfg.num_refiner_layers):
            cap = Lumina2Block(cfg, use_adaln=False,
                               name=f"context_refiner_{i}")(
                cap, cap_mask, cap_cos, cap_sin
            )

        # patchify + x_embedder + noise refiner (with adaLN)
        xi = x.reshape(b, c, gh, p, gw, p)
        xi = jnp.einsum("bchpwq->bhwpqc", xi).reshape(b, img_len, p * p * c)
        xi = LoraDense(dim, name="x_embedder", **dd)(xi.astype(cfg.dtype))
        if cfg.pad_tokens_multiple:
            x_pad_token = self.param(
                "x_pad_token", nn.initializers.normal(0.02),
                (1, dim), cfg.param_dtype)
            # registered for checkpoint parity; the caption-side dynamic
            # pad path is disabled in the reference too (z_image.py:170-184)
            self.param("cap_pad_token", nn.initializers.normal(0.02),
                       (1, dim), cfg.param_dtype)
            if pad_extra:
                pads = jnp.tile(x_pad_token.astype(xi.dtype)[None],
                                (b, pad_extra, 1))
                xi = jnp.concatenate([xi, pads], axis=1)
        for i in range(cfg.num_refiner_layers):
            xi = Lumina2Block(cfg, name=f"noise_refiner_{i}")(
                xi, None, img_cos, img_sin, adaln_input
            )

        full = jnp.concatenate([cap, xi], axis=1)
        full_mask = jnp.concatenate(
            [cap_mask.astype(jnp.int32),
             jnp.ones((b, img_len + pad_extra), jnp.int32)], axis=1
        )

        block = _MainBlock
        if cfg.remat:
            block = remat_wrap(block, cfg.remat)
        full, _ = nn.scan(
            block,
            variable_axes={"params": 0}, split_rngs={"params": True},
            in_axes=nn.broadcast, length=cfg.num_layers,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )(cfg, name="layers")(full, full_mask, full_cos, full_sin, adaln_input)

        # final layer: adaLN scale + linear, image tokens only (learned
        # pads, if any, sit after them and are dropped)
        out = full[:, cap_len:cap_len + img_len]
        mod = LoraDense(dim, use_bias=True, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype,
                        name="final_adaLN")(nn.silu(adaln_input))
        xf = out.astype(jnp.float32)
        mean = jnp.mean(xf, -1, keepdims=True)
        var = jnp.var(xf, -1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
        xf = xf * (1 + mod[:, None].astype(jnp.float32))
        out = LoraDense(p * p * cfg.out_channels, name="final_linear", **dd)(
            xf.astype(cfg.dtype)
        )
        out = out.reshape(b, gh, gw, p, p, cfg.out_channels)
        out = jnp.einsum("bhwpqc->bchpwq", out).reshape(b, cfg.out_channels,
                                                        hh, ww)
        return out


@register_model("lumina_2", "lumina2")
class Lumina2Pipeline(BasePipeline):
    name = "lumina_2"
    cacheable_text_embeddings = ("cap_feats", "cap_mask")

    def __init__(self, config):
        super().__init__(config)
        mc = self.model_config
        # lumina_shift maps to the resolution-dependent flux-style shift
        # (reference lumina_2.py:168-171)
        if mc.get("lumina_shift"):
            mc.setdefault("flux_shift", True)
        self.tdist = TimestepDistribution.from_model_config(mc)
        self.lumina_config = self._build_config()
        self.model = Lumina2Transformer(self.lumina_config)

    def _build_config(self) -> Lumina2Config:
        from ..common import dtype_from_string

        mc = self.model_config
        adapter = self.config.get("adapter", {})
        kwargs: Dict[str, Any] = dict(
            dtype=dtype_from_string(mc.get("dtype", "bfloat16")),
            param_dtype=dtype_from_string(mc.get("dtype", "bfloat16")),
            base_kernel_dtype=(
                dtype_from_string(mc["transformer_dtype"])
                if mc.get("transformer_dtype") else None
            ),
            remat=remat_spec(self.config),
            int8_matmul=mc.get("int8_matmul", False),
        )
        if adapter.get("type") in ("lora", "lokr"):
            kwargs.update(
                lora_rank=int(adapter["rank"]),
                lora_type=adapter["type"],
                lokr_factor=int(adapter.get("decompose_factor", -1)),
                lokr_rank_dropout=float(adapter.get("rank_dropout", 0.0)),
                lora_alpha=float(adapter["alpha"]),
                lora_dropout=float(adapter.get("dropout", 0.0)),
                lora_dtype=dtype_from_string(
                    adapter.get("dtype", mc.get("dtype", "bfloat16"))
                ),
            )
        if mc.get("_tiny", False):
            return Lumina2Config.tiny(**kwargs)
        return Lumina2Config(**kwargs)

    def init_params(self, rng):
        cfg = self.lumina_config
        return jax.jit(self.model.init)(
            rng,
            jnp.zeros((1, cfg.in_channels, 8, 8)),
            jnp.zeros((1,)),
            jnp.zeros((1, 8, cfg.cap_dim)),
            jnp.ones((1, 8), jnp.int32),
        )

    def prepare_inputs(self, rng, batch, timestep_quantile=None):
        latents = batch["latents"].astype(jnp.float32)
        b, c, h, w = latents.shape

        mask = batch.get("mask")
        if mask is not None:
            mask = jax.image.resize(
                mask.astype(jnp.float32), (b, h, w), method="nearest"
            )[:, None]

        t_key, n_key = jax.random.split(rng)
        t = sample_timesteps(
            t_key, b, self.tdist, quantile=timestep_quantile,
            image_seq_len=(h // 2) * (w // 2),
        )
        noise = jax.random.normal(n_key, latents.shape, jnp.float32)
        t_exp = t.reshape(b, 1, 1, 1)
        x_t = (1 - t_exp) * latents + t_exp * noise
        # SIGN FLIP vs flux: target = latents - noise, model gets 1 - t
        # (reference lumina_2.py:173-179)
        target = latents - noise

        model_inputs = dict(
            x=x_t,
            t=1.0 - t,
            cap_feats=batch["cap_feats"],
            cap_mask=batch["cap_mask"].reshape(b, -1),
        )
        return model_inputs, target, mask

    def forward(self, params, model_inputs):
        return self.model.apply(params, **model_inputs)

    def make_pp_program(self):
        """Pipeline-parallel program: one phase over the scan-stacked main
        NextDiT blocks; caption/noise refiners embed on stage 0, the adaLN
        final layer + loss on the last stage (reference partitions via
        to_layers() + PipelineModule, models/lumina_2.py). Shared by
        omnigen2 and z_image, which reuse this transformer. See
        parallel/model_pp.py."""
        return _Lumina2PPProgram(self)

    def sample(self, params, width, height, key, num_steps=20,
               guidance_scale=1.0, cap_feats=None, cap_mask=None, **embeds):
        """Euler flow sampling. The model predicts latents - noise with time
        input 1 - t (reference lumina_2.py:173-179), so the sampler's
        noise->data velocity is the NEGATED model output at 1 - t.

        Accepts the child families' cached-embedding key names too
        (omnigen2: prompt_embeds/prompt_attention_mask; z_image:
        text_embeds_0/attention_mask_0), so the CLI --test_sample path can
        call sample(**cached_embeds) uniformly."""
        from ..training.sampling import euler_flow_sample

        if cap_feats is None:
            cap_feats = embeds.get(
                "prompt_embeds", embeds.get("text_embeds_0"))
        if cap_mask is None:
            cap_mask = embeds.get(
                "prompt_attention_mask", embeds.get("attention_mask_0"))

        b = cap_feats.shape[0]
        h, w = height // 8, width // 8

        def vel(x, t):
            out = self.model.apply(
                params, x, 1.0 - t, cap_feats,
                cap_mask if cap_mask is not None
                else jnp.ones(cap_feats.shape[:2], jnp.int32),
            )
            return -out

        return euler_flow_sample(
            vel, (b, self.lumina_config.in_channels, h, w), key,
            num_steps=num_steps, guidance_scale=guidance_scale,
            shift=self.model_config.get("shift"),
        )

    def get_call_vae_fn(self):
        from .flux import FluxPipeline

        return FluxPipeline.get_call_vae_fn(self)

    def _load_vae(self):
        from .flux import FluxPipeline

        return FluxPipeline._load_vae(self)

    def get_call_text_encoder_fns(self):
        mc = self.model_config
        if mc.get("_tiny", False):
            from ..data.bucketing import seed_from_hash

            cfg = self.lumina_config

            def te(caps):
                embs, masks = [], []
                for cap in caps:
                    r = np.random.default_rng(seed_from_hash(cap))
                    n = min(len(cap) + 1, 8)
                    e = np.zeros((8, cfg.cap_dim), np.float32)
                    e[:n] = r.standard_normal((n, cfg.cap_dim))
                    m = np.zeros((8,), np.int32)
                    m[:n] = 1
                    embs.append(e)
                    masks.append(m)
                return {"cap_feats": np.stack(embs), "cap_mask": np.stack(masks)}

            return [te]

        # Gemma-2-2B, right padding to 256, hidden_states[-2]
        # (reference models/lumina_2.py:113-134)
        from .llm_encoders import LLMTextEncoder

        enc = LLMTextEncoder(
            mc["text_encoder_path"], max_length=256, hidden_layer=-2,
        )

        def fn(caps):
            h, m = enc.encode(caps)
            return {"cap_feats": h, "cap_mask": m.astype(np.int32)}

        return [fn]

    # --- weights ------------------------------------------------------------

    def _keymap_config(self):
        return self.lumina_config

    def keymap(self):
        """NextDiT (Lumina-Image-2.0) keys: fused GQA qkv with unequal
        q/k/v sizes, sandwich RMS norms, per-index context/noise refiners
        (reference models/lumina_2.py loads via the Lumina_2 submodule and
        saves ComfyUI-format LoRA, lumina_2.py:95-100) <-> our layout."""
        from .keymaps import BlockGroup, KeyMap

        cfg = self.lumina_config
        hd = cfg.head_dim
        q_sz, kv_sz = cfg.num_heads * hd, cfg.num_kv_heads * hd

        def block_maps():
            linears = {
                "attn_wo": "attention.out",
                "ffn_w1": "feed_forward.w1",
                "ffn_w2": "feed_forward.w2",
                "ffn_w3": "feed_forward.w3",
            }
            norms = {
                "attn_q_norm": "attention.q_norm",
                "attn_k_norm": "attention.k_norm",
                "attention_norm1": "attention_norm1",
                "attention_norm2": "attention_norm2",
                "ffn_norm1": "ffn_norm1",
                "ffn_norm2": "ffn_norm2",
            }
            fused = {
                "attention.qkv": (("attn_wq", q_sz), ("attn_wk", kv_sz),
                                  ("attn_wv", kv_sz)),
            }
            return linears, norms, fused

        lin, norms, fused = block_maps()
        top_linears = {
            "x_embedder": "x_embedder",
            "t_embedder_1": "t_embedder.mlp.0",
            "t_embedder_2": "t_embedder.mlp.2",
            "cap_embedder": "cap_embedder.1",
            "final_adaLN": "final_layer.adaLN_modulation.1",
            "final_linear": "final_layer.linear",
        }
        top_norms = {"cap_embedder_norm": "cap_embedder.0"}
        top_raw = {}
        if cfg.pad_tokens_multiple:
            # Z-Image learned pad tokens (reference z_image.py:23,200-206)
            top_raw["x_pad_token"] = "x_pad_token"
            top_raw["cap_pad_token"] = "cap_pad_token"
        for group, use_adaln in (("context_refiner", False),
                                 ("noise_refiner", True)):
            for i in range(cfg.num_refiner_layers):
                base = f"{group}.{i}"
                ours = f"{group}_{i}"
                for fl, th in lin.items():
                    top_linears[f"{ours}/{fl}"] = f"{base}.{th}"
                for fl, th in norms.items():
                    top_norms[f"{ours}/{fl}"] = f"{base}.{th}"
                if use_adaln:
                    top_linears[f"{ours}/adaLN_modulation"] = (
                        f"{base}.adaLN_modulation.1")
        top_fused = {}
        for group in ("context_refiner", "noise_refiner"):
            for i in range(cfg.num_refiner_layers):
                top_fused[f"{group}.{i}.attention.qkv"] = (
                    (f"{group}_{i}/attn_wq", q_sz),
                    (f"{group}_{i}/attn_wk", kv_sz),
                    (f"{group}_{i}/attn_wv", kv_sz),
                )
        # the scan stack wraps Lumina2Block inside _MainBlock, nesting
        # params one level deeper
        wrap = "Lumina2Block_0/"
        return KeyMap(
            blocks=[BlockGroup(
                "layers", "layers", "num_layers",
                linears={**{wrap + k: v for k, v in lin.items()},
                         wrap + "adaLN_modulation": "adaLN_modulation.1"},
                norms={wrap + k: v for k, v in norms.items()},
                fused={th: tuple((wrap + n, s) for n, s in entries)
                       for th, entries in fused.items()},
            )],
            top_linears=top_linears,
            top_norms=top_norms,
            top_raw=top_raw,
            top_fused=top_fused,
            lora_prefix="diffusion_model.",
        )

    def load_weights(self):
        from .keymaps import keymap_to_flax, load_sd_for_pipeline

        return keymap_to_flax(
            load_sd_for_pipeline(self), self.keymap(), self.lumina_config
        )


class _Lumina2PPProgram:
    """PPProgram for Lumina2Transformer / NextDiT (see parallel/model_pp.py).

    Raw-param re-expression of the __call__ split at the main block scan:
    t/caption embedding + context & noise refiners on stage 0, _MainBlock
    per slot, adaLN final layer + unpatchify + loss on the last stage.
    Payload: (full [B,Lc+Li,D], full_mask [B,Lc+Li], adaln_input [B,D]).
    """

    def __init__(self, pipeline):
        from ..parallel.model_pp import PPPhase

        self.pipeline = pipeline
        cfg = pipeline.lumina_config
        self.cfg = cfg
        self.phases = [
            PPPhase("layers", cfg.num_layers, self._apply_block)
        ]

    def _apply_block(self, p_i, payload, ctx):
        full, full_mask, adaln = payload
        full, _ = _MainBlock(self.cfg).apply(
            {"params": p_i}, full, full_mask, ctx["full_cos"],
            ctx["full_sin"], adaln,
        )
        return (full, full_mask, adaln)

    def make_ctx(self, p_rest, mi0):
        cfg = self.cfg
        p = cfg.patch_size
        _b, _c, hh, ww = mi0["x"].shape
        gh, gw = hh // p, ww // p
        img_len = gh * gw
        cap_len = mi0["cap_feats"].shape[1]
        off = cfg.rope_cap_offset
        cap_ids = jnp.stack(
            [jnp.arange(cap_len) + off, jnp.zeros(cap_len),
             jnp.zeros(cap_len)], -1,
        )
        row = jnp.repeat(jnp.arange(gh), gw)
        col = jnp.tile(jnp.arange(gw), gh)
        img_ids = jnp.stack(
            [jnp.full((img_len,), cap_len + off), row, col], -1
        )
        pad_extra = ((-img_len) % cfg.pad_tokens_multiple
                     if cfg.pad_tokens_multiple else 0)
        if pad_extra:
            img_ids = jnp.concatenate(
                [img_ids, jnp.zeros((pad_extra, 3), img_ids.dtype)], 0)
        cap_cos, cap_sin = rope_frequencies(
            cap_ids, tuple(cfg.axes_dims_rope), cfg.rope_theta
        )
        img_cos, img_sin = rope_frequencies(
            img_ids, tuple(cfg.axes_dims_rope), cfg.rope_theta
        )
        return {
            "cap_cos": cap_cos, "cap_sin": cap_sin,
            "img_cos": img_cos, "img_sin": img_sin,
            "full_cos": jnp.concatenate([cap_cos, img_cos], 0),
            "full_sin": jnp.concatenate([cap_sin, img_sin], 0),
            "grid": (gh, gw), "hw": (hh, ww), "cap_len": cap_len,
            "pad_extra": pad_extra,
        }

    def embed(self, p_rest, mi, ctx):
        cfg = self.cfg
        dim = cfg.dim
        p = cfg.patch_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        x, t = mi["x"], mi["t"]
        cap_feats, cap_mask = mi["cap_feats"], mi["cap_mask"]
        b, c = x.shape[:2]
        gh, gw = ctx["grid"]
        img_len = gh * gw

        temb = sinusoidal_timestep_embedding(
            t.astype(jnp.float32) * 1000.0, 256)
        temb = LoraDense(min(dim, 1024), **dd).apply(
            {"params": p_rest["t_embedder_1"]}, temb.astype(cfg.dtype))
        adaln_input = LoraDense(min(dim, 1024), **dd).apply(
            {"params": p_rest["t_embedder_2"]}, nn.silu(temb))

        cap = RMSNorm(eps=1e-5, dtype=cfg.dtype,
                      param_dtype=cfg.param_dtype).apply(
            {"params": p_rest["cap_embedder_norm"]},
            cap_feats.astype(cfg.dtype))
        cap = LoraDense(dim, **dd).apply(
            {"params": p_rest["cap_embedder"]}, cap)
        for i in range(cfg.num_refiner_layers):
            cap = Lumina2Block(cfg, use_adaln=False).apply(
                {"params": p_rest[f"context_refiner_{i}"]},
                cap, cap_mask, ctx["cap_cos"], ctx["cap_sin"],
            )

        xi = x.reshape(b, c, gh, p, gw, p)
        xi = jnp.einsum("bchpwq->bhwpqc", xi).reshape(b, img_len, p * p * c)
        xi = LoraDense(dim, **dd).apply(
            {"params": p_rest["x_embedder"]}, xi.astype(cfg.dtype))
        pad_extra = ctx["pad_extra"]
        if pad_extra:
            pads = jnp.tile(
                jnp.asarray(p_rest["x_pad_token"]).astype(xi.dtype)[None],
                (b, pad_extra, 1))
            xi = jnp.concatenate([xi, pads], axis=1)
        for i in range(cfg.num_refiner_layers):
            xi = Lumina2Block(cfg).apply(
                {"params": p_rest[f"noise_refiner_{i}"]},
                xi, None, ctx["img_cos"], ctx["img_sin"], adaln_input,
            )

        full = jnp.concatenate([cap, xi], axis=1)
        full_mask = jnp.concatenate(
            [cap_mask.astype(jnp.int32),
             jnp.ones((b, img_len + pad_extra), jnp.int32)], axis=1,
        )
        return (full, full_mask, adaln_input)

    def head_loss(self, p_rest, payload, target, mask, ctx):
        cfg = self.cfg
        p = cfg.patch_size
        gh, gw = ctx["grid"]
        hh, ww = ctx["hw"]
        full, _fm, adaln_input = payload
        b = full.shape[0]

        out = full[:, ctx["cap_len"]:ctx["cap_len"] + gh * gw]
        mod = LoraDense(cfg.dim, use_bias=True, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype).apply(
            {"params": p_rest["final_adaLN"]}, nn.silu(adaln_input))
        xf = out.astype(jnp.float32)
        mean = jnp.mean(xf, -1, keepdims=True)
        var = jnp.var(xf, -1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
        xf = xf * (1 + mod[:, None].astype(jnp.float32))
        out = LoraDense(p * p * cfg.out_channels, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype).apply(
            {"params": p_rest["final_linear"]}, xf.astype(cfg.dtype))
        out = out.reshape(b, gh, gw, p, p, cfg.out_channels)
        out = jnp.einsum("bhwpqc->bchpwq", out).reshape(
            b, cfg.out_channels, hh, ww)
        return self.pipeline.loss_fn(out, target, mask)
