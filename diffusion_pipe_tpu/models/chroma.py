"""Chroma pipeline adapter (reference models/chroma.py).

Flux-style rectified flow over packed 2x2 latents; T5-only conditioning with
padding masked in attention; modulations from the distilled Approximator
(guidance input 0 during training). Saves ComfyUI-format adapters
(reference chroma.py:176-181).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..training.flow import TimestepDistribution, sample_timesteps
from . import register_model
from .base import BasePipeline
from .chroma_model import ChromaConfig, ChromaTransformer
from .flux import (
    latent_image_ids,
    pack_latents,
    resize_mask_to_latents,
    unpack_latents,
)
from .layers import remat_spec


@register_model("chroma")
class ChromaPipeline(BasePipeline):
    name = "chroma"
    cacheable_text_embeddings = ("t5_embed", "t5_mask")

    def __init__(self, config):
        super().__init__(config)
        self.tdist = TimestepDistribution.from_model_config(self.model_config)
        self.chroma_config = self._build_config()
        self.model = ChromaTransformer(self.chroma_config)

    def _build_config(self) -> ChromaConfig:
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
            return ChromaConfig.tiny(**kwargs)
        return ChromaConfig(**kwargs)

    def init_params(self, rng):
        cfg = self.chroma_config
        b, simg, stxt = 1, 16, 8
        return jax.jit(self.model.init)(
            rng,
            jnp.zeros((b, simg, cfg.in_channels)),
            jnp.zeros((b, stxt, cfg.joint_attention_dim)),
            jnp.zeros((b,)),
            latent_image_ids(4, 4),
            jnp.zeros((stxt, 3)),
            jnp.zeros((b,)),
            jnp.ones((b, stxt), jnp.int32),
        )

    def prepare_inputs(self, rng, batch, timestep_quantile=None):
        latents = batch["latents"].astype(jnp.float32)
        b, c, h, w = latents.shape
        image_seq_len = (h // 2) * (w // 2)

        mask = batch.get("mask")
        if mask is not None:
            mask = pack_latents(resize_mask_to_latents(mask, h, w, c))

        t_key, n_key = jax.random.split(rng)
        t = sample_timesteps(
            t_key, b, self.tdist, quantile=timestep_quantile,
            image_seq_len=image_seq_len,
        )
        noise = jax.random.normal(n_key, latents.shape, jnp.float32)
        t_exp = t.reshape(b, 1, 1, 1)
        x_t = pack_latents((1 - t_exp) * latents + t_exp * noise)
        target = pack_latents(noise - latents)

        model_inputs = dict(
            hidden_states=x_t,
            encoder_hidden_states=batch["t5_embed"],
            timestep=t,
            img_ids=latent_image_ids(h // 2, w // 2),
            txt_ids=jnp.zeros((batch["t5_embed"].shape[1], 3), jnp.float32),
            guidance=jnp.zeros((b,), jnp.float32),
            txt_mask=batch["t5_mask"].reshape(b, -1)
            if "t5_mask" in batch else None,
            img_seq_len=image_seq_len,
        )
        return model_inputs, target, mask

    def forward(self, params, model_inputs):
        return self.model.apply(params, **model_inputs)

    def sample(self, params, width, height, key, num_steps=20,
               guidance_scale=1.0, **embeds):
        """Euler flow sampling through the training forward (reference
        CommonPipeline.sample, models/base.py:263-291). Returns latents
        [B, 16, h, w]."""
        from ..training.sampling import euler_flow_sample

        t5 = embeds["t5_embed"]
        b = t5.shape[0]
        h, w = height // 8, width // 8
        img_ids = latent_image_ids(h // 2, w // 2)
        txt_ids = jnp.zeros((t5.shape[1], 3), jnp.float32)
        t5_mask = embeds.get("t5_mask")

        def vel(x, t):
            out = self.forward(params, dict(
                hidden_states=pack_latents(x),
                encoder_hidden_states=t5,
                timestep=t,
                img_ids=img_ids,
                txt_ids=txt_ids,
                guidance=jnp.zeros((b,), jnp.float32),
                txt_mask=t5_mask.reshape(b, -1)
                if t5_mask is not None else None,
                img_seq_len=(h // 2) * (w // 2),
            ))
            return unpack_latents(out.astype(jnp.float32), h, w)

        return euler_flow_sample(
            vel, (b, 16, h, w), key, num_steps=num_steps,
            guidance_scale=guidance_scale,
            shift=self.model_config.get("shift"),
        )

    def make_pp_program(self):
        """Pipeline-parallel program: double-block then single-block phases;
        the Approximator runs on stage 0 and its per-block modulation slices
        travel in the payload, indexed by global block position
        (PPPhase.needs_index). See parallel/model_pp.py."""
        return _ChromaPPProgram(self)

    # Chroma uses the flux VAE (16ch): borrow FluxPipeline's unbound
    # implementations (they only touch model_config/_vae attributes).
    def _load_vae(self):
        from .flux import FluxPipeline

        return FluxPipeline._load_vae(self)

    def get_call_vae_fn(self):
        from .flux import FluxPipeline

        return FluxPipeline.get_call_vae_fn(self)

    def get_call_text_encoder_fns(self):
        mc = self.model_config
        if mc.get("_tiny", False):
            from ..data.bucketing import seed_from_hash

            cfg = self.chroma_config

            def t5(caps):
                embs, masks = [], []
                for c in caps:
                    r = np.random.default_rng(seed_from_hash(c))
                    n = min(len(c) + 1, 8)
                    e = np.zeros((8, cfg.joint_attention_dim), np.float32)
                    e[:n] = r.standard_normal((n, cfg.joint_attention_dim))
                    m = np.zeros((8,), np.int32)
                    m[:n] = 1
                    embs.append(e)
                    masks.append(m)
                return {"t5_embed": np.stack(embs), "t5_mask": np.stack(masks)}

            return [t5]
        from .text_encoders import HFTextEncoder

        t5 = HFTextEncoder(
            "t5", mc["t5_path"],
            max_length=int(mc.get("max_sequence_length", 512)),
        )

        def t5_fn(captions):
            emb, m = t5.encode(captions, return_mask=True)
            return {"t5_embed": emb, "t5_mask": m.astype(np.int32)}

        return [t5_fn]

    # --- weights ------------------------------------------------------------

    def _keymap_config(self):
        return self.chroma_config

    def keymap(self):
        """Chroma single-file keys (lodestones flow / ComfyUI BFL dialect:
        fused qkv, `.scale` RMS norms, distilled_guidance_layer MLP;
        reference models/chroma.py loads these via the flow submodule and
        saves ComfyUI-format LoRA, chroma.py:176-181) <-> our stacked
        layout."""
        from .keymaps import BlockGroup, KeyMap

        cfg = self.chroma_config
        dim = cfg.hidden_size
        mlp = int(dim * cfg.mlp_ratio)
        top_linears = {
            "x_embedder": "img_in",
            "context_embedder": "txt_in",
            "proj_out": "final_layer.linear",
            "distilled_guidance_layer/in_proj":
                "distilled_guidance_layer.in_proj",
            "distilled_guidance_layer/out_proj":
                "distilled_guidance_layer.out_proj",
        }
        top_norms = {}
        for i in range(cfg.approximator_layers):
            top_linears[f"distilled_guidance_layer/layers_{i}_in"] = (
                f"distilled_guidance_layer.layers.{i}.in_layer")
            top_linears[f"distilled_guidance_layer/layers_{i}_out"] = (
                f"distilled_guidance_layer.layers.{i}.out_layer")
            top_norms[f"distilled_guidance_layer/norms_{i}"] = (
                f"distilled_guidance_layer.norms.{i}")
        return KeyMap(
            blocks=[
                BlockGroup(
                    "double_blocks", "double_blocks", "num_layers",
                    linears={
                        "attn_to_out": "img_attn.proj",
                        "attn_to_add_out": "txt_attn.proj",
                        "ff_in": "img_mlp.0",
                        "ff_out": "img_mlp.2",
                        "ff_context_in": "txt_mlp.0",
                        "ff_context_out": "txt_mlp.2",
                    },
                    norms={
                        "attn_to_norm_q": "img_attn.norm.query_norm",
                        "attn_to_norm_k": "img_attn.norm.key_norm",
                        "attn_add_norm_q": "txt_attn.norm.query_norm",
                        "attn_add_norm_k": "txt_attn.norm.key_norm",
                    },
                    fused={
                        "img_attn.qkv": ("attn_to_q", "attn_to_k",
                                         "attn_to_v"),
                        "txt_attn.qkv": ("attn_add_q", "attn_add_k",
                                         "attn_add_v"),
                    },
                    norm_suffix="scale",
                ),
                BlockGroup(
                    "single_blocks", "single_blocks", "num_single_layers",
                    linears={"proj_out": "linear2"},
                    norms={
                        "attn_norm_q": "norm.query_norm",
                        "attn_norm_k": "norm.key_norm",
                    },
                    fused={
                        "linear1": (("attn_to_q", dim), ("attn_to_k", dim),
                                    ("attn_to_v", dim), ("proj_mlp", mlp)),
                    },
                    norm_suffix="scale",
                ),
            ],
            top_linears=top_linears,
            top_norms=top_norms,
            top_norm_suffix="scale",
            lora_prefix="diffusion_model.",
        )

    def load_weights(self):
        from .keymaps import keymap_to_flax, load_sd_for_pipeline

        return keymap_to_flax(
            load_sd_for_pipeline(self), self.keymap(), self.chroma_config
        )


class _ChromaPPProgram:
    """PPProgram for ChromaTransformer (see parallel/model_pp.py).

    Raw-param re-expression of chroma_model.py's __call__ split at the two
    block scans. The distilled-modulation Approximator output is computed
    once in embed and carried (it is tiny next to the hidden states);
    blocks slice their own [B,12,D]/[B,3,D] rows by global block index.
    Phase 1 payload: (img, txt, dmods, smods, fmods, txt_mask);
    phase 2 (after concat `pre`): (x, smods, fmods, kv_mask).
    """

    def __init__(self, pipeline):
        from ..parallel.model_pp import PPPhase

        self.pipeline = pipeline
        cfg = pipeline.chroma_config
        self.cfg = cfg
        self.phases = [
            PPPhase("double_blocks", cfg.num_layers, self._apply_double,
                    needs_index=True),
            PPPhase("single_blocks", cfg.num_single_layers,
                    self._apply_single, pre=self._to_single_stream,
                    needs_index=True),
        ]

    def _apply_double(self, p_i, payload, ctx, bi):
        from .chroma_model import ChromaDoubleBlock

        img, txt, dmods, smods, fmods, txt_mask = payload
        mods_i = jax.lax.dynamic_index_in_dim(dmods, bi, 1, False)
        (img, txt), _ = ChromaDoubleBlock(self.cfg).apply(
            {"params": p_i}, (img, txt), mods_i, ctx["rope_cos"],
            ctx["rope_sin"], txt_mask,
        )
        return (img, txt, dmods, smods, fmods, txt_mask)

    def _to_single_stream(self, payload, ctx):
        img, txt, _dmods, smods, fmods, txt_mask = payload
        x = jnp.concatenate([txt, img], axis=1)
        kv_mask = jnp.concatenate(
            [txt_mask.astype(jnp.int32),
             jnp.ones((img.shape[0], img.shape[1]), jnp.int32)], axis=1,
        )
        return (x, smods, fmods, kv_mask)

    def _apply_single(self, p_i, payload, ctx, bi):
        from .chroma_model import ChromaSingleBlock

        x, smods, fmods, kv_mask = payload
        # slot indices are phase-local (stack_for_stages numbers each
        # phase's blocks from 0)
        mods_i = jax.lax.dynamic_index_in_dim(smods, bi, 1, False)
        x, _ = ChromaSingleBlock(self.cfg).apply(
            {"params": p_i}, x, mods_i, ctx["rope_cos"], ctx["rope_sin"],
            kv_mask,
        )
        return (x, smods, fmods, kv_mask)

    def make_ctx(self, p_rest, mi0):
        from .layers import rope_frequencies

        cfg = self.cfg
        ids = jnp.concatenate([mi0["txt_ids"], mi0["img_ids"]], axis=0)
        rope_cos, rope_sin = rope_frequencies(
            ids, cfg.axes_dims_rope, cfg.rope_theta
        )
        return {"rope_cos": rope_cos, "rope_sin": rope_sin,
                "txt_len": mi0["encoder_hidden_states"].shape[1]}

    def embed(self, p_rest, mi, ctx):
        from .chroma_model import Approximator
        from .layers import LoraDense

        cfg = self.cfg
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b = mi["hidden_states"].shape[0]

        img = LoraDense(dim, **dd).apply(
            {"params": p_rest["x_embedder"]},
            mi["hidden_states"].astype(cfg.dtype))
        txt = LoraDense(dim, **dd).apply(
            {"params": p_rest["context_embedder"]},
            mi["encoder_hidden_states"].astype(cfg.dtype))
        guidance = mi.get("guidance")
        if guidance is None:
            guidance = jnp.zeros((b,), jnp.float32)
        mod_vectors = Approximator(cfg).apply(
            {"params": p_rest["distilled_guidance_layer"]},
            mi["timestep"], guidance,
        )
        ns, nd = cfg.num_single_layers, cfg.num_layers
        smods = mod_vectors[:, : 3 * ns].reshape(b, ns, 3, dim)
        dmods = mod_vectors[:, 3 * ns: 3 * ns + 12 * nd].reshape(
            b, nd, 12, dim)
        fmods = mod_vectors[:, -2:]
        txt_mask = mi.get("txt_mask")
        if txt_mask is None:
            txt_mask = jnp.ones((b, txt.shape[1]), jnp.int32)
        return (img, txt, dmods, smods, fmods, txt_mask)

    def head_loss(self, p_rest, payload, target, mask, ctx):
        from .chroma_model import _mod
        from .layers import LoraDense, layer_norm_no_affine

        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        x, _smods, fmods, _kvm = payload

        out = x[:, ctx["txt_len"]:]
        out = out[:, : target.shape[1]]
        shift, scale = fmods[:, 0], fmods[:, 1]
        out = _mod(layer_norm_no_affine(out), shift, scale)
        out = LoraDense(cfg.out_channels, **dd).apply(
            {"params": p_rest["proj_out"]}, out)
        return self.pipeline.loss_fn(out, target, mask)
