"""Cosmos-Predict2 / Anima pipeline adapter (reference models/cosmos_predict2.py).

Flow matching with the reference's reformulation (cosmos_predict2.py:351-408):
logit-normal t, x_t=(1-t)x1+t*x0, target x0-x1, t passed RAW in [0,1] to the
model. Optional multiscale average-pooled loss (reference 491-527). Text:
old-T5-XXL features (1024-d projected? 1024 crossattn channels), cached.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..training.flow import TimestepDistribution, sample_timesteps
from . import register_model
from .base import BasePipeline
from .cosmos_predict2_model import CosmosPredict2Config, CosmosPredict2Transformer
from .layers import remat_spec


@register_model("cosmos_predict2", "anima")
class CosmosPredict2Pipeline(BasePipeline):
    name = "cosmos_predict2"
    framerate = 16
    cacheable_text_embeddings = ("t5_embed",)

    def __init__(self, config):
        super().__init__(config)
        mc = self.model_config
        self.tdist = TimestepDistribution.from_model_config(mc)
        self.cp_config = self._build_config()
        self.model = CosmosPredict2Transformer(self.cp_config)
        # Anima: Qwen3-0.6B tower + TRAINABLE LLMAdapter mapping its hidden
        # states into the old-T5 embedding space (reference
        # cosmos_predict2.py + models/llm_adapter.py:164-199)
        self.anima = mc["type"] == "anima"
        if self.anima:
            from .llm_adapter import LLMAdapter, LLMAdapterConfig

            if mc.get("_tiny", False):
                acfg = LLMAdapterConfig.tiny(
                    source_dim=16,
                    target_dim=self.cp_config.crossattn_emb_channels,
                    model_dim=32,
                )
            else:
                acfg = LLMAdapterConfig(
                    source_dim=int(mc.get("llm_hidden_dim", 1024)),
                    target_dim=self.cp_config.crossattn_emb_channels,
                    model_dim=int(mc.get("llm_adapter_dim", 1024)),
                    num_layers=int(mc.get("llm_adapter_layers", 6)),
                    # reference hardcodes self_attn=True when building the
                    # Anima adapter (cosmos_predict2_modeling.py:1257-1263)
                    self_attn=bool(mc.get("llm_adapter_self_attn", True)),
                )
            self.adapter_config = acfg
            self.llm_adapter = LLMAdapter(acfg)
            self.cacheable_text_embeddings = (
                "llm_hidden_states", "llm_mask", "t5_input_ids", "t5_mask",
            )
            # distinct cache dir (reference cosmos_predict2.py:253)
            self.name = "anima"

    def lr_scale_map(self, base_lr):
        """Per-module LR groups (reference cosmos_predict2.py:449-489):
        self_attn_lr / cross_attn_lr / mlp_lr / mod_lr / llm_adapter_lr.
        Matching is last-substring-wins, so the adaln-modulation keys come
        AFTER self_attn/cross_attn/mlp: reference torch names put the
        modulation tables in their own `.adaln_modulation_*` modules, which
        group under mod_lr, not the attn/mlp LRs."""
        mc = self.model_config
        out = {}
        for key, sub in (("self_attn_lr", "self_attn"),
                         ("cross_attn_lr", "cross_attn"),
                         ("mlp_lr", "mlp_")):
            if mc.get(key) is not None:
                out[sub] = float(mc[key]) / base_lr
        if out or mc.get("mod_lr") is not None:
            # adaln_modulation_{self_attn,cross_attn,mlp} and the final
            # layer's modulation belong to the mod group (default base LR)
            f = (float(mc["mod_lr"]) / base_lr
                 if mc.get("mod_lr") is not None else 1.0)
            out["adaln_modulation"] = f
            out["final_adaln"] = f
        if self.anima and mc.get("llm_adapter_lr") is not None:
            out["llm_adapter"] = float(mc["llm_adapter_lr"]) / base_lr
        return out

    def _build_config(self) -> CosmosPredict2Config:
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
            sequence_sharding=bool(
                self.config.get("sequence_sharding", False)),
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
            return CosmosPredict2Config.tiny(**kwargs)
        return CosmosPredict2Config.p2b_2b(**kwargs)

    def init_params(self, rng):
        cfg = self.cp_config
        params = jax.jit(self.model.init)(
            rng,
            jnp.zeros((1, cfg.in_channels, 1, 8, 8)),
            jnp.zeros((1,)),
            jnp.zeros((1, 8, cfg.crossattn_emb_channels)),
        )
        if self.anima:
            import flax

            ap = jax.jit(self.llm_adapter.init)(
                jax.random.fold_in(rng, 1),
                jnp.zeros((1, 8, self.adapter_config.source_dim)),
                jnp.zeros((1, 8), jnp.int32),
            )
            base = flax.core.unfreeze(params)
            base["params"]["llm_adapter"] = flax.core.unfreeze(ap)["params"]
            params = base
        return params

    def prepare_inputs(self, rng, batch, timestep_quantile=None):
        latents = batch["latents"].astype(jnp.float32)
        b, c, f, h, w = latents.shape

        mask = batch.get("mask")
        if mask is not None:
            m = jax.image.resize(
                mask.astype(jnp.float32), (b, h, w), method="nearest"
            )
            mask = m[:, None, None]

        t_key, n_key = jax.random.split(rng)
        t = sample_timesteps(
            t_key, b, self.tdist, quantile=timestep_quantile,
            image_seq_len=(h // 2) * (w // 2),
        )
        noise = jax.random.normal(n_key, latents.shape, jnp.float32)
        t_exp = t.reshape(b, 1, 1, 1, 1)
        x_t = (1 - t_exp) * latents + t_exp * noise
        target = noise - latents

        if self.anima:
            model_inputs = dict(
                x=x_t.astype(self.cp_config.dtype),
                t=t,
                llm_hidden_states=batch["llm_hidden_states"],
                llm_mask=batch["llm_mask"].reshape(b, -1),
                t5_input_ids=batch["t5_input_ids"].reshape(b, -1)
                .astype(jnp.int32),
                # self-attn mask over the padded T5 query stream + padded-
                # row zeroing (reference cosmos_predict2.py:584-593)
                t5_mask=batch["t5_mask"].reshape(b, -1).astype(jnp.int32),
            )
        else:
            model_inputs = dict(
                x=x_t.astype(self.cp_config.dtype),
                t=t,  # RAW [0,1] (reference cosmos_predict2.py:405-408)
                context=batch["t5_embed"],
            )
        return model_inputs, target, mask

    def sample(self, params, width, height, key, num_steps=20,
               guidance_scale=1.0, num_frames=1, **embeds):
        """Euler flow sampling through the training forward (reference
        CommonPipeline.sample, models/base.py:263-291). t2i/t2v preview;
        Anima samples through its Qwen conditioning. Returns latents
        [B, C, F, h, w] (Wan VAE: /8 spatial, 4x temporal)."""
        from ..training.sampling import euler_flow_sample

        b = (embeds["llm_hidden_states"] if self.anima
             else embeds["t5_embed"]).shape[0]
        c = self.cp_config.in_channels
        h, w = height // 8, width // 8
        f = max(1, (int(num_frames) - 1) // 4 + 1)

        def vel(x, t):
            if self.anima:
                mi = dict(
                    x=x.astype(self.cp_config.dtype),
                    t=t,
                    llm_hidden_states=embeds["llm_hidden_states"],
                    llm_mask=embeds["llm_mask"].reshape(b, -1),
                    t5_input_ids=embeds["t5_input_ids"].reshape(b, -1)
                    .astype(jnp.int32),
                    t5_mask=embeds["t5_mask"].reshape(b, -1)
                    .astype(jnp.int32),
                )
            else:
                mi = dict(
                    x=x.astype(self.cp_config.dtype),
                    t=t,
                    context=embeds["t5_embed"],
                )
            return self.forward(params, mi).astype(jnp.float32)

        return euler_flow_sample(
            vel, (b, c, f, h, w), key, num_steps=num_steps,
            guidance_scale=guidance_scale,
            shift=self.model_config.get("shift"),
        )

    def make_pp_program(self):
        """Pipeline-parallel program: one phase over the MiniTrainDIT block
        scan; patch/time embedding (+ the Anima LLMAdapter, whose context
        output rides in the payload) on stage 0, adaLN-LoRA final layer +
        unpatchify + loss on the last stage. Subclassed by the EDM cosmos
        pipeline which threads (x_t, sigma) to the head for c_skip/c_out
        preconditioning. See parallel/model_pp.py."""
        return _CosmosPredict2PPProgram(self)

    def forward(self, params, model_inputs):
        if self.anima:
            mi = dict(model_inputs)
            p = dict(params["params"])
            adapter_params = {"params": p.pop("llm_adapter")}
            t5_mask = mi.pop("t5_mask", None)
            context = self.llm_adapter.apply(
                adapter_params,
                mi.pop("llm_hidden_states"),
                mi.pop("t5_input_ids"),
                target_mask=t5_mask,
                source_mask=mi.pop("llm_mask"),
            )
            if t5_mask is not None:
                # reference zeroes padded adapter-output rows
                # (cosmos_predict2.py:593: crossattn_emb[~t5_attn_mask]=0)
                context = context * t5_mask[..., None].astype(context.dtype)
            return self.model.apply({"params": p}, context=context, **mi)
        return self.model.apply(params, **model_inputs)

    # pixel side-length thresholds gating each successive 2x pooling
    # (reference cosmos_predict2.py:34-35: [1024 * 0.9])
    MULTISCALE_LOSS_THRESHOLDS = (1024 * 0.9,)

    def loss_fn(self, output, target, mask):
        """Masked loss + optional multiscale avg-pool terms (reference
        cosmos_predict2.py:491-527): `model.multiscale_loss_weight` adds a
        2x-avg-pooled MSE term per threshold the (pixel-space) side length
        clears, then normalizes by the total weight."""
        base = super().loss_fn(output, target, mask)
        weight = self.model_config.get("multiscale_loss_weight")
        if not weight:
            return base
        # [B,C,F,H,W] single-frame latents -> [B,C,H,W]
        o = output.astype(jnp.float32)[:, :, 0]
        tgt = target.astype(jnp.float32)[:, :, 0]
        h, w = tgt.shape[-2:]
        side_length = float(np.sqrt(h * w)) * 8
        terms = [base]
        total_weight = 1.0
        for thresh in self.MULTISCALE_LOSS_THRESHOLDS:
            if side_length < thresh:
                break
            pool = lambda x: jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            ) / 4.0
            o, tgt = pool(o), pool(tgt)
            terms.append(jnp.mean((o - tgt) ** 2) * weight)
            total_weight += weight
        return sum(terms) / total_weight

    def get_call_vae_fn(self):
        mc = self.model_config
        if mc.get("_tiny", False):
            return self._tiny_vae_fn()
        # the reference reuses the Wan VAE for predict2
        from .wan_vae_convert import load_wan_vae

        vae, params = load_wan_vae(mc["vae_path"])
        encode = jax.jit(lambda px: vae.apply(params, px, method=type(vae).encode))

        def fn(pixels):
            if pixels.ndim == 4:
                pixels = pixels[:, :, None]
            return {"latents": np.asarray(encode(jnp.asarray(pixels, jnp.float32)))}

        return fn

    def _tiny_vae_fn(self):
        from .wan_vae import WanVAEConfig, WanVideoVAE

        cfg = WanVAEConfig(dim=8, z_dim=16, dim_mult=(1, 2, 4),
                           num_res_blocks=1, temperal_downsample=(True, True))
        vae = WanVideoVAE(cfg)
        params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 5, 32, 32)))
        encode = jax.jit(lambda px: vae.apply(params, px, method=type(vae).encode))

        def fn(pixels):
            if pixels.ndim == 4:
                pixels = pixels[:, :, None]
            return {"latents": np.asarray(encode(jnp.asarray(pixels, jnp.float32)))}

        return fn

    def _keymap_config(self):
        return self.cp_config

    def keymap(self):
        return cosmos_predict2_keymap()

    def load_weights(self):
        from .keymaps import (keymap_to_flax, load_sd_for_pipeline,
                              strip_known_prefixes)

        # strip 'net.'/'diffusion_model.' wrappers BEFORE the embedded-
        # adapter membership check below: reference checkpoints prefix
        # every key with 'net.' and the reference strips it first
        # (cosmos_predict2.py:264-284)
        sd = strip_known_prefixes(load_sd_for_pipeline(self), self.keymap())
        params = keymap_to_flax(sd, self.keymap(), self.cp_config)
        if self.anima:
            # Trainable LLMAdapter weights: a standalone llm_adapter_path
            # file, or llm_adapter.* keys shipped inside the DiT checkpoint
            # (reference cosmos_predict2.py:274-300). Absent both, the
            # adapter keeps its from-scratch init (the reference trains it
            # from scratch in that case too).
            from .llm_adapter import convert_llm_adapter

            mc = self.model_config
            if mc.get("llm_adapter_path"):
                from .weights import load_state_dict_any

                asd = load_state_dict_any(mc["llm_adapter_path"])
                params["params"]["llm_adapter"] = convert_llm_adapter(asd)
            elif "llm_adapter.out_proj.weight" in sd:
                asd = {k: v for k, v in sd.items()
                       if k.startswith("llm_adapter.")}
                params["params"]["llm_adapter"] = convert_llm_adapter(asd)
        return params

    def get_call_text_encoder_fns(self):
        mc = self.model_config
        if mc.get("_tiny", False):
            from ..data.bucketing import seed_from_hash

            cfg = self.cp_config

            if self.anima:
                def te_anima(caps):
                    out = {"llm_hidden_states": [], "llm_mask": [],
                           "t5_input_ids": [], "t5_mask": []}
                    for c in caps:
                        r = np.random.default_rng(seed_from_hash(c))
                        out["llm_hidden_states"].append(
                            r.standard_normal((8, 16)).astype(np.float32))
                        out["llm_mask"].append(np.ones((8,), np.int32))
                        out["t5_input_ids"].append(
                            r.integers(0, 63, (8,)).astype(np.int32))
                        out["t5_mask"].append(np.ones((8,), np.int32))
                    return {k: np.stack(v) for k, v in out.items()}

                return [te_anima]

            def te(caps):
                return {"t5_embed": np.stack([
                    np.random.default_rng(seed_from_hash(c))
                    .standard_normal((8, cfg.crossattn_emb_channels))
                    .astype(np.float32) for c in caps
                ])}

            return [te]

        if self.anima:
            # cache Qwen3 hidden states + T5 token ids; the trainable
            # LLMAdapter runs IN-GRAPH at train time
            from transformers import AutoTokenizer

            from .llm_encoders import LLMTextEncoder

            qwen = LLMTextEncoder(
                mc["text_encoder_path"],
                max_length=int(mc.get("max_sequence_length", 512)),
                hidden_layer=-1,
            )
            t5_tok = AutoTokenizer.from_pretrained(mc["t5_tokenizer_path"])

            def fn(caps):
                h, m = qwen.encode(caps)
                tok = t5_tok(caps, padding="max_length", truncation=True,
                             max_length=512, return_tensors="np")
                return {
                    "llm_hidden_states": h,
                    "llm_mask": m.astype(np.int32),
                    "t5_input_ids": np.asarray(tok["input_ids"], np.int32),
                    "t5_mask": np.asarray(tok["attention_mask"], np.int32),
                }

            return [fn]

        # old T5-XXL, max_length 512, padded positions zeroed (reference
        # cosmos_predict2.py:155-172); Anima's Qwen3 tower routes through
        # llm_encoders when text_encoder_path points at a causal LM.
        import json as _json
        from pathlib import Path as _Path

        path = mc.get("t5_path") or mc["text_encoder_path"]
        with open(_Path(path) / "config.json") as f:
            is_t5 = "t5" in _json.load(f).get("model_type", "t5")
        te_fp8 = bool(mc.get("text_encoder_fp8"))
        if mc.get("text_encoder_nf4"):
            # reference cosmos_predict2.py:213-221 uses bitsandbytes nf4;
            # there is no TPU nf4 kernel — store fp8_e4m3 instead (2x the
            # nf4 footprint, half of bf16) and say so
            import warnings

            warnings.warn(
                "text_encoder_nf4: TPU build stores the text encoder in "
                "float8_e4m3 instead of nf4 (no bitsandbytes on TPU): "
                "half the bf16 footprint, twice nf4's.", stacklevel=2,
            )
            te_fp8 = True
        if is_t5:
            from .text_encoders import HFTextEncoder

            enc = HFTextEncoder("t5", path, max_length=512, fp8=te_fp8)

            def fn(caps):
                h, m = enc.encode(caps, return_mask=True)
                return {"t5_embed": h * m[..., None].astype(h.dtype)}

            return [fn]
        from .llm_encoders import LLMTextEncoder

        enc = LLMTextEncoder(path, max_length=512, hidden_layer=-1,
                             fp8=te_fp8)

        def fn(caps):
            h, m = enc.encode(caps)
            return {"t5_embed": np.asarray(h) * m[..., None].astype(h.dtype)}

        return [fn]


def cosmos_predict2_keymap():
    """MiniTrainDIT checkpoint keys (reference vendored
    models/cosmos_predict2_modeling.py; comfy prefixes `net.` stripped by
    the loader, cosmos_predict2.py:264-272) <-> our stacked layout. LoRA
    export: ComfyUI 'diffusion_model.' prefix (reference
    cosmos_predict2.py:316-321)."""
    from .keymaps import BlockGroup, KeyMap

    return KeyMap(
        blocks=[BlockGroup(
            "blocks", "blocks", "num_blocks",
            linears={
                "self_attn_q": "self_attn.q_proj",
                "self_attn_k": "self_attn.k_proj",
                "self_attn_v": "self_attn.v_proj",
                "self_attn_o": "self_attn.output_proj",
                "cross_attn_q": "cross_attn.q_proj",
                "cross_attn_k": "cross_attn.k_proj",
                "cross_attn_v": "cross_attn.v_proj",
                "cross_attn_o": "cross_attn.output_proj",
                "mlp_1": "mlp.layer1",
                "mlp_2": "mlp.layer2",
                "adaln_modulation_self_attn_1":
                    "adaln_modulation_self_attn.1",
                "adaln_modulation_self_attn_2":
                    "adaln_modulation_self_attn.2",
                "adaln_modulation_cross_attn_1":
                    "adaln_modulation_cross_attn.1",
                "adaln_modulation_cross_attn_2":
                    "adaln_modulation_cross_attn.2",
                "adaln_modulation_mlp_1": "adaln_modulation_mlp.1",
                "adaln_modulation_mlp_2": "adaln_modulation_mlp.2",
            },
            norms={
                "self_attn_q_norm": "self_attn.q_norm",
                "self_attn_k_norm": "self_attn.k_norm",
                "cross_attn_q_norm": "cross_attn.q_norm",
                "cross_attn_k_norm": "cross_attn.k_norm",
            },
        )],
        top_linears={
            "x_embedder": "x_embedder.proj.1",
            "t_embedder_1": "t_embedder.1.linear_1",
            "t_embedder_2": "t_embedder.1.linear_2",
            "final_adaln_1": "final_layer.adaln_modulation.1",
            "final_adaln_2": "final_layer.adaln_modulation.2",
            "final_linear": "final_layer.linear",
        },
        top_norms={"t_embedding_norm": "t_embedding_norm"},
        strip_prefixes=("model.diffusion_model.", "diffusion_model.",
                        "net."),
        lora_prefix="diffusion_model.",
    )


class _CosmosPredict2PPProgram:
    """PPProgram for CosmosPredict2Transformer (see parallel/model_pp.py).

    Raw-param re-expression of cosmos_predict2_model.py's __call__ split at
    the block scan. Payload: (xe [B,L,D], emb [B,D], adaln_lora [B,3D],
    context [B,Lc,D], extras) where extras is () or the EDM (x_t, sigma).
    """

    def __init__(self, pipeline):
        from ..parallel.model_pp import PPPhase

        self.pipeline = pipeline
        cfg = pipeline.cp_config
        self.cfg = cfg
        self.phases = [
            PPPhase("blocks", cfg.num_blocks, self._apply_block)
        ]

    def _apply_block(self, p_i, payload, ctx):
        from .cosmos_predict2_model import CosmosBlock

        xe, emb, adaln_lora, context, extras = payload
        xe, _ = CosmosBlock(self.cfg).apply(
            {"params": p_i}, xe, emb, adaln_lora, context,
            ctx["rope_cos"], ctx["rope_sin"],
        )
        return (xe, emb, adaln_lora, context, extras)

    def make_ctx(self, p_rest, mi0):
        from .cosmos_predict2_model import cosmos_rope_angles

        cfg = self.cfg
        _b, _c, tt, hh, ww = mi0["x"].shape
        ps, pt = cfg.patch_spatial, cfg.patch_temporal
        gt, gh, gw = tt // pt, hh // ps, ww // ps
        angles = jnp.asarray(cosmos_rope_angles(cfg, gt, gh, gw, None))
        return {"rope_cos": jnp.cos(angles), "rope_sin": jnp.sin(angles),
                "grid": (gt, gh, gw)}

    def _extras(self, mi):
        return ()

    def _context(self, p_rest, mi):
        if getattr(self.pipeline, "anima", False):
            t5_mask = mi.get("t5_mask")
            context = self.pipeline.llm_adapter.apply(
                {"params": p_rest["llm_adapter"]},
                mi["llm_hidden_states"],
                mi["t5_input_ids"],
                target_mask=t5_mask,
                source_mask=mi["llm_mask"],
            )
            if t5_mask is not None:
                # reference cosmos_predict2.py:593
                context = context * t5_mask[..., None].astype(context.dtype)
            return context
        return mi["context"]

    def embed(self, p_rest, mi, ctx):
        import math

        import flax.linen as nn

        from .layers import LoraDense, RMSNorm

        cfg = self.cfg
        dim = cfg.model_channels
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        x, t = mi["x"], mi["t"]
        b, c, tt, hh, ww = x.shape
        ps, pt = cfg.patch_spatial, cfg.patch_temporal
        gt, gh, gw = ctx["grid"]
        seq = gt * gh * gw

        if cfg.concat_padding_mask:
            pm = jnp.zeros((b, 1, tt, hh, ww), x.dtype)
            x = jnp.concatenate([x, pm.astype(x.dtype)], axis=1)
            c = c + 1
        xe = x.reshape(b, c, gt, pt, gh, ps, gw, ps)
        xe = jnp.einsum("bctrhmwn->bthwcrmn", xe).reshape(
            b, seq, c * pt * ps * ps)
        xe = LoraDense(dim, use_bias=False, **dd).apply(
            {"params": p_rest["x_embedder"]}, xe.astype(cfg.dtype))

        half = dim // 2
        exponent = jnp.exp(
            -math.log(10000) * jnp.arange(half, dtype=jnp.float32) / half
        )
        args = t.astype(jnp.float32)[:, None] * exponent[None]
        sincos = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        e1 = LoraDense(dim, use_bias=not cfg.use_adaln_lora, **dd).apply(
            {"params": p_rest["t_embedder_1"]}, sincos.astype(cfg.dtype))
        e2 = LoraDense(
            3 * dim if cfg.use_adaln_lora else dim, use_bias=False, **dd
        ).apply({"params": p_rest["t_embedder_2"]}, nn.silu(e1))
        if cfg.use_adaln_lora:
            emb, adaln_lora = sincos.astype(cfg.dtype), e2
        else:
            emb, adaln_lora = e2, jnp.zeros((b, 3 * dim), cfg.dtype)
        emb = RMSNorm(eps=1e-6, dtype=cfg.dtype,
                      param_dtype=cfg.param_dtype).apply(
            {"params": p_rest["t_embedding_norm"]}, emb)

        context = self._context(p_rest, mi).astype(cfg.dtype)
        return (xe, emb, adaln_lora, context, self._extras(mi))

    def _finalize(self, out, extras, target, mask):
        return self.pipeline.loss_fn(out, target, mask)

    def head_loss(self, p_rest, payload, target, mask, ctx):
        import flax.linen as nn

        from .layers import LoraDense

        cfg = self.cfg
        dim = cfg.model_channels
        ps, pt = cfg.patch_spatial, cfg.patch_temporal
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        gt, gh, gw = ctx["grid"]
        xe, emb, adaln_lora, _context, extras = payload
        b = xe.shape[0]

        if cfg.use_adaln_lora:
            y = LoraDense(cfg.adaln_lora_dim, use_bias=False, **dd).apply(
                {"params": p_rest["final_adaln_1"]}, nn.silu(emb))
            y = LoraDense(2 * dim, use_bias=False, **dd).apply(
                {"params": p_rest["final_adaln_2"]}, y)
            y = y + adaln_lora[:, : 2 * dim]
        else:
            y = LoraDense(2 * dim, use_bias=False, **dd).apply(
                {"params": p_rest["final_adaln_1"]}, nn.silu(emb))
        shift, scale = jnp.split(y, 2, axis=-1)
        xf = xe.astype(jnp.float32)
        mean = jnp.mean(xf, -1, keepdims=True)
        var = jnp.var(xf, -1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
        xf = xf * (1 + scale[:, None].astype(jnp.float32)) + shift[
            :, None
        ].astype(jnp.float32)
        out = LoraDense(ps * ps * pt * cfg.out_channels, use_bias=False,
                        dtype=jnp.float32,
                        param_dtype=cfg.param_dtype).apply(
            {"params": p_rest["final_linear"]}, xf)
        out = out.reshape(b, gt, gh, gw, ps, ps, pt, cfg.out_channels)
        out = jnp.einsum("bthwmnrc->bctrhmwn", out)
        out = out.reshape(b, cfg.out_channels, gt * pt, gh * ps, gw * ps)
        return self._finalize(out, extras, target, mask)
