"""HunyuanVideo pipeline adapter (reference models/hunyuan_video.py).

Flow matching over video latents; text conditioning = LLaVA-LLaMA-3-8B
hidden states with the prompt-template crop (crop_start) + CLIP-L pooled,
both pre-cached; distilled guidance fixed at 1000 (reference hunyuan_video
trains with guidance=1.0 * 1000). The hyvideo 3D causal VAE port is pending
(tiny test VAE exercises the path); framerate 24.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..training.flow import TimestepDistribution, sample_timesteps
from . import register_model
from .base import BasePipeline
from .hunyuan_video_model import HunyuanVideoConfig, HunyuanVideoTransformer
from .layers import remat_spec


@register_model("hunyuan-video", "hunyuan_video")
class HunyuanVideoPipeline(BasePipeline):
    name = "hunyuan-video"
    framerate = 24
    cacheable_text_embeddings = ("text_states", "text_mask", "clip_pooled")

    def __init__(self, config):
        super().__init__(config)
        self.tdist = TimestepDistribution.from_model_config(self.model_config)
        self.hv_config = self._build_config()
        self.model = HunyuanVideoTransformer(self.hv_config)

    def _build_config(self) -> HunyuanVideoConfig:
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
            return HunyuanVideoConfig.tiny(**kwargs)
        return HunyuanVideoConfig(**kwargs)

    def init_params(self, rng):
        cfg = self.hv_config
        b, f, h, w, s = 1, 1, 8, 8, 8
        return jax.jit(self.model.init)(
            rng,
            jnp.zeros((b, cfg.in_channels, f, h, w)),
            jnp.zeros((b,)),
            jnp.zeros((b, s, cfg.text_dim)),
            jnp.ones((b, s), jnp.int32),
            jnp.zeros((b, cfg.pooled_projection_dim)),
            jnp.full((b,), 1000.0),
        )

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

        guidance = jnp.full(
            (b,), float(self.model_config.get("guidance", 1.0)) * 1000.0
        )
        model_inputs = dict(
            x=x_t.astype(self.hv_config.dtype),
            t=t * 1000.0,
            text_states=batch["text_states"],
            text_mask=batch["text_mask"].reshape(b, -1),
            pooled=batch["clip_pooled"],
            guidance=guidance,
        )
        return model_inputs, target, mask

    def forward(self, params, model_inputs):
        return self.model.apply(params, **model_inputs)

    # --- caching ------------------------------------------------------------

    def get_call_vae_fn(self):
        mc = self.model_config
        if mc.get("_tiny", False):
            from .wan_vae import WanVAEConfig, WanVideoVAE

            cfg = WanVAEConfig(dim=8, z_dim=16, dim_mult=(1, 2, 4),
                               num_res_blocks=1,
                               temperal_downsample=(True, True))
            vae = WanVideoVAE(cfg)
            params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 5, 32, 32)))
            encode = jax.jit(
                lambda px: vae.apply(params, px, method=type(vae).encode)
            )

            def fn(pixels):
                if pixels.ndim == 4:
                    pixels = pixels[:, :, None]
                return {"latents": np.asarray(
                    encode(jnp.asarray(pixels, jnp.float32))
                )}

            return fn

        # HunyuanVideo 3D causal VAE (hunyuan_vae.py), diffusers-layout
        # weights at model.vae_path
        from .hunyuan_vae import (
            HunyuanVAE,
            HunyuanVAEConfig,
            convert_diffusers_hunyuan_vae,
        )
        from .weights import load_safetensors_dir

        cfg = HunyuanVAEConfig()
        vae = HunyuanVAE(cfg)
        params = convert_diffusers_hunyuan_vae(
            load_safetensors_dir(mc["vae_path"]), cfg
        )
        encode = jax.jit(
            lambda px: vae.apply(params, px, method=type(vae).encode)
        )

        def fn(pixels):
            if pixels.ndim == 4:
                pixels = pixels[:, :, None]
            return {"latents": np.asarray(
                encode(jnp.asarray(pixels, jnp.float32))
            )}

        return fn

    def get_call_text_encoder_fns(self):
        mc = self.model_config
        if mc.get("_tiny", False):
            from ..data.bucketing import seed_from_hash

            cfg = self.hv_config

            def llm(caps):
                states, masks = [], []
                for c in caps:
                    r = np.random.default_rng(seed_from_hash(c))
                    n = min(len(c) + 1, 16)
                    s = np.zeros((16, cfg.text_dim), np.float32)
                    s[:n] = r.standard_normal((n, cfg.text_dim))
                    m = np.zeros((16,), np.int32)
                    m[:n] = 1
                    states.append(s)
                    masks.append(m)
                return {"text_states": np.stack(states),
                        "text_mask": np.stack(masks)}

            def clip(caps):
                return {"clip_pooled": np.stack([
                    np.random.default_rng(seed_from_hash(c + "clip"))
                    .standard_normal((cfg.pooled_projection_dim,))
                    .astype(np.float32)
                    for c in caps
                ])}

            return [llm, clip]

        # LLaVA-LLaMA-3-8B with the hyvideo dit-llm-encode prompt template:
        # system preamble + user caption, crop_start tokens dropped from the
        # hidden states, hidden_state_skip_layer=2 => hidden_states[-3]
        # (reference models/hunyuan_video.py:215-285, hyvideo PROMPT_TEMPLATE).
        from .llm_encoders import LLMTextEncoder
        from .text_encoders import HFTextEncoder

        support_video = bool(mc.get("support_video", True))
        if support_video:
            template = (
                "<|start_header_id|>system<|end_header_id|>\n\nDescribe the "
                "video by detailing the following aspects: "
                "1. The main content and theme of the video."
                "2. The color, shape, size, texture, quantity, text, and "
                "spatial relationships of the objects."
                "3. Actions, events, behaviors temporal relationships, "
                "physical movement changes of the objects."
                "4. background environment, light, style and atmosphere."
                "5. camera angles, movements, and transitions used in the "
                "video:<|eot_id|>"
                "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>"
            )
            crop_start = 95
        else:
            template = (
                "<|start_header_id|>system<|end_header_id|>\n\nDescribe the "
                "image by detailing the color, shape, size, texture, "
                "quantity, text, spatial relationships of the objects and "
                "background:<|eot_id|>"
                "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>"
            )
            crop_start = 36
        skip = int(mc.get("hidden_state_skip_layer", 2))
        enc = LLMTextEncoder(
            mc["llm_path"],
            max_length=int(mc.get("text_len", 256)),
            template=template,
            crop_start=crop_start,
            hidden_layer=-(skip + 1),
        )
        clip_enc = HFTextEncoder(
            "clip_pooled", mc["clip_path"], max_length=77
        )

        def llm_fn(caps):
            h, m = enc.encode(caps)
            return {"text_states": h, "text_mask": m.astype(np.int32)}

        def clip_fn(caps):
            return {"clip_pooled": np.asarray(clip_enc.encode(caps))}

        return [llm_fn, clip_fn]
