"""Flux pipeline adapter: training-input preparation + weight conversion.

Re-implements the training semantics of reference models/flux.py:
- prepare_inputs (flux.py:320-392): rectified-flow noising with logit-normal
  t (optionally shift / resolution-dependent flux_shift), 2x2 latent
  patchify, 3-axis image position ids, mask resized to latent resolution and
  patchified, guidance vector, Kontext control-latent sequence concat with
  ids[..., 0] = 1.
- model: FluxTransformer (flux_model.py), diffusers/BFL weights convertible
  via convert_diffusers_weights.

TPU-first difference: prepare_inputs is pure jax and runs inside the jitted
train step (noise + t sampled from an explicit PRNG key), instead of on CPU
inside the dataloader (reference dataset.py:1357-1368) — the target never
needs the reference's first->last pipeline-stage broadcast hack
(dataset.py:1370-1388).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import einops
import jax
import jax.numpy as jnp

from ..training.flow import TimestepDistribution, sample_timesteps
from . import register_model
from .base import BasePipeline
from .flux_model import FluxConfig, FluxTransformer
from .layers import remat_spec


def pack_latents(x):
    """[B, C, H, W] -> [B, (H/2)(W/2), C*4] (flux 2x2 patchify,
    reference flux.py:375-376)."""
    return einops.rearrange(x, "b c (h ph) (w pw) -> b (h w) (c ph pw)", ph=2, pw=2)


def unpack_latents(x, h, w):
    return einops.rearrange(
        x, "b (h w) (c ph pw) -> b c (h ph) (w pw)", h=h // 2, w=w // 2, ph=2, pw=2
    )


def latent_image_ids(h_half: int, w_half: int, modality: int = 0):
    """[h/2 * w/2, 3] ids: (modality, row, col) (diffusers
    _prepare_latent_image_ids semantics; reference flux.py:336,384-386)."""
    row = jnp.repeat(jnp.arange(h_half), w_half)
    col = jnp.tile(jnp.arange(w_half), h_half)
    mod = jnp.full_like(row, modality)
    return jnp.stack([mod, row, col], axis=-1).astype(jnp.float32)


def resize_mask_to_latents(mask, h, w, c):
    """mask [B, Hm, Wm] -> [B, c, h, w] nearest-resize + channel expand
    (reference flux.py:330-333)."""
    b = mask.shape[0]
    m = jax.image.resize(mask.astype(jnp.float32), (b, h, w), method="nearest")
    return jnp.broadcast_to(m[:, None], (b, c, h, w))


@register_model("flux", "flex", "flux-kontext")
class FluxPipeline(BasePipeline):
    name = "flux"
    cacheable_text_embeddings = ("t5_embed", "clip_embed")

    def __init__(self, config):
        super().__init__(config)
        mc = self.model_config
        self.tdist = TimestepDistribution.from_model_config(mc)
        # FLEX models train with the guidance embedder silenced while its
        # params stay in the checkpoint (reference flux.py:187-190 +
        # utils/patches.py bypass_flux_guidance)
        self._bypass_guidance = bool(mc.get("bypass_guidance_embedding", False))
        self.flux_config = self._build_flux_config()
        self.model = FluxTransformer(self.flux_config)

    def _build_flux_config(self) -> FluxConfig:
        mc = self.model_config
        from ..common import dtype_from_string

        adapter = self.config.get("adapter", {})
        kwargs: Dict[str, Any] = dict(
            dtype=dtype_from_string(mc.get("dtype", "bfloat16")),
            param_dtype=dtype_from_string(mc.get("dtype", "bfloat16")),
            # transformer_dtype = 'float8' stores block kernels fp8
            # (reference models/flux.py:201-203)
            base_kernel_dtype=(
                dtype_from_string(mc["transformer_dtype"])
                if mc.get("transformer_dtype")
                else None
            ),
            guidance_embeds=bool(mc.get("guidance_embeds", True)),
            remat=remat_spec(self.config),
            int8_matmul=mc.get("int8_matmul", False),
            sequence_sharding=bool(self.config.get("sequence_sharding", False)),
        )
        n_layers = int(mc.get("num_layers", 19))
        n_single = int(mc.get("num_single_layers", 38))
        if mc.get("_tiny", False):
            n_layers, n_single = 2, 2
        n = int(self.config.get("blocks_to_swap", 0) or 0)
        if n > 0:
            # reference split (models/flux.py:404-418): double = N//2,
            # single = (N - N//2)*2 + 1, each swapping the DEEPEST blocks
            # of its stack (utils/offloading.py:184). Where the reference
            # asserts the per-stack caps (num-2), a 16 GB chip legitimately
            # needs MORE than the caps allow — map that to whole-stack
            # streaming instead of failing.
            dbl = n // 2
            sgl = (n - dbl) * 2 + 1
            if dbl > n_layers - 2 or sgl > n_single - 2:
                dbl, sgl = n_layers, n_single
            kwargs["offload_tail_double"] = dbl
            kwargs["offload_tail_single"] = sgl
        kwargs["stream_prefetch"] = self.config.get("stream_prefetch", False)
        if adapter.get("type") in ("lora", "lokr"):
            # only adapter factors are trainable in a streamed stack: the
            # prefetch backward skips real grads for frozen base leaves
            kwargs["stream_grad_leaves"] = (
                "lora_a", "lora_b", "lokr_w1", "lokr_w2",
                "lokr_w2_a", "lokr_w2_b",
            )
        if adapter.get("type") in ("lora", "lokr"):
            kwargs.update(
                lora_rank=int(adapter["rank"]),
                lora_type=adapter["type"],
                lokr_factor=int(adapter.get("decompose_factor", -1)),
                lokr_rank_dropout=float(adapter.get("rank_dropout", 0.0)),
                lora_alpha=float(adapter["alpha"]),
                lora_dropout=float(adapter.get("dropout", 0.0)),
                # reference casts trainables to the adapter dtype
                # (models/base.py:258-260); default = model dtype
                lora_dtype=dtype_from_string(
                    adapter.get("dtype", mc.get("dtype", "bfloat16"))
                ),
            )
        if mc.get("_tiny", False):  # test hook
            return FluxConfig.tiny(**kwargs)
        return FluxConfig(**kwargs)

    def build_model(self):
        return self.model

    def init_params(self, rng, sample_batch=None):
        cfg = self.flux_config
        b, simg, stxt = 1, 16, 8
        x = jnp.zeros((b, simg, cfg.in_channels), cfg.dtype)
        t5 = jnp.zeros((b, stxt, cfg.joint_attention_dim), cfg.dtype)
        clip = jnp.zeros((b, cfg.pooled_projection_dim), cfg.dtype)
        t = jnp.zeros((b,), jnp.float32)
        img_ids = latent_image_ids(4, 4)
        txt_ids = jnp.zeros((stxt, 3), jnp.float32)
        g = jnp.ones((b,), jnp.float32) if cfg.guidance_embeds else None
        # jit so the 12B-param init runs as one XLA program on device
        return jax.jit(self.model.init)(rng, x, t5, clip, t, img_ids, txt_ids, g)

    def prepare_inputs(self, rng, batch, timestep_quantile=None):
        """batch: latents [B,16,H,W], t5_embed [B,S,4096], clip_embed [B,768],
        optional mask [B,Hm,Wm], optional control_latents [B,16,H,W],
        optional t5_mask [B,S]."""
        latents = batch["latents"].astype(jnp.float32)
        b, c, h, w = latents.shape
        image_seq_len = (h // 2) * (w // 2)

        mask = batch.get("mask")
        if mask is not None:
            mask = resize_mask_to_latents(mask, h, w, c)
            mask = pack_latents(mask)

        t_key, n_key = jax.random.split(rng)
        t = sample_timesteps(
            t_key, b, self.tdist, quantile=timestep_quantile,
            image_seq_len=image_seq_len,
        )
        noise = jax.random.normal(n_key, latents.shape, jnp.float32)
        t_exp = t.reshape(b, 1, 1, 1)
        x_t = (1.0 - t_exp) * latents + t_exp * noise
        target = noise - latents

        x_t = pack_latents(x_t)
        target = pack_latents(target)

        img_ids = latent_image_ids(h // 2, w // 2)
        txt_ids = jnp.zeros((batch["t5_embed"].shape[1], 3), jnp.float32)
        guidance = jnp.full((b,), float(self.model_config.get("guidance", 1.0)))

        if "control_latents" in batch and batch["control_latents"] is not None:
            control = pack_latents(batch["control_latents"].astype(jnp.float32))
            control_ids = latent_image_ids(h // 2, w // 2, modality=1)
            img_ids = jnp.concatenate([img_ids, control_ids], axis=0)
            x_t = jnp.concatenate([x_t, control], axis=1)

        model_inputs = dict(
            hidden_states=x_t.astype(self.flux_config.dtype),
            encoder_hidden_states=batch["t5_embed"].astype(self.flux_config.dtype),
            pooled_projections=batch["clip_embed"].astype(self.flux_config.dtype),
            timestep=t,
            img_ids=img_ids,
            txt_ids=txt_ids,
            guidance=(
                guidance
                if self.flux_config.guidance_embeds and not self._bypass_guidance
                else None
            ),
            txt_mask=batch.get("t5_mask"),
            img_seq_len=image_seq_len,
        )
        return model_inputs, target, mask

    def host_stack_names(self):
        """Param-stack names the trainer moves to host RAM (exact-N
        blocks_to_swap; see FluxConfig.double_split/single_split)."""
        cfg = self.flux_config
        names = []
        for stack, (n_res, n_swap), total in (
            ("double_blocks", cfg.double_split, cfg.num_layers),
            ("single_blocks", cfg.single_split, cfg.num_single_layers),
        ):
            if n_swap == 0:
                continue
            names.append(stack if n_swap == total else f"{stack}_swap")
        return tuple(names)

    def forward(self, params, model_inputs):
        return self.model.apply(params, **model_inputs)

    def sample(self, params, t5_embed, clip_embed, width, height, key,
               num_steps=20, guidance_scale=1.0, uncond_embeds=None):
        """Euler flow sampling through the training forward (reference
        models/base.py:263-291). Returns latents [B, 16, h, w]."""
        from ..training.sampling import euler_flow_sample

        b = t5_embed.shape[0]
        h, w = height // 8, width // 8
        img_ids = latent_image_ids(h // 2, w // 2)
        txt_ids = jnp.zeros((t5_embed.shape[1], 3), jnp.float32)
        guidance = jnp.full((b,), float(self.model_config.get("guidance", 1.0)))

        def vel(embeds, pooled):
            def fn(x, t):
                packed = pack_latents(x)
                out = self.forward(params, dict(
                    hidden_states=packed.astype(self.flux_config.dtype),
                    encoder_hidden_states=embeds.astype(self.flux_config.dtype),
                    pooled_projections=pooled.astype(self.flux_config.dtype),
                    timestep=t,
                    img_ids=img_ids,
                    txt_ids=txt_ids,
                    guidance=(
                        guidance
                        if self.flux_config.guidance_embeds
                        and not self._bypass_guidance
                        else None
                    ),
                    txt_mask=None,
                    img_seq_len=(h // 2) * (w // 2),
                ))
                return unpack_latents(out.astype(jnp.float32), h, w)

            return fn

        uncond_fn = None
        if uncond_embeds is not None:
            uncond_fn = vel(uncond_embeds["t5_embed"],
                            uncond_embeds["clip_embed"])
        return euler_flow_sample(
            vel(t5_embed, clip_embed), (b, 16, h, w), key,
            num_steps=num_steps, guidance_scale=guidance_scale,
            uncond_velocity_fn=uncond_fn,
            shift=self.model_config.get("shift"),
        )

    def save_adapter(self, out_dir, trainable):
        """diffusers-lora safetensors export (reference flux save_adapter
        writes the diffusers format, models/flux.py:255-288)."""
        import numpy as np
        from safetensors.numpy import save_file

        from .flux_convert import export_lora_diffusers
        from flax import linen as nn

        sd = export_lora_diffusers(nn.unbox(trainable), self.flux_config)
        save_file(sd, str(Path(out_dir) / "adapter_model.safetensors"))

    def load_adapter(self, path, params):
        """adapter.init_from_existing: load a diffusers-lora safetensors dir
        saved by us (or the reference) into the fresh LoRA factors."""
        from safetensors.numpy import load_file

        from .flux_convert import import_lora_diffusers

        files = sorted(Path(path).glob("*.safetensors"))
        if len(files) != 1:
            raise RuntimeError(
                f"init_from_existing: expected exactly one safetensors file "
                f"in {path}, found {len(files)}"
            )
        return import_lora_diffusers(load_file(str(files[0])), self.flux_config, params)

    def _keymap_config(self):
        return self.flux_config

    def keymap(self):
        """diffusers FluxTransformer2DModel keys as a declarative KeyMap —
        drives the generic full-FT save_model (diffusers layout; reference
        BFL save is models/flux.py:255-288, the diffusers dialect loads in
        every downstream tool)."""
        from .flux_convert import (
            _DOUBLE_MAP,
            _DOUBLE_NORMS,
            _SINGLE_MAP,
            _SINGLE_NORMS,
        )
        from .keymaps import BlockGroup, KeyMap

        cfg = self.flux_config
        top_linears = {
            "x_embedder": "x_embedder",
            "context_embedder": "context_embedder",
            "timestep_embedder/linear_1":
                "time_text_embed.timestep_embedder.linear_1",
            "timestep_embedder/linear_2":
                "time_text_embed.timestep_embedder.linear_2",
            "text_embedder/linear_1":
                "time_text_embed.text_embedder.linear_1",
            "text_embedder/linear_2":
                "time_text_embed.text_embedder.linear_2",
            "norm_out_linear": "norm_out.linear",
            "proj_out": "proj_out",
        }
        if cfg.guidance_embeds:
            top_linears.update({
                "guidance_embedder/linear_1":
                    "time_text_embed.guidance_embedder.linear_1",
                "guidance_embedder/linear_2":
                    "time_text_embed.guidance_embedder.linear_2",
            })
        # partial blocks_to_swap: the deepest blocks live in "<stack>_swap"
        # flax collections but keep the reference's single-stack checkpoint
        # indices (BlockGroup.offset folds them back)
        blocks = []
        for stack, prefix, (n_res, n_swap), res_attr, swap_attr, lin, nrm in (
            ("double_blocks", "transformer_blocks", cfg.double_split,
             "num_double_res", "num_double_swap", _DOUBLE_MAP, _DOUBLE_NORMS),
            ("single_blocks", "single_transformer_blocks", cfg.single_split,
             "num_single_res", "num_single_swap", _SINGLE_MAP, _SINGLE_NORMS),
        ):
            split = 0 < n_swap and n_res > 0
            blocks.append(BlockGroup(
                stack, prefix, res_attr if split else
                ("num_layers" if stack == "double_blocks"
                 else "num_single_layers"),
                linears=dict(lin), norms=dict(nrm)))
            if split:
                blocks.append(BlockGroup(
                    f"{stack}_swap", prefix, swap_attr, offset=n_res,
                    linears=dict(lin), norms=dict(nrm)))
        return KeyMap(
            blocks=blocks,
            top_linears=top_linears,
            lora_prefix="transformer.",
        )

    # --- pretrained weights -------------------------------------------------

    def load_weights(self):
        """Convert diffusers FluxTransformer2DModel weights to our params.

        model_config['diffusers_path'] points at the diffusers repo folder
        (same config surface as the reference, docs/supported_models.md) or
        'transformer_path' directly at the transformer safetensors.
        """
        from .flux_convert import convert_bfl_flux, convert_diffusers_flux
        from .weights import load_safetensors_dir

        mc = self.model_config
        path = mc.get("transformer_path")
        if path is None:
            path = str(Path(mc["diffusers_path"]) / "transformer")
        sd = load_safetensors_dir(path)
        from .weights import merge_adapters_into_state_dict

        sd = merge_adapters_into_state_dict(
            sd, mc.get("merge_adapters", [])
        )
        if any(k.startswith("double_blocks.") for k in sd):
            # BFL single-file format (reference flux.py:22-109 key map)
            return convert_bfl_flux(sd, self.flux_config)
        return convert_diffusers_flux(sd, self.flux_config)

    # --- caching encoders ---------------------------------------------------

    def _load_vae(self):
        if getattr(self, "_vae", None) is None:
            from .autoencoder_kl import AutoencoderKL, VAEConfig, convert_diffusers_vae
            from .weights import load_safetensors_dir

            mc = self.model_config
            if mc.get("_tiny", False):
                # test hook: random-init small VAE with flux latent channels
                cfg = VAEConfig(
                    latent_channels=16, block_out_channels=(8, 8, 16, 16),
                    norm_num_groups=4, layers_per_block=1,
                    scaling_factor=1.0, shift_factor=0.0,
                )
                self._vae = AutoencoderKL(cfg)
                self._vae_params = self._vae.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64))
                )
                return self._vae, self._vae_params
            cfg = VAEConfig.flux()
            self._vae = AutoencoderKL(cfg)
            path = mc.get("vae_path")
            if path is None:
                path = str(Path(mc["diffusers_path"]) / "vae")
            sd = load_safetensors_dir(path)
            self._vae_params = convert_diffusers_vae(sd, cfg)
        return self._vae, self._vae_params

    def get_call_vae_fn(self):
        import numpy as np

        vae, params = self._load_vae()
        encode = jax.jit(
            lambda px: vae.apply(params, px, method=type(vae).encode)
        )

        def fn(pixels):
            if pixels.ndim == 5:  # (B, C, F=1, H, W) -> image
                pixels = pixels[:, :, 0]
            z = encode(jnp.asarray(pixels, jnp.float32))
            return {"latents": np.asarray(z)}

        return fn

    def get_call_text_encoder_fns(self):
        import numpy as np

        from .text_encoders import HFTextEncoder

        mc = self.model_config
        if mc.get("_tiny", False):
            cfg = self.flux_config
            from ..data.bucketing import seed_from_hash

            def _rngs(captions):
                return [np.random.default_rng(seed_from_hash(c)) for c in captions]

            def t5_fn(captions):
                return {"t5_embed": np.stack([
                    r.standard_normal((16, cfg.joint_attention_dim)).astype(
                        np.float32
                    ) for r in _rngs(captions)
                ])}

            def clip_fn(captions):
                return {"clip_embed": np.stack([
                    r.standard_normal((cfg.pooled_projection_dim,)).astype(
                        np.float32
                    ) for r in _rngs(captions)
                ])}

            return [t5_fn, clip_fn]
        base = mc.get("diffusers_path")
        t5 = HFTextEncoder(
            "t5",
            mc.get("t5_path", str(Path(base) / "text_encoder_2")),
            max_length=int(mc.get("max_sequence_length", 512)),
            tokenizer_path=mc.get("t5_tokenizer_path",
                                  str(Path(base) / "tokenizer_2") if base else None),
        )
        clip = HFTextEncoder(
            "clip_pooled",
            mc.get("clip_path", str(Path(base) / "text_encoder")),
            max_length=77,
            tokenizer_path=mc.get("clip_tokenizer_path",
                                  str(Path(base) / "tokenizer") if base else None),
        )

        def t5_fn(captions):
            return {"t5_embed": t5.encode(captions)}

        def clip_fn(captions):
            return {"clip_embed": clip.encode(captions)}

        return [t5_fn, clip_fn]
