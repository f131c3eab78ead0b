"""Per-model pipeline contract (JAX re-design of reference models/base.py).

The reference contract (models/base.py:294-391) is imperative: load torch
modules, mutate with PEFT, emit nn.Module layer lists. Here a pipeline is a
thin adapter between the generic trainer and a pure Flax model:

  build_model()                -> nn.Module (flax)
  init_params(rng, sample)     -> param pytree (random init)
  load_weights(path)           -> param pytree (converted pretrained weights)
  prepare_inputs(rng, batch, quantile) -> (model_inputs, target, mask)
       pure & jit-traceable: noising + target construction on device
       (reference does this on CPU inside the dataloader,
        dataset.py:1357-1368 -> model.prepare_inputs)
  forward(params, model_inputs) -> model output
  loss_fn(output, target, mask) -> scalar loss (f32)

Everything that tells the data pipeline how to cache (VAE / text encoders)
lives in the same class, mirroring get_call_vae_fn/get_call_text_encoder_fn
(reference models/base.py:340-358).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..training.losses import loss_config_from_model_config, masked_loss


class BasePipeline:
    name: str = "base"
    framerate: Optional[float] = None
    # keys the dataset must provide per example (besides latents/mask)
    cacheable_text_embeddings: Tuple[str, ...] = ()

    def __init__(self, config: Dict[str, Any]):
        self.config = config
        self.model_config = config["model"]
        self._loss_kwargs = loss_config_from_model_config(self.model_config)

    # --- model ------------------------------------------------------------
    def build_model(self):
        raise NotImplementedError

    def init_params(self, rng: jax.Array):
        raise NotImplementedError

    def load_weights(self):
        """Load + convert pretrained weights to the flax param structure."""
        raise NotImplementedError

    # True for models whose text encoders run in-graph (captions must flow
    # through the loader; reference SDXL, sdxl.py:426-428)
    pass_captions_to_batch: bool = False

    # --- training ---------------------------------------------------------
    def host_prepare(self, batch):
        """Host-side batch transform before jit (e.g. tokenization)."""
        return batch

    def prepare_inputs(self, rng, batch, timestep_quantile=None):
        raise NotImplementedError

    def forward(self, params, model_inputs: Dict[str, Any]):
        raise NotImplementedError

    def loss_fn(self, output, target, mask):
        """Default masked loss in f32 (reference models/base.py:364-382)."""
        return masked_loss(output, target, mask, **self._loss_kwargs)

    # --- caching (used by the data pipeline) -------------------------------
    def get_call_vae_fn(self):
        """-> fn(pixels [B,C,H,W] or [B,C,F,H,W] numpy in [-1,1]) -> dict of
        batch-leading arrays to cache (reference get_call_vae_fn,
        models/base.py:340-347)."""
        raise NotImplementedError

    def get_call_text_encoder_fns(self):
        """-> list of fn(list[str]) -> dict of batch-leading arrays, one per
        text encoder (reference get_call_text_encoder_fn per TE,
        models/base.py:349-358)."""
        raise NotImplementedError

    def _generic_image_vae_fn(self, tiny_latent_channels: int = 4,
                              video_latents: bool = False,
                              **config_overrides):
        """Shared get_call_vae_fn body for AutoencoderKL-family models:
        tiny mode runs a random small KL VAE at the model's latent width;
        real mode loads model.vae_path (alias `vae`) through the universal
        loader (diffusers / original-SD / ComfyUI `vae.`-prefixed keys,
        topology inferred from shapes — covers flux2's 32ch and
        HunyuanImage's 32x deep KL VAEs). video_latents appends a frames=1
        axis (reference is_video_vae, models/krea2.py:25-29)."""
        import jax.numpy as jnp

        mc = self.model_config
        if mc.get("_tiny", False):
            from .autoencoder_kl import AutoencoderKL, VAEConfig

            cfg = VAEConfig(
                latent_channels=tiny_latent_channels,
                block_out_channels=(8, 16), norm_num_groups=4,
                layers_per_block=1, scaling_factor=1.0, shift_factor=0.0,
            )
            vae = AutoencoderKL(cfg)
            params = vae.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32))
            )
        else:
            from .autoencoder_kl import load_image_vae

            path = mc.get("vae_path") or mc.get("vae")
            if not path:
                raise FileNotFoundError(
                    f"{self.name}: set model.vae_path for latent caching"
                )
            vae, params, cfg = load_image_vae(path, **config_overrides)
        encode = jax.jit(
            lambda px: vae.apply(params, px, method=type(vae).encode)
        )

        def fn(pixels):
            if pixels.ndim == 5:
                pixels = pixels[:, :, 0]
            z = np.asarray(encode(jnp.asarray(pixels, jnp.float32)))
            if video_latents:
                z = z[:, :, None]
            return {"latents": z}

        return fn

    def lr_scale_map(self, base_lr):
        """Per-module LR multipliers by param-path substring (reference
        param groups, e.g. sdxl unet_lr / cosmos_predict2 llm_adapter_lr)."""
        return {}

    # --- weight-key map (drives load/save when defined) ---------------------
    def keymap(self):
        """models/keymaps.py KeyMap for this family, or None. When defined,
        the generic load_weights / save_adapter / save_model below work
        (reference per-model loaders + ComfyUI/diffusers-format saves,
        models/base.py:609-613, utils/saver.py:58-116)."""
        return None

    def _keymap_config(self):
        """Config object whose attributes hold per-group block counts."""
        raise NotImplementedError

    # --- saving ------------------------------------------------------------
    def save_adapter(self, path, params):
        km = self.keymap()
        if km is None:
            raise NotImplementedError
        from .keymaps import export_lora_keymap, save_lora_safetensors

        sd = export_lora_keymap(params, km, self._keymap_config())
        if not sd:
            raise RuntimeError("no adapter factors found to export")
        alpha = self.config.get("adapter", {}).get("alpha")
        save_lora_safetensors(path, sd, alpha=alpha)
        print(f"saved {len(sd)} adapter tensors to {path}")

    def load_adapter(self, path, params):
        """Initialize adapter leaves from a previously saved adapter dir
        (reference adapter.init_from_existing, train.py:525-526)."""
        km = self.keymap()
        if km is None:
            raise NotImplementedError(
                f"{type(self).__name__} does not support "
                "adapter.init_from_existing"
            )
        from .keymaps import import_lora_keymap

        return import_lora_keymap(path, km, self._keymap_config(), params)

    def save_model(self, path, params):
        km = self.keymap()
        if km is None:
            raise NotImplementedError
        from pathlib import Path

        from safetensors.numpy import save_file

        from ..common import dtype_from_string
        from .keymaps import keymap_from_flax

        sd = keymap_from_flax(params, km, self._keymap_config())
        # Frozen sidecar tensors captured at load (km.passthrough_patterns,
        # e.g. the ltx2 audio branch) ride along so the export is a
        # complete checkpoint, like the reference's full-model saves.
        for k, v in getattr(self, "_passthrough_sd", {}).items():
            sd.setdefault(k, np.asarray(v))
        if "save_dtype" in self.config:
            dt = dtype_from_string(self.config["save_dtype"])
            sd = {k: np.asarray(v).astype(dt) for k, v in sd.items()}
        out = Path(path)
        out.mkdir(parents=True, exist_ok=True)
        save_file(sd, str(out / "model.safetensors"),
                  metadata={"format": "pt"})
        print(f"saved {len(sd)} tensors to {out / 'model.safetensors'}")

    def host_stack_names(self):
        """Param-stack names the trainer should move to host RAM for
        blocks_to_swap (reference utils/offloading.py). Families with a
        finer dial (wan's partial tail, flux's double/single stacks)
        override this."""
        from ..parallel.offload import offload_stacks_from_config

        return offload_stacks_from_config(self.config)
