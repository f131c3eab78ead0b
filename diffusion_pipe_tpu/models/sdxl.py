"""SDXL pipeline: DDPM eps/v-pred training with in-graph CLIP text encoders.

Re-implements reference models/sdxl.py training semantics:
- prepare_inputs (sdxl.py:536-580): integer timesteps (uniform or
  quantile*T), DDPM add_noise, eps or v-prediction target, SDXL
  add_time_ids from the bucket resolution, mask resized to latents.
- loss (sdxl.py:630-648): per-example MSE mean then min-SNR-gamma /
  debiased-estimation weights, matching kohya's formulation.
- text encoders run IN-GRAPH (reference get_text_encoders -> [] means
  "don't cache": sdxl.py:426-428); CLIP-L + CLIP-G penultimate hidden
  states concatenated, CLIP-G pooled for add_text_embeds. Trainable in
  full fine-tune (unet_lr / text_encoder_{1,2}_lr LR groups via
  lr_scale_map), frozen under LoRA.
- captions flow to the trainer and are tokenized host-side via
  host_prepare() (strings can't enter jit). Arbitrary prompt lengths are
  supported via the reference's 75-token chunking (sdxl.py:742-776): one
  shared tokenizer, [BOS ... EOS/PAD] per chunk, chunks folded into the
  batch dim for the TE pass and re-concatenated along the sequence;
  pooled embeds from the first chunk; `clip_skip` honored.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..training.ddpm import DDPMSchedule, snr_loss_weight
from . import register_model
from .base import BasePipeline
from .sdxl_unet import SDXLConfig, SDXLUNet
from .layers import remat_spec


@register_model("sdxl")
class SDXLPipeline(BasePipeline):
    name = "sdxl"
    # reference: no cached text embeddings for SDXL (sdxl.py:426-428)
    cacheable_text_embeddings = ()
    pass_captions_to_batch = True

    def __init__(self, config):
        super().__init__(config)
        mc = self.model_config
        self.v_pred = bool(mc.get("v_pred", False))
        self.min_snr_gamma = mc.get("min_snr_gamma")
        self.debiased_estimation_loss = bool(
            mc.get("debiased_estimation_loss", False)
        )
        self.schedule = DDPMSchedule.sdxl(
            v_pred=self.v_pred,
            zero_terminal_snr=bool(mc.get("zero_terminal_snr", False)),
        )
        self.unet_config = self._build_unet_config()
        self.model = SDXLUNet(self.unet_config)
        self._te = None

    def _build_unet_config(self) -> SDXLConfig:
        from ..common import dtype_from_string

        mc = self.model_config
        adapter = self.config.get("adapter", {})
        kwargs: Dict[str, Any] = dict(
            dtype=dtype_from_string(mc.get("dtype", "bfloat16")),
            param_dtype=dtype_from_string(mc.get("dtype", "bfloat16")),
            remat=remat_spec(self.config),
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
            return SDXLConfig.tiny(**kwargs)
        return SDXLConfig(**kwargs)

    # --- text encoders ------------------------------------------------------

    def _text_encoders(self):
        """(te1, te2) transformers Flax CLIP text models."""
        if self._te is not None:
            return self._te
        from transformers import (
            CLIPTextConfig,
            FlaxCLIPTextModel,
            FlaxCLIPTextModelWithProjection,
        )

        mc = self.model_config
        if mc.get("_tiny", False):
            c1 = CLIPTextConfig(
                vocab_size=256, hidden_size=16, intermediate_size=32,
                num_hidden_layers=2, num_attention_heads=2,
                max_position_embeddings=77, projection_dim=16,
            )
            te1 = FlaxCLIPTextModel(c1, seed=0)
            te2 = FlaxCLIPTextModelWithProjection(c1, seed=1)
        elif mc.get("_random_te", False):
            # benchmark hook: full-size CLIP-L + OpenCLIP-bigG at random
            # init (real shapes, no checkpoint files needed)
            c1 = CLIPTextConfig(
                vocab_size=49408, hidden_size=768, intermediate_size=3072,
                num_hidden_layers=12, num_attention_heads=12,
                max_position_embeddings=77, projection_dim=768,
            )
            c2 = CLIPTextConfig(
                vocab_size=49408, hidden_size=1280, intermediate_size=5120,
                num_hidden_layers=32, num_attention_heads=20,
                max_position_embeddings=77, projection_dim=1280,
                hidden_act="gelu",
            )
            te1 = FlaxCLIPTextModel(c1, seed=0)
            te2 = FlaxCLIPTextModelWithProjection(c2, seed=1)
        else:
            base = mc["diffusers_path"]
            te1 = FlaxCLIPTextModel.from_pretrained(
                str(Path(base) / "text_encoder"), from_pt=True
            )
            # text_encoder_2 is CLIPTextModelWithProjection: pooled output is
            # the PROJECTED text embedding (diffusers SDXL semantics)
            te2 = FlaxCLIPTextModelWithProjection.from_pretrained(
                str(Path(base) / "text_encoder_2"), from_pt=True
            )
        self._te = (te1, te2)
        return self._te

    def _tokenize(self, captions):
        """captions -> int32 [B, n_chunks, 77] CLIP token-id chunks.

        Reference semantics (sdxl.py:579-587, 742-776): ONE shared tokenizer
        for both TEs (tokenizer_2 is forced to tokenizer, sdxl.py:390-393),
        tokenized with no truncation / no special tokens, split into
        75-token chunks, each chunk wrapped as [BOS, ..., PAD*] with the
        first pad replaced by EOS. Arbitrary prompt lengths supported; the
        per-batch chunk count is the max over the batch (one XLA program
        per chunk count, same bounded-recompile regime as size buckets).
        """
        mc = self.model_config
        if mc.get("_tiny", False):
            ids = np.zeros((len(captions), 1, 77), np.int32)
            for i, c in enumerate(captions):
                for j, ch in enumerate(str(c)[:77]):
                    ids[i, 0, j] = ord(ch) % 256
            return ids
        if getattr(self, "_tokenizer", None) is None:
            from transformers import AutoTokenizer

            base = mc["diffusers_path"]
            self._tokenizer = AutoTokenizer.from_pretrained(
                str(Path(base) / "tokenizer")
            )
        tok = self._tokenizer
        bos, eos, pad = tok.bos_token_id, tok.eos_token_id, tok.pad_token_id
        if pad is None:
            pad = eos
        encoded = [
            tok(str(c), truncation=False, add_special_tokens=False).input_ids
            for c in captions
        ]
        n_chunks = max(1, max((len(e) + 74) // 75 for e in encoded))
        out = np.full((len(captions), n_chunks, 77), pad, np.int32)
        out[:, :, 0] = bos
        for i, e in enumerate(encoded):
            for c in range(n_chunks):
                chunk = e[c * 75:(c + 1) * 75]
                out[i, c, 1:1 + len(chunk)] = chunk
                # first pad position becomes EOS (reference sdxl.py:755-757)
                out[i, c, 1 + len(chunk)] = eos
        return out

    def host_prepare(self, batch):
        """Host-side caption -> token ids (before jit)."""
        if "caption" in batch:
            ids = self._tokenize(list(batch["caption"]))
            batch = {k: v for k, v in batch.items() if k != "caption"}
            # one shared tokenization feeds both TEs (reference forces
            # tokenizer_2 = tokenizer, sdxl.py:390-393)
            batch["input_ids"] = ids
            batch["input_ids_2"] = ids
        return batch

    # --- model --------------------------------------------------------------

    def lr_scale_map(self, base_lr):
        """unet_lr / text_encoder_1_lr / text_encoder_2_lr param groups
        (reference models/sdxl.py:602-628). Keys are slash-anchored to the
        '/'-joined param path so 'text_encoder/' never matches
        'text_encoder_2/...' leaves — TE2 keeps the base LR when only
        text_encoder_1_lr is set, matching the reference's exact-prefix
        param groups."""
        mc = self.model_config
        out = {}
        if mc.get("unet_lr") is not None:
            out["unet/"] = float(mc["unet_lr"]) / base_lr
        if mc.get("text_encoder_1_lr") is not None:
            out["text_encoder/"] = float(mc["text_encoder_1_lr"]) / base_lr
        if mc.get("text_encoder_2_lr") is not None:
            out["text_encoder_2/"] = float(mc["text_encoder_2_lr"]) / base_lr
        return out

    def init_params(self, rng):
        cfg = self.unet_config
        te1, te2 = self._text_encoders()
        unet_params = jax.jit(self.model.init)(
            rng,
            jnp.zeros((1, 4, 16, 16)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, cfg.cross_attention_dim)),
            jnp.zeros((1, cfg.projection_class_embeddings_input_dim - 6 * 256)),
            jnp.zeros((1, 6)),
        )
        return {
            "params": {
                "unet": unet_params["params"],
                "text_encoder": te1.params,
                "text_encoder_2": te2.params,
            }
        }

    def prepare_inputs(self, rng, batch, timestep_quantile=None):
        latents = batch["latents"].astype(jnp.float32)
        b, c, h, w = latents.shape

        mask = batch.get("mask")
        if mask is not None:
            mask = jax.image.resize(
                mask.astype(jnp.float32), (b, h, w), method="nearest"
            )[:, None]

        t_key, n_key = jax.random.split(rng)
        timesteps = self.schedule.sample_timesteps(
            t_key, b, quantile=timestep_quantile
        )
        noise = jax.random.normal(n_key, latents.shape, jnp.float32)
        noisy = self.schedule.add_noise(latents, noise, timesteps)
        target = (
            self.schedule.get_velocity(latents, noise, timesteps)
            if self.v_pred else noise
        )

        vae_scale = 8
        ph, pw = h * vae_scale, w * vae_scale
        add_time_ids = jnp.tile(
            jnp.asarray([[ph, pw, 0, 0, ph, pw]], jnp.float32), (b, 1)
        )
        model_inputs = dict(
            sample=noisy,
            timesteps=timesteps,
            input_ids=batch["input_ids"],
            input_ids_2=batch["input_ids_2"],
            add_time_ids=add_time_ids,
        )
        # timesteps ride along for the SNR loss weights (reference returns
        # them through the output tuple, sdxl.py:630-648)
        return model_inputs, target, mask

    def encode_text(self, p, ids1, ids2):
        """(ctx [B,T,2048], pooled [B,1280]) from token ids; shared by
        forward() and the pipeline-parallel program (sdxl_pp.py)."""
        te1, te2 = self._text_encoders()
        # -2 == penultimate layer; SDXL always indexes from the penultimate
        # even under clip_skip (reference sdxl.py:771-775)
        clip_skip = self.model_config.get("clip_skip")
        layer = -2 if clip_skip is None else -(int(clip_skip) + 2)

        def run_te(te, params, ids):
            """ids [B, C, 77]: C 75-token chunks per prompt, encoded
            independently and re-concatenated along the sequence
            (reference get_prompt_embeds, sdxl.py:742-776). Chunks fold
            into the batch so the TE runs once, batched for the MXU."""
            b, c, s = ids.shape
            flat = ids.reshape(b * c, s)
            out = te.module.apply(
                {"params": params},
                input_ids=flat,
                attention_mask=jnp.ones((b * c, s), jnp.int32),
                position_ids=jnp.broadcast_to(
                    jnp.arange(s)[None], (b * c, s)
                ),
                output_hidden_states=True,
            )
            hidden = out.hidden_states[layer].reshape(b, c * s, -1)
            # pooled embedding comes from the FIRST chunk only
            # (reference sdxl.py:766-767)
            pooled = getattr(out, "text_embeds", None)
            if pooled is not None:
                pooled = pooled.reshape(b, c, -1)[:, 0]
            return hidden, pooled

        if ids1.ndim == 2:  # allow unchunked [B, 77] callers
            ids1, ids2 = ids1[:, None], ids2[:, None]
        h1, _ = run_te(te1, p["text_encoder"], ids1)
        h2, pooled = run_te(te2, p["text_encoder_2"], ids2)
        ctx = jnp.concatenate([h1, h2], axis=-1)
        return ctx, pooled

    def forward(self, params, model_inputs):
        p = params["params"]
        ctx, pooled = self.encode_text(
            p, model_inputs["input_ids"], model_inputs["input_ids_2"]
        )
        pred = self.model.apply(
            {"params": p["unet"]},
            model_inputs["sample"],
            model_inputs["timesteps"],
            ctx,
            pooled,
            model_inputs["add_time_ids"],
        )
        return pred, model_inputs["timesteps"]

    def loss_fn(self, output, target, mask):
        pred, timesteps = output
        loss = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        if mask is not None and mask.size > 0:
            loss = loss * jnp.broadcast_to(mask.astype(jnp.float32), loss.shape)
        loss = jnp.mean(loss, axis=(1, 2, 3))  # per-example (sdxl.py:641)
        w = snr_loss_weight(
            self.schedule, timesteps, self.min_snr_gamma,
            self.debiased_estimation_loss, self.v_pred,
        )
        return jnp.mean(loss * w)

    def sample(self, params, width, height, key, num_steps=30,
               guidance_scale=1.0, caption="", negative_caption="", **_):
        """DDIM (eta=0) sampling through the training forward — in-graph
        text encoders, eps or v-prediction (reference CommonPipeline.sample
        analogue for SDXL's DDPMScheduler, models/base.py:263-291).
        Returns latents [B, 4, h, w]."""
        p = params["params"]
        ids = jnp.asarray(self._tokenize([caption]))
        ctx, pooled = self.encode_text(p, ids, ids)
        if guidance_scale != 1.0:
            un_ids = jnp.asarray(self._tokenize([negative_caption]))
            un_ctx, un_pooled = self.encode_text(p, un_ids, un_ids)
        b = 1
        h, w = height // 8, width // 8
        add_time_ids = jnp.asarray(
            [[height, width, 0, 0, height, width]], jnp.float32)

        ac = jnp.asarray(self.schedule.alphas_cumprod, jnp.float32)
        n_train = self.schedule.num_train_timesteps
        # static float64 grid: fp32 linspace can land at 665.99997 and
        # truncate to the WRONG training timestep (diffusers computes the
        # grid in float64 and rounds)
        import numpy as np

        steps = jnp.asarray(
            np.linspace(n_train - 1, 0, num_steps).round().astype(np.int32))

        def eps_x0(x, t_scalar, c, pl):
            pred = self.model.apply(
                {"params": p["unet"]}, x, jnp.full((b,), t_scalar),
                c, pl, add_time_ids,
            ).astype(jnp.float32)
            a = jnp.sqrt(ac[t_scalar])
            o = jnp.sqrt(1.0 - ac[t_scalar])
            if self.v_pred:
                x0 = a * x - o * pred
                eps = o * x + a * pred
            else:
                eps = pred
                x0 = (x - o * eps) / a
            return eps, x0

        def body(i, x):
            t = steps[i]
            eps, x0 = eps_x0(x, t, ctx, pooled)
            if guidance_scale != 1.0:
                eps_u, x0_u = eps_x0(x, t, un_ctx, un_pooled)
                eps = eps_u + guidance_scale * (eps - eps_u)
                a = jnp.sqrt(ac[t])
                o = jnp.sqrt(1.0 - ac[t])
                x0 = (x - o * eps) / a
            t_prev = jnp.where(i + 1 < num_steps, steps[
                jnp.minimum(i + 1, num_steps - 1)], -1)
            a_prev = jnp.where(t_prev >= 0, ac[jnp.maximum(t_prev, 0)], 1.0)
            return (jnp.sqrt(a_prev) * x0
                    + jnp.sqrt(1.0 - a_prev) * eps)

        x = jax.random.normal(key, (b, 4, h, w), jnp.float32)
        return jax.lax.fori_loop(0, num_steps, body, x)

    def make_pp_loss_fn(self, mesh, num_microbatches, timestep_quantile=None):
        """Pipeline-parallel GPipe loss (reference models/sdxl.py:589-975
        to_layers + PipelineModule). See models/sdxl_pp.py."""
        from .sdxl_pp import make_sdxl_pipelined_loss_fn

        return make_sdxl_pipelined_loss_fn(
            self, mesh, num_microbatches, timestep_quantile=timestep_quantile
        )

    def load_weights(self):
        """diffusers-folder OR original-SD single-file UNet weights + HF
        text encoders -> our params."""
        from .sdxl_convert import (
            convert_diffusers_sdxl_unet,
            convert_sd_unet_to_diffusers,
        )
        from .weights import load_safetensors_dir

        mc = self.model_config
        path = (mc.get("unet_path") or mc.get("checkpoint_path")
                or str(Path(mc["diffusers_path"]) / "unet"))
        sd = load_safetensors_dir(path)
        from .weights import merge_adapters_into_state_dict

        sd = merge_adapters_into_state_dict(
            sd, mc.get("merge_adapters", [])
        )
        if any("model.diffusion_model." in k or k.startswith("input_blocks.")
               for k in sd):
            sd = convert_sd_unet_to_diffusers(sd)
        unet = convert_diffusers_sdxl_unet(sd, self.unet_config)
        te1, te2 = self._text_encoders()
        return {
            "params": {
                "unet": unet,
                "text_encoder": te1.params,
                "text_encoder_2": te2.params,
            }
        }

    def save_adapter(self, out_dir, trainable):
        """kohya sd-scripts format (reference sdxl.py:465-474)."""
        from flax import linen as nn
        from safetensors.numpy import save_file

        from .sdxl_convert import export_sdxl_lora_kohya

        sd = export_sdxl_lora_kohya(nn.unbox(trainable), self.unet_config)
        save_file(sd, str(Path(out_dir) / "adapter_model.safetensors"))

    def save_model(self, out_dir, params):
        """Full fine-tune export in the original SD single-file format:
        model.diffusion_model.* + conditioner.embedders.{0,1}.* (+ VAE as
        first_stage_model when available) — reference sdxl.py:487-525."""
        from flax import linen as nn
        from safetensors.numpy import save_file

        from ..common import dtype_from_string
        from .sdxl_convert import (
            convert_diffusers_unet_to_sd,
            convert_diffusers_vae_keys_to_sd,
            convert_hf_clip_to_openclip,
            export_sdxl_unet_diffusers,
            flax_hf_to_torch_sd,
        )

        p = nn.unbox(params)["params"]
        unet_sd = convert_diffusers_unet_to_sd(
            export_sdxl_unet_diffusers(p["unet"], self.unet_config)
        )
        state = {"model.diffusion_model." + k: v for k, v in unet_sd.items()}
        te1 = flax_hf_to_torch_sd(p["text_encoder"])
        state.update({
            "conditioner.embedders.0.transformer." + k: v
            for k, v in te1.items()
        })
        te2 = convert_hf_clip_to_openclip(flax_hf_to_torch_sd(
            p["text_encoder_2"]))
        if "text_projection.weight" in te2:
            # single-file stores the open-clip orientation (reference
            # sdxl.py:512-515 .T of the HF weight = our kernel as-is)
            te2["text_projection"] = np.ascontiguousarray(
                te2.pop("text_projection.weight").T
            )
        state.update({
            "conditioner.embedders.1.model." + k: v for k, v in te2.items()
        })
        mc = self.model_config
        vae_path = mc.get("vae_path")
        if vae_path is None and mc.get("diffusers_path"):
            cand = Path(mc["diffusers_path"]) / "vae"
            vae_path = str(cand) if cand.is_dir() else None
        if vae_path:
            from .weights import load_safetensors_dir

            vae_sd = convert_diffusers_vae_keys_to_sd(
                load_safetensors_dir(vae_path)
            )
            state.update({
                "first_stage_model." + k: v for k, v in vae_sd.items()
            })
        if "save_dtype" in self.config:
            dt = dtype_from_string(self.config["save_dtype"])
            state = {k: np.asarray(v).astype(dt) for k, v in state.items()}
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        save_file(state, str(out / "model.safetensors"),
                  metadata={"format": "pt"})
        print(f"saved {len(state)} tensors to {out / 'model.safetensors'}")

    # --- caching ------------------------------------------------------------

    def get_call_vae_fn(self):
        from .autoencoder_kl import AutoencoderKL, VAEConfig, convert_diffusers_vae
        from .weights import load_safetensors_dir

        mc = self.model_config
        if mc.get("_tiny", False):
            cfg = VAEConfig.tiny()
            vae = AutoencoderKL(cfg)
            params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))
        else:
            cfg = VAEConfig.sdxl()
            vae = AutoencoderKL(cfg)
            path = mc.get("vae_path") or str(Path(mc["diffusers_path"]) / "vae")
            params = convert_diffusers_vae(load_safetensors_dir(path), cfg)
        encode = jax.jit(lambda px: vae.apply(params, px, method=type(vae).encode))

        def fn(pixels):
            if pixels.ndim == 5:
                pixels = pixels[:, :, 0]
            return {"latents": np.asarray(encode(jnp.asarray(pixels, jnp.float32)))}

        return fn

    def get_call_text_encoder_fns(self):
        return []  # TEs run in-graph (reference sdxl.py:426-428)
