"""SD3 pipeline adapter (reference models/sd3.py).

Flow matching with logit-normal t (shift / flux_shift options), prompt
embeds assembled like the reference (sd3.py:107-121): CLIP-L + CLIP-G hidden
states concatenated feature-wise, zero-padded to the T5 width, then
sequence-concatenated with the T5 embeds; pooled = concat of both CLIP
pooled embeds. Model input is latents NCHW with t*1000 (sd3.py:159).
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
from .sd3_model import SD3Config, SD3Transformer
from .layers import remat_spec


@register_model("sd3", "sd3.5")
class SD3Pipeline(BasePipeline):
    name = "sd3"
    cacheable_text_embeddings = (
        "prompt_embed", "pooled_prompt_embed", "prompt_2_embed",
        "pooled_prompt_2_embed", "t5_prompt_embed",
    )

    def __init__(self, config):
        super().__init__(config)
        self.tdist = TimestepDistribution.from_model_config(self.model_config)
        self.sd3_config = self._build_config()
        self.model = SD3Transformer(self.sd3_config)

    def _build_config(self) -> SD3Config:
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
            return SD3Config.tiny(**kwargs)
        return SD3Config(**kwargs)

    def init_params(self, rng):
        cfg = self.sd3_config
        return jax.jit(self.model.init)(
            rng,
            jnp.zeros((1, cfg.in_channels, 8, 8)),
            jnp.zeros((1,)),
            jnp.zeros((1, 16, cfg.joint_attention_dim)),
            jnp.zeros((1, cfg.pooled_projection_dim)),
        )

    def prepare_inputs(self, rng, batch, timestep_quantile=None):
        latents = batch["latents"].astype(jnp.float32)
        b, c, h, w = latents.shape

        # prompt embed assembly (reference sd3.py:116-121)
        clip = jnp.concatenate(
            [batch["prompt_embed"], batch["prompt_2_embed"]], axis=-1
        ).astype(jnp.float32)
        t5 = batch["t5_prompt_embed"].astype(jnp.float32)
        clip = jnp.pad(clip, ((0, 0), (0, 0), (0, t5.shape[-1] - clip.shape[-1])))
        prompt_embeds = jnp.concatenate([clip, t5], axis=-2)
        pooled = jnp.concatenate(
            [batch["pooled_prompt_embed"], batch["pooled_prompt_2_embed"]],
            axis=-1,
        ).astype(jnp.float32)

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
        target = noise - latents

        model_inputs = dict(
            hidden_states=x_t,
            timestep=t * 1000.0,
            encoder_hidden_states=prompt_embeds,
            pooled_projections=pooled,
        )
        return model_inputs, target, mask

    def forward(self, params, model_inputs):
        return self.model.apply(params, **model_inputs)

    def make_pp_program(self):
        """Pipeline-parallel program: one phase over the scan-stacked joint
        blocks; the context_pre_only final block rides with the head on the
        last stage (reference partitions via to_layers() + PipelineModule,
        models/sd3.py:179-249). See parallel/model_pp.py."""
        return _SD3PPProgram(self)

    def _merge_embeds(self, batch):
        clip = jnp.concatenate(
            [batch["prompt_embed"], batch["prompt_2_embed"]], axis=-1
        ).astype(jnp.float32)
        t5 = batch["t5_prompt_embed"].astype(jnp.float32)
        clip = jnp.pad(
            clip, ((0, 0), (0, 0), (0, t5.shape[-1] - clip.shape[-1]))
        )
        prompt_embeds = jnp.concatenate([clip, t5], axis=-2)
        pooled = jnp.concatenate(
            [batch["pooled_prompt_embed"], batch["pooled_prompt_2_embed"]],
            axis=-1,
        ).astype(jnp.float32)
        return prompt_embeds, pooled

    def sample(self, params, width, height, key, num_steps=20,
               guidance_scale=1.0, **embeds):
        """Euler flow sampling through the training forward (reference
        CommonPipeline.sample, models/base.py:263-291)."""
        from ..training.sampling import euler_flow_sample

        prompt_embeds, pooled = self._merge_embeds(embeds)
        b = prompt_embeds.shape[0]
        h, w = height // 8, width // 8

        def vel(x, t):
            return self.forward(params, dict(
                hidden_states=x,
                timestep=t * 1000.0,
                encoder_hidden_states=prompt_embeds,
                pooled_projections=pooled,
            ))

        return euler_flow_sample(
            vel, (b, 16, h, w), key, num_steps=num_steps,
            guidance_scale=guidance_scale,
            shift=self.model_config.get("shift", 3.0),
        )

    def _load_vae(self):
        from .autoencoder_kl import AutoencoderKL, VAEConfig, convert_diffusers_vae
        from .weights import load_safetensors_dir

        mc = self.model_config
        cfg = VAEConfig(latent_channels=16, scaling_factor=1.5305,
                        shift_factor=0.0609, use_quant_conv=False)
        vae = AutoencoderKL(cfg)
        path = mc.get("vae_path") or str(Path(mc["diffusers_path"]) / "vae")
        params = convert_diffusers_vae(load_safetensors_dir(path), cfg)
        return vae, params

    def get_call_vae_fn(self):
        from .autoencoder_kl import AutoencoderKL, VAEConfig, convert_diffusers_vae
        from .weights import load_safetensors_dir

        mc = self.model_config
        if mc.get("_tiny", False):
            cfg = VAEConfig(latent_channels=16, block_out_channels=(8, 16),
                            norm_num_groups=4, layers_per_block=1,
                            scaling_factor=1.0, shift_factor=0.0)
            vae = AutoencoderKL(cfg)
            params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))
        else:
            # SD3 VAE: 16ch, scaling 1.5305, shift 0.0609
            cfg = VAEConfig(latent_channels=16, scaling_factor=1.5305,
                            shift_factor=0.0609, use_quant_conv=False)
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
        mc = self.model_config
        if mc.get("_tiny", False):
            from ..data.bucketing import seed_from_hash

            cfg = self.sd3_config

            def emb(c, shape):
                r = np.random.default_rng(seed_from_hash(c))
                return r.standard_normal(shape).astype(np.float32)

            def clip1(caps):
                return {
                    "prompt_embed": np.stack([emb(c + "1", (8, 24)) for c in caps]),
                    "pooled_prompt_embed": np.stack(
                        [emb(c + "p1", (16,)) for c in caps]
                    ),
                }

            def clip2(caps):
                return {
                    "prompt_2_embed": np.stack([emb(c + "2", (8, 24)) for c in caps]),
                    "pooled_prompt_2_embed": np.stack(
                        [emb(c + "p2", (16,)) for c in caps]
                    ),
                }

            def t5(caps):
                return {
                    "t5_prompt_embed": np.stack(
                        [emb(c + "t5", (8, cfg.joint_attention_dim)) for c in caps]
                    )
                }

            return [clip1, clip2, t5]

        from .text_encoders import HFTextEncoder

        base = mc.get("diffusers_path")
        clip1 = HFTextEncoder("clip", str(Path(base) / "text_encoder"), 77,
                              tokenizer_path=str(Path(base) / "tokenizer"))
        clip2 = HFTextEncoder("clip", str(Path(base) / "text_encoder_2"), 77,
                              tokenizer_path=str(Path(base) / "tokenizer_2"))
        t5 = HFTextEncoder("t5", str(Path(base) / "text_encoder_3"),
                           int(mc.get("max_sequence_length", 256)),
                           tokenizer_path=str(Path(base) / "tokenizer_3"))

        # NOTE: real CLIP path needs penultimate hidden + pooled; the
        # HFTextEncoder wrapper returns last_hidden_state — SD3 uses
        # hidden_states[-2] + projected pooled. Dedicated fns:
        def make_clip_fn(enc, idx):
            def fn(captions):
                enc._load()
                tok = enc._tokenizer(
                    captions, padding="max_length", truncation=True,
                    max_length=77, return_tensors="np",
                )
                out = enc._model.module.apply(
                    {"params": enc._model.params},
                    input_ids=tok["input_ids"],
                    attention_mask=tok["attention_mask"],
                    position_ids=np.tile(np.arange(77), (len(captions), 1)),
                    output_hidden_states=True,
                )
                key = "prompt_embed" if idx == 1 else "prompt_2_embed"
                pkey = ("pooled_prompt_embed" if idx == 1
                        else "pooled_prompt_2_embed")
                return {
                    key: np.asarray(out.hidden_states[-2]),
                    pkey: np.asarray(out.pooler_output),
                }

            return fn

        def t5_fn(captions):
            return {"t5_prompt_embed": t5.encode(captions)}

        return [make_clip_fn(clip1, 1), make_clip_fn(clip2, 2), t5_fn]

    # --- weights ------------------------------------------------------------

    def _keymap_config(self):
        return self.sd3_config

    def keymap(self):
        """diffusers SD3Transformer2DModel keys <-> our stacked layout.
        The last joint block (context_pre_only) lives outside the scan as
        'final_block' and maps to transformer_blocks.{n-1}. LoRA export in
        the diffusers convention ('transformer.' prefix, reference
        models/sd3.py:63-64 save_lora_weights)."""
        from .keymaps import BlockGroup, KeyMap

        cfg = self.sd3_config
        lin = {
            "norm1_linear": "norm1.linear",
            "norm1_context_linear": "norm1_context.linear",
            "attn_to_q": "attn.to_q",
            "attn_to_k": "attn.to_k",
            "attn_to_v": "attn.to_v",
            "attn_add_q": "attn.add_q_proj",
            "attn_add_k": "attn.add_k_proj",
            "attn_add_v": "attn.add_v_proj",
            "attn_to_out": "attn.to_out.0",
            "attn_to_add_out": "attn.to_add_out",
            "ff_in": "ff.net.0.proj",
            "ff_out": "ff.net.2",
            "ff_context_in": "ff_context.net.0.proj",
            "ff_context_out": "ff_context.net.2",
        }
        norms = {}
        if cfg.qk_norm:
            norms = {
                "attn_to_norm_q": "attn.norm_q",
                "attn_to_norm_k": "attn.norm_k",
                "attn_add_norm_q": "attn.norm_added_q",
                "attn_add_norm_k": "attn.norm_added_k",
            }
        last = f"transformer_blocks.{cfg.num_layers - 1}"
        top_linears = {
            "timestep_embedder/linear_1":
                "time_text_embed.timestep_embedder.linear_1",
            "timestep_embedder/linear_2":
                "time_text_embed.timestep_embedder.linear_2",
            "text_embedder/linear_1":
                "time_text_embed.text_embedder.linear_1",
            "text_embedder/linear_2":
                "time_text_embed.text_embedder.linear_2",
            "context_embedder": "context_embedder",
            "norm_out_linear": "norm_out.linear",
            "proj_out": "proj_out",
            # final joint block, context_pre_only (no to_add_out/ff_context)
            "final_block/norm1_linear": f"{last}.norm1.linear",
            "final_block/norm1_context_linear": f"{last}.norm1_context.linear",
            "final_block/attn_to_q": f"{last}.attn.to_q",
            "final_block/attn_to_k": f"{last}.attn.to_k",
            "final_block/attn_to_v": f"{last}.attn.to_v",
            "final_block/attn_add_q": f"{last}.attn.add_q_proj",
            "final_block/attn_add_k": f"{last}.attn.add_k_proj",
            "final_block/attn_add_v": f"{last}.attn.add_v_proj",
            "final_block/attn_to_out": f"{last}.attn.to_out.0",
            "final_block/ff_in": f"{last}.ff.net.0.proj",
            "final_block/ff_out": f"{last}.ff.net.2",
        }
        top_norms = {}
        if cfg.qk_norm:
            top_norms = {
                "final_block/attn_to_norm_q": f"{last}.attn.norm_q",
                "final_block/attn_to_norm_k": f"{last}.attn.norm_k",
                "final_block/attn_add_norm_q": f"{last}.attn.norm_added_q",
                "final_block/attn_add_norm_k": f"{last}.attn.norm_added_k",
            }
        return KeyMap(
            blocks=[BlockGroup(
                "blocks", "transformer_blocks", "num_scan_layers",
                linears=lin, norms=norms,
            )],
            top_linears=top_linears,
            top_norms=top_norms,
            top_patch_linears={"pos_embed_proj": "pos_embed.proj"},
            patch_linear_shapes={
                "pos_embed_proj":
                    (cfg.in_channels, cfg.patch_size, cfg.patch_size),
            },
            lora_prefix="transformer.",
        )

    def load_weights(self):
        from .keymaps import keymap_to_flax, load_sd_for_pipeline

        return keymap_to_flax(
            load_sd_for_pipeline(self), self.keymap(), self.sd3_config
        )


class _SD3PPProgram:
    """PPProgram for SD3Transformer (see parallel/model_pp.py).

    Raw-param re-expression of sd3_model.py's __call__ split at the block
    scan: patch/pos/time/text embedding on stage 0, SD3JointBlock per slot,
    and the context_pre_only final block + modulated head + unpatchify +
    loss on the last stage. Payload: (img [B,L,D], txt [B,Lc,D], temb [B,D]).
    """

    def __init__(self, pipeline):
        from ..parallel.model_pp import PPPhase

        self.pipeline = pipeline
        cfg = pipeline.sd3_config
        self.cfg = cfg
        self.phases = [
            PPPhase("blocks", cfg.num_scan_layers, self._apply_block)
        ]

    def _apply_block(self, p_i, payload, ctx):
        from .sd3_model import SD3JointBlock

        img, txt, temb = payload
        (img, txt), _ = SD3JointBlock(self.cfg).apply(
            {"params": p_i}, (img, txt), temb
        )
        return (img, txt, temb)

    def make_ctx(self, p_rest, mi0):
        cfg = self.cfg
        _b, _c, h, w = mi0["hidden_states"].shape
        return {"grid": (h // cfg.patch_size, w // cfg.patch_size),
                "hw": (h, w)}

    def embed(self, p_rest, mi, ctx):
        import flax.linen as nn

        from .layers import (
            LoraDense,
            PixArtAlphaTextProjection,
            TimestepEmbedder,
        )
        from .sd3_model import sincos_2d_pos_embed

        cfg = self.cfg
        dim = cfg.hidden_size
        p = cfg.patch_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        gh, gw = ctx["grid"]
        hidden_states = mi["hidden_states"]
        b, c = hidden_states.shape[:2]

        x = jnp.transpose(hidden_states, (0, 2, 3, 1)).astype(cfg.dtype)
        x = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, gh * gw, p * p * c)
        img = LoraDense(dim, **dd).apply(
            {"params": p_rest["pos_embed_proj"]}, x)

        table = sincos_2d_pos_embed(
            dim, cfg.pos_embed_max_size, cfg.sample_size // p
        ).reshape(cfg.pos_embed_max_size, cfg.pos_embed_max_size, dim)
        top = (cfg.pos_embed_max_size - gh) // 2
        left = (cfg.pos_embed_max_size - gw) // 2
        pos = jnp.asarray(
            table[top: top + gh, left: left + gw].reshape(1, gh * gw, dim)
        )
        img = img + pos.astype(img.dtype)

        temb = TimestepEmbedder(dim, **dd).apply(
            {"params": p_rest["timestep_embedder"]},
            mi["timestep"].astype(jnp.float32) * 1.0,
        )
        temb = temb + PixArtAlphaTextProjection(dim, **dd).apply(
            {"params": p_rest["text_embedder"]},
            mi["pooled_projections"].astype(cfg.dtype),
        )
        temb = nn.silu(temb)

        txt = LoraDense(dim, **dd).apply(
            {"params": p_rest["context_embedder"]},
            mi["encoder_hidden_states"].astype(cfg.dtype),
        )
        return (img, txt, temb)

    def head_loss(self, p_rest, payload, target, mask, ctx):
        import flax.linen as nn

        from .layers import LoraDense, layer_norm_no_affine, modulate
        from .sd3_model import SD3JointBlock

        cfg = self.cfg
        dim = cfg.hidden_size
        p = cfg.patch_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        gh, gw = ctx["grid"]
        h, w = ctx["hw"]
        img, txt, temb = payload
        b = img.shape[0]

        (img, _), _ = SD3JointBlock(cfg, context_pre_only=True).apply(
            {"params": p_rest["final_block"]}, (img, txt), temb
        )
        mod = LoraDense(2 * dim, **dd).apply(
            {"params": p_rest["norm_out_linear"]}, nn.silu(temb))
        scale, shift = jnp.split(mod, 2, axis=-1)
        img = modulate(layer_norm_no_affine(img), shift, scale)
        out = LoraDense(p * p * cfg.out_channels, **dd).apply(
            {"params": p_rest["proj_out"]}, img)
        out = out.reshape(b, gh, gw, p, p, cfg.out_channels)
        out = out.transpose(0, 5, 1, 3, 2, 4).reshape(
            b, cfg.out_channels, h, w)
        return self.pipeline.loss_fn(out, target, mask)
