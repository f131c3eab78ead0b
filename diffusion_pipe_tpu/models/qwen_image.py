"""Qwen-Image / Qwen-Image-Edit pipeline + model (reference models/qwen_image.py).

Architecture (diffusers QwenImageTransformer2DModel): 60 dual-stream MMDiT
blocks at 3072 hidden — structurally flux's double block (joint [txt, img]
attention, per-head RMS qk-norm, adaLN-zero 6-way modulation, 4x GELU MLPs) —
with timestep-only conditioning (no CLIP pooled branch), RMS-normed Qwen2.5-VL
text features (3584) as context, and RoPE where text tokens get positions
offset past the image grid on all three axes. Latents pack 2x2 like flux
(reference qwen_image.py:414); Edit mode concatenates control latents in the
sequence (455-462); text padding is masked in attention (77-174 custom attn
processor parity).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..training.flow import TimestepDistribution, sample_timesteps
from . import register_model
from .base import BasePipeline
from .flux import (
    latent_image_ids,
    pack_latents,
    resize_mask_to_latents,
    unpack_latents,
)
from .flux_model import FluxConfig, FluxDoubleBlock
from .layers import (
    LoraDense,
    RMSNorm,
    TimestepEmbedder,
    layer_norm_no_affine,
    modulate,
    remat_spec,
    remat_wrap,
    rope_frequencies,
)


@dataclasses.dataclass(frozen=True)
class QwenImageConfig:
    in_channels: int = 64
    out_channels: int = 64
    num_layers: int = 60
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 3584   # Qwen2.5-VL-7B hidden
    axes_dims_rope: Any = (16, 56, 56)
    rope_theta: float = 10000.0
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
    # Exact-N blocks_to_swap (reference utils/offloading.py:184 +
    # examples/qwen_image_24gb_vram.toml blocks_to_swap=8): the DEEPEST
    # offload_tail blocks live in a separate "blocks_swap" scan streamed
    # from host RAM. tail >= num_layers streams the whole stack under the
    # single-collection layout.
    offload_tail: int = 0
    # One-block-ahead host->HBM prefetch for streamed stacks (the custom-
    # VJP scan in parallel/offload.py; same wiring as wan/flux). DEFAULT
    # OFF — measured slower than nn.scan use-time streaming once the
    # relayout recompile was fixed (see WanConfig.stream_prefetch).
    stream_prefetch: Any = False
    stream_grad_leaves: Any = ()

    @property
    def hidden_size(self):
        return self.num_attention_heads * self.attention_head_dim

    @property
    def swap_split(self):
        """(resident, swapped) block counts."""
        if self.offload_tail <= 0:
            return (self.num_layers, 0)
        if self.offload_tail >= self.num_layers:
            return (0, self.num_layers)
        return (self.num_layers - self.offload_tail, self.offload_tail)

    # keymap block-count attrs (BlockGroup.num_layers_attr)
    @property
    def num_res(self):
        return self.swap_split[0]

    @property
    def num_swap(self):
        return self.swap_split[1]

    def to_flux_config(self) -> FluxConfig:
        """Block-level config shared with FluxDoubleBlock."""
        return FluxConfig(
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            attention_head_dim=self.attention_head_dim,
            num_attention_heads=self.num_attention_heads,
            joint_attention_dim=self.joint_attention_dim,
            axes_dims_rope=tuple(self.axes_dims_rope),
            rope_theta=self.rope_theta,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            base_kernel_dtype=self.base_kernel_dtype,
            int8_matmul=self.int8_matmul,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_dropout=self.lora_dropout,
            lora_dtype=self.lora_dtype,
            lora_type=self.lora_type,
            lokr_factor=self.lokr_factor,
            lokr_rank_dropout=self.lokr_rank_dropout,
        )

    @staticmethod
    def tiny(**kw):
        d = dict(
            num_layers=2, attention_head_dim=32, num_attention_heads=4,
            joint_attention_dim=48, axes_dims_rope=(8, 12, 12),
            dtype=jnp.float32, param_dtype=jnp.float32,
        )
        d.update(kw)
        return QwenImageConfig(**d)


class QwenImageTransformer(nn.Module):
    config: QwenImageConfig

    @nn.compact
    def __call__(self, hidden_states, encoder_hidden_states, timestep,
                 img_ids, txt_mask=None, img_seq_len: Optional[int] = None):
        cfg = self.config
        fcfg = cfg.to_flux_config()
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b = hidden_states.shape[0]
        stxt = encoder_hidden_states.shape[1]

        img = LoraDense(dim, name="img_in", **dd)(
            hidden_states.astype(cfg.dtype)
        )
        txt = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                      name="txt_norm")(encoder_hidden_states.astype(cfg.dtype))
        txt = LoraDense(dim, name="txt_in", **dd)(txt)
        temb = TimestepEmbedder(dim, **dd, name="time_text_embed")(
            timestep.astype(jnp.float32) * 1000.0
        )
        temb = nn.silu(temb)

        # text rope positions continue past the image grid on every axis
        max_idx = jnp.max(img_ids) + 1
        txt_ids = jnp.broadcast_to(
            (max_idx + jnp.arange(stxt))[:, None], (stxt, 3)
        ).astype(jnp.float32)
        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        rope_cos, rope_sin = rope_frequencies(
            ids, tuple(cfg.axes_dims_rope), cfg.rope_theta
        )

        def _scan(length, name, streamed):
            b_cls = FluxDoubleBlock
            if streamed:
                from ..parallel.offload import stream_params_from_host

                b_cls = stream_params_from_host(b_cls)
            if cfg.remat:
                b_cls = remat_wrap(b_cls, cfg.remat)
            return nn.scan(
                b_cls,
                variable_axes={"params": 0}, split_rngs={"params": True},
                in_axes=nn.broadcast, length=length,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )(fcfg, name=name)

        # exact-N blocks_to_swap: deepest n_swap blocks stream from host
        # in a separate "blocks_swap" scan (reference offloading.py:184);
        # streamed stacks take the one-block-ahead prefetch scan when
        # enabled (init always goes through nn.scan — same param layout)
        use_prefetch = bool(
            cfg.stream_prefetch and not self.is_initializing()
            and cfg.lora_dropout == 0.0
            and (jax.default_backend() != "cpu"
                 or cfg.stream_prefetch == "force")
        )

        def _prefetched(name, length, carry):
            from ..parallel.offload import prefetch_stream_scan

            storage = nn.unbox(self.scope.get_variable("params", name))
            blk = FluxDoubleBlock(fcfg, parent=None)
            return prefetch_stream_scan(
                blk, storage, carry, (temb, rope_cos, rope_sin, txt_mask),
                length, move=jax.default_backend() != "cpu",
                grad_leaves=tuple(cfg.stream_grad_leaves) or None,
            )

        n_res, n_swap = cfg.swap_split
        carry = (img, txt)
        if n_swap == cfg.num_layers:
            if use_prefetch:
                carry = _prefetched("blocks", cfg.num_layers, carry)
            else:
                carry, _ = _scan(cfg.num_layers, "blocks", True)(
                    carry, temb, rope_cos, rope_sin, txt_mask)
        else:
            carry, _ = _scan(n_res, "blocks", False)(
                carry, temb, rope_cos, rope_sin, txt_mask)
            if n_swap:
                if use_prefetch:
                    carry = _prefetched("blocks_swap", n_swap, carry)
                else:
                    carry, _ = _scan(n_swap, "blocks_swap", True)(
                        carry, temb, rope_cos, rope_sin, txt_mask)
        img, txt = carry

        out = img
        if img_seq_len is not None:
            out = out[:, :img_seq_len]
        mod = LoraDense(2 * dim, name="norm_out_linear", **dd)(temb)
        scale, shift = jnp.split(mod, 2, axis=-1)  # diffusers (scale, shift)
        out = modulate(layer_norm_no_affine(out), shift, scale)
        return LoraDense(cfg.out_channels, name="proj_out", **dd)(out)


@register_model("qwen_image", "qwen-image", "qwen_image_edit")
class QwenImagePipeline(BasePipeline):
    name = "qwen_image"
    cacheable_text_embeddings = ("prompt_embeds", "prompt_embeds_mask")

    def __init__(self, config):
        super().__init__(config)
        self.tdist = TimestepDistribution.from_model_config(self.model_config)
        self.edit = self.model_config["type"] == "qwen_image_edit"
        self.qi_config = self._build_config()
        self.model = QwenImageTransformer(self.qi_config)

    def _build_config(self) -> QwenImageConfig:
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
            offload_tail=int(self.config.get("blocks_to_swap", 0) or 0),
            stream_prefetch=self.config.get("stream_prefetch", False),
        )
        if adapter.get("type") in ("lora", "lokr"):
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
                lora_dtype=dtype_from_string(
                    adapter.get("dtype", mc.get("dtype", "bfloat16"))
                ),
            )
        if mc.get("_tiny", False):
            return QwenImageConfig.tiny(**kwargs)
        return QwenImageConfig(**kwargs)

    def host_stack_names(self):
        """Param-stack names the trainer moves to host RAM (exact-N
        blocks_to_swap, QwenImageConfig.swap_split)."""
        n_res, n_swap = self.qi_config.swap_split
        if n_swap == 0:
            return ()
        if n_swap == self.qi_config.num_layers:
            return ("blocks",)
        return ("blocks_swap",)

    def init_params(self, rng):
        cfg = self.qi_config
        b, simg, stxt = 1, 16, 8
        return jax.jit(self.model.init)(
            rng,
            jnp.zeros((b, simg, cfg.in_channels)),
            jnp.zeros((b, stxt, cfg.joint_attention_dim)),
            jnp.zeros((b,)),
            latent_image_ids(4, 4),
            jnp.ones((b, stxt), jnp.int32),
        )

    def prepare_inputs(self, rng, batch, timestep_quantile=None):
        latents = batch["latents"].astype(jnp.float32)
        if latents.ndim == 5:  # [B, C, 1, H, W] video-shaped image latents
            latents = latents[:, :, 0]
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

        img_ids = latent_image_ids(h // 2, w // 2)
        if "control_latents" in batch and batch["control_latents"] is not None:
            control = batch["control_latents"].astype(jnp.float32)
            if control.ndim == 5:
                control = control[:, :, 0]
            x_t = jnp.concatenate([x_t, pack_latents(control)], axis=1)
            img_ids = jnp.concatenate(
                [img_ids, latent_image_ids(h // 2, w // 2, modality=1)], axis=0
            )

        model_inputs = dict(
            hidden_states=x_t,
            encoder_hidden_states=batch["prompt_embeds"],
            timestep=t,
            img_ids=img_ids,
            txt_mask=batch["prompt_embeds_mask"].reshape(b, -1)
            if "prompt_embeds_mask" in batch else None,
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

        pe = embeds["prompt_embeds"]
        b = pe.shape[0]
        h, w = height // 8, width // 8
        img_ids = latent_image_ids(h // 2, w // 2)
        pmask = embeds.get("prompt_embeds_mask")

        def vel(x, t):
            out = self.forward(params, dict(
                hidden_states=pack_latents(x),
                encoder_hidden_states=pe,
                timestep=t,
                img_ids=img_ids,
                txt_mask=pmask.reshape(b, -1) if pmask is not None else None,
                img_seq_len=(h // 2) * (w // 2),
            ))
            return unpack_latents(out.astype(jnp.float32), h, w)

        return euler_flow_sample(
            vel, (b, 16, h, w), key, num_steps=num_steps,
            guidance_scale=guidance_scale,
            shift=self.model_config.get("shift"),
        )

    def make_pp_program(self):
        """Pipeline-parallel program: one phase over the 60 scan-stacked
        dual-stream blocks, img/txt/time embedding on stage 0 and the
        modulated head on the last stage (reference partitions via
        to_layers() + PipelineModule, models/qwen_image.py). See
        parallel/model_pp.py."""
        n_res, n_swap = self.qi_config.swap_split
        if 0 < n_swap < self.qi_config.num_layers:
            raise NotImplementedError(
                "partial blocks_to_swap (split block stacks) cannot be "
                "combined with pipeline_stages > 1; use blocks_to_swap >= "
                "num_layers or drop pipeline parallelism"
            )
        return _QwenImagePPProgram(self)

    def get_call_vae_fn(self):
        # Qwen-Image uses a 16ch Wan-style image VAE; flux VAE stands in
        # until the dedicated loader lands.
        from .flux import FluxPipeline

        return FluxPipeline.get_call_vae_fn(self)

    def _load_vae(self):
        from .flux import FluxPipeline

        return FluxPipeline._load_vae(self)

    def get_call_text_encoder_fns(self):
        mc = self.model_config
        if mc.get("_tiny", False):
            from ..data.bucketing import seed_from_hash

            cfg = self.qi_config

            def te(caps):
                embs, masks = [], []
                for cap in caps:
                    r = np.random.default_rng(seed_from_hash(cap))
                    n = min(len(cap) + 1, 8)
                    e = np.zeros((8, cfg.joint_attention_dim), np.float32)
                    e[:n] = r.standard_normal((n, cfg.joint_attention_dim))
                    m = np.zeros((8,), np.int32)
                    m[:n] = 1
                    embs.append(e)
                    masks.append(m)
                return {"prompt_embeds": np.stack(embs),
                        "prompt_embeds_mask": np.stack(masks)}

            return [te]

        if self.edit:
            # Full Qwen2.5-VL encode: control image through the vision tower,
            # spliced into the templated prompt, mrope position ids, final
            # hidden states with drop_idx 64 cropped (reference
            # qwen_image.py:328-380; parity: tests/test_vision_tower.py).
            # Static shapes: the control image is resized to
            # model.edit_image_size (multiple of 28, default 336).
            import json as _json

            from transformers import AutoTokenizer

            from .llm_encoders import CausalLM, CausalLMConfig, \
                convert_hf_causal_lm
            from .vision_encoders import (
                QwenVLVisionConfig,
                QwenVLVisionTower,
                convert_hf_qwen_vision,
                image_to_qwen_patches,
                qwen_vl_rope_index,
            )
            from .weights import load_safetensors_dir

            path = mc["text_encoder_path"]
            with open(Path(path) / "config.json") as f:
                hf_cfg = _json.load(f)
            img_size = int(mc.get("edit_image_size", 336))
            assert img_size % 28 == 0, "edit_image_size must be 28-divisible"
            drop_idx = 64
            template = (
                "<|im_start|>system\nDescribe the key features of the input "
                "image (color, shape, size, texture, objects, background), "
                "then explain how the user's text instruction should alter "
                "or modify the image. Generate a new image that meets the "
                "user's requirements while maintaining consistency with the "
                "original input where appropriate.<|im_end|>\n"
                "<|im_start|>user\n<|vision_start|><|image_pad|>"
                "<|vision_end|>{}<|im_end|>\n<|im_start|>assistant\n"
            )
            sd = load_safetensors_dir(path)
            tcfg = CausalLMConfig.from_hf_config(hf_cfg)
            vcfg = QwenVLVisionConfig.from_hf_config(hf_cfg,
                                                     dtype=tcfg.dtype)
            lm = CausalLM(tcfg)
            vprefix = ("visual." if any(k.startswith("visual.") for k in sd)
                       else "model.visual.")
            tprefix = ("model.language_model."
                       if any(k.startswith("model.language_model.") for k in sd)
                       else "model.")
            tparams = convert_hf_causal_lm(sd, tcfg, prefix=tprefix)
            vparams = convert_hf_qwen_vision(sd, vcfg, prefix=vprefix)
            tokenizer = AutoTokenizer.from_pretrained(path)
            image_token_id = int(hf_cfg.get("image_token_id", 151655))
            grid = (1, img_size // 14, img_size // 14)
            tower = QwenVLVisionTower(vcfg, (grid,))
            n_img = grid[1] * grid[2] // 4
            max_len = int(mc.get("max_sequence_length", 512)) + drop_idx + n_img

            tower_apply = jax.jit(lambda px: tower.apply(vparams, px))
            lm_apply = jax.jit(
                lambda e, m, p: lm.apply(
                    tparams, None, attn_mask=m, input_embeds=e,
                    position_ids=p,
                )[0]
            )
            embed_table = tparams["params"]["token_embedding"]["embedding"]

            def fn(caps, control_files):
                from PIL import Image

                texts = [
                    template.format(c).replace(
                        "<|image_pad|>", "<|image_pad|>" * n_img)
                    for c in caps
                ]
                tok = tokenizer(
                    texts, padding="max_length", truncation=True,
                    max_length=max_len, return_tensors="np",
                )
                embeds_out, mask_out = [], []
                for i, ctrl in enumerate(control_files):
                    img = Image.open(ctrl).convert("RGB").resize(
                        (img_size, img_size), Image.BICUBIC)
                    arr = np.asarray(img, np.float32).transpose(2, 0, 1)
                    arr = arr / 127.5 - 1.0
                    patches, _ = image_to_qwen_patches(arr)
                    vis = tower_apply(jnp.asarray(patches))
                    ids_i = tok["input_ids"][i]
                    emb = np.asarray(embed_table)[ids_i]
                    img_pos = np.nonzero(ids_i == image_token_id)[0]
                    emb[img_pos] = np.asarray(vis, emb.dtype)
                    pos = qwen_vl_rope_index(ids_i, image_token_id, grid,
                                             merge=2)
                    h = lm_apply(
                        jnp.asarray(emb)[None],
                        jnp.asarray(tok["attention_mask"][i])[None],
                        jnp.asarray(pos)[None],
                    )
                    embeds_out.append(np.asarray(h[0, drop_idx:]))
                    mask_out.append(
                        tok["attention_mask"][i][drop_idx:].astype(np.int32))
                return {"prompt_embeds": np.stack(embeds_out),
                        "prompt_embeds_mask": np.stack(mask_out)}

            return [fn]
        # Qwen2.5-VL text tower with the Qwen-Image chat template; the first
        # drop_idx=34 tokens (system+role scaffold) are dropped from the
        # hidden states (reference models/qwen_image.py:182-185, 328-380).
        from .llm_encoders import LLMTextEncoder

        template = (
            "<|im_start|>system\nDescribe the image by detailing the color, "
            "shape, size, texture, quantity, text, spatial relationships of "
            "the objects and background:<|im_end|>\n"
            "<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n"
        )
        enc = LLMTextEncoder(
            mc["text_encoder_path"],
            max_length=int(mc.get("max_sequence_length", 512)),
            template=template,
            crop_start=34,
            hidden_layer=-1,
        )

        def fn(caps):
            h, m = enc.encode(caps)
            return {"prompt_embeds": h, "prompt_embeds_mask": m.astype(np.int32)}

        return [fn]

    # --- weights ------------------------------------------------------------

    def _keymap_config(self):
        return self.qi_config

    def keymap(self):
        """diffusers QwenImageTransformer2DModel keys (the reference loads
        these via manual safetensors load, models/qwen_image.py:247-269) <->
        our FluxDoubleBlock-based stacked layout; LoRA export in ComfyUI
        format ('diffusion_model.' prefix, models/qwen_image.py:284-288)."""
        from .keymaps import BlockGroup, KeyMap

        linears = {
            "norm1_linear": "img_mod.1",
            "norm1_context_linear": "txt_mod.1",
            "attn_to_q": "attn.to_q",
            "attn_to_k": "attn.to_k",
            "attn_to_v": "attn.to_v",
            "attn_add_q": "attn.add_q_proj",
            "attn_add_k": "attn.add_k_proj",
            "attn_add_v": "attn.add_v_proj",
            "attn_to_out": "attn.to_out.0",
            "attn_to_add_out": "attn.to_add_out",
            "ff_in": "img_mlp.net.0.proj",
            "ff_out": "img_mlp.net.2",
            "ff_context_in": "txt_mlp.net.0.proj",
            "ff_context_out": "txt_mlp.net.2",
        }
        norms = {
            "attn_norm_q": "attn.norm_q",
            "attn_norm_k": "attn.norm_k",
            "attn_norm_added_q": "attn.norm_added_q",
            "attn_norm_added_k": "attn.norm_added_k",
        }
        # partial blocks_to_swap: the deepest blocks live in "blocks_swap"
        # but keep the reference's single-stack checkpoint indices
        n_res, n_swap = self.qi_config.swap_split
        split = 0 < n_swap and n_res > 0
        blocks = [BlockGroup(
            "blocks", "transformer_blocks",
            "num_res" if split else "num_layers",
            linears=dict(linears), norms=dict(norms))]
        if split:
            blocks.append(BlockGroup(
                "blocks_swap", "transformer_blocks", "num_swap",
                offset=n_res, linears=dict(linears), norms=dict(norms)))
        return KeyMap(
            blocks=blocks,
            top_linears={
                "img_in": "img_in",
                "txt_in": "txt_in",
                "time_text_embed/linear_1":
                    "time_text_embed.timestep_embedder.linear_1",
                "time_text_embed/linear_2":
                    "time_text_embed.timestep_embedder.linear_2",
                "norm_out_linear": "norm_out.linear",
                "proj_out": "proj_out",
            },
            top_norms={"txt_norm": "txt_norm"},
            lora_prefix="diffusion_model.",
        )

    def load_weights(self):
        from .keymaps import keymap_to_flax, load_sd_for_pipeline

        return keymap_to_flax(
            load_sd_for_pipeline(self), self.keymap(), self.qi_config
        )


class _QwenImagePPProgram:
    """PPProgram for QwenImageTransformer (see parallel/model_pp.py).

    Raw-param re-expression of the __call__ split at the block scan.
    Payload: (img [B,L,D], txt [B,Lc,D], temb [B,D], txt_mask [B,Lc]).
    The image-token count for the head slice comes from the target shape
    (control latents extend the payload sequence but not the target).
    """

    def __init__(self, pipeline):
        from ..parallel.model_pp import PPPhase

        self.pipeline = pipeline
        cfg = pipeline.qi_config
        self.cfg = cfg
        self.phases = [
            PPPhase("blocks", cfg.num_layers, self._apply_block)
        ]

    def _apply_block(self, p_i, payload, ctx):
        from .flux_model import FluxDoubleBlock

        img, txt, temb, txt_mask = payload
        (img, txt), _ = FluxDoubleBlock(self.cfg.to_flux_config()).apply(
            {"params": p_i}, (img, txt), temb, ctx["rope_cos"],
            ctx["rope_sin"], txt_mask,
        )
        return (img, txt, temb, txt_mask)

    def make_ctx(self, p_rest, mi0):
        from .layers import rope_frequencies

        cfg = self.cfg
        img_ids = mi0["img_ids"]
        stxt = mi0["encoder_hidden_states"].shape[1]
        max_idx = jnp.max(img_ids) + 1
        txt_ids = jnp.broadcast_to(
            (max_idx + jnp.arange(stxt))[:, None], (stxt, 3)
        ).astype(jnp.float32)
        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        rope_cos, rope_sin = rope_frequencies(
            ids, tuple(cfg.axes_dims_rope), cfg.rope_theta
        )
        return {"rope_cos": rope_cos, "rope_sin": rope_sin}

    def embed(self, p_rest, mi, ctx):
        import flax.linen as nn

        from .layers import LoraDense, RMSNorm, TimestepEmbedder

        cfg = self.cfg
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        hidden_states = mi["hidden_states"]
        enc = mi["encoder_hidden_states"]
        b = hidden_states.shape[0]

        img = LoraDense(dim, **dd).apply(
            {"params": p_rest["img_in"]}, hidden_states.astype(cfg.dtype))
        txt = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype).apply(
            {"params": p_rest["txt_norm"]}, enc.astype(cfg.dtype))
        txt = LoraDense(dim, **dd).apply({"params": p_rest["txt_in"]}, txt)
        temb = TimestepEmbedder(dim, **dd).apply(
            {"params": p_rest["time_text_embed"]},
            mi["timestep"].astype(jnp.float32) * 1000.0,
        )
        temb = nn.silu(temb)
        txt_mask = mi.get("txt_mask")
        if txt_mask is None:
            txt_mask = jnp.ones((b, enc.shape[1]), jnp.int32)
        return (img, txt, temb, txt_mask)

    def head_loss(self, p_rest, payload, target, mask, ctx):
        from .layers import LoraDense, layer_norm_no_affine, modulate

        cfg = self.cfg
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        img, _txt, temb, _tm = payload

        out = img[:, : target.shape[1]]
        mod = LoraDense(2 * dim, **dd).apply(
            {"params": p_rest["norm_out_linear"]}, temb)
        scale, shift = jnp.split(mod, 2, axis=-1)
        out = modulate(layer_norm_no_affine(out), shift, scale)
        out = LoraDense(cfg.out_channels, **dd).apply(
            {"params": p_rest["proj_out"]}, out)
        return self.pipeline.loss_fn(out, target, mask)
