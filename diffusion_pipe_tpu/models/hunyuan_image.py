"""HunyuanImage-2.1 model family.

Reference: models/hunyuan_image.py (509 LoC) + hunyuan_image_modeling.py
(vendored Tencent MM blocks). The blocks are the HunyuanVideo MM design
(joint [img, txt] attention, fused qkv, RMS qk-norm, adaLN-Zero) so this
file reuses hunyuan_video_model's block modules; the top-level differences
(reference hunyuan_image.py:90-117, 384-509) are:
  - 2D latents, 64 channels (32x-compression VAE), patch_size (1, 1)
  - hidden 3584, 28 heads, 20 double + 40 single blocks, rope dims (64, 64)
  - conditioning vec = timestep only (guidance_embed=False, no CLIP pooled)
  - text branch: Qwen2.5-VL hidden_states[-3] through the single-refiner
    txt_in, PLUS a glyph byT5-small branch projected by byt5_in and merged
    into the text stream (glyph_byT5_v2, reference :106, :437-439)
  - flow matching, t*1000 into the model (reference :311-320)

Flagged for real-checkpoint verification: byt5_in mapper internals and the
dit-llm-encode-v2 prompt template / crop_start (configurable via
model.prompt_template / model.crop_start).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from . import register_model
from .base import BasePipeline
from .hunyuan_video_model import (
    HunyuanDoubleBlock,
    HunyuanSingleBlock,
    TokenRefinerBlock,
)
from .layers import (
    LoraDense,
    layer_norm_no_affine,
    modulate,
    remat_spec,
    remat_wrap,
    rope_frequencies,
    sinusoidal_timestep_embedding,
)
from ..training.flow import TimestepDistribution, sample_timesteps

Dtype = Any


@dataclasses.dataclass(frozen=True)
class HunyuanImageConfig:
    in_channels: int = 64
    out_channels: int = 64
    patch_size: Tuple[int, int] = (1, 1)
    num_attention_heads: int = 28
    attention_head_dim: int = 128
    num_layers: int = 20
    num_single_layers: int = 40
    mlp_ratio: float = 4.0
    text_dim: int = 3584          # Qwen2.5-VL hidden
    byt5_dim: int = 1472          # byT5-small hidden
    byt5_mapper_dim: int = 2048
    rope_axes_dim: Tuple[int, ...] = (64, 64)
    rope_theta: float = 256.0
    refiner_layers: int = 2
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
    def hidden_size(self):
        return self.num_attention_heads * self.attention_head_dim

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
        d = dict(
            in_channels=8, out_channels=8, num_attention_heads=4,
            attention_head_dim=16, num_layers=2, num_single_layers=2,
            text_dim=32, byt5_dim=16, byt5_mapper_dim=24,
            rope_axes_dim=(8, 8), refiner_layers=1,
            dtype=jnp.float32, param_dtype=jnp.float32,
        )
        d.update(kw)
        return HunyuanImageConfig(**d)


class HunyuanImageTransformer(nn.Module):
    config: HunyuanImageConfig

    @nn.compact
    def __call__(
        self,
        x,            # [B, 64, H, W] latents
        t,            # [B] in [0, 1000]
        text_states,  # [B, S, text_dim] Qwen2.5-VL hidden_states[-3], cropped
        text_mask,    # [B, S]
        byt5_states,  # [B, Sb, byt5_dim] glyph byT5 embeds
        byt5_mask,    # [B, Sb]
    ):
        cfg = self.config
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, c, h, w = x.shape
        ph, pw = cfg.patch_size
        gh, gw = h // ph, w // pw
        img_len = gh * gw

        xe = jnp.transpose(x, (0, 2, 3, 1)).astype(cfg.dtype)
        xe = nn.Conv(dim, cfg.patch_size, strides=cfg.patch_size,
                     padding="VALID", dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype, name="img_in")(xe)
        img = xe.reshape(b, img_len, dim)

        # vec = timestep embedding only (guidance_embed=False, no pooled)
        temb = sinusoidal_timestep_embedding(t.astype(jnp.float32), 256)
        vec = LoraDense(dim, name="time_in_1", **dd)(temb.astype(cfg.dtype))
        vec = LoraDense(dim, name="time_in_2", **dd)(nn.silu(vec))

        # single-refiner txt_in (hyvideo-style token refiner)
        txt = LoraDense(dim, name="txt_in_proj", **dd)(
            text_states.astype(cfg.dtype)
        )
        tm = text_mask.astype(jnp.float32)
        pooled_txt = jnp.sum(
            text_states.astype(jnp.float32) * tm[..., None], axis=1
        ) / jnp.maximum(jnp.sum(tm, axis=1, keepdims=True), 1.0)
        rc = LoraDense(dim, name="refiner_t_embed_1", **dd)(
            temb.astype(cfg.dtype))
        rc = LoraDense(dim, name="refiner_t_embed_2", **dd)(nn.silu(rc))
        rp = LoraDense(dim, name="refiner_c_embed_1", **dd)(
            pooled_txt.astype(cfg.dtype))
        rp = LoraDense(dim, name="refiner_c_embed_2", **dd)(nn.silu(rp))
        refiner_c = rc + rp
        for i in range(cfg.refiner_layers):
            txt = TokenRefinerBlock(cfg, name=f"refiner_{i}")(
                txt, refiner_c, text_mask
            )

        # glyph byT5 branch -> merged into the text stream. The reference's
        # reorder_txt_token packs [valid byt5, valid txt] per sample; with
        # key-validity masking a static [byt5, txt] concat attends
        # identically (text has no rope, so token position is irrelevant).
        # Structure mirrors the Glyph-ByT5 mapper the hyimage DiT embeds
        # (`byt5_in`: affine LayerNorm -> fc1 -> GELU -> fc2 -> GELU -> fc3,
        # 1472 -> 2048 -> 2048 -> hidden; KEEP_IN_HIGH_PRECISION lists
        # 'byt5_in', reference models/hunyuan_image.py:26).
        g = nn.LayerNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                         name="byt5_layernorm")(byt5_states.astype(cfg.dtype))
        g = LoraDense(cfg.byt5_mapper_dim, name="byt5_fc1", **dd)(g)
        g = nn.gelu(g, approximate=True)
        g = LoraDense(cfg.byt5_mapper_dim, name="byt5_fc2", **dd)(g)
        g = nn.gelu(g, approximate=True)
        g = LoraDense(dim, name="byt5_fc3", **dd)(g)
        txt = jnp.concatenate([g, txt], axis=1)
        full_mask = jnp.concatenate(
            [byt5_mask.astype(jnp.int32), text_mask.astype(jnp.int32)], axis=1
        )

        hi = jnp.repeat(jnp.arange(gh), gw)
        wi = jnp.tile(jnp.arange(gw), gh)
        ids = jnp.stack([hi, wi], axis=-1)
        rope_cos, rope_sin = rope_frequencies(
            ids, cfg.rope_axes_dim, cfg.rope_theta
        )

        block = HunyuanDoubleBlock
        sblock = HunyuanSingleBlock
        if cfg.remat:
            block = remat_wrap(block, cfg.remat)
            sblock = remat_wrap(sblock, cfg.remat)
        (img, txt), _ = nn.scan(
            block,
            variable_axes={"params": 0}, split_rngs={"params": True},
            in_axes=nn.broadcast, length=cfg.num_layers,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )(cfg, name="double_blocks")((img, txt), vec, rope_cos, rope_sin,
                                     full_mask)

        xcat = jnp.concatenate([img, txt], axis=1)
        kv_mask = jnp.concatenate(
            [jnp.ones((b, img_len), jnp.int32), full_mask], axis=1
        )
        xcat, _ = nn.scan(
            sblock,
            variable_axes={"params": 0}, split_rngs={"params": True},
            in_axes=nn.broadcast, length=cfg.num_single_layers,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )(cfg, img_len, name="single_blocks")(xcat, vec, rope_cos, rope_sin,
                                              kv_mask)
        img = xcat[:, :img_len]

        mod = LoraDense(2 * dim, name="final_mod", **dd)(nn.silu(vec))
        shift, scale = jnp.split(mod, 2, -1)
        img = modulate(layer_norm_no_affine(img), shift, scale)
        out = LoraDense(ph * pw * cfg.out_channels, name="final_linear",
                        dtype=jnp.float32, param_dtype=cfg.param_dtype)(img)
        out = out.reshape(b, gh, gw, ph, pw, cfg.out_channels)
        out = jnp.einsum("bhwpqc->bchpwq", out)
        return out.reshape(b, cfg.out_channels, gh * ph, gw * pw)


@register_model("hunyuan_image")
class HunyuanImagePipeline(BasePipeline):
    name = "hunyuan_image"
    cacheable_text_embeddings = (
        "text_states", "text_mask", "byt5_states", "byt5_mask",
    )

    def __init__(self, config):
        super().__init__(config)
        mc = self.model_config
        self.tdist = TimestepDistribution.from_model_config(mc)
        self.hi_config = self._build_config()
        self.model = HunyuanImageTransformer(self.hi_config)

    def _build_config(self) -> HunyuanImageConfig:
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
            return HunyuanImageConfig.tiny(**kwargs)
        return HunyuanImageConfig(**kwargs)

    def init_params(self, rng):
        cfg = self.hi_config
        return jax.jit(self.model.init)(
            rng,
            jnp.zeros((1, cfg.in_channels, 8, 8)),
            jnp.zeros((1,)),
            jnp.zeros((1, 8, cfg.text_dim)),
            jnp.ones((1, 8), jnp.int32),
            jnp.zeros((1, 4, cfg.byt5_dim)),
            jnp.ones((1, 4), jnp.int32),
        )

    def prepare_inputs(self, rng, batch, timestep_quantile=None):
        latents = batch["latents"].astype(jnp.float32)
        if latents.ndim == 5:
            latents = latents[:, :, 0]
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
        target = noise - latents
        model_inputs = dict(
            x=x_t,
            t=t * 1000.0,  # reference hunyuan_image.py:317
            text_states=batch["text_states"],
            text_mask=batch["text_mask"].reshape(b, -1),
            byt5_states=batch["byt5_states"],
            byt5_mask=batch["byt5_mask"].reshape(b, -1),
        )
        return model_inputs, target, mask

    def sample(self, params, width, height, key, num_steps=20,
               guidance_scale=1.0, **embeds):
        """Euler flow sampling through the training forward (reference
        CommonPipeline.sample, models/base.py:263-291). Returns latents
        [B, C, h, w] (HunyuanImage 32x deep-compression VAE)."""
        from ..training.sampling import euler_flow_sample

        ts = embeds["text_states"]
        b = ts.shape[0]
        c = self.hi_config.in_channels
        h, w = height // 32, width // 32

        def vel(x, t):
            return self.forward(params, dict(
                x=x.astype(self.hi_config.dtype),
                t=t * 1000.0,  # reference hunyuan_image.py:317
                text_states=ts,
                text_mask=embeds["text_mask"].reshape(b, -1),
                byt5_states=embeds["byt5_states"],
                byt5_mask=embeds["byt5_mask"].reshape(b, -1),
            )).astype(jnp.float32)

        return euler_flow_sample(
            vel, (b, c, h, w), key, num_steps=num_steps,
            guidance_scale=guidance_scale,
            shift=self.model_config.get("shift"),
        )

    def make_pp_program(self):
        """Pipeline-parallel program (reference partitions any model via
        to_layers() + PipelineModule). See parallel/model_pp.py."""
        return _HunyuanImagePPProgram(self)

    def forward(self, params, model_inputs):
        return self.model.apply(params, **model_inputs)

    # --- weights ------------------------------------------------------------

    # ComfyUI single-file dialect renames (reference hunyuan_image.py:33-42
    # ORIGINAL_TO_COMFYUI_LORA_MAPPING; ComfyUI checkpoints use the same
    # renames on the full weights).
    _COMFY_RENAMES = (
        ("_attn.qkv", "_attn_qkv"),
        ("_attn.proj", "_attn_proj"),
        ("_mlp.0", "_mlp.fc1"),
        ("_mlp.2", "_mlp.fc2"),
        ("_mod.lin.", "_mod.linear."),
        ("modulation.lin.", "modulation.linear."),
    )

    def _keymap_config(self):
        return self.hi_config

    def keymap(self):
        """hyimage-format keys (reference models/hunyuan_image.py:90-117
        loads the official HunyuanImage-2.1 transformer into the vendored
        HYImageDiffusionTransformer: hyvideo-style MM double/single blocks,
        single-refiner txt_in, glyph byt5_in mapper, no vector_in/guidance)
        <-> our stacked flax layout. LoRA export uses the ComfyUI dialect
        with the `diffusion_model.` prefix (reference :125-134)."""
        from .keymaps import BlockGroup, KeyMap

        cfg = self.hi_config
        top_linears = {
            "time_in_1": "time_in.mlp.0",
            "time_in_2": "time_in.mlp.2",
            "txt_in_proj": "txt_in.input_embedder",
            "refiner_t_embed_1": "txt_in.t_embedder.mlp.0",
            "refiner_t_embed_2": "txt_in.t_embedder.mlp.2",
            "refiner_c_embed_1": "txt_in.c_embedder.linear_1",
            "refiner_c_embed_2": "txt_in.c_embedder.linear_2",
            "byt5_fc1": "byt5_in.fc1",
            "byt5_fc2": "byt5_in.fc2",
            "byt5_fc3": "byt5_in.fc3",
            "final_linear": "final_layer.linear",
            "final_mod": "final_layer.adaLN_modulation.1",
        }
        top_norms = {"byt5_layernorm": "byt5_in.layernorm"}
        top_raw = {"byt5_layernorm/bias": "byt5_in.layernorm.bias"}
        for i in range(cfg.refiner_layers):
            ref = f"txt_in.individual_token_refiner.blocks.{i}"
            top_linears.update({
                f"refiner_{i}/adaLN_linear": f"{ref}.adaLN_modulation.1",
                f"refiner_{i}/self_attn_qkv": f"{ref}.self_attn_qkv",
                f"refiner_{i}/self_attn_proj": f"{ref}.self_attn_proj",
                f"refiner_{i}/mlp_in": f"{ref}.mlp.fc1",
                f"refiner_{i}/mlp_out": f"{ref}.mlp.fc2",
            })
            top_raw.update({
                f"refiner_{i}/norm1_scale": f"{ref}.norm1.weight",
                f"refiner_{i}/norm1_bias": f"{ref}.norm1.bias",
                f"refiner_{i}/norm2_scale": f"{ref}.norm2.weight",
                f"refiner_{i}/norm2_bias": f"{ref}.norm2.bias",
            })
        return KeyMap(
            blocks=[
                BlockGroup(
                    "double_blocks", "double_blocks", "num_layers",
                    linears={
                        "img_mod": "img_mod.linear",
                        "txt_mod": "txt_mod.linear",
                        "img_attn_qkv": "img_attn_qkv",
                        "img_attn_proj": "img_attn_proj",
                        "img_mlp_fc1": "img_mlp.fc1",
                        "img_mlp_fc2": "img_mlp.fc2",
                        "txt_attn_qkv": "txt_attn_qkv",
                        "txt_attn_proj": "txt_attn_proj",
                        "txt_mlp_fc1": "txt_mlp.fc1",
                        "txt_mlp_fc2": "txt_mlp.fc2",
                    },
                    norms={
                        "img_attn_q_norm": "img_attn_q_norm",
                        "img_attn_k_norm": "img_attn_k_norm",
                        "txt_attn_q_norm": "txt_attn_q_norm",
                        "txt_attn_k_norm": "txt_attn_k_norm",
                    },
                ),
                BlockGroup(
                    "single_blocks", "single_blocks", "num_single_layers",
                    linears={
                        "modulation": "modulation.linear",
                        "linear1": "linear1",
                        "linear2": "linear2",
                    },
                    norms={"q_norm": "q_norm", "k_norm": "k_norm"},
                ),
            ],
            top_linears=top_linears,
            top_norms=top_norms,
            top_raw=top_raw,
            top_convs={"img_in": "img_in.proj"},
            lora_prefix="diffusion_model.",
        )

    def load_weights(self):
        from .keymaps import keymap_to_flax, load_sd_for_pipeline

        sd = load_sd_for_pipeline(self)
        # accept both the original hyimage dialect and ComfyUI single files
        renamed = {}
        for k, v in sd.items():
            for comfy, orig in self._COMFY_RENAMES:
                k = k.replace(comfy, orig)
            renamed[k] = v
        return keymap_to_flax(renamed, self.keymap(), self.hi_config)

    def save_adapter(self, path, params):
        """ComfyUI-dialect LoRA export (reference hunyuan_image.py:125-134:
        ORIGINAL_TO_COMFYUI_LORA_MAPPING then `diffusion_model.` prefix)."""
        from .keymaps import export_lora_keymap, save_lora_safetensors

        km = self.keymap()
        sd = export_lora_keymap(params, km, self.hi_config)
        if not sd:
            raise RuntimeError("no adapter factors found to export")
        out = {}
        for k, v in sd.items():
            for comfy, orig in self._COMFY_RENAMES:
                k = k.replace(orig, comfy)
            out[k] = v
        alpha = self.config.get("adapter", {}).get("alpha")
        save_lora_safetensors(path, out, alpha=alpha)
        print(f"saved {len(out)} adapter tensors to {path}")

    def get_call_vae_fn(self):
        """HunyuanImage-2.1 32x-compression VAE (docs/supported_models.md:
        422-425): a deep KL VAE — the universal loader infers depth/widths
        from the checkpoint shapes (model.vae_path)."""
        return self._generic_image_vae_fn(
            tiny_latent_channels=8 if self.model_config.get("_tiny")
            else 64,
        )

    def get_call_text_encoder_fns(self):
        mc = self.model_config
        if mc.get("_tiny", False):
            from ..data.bucketing import seed_from_hash

            cfg = self.hi_config

            def te(caps):
                out = {"text_states": [], "text_mask": [],
                       "byt5_states": [], "byt5_mask": []}
                for cap in caps:
                    r = np.random.default_rng(seed_from_hash(cap))
                    out["text_states"].append(
                        r.standard_normal((8, cfg.text_dim)).astype(np.float32))
                    out["text_mask"].append(np.ones((8,), np.int32))
                    out["byt5_states"].append(
                        r.standard_normal((4, cfg.byt5_dim)).astype(np.float32))
                    out["byt5_mask"].append(np.ones((4,), np.int32))
                return {k: np.stack(v) for k, v in out.items()}

            return [te]

        # Qwen2.5-VL hidden_states[-3] with chat template + crop
        # (reference hunyuan_image.py:180-202) and glyph byT5 over quoted
        # spans (reference :204-242).
        import re as _re

        from .llm_encoders import LLMTextEncoder
        from .text_encoders import HFTextEncoder

        template = mc.get(
            "prompt_template",
            "<|im_start|>system\nDescribe the image by detailing the color, "
            "shape, size, texture, quantity, text, spatial relationships of "
            "the objects and background:<|im_end|>\n"
            "<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n",
        )
        crop_start = int(mc.get("crop_start", 34))
        qwen = LLMTextEncoder(
            mc["text_encoder_path"],
            max_length=int(mc.get("max_sequence_length", 1000 - crop_start)),
            template=template, crop_start=crop_start, hidden_layer=-3,
        )
        byt5 = HFTextEncoder("t5", mc["byt5_path"], max_length=128)

        def qwen_fn(caps):
            h, m = qwen.encode(caps)
            return {"text_states": h, "text_mask": m.astype(np.int32)}

        def byt5_fn(caps):
            formatted, zero_rows = [], []
            for i, prompt in enumerate(caps):
                spans = (
                    _re.findall(r"\"(.*?)\"", prompt)
                    + _re.findall(r"‘(.*?)’", prompt)
                    + _re.findall(r"“(.*?)”", prompt)
                )
                if not spans:
                    zero_rows.append(i)
                formatted.append("".join(f'Text "{s}". ' for s in spans))
            h, m = byt5.encode(formatted, return_mask=True)
            h = np.asarray(h)
            if zero_rows:
                h[np.asarray(zero_rows)] = 0.0
            return {"byt5_states": h, "byt5_mask": np.asarray(m, np.int32)}

        return [qwen_fn, byt5_fn]


class _HunyuanImagePPProgram:
    """PPProgram for HunyuanImageTransformer (see parallel/model_pp.py).
    The token refiner + byT5 glyph mapper run on stage 0.
    Phase 1 payload: (img, txt, vec, full_mask); phase 2 (after concat
    `pre`): (xcat, vec, kv_mask)."""

    def __init__(self, pipeline):
        from ..parallel.model_pp import PPPhase

        self.pipeline = pipeline
        cfg = pipeline.hi_config
        self.cfg = cfg
        self.phases = [
            PPPhase("double_blocks", cfg.num_layers, self._apply_double),
            PPPhase("single_blocks", cfg.num_single_layers,
                    self._apply_single, pre=self._to_single_stream),
        ]

    def _apply_double(self, p_i, payload, ctx):
        from .hunyuan_video_model import HunyuanDoubleBlock

        img, txt, vec, fm = payload
        (img, txt), _ = HunyuanDoubleBlock(self.cfg).apply(
            {"params": p_i}, (img, txt), vec, ctx["rope_cos"],
            ctx["rope_sin"], fm,
        )
        return (img, txt, vec, fm)

    def _to_single_stream(self, payload, ctx):
        img, txt, vec, fm = payload
        xcat = jnp.concatenate([img, txt], axis=1)
        kv_mask = jnp.concatenate(
            [jnp.ones((img.shape[0], ctx["img_len"]), jnp.int32), fm],
            axis=1,
        )
        return (xcat, vec, kv_mask)

    def _apply_single(self, p_i, payload, ctx):
        from .hunyuan_video_model import HunyuanSingleBlock

        xcat, vec, kvm = payload
        xcat, _ = HunyuanSingleBlock(self.cfg, ctx["img_len"]).apply(
            {"params": p_i}, xcat, vec, ctx["rope_cos"], ctx["rope_sin"], kvm
        )
        return (xcat, vec, kvm)

    def make_ctx(self, p_rest, mi0):
        cfg = self.cfg
        _b, _c, h, w = mi0["x"].shape
        ph, pw = cfg.patch_size
        gh, gw = h // ph, w // pw
        hi = jnp.repeat(jnp.arange(gh), gw)
        wi = jnp.tile(jnp.arange(gw), gh)
        ids = jnp.stack([hi, wi], axis=-1)
        rope_cos, rope_sin = rope_frequencies(
            ids, cfg.rope_axes_dim, cfg.rope_theta
        )
        return {"rope_cos": rope_cos, "rope_sin": rope_sin,
                "grid": (gh, gw), "hw": (h, w), "img_len": gh * gw}

    def embed(self, p_rest, mi, ctx):
        from .hunyuan_video_model import TokenRefinerBlock

        cfg = self.cfg
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        x, t = mi["x"], mi["t"]
        text_states, text_mask = mi["text_states"], mi["text_mask"]
        byt5_states, byt5_mask = mi["byt5_states"], mi["byt5_mask"]
        b = x.shape[0]

        xe = jnp.transpose(x, (0, 2, 3, 1)).astype(cfg.dtype)
        xe = nn.Conv(dim, cfg.patch_size, strides=cfg.patch_size,
                     padding="VALID", dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype).apply(
            {"params": p_rest["img_in"]}, xe)
        img = xe.reshape(b, ctx["img_len"], dim)

        temb = sinusoidal_timestep_embedding(t.astype(jnp.float32), 256)
        vec = LoraDense(dim, **dd).apply(
            {"params": p_rest["time_in_1"]}, temb.astype(cfg.dtype))
        vec = LoraDense(dim, **dd).apply(
            {"params": p_rest["time_in_2"]}, nn.silu(vec))

        txt = LoraDense(dim, **dd).apply(
            {"params": p_rest["txt_in_proj"]}, text_states.astype(cfg.dtype))
        tm = text_mask.astype(jnp.float32)
        pooled_txt = jnp.sum(
            text_states.astype(jnp.float32) * tm[..., None], axis=1
        ) / jnp.maximum(jnp.sum(tm, axis=1, keepdims=True), 1.0)
        rc = LoraDense(dim, **dd).apply(
            {"params": p_rest["refiner_t_embed_1"]}, temb.astype(cfg.dtype))
        rc = LoraDense(dim, **dd).apply(
            {"params": p_rest["refiner_t_embed_2"]}, nn.silu(rc))
        rp = LoraDense(dim, **dd).apply(
            {"params": p_rest["refiner_c_embed_1"]},
            pooled_txt.astype(cfg.dtype))
        rp = LoraDense(dim, **dd).apply(
            {"params": p_rest["refiner_c_embed_2"]}, nn.silu(rp))
        refiner_c = rc + rp
        for i in range(cfg.refiner_layers):
            txt = TokenRefinerBlock(cfg).apply(
                {"params": p_rest[f"refiner_{i}"]}, txt, refiner_c, text_mask)

        g = nn.LayerNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype).apply(
            {"params": p_rest["byt5_layernorm"]},
            byt5_states.astype(cfg.dtype))
        g = LoraDense(cfg.byt5_mapper_dim, **dd).apply(
            {"params": p_rest["byt5_fc1"]}, g)
        g = nn.gelu(g, approximate=True)
        g = LoraDense(cfg.byt5_mapper_dim, **dd).apply(
            {"params": p_rest["byt5_fc2"]}, g)
        g = nn.gelu(g, approximate=True)
        g = LoraDense(dim, **dd).apply({"params": p_rest["byt5_fc3"]}, g)
        txt = jnp.concatenate([g, txt], axis=1)
        full_mask = jnp.concatenate(
            [byt5_mask.astype(jnp.int32), text_mask.astype(jnp.int32)],
            axis=1,
        )
        return (img, txt, vec, full_mask)

    def head_loss(self, p_rest, payload, target, mask, ctx):
        cfg = self.cfg
        dim = cfg.hidden_size
        ph, pw = cfg.patch_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        gh, gw = ctx["grid"]
        h, w = ctx["hw"]
        xcat, vec, _kvm = payload
        b = xcat.shape[0]

        img = xcat[:, : ctx["img_len"]]
        mod = LoraDense(2 * dim, **dd).apply(
            {"params": p_rest["final_mod"]}, nn.silu(vec))
        shift, scale = jnp.split(mod, 2, -1)
        img = modulate(layer_norm_no_affine(img), shift, scale)
        out = LoraDense(ph * pw * cfg.out_channels, dtype=jnp.float32,
                        param_dtype=cfg.param_dtype).apply(
            {"params": p_rest["final_linear"]}, img)
        out = out.reshape(b, gh, gw, ph, pw, cfg.out_channels)
        out = jnp.einsum("bhwpqc->bchpwq", out).reshape(
            b, cfg.out_channels, h, w)
        return self.pipeline.loss_fn(out, target, mask)
