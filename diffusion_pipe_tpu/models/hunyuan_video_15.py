"""HunyuanVideo-1.5 model family.

Reference: models/hunyuan_video_15.py (332 LoC over the ComfyUI
hyvideo-1.5 model). Structure extracted from that wrapper:
  - DOUBLE stream blocks only (to_layers iterates double_blocks alone,
    reference :100-106) — the HunyuanVideo MM block design, [img, txt]
    attention order, rope on img tokens (txt ids are zero => identity)
  - vec = timestep embedding only (vector_in is None, guidance_embed off,
    reference :212-214, :250)
  - txt_in = token refiner driven by timesteps + text mask (:255)
  - byT5 glyph branch through byt5_in, a cond_type_embedding(2) added to
    text (type 0) and byt5 (type 1) tokens, byt5 FIRST in the concat
    (:257-273)
  - model input = cat([noisy latents, zero cond latents, zero mask], C)
    (:175-177), t*1000, flow matching target noise - latents
  - framerate 24, video support

Model dims are checkpoint-dependent — set hidden/heads/layers via the
model config table; defaults below follow the 1.5 8B release. byt5_in
mapper internals flagged for real-checkpoint verification.
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
from .hunyuan_video_model import HunyuanDoubleBlock, TokenRefinerBlock
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
class HunyuanVideo15Config:
    latent_channels: int = 32
    out_channels: int = 32
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    num_attention_heads: int = 24
    attention_head_dim: int = 128
    num_layers: int = 36          # double blocks only
    mlp_ratio: float = 4.0
    text_dim: int = 2560          # Qwen3-4B-ish text tower width
    byt5_dim: int = 1472
    byt5_mapper_dim: int = 2048
    rope_axes_dim: Tuple[int, ...] = (16, 56, 56)
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
    sequence_sharding: bool = False

    @property
    def in_channels(self):
        # noisy latents + zero conditioning latents + zero mask channel
        return 2 * self.latent_channels + 1

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
            latent_channels=4, out_channels=4, num_attention_heads=4,
            attention_head_dim=16, num_layers=2, text_dim=32, byt5_dim=16,
            byt5_mapper_dim=24, rope_axes_dim=(4, 6, 6), refiner_layers=1,
            dtype=jnp.float32, param_dtype=jnp.float32,
        )
        d.update(kw)
        return HunyuanVideo15Config(**d)


class HunyuanVideo15Transformer(nn.Module):
    config: HunyuanVideo15Config

    @nn.compact
    def __call__(
        self,
        x,            # [B, in_channels, F, H, W]
        t,            # [B] in [0, 1000]
        text_states,  # [B, S, text_dim]
        text_mask,    # [B, S]
        byt5_states,  # [B, Sb, byt5_dim]
        byt5_mask,    # [B, Sb]
    ):
        cfg = self.config
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, c, f, h, w = x.shape
        pt, ph, pw = cfg.patch_size
        gf, gh, gw = f // pt, h // ph, w // pw
        img_len = gf * gh * gw

        xe = jnp.transpose(x, (0, 2, 3, 4, 1)).astype(cfg.dtype)
        xe = nn.Conv(dim, cfg.patch_size, strides=cfg.patch_size,
                     padding="VALID", dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype, name="img_in")(xe)
        img = xe.reshape(b, img_len, dim)
        from .layers import seq_shard

        img = seq_shard(img, cfg.sequence_sharding)

        temb = sinusoidal_timestep_embedding(t.astype(jnp.float32), 256)
        vec = LoraDense(dim, name="time_in_1", **dd)(temb.astype(cfg.dtype))
        vec = LoraDense(dim, name="time_in_2", **dd)(nn.silu(vec))

        # token refiner txt_in
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

        # cond-type embedding: 0 = text, 1 = byt5 (reference :257-266)
        type_emb = nn.Embed(2, dim, name="cond_type_embedding",
                            param_dtype=cfg.param_dtype, dtype=cfg.dtype)
        txt = txt + type_emb(jnp.zeros((b, txt.shape[1]), jnp.int32))

        # Glyph-ByT5 mapper, same structure as HunyuanImage-2.1's byt5_in
        # (affine LayerNorm -> fc1 -> GELU -> fc2 -> GELU -> fc3)
        g = nn.LayerNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                         name="byt5_layernorm")(byt5_states.astype(cfg.dtype))
        g = LoraDense(cfg.byt5_mapper_dim, name="byt5_fc1", **dd)(g)
        g = nn.gelu(g, approximate=True)
        g = LoraDense(cfg.byt5_mapper_dim, name="byt5_fc2", **dd)(g)
        g = nn.gelu(g, approximate=True)
        g = LoraDense(dim, name="byt5_fc3", **dd)(g)
        g = g + type_emb(jnp.ones((b, g.shape[1]), jnp.int32))

        # byt5 FIRST (reference :267-268)
        txt = jnp.concatenate([g, txt], axis=1)
        full_mask = jnp.concatenate(
            [byt5_mask.astype(jnp.int32), text_mask.astype(jnp.int32)], axis=1
        )

        fi = jnp.repeat(jnp.arange(gf), gh * gw)
        hi = jnp.tile(jnp.repeat(jnp.arange(gh), gw), gf)
        wi = jnp.tile(jnp.arange(gw), gf * gh)
        ids = jnp.stack([fi, hi, wi], axis=-1)
        rope_cos, rope_sin = rope_frequencies(
            ids, cfg.rope_axes_dim, cfg.rope_theta
        )

        block = HunyuanDoubleBlock
        if cfg.remat:
            block = remat_wrap(block, cfg.remat)
        (img, txt), _ = nn.scan(
            block,
            variable_axes={"params": 0}, split_rngs={"params": True},
            in_axes=nn.broadcast, length=cfg.num_layers,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )(cfg, name="double_blocks")((img, txt), vec, rope_cos, rope_sin,
                                     full_mask)

        mod = LoraDense(2 * dim, name="final_mod", **dd)(nn.silu(vec))
        shift, scale = jnp.split(mod, 2, -1)
        img = modulate(layer_norm_no_affine(img), shift, scale)
        out = LoraDense(pt * ph * pw * cfg.out_channels, name="final_linear",
                        dtype=jnp.float32, param_dtype=cfg.param_dtype)(img)
        out = out.reshape(b, gf, gh, gw, pt, ph, pw, cfg.out_channels)
        out = jnp.einsum("bfhwpqrc->bcfphqwr", out)
        return out.reshape(b, cfg.out_channels, gf * pt, gh * ph, gw * pw)


@register_model("hunyuan_video_15", "hunyuan_video_1.5")
class HunyuanVideo15Pipeline(BasePipeline):
    name = "hunyuan_video_1.5"
    framerate = 24
    cacheable_text_embeddings = (
        "text_states", "text_mask", "byt5_states", "byt5_mask",
    )

    def __init__(self, config):
        super().__init__(config)
        mc = self.model_config
        self.tdist = TimestepDistribution.from_model_config(mc)
        self.hv15_config = self._build_config()
        self.model = HunyuanVideo15Transformer(self.hv15_config)

    def _build_config(self) -> HunyuanVideo15Config:
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
        for knob in ("num_layers", "num_attention_heads", "attention_head_dim",
                     "latent_channels", "text_dim"):
            if mc.get(knob) is not None:
                kwargs[knob] = int(mc[knob])
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
            return HunyuanVideo15Config.tiny(**kwargs)
        return HunyuanVideo15Config(**kwargs)

    def init_params(self, rng):
        cfg = self.hv15_config
        return jax.jit(self.model.init)(
            rng,
            jnp.zeros((1, cfg.in_channels, 1, 8, 8)),
            jnp.zeros((1,)),
            jnp.zeros((1, 8, cfg.text_dim)),
            jnp.ones((1, 8), jnp.int32),
            jnp.zeros((1, 4, cfg.byt5_dim)),
            jnp.ones((1, 4), jnp.int32),
        )

    def prepare_inputs(self, rng, batch, timestep_quantile=None):
        latents = batch["latents"].astype(jnp.float32)
        if latents.ndim == 4:
            latents = latents[:, :, None]
        b, c, f, h, w = latents.shape
        mask = batch.get("mask")
        if mask is not None:
            mask = jax.image.resize(
                mask.astype(jnp.float32), (b, h, w), method="nearest"
            )[:, None, None]
        t_key, n_key = jax.random.split(rng)
        t = sample_timesteps(
            t_key, b, self.tdist, quantile=timestep_quantile,
            image_seq_len=(h // 2) * (w // 2),
        )
        noise = jax.random.normal(n_key, latents.shape, jnp.float32)
        t_exp = t.reshape(b, 1, 1, 1, 1)
        x_t = (1 - t_exp) * latents + t_exp * noise
        target = noise - latents
        # t2v training: zero conditioning latents and mask channel
        # (reference hunyuan_video_15.py:175-177)
        x_in = jnp.concatenate(
            [x_t, jnp.zeros_like(x_t), jnp.zeros((b, 1, f, h, w), x_t.dtype)],
            axis=1,
        )
        model_inputs = dict(
            x=x_in,
            t=t * 1000.0,
            text_states=batch["text_states"],
            text_mask=batch["text_mask"].reshape(b, -1),
            byt5_states=batch["byt5_states"],
            byt5_mask=batch["byt5_mask"].reshape(b, -1),
        )
        return model_inputs, target, mask

    def sample(self, params, width, height, key, num_steps=20,
               guidance_scale=1.0, num_frames=1, **embeds):
        """Euler flow sampling through the training forward (reference
        CommonPipeline.sample, models/base.py:263-291). t2v: zero
        conditioning latents + zero mask channel concatenated like training
        (reference hunyuan_video_15.py:175-177). Returns latents
        [B, C, F, h, w] (HV1.5 VAE: 16x spatial, 4x temporal)."""
        from ..training.sampling import euler_flow_sample

        ts = embeds["text_states"]
        b = ts.shape[0]
        c = self.hv15_config.latent_channels
        h, w = height // 16, width // 16
        f = max(1, (int(num_frames) - 1) // 4 + 1)

        def vel(x, t):
            x_in = jnp.concatenate(
                [x, jnp.zeros_like(x), jnp.zeros((b, 1, f, h, w), x.dtype)],
                axis=1,
            )
            return self.forward(params, dict(
                x=x_in.astype(self.hv15_config.dtype),
                t=t * 1000.0,
                text_states=ts,
                text_mask=embeds["text_mask"].reshape(b, -1),
                byt5_states=embeds["byt5_states"],
                byt5_mask=embeds["byt5_mask"].reshape(b, -1),
            )).astype(jnp.float32)

        return euler_flow_sample(
            vel, (b, c, f, h, w), key, num_steps=num_steps,
            guidance_scale=guidance_scale,
            shift=self.model_config.get("shift"),
        )

    def make_pp_program(self):
        """Pipeline-parallel program (reference partitions any model via
        to_layers() + PipelineModule). See parallel/model_pp.py."""
        return _HunyuanVideo15PPProgram(self)

    def forward(self, params, model_inputs):
        return self.model.apply(params, **model_inputs)

    # --- weights ------------------------------------------------------------

    def _keymap_config(self):
        return self.hv15_config

    def keymap(self):
        """ComfyUI hyvideo-1.5 key dialect (the reference drives ComfyUI's
        model: flux-style DoubleStreamBlock names `img_mod.lin` /
        `img_attn.qkv` / `img_mlp.0`, MLPEmbedder `time_in.in_layer`,
        TokenRefiner under `txt_in.*`, `byt5_in` glyph mapper,
        `cond_type_embedding`; reference models/hunyuan_video_15.py:22,
        :214-219, save prefix `diffusion_model.` via ComfyPipeline,
        models/base.py:609-613). Exact refiner/byt5 sub-key spellings are
        flagged pending real-checkpoint verification."""
        from .keymaps import BlockGroup, KeyMap

        cfg = self.hv15_config
        top_linears = {
            "time_in_1": "time_in.in_layer",
            "time_in_2": "time_in.out_layer",
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
        top_raw = {
            "byt5_layernorm/bias": "byt5_in.layernorm.bias",
            "cond_type_embedding/embedding": "cond_type_embedding.weight",
        }
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
                        "img_mod": "img_mod.lin",
                        "txt_mod": "txt_mod.lin",
                        "img_attn_qkv": "img_attn.qkv",
                        "img_attn_proj": "img_attn.proj",
                        "img_mlp_fc1": "img_mlp.0",
                        "img_mlp_fc2": "img_mlp.2",
                        "txt_attn_qkv": "txt_attn.qkv",
                        "txt_attn_proj": "txt_attn.proj",
                        "txt_mlp_fc1": "txt_mlp.0",
                        "txt_mlp_fc2": "txt_mlp.2",
                    },
                    norms={
                        "img_attn_q_norm": "img_attn.norm.query_norm",
                        "img_attn_k_norm": "img_attn.norm.key_norm",
                        "txt_attn_q_norm": "txt_attn.norm.query_norm",
                        "txt_attn_k_norm": "txt_attn.norm.key_norm",
                    },
                    norm_suffix="scale",
                ),
            ],
            top_linears=top_linears,
            top_norms=top_norms,
            top_raw=top_raw,
            top_convs={"img_in": "img_in.proj"},
            lora_prefix="diffusion_model.",
            # The checkpoint carries a vision_in tower the reference wires
            # but never feeds during training ("not used?", reference
            # models/hunyuan_video_15.py:216); carry its tensors through
            # load -> save_model so full exports stay complete.
            passthrough_patterns=(r"^vision_in\.",),
        )

    def load_weights(self):
        from .keymaps import keymap_to_flax, load_sd_for_pipeline

        return keymap_to_flax(
            load_sd_for_pipeline(self), self.keymap(), self.hv15_config
        )

    def get_call_vae_fn(self):
        """Video VAE (reference: ComfyUI VAE loader, models/base.py:451-527
        reached from hunyuan_video_15.py). The HunyuanVideo-1.5 VAE is the
        HV causal-3D-VAE family at new widths (32 latent channels); its
        topology is discovered from the checkpoint shapes
        (infer_hunyuan_vae_config) and both the diffusers and
        original/ComfyUI key dialects load. model.vae_temporal_downsamples
        (default 2 = 4x) and model.vae_scaling_factor (default 1.0 —
        hv15 publishes unit-scale latents) override the shape-invisible
        bits; a layout that doesn't match raises instead of caching
        garbage."""
        mc = self.model_config
        if mc.get("_tiny", False):
            return self._generic_image_vae_fn(
                tiny_latent_channels=self.hv15_config.latent_channels,
                video_latents=True,
            )
        from .hunyuan_vae import (
            HunyuanVAE,
            convert_diffusers_hunyuan_vae,
            infer_hunyuan_vae_config,
            normalize_hunyuan_vae_dialect,
        )
        from .weights import load_state_dict_any

        sd = load_state_dict_any(mc["vae_path"])
        sd = {(k[4:] if k.startswith("vae.") else k): v
              for k, v in sd.items()}
        sd = normalize_hunyuan_vae_dialect(sd)
        cfg = infer_hunyuan_vae_config(
            sd,
            temporal_downsamples=mc.get("vae_temporal_downsamples"),
            scaling_factor=mc.get("vae_scaling_factor", 1.0),
        )
        if cfg.latent_channels != self.hv15_config.latent_channels:
            raise ValueError(
                f"VAE latent width {cfg.latent_channels} != model "
                f"{self.hv15_config.latent_channels}")
        vae = HunyuanVAE(cfg)
        params = convert_diffusers_hunyuan_vae(sd, cfg)
        encode = jax.jit(
            lambda px: vae.apply(params, px, method=type(vae).encode)
        )

        def fn(pixels):
            if pixels.ndim == 4:
                pixels = pixels[:, :, None]
            return {"latents": np.asarray(
                encode(jnp.asarray(pixels, jnp.float32)))}

        return fn

    def get_call_text_encoder_fns(self):
        mc = self.model_config
        if mc.get("_tiny", False):
            from ..data.bucketing import seed_from_hash

            cfg = self.hv15_config

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

        # Qwen2.5-VL/Qwen3 text tower + glyph byT5 (reference :31-98 routes
        # both through the ComfyUI CLIP loader; here plain HF checkpoints)
        from .hunyuan_image import HunyuanImagePipeline

        return HunyuanImagePipeline.get_call_text_encoder_fns(self)


class _HunyuanVideo15PPProgram:
    """PPProgram for HunyuanVideo15Transformer (see parallel/model_pp.py).
    Single double-block phase; token refiner, cond-type embedding, and the
    byT5 glyph mapper run on stage 0. Payload: (img, txt, vec, full_mask)."""

    def __init__(self, pipeline):
        from ..parallel.model_pp import PPPhase

        self.pipeline = pipeline
        cfg = pipeline.hv15_config
        self.cfg = cfg
        self.phases = [
            PPPhase("double_blocks", cfg.num_layers, self._apply_double),
        ]

    def _apply_double(self, p_i, payload, ctx):
        from .hunyuan_video_model import HunyuanDoubleBlock

        img, txt, vec, fm = payload
        (img, txt), _ = HunyuanDoubleBlock(self.cfg).apply(
            {"params": p_i}, (img, txt), vec, ctx["rope_cos"],
            ctx["rope_sin"], fm,
        )
        return (img, txt, vec, fm)

    def make_ctx(self, p_rest, mi0):
        cfg = self.cfg
        _b, _c, f, h, w = mi0["x"].shape
        pt, ph, pw = cfg.patch_size
        gf, gh, gw = f // pt, h // ph, w // pw
        fi = jnp.repeat(jnp.arange(gf), gh * gw)
        hi = jnp.tile(jnp.repeat(jnp.arange(gh), gw), gf)
        wi = jnp.tile(jnp.arange(gw), gf * gh)
        ids = jnp.stack([fi, hi, wi], axis=-1)
        rope_cos, rope_sin = rope_frequencies(
            ids, cfg.rope_axes_dim, cfg.rope_theta
        )
        return {"rope_cos": rope_cos, "rope_sin": rope_sin,
                "grid": (gf, gh, gw), "fhw": (f, h, w),
                "img_len": gf * gh * gw}

    def embed(self, p_rest, mi, ctx):
        from .hunyuan_video_model import TokenRefinerBlock

        cfg = self.cfg
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        x, t = mi["x"], mi["t"]
        text_states, text_mask = mi["text_states"], mi["text_mask"]
        byt5_states, byt5_mask = mi["byt5_states"], mi["byt5_mask"]
        b = x.shape[0]

        xe = jnp.transpose(x, (0, 2, 3, 4, 1)).astype(cfg.dtype)
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

        type_emb = jnp.asarray(
            p_rest["cond_type_embedding"]["embedding"], cfg.dtype)
        txt = txt + type_emb[0][None, None]

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
        g = g + type_emb[1][None, None]

        txt = jnp.concatenate([g, txt], axis=1)
        full_mask = jnp.concatenate(
            [byt5_mask.astype(jnp.int32), text_mask.astype(jnp.int32)],
            axis=1,
        )
        return (img, txt, vec, full_mask)

    def head_loss(self, p_rest, payload, target, mask, ctx):
        cfg = self.cfg
        dim = cfg.hidden_size
        pt, ph, pw = cfg.patch_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        gf, gh, gw = ctx["grid"]
        img, _txt, vec, _fm = payload
        b = img.shape[0]

        mod = LoraDense(2 * dim, **dd).apply(
            {"params": p_rest["final_mod"]}, nn.silu(vec))
        shift, scale = jnp.split(mod, 2, -1)
        img = modulate(layer_norm_no_affine(img), shift, scale)
        out = LoraDense(pt * ph * pw * cfg.out_channels, dtype=jnp.float32,
                        param_dtype=cfg.param_dtype).apply(
            {"params": p_rest["final_linear"]}, img)
        out = out.reshape(b, gf, gh, gw, pt, ph, pw, cfg.out_channels)
        out = jnp.einsum("bfhwpqrc->bcfphqwr", out)
        out = out.reshape(b, cfg.out_channels, gf * pt, gh * ph, gw * pw)
        return self.pipeline.loss_fn(out, target, mask)
