"""Flux 2 (Dev / Klein) model family.

Reference: models/flux2.py (425 LoC over the ComfyUI flux2 model).
Structure extracted from that wrapper:
  - flux-style double + single stream blocks BUT with GLOBAL modulation:
    one modulation set is computed once from vec and shared by every
    block (double_stream_modulation_img/txt -> (mod1, mod2) per stream,
    single_stream_modulation -> one ModulationOut; reference
    flux2.py:308-318, 338-352) — blocks have no per-block mod linears
  - text embeds RMS-normed (txt_norm) then projected (txt_in); text tokens
    get rope positions linspace(0..L-1) on txt_ids_dims axes
    (reference :281-285) — unlike flux1's all-zero txt ids
  - full-512-length text, NO attention masking (README.md:19-21)
  - guidance embed with guidance = 1.0 during training (reference :125)
  - edit mode: control latents through the same img_in, sequence-concat
    AFTER the noisy image, ids offset by ref_index_scale (reference :268-296)
  - 16x spatial compression VAE, 32 latent channels -> 128 per 2x2 patch
  - model size autodetected from img_in width: 3072 Klein-4B, 4096
    Klein-9B, 6144 Dev-32B (reference :29-51)

Block internals (mlp ratio, qk-norm placement) follow the flux1 design;
flagged for real-checkpoint verification. Text encoders: Mistral-3 (Dev)
or Qwen3 4B/8B (Klein) final hidden states, full 512 tokens.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from . import register_model
from .base import BasePipeline
from .layers import (
    LoraDense,
    RMSNorm,
    apply_rope,
    layer_norm_no_affine,
    modulate,
    remat_spec,
    remat_wrap,
    rope_frequencies,
    sinusoidal_timestep_embedding,
)
from ..ops.attention import dot_product_attention
from ..training.flow import TimestepDistribution, sample_timesteps

Dtype = Any


@dataclasses.dataclass(frozen=True)
class Flux2Config:
    in_channels: int = 128        # 32 latent channels x 2x2 patch
    out_channels: int = 128
    latent_channels: int = 32
    hidden_size: int = 6144       # Dev-32B; 3072/4096 for the Kleins
    attention_head_dim: int = 128
    num_layers: int = 8           # double blocks
    num_single_layers: int = 48
    mlp_ratio: float = 4.0
    text_dim: int = 5120          # Mistral-3 hidden (Kleins: Qwen3 width)
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    txt_ids_dims: Tuple[int, ...] = (0,)
    rope_theta: float = 10000.0
    ref_index_scale: int = 1      # axis-0 id offset for control images
    guidance_embeds: bool = True
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
    def num_attention_heads(self):
        return self.hidden_size // self.attention_head_dim

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
            in_channels=16, out_channels=16, latent_channels=4,
            hidden_size=32, attention_head_dim=8, num_layers=2,
            num_single_layers=2, text_dim=24, axes_dims_rope=(4, 2, 2),
            dtype=jnp.float32, param_dtype=jnp.float32,
        )
        d.update(kw)
        return Flux2Config(**d)


class Flux2DoubleBlock(nn.Module):
    """Flux double block with EXTERNAL (global) modulation."""

    config: Flux2Config

    @nn.compact
    def __call__(self, carry, mods, rope_cos, rope_sin):
        img, txt = carry
        cfg = self.config
        dim = cfg.hidden_size
        heads, hd = cfg.num_attention_heads, cfg.attention_head_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  kernel_dtype=cfg.base_kernel_dtype,
                  int8_matmul=cfg.int8_matmul)
        lora = cfg.lora_kwargs
        (i_s1, i_sc1, i_g1, i_s2, i_sc2, i_g2,
         t_s1, t_sc1, t_g1, t_s2, t_sc2, t_g2) = mods

        img_n = modulate(layer_norm_no_affine(img), i_s1, i_sc1)
        txt_n = modulate(layer_norm_no_affine(txt), t_s1, t_sc1)

        def qkv(x, prefix):
            b, s = x.shape[:2]
            y = LoraDense(3 * dim, use_bias=False, name=f"{prefix}_qkv",
                          kernel_axes=(None, "tensor"), **dd, **lora)(x)
            return [u.reshape(b, s, heads, hd) for u in jnp.split(y, 3, -1)]

        iq, ik, iv = qkv(img_n, "img_attn")
        tq, tk, tv = qkv(txt_n, "txt_attn")
        rms = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        iq = RMSNorm(name="img_attn_q_norm", **rms)(iq)
        ik = RMSNorm(name="img_attn_k_norm", **rms)(ik)
        tq = RMSNorm(name="txt_attn_q_norm", **rms)(tq)
        tk = RMSNorm(name="txt_attn_k_norm", **rms)(tk)

        # [txt, img] sequence order (comfy flux), rope over the full seq
        q = apply_rope(jnp.concatenate([tq, iq], 1), rope_cos, rope_sin)
        k = apply_rope(jnp.concatenate([tk, ik], 1), rope_cos, rope_sin)
        v = jnp.concatenate([tv, iv], 1)
        attn = dot_product_attention(q, k, v)
        b, s = attn.shape[:2]
        attn = attn.reshape(b, s, dim)
        st = txt.shape[1]
        txt_attn, img_attn = attn[:, :st], attn[:, st:]

        img = img + i_g1[:, None] * LoraDense(
            dim, use_bias=False, name="img_attn_proj",
            kernel_axes=("tensor", None), **dd, **lora)(img_attn)
        y = modulate(layer_norm_no_affine(img), i_s2, i_sc2)
        y = LoraDense(int(dim * cfg.mlp_ratio), use_bias=False,
                      name="img_mlp_fc1", kernel_axes=(None, "tensor"),
                      **dd, **lora)(y)
        y = nn.gelu(y, approximate=True)
        img = img + i_g2[:, None] * LoraDense(
            dim, use_bias=False, name="img_mlp_fc2",
            kernel_axes=("tensor", None), **dd, **lora)(y)

        txt = txt + t_g1[:, None] * LoraDense(
            dim, use_bias=False, name="txt_attn_proj",
            kernel_axes=("tensor", None), **dd, **lora)(txt_attn)
        y = modulate(layer_norm_no_affine(txt), t_s2, t_sc2)
        y = LoraDense(int(dim * cfg.mlp_ratio), use_bias=False,
                      name="txt_mlp_fc1", kernel_axes=(None, "tensor"),
                      **dd, **lora)(y)
        y = nn.gelu(y, approximate=True)
        txt = txt + t_g2[:, None] * LoraDense(
            dim, use_bias=False, name="txt_mlp_fc2",
            kernel_axes=("tensor", None), **dd, **lora)(y)
        return (img, txt), None


class Flux2SingleBlock(nn.Module):
    config: Flux2Config

    @nn.compact
    def __call__(self, x, mods, rope_cos, rope_sin):
        cfg = self.config
        dim = cfg.hidden_size
        heads, hd = cfg.num_attention_heads, cfg.attention_head_dim
        mlp_dim = int(dim * cfg.mlp_ratio)
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  kernel_dtype=cfg.base_kernel_dtype,
                  int8_matmul=cfg.int8_matmul)
        lora = cfg.lora_kwargs
        b, s = x.shape[:2]
        shift, scale, gate = mods

        x_n = modulate(layer_norm_no_affine(x), shift, scale)
        y = LoraDense(3 * dim + mlp_dim, use_bias=False, name="linear1",
                      kernel_axes=(None, "tensor"), **dd, **lora)(x_n)
        qkv, mlp = y[..., : 3 * dim], y[..., 3 * dim:]
        q, k, v = [u.reshape(b, s, heads, hd) for u in jnp.split(qkv, 3, -1)]
        rms = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        q = RMSNorm(name="q_norm", **rms)(q)
        k = RMSNorm(name="k_norm", **rms)(k)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        attn = dot_product_attention(q, k, v).reshape(b, s, dim)
        y = LoraDense(dim, use_bias=False, name="linear2",
                      kernel_axes=("tensor", None), **dd, **lora)(
            jnp.concatenate([attn, nn.gelu(mlp, approximate=True)], -1)
        )
        return x + gate[:, None] * y, None


class Flux2Transformer(nn.Module):
    config: Flux2Config

    @nn.compact
    def __call__(
        self,
        hidden_states,          # [B, S_img, in_channels] packed 2x2 latents
        encoder_hidden_states,  # [B, 512, text_dim]
        timestep,               # [B] in [0, 1]
        img_ids,                # [S_img(+S_ctrl), 3]
        guidance=None,          # [B]
        img_seq_len: Optional[int] = None,
    ):
        cfg = self.config
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b = hidden_states.shape[0]
        stxt = encoder_hidden_states.shape[1]

        img = LoraDense(dim, name="img_in", **dd)(
            hidden_states.astype(cfg.dtype))
        txt = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                      name="txt_norm")(encoder_hidden_states.astype(cfg.dtype))
        txt = LoraDense(dim, name="txt_in", **dd)(txt)

        temb = sinusoidal_timestep_embedding(
            timestep.astype(jnp.float32) * 1000.0, 256)
        vec = LoraDense(dim, name="time_in_1", **dd)(temb.astype(cfg.dtype))
        vec = LoraDense(dim, name="time_in_2", **dd)(nn.silu(vec))
        if cfg.guidance_embeds and guidance is not None:
            ge = sinusoidal_timestep_embedding(
                guidance.astype(jnp.float32) * 1000.0, 256)
            g = LoraDense(dim, name="guidance_in_1", **dd)(ge.astype(cfg.dtype))
            g = LoraDense(dim, name="guidance_in_2", **dd)(nn.silu(g))
            vec = vec + g

        # GLOBAL modulation, computed once and broadcast to all blocks
        sv = nn.silu(vec)
        mod_img = LoraDense(6 * dim, name="double_stream_modulation_img",
                            **dd)(sv)
        mod_txt = LoraDense(6 * dim, name="double_stream_modulation_txt",
                            **dd)(sv)
        double_mods = tuple(jnp.split(mod_img, 6, -1)) + tuple(
            jnp.split(mod_txt, 6, -1))
        mod_single = LoraDense(3 * dim, name="single_stream_modulation",
                               **dd)(sv)
        single_mods = tuple(jnp.split(mod_single, 3, -1))

        # text tokens get linspace positions on txt_ids_dims axes
        txt_ids = np.zeros((stxt, len(cfg.axes_dims_rope)), np.float32)
        for ax in cfg.txt_ids_dims:
            txt_ids[:, ax] = np.arange(stxt, dtype=np.float32)
        ids = jnp.concatenate([jnp.asarray(txt_ids), img_ids], axis=0)
        rope_cos, rope_sin = rope_frequencies(
            ids, cfg.axes_dims_rope, cfg.rope_theta
        )
        rope_cos = rope_cos.astype(jnp.float32)
        rope_sin = rope_sin.astype(jnp.float32)

        dblock, sblock = Flux2DoubleBlock, Flux2SingleBlock
        if cfg.remat:
            dblock = remat_wrap(dblock, cfg.remat)
            sblock = remat_wrap(sblock, cfg.remat)
        (img, txt), _ = nn.scan(
            dblock,
            variable_axes={"params": 0}, split_rngs={"params": True},
            in_axes=nn.broadcast, length=cfg.num_layers,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )(cfg, name="double_blocks")((img, txt), double_mods, rope_cos,
                                     rope_sin)

        x = jnp.concatenate([txt, img], axis=1)
        x, _ = nn.scan(
            sblock,
            variable_axes={"params": 0}, split_rngs={"params": True},
            in_axes=nn.broadcast, length=cfg.num_single_layers,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )(cfg, name="single_blocks")(x, single_mods, rope_cos, rope_sin)

        out = x[:, stxt:]
        if img_seq_len is not None:
            out = out[:, :img_seq_len]  # drop control-image tokens
        mod = LoraDense(2 * dim, name="final_mod", **dd)(nn.silu(vec))
        shift, scale = jnp.split(mod, 2, -1)
        out = modulate(layer_norm_no_affine(out), shift, scale)
        return LoraDense(cfg.out_channels, name="final_linear",
                         dtype=jnp.float32,
                         param_dtype=cfg.param_dtype)(out)


def _latent_ids(h2, w2, index=0):
    row = np.repeat(np.arange(h2, dtype=np.float32), w2)
    col = np.tile(np.arange(w2, dtype=np.float32), h2)
    idx = np.full((h2 * w2,), float(index), np.float32)
    return np.stack([idx, row, col], axis=-1)


@register_model("flux2")
class Flux2Pipeline(BasePipeline):
    name = "flux2"
    cacheable_text_embeddings = ("text_embeds_0",)

    def __init__(self, config):
        super().__init__(config)
        mc = self.model_config
        self.tdist = TimestepDistribution.from_model_config(mc)
        self.f2_config = self._build_config()
        self.model = Flux2Transformer(self.f2_config)

    def _build_config(self) -> Flux2Config:
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
        for knob in ("hidden_size", "num_layers", "num_single_layers",
                     "text_dim", "latent_channels"):
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
            return Flux2Config.tiny(**kwargs)
        return Flux2Config(**kwargs)

    def init_params(self, rng):
        cfg = self.f2_config
        return jax.jit(self.model.init)(
            rng,
            jnp.zeros((1, 16, cfg.in_channels)),
            jnp.zeros((1, 8, cfg.text_dim)),
            jnp.zeros((1,)),
            jnp.asarray(_latent_ids(4, 4)),
            jnp.ones((1,)),
        )

    def prepare_inputs(self, rng, batch, timestep_quantile=None):
        latents = batch["latents"].astype(jnp.float32)
        if latents.ndim == 5:
            latents = latents[:, :, 0]
        b, c, h, w = latents.shape
        from .flux import pack_latents, resize_mask_to_latents

        mask = batch.get("mask")
        if mask is not None:
            mask = pack_latents(resize_mask_to_latents(mask, h, w, c))
        t_key, n_key = jax.random.split(rng)
        t = sample_timesteps(
            t_key, b, self.tdist, quantile=timestep_quantile,
            image_seq_len=(h // 2) * (w // 2),
        )
        noise = jax.random.normal(n_key, latents.shape, jnp.float32)
        t_exp = t.reshape(b, 1, 1, 1)
        x_t = (1 - t_exp) * latents + t_exp * noise
        target = pack_latents(noise - latents)

        x_in = pack_latents(x_t)
        img_len = x_in.shape[1]
        ids = _latent_ids(h // 2, w // 2)
        img_seq_len = None
        if "control_latents" in batch and batch["control_latents"] is not None:
            control = batch["control_latents"].astype(jnp.float32)
            if control.ndim == 5:
                control = control[:, :, 0]
            x_in = jnp.concatenate([x_in, pack_latents(control)], axis=1)
            ids = np.concatenate(
                [ids, _latent_ids(h // 2, w // 2,
                                  index=self.f2_config.ref_index_scale)], 0)
            img_seq_len = img_len
        model_inputs = dict(
            hidden_states=x_in,
            encoder_hidden_states=batch["text_embeds_0"],
            timestep=t,
            img_ids=jnp.asarray(ids),
            guidance=jnp.ones((b,), jnp.float32),  # reference flux2.py:125
            img_seq_len=img_seq_len,
        )
        return model_inputs, target, mask

    def sample(self, params, width, height, key, num_steps=20,
               guidance_scale=1.0, **embeds):
        """Euler flow sampling through the training forward (reference
        CommonPipeline.sample, models/base.py:263-291). Returns latents
        [B, C, h, w] (flux2 VAE: 32 latent channels)."""
        from ..training.sampling import euler_flow_sample
        from .flux import pack_latents, unpack_latents

        te = embeds["text_embeds_0"]
        b = te.shape[0]
        c = self.f2_config.in_channels // 4  # 2x2-packed latent channels
        h, w = height // 8, width // 8
        ids = jnp.asarray(_latent_ids(h // 2, w // 2))

        def vel(x, t):
            out = self.forward(params, dict(
                hidden_states=pack_latents(x),
                encoder_hidden_states=te,
                timestep=t,
                img_ids=ids,
                guidance=jnp.ones((b,), jnp.float32),
                img_seq_len=None,
            ))
            return unpack_latents(out.astype(jnp.float32), h, w)

        return euler_flow_sample(
            vel, (b, c, h, w), key, num_steps=num_steps,
            guidance_scale=guidance_scale,
            shift=self.model_config.get("shift"),
        )

    def make_pp_program(self):
        """Pipeline-parallel program: double then single block phases with
        the GLOBAL modulation vectors computed once on stage 0 and carried
        (they are [B, k*D] — tiny). See parallel/model_pp.py."""
        return _Flux2PPProgram(self)

    def forward(self, params, model_inputs):
        return self.model.apply(params, **model_inputs)

    # --- weights ------------------------------------------------------------

    def _keymap_config(self):
        return self.f2_config

    def keymap(self):
        """ComfyUI flux2 key dialect: flux-style bias-free blocks with the
        per-block modulation moved to GLOBAL `double_stream_modulation_img/
        txt` + `single_stream_modulation` Modulation modules (`.lin`),
        MLPEmbedder time/guidance, `txt_norm` on the Mistral embeddings
        (reference models/flux2.py:22 keep_in_high_precision names,
        :240-317 global-modulation plumbing; LoRA saved with the ComfyUI
        `diffusion_model.` prefix)."""
        from .keymaps import BlockGroup, KeyMap

        cfg = self.f2_config
        top_linears = {
            "img_in": "img_in",
            "txt_in": "txt_in",
            "time_in_1": "time_in.in_layer",
            "time_in_2": "time_in.out_layer",
            "double_stream_modulation_img":
                "double_stream_modulation_img.lin",
            "double_stream_modulation_txt":
                "double_stream_modulation_txt.lin",
            "single_stream_modulation": "single_stream_modulation.lin",
            "final_mod": "final_layer.adaLN_modulation.1",
            "final_linear": "final_layer.linear",
        }
        if cfg.guidance_embeds:
            top_linears["guidance_in_1"] = "guidance_in.in_layer"
            top_linears["guidance_in_2"] = "guidance_in.out_layer"
        return KeyMap(
            blocks=[
                BlockGroup(
                    "double_blocks", "double_blocks", "num_layers",
                    linears={
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
                BlockGroup(
                    "single_blocks", "single_blocks", "num_single_layers",
                    linears={"linear1": "linear1", "linear2": "linear2"},
                    norms={"q_norm": "norm.query_norm",
                           "k_norm": "norm.key_norm"},
                    norm_suffix="scale",
                ),
            ],
            top_linears=top_linears,
            top_norms={"txt_norm": "txt_norm"},
            top_norm_suffix="scale",
            lora_prefix="diffusion_model.",
        )

    def load_weights(self):
        from .keymaps import keymap_to_flax, load_sd_for_pipeline

        return keymap_to_flax(
            load_sd_for_pipeline(self), self.keymap(), self.f2_config
        )

    def get_call_vae_fn(self):
        """Flux2 VAE: 32-latent-channel AutoencoderKL (reference configs use
        ComfyUI flux2-vae.safetensors, docs/supported_models.md:490); tiny
        mode runs a small random KL VAE."""
        return self._generic_image_vae_fn(
            tiny_latent_channels=4 if self.model_config.get("_tiny")
            else 32,
        )

    def get_call_text_encoder_fns(self):
        mc = self.model_config
        if mc.get("_tiny", False):
            from ..data.bucketing import seed_from_hash

            cfg = self.f2_config

            def te(caps):
                embs = []
                for cap in caps:
                    r = np.random.default_rng(seed_from_hash(cap))
                    embs.append(r.standard_normal(
                        (8, cfg.text_dim)).astype(np.float32))
                return {"text_embeds_0": np.stack(embs)}

            return [te]

        # Mistral-3 (Dev) or Qwen3 (Klein) final hidden, fixed 512 tokens,
        # no masking (reference README.md:19-21, flux2.py:118-125)
        from .llm_encoders import LLMTextEncoder

        enc = LLMTextEncoder(
            mc["text_encoder_path"], max_length=512, hidden_layer=-1,
        )

        def fn(caps):
            h = enc.encode(caps, return_mask=False)
            return {"text_embeds_0": np.asarray(h)}

        return [fn]


class _Flux2PPProgram:
    """PPProgram for Flux2Transformer (see parallel/model_pp.py).

    Raw-param re-expression of the __call__ split at the two block scans.
    Phase 1 payload: (img, txt, dmods [B,12D], smods [B,3D], vec);
    phase 2 (after concat `pre`): (x, smods, vec).
    """

    def __init__(self, pipeline):
        from ..parallel.model_pp import PPPhase

        self.pipeline = pipeline
        cfg = pipeline.f2_config
        self.cfg = cfg
        self.phases = [
            PPPhase("double_blocks", cfg.num_layers, self._apply_double),
            PPPhase("single_blocks", cfg.num_single_layers,
                    self._apply_single, pre=self._to_single_stream),
        ]

    def _apply_double(self, p_i, payload, ctx):
        img, txt, dmods, smods, vec = payload
        mods = tuple(jnp.split(dmods, 12, -1))
        (img, txt), _ = Flux2DoubleBlock(self.cfg).apply(
            {"params": p_i}, (img, txt), mods, ctx["rope_cos"],
            ctx["rope_sin"],
        )
        return (img, txt, dmods, smods, vec)

    def _to_single_stream(self, payload, ctx):
        img, txt, _dmods, smods, vec = payload
        return (jnp.concatenate([txt, img], axis=1), smods, vec)

    def _apply_single(self, p_i, payload, ctx):
        x, smods, vec = payload
        mods = tuple(jnp.split(smods, 3, -1))
        x, _ = Flux2SingleBlock(self.cfg).apply(
            {"params": p_i}, x, mods, ctx["rope_cos"], ctx["rope_sin"]
        )
        return (x, smods, vec)

    def make_ctx(self, p_rest, mi0):
        cfg = self.cfg
        stxt = mi0["encoder_hidden_states"].shape[1]
        txt_ids = np.zeros((stxt, len(cfg.axes_dims_rope)), np.float32)
        for ax in cfg.txt_ids_dims:
            txt_ids[:, ax] = np.arange(stxt, dtype=np.float32)
        ids = jnp.concatenate([jnp.asarray(txt_ids), mi0["img_ids"]], axis=0)
        rope_cos, rope_sin = rope_frequencies(
            ids, cfg.axes_dims_rope, cfg.rope_theta
        )
        return {"rope_cos": rope_cos.astype(jnp.float32),
                "rope_sin": rope_sin.astype(jnp.float32),
                "txt_len": stxt}

    def embed(self, p_rest, mi, ctx):
        cfg = self.cfg
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)

        img = LoraDense(dim, **dd).apply(
            {"params": p_rest["img_in"]},
            mi["hidden_states"].astype(cfg.dtype))
        txt = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype).apply(
            {"params": p_rest["txt_norm"]},
            mi["encoder_hidden_states"].astype(cfg.dtype))
        txt = LoraDense(dim, **dd).apply({"params": p_rest["txt_in"]}, txt)

        temb = sinusoidal_timestep_embedding(
            mi["timestep"].astype(jnp.float32) * 1000.0, 256)
        vec = LoraDense(dim, **dd).apply(
            {"params": p_rest["time_in_1"]}, temb.astype(cfg.dtype))
        vec = LoraDense(dim, **dd).apply(
            {"params": p_rest["time_in_2"]}, nn.silu(vec))
        guidance = mi.get("guidance")
        if cfg.guidance_embeds and guidance is not None:
            ge = sinusoidal_timestep_embedding(
                guidance.astype(jnp.float32) * 1000.0, 256)
            g = LoraDense(dim, **dd).apply(
                {"params": p_rest["guidance_in_1"]}, ge.astype(cfg.dtype))
            g = LoraDense(dim, **dd).apply(
                {"params": p_rest["guidance_in_2"]}, nn.silu(g))
            vec = vec + g

        sv = nn.silu(vec)
        mod_img = LoraDense(6 * dim, **dd).apply(
            {"params": p_rest["double_stream_modulation_img"]}, sv)
        mod_txt = LoraDense(6 * dim, **dd).apply(
            {"params": p_rest["double_stream_modulation_txt"]}, sv)
        dmods = jnp.concatenate([mod_img, mod_txt], axis=-1)
        smods = LoraDense(3 * dim, **dd).apply(
            {"params": p_rest["single_stream_modulation"]}, sv)
        return (img, txt, dmods, smods, vec)

    def head_loss(self, p_rest, payload, target, mask, ctx):
        cfg = self.cfg
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        x, _smods, vec = payload

        out = x[:, ctx["txt_len"]:]
        out = out[:, : target.shape[1]]
        mod = LoraDense(2 * dim, **dd).apply(
            {"params": p_rest["final_mod"]}, nn.silu(vec))
        shift, scale = jnp.split(mod, 2, -1)
        out = modulate(layer_norm_no_affine(out), shift, scale)
        out = LoraDense(cfg.out_channels, dtype=jnp.float32,
                        param_dtype=cfg.param_dtype).apply(
            {"params": p_rest["final_linear"]}, out)
        return self.pipeline.loss_fn(out, target, mask)
