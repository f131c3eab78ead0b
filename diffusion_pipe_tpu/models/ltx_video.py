"""LTX-Video model + pipeline (reference models/ltx_video.py).

Pipeline semantics are faithful to the reference wrappers (ltx_video.py:
186-315): flow matching; fractional RoPE coordinates with the time axis
divided by the framerate (190-192); text attention as an additive -10000
bias; first-frame conditioning probability (t~0 + loss-masked first frame,
175-185); mask normalized by its mean (203-217); PixArt-style adaLN-single
(global 6*dim timestep embedding + per-block scale_shift_table).

Model core is the LTX transformer shape (RMS-normed blocks, gated self-attn
and FF, ungated cross-attn, qk RMS-norm, rope on self-attention only). RoPE
follows the real LTX-Video Transformer3DModel.precompute_freqs_cis ("exp"
spacing): pixel-space coordinates normalized to [0,1] by
positional_embedding_max_pos then mapped to [-1,1]; per-axis frequencies
(pi/2)*theta**linspace(0,1,dim//6) shared by all three axes; axis-fastest
interleave over the FULL inner_dim (each head sees a different frequency
band) with dim%6 leading identity columns; rotation applied to q/k BEFORE
the head split (numpy replica test: tests/test_ltx_rope.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention
from ..training.flow import TimestepDistribution, sample_timesteps
from . import register_model
from .base import BasePipeline
from .layers import (
    LoraDense,
    RMSNorm,
    layer_norm_no_affine,
    remat_spec,
    remat_wrap,
    sinusoidal_timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class LTXConfig:
    in_channels: int = 128        # LTX VAE latent channels
    out_channels: int = 128
    hidden_size: int = 2048
    num_heads: int = 32
    num_layers: int = 28
    caption_dim: int = 4096       # T5-XXL
    mlp_ratio: float = 4.0
    rope_theta: float = 10000.0
    timestep_scale_multiplier: float = 1000.0
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
    def head_dim(self):
        return self.hidden_size // self.num_heads

    # LTX rope operates over the FULL inner_dim with fractional positions
    # normalized by these maxima (public Lightricks/LTX-Video
    # Transformer3DModel positional_embedding_max_pos; time axis is in
    # SECONDS after the wrapper's /framerate, reference ltx_video.py:190-192)
    rope_max_pos: Any = (20, 2048, 2048)
    # transformer config causal_temporal_positioning: first latent frame
    # covers 1 pixel frame, later ones 8 — time pixel-coords get
    # clamp(t*8 + 1 - 8, 0). Off by default as in the public config.
    causal_temporal_positioning: bool = False
    # LTX causal VAE compression (latent index -> pixel coordinate)
    vae_spatial_factor: int = 32
    vae_temporal_factor: int = 8

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
        d = dict(in_channels=16, out_channels=16, hidden_size=48,
                 num_heads=4, num_layers=2, caption_dim=32,
                 dtype=jnp.float32, param_dtype=jnp.float32)
        d.update(kw)
        return LTXConfig(**d)


def ltx_rope_tables(coords, dim, theta, max_pos):
    """LTX-Video rope tables ("exp" spacing) from PIXEL-space coordinates.

    coords: [S, 3] (t/framerate, h_pix, w_pix). Fractional positions
    coords/max_pos in [0,1] are mapped to 2f-1 in [-1,1]; frequency ladder
    (pi/2) * theta**linspace(0, 1, dim//6) is SHARED by the three axes and
    interleaved axis-fastest: freqs[s, j, axis] flattens to 3 adjacent
    columns per frequency. The leading (dim%6)//2 pairs are identity
    rotations (cos=1/sin=0 front padding in the torch original). Returns
    (cos, sin) [S, dim//2] in apply_rope's pair format — equal to the
    original's repeat_interleave(2) read per (even, odd) pair.
    """
    s = coords.shape[0]
    n = dim // 6
    frac = coords.astype(jnp.float32) / jnp.asarray(max_pos, jnp.float32)
    # ladder built host-side in float64 then cast once: phases reach
    # theta*pi/2 ~ 1.6e4 rad at the highest band, where a float32 linspace
    # rounding (~1e-7 relative) already moves cos by ~1e-3
    ladder = jnp.asarray(
        np.power(theta, np.linspace(0.0, 1.0, n, dtype=np.float64))
        * (np.pi / 2.0),
        jnp.float32,
    )
    freqs = ladder[None, :, None] * (frac[:, None, :] * 2.0 - 1.0)
    freqs = freqs.reshape(s, n * 3)
    pad = (dim - 6 * n) // 2
    cos = jnp.cos(freqs)
    sin = jnp.sin(freqs)
    if pad:
        cos = jnp.concatenate([jnp.ones((s, pad), cos.dtype), cos], -1)
        sin = jnp.concatenate([jnp.zeros((s, pad), sin.dtype), sin], -1)
    return cos, sin


def apply_rope_full_dim(x, cos, sin):
    """apply_rope for tables computed over the FULL inner_dim: x is
    [B, S, H, Dh] (head-split AFTER the torch original rotates the flat
    [B, S, H*Dh] tensor), cos/sin [S, H*Dh//2] reshaped so head h reads
    its own columns. Pairs never straddle heads (Dh is even)."""
    b, s, h, hd = x.shape
    c = cos.reshape(s, h, hd // 2)[None]
    sn = sin.reshape(s, h, hd // 2)[None]
    xf = x.astype(jnp.float32)
    x0 = xf[..., 0::2]
    x1 = xf[..., 1::2]
    out0 = x0 * c - x1 * sn
    out1 = x0 * sn + x1 * c
    return jnp.stack([out0, out1], axis=-1).reshape(x.shape).astype(x.dtype)


class LTXBlock(nn.Module):
    config: LTXConfig

    @nn.compact
    def __call__(self, x, timestep_6d, context, context_bias, rope_cos,
                 rope_sin):
        """x: [B, S, D]; timestep_6d: [B, 1orS, 6*D]; context_bias additive."""
        cfg = self.config
        dim = cfg.hidden_size
        heads, hd = cfg.num_heads, cfg.head_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  kernel_dtype=cfg.base_kernel_dtype,
                  int8_matmul=cfg.int8_matmul)
        lora = cfg.lora_kwargs
        b, s, _ = x.shape

        table = self.param(
            "scale_shift_table",
            lambda k, sh: jax.random.normal(k, sh) / dim**0.5, (6, dim),
        )
        mods = (table[None, None].astype(jnp.float32)
                + timestep_6d.reshape(b, -1, 6, dim).astype(jnp.float32))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
            mods[:, :, i] for i in range(6)
        ]

        def rms(name, y):
            return RMSNorm(eps=1e-6, dtype=cfg.dtype,
                           param_dtype=cfg.param_dtype, name=name)(y)

        # gated self attention with rope
        y = layer_norm_no_affine(x).astype(jnp.float32)
        y = (y * (1 + scale_msa) + shift_msa).astype(cfg.dtype)
        q = rms("attn1_norm_q", LoraDense(dim, name="attn1_to_q", **dd,
                                          **lora)(y)).reshape(b, s, heads, hd)
        k = rms("attn1_norm_k", LoraDense(dim, name="attn1_to_k", **dd,
                                          **lora)(y)).reshape(b, s, heads, hd)
        v = LoraDense(dim, name="attn1_to_v", **dd, **lora)(y).reshape(
            b, s, heads, hd)
        q = apply_rope_full_dim(q, rope_cos, rope_sin)
        k = apply_rope_full_dim(k, rope_cos, rope_sin)
        y = dot_product_attention(q, k, v).reshape(b, s, dim)
        y = LoraDense(dim, name="attn1_to_out", **dd, **lora)(y)
        x = x + (gate_msa * y.astype(jnp.float32)).astype(x.dtype)

        # ungated cross attention with additive text bias
        y = layer_norm_no_affine(x)
        lc = context.shape[1]
        qc = rms("attn2_norm_q", LoraDense(dim, name="attn2_to_q", **dd,
                                           **lora)(y)).reshape(b, s, heads, hd)
        kc = rms("attn2_norm_k", LoraDense(dim, name="attn2_to_k", **dd,
                                           **lora)(context)).reshape(
            b, lc, heads, hd)
        vc = LoraDense(dim, name="attn2_to_v", **dd, **lora)(context).reshape(
            b, lc, heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qc, kc,
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        if context_bias is not None:
            logits = logits + context_bias[:, :, None, :].astype(jnp.float32)
        attn = jax.nn.softmax(logits, -1).astype(vc.dtype)
        y = jnp.einsum("bhqk,bkhd->bqhd", attn, vc).reshape(b, s, dim)
        y = LoraDense(dim, name="attn2_to_out", **dd, **lora)(y)
        x = x + y

        # gated feed-forward
        y = layer_norm_no_affine(x).astype(jnp.float32)
        y = (y * (1 + scale_mlp) + shift_mlp).astype(cfg.dtype)
        y = LoraDense(int(dim * cfg.mlp_ratio), name="ff_in", **dd, **lora)(y)
        y = nn.gelu(y, approximate=True)
        y = LoraDense(dim, name="ff_out", **dd, **lora)(y)
        x = x + (gate_mlp * y.astype(jnp.float32)).astype(x.dtype)
        return x, None


class LTXTransformer(nn.Module):
    config: LTXConfig

    @nn.compact
    def __call__(self, x, prompt_embeds, prompt_mask, t, fractional_coords):
        """x: [B, S, C] pre-patchified latent tokens; fractional_coords:
        [B, 3, S] (t/h/w token coordinates, time already / framerate)."""
        cfg = self.config
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, s, _ = x.shape

        h = LoraDense(dim, name="patchify_proj", **dd)(x.astype(cfg.dtype))
        from .layers import seq_shard

        h = seq_shard(h, cfg.sequence_sharding)

        # adaln_single: sinusoidal(256) -> MLP -> 6*dim, + embedded dim
        ts = t.astype(jnp.float32) * cfg.timestep_scale_multiplier
        emb = sinusoidal_timestep_embedding(ts, 256)
        emb = LoraDense(dim, name="adaln_linear_1", **dd)(emb.astype(cfg.dtype))
        emb = nn.silu(emb)
        embedded_timestep = LoraDense(dim, name="adaln_linear_2", **dd)(emb)
        timestep_6d = LoraDense(6 * dim, name="adaln_proj", **dd)(
            nn.silu(embedded_timestep)
        )[:, None]  # [B, 1, 6D]

        ctx = LoraDense(dim, name="caption_projection_1", **dd)(
            prompt_embeds.astype(cfg.dtype)
        )
        ctx = nn.gelu(ctx, approximate=True)
        ctx = LoraDense(dim, name="caption_projection_2", **dd)(ctx)
        context_bias = None
        if prompt_mask is not None:
            context_bias = (
                (1.0 - prompt_mask.astype(jnp.float32)) * -10000.0
            )[:, None]  # [B, 1, Lc]

        # rope from fractional coords (identical per batch under bucketing)
        ids = jnp.transpose(fractional_coords[0], (1, 0))  # [S, 3]
        rope_cos, rope_sin = ltx_rope_tables(
            ids, dim, cfg.rope_theta, cfg.rope_max_pos
        )

        block = LTXBlock
        if cfg.remat:
            block = remat_wrap(block, cfg.remat)
        h, _ = nn.scan(
            block,
            variable_axes={"params": 0}, split_rngs={"params": True},
            in_axes=nn.broadcast, length=cfg.num_layers,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )(cfg, name="blocks")(h, timestep_6d, ctx, context_bias, rope_cos,
                              rope_sin)

        out_table = self.param(
            "scale_shift_table",
            lambda k, sh: jax.random.normal(k, sh) / dim**0.5, (2, dim),
        )
        # table rows: [shift, scale] (reference OutputLayer, ltx_video.py:300-311)
        mods = (out_table[None, None].astype(jnp.float32)
                + embedded_timestep[:, None, None, :].astype(jnp.float32))
        shift, scale = mods[:, :, 0], mods[:, :, 1]
        h = layer_norm_no_affine(h).astype(jnp.float32)
        h = h * (1 + scale) + shift
        return LoraDense(cfg.out_channels, name="proj_out", **dd)(
            h.astype(cfg.dtype)
        )


@register_model("ltx-video", "ltx_video")
class LTXVideoPipeline(BasePipeline):
    name = "ltx-video"
    framerate = 25
    cacheable_text_embeddings = ("prompt_embeds", "prompt_attention_mask")

    def __init__(self, config):
        super().__init__(config)
        self.tdist = TimestepDistribution.from_model_config(self.model_config)
        self.ltx_config = self._build_config()
        self.model = LTXTransformer(self.ltx_config)
        self.first_frame_conditioning_p = float(
            self.model_config.get("first_frame_conditioning_p", 0.0)
        )

    def _build_config(self) -> LTXConfig:
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
            causal_temporal_positioning=bool(
                mc.get("causal_temporal_positioning", False)),
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
            return LTXConfig.tiny(**kwargs)
        return LTXConfig(**kwargs)

    def _pixel_coords(self, f, h, w, b):
        """Token (t, h, w) coordinates in PIXEL space, token order (f, h, w):
        latent indices x VAE downscale factors (the reference's patchify ->
        latent_to_pixel_coords path, prepare_conditioning at
        ltx_video.py:130-139), time then divided by the framerate
        (ltx_video.py:190-192). causal_temporal_positioning applies the
        causal-VAE fix clamp(t*8 + 1 - 8, 0): the first latent frame holds
        ONE pixel frame, the rest hold 8."""
        cfg = self.ltx_config
        tpix = (jnp.arange(f) * cfg.vae_temporal_factor).astype(jnp.float32)
        if cfg.causal_temporal_positioning:
            tpix = jnp.clip(tpix + 1.0 - cfg.vae_temporal_factor, 0.0)
        fi = jnp.repeat(tpix, h * w)
        hi = jnp.tile(
            jnp.repeat(jnp.arange(h) * cfg.vae_spatial_factor, w), f
        ).astype(jnp.float32)
        wi = jnp.tile(
            jnp.arange(w) * cfg.vae_spatial_factor, f * h
        ).astype(jnp.float32)
        return jnp.stack([fi / self.framerate, hi, wi])[None].repeat(b, 0)

    def init_params(self, rng):
        cfg = self.ltx_config
        return jax.jit(self.model.init)(
            rng,
            jnp.zeros((1, 16, cfg.in_channels)),
            jnp.zeros((1, 8, cfg.caption_dim)),
            jnp.ones((1, 8), jnp.int32),
            jnp.zeros((1,)),
            jnp.zeros((1, 3, 16)),
        )

    def prepare_inputs(self, rng, batch, timestep_quantile=None):
        """latents [B, C, F, H, W] -> flattened tokens; mask normalized by
        its mean (reference ltx_video.py:203-217)."""
        latents = batch["latents"].astype(jnp.float32)
        b, c, f, h, w = latents.shape
        s = f * h * w

        t_key, n_key, ff_key = jax.random.split(rng, 3)
        t = sample_timesteps(
            t_key, b, self.tdist, quantile=timestep_quantile,
            image_seq_len=h * w,
        )
        noise = jax.random.normal(n_key, latents.shape, jnp.float32)
        t_exp = t.reshape(b, 1, 1, 1, 1)
        x_t = (1 - t_exp) * latents + t_exp * noise
        target = noise - latents

        mask = batch.get("mask")
        loss_mask = jnp.ones((b, 1, f, h, w), jnp.float32)
        if mask is not None:
            m = jax.image.resize(
                mask.astype(jnp.float32), (b, h, w), method="nearest"
            )
            loss_mask = loss_mask * m[:, None, None]
        if self.first_frame_conditioning_p > 0:
            # first frame becomes clean conditioning + excluded from loss
            cond = jax.random.uniform(ff_key, (b,)) < self.first_frame_conditioning_p
            cnd = cond.reshape(b, 1, 1, 1, 1)
            x_t = jnp.where(
                cnd & (jnp.arange(f).reshape(1, 1, f, 1, 1) == 0),
                latents, x_t,
            )
            loss_mask = jnp.where(
                cnd & (jnp.arange(f).reshape(1, 1, f, 1, 1) == 0),
                0.0, loss_mask,
            )
        loss_mask = loss_mask / jnp.maximum(jnp.mean(loss_mask), 1e-8)

        # token order (f, h, w); PIXEL coords with time / framerate
        coords = self._pixel_coords(f, h, w, b)

        tokens = x_t.reshape(b, c, s).transpose(0, 2, 1)
        target = target.reshape(b, c, s).transpose(0, 2, 1)
        loss_mask = jnp.broadcast_to(
            loss_mask, (b, c, f, h, w)
        ).reshape(b, c, s).transpose(0, 2, 1)

        model_inputs = dict(
            x=tokens,
            prompt_embeds=batch["prompt_embeds"],
            prompt_mask=batch["prompt_attention_mask"].reshape(b, -1)
            if "prompt_attention_mask" in batch else None,
            t=t,
            fractional_coords=coords,
        )
        return model_inputs, target, loss_mask

    def sample(self, params, width, height, key, num_steps=20,
               guidance_scale=1.0, num_frames=1, **embeds):
        """Euler flow sampling through the training forward (reference
        CommonPipeline.sample, models/base.py:263-291). Returns latents
        [B, C, F, h, w] (LTX VAE: 32x spatial, 8x temporal)."""
        from ..training.sampling import euler_flow_sample

        pe = embeds["prompt_embeds"]
        b = pe.shape[0]
        c = self.ltx_config.in_channels
        h, w = height // 32, width // 32
        f = max(1, (int(num_frames) - 1) // 8 + 1)
        s = f * h * w
        coords = self._pixel_coords(f, h, w, b)
        pmask = embeds.get("prompt_attention_mask")

        def vel(x, t):
            tokens = x.reshape(b, c, s).transpose(0, 2, 1)
            out = self.forward(params, dict(
                x=tokens,
                prompt_embeds=pe,
                prompt_mask=pmask.reshape(b, -1)
                if pmask is not None else None,
                t=t,
                fractional_coords=coords,
            ))
            return out.astype(jnp.float32).transpose(0, 2, 1).reshape(
                b, c, f, h, w)

        return euler_flow_sample(
            vel, (b, c, f, h, w), key, num_steps=num_steps,
            guidance_scale=guidance_scale,
            shift=self.model_config.get("shift"),
        )

    def make_pp_program(self):
        """Pipeline-parallel program: one phase over the LTXBlock scan;
        adaln-single timestep path + caption projection on stage 0, the
        scale_shift_table output layer on the last stage (reference
        partitions via to_layers() + PipelineModule, models/ltx_video.py).
        See parallel/model_pp.py."""
        return _LTXPPProgram(self)

    def forward(self, params, model_inputs):
        return self.model.apply(params, **model_inputs)

    # --- weights ------------------------------------------------------------

    def _keymap_config(self):
        return self.ltx_config

    def keymap(self):
        """Lightricks Transformer3DModel keys (the reference loads the
        official single-file checkpoint via the LTX_Video submodule,
        models/ltx_video.py:58-70, and saves ComfyUI-prefix LoRA, :79-83)
        <-> our stacked flax layout."""
        from .keymaps import BlockGroup, KeyMap

        return KeyMap(
            blocks=[
                BlockGroup(
                    "blocks", "transformer_blocks", "num_layers",
                    linears={
                        "attn1_to_q": "attn1.to_q",
                        "attn1_to_k": "attn1.to_k",
                        "attn1_to_v": "attn1.to_v",
                        "attn1_to_out": "attn1.to_out.0",
                        "attn2_to_q": "attn2.to_q",
                        "attn2_to_k": "attn2.to_k",
                        "attn2_to_v": "attn2.to_v",
                        "attn2_to_out": "attn2.to_out.0",
                        "ff_in": "ff.net.0.proj",
                        "ff_out": "ff.net.2",
                    },
                    norms={
                        "attn1_norm_q": "attn1.q_norm",
                        "attn1_norm_k": "attn1.k_norm",
                        "attn2_norm_q": "attn2.q_norm",
                        "attn2_norm_k": "attn2.k_norm",
                    },
                    raw={"scale_shift_table": "scale_shift_table"},
                ),
            ],
            top_linears={
                "patchify_proj": "patchify_proj",
                "adaln_linear_1": "adaln_single.emb.timestep_embedder.linear_1",
                "adaln_linear_2": "adaln_single.emb.timestep_embedder.linear_2",
                "adaln_proj": "adaln_single.linear",
                "caption_projection_1": "caption_projection.linear_1",
                "caption_projection_2": "caption_projection.linear_2",
                "proj_out": "proj_out",
            },
            top_raw={"scale_shift_table": "scale_shift_table"},
            lora_prefix="diffusion_model.",
        )

    def load_weights(self):
        from .keymaps import keymap_to_flax, load_sd_for_pipeline

        return keymap_to_flax(
            load_sd_for_pipeline(self), self.keymap(), self.ltx_config
        )

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

        # LTX causal video VAE (ltx_vae.py): convert directly from the
        # checkpoint (reference ltx_video.py:42 loads the VAE from the
        # combined single file), with topology discovered from the keys.
        # vae_params_path (pre-converted flax msgpack) remains an override.
        from .ltx_vae import LTXVAEConfig, LTXVideoVAE, convert_ltx_vae

        if mc.get("vae_params_path"):
            import flax.serialization

            cfg = LTXVAEConfig()
            vae = LTXVideoVAE(cfg)
            with open(mc["vae_params_path"], "rb") as f:
                params = flax.serialization.msgpack_restore(f.read())
        else:
            from .weights import load_state_dict_any

            sd = load_state_dict_any(
                mc.get("vae_path") or mc["single_file_path"])
            vae_sd = {k: v for k, v in sd.items()
                      if k.startswith(("vae.", "encoder.", "decoder.",
                                       "per_channel_statistics."))}
            cfg, params = convert_ltx_vae(vae_sd)
            vae = LTXVideoVAE(cfg)
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

            cfg = self.ltx_config

            def te(caps):
                embs, masks = [], []
                for cap in caps:
                    r = np.random.default_rng(seed_from_hash(cap))
                    n = min(len(cap) + 1, 8)
                    e = np.zeros((8, cfg.caption_dim), np.float32)
                    e[:n] = r.standard_normal((n, cfg.caption_dim))
                    m = np.zeros((8,), np.int32)
                    m[:n] = 1
                    embs.append(e)
                    masks.append(m)
                return {"prompt_embeds": np.stack(embs),
                        "prompt_attention_mask": np.stack(masks)}

            return [te]
        from .text_encoders import HFTextEncoder

        t5 = HFTextEncoder(
            "t5", mc["t5_path"],
            max_length=int(mc.get("max_sequence_length", 128)),
        )

        def t5_fn(captions):
            emb, m = t5.encode(captions, return_mask=True)
            return {"prompt_embeds": emb,
                    "prompt_attention_mask": m.astype(np.int32)}

        return [t5_fn]


class _LTXPPProgram:
    """PPProgram for LTXTransformer (see parallel/model_pp.py).

    Raw-param re-expression of the __call__ split at the block scan.
    Payload: (h, timestep_6d, ctx_emb, context_bias, embedded_timestep) —
    embedded_timestep feeds the scale_shift_table output layer on the last
    stage.
    """

    def __init__(self, pipeline):
        from ..parallel.model_pp import PPPhase

        self.pipeline = pipeline
        cfg = pipeline.ltx_config
        self.cfg = cfg
        self.phases = [
            PPPhase("blocks", cfg.num_layers, self._apply_block)
        ]

    def _apply_block(self, p_i, payload, ctx):
        h, t6, ce, cb, et = payload
        h, _ = LTXBlock(self.cfg).apply(
            {"params": p_i}, h, t6, ce, cb, ctx["rope_cos"], ctx["rope_sin"]
        )
        return (h, t6, ce, cb, et)

    def make_ctx(self, p_rest, mi0):
        ids = jnp.transpose(mi0["fractional_coords"][0], (1, 0))
        rope_cos, rope_sin = ltx_rope_tables(
            ids, self.cfg.hidden_size, self.cfg.rope_theta,
            self.cfg.rope_max_pos,
        )
        return {"rope_cos": rope_cos, "rope_sin": rope_sin}

    def embed(self, p_rest, mi, ctx):
        cfg = self.cfg
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        x, t = mi["x"], mi["t"]

        h = LoraDense(dim, **dd).apply(
            {"params": p_rest["patchify_proj"]}, x.astype(cfg.dtype))

        ts = t.astype(jnp.float32) * cfg.timestep_scale_multiplier
        emb = sinusoidal_timestep_embedding(ts, 256)
        emb = LoraDense(dim, **dd).apply(
            {"params": p_rest["adaln_linear_1"]}, emb.astype(cfg.dtype))
        embedded_timestep = LoraDense(dim, **dd).apply(
            {"params": p_rest["adaln_linear_2"]}, nn.silu(emb))
        timestep_6d = LoraDense(6 * dim, **dd).apply(
            {"params": p_rest["adaln_proj"]},
            nn.silu(embedded_timestep))[:, None]

        ce = LoraDense(dim, **dd).apply(
            {"params": p_rest["caption_projection_1"]},
            mi["prompt_embeds"].astype(cfg.dtype))
        ce = nn.gelu(ce, approximate=True)
        ce = LoraDense(dim, **dd).apply(
            {"params": p_rest["caption_projection_2"]}, ce)
        pm = mi.get("prompt_mask")
        if pm is None:
            cb = jnp.zeros((x.shape[0], 1, ce.shape[1]), jnp.float32)
        else:
            cb = ((1.0 - pm.astype(jnp.float32)) * -10000.0)[:, None]
        return (h, timestep_6d, ce, cb, embedded_timestep)

    def head_loss(self, p_rest, payload, target, mask, ctx):
        cfg = self.cfg
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        h, _t6, _ce, _cb, embedded_timestep = payload

        out_table = p_rest["scale_shift_table"]
        mods = (jnp.asarray(out_table)[None, None].astype(jnp.float32)
                + embedded_timestep[:, None, None, :].astype(jnp.float32))
        shift, scale = mods[:, :, 0], mods[:, :, 1]
        hf = layer_norm_no_affine(h).astype(jnp.float32)
        hf = hf * (1 + scale) + shift
        out = LoraDense(cfg.out_channels, **dd).apply(
            {"params": p_rest["proj_out"]}, hf.astype(cfg.dtype))
        return self.pipeline.loss_fn(out, target, mask)
