"""LTX 2.3 model family (T2I/T2V; audio branch disabled as in reference
training).

Reference: models/ltx2.py (624 LoC over the ComfyUI LTXAV model). Structure
extracted from that wrapper:
  - AV transformer blocks (BasicAVTransformerBlock) with per-block
    scale_shift_table + global adaLN-single timestep embedding; pre-norms
    are RMS norms (reference :49-170 patched forward)
  - training passes EMPTY audio latents (noisy_latents_audio zeros([bs,0]),
    reference :344-346), so the audio self/cross/FF paths and a2v/v2a
    cross-attention never run — this implementation builds the video path
  - Gemma-3-12B caption embeds (projected by the TE-side dual_linear
    text_embedding_projection, cached) -> caption_projection -> a 1D
    embeddings CONNECTOR: learnable registers pad the sequence to
    >= 1024 tokens, transformer_1d blocks with 1D rope, final RMS norm;
    the connector output mask is all-ones (reference :421-476)
  - cross attention modulated by a prompt adaLN-single
    (prompt_scale_shift_table + prompt_timestep, reference :74-79)
  - rope from pixel coords / framerate 24, video rounded to 32px / 8
    frames (reference :278-279)
  - flow matching, target noise - latents; masked MSE/huber loss
    (get_loss_fn, reference :376-395)

Connector/cross-attention internals flagged for real-checkpoint
verification; dims checkpoint-configurable.
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
from .layers import (
    LoraDense,
    RMSNorm,
    apply_rope,
    remat_spec,
    remat_wrap,
    rope_frequencies,
    sinusoidal_timestep_embedding,
)
from ..ops.attention import dot_product_attention
from ..training.flow import TimestepDistribution, sample_timesteps

Dtype = Any


def _rms_noscale(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, -1, keepdims=True) + eps)).astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class LTX2Config:
    in_channels: int = 128
    out_channels: int = 128
    hidden_size: int = 4096
    num_heads: int = 32
    num_layers: int = 48
    mlp_ratio: float = 4.0
    cross_attention_dim: int = 4096       # video text width (post TE proj)
    audio_cross_attention_dim: int = 1024
    connector_registers: int = 128
    connector_min_len: int = 1024
    connector_blocks: int = 2
    rope_axes_dim: Tuple[int, ...] = (32, 48, 48)
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
    # Exact-N blocks_to_swap (reference docs/supported_models.md:599:
    # ltx2 blocks_to_swap=46 max): deepest N blocks stream from host in
    # a "blocks_swap" scan (parallel/offload.py apply_swap_split).
    offload_tail: int = 0

    @property
    def swap_split(self):
        from ..parallel.offload import swap_split_of

        return swap_split_of(self.num_layers, self.offload_tail)

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

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
            in_channels=16, out_channels=16, hidden_size=32, num_heads=4,
            num_layers=2, cross_attention_dim=24, audio_cross_attention_dim=8,
            connector_registers=4, connector_min_len=16, connector_blocks=1,
            rope_axes_dim=(4, 2, 2), dtype=jnp.float32, param_dtype=jnp.float32,
        )
        d.update(kw)
        return LTX2Config(**d)


class Connector1D(nn.Module):
    """Text embeddings connector: register padding + 1D-rope transformer.

    Mirrors reference ltx2.py:421-459: valid (right-padded) tokens keep
    their content, every other position takes the tiled learnable
    registers; output mask is all ones."""

    config: LTX2Config
    width: int

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.config
        d = self.width
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, L, _ = x.shape
        target = max(cfg.connector_min_len, L)
        reg = self.param("learnable_registers", nn.initializers.normal(0.02),
                         (cfg.connector_registers, d), cfg.param_dtype)
        reps = -(-target // cfg.connector_registers)
        tiled = jnp.tile(jnp.asarray(reg, cfg.dtype), (reps, 1))[:target]
        if target > L:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(tiled[None, L:], (b, target - L, d))], 1)
            mask = jnp.concatenate(
                [mask, jnp.zeros((b, target - L), mask.dtype)], 1)
        x = jnp.where(mask.astype(bool)[..., None], x, tiled[None])

        pos = jnp.arange(target, dtype=jnp.float32)[:, None]
        hd = d // max(1, d // 64)
        heads = d // hd
        rope_cos, rope_sin = rope_frequencies(pos, (hd,), cfg.rope_theta)
        for i in range(cfg.connector_blocks):
            y = _rms_noscale(x)
            q = LoraDense(d, use_bias=False, name=f"attn_q_{i}", **dd)(y)
            k = LoraDense(d, use_bias=False, name=f"attn_k_{i}", **dd)(y)
            v = LoraDense(d, use_bias=False, name=f"attn_v_{i}", **dd)(y)
            q = apply_rope(q.reshape(b, target, heads, hd), rope_cos, rope_sin)
            k = apply_rope(k.reshape(b, target, heads, hd), rope_cos, rope_sin)
            v = v.reshape(b, target, heads, hd)
            a = dot_product_attention(q, k, v).reshape(b, target, d)
            x = x + LoraDense(d, use_bias=False, name=f"attn_o_{i}", **dd)(a)
            y = _rms_noscale(x)
            y = LoraDense(4 * d, use_bias=False, name=f"mlp_in_{i}", **dd)(y)
            y = nn.gelu(y, approximate=True)
            x = x + LoraDense(d, use_bias=False, name=f"mlp_out_{i}", **dd)(y)
        return _rms_noscale(x)


class LTX2Block(nn.Module):
    """Video path of BasicAVTransformerBlock (audio empty in training)."""

    config: LTX2Config

    @nn.compact
    def __call__(self, x, timestep_6d, prompt_2d, context, rope_cos, rope_sin):
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

        # gated self attention, RMS pre-norm (reference ltx2.py:68-71)
        y = _rms_noscale(x).astype(jnp.float32)
        y = (y * (1 + scale_msa) + shift_msa).astype(cfg.dtype)
        q = rms("attn1_norm_q", LoraDense(dim, use_bias=False,
                name="attn1_to_q", **dd, **lora)(y)).reshape(b, s, heads, hd)
        k = rms("attn1_norm_k", LoraDense(dim, use_bias=False,
                name="attn1_to_k", **dd, **lora)(y)).reshape(b, s, heads, hd)
        v = LoraDense(dim, use_bias=False, name="attn1_to_v", **dd,
                      **lora)(y).reshape(b, s, heads, hd)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        y = dot_product_attention(q, k, v).reshape(b, s, dim)
        y = LoraDense(dim, use_bias=False, name="attn1_to_out", **dd,
                      **lora)(y)
        x = x + (gate_msa * y.astype(jnp.float32)).astype(x.dtype)

        # prompt-modulated cross attention (prompt_scale_shift_table +
        # prompt adaLN-single, reference :74-79)
        ptable = self.param(
            "prompt_scale_shift_table",
            lambda k, sh: jax.random.normal(k, sh) / dim**0.5, (2, dim),
        )
        pm = (ptable[None].astype(jnp.float32)
              + prompt_2d.reshape(b, 2, dim).astype(jnp.float32))
        p_shift, p_scale = pm[:, 0, None], pm[:, 1, None]
        lc = context.shape[1]
        ctx = _rms_noscale(context).astype(jnp.float32)
        ctx = (ctx * (1 + p_scale) + p_shift).astype(cfg.dtype)
        y = _rms_noscale(x)
        qc = rms("attn2_norm_q", LoraDense(dim, use_bias=False,
                 name="attn2_to_q", **dd, **lora)(y)).reshape(b, s, heads, hd)
        kc = rms("attn2_norm_k", LoraDense(dim, use_bias=False,
                 name="attn2_to_k", **dd, **lora)(ctx)).reshape(
            b, lc, heads, hd)
        vc = LoraDense(dim, use_bias=False, name="attn2_to_v", **dd,
                       **lora)(ctx).reshape(b, lc, heads, hd)
        y = dot_product_attention(qc, kc, vc).reshape(b, s, dim)
        x = x + LoraDense(dim, use_bias=False, name="attn2_to_out", **dd,
                          **lora)(y)

        # gated feed-forward
        y = _rms_noscale(x).astype(jnp.float32)
        y = (y * (1 + scale_mlp) + shift_mlp).astype(cfg.dtype)
        y = LoraDense(int(dim * cfg.mlp_ratio), use_bias=False, name="ff_in",
                      **dd, **lora)(y)
        y = nn.gelu(y, approximate=True)
        y = LoraDense(dim, use_bias=False, name="ff_out", **dd, **lora)(y)
        x = x + (gate_mlp * y.astype(jnp.float32)).astype(x.dtype)
        return x, None


class LTX2Transformer(nn.Module):
    config: LTX2Config

    @nn.compact
    def __call__(self, x, prompt_embeds, prompt_mask, t, fractional_coords):
        """x: [B, S, C] pre-patchified latent tokens; prompt_embeds:
        [B, T, cross(+audio_cross)] TE-projected Gemma-3 embeds;
        fractional_coords: [B, 3, S]."""
        cfg = self.config
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, s, _ = x.shape

        h = LoraDense(dim, name="patchify_proj", **dd)(x.astype(cfg.dtype))
        from .layers import seq_shard

        h = seq_shard(h, cfg.sequence_sharding)

        ts = t.astype(jnp.float32) * cfg.timestep_scale_multiplier
        emb = sinusoidal_timestep_embedding(ts, 256)
        emb = LoraDense(dim, name="adaln_linear_1", **dd)(emb.astype(cfg.dtype))
        embedded_timestep = LoraDense(dim, name="adaln_linear_2", **dd)(
            nn.silu(emb))
        timestep_6d = LoraDense(6 * dim, name="adaln_proj", **dd)(
            nn.silu(embedded_timestep))[:, None]
        prompt_2d = LoraDense(2 * dim, name="prompt_adaln_proj", **dd)(
            nn.silu(embedded_timestep))

        # video half of the dual text stream (reference :461-474)
        width = prompt_embeds.shape[-1]
        if width == cfg.cross_attention_dim + cfg.audio_cross_attention_dim:
            ctx_vid = prompt_embeds[..., : cfg.cross_attention_dim]
        else:
            ctx_vid = prompt_embeds
        ctx = LoraDense(dim, name="caption_projection", **dd)(
            ctx_vid.astype(cfg.dtype))
        ctx = Connector1D(cfg, dim, name="video_embeddings_connector")(
            ctx, prompt_mask)

        ids = jnp.transpose(fractional_coords[0], (1, 0))
        rope_cos, rope_sin = rope_frequencies(
            ids, cfg.rope_axes_dim, cfg.rope_theta
        )

        from ..parallel.offload import apply_swap_split

        def apply_blocks(carry, length, name, streamed):
            b_cls = LTX2Block
            if streamed:
                from ..parallel.offload import stream_params_from_host

                b_cls = stream_params_from_host(b_cls)
            if cfg.remat:
                b_cls = remat_wrap(b_cls, cfg.remat)
            carry, _ = nn.scan(
                b_cls,
                variable_axes={"params": 0}, split_rngs={"params": True},
                in_axes=nn.broadcast, length=length,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )(cfg, name=name)(carry, timestep_6d, prompt_2d, ctx, rope_cos,
                              rope_sin)
            return carry

        # exact-N blocks_to_swap: deepest N blocks stream from host
        # (reference offloading.py:184; ltx2 docs blocks_to_swap=46)
        h = apply_swap_split(h, cfg.swap_split, apply_blocks)

        out_table = self.param(
            "scale_shift_table",
            lambda k, sh: jax.random.normal(k, sh) / dim**0.5, (2, dim),
        )
        mods = (out_table[None, None].astype(jnp.float32)
                + embedded_timestep[:, None, None, :].astype(jnp.float32))
        shift, scale = mods[:, :, 0], mods[:, :, 1]
        h = _rms_noscale(h).astype(jnp.float32)
        h = h * (1 + scale) + shift
        return LoraDense(cfg.out_channels, name="proj_out", **dd)(
            h.astype(cfg.dtype))


@register_model("ltx2")
class LTX2Pipeline(BasePipeline):
    name = "ltx2"
    framerate = 24
    cacheable_text_embeddings = ("text_embeds_0", "attention_mask_0")

    def __init__(self, config):
        super().__init__(config)
        mc = self.model_config
        self.tdist = TimestepDistribution.from_model_config(mc)
        self.ltx2_config = self._build_config()
        self.model = LTX2Transformer(self.ltx2_config)

    def _build_config(self) -> LTX2Config:
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
            offload_tail=int(self.config.get("blocks_to_swap", 0) or 0),
        )
        for knob in ("hidden_size", "num_layers", "num_heads",
                     "cross_attention_dim", "audio_cross_attention_dim",
                     "in_channels", "out_channels"):
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
            return LTX2Config.tiny(**kwargs)
        return LTX2Config(**kwargs)

    def init_params(self, rng):
        cfg = self.ltx2_config
        return jax.jit(self.model.init)(
            rng,
            jnp.zeros((1, 8, cfg.in_channels)),
            jnp.zeros((1, 8, cfg.cross_attention_dim)),
            jnp.ones((1, 8), jnp.int32),
            jnp.zeros((1,)),
            jnp.zeros((1, 3, 8)),
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
            )
            mask = jnp.broadcast_to(mask[:, None, None], (b, 1, f, h, w))
            mask = mask.reshape(b, 1, f * h * w).transpose(0, 2, 1)
        t_key, n_key = jax.random.split(rng)
        t = sample_timesteps(
            t_key, b, self.tdist, quantile=timestep_quantile,
            image_seq_len=(h // 2) * (w // 2),
        )
        noise = jax.random.normal(n_key, latents.shape, jnp.float32)
        t_exp = t.reshape(b, 1, 1, 1, 1)
        x_t = (1 - t_exp) * latents + t_exp * noise
        target = noise - latents

        def tokens(v):
            return jnp.transpose(v.reshape(b, c, f * h * w), (0, 2, 1))

        target = tokens(target)

        # fractional coords: time / framerate (reference LTX rope semantics)
        fi = np.repeat(np.arange(f, dtype=np.float32), h * w) / self.framerate
        hi = np.tile(np.repeat(np.arange(h, dtype=np.float32), w), f)
        wi = np.tile(np.arange(w, dtype=np.float32), f * h)
        coords = np.stack([fi, hi, wi], 0)[None].repeat(b, 0)

        model_inputs = dict(
            x=tokens(x_t),
            prompt_embeds=batch["text_embeds_0"],
            prompt_mask=batch["attention_mask_0"].reshape(b, -1),
            t=t,
            fractional_coords=jnp.asarray(coords),
        )
        return model_inputs, target, mask

    def sample(self, params, width, height, key, num_steps=20,
               guidance_scale=1.0, num_frames=1, **embeds):
        """Euler flow sampling through the training forward (reference
        CommonPipeline.sample, models/base.py:263-291). Returns latents
        [B, C, F, h, w] (LTX2 VAE: 32x spatial, 8x temporal)."""
        from ..training.sampling import euler_flow_sample

        te = embeds["text_embeds_0"]
        b = te.shape[0]
        c = self.ltx2_config.in_channels
        h, w = height // 32, width // 32
        f = max(1, (int(num_frames) - 1) // 8 + 1)
        s = f * h * w
        fi = np.repeat(np.arange(f, dtype=np.float32), h * w) / self.framerate
        hi = np.tile(np.repeat(np.arange(h, dtype=np.float32), w), f)
        wi = np.tile(np.arange(w, dtype=np.float32), f * h)
        coords = jnp.asarray(
            np.stack([fi, hi, wi], 0)[None].repeat(b, 0))
        tmask = embeds["attention_mask_0"]

        def vel(x, t):
            tokens = jnp.transpose(x.reshape(b, c, s), (0, 2, 1))
            out = self.forward(params, dict(
                x=tokens,
                prompt_embeds=te,
                prompt_mask=tmask.reshape(b, -1),
                t=t,
                fractional_coords=coords,
            ))
            return jnp.transpose(
                out.astype(jnp.float32), (0, 2, 1)).reshape(b, c, f, h, w)

        return euler_flow_sample(
            vel, (b, c, f, h, w), key, num_steps=num_steps,
            guidance_scale=guidance_scale,
            shift=self.model_config.get("shift"),
        )

    def make_pp_program(self):
        """Pipeline-parallel program (reference partitions any model via
        to_layers() + PipelineModule). See parallel/model_pp.py."""
        n_res, n_swap = self.ltx2_config.swap_split
        if 0 < n_swap < self.ltx2_config.num_layers:
            raise NotImplementedError(
                "partial blocks_to_swap (split block stacks) cannot be "
                "combined with pipeline_stages > 1; use blocks_to_swap >= "
                "num_layers or drop pipeline parallelism"
            )
        return _LTX2PPProgram(self)

    def host_stack_names(self):
        """Exact-N blocks_to_swap (ltx2 docs blocks_to_swap=46)."""
        from ..parallel.offload import swap_stack_names

        return swap_stack_names((self.ltx2_config.swap_split,))

    def forward(self, params, model_inputs):
        return self.model.apply(params, **model_inputs)

    # --- weights ------------------------------------------------------------

    def _keymap_config(self):
        return self.ltx2_config

    def keymap(self):
        """LTX-2 (video path of the AV transformer) keys. Top-level module
        names are taken from the reference wrapper (models/ltx2.py:178-194
        keep_in_high_precision + :400-410: patchify_proj, adaln_single,
        prompt_adaln_single, caption_projection,
        video_embeddings_connector, scale_shift_table, proj_out; audio
        branch untrained/not instantiated). adaln_single follows the LTX-1
        AdaLayerNormSingle layout; connector/caption-projection internals
        flagged pending real-checkpoint verification. ComfyUI-prefix
        LoRA."""
        from .keymaps import BlockGroup, KeyMap

        cfg = self.ltx2_config
        top_linears = {
            "patchify_proj": "patchify_proj",
            "adaln_linear_1": "adaln_single.emb.timestep_embedder.linear_1",
            "adaln_linear_2": "adaln_single.emb.timestep_embedder.linear_2",
            "adaln_proj": "adaln_single.linear",
            "prompt_adaln_proj": "prompt_adaln_single.linear",
            "caption_projection": "caption_projection.linear",
            "proj_out": "proj_out",
        }
        top_raw = {
            "scale_shift_table": "scale_shift_table",
            "video_embeddings_connector/learnable_registers":
                "video_embeddings_connector.learnable_registers",
        }
        # the reference iterates connector.transformer_1d_blocks
        # (ltx2.py:456), so that is the checkpoint container name
        for i in range(cfg.connector_blocks):
            base = f"video_embeddings_connector.transformer_1d_blocks.{i}"
            top_linears.update({
                f"video_embeddings_connector/attn_q_{i}": f"{base}.attn.q_proj",
                f"video_embeddings_connector/attn_k_{i}": f"{base}.attn.k_proj",
                f"video_embeddings_connector/attn_v_{i}": f"{base}.attn.v_proj",
                f"video_embeddings_connector/attn_o_{i}": f"{base}.attn.o_proj",
                f"video_embeddings_connector/mlp_in_{i}": f"{base}.mlp.fc1",
                f"video_embeddings_connector/mlp_out_{i}": f"{base}.mlp.fc2",
            })
        from .keymaps import split_block_group

        n_res, n_swap = cfg.swap_split
        return KeyMap(
            blocks=[*split_block_group(BlockGroup(
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
                raw={
                    "scale_shift_table": "scale_shift_table",
                    "prompt_scale_shift_table": "prompt_scale_shift_table",
                },
            ), n_res, n_swap)],
            top_linears=top_linears,
            top_raw=top_raw,
            lora_prefix="diffusion_model.",
            # The reference keeps the (untrained) audio branch of the AV
            # transformer in the same checkpoint (models/ltx2.py:408-420:
            # audio_patchify_proj, audio_adaln_single, av_ca_* adaLN
            # singles, audio_embeddings_connector, audio_norm_out/proj_out
            # + per-block audio attention). We train the video path only,
            # so those tensors are carried through load -> save_model
            # verbatim instead of being dropped from full-model exports.
            passthrough_patterns=(r"audio", r"^av_ca_"),
        )

    def load_weights(self):
        from .keymaps import keymap_to_flax, load_sd_for_pipeline

        return keymap_to_flax(
            load_sd_for_pipeline(self), self.keymap(), self.ltx2_config
        )

    def get_call_vae_fn(self):
        """Video VAE (reference ltx2.py:203-232: 'vae.'-prefixed keys in
        the combined checkpoint through ComfyUI's loader). LTX-2 keeps the
        LTX causal-VAE encoder family (pixel-norm resnets, flat
        down_blocks list, per_channel_statistics latent stats), so the
        topology-discovering convert_ltx_vae handles it; an encoder layout
        that doesn't match the family raises instead of caching garbage.
        model.vae_path overrides the combined-file location."""
        mc = self.model_config
        if mc.get("_tiny", False):
            return self._generic_image_vae_fn(
                tiny_latent_channels=self.ltx2_config.in_channels // 8
                if self.ltx2_config.in_channels >= 8 else 4,
                video_latents=True,
            )
        from .ltx_vae import LTXVideoVAE, convert_ltx_vae
        from .weights import load_state_dict_any

        sd = load_state_dict_any(
            mc.get("vae_path") or mc.get("diffusion_model")
            or mc["single_file_path"])
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
                encode(jnp.asarray(pixels, jnp.float32)))}

        return fn

    def get_call_text_encoder_fns(self):
        mc = self.model_config
        if mc.get("_tiny", False):
            from ..data.bucketing import seed_from_hash

            cfg = self.ltx2_config

            def te(caps):
                embs, masks = [], []
                for cap in caps:
                    r = np.random.default_rng(seed_from_hash(cap))
                    n = min(len(cap) + 1, 8)
                    e = np.zeros((8, cfg.cross_attention_dim), np.float32)
                    e[:n] = r.standard_normal((n, cfg.cross_attention_dim))
                    m = np.zeros((8,), np.int32)
                    m[:n] = 1
                    embs.append(e)
                    masks.append(m)
                return {"text_embeds_0": np.stack(embs),
                        "attention_mask_0": np.stack(masks)}

            return [te]

        # Gemma-3-12B hidden states; the ComfyUI TE applies a dual_linear
        # text_embedding_projection before caching (reference :27-46) —
        # provide the raw Gemma states and set cross_attention_dim to the
        # Gemma width, or cache pre-projected embeds externally.
        from .llm_encoders import LLMTextEncoder

        enc = LLMTextEncoder(
            mc["text_encoder_path"],
            max_length=int(mc.get("max_sequence_length", 512)),
            hidden_layer=-1,
        )

        def fn(caps):
            h, m = enc.encode(caps)
            return {"text_embeds_0": h, "attention_mask_0": m.astype(np.int32)}

        return [fn]


class _LTX2PPProgram:
    """PPProgram for LTX2Transformer (see parallel/model_pp.py).
    The caption projection + Connector1D run on stage 0; per-block
    scale_shift/prompt tables live in the block stack. Payload:
    (h, timestep_6d, prompt_2d, ctx_emb, embedded_timestep)."""

    def __init__(self, pipeline):
        from ..parallel.model_pp import PPPhase

        self.pipeline = pipeline
        cfg = pipeline.ltx2_config
        self.cfg = cfg
        self.phases = [PPPhase("blocks", cfg.num_layers, self._apply_block)]

    def _apply_block(self, p_i, payload, ctx):
        h, t6, p2, ce, et = payload
        h, _ = LTX2Block(self.cfg).apply(
            {"params": p_i}, h, t6, p2, ce, ctx["rope_cos"], ctx["rope_sin"]
        )
        return (h, t6, p2, ce, et)

    def make_ctx(self, p_rest, mi0):
        ids = jnp.transpose(mi0["fractional_coords"][0], (1, 0))
        rope_cos, rope_sin = rope_frequencies(
            ids, self.cfg.rope_axes_dim, self.cfg.rope_theta
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
        prompt_2d = LoraDense(2 * dim, **dd).apply(
            {"params": p_rest["prompt_adaln_proj"]},
            nn.silu(embedded_timestep))

        prompt_embeds = mi["prompt_embeds"]
        width = prompt_embeds.shape[-1]
        if width == cfg.cross_attention_dim + cfg.audio_cross_attention_dim:
            ctx_vid = prompt_embeds[..., : cfg.cross_attention_dim]
        else:
            ctx_vid = prompt_embeds
        ce = LoraDense(dim, **dd).apply(
            {"params": p_rest["caption_projection"]},
            ctx_vid.astype(cfg.dtype))
        ce = Connector1D(cfg, dim).apply(
            {"params": p_rest["video_embeddings_connector"]},
            ce, mi["prompt_mask"])
        return (h, timestep_6d, prompt_2d, ce, embedded_timestep)

    def head_loss(self, p_rest, payload, target, mask, ctx):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        h, _t6, _p2, _ce, embedded_timestep = payload

        out_table = p_rest["scale_shift_table"]
        mods = (jnp.asarray(out_table)[None, None].astype(jnp.float32)
                + embedded_timestep[:, None, None, :].astype(jnp.float32))
        shift, scale = mods[:, :, 0], mods[:, :, 1]
        hf = _rms_noscale(h).astype(jnp.float32)
        hf = hf * (1 + scale) + shift
        out = LoraDense(cfg.out_channels, **dd).apply(
            {"params": p_rest["proj_out"]}, hf.astype(cfg.dtype))
        return self.pipeline.loss_fn(out, target, mask)
