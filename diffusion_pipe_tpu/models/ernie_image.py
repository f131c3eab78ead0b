"""Ernie-Image model family (Baidu ERNIE image DiT).

Reference: models/ernie_image.py (232 LoC over the ComfyUI model).
Structure extracted from that wrapper:
  - single-stream DiT over the [img, text] concatenated sequence
    (reference :148-150) with SHARED adaLN: one 6-way modulation is
    computed globally from the time embedding and broadcast to every
    ErnieImageSharedAdaLNBlock (reference :169-176)
  - rope ids: text axis-0 = 0..T-1; image tokens axis-0 = T with 2D
    (row, col); pos_embed over cat([image_ids, text_ids]) matching the
    [img, text] token order (reference :151-165)
  - attention mask: image all-valid + text validity (reference :179-181)
  - x_embedder patchify conv, text_proj on Ministral-3 embeds,
    time_proj -> time_embedding MLP, final adaLN norm + linear
  - flow matching, t*1000 into the model, target noise - latents
    (reference :84-89)

Block internals (qk-norm) flagged for real-checkpoint verification; dims
are checkpoint-configurable via the model config table.
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
class ErnieImageConfig:
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    hidden_size: int = 2560
    num_attention_heads: int = 20
    num_layers: int = 28
    mlp_ratio: float = 4.0
    text_dim: int = 3072          # Ministral-3-3B hidden
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
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
    # Exact-N blocks_to_swap (reference ernie_image.py enable_block_swap
    # over the single `layers` container)
    offload_tail: int = 0

    @property
    def swap_split(self):
        from ..parallel.offload import swap_split_of

        return swap_split_of(self.num_layers, self.offload_tail)

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads

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
            in_channels=4, out_channels=4, hidden_size=32,
            num_attention_heads=4, num_layers=2, text_dim=24,
            axes_dims_rope=(4, 2, 2), dtype=jnp.float32,
            param_dtype=jnp.float32,
        )
        d.update(kw)
        return ErnieImageConfig(**d)


class ErnieSharedAdaLNBlock(nn.Module):
    config: ErnieImageConfig

    @nn.compact
    def __call__(self, x, mods, rope_cos, rope_sin, kv_mask):
        cfg = self.config
        dim = cfg.hidden_size
        heads, hd = cfg.num_attention_heads, cfg.head_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  kernel_dtype=cfg.base_kernel_dtype,
                  int8_matmul=cfg.int8_matmul)
        lora = cfg.lora_kwargs
        b, s = x.shape[:2]
        s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = mods

        y = modulate(layer_norm_no_affine(x), s_msa, sc_msa)
        q = LoraDense(dim, use_bias=False, name="attn_q",
                      kernel_axes=(None, "tensor"), **dd, **lora)(y)
        k = LoraDense(dim, use_bias=False, name="attn_k",
                      kernel_axes=(None, "tensor"), **dd, **lora)(y)
        v = LoraDense(dim, use_bias=False, name="attn_v",
                      kernel_axes=(None, "tensor"), **dd, **lora)(y)
        q = q.reshape(b, s, heads, hd)
        k = k.reshape(b, s, heads, hd)
        v = v.reshape(b, s, heads, hd)
        rms = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        q = RMSNorm(name="attn_q_norm", **rms)(q)
        k = RMSNorm(name="attn_k_norm", **rms)(k)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        attn = dot_product_attention(q, k, v, kv_mask).reshape(b, s, dim)
        attn = LoraDense(dim, use_bias=False, name="attn_out",
                         kernel_axes=("tensor", None), **dd, **lora)(attn)
        x = x + g_msa[:, None] * attn

        y = modulate(layer_norm_no_affine(x), s_mlp, sc_mlp)
        y = LoraDense(int(dim * cfg.mlp_ratio), use_bias=False, name="mlp_fc1",
                      kernel_axes=(None, "tensor"), **dd, **lora)(y)
        y = nn.gelu(y, approximate=True)
        y = LoraDense(dim, use_bias=False, name="mlp_fc2",
                      kernel_axes=("tensor", None), **dd, **lora)(y)
        return x + g_mlp[:, None] * y, None


class ErnieImageTransformer(nn.Module):
    config: ErnieImageConfig

    @nn.compact
    def __call__(self, x, t, text_embeds, text_mask):
        """x: [B, C, H, W]; t: [B] in [0, 1000]; text_embeds:
        [B, T, text_dim]; text_mask: [B, T]."""
        cfg = self.config
        dim = cfg.hidden_size
        p = cfg.patch_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, c, hh, ww = x.shape
        gh, gw = hh // p, ww // p
        img_len = gh * gw
        tmax = text_embeds.shape[1]

        xi = x.reshape(b, c, gh, p, gw, p)
        xi = jnp.einsum("bchpwq->bhwpqc", xi).reshape(b, img_len, p * p * c)
        img = LoraDense(dim, name="x_embedder", **dd)(xi.astype(cfg.dtype))
        txt = LoraDense(dim, name="text_proj", **dd)(
            text_embeds.astype(cfg.dtype))
        h = jnp.concatenate([img, txt], axis=1)  # [img, text] order

        # rope ids (reference ernie_image.py:151-165)
        text_ids = np.zeros((tmax, 3), np.float32)
        text_ids[:, 0] = np.arange(tmax, dtype=np.float32)
        img_ids = np.zeros((img_len, 3), np.float32)
        img_ids[:, 0] = float(tmax)
        img_ids[:, 1] = np.repeat(np.arange(gh, dtype=np.float32), gw)
        img_ids[:, 2] = np.tile(np.arange(gw, dtype=np.float32), gh)
        ids = jnp.asarray(np.concatenate([img_ids, text_ids], axis=0))
        rope_cos, rope_sin = rope_frequencies(
            ids, cfg.axes_dims_rope, cfg.rope_theta
        )

        temb = sinusoidal_timestep_embedding(t.astype(jnp.float32), 256)
        cvec = LoraDense(dim, name="time_embedding_1", **dd)(
            temb.astype(cfg.dtype))
        cvec = LoraDense(dim, name="time_embedding_2", **dd)(nn.silu(cvec))
        # SHARED adaLN: one global 6-way modulation for all blocks
        mods = tuple(jnp.split(
            LoraDense(6 * dim, name="adaLN_modulation", **dd)(nn.silu(cvec)),
            6, -1,
        ))

        kv_mask = jnp.concatenate(
            [jnp.ones((b, img_len), jnp.int32), text_mask.astype(jnp.int32)],
            axis=1,
        )

        from ..parallel.offload import apply_swap_split

        def apply_blocks(carry, length, name, streamed):
            b_cls = ErnieSharedAdaLNBlock
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
            )(cfg, name=name)(carry, mods, rope_cos, rope_sin, kv_mask)
            return carry

        h = apply_swap_split(h, cfg.swap_split, apply_blocks, base="layers")

        # final adaLN norm + linear over image tokens
        mod = LoraDense(2 * dim, name="final_norm_mod", **dd)(nn.silu(cvec))
        shift, scale = jnp.split(mod, 2, -1)
        h = modulate(layer_norm_no_affine(h), shift, scale)
        out = LoraDense(p * p * cfg.out_channels, name="final_linear",
                        dtype=jnp.float32, param_dtype=cfg.param_dtype)(h)
        out = out[:, :img_len]
        out = out.reshape(b, gh, gw, p, p, cfg.out_channels)
        out = jnp.einsum("bhwpqc->bchpwq", out)
        return out.reshape(b, cfg.out_channels, hh, ww)


@register_model("ernie_image")
class ErnieImagePipeline(BasePipeline):
    name = "ernie_image"
    cacheable_text_embeddings = ("text_embeds_0", "attention_mask_0")

    def __init__(self, config):
        super().__init__(config)
        mc = self.model_config
        self.tdist = TimestepDistribution.from_model_config(mc)
        self.ernie_config = self._build_config()
        self.model = ErnieImageTransformer(self.ernie_config)

    def _build_config(self) -> ErnieImageConfig:
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
        )
        for knob in ("hidden_size", "num_layers", "num_attention_heads",
                     "text_dim", "in_channels", "out_channels"):
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
            return ErnieImageConfig.tiny(**kwargs)
        return ErnieImageConfig(**kwargs)

    def init_params(self, rng):
        cfg = self.ernie_config
        return jax.jit(self.model.init)(
            rng,
            jnp.zeros((1, cfg.in_channels, 8, 8)),
            jnp.zeros((1,)),
            jnp.zeros((1, 8, cfg.text_dim)),
            jnp.ones((1, 8), jnp.int32),
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
            t=t * 1000.0,  # reference ernie_image.py:87
            text_embeds=batch["text_embeds_0"],
            text_mask=batch["attention_mask_0"].reshape(b, -1),
        )
        return model_inputs, target, mask

    def sample(self, params, width, height, key, num_steps=20,
               guidance_scale=1.0, **embeds):
        """Euler flow sampling through the training forward (reference
        CommonPipeline.sample, models/base.py:263-291). Returns latents
        [B, C, h, w]."""
        from ..training.sampling import euler_flow_sample

        te = embeds["text_embeds_0"]
        b = te.shape[0]
        c = self.ernie_config.in_channels
        h, w = height // 8, width // 8
        tmask = embeds["attention_mask_0"]

        def vel(x, t):
            return self.forward(params, dict(
                x=x.astype(self.ernie_config.dtype),
                t=t * 1000.0,  # reference ernie_image.py:87
                text_embeds=te,
                text_mask=tmask.reshape(b, -1),
            )).astype(jnp.float32)

        return euler_flow_sample(
            vel, (b, c, h, w), key, num_steps=num_steps,
            guidance_scale=guidance_scale,
            shift=self.model_config.get("shift"),
        )

    def make_pp_program(self):
        """Pipeline-parallel program (reference partitions any model via
        to_layers() + PipelineModule). See parallel/model_pp.py."""
        n_res, n_swap = self.ernie_config.swap_split
        if 0 < n_swap < self.ernie_config.num_layers:
            raise NotImplementedError(
                "partial blocks_to_swap (split block stacks) cannot be "
                "combined with pipeline_stages > 1; use blocks_to_swap >= "
                "num_layers or drop pipeline parallelism"
            )
        return _ErniePPProgram(self)

    def host_stack_names(self):
        """Exact-N blocks_to_swap (reference ernie enable_block_swap)."""
        from ..parallel.offload import swap_stack_names

        return swap_stack_names((self.ernie_config.swap_split,),
                                ("layers",))

    def forward(self, params, model_inputs):
        return self.model.apply(params, **model_inputs)

    # --- weights ------------------------------------------------------------

    def _keymap_config(self):
        return self.ernie_config

    def keymap(self):
        """Ernie-Image shared-adaLN DiT keys. Top-level module names are
        taken from the reference wrapper (models/ernie_image.py:19
        keep_in_high_precision: x_embedder, text_proj, time_embedding,
        adaLN_modulation, final_norm, final_linear; block container
        `layers`, :28). Block-internal spellings follow the LLM q/k/v/o
        convention and are flagged pending real-checkpoint verification.
        LoRA export uses the ComfyUI `diffusion_model.` prefix."""
        from .keymaps import BlockGroup, KeyMap, split_block_group

        n_res, n_swap = self.ernie_config.swap_split
        return KeyMap(
            blocks=[*split_block_group(BlockGroup(
                "layers", "layers", "num_layers",
                linears={
                    "attn_q": "attn.q_proj",
                    "attn_k": "attn.k_proj",
                    "attn_v": "attn.v_proj",
                    "attn_out": "attn.o_proj",
                    "mlp_fc1": "mlp.fc1",
                    "mlp_fc2": "mlp.fc2",
                },
                norms={"attn_q_norm": "attn.q_norm",
                       "attn_k_norm": "attn.k_norm"},
            ), n_res, n_swap)],
            top_linears={
                "x_embedder": "x_embedder",
                "text_proj": "text_proj",
                "time_embedding_1": "time_embedding.linear_1",
                "time_embedding_2": "time_embedding.linear_2",
                "adaLN_modulation": "adaLN_modulation.1",
                "final_norm_mod": "final_norm.linear",
                "final_linear": "final_linear",
            },
            lora_prefix="diffusion_model.",
        )

    def load_weights(self):
        from .keymaps import keymap_to_flax, load_sd_for_pipeline

        return keymap_to_flax(
            load_sd_for_pipeline(self), self.keymap(), self.ernie_config
        )

    def get_call_vae_fn(self):
        """Ernie-Image uses the flux2 VAE file in the reference configs
        (docs/supported_models.md:569); universal KL loader."""
        return self._generic_image_vae_fn(tiny_latent_channels=4)

    def get_call_text_encoder_fns(self):
        mc = self.model_config
        if mc.get("_tiny", False):
            from ..data.bucketing import seed_from_hash

            cfg = self.ernie_config

            def te(caps):
                embs, masks = [], []
                for cap in caps:
                    r = np.random.default_rng(seed_from_hash(cap))
                    n = min(len(cap) + 1, 8)
                    e = np.zeros((8, cfg.text_dim), np.float32)
                    e[:n] = r.standard_normal((n, cfg.text_dim))
                    m = np.zeros((8,), np.int32)
                    m[:n] = 1
                    embs.append(e)
                    masks.append(m)
                return {"text_embeds_0": np.stack(embs),
                        "attention_mask_0": np.stack(masks)}

            return [te]

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


class _ErniePPProgram:
    """PPProgram for ErnieImageTransformer (see parallel/model_pp.py).
    Payload: (h [B,Li+Lt,D], mods [B,6D] shared adaLN, cvec [B,D],
    kv_mask [B,Li+Lt])."""

    def __init__(self, pipeline):
        from ..parallel.model_pp import PPPhase

        self.pipeline = pipeline
        cfg = pipeline.ernie_config
        self.cfg = cfg
        self.phases = [PPPhase("layers", cfg.num_layers, self._apply_block)]

    def _apply_block(self, p_i, payload, ctx):
        h, mods, cvec, kv_mask = payload
        h, _ = ErnieSharedAdaLNBlock(self.cfg).apply(
            {"params": p_i}, h, tuple(jnp.split(mods, 6, -1)),
            ctx["rope_cos"], ctx["rope_sin"], kv_mask,
        )
        return (h, mods, cvec, kv_mask)

    def make_ctx(self, p_rest, mi0):
        cfg = self.cfg
        p = cfg.patch_size
        _b, _c, hh, ww = mi0["x"].shape
        gh, gw = hh // p, ww // p
        img_len = gh * gw
        tmax = mi0["text_embeds"].shape[1]
        text_ids = np.zeros((tmax, 3), np.float32)
        text_ids[:, 0] = np.arange(tmax, dtype=np.float32)
        img_ids = np.zeros((img_len, 3), np.float32)
        img_ids[:, 0] = float(tmax)
        img_ids[:, 1] = np.repeat(np.arange(gh, dtype=np.float32), gw)
        img_ids[:, 2] = np.tile(np.arange(gw, dtype=np.float32), gh)
        ids = jnp.asarray(np.concatenate([img_ids, text_ids], axis=0))
        rope_cos, rope_sin = rope_frequencies(
            ids, cfg.axes_dims_rope, cfg.rope_theta
        )
        return {"rope_cos": rope_cos, "rope_sin": rope_sin,
                "grid": (gh, gw), "hw": (hh, ww), "img_len": img_len}

    def embed(self, p_rest, mi, ctx):
        cfg = self.cfg
        dim = cfg.hidden_size
        p = cfg.patch_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        x, text_embeds, text_mask = mi["x"], mi["text_embeds"], mi["text_mask"]
        b, c = x.shape[:2]
        gh, gw = ctx["grid"]
        img_len = ctx["img_len"]

        xi = x.reshape(b, c, gh, p, gw, p)
        xi = jnp.einsum("bchpwq->bhwpqc", xi).reshape(b, img_len, p * p * c)
        img = LoraDense(dim, **dd).apply(
            {"params": p_rest["x_embedder"]}, xi.astype(cfg.dtype))
        txt = LoraDense(dim, **dd).apply(
            {"params": p_rest["text_proj"]}, text_embeds.astype(cfg.dtype))
        h = jnp.concatenate([img, txt], axis=1)

        temb = sinusoidal_timestep_embedding(mi["t"].astype(jnp.float32), 256)
        cvec = LoraDense(dim, **dd).apply(
            {"params": p_rest["time_embedding_1"]}, temb.astype(cfg.dtype))
        cvec = LoraDense(dim, **dd).apply(
            {"params": p_rest["time_embedding_2"]}, nn.silu(cvec))
        mods = LoraDense(6 * dim, **dd).apply(
            {"params": p_rest["adaLN_modulation"]}, nn.silu(cvec))
        kv_mask = jnp.concatenate(
            [jnp.ones((b, img_len), jnp.int32), text_mask.astype(jnp.int32)],
            axis=1,
        )
        return (h, mods, cvec, kv_mask)

    def head_loss(self, p_rest, payload, target, mask, ctx):
        cfg = self.cfg
        dim = cfg.hidden_size
        p = cfg.patch_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        gh, gw = ctx["grid"]
        hh, ww = ctx["hw"]
        h, _mods, cvec, _kv = payload
        b = h.shape[0]

        mod = LoraDense(2 * dim, **dd).apply(
            {"params": p_rest["final_norm_mod"]}, nn.silu(cvec))
        shift, scale = jnp.split(mod, 2, -1)
        hn = modulate(layer_norm_no_affine(h), shift, scale)
        out = LoraDense(p * p * cfg.out_channels, dtype=jnp.float32,
                        param_dtype=cfg.param_dtype).apply(
            {"params": p_rest["final_linear"]}, hn)
        out = out[:, : ctx["img_len"]]
        out = out.reshape(b, gh, gw, p, p, cfg.out_channels)
        out = jnp.einsum("bhwpqc->bchpwq", out).reshape(
            b, cfg.out_channels, hh, ww)
        return self.pipeline.loss_fn(out, target, mask)
