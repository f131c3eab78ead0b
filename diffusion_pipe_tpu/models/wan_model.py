"""Wan 2.1/2.2 DiT (WanModel) as a native Flax module.

Functionally equivalent to the reference's vendored Alibaba implementation
(models/wan/model.py: WanAttentionBlock with 3-axis RoPE self-attention +
text cross-attention + learnable 6-way modulation table, Head at
model.py:315, sinusoidal_embedding_1d at model.py:15, i2v MLPProj img_emb at
model.py:346), re-designed TPU-first:

- one dense [B, L, D] sequence per size bucket (no per-sample ragged
  padding/cu_seqlens: bucketing already guarantees equal grids, so the
  reference's varlen flash-attn packing collapses to plain dense attention
  through the Pallas kernel),
- blocks are nn.scan-stacked for flat compile time and 'stage' sharding,
- 3-axis RoPE is computed once per bucket from (f, h, w) token ids via the
  shared rope_frequencies tables (models/layers.py) — same frequencies as
  rope_params/rope_apply (model.py:28-67),
- cross-attention context is the zero-padded, MLP-embedded text (matching
  the reference's unmasked training path: wan.py:525 passes
  context_lens=None).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from .layers import (
    LoraDense,
    RMSNorm,
    apply_rope,
    remat_wrap,
    rope_frequencies,
    sinusoidal_timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class WanConfig:
    model_type: str = "t2v"          # t2v | i2v | flf2v | i2v_v2 | ti2v
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    text_len: int = 512
    in_dim: int = 16                 # 36 for i2v (latents+mask4+y16)
    dim: int = 2048
    ffn_dim: int = 8192
    freq_dim: int = 256
    text_dim: int = 4096
    out_dim: int = 16
    num_heads: int = 16
    num_layers: int = 32
    qk_norm: bool = True
    cross_attn_norm: bool = True
    eps: float = 1e-6
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
    offload_blocks: Tuple[str, ...] = ()
    # blocks_to_swap dial (reference utils/offloading.py:184 swaps exactly
    # N blocks): the DEEPEST offload_tail blocks live in a separate
    # "blocks_swap" scan whose params stream from host RAM; the first
    # num_layers - offload_tail stay HBM-resident. >= num_layers (or
    # "blocks" in offload_blocks) streams the whole single "blocks" stack
    # (layout-compatible with non-offloaded checkpoints/params).
    offload_tail: int = 0
    # remat spec for the PARTIAL "blocks_swap" scan only ("" = same as
    # `remat`). Default resolution (wan.py _build_wan_config): "attn" ->
    # "offload_attn" — a partially-swapped stack's saved flash o/lse is the
    # dominant stacked HBM buffer ([n_swap, B, H, S, D]; the 480px swap=28
    # OOM was 41% fragmentation from exactly this buffer), so it rides the
    # existing host link instead. Resident blocks keep fast HBM residuals.
    swap_remat: str = ""
    # One-block-ahead host->HBM prefetch for streamed stacks (the TPU
    # analogue of the reference's double-buffered CUDA-stream block swap,
    # utils/offloading.py:69-87): the custom-VJP scan in
    # parallel/offload.py copies block i+1 while block i computes, both
    # directions. DEFAULT OFF: once the hidden relayout recompile was
    # fixed (trainer.jit_train_step in_shardings), XLA's latency-hiding
    # scheduler already rides the use-time map_variables streams on the
    # async stream — measured 14B fp8 256px: nn.scan 5.37 s/step vs
    # prefetch 5.84 (flux swap=20: 3.89 vs 4.26), because the prefetch
    # scan's forced full-recompute backward costs more than the stall it
    # removes. True enables it anyway; "force" additionally enables it on
    # the CPU backend (tests). Requires lora_dropout == 0 (the functional
    # block apply carries no rng).
    stream_prefetch: Any = False
    # Last key-component names of the TRAINABLE leaves inside a streamed
    # stack (e.g. ("lora_a", "lora_b") under a LoRA adapter). The prefetch
    # backward emits real gradients only for these; known-frozen float
    # leaves get broadcast-zero cotangents instead of full [L, ...]-stacked
    # grads (round-4 advisor). None/() = grads for every inexact leaf
    # (full fine-tuning of a streamed stack).
    stream_grad_leaves: Tuple[str, ...] = ()
    sequence_sharding: bool = False

    @property
    def swap_split(self) -> Tuple[int, int]:
        """(resident_layers, streamed_tail_layers) after clamping. A fully
        streamed stack keeps the single-"blocks" layout; only a PARTIAL
        tail introduces the separate "blocks_swap" collection."""
        if "blocks" in self.offload_blocks or \
                self.offload_tail >= self.num_layers > 0:
            return (0, self.num_layers)
        n = max(0, int(self.offload_tail))
        return (self.num_layers - n, n)

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def rope_axes_dim(self) -> Tuple[int, int, int]:
        """Per-axis rotary dims (t, h, w); model.py:478-485: with c = d//2,
        splits are (c - 2*(c//3), c//3, c//3) complex pairs."""
        c = self.head_dim // 2
        return (2 * (c - 2 * (c // 3)), 2 * (c // 3), 2 * (c // 3))

    @property
    def lora_kwargs(self) -> dict:
        return dict(
            lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            lora_dropout=self.lora_dropout, lora_dtype=self.lora_dtype,
            lora_type=self.lora_type, lokr_factor=self.lokr_factor,
            lokr_rank_dropout=self.lokr_rank_dropout,
        )

    @staticmethod
    def t2v_14b(**kw):
        d = dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40)
        d.update(kw)
        return WanConfig(**d)

    @staticmethod
    def t2v_1_3b(**kw):
        d = dict(dim=1536, ffn_dim=8960, num_heads=12, num_layers=30)
        d.update(kw)
        return WanConfig(**d)

    @staticmethod
    def tiny(**kw):
        d = dict(
            dim=64, ffn_dim=128, num_heads=4, num_layers=2, freq_dim=32,
            text_dim=32, text_len=16, dtype=jnp.float32,
            param_dtype=jnp.float32,
        )
        d.update(kw)
        return WanConfig(**d)


def _layer_norm(x, eps, scale=None, bias=None):
    """WanLayerNorm: f32 layer norm, optional affine (model.py:90-101)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


class WanAttentionBlock(nn.Module):
    config: WanConfig

    @nn.compact
    def __call__(self, x, e0, rope_cos, rope_sin, context):
        """x: [B, L, D]; e0: [B, 1 or L, 6, D]; context: [B, Lc, D]."""
        cfg = self.config
        dim = cfg.dim
        heads = cfg.num_heads
        hd = cfg.head_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  kernel_dtype=cfg.base_kernel_dtype,
                  int8_matmul=cfg.int8_matmul)
        lora = cfg.lora_kwargs
        b, s, _ = x.shape

        modulation = self.param(
            "modulation",
            lambda key, shape: jax.random.normal(key, shape) / dim**0.5,
            (1, 6, dim),
        )
        # [B, L1, 6, D] broadcast add (model.py:292)
        e = (modulation[None].astype(jnp.float32)
             + e0.astype(jnp.float32))
        e1, e2, e3, e4, e5, e6 = [e[:, :, i] for i in range(6)]

        def rms(name, y):
            # WanRMSNorm over the FULL model dim, pre-head-reshape
            # (model.py:139-141: norm_q(self.q(x)) then .view(b,s,n,d))
            if not cfg.qk_norm:
                return y
            return RMSNorm(eps=cfg.eps, dtype=cfg.dtype,
                           param_dtype=cfg.param_dtype, name=name)(y)

        # --- self attention with 3-axis rope
        x_n = _layer_norm(x, cfg.eps).astype(jnp.float32)
        x_mod = (x_n * (1 + e2) + e1).astype(cfg.dtype)
        q = rms("self_attn_norm_q",
                LoraDense(dim, name="self_attn_q", kernel_axes=(None, "tensor"),
                          **dd, **lora)(x_mod)).reshape(b, s, heads, hd)
        k = rms("self_attn_norm_k",
                LoraDense(dim, name="self_attn_k", kernel_axes=(None, "tensor"),
                          **dd, **lora)(x_mod)).reshape(b, s, heads, hd)
        v = LoraDense(dim, name="self_attn_v", kernel_axes=(None, "tensor"),
                      **dd, **lora)(x_mod).reshape(b, s, heads, hd)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        y = dot_product_attention(q, k, v).reshape(b, s, dim)
        y = LoraDense(dim, name="self_attn_o", kernel_axes=("tensor", None),
                      **dd, **lora)(y)
        x = x + (y.astype(jnp.float32) * e3).astype(x.dtype)

        # --- cross attention (+ separate image branch for wan2.1 i2v)
        if cfg.cross_attn_norm:
            scale = self.param("norm3_scale", nn.initializers.ones_init(),
                               (dim,), cfg.param_dtype)
            bias = self.param("norm3_bias", nn.initializers.zeros_init(),
                              (dim,), cfg.param_dtype)
            x_c = _layer_norm(x, cfg.eps, scale, bias)
        else:
            x_c = _layer_norm(x, cfg.eps)
        qc = rms("cross_attn_norm_q",
                 LoraDense(dim, name="cross_attn_q",
                           kernel_axes=(None, "tensor"), **dd, **lora)(x_c)
                 ).reshape(b, s, heads, hd)
        is_i2v_cross = cfg.model_type in ("i2v", "flf2v")
        if is_i2v_cross:
            n_img = 257 * (2 if cfg.model_type == "flf2v" else 1)
            ctx_img, ctx_txt = context[:, :n_img], context[:, n_img:]
        else:
            ctx_txt = context
        lc = ctx_txt.shape[1]
        kc = rms("cross_attn_norm_k",
                 LoraDense(dim, name="cross_attn_k",
                           kernel_axes=(None, "tensor"), **dd, **lora)(ctx_txt)
                 ).reshape(b, lc, heads, hd)
        vc = LoraDense(dim, name="cross_attn_v", kernel_axes=(None, "tensor"),
                       **dd, **lora)(ctx_txt).reshape(b, lc, heads, hd)
        y = dot_product_attention(qc, kc, vc).reshape(b, s, dim)
        if is_i2v_cross:
            li = ctx_img.shape[1]
            ki = rms("cross_attn_norm_k_img",
                     LoraDense(dim, name="cross_attn_k_img",
                               kernel_axes=(None, "tensor"), **dd, **lora)(
                         ctx_img)).reshape(b, li, heads, hd)
            vi = LoraDense(dim, name="cross_attn_v_img",
                           kernel_axes=(None, "tensor"), **dd, **lora)(
                ctx_img).reshape(b, li, heads, hd)
            y = y + dot_product_attention(qc, ki, vi).reshape(b, s, dim)
        y = LoraDense(dim, name="cross_attn_o", kernel_axes=("tensor", None),
                      **dd, **lora)(y)
        x = x + y

        # --- ffn
        x_n = _layer_norm(x, cfg.eps).astype(jnp.float32)
        x_mod = (x_n * (1 + e5) + e4).astype(cfg.dtype)
        y = LoraDense(cfg.ffn_dim, name="ffn_in", kernel_axes=(None, "tensor"),
                      **dd, **lora)(x_mod)
        y = nn.gelu(y, approximate=True)
        y = LoraDense(dim, name="ffn_out", kernel_axes=("tensor", None),
                      **dd, **lora)(y)
        x = x + (y.astype(jnp.float32) * e6).astype(x.dtype)
        # nn.scan convention: (carry, out)
        return x, None


class WanTransformer(nn.Module):
    """Full Wan DiT over one dense size bucket."""

    config: WanConfig

    @nn.compact
    def __call__(
        self,
        x,          # [B, C, F, H, W] latents (+concat cond channels for i2v)
        t,          # [B] in [0, 1000] (reference wan.py:369 scales by 1000)
        context,    # [B, text_len, text_dim] zero-padded T5 features
        clip_fea: Optional[jax.Array] = None,  # [B, 257(*2), 1280] for i2v
    ):
        cfg = self.config
        dim = cfg.dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, c, f, h, w = x.shape
        pt, ph, pw = cfg.patch_size
        gf, gh, gw = f // pt, h // ph, w // pw
        seq_len = gf * gh * gw

        # patch embedding: Conv3d k=s=patch -> equivalent to patch reshape +
        # dense on (C*pt*ph*pw); keep a Conv for weight-layout parity
        xe = jnp.transpose(x, (0, 2, 3, 4, 1)).astype(cfg.dtype)  # B F H W C
        xe = nn.Conv(
            dim, kernel_size=cfg.patch_size, strides=cfg.patch_size,
            padding="VALID", dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="patch_embedding",
        )(xe)  # [B, gf, gh, gw, dim]
        xe = xe.reshape(b, seq_len, dim)
        if cfg.sequence_sharding:
            # sequence parallelism: token dim sharded over 'tensor' between
            # attention ops — GSPMD partitions the per-token linears/norms
            # and inserts the gathers the attention kernel needs (same
            # scheme as flux, flux_model.py seq_shard). At 21.5k video
            # tokens this is the activation-memory lever for multi-chip.
            from jax.sharding import PartitionSpec as P

            try:
                xe = jax.lax.with_sharding_constraint(
                    xe, P("data", "tensor", None))
            except RuntimeError:
                pass  # no mesh in context (single-chip init)

        # time embedding (f32, model.py:485-488)
        temb = sinusoidal_timestep_embedding(t, cfg.freq_dim)
        temb = LoraDense(dim, name="time_embedding_1", dtype=jnp.float32,
                         param_dtype=cfg.param_dtype)(temb)
        temb = nn.silu(temb)
        e = LoraDense(dim, name="time_embedding_2", dtype=jnp.float32,
                      param_dtype=cfg.param_dtype)(temb)  # [B, dim]
        e0 = LoraDense(6 * dim, name="time_projection", dtype=jnp.float32,
                       param_dtype=cfg.param_dtype)(nn.silu(e))
        e0 = e0.reshape(b, 1, 6, dim)

        # text embedding MLP on zero-padded context (wan.py:497-503)
        ctx = LoraDense(dim, name="text_embedding_1", **dd)(
            context.astype(cfg.dtype)
        )
        ctx = nn.gelu(ctx, approximate=True)
        ctx = LoraDense(dim, name="text_embedding_2", **dd)(ctx)

        if cfg.model_type in ("i2v", "flf2v"):
            assert clip_fea is not None
            ci = _layer_norm(clip_fea.astype(cfg.dtype), 1e-5,
                             self.param("img_emb_norm1_scale",
                                        nn.initializers.ones_init(), (1280,),
                                        cfg.param_dtype),
                             self.param("img_emb_norm1_bias",
                                        nn.initializers.zeros_init(), (1280,),
                                        cfg.param_dtype))
            ci = LoraDense(1280, name="img_emb_1", **dd)(ci)
            ci = nn.gelu(ci)
            ci = LoraDense(dim, name="img_emb_2", **dd)(ci)
            ci = _layer_norm(ci, 1e-5,
                             self.param("img_emb_norm2_scale",
                                        nn.initializers.ones_init(), (dim,),
                                        cfg.param_dtype),
                             self.param("img_emb_norm2_bias",
                                        nn.initializers.zeros_init(), (dim,),
                                        cfg.param_dtype))
            ctx = jnp.concatenate([ci, ctx], axis=1)

        # 3-axis rope ids over the (gf, gh, gw) grid
        fi = jnp.repeat(jnp.arange(gf), gh * gw)
        hi = jnp.tile(jnp.repeat(jnp.arange(gh), gw), gf)
        wi = jnp.tile(jnp.arange(gw), gf * gh)
        ids = jnp.stack([fi, hi, wi], axis=-1)
        rope_cos, rope_sin = rope_frequencies(ids, cfg.rope_axes_dim)

        n_res, n_swap = cfg.swap_split

        def _scan(block_cls, length, name, streamed):
            b = block_cls
            if streamed:
                from ..parallel.offload import stream_params_from_host

                b = stream_params_from_host(b)
            remat = (cfg.swap_remat or cfg.remat) if name == "blocks_swap" \
                else cfg.remat
            if remat:
                b = remat_wrap(b, remat)
            return nn.scan(
                b,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                length=length,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )(cfg, name=name)

        # streamed stacks: one-block-ahead prefetch when enabled (see
        # WanConfig.stream_prefetch); params must already exist, so the
        # init pass always takes the nn.scan path (identical layout)
        use_prefetch = bool(
            cfg.stream_prefetch and not self.is_initializing()
            and cfg.lora_dropout == 0.0
            and (jax.default_backend() != "cpu"
                 or cfg.stream_prefetch == "force")
        )

        def _stream_prefetched(name, length, x):
            from ..parallel.offload import prefetch_stream_scan

            storage = self.scope.get_variable("params", name)
            assert storage, f"streamed stack {name!r} has no params"
            # nn.scan's PARTITION_NAME metadata boxes leaves in Partitioned;
            # unboxing is pytree-transparent so cotangents flow back intact
            storage = nn.unbox(storage)
            blk = WanAttentionBlock(cfg, parent=None)
            return prefetch_stream_scan(
                blk, storage, x, (e0, rope_cos, rope_sin, ctx), length,
                move=jax.default_backend() != "cpu",
                grad_leaves=cfg.stream_grad_leaves or None,
            )

        if n_swap == cfg.num_layers:
            # whole stack streamed: single-"blocks" layout preserved
            if use_prefetch:
                xe = _stream_prefetched("blocks", cfg.num_layers, xe)
            else:
                xe, _ = _scan(WanAttentionBlock, cfg.num_layers, "blocks",
                              True)(xe, e0, rope_cos, rope_sin, ctx)
        else:
            xe, _ = _scan(WanAttentionBlock, n_res, "blocks",
                          False)(xe, e0, rope_cos, rope_sin, ctx)
            if n_swap:
                # blocks_to_swap dial: only the DEEPEST n_swap blocks
                # stream from host (reference utils/offloading.py:184)
                if use_prefetch:
                    xe = _stream_prefetched("blocks_swap", n_swap, xe)
                else:
                    xe, _ = _scan(WanAttentionBlock, n_swap, "blocks_swap",
                                  True)(xe, e0, rope_cos, rope_sin, ctx)

        # head (model.py:315-341): modulation table [1,2,dim] + e
        head_mod = self.param(
            "head_modulation",
            lambda key, shape: jax.random.normal(key, shape) / dim**0.5,
            (1, 2, dim),
        )
        he = head_mod[None].astype(jnp.float32) + e[:, None, None, :]
        h1, h2 = he[:, :, 0], he[:, :, 1]
        xf = _layer_norm(xe, cfg.eps).astype(jnp.float32)
        xf = xf * (1 + h2) + h1
        out = LoraDense(
            math.prod(cfg.patch_size) * cfg.out_dim, name="head",
            dtype=jnp.float32, param_dtype=cfg.param_dtype,
        )(xf)

        # unpatchify [B, L, pt*ph*pw*c_out] -> [B, c_out, F, H, W]
        out = out.reshape(b, gf, gh, gw, pt, ph, pw, cfg.out_dim)
        out = jnp.einsum("bfhwpqrc->bcfphqwr", out)
        return out.reshape(b, cfg.out_dim, gf * pt, gh * ph, gw * pw)
