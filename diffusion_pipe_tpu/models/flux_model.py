"""Flux DiT (dev/schnell/Kontext) as a native Flax module.

Functionally equivalent to diffusers FluxTransformer2DModel as driven by the
reference (models/flux.py:454-546 wrappers: separate txt/img streams through
19 double + 38 single blocks, timestep*1000 embedding, joint attention over
concat[txt, img] with multi-axis RoPE from cat(txt_ids, img_ids), final
truncation to img_seq_len). Re-designed TPU-first:

- blocks are `nn.scan`-stacked (params have a leading [L] axis) so XLA traces
  one block, compile time stays flat, and the pipeline layer can shard the
  block axis across the 'stage' mesh axis (SURVEY.md section 7.1).
- attention runs through ops.attention (Pallas flash kernel on TPU) with a
  kv-validity mask for padded text instead of CUDA varlen packing.
- LoRA lives inside LoraDense on every linear in the blocks (the reference's
  adapter_target_modules = [FluxTransformerBlock, FluxSingleTransformerBlock]).
- tensor-parallel kernel axes: qkv/mlp-in column-split, out/mlp-down
  row-split over the 'tensor' mesh axis.

Weight-key mapping to/from diffusers & BFL formats lives in flux.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from .layers import (
    LoraDense,
    PixArtAlphaTextProjection,
    RMSNorm,
    TimestepEmbedder,
    apply_rope,
    layer_norm_no_affine,
    modulate,
    remat_wrap,
    rope_frequencies,
)

Dtype = Any


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64
    out_channels: int = 64
    num_layers: int = 19          # double (MMDiT) blocks
    num_single_layers: int = 38   # single-stream blocks
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096  # T5 features
    pooled_projection_dim: int = 768  # CLIP pooled
    guidance_embeds: bool = True      # dev: True, schnell: False
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    rope_theta: float = 10000.0
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16
    # Storage dtype for block linear kernels (fp8 weight storage, reference
    # models/flux.py:201-203 with KEEP_IN_HIGH_PRECISION embedders/norms/head).
    base_kernel_dtype: Any = None
    lora_rank: int = 0
    lora_alpha: float = 0.0
    lora_dropout: float = 0.0
    lora_dtype: Any = jnp.float32
    lora_type: str = "lora"
    lokr_factor: int = -1
    lokr_rank_dropout: float = 0.0
    remat: bool = False
    # dynamic W8A8 int8 compute on frozen block kernels (opt-in speed mode)
    int8_matmul: bool = False
    # 'full' recomputes everything; 'dots' saves matmul outputs and
    # recomputes only elementwise ops (jax dots_with_no_batch_dims_saveable)
    remat_policy: str = "full"
    # block stacks whose frozen params live in host RAM and stream per
    # iteration (TPU block-swap analogue, parallel/offload.py)
    offload_blocks: Tuple[str, ...] = ()
    # Exact-N blocks_to_swap (reference utils/offloading.py:184 swaps
    # exactly N per stack; flux splits N as double = N//2,
    # single = (N - N//2)*2 + 1, reference models/flux.py:404-418): the
    # DEEPEST offload_tail_* blocks of each stack live in a separate
    # "<stack>_swap" scan streamed from host RAM while the rest stay
    # HBM-resident. A tail >= the stack size streams the whole stack under
    # its original name (single-stack checkpoint layout preserved).
    offload_tail_double: int = 0
    offload_tail_single: int = 0
    # One-block-ahead host->HBM prefetch for streamed stacks (the custom-
    # VJP scan in parallel/offload.py). DEFAULT OFF — measured slower
    # than the nn.scan use-time streaming once the relayout recompile was
    # fixed (see WanConfig.stream_prefetch); config-selectable.
    stream_prefetch: Any = False
    # trainable leaf names inside streamed stacks (see WanConfig)
    stream_grad_leaves: Tuple[str, ...] = ()
    # shard activations along the token dim over 'tensor' between attention
    # ops (sequence parallelism via GSPMD; XLA inserts the gathers around
    # attention). The reference has no SP (SURVEY.md section 2.7).
    sequence_sharding: bool = False

    @property
    def hidden_size(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @staticmethod
    def _swap_split(n: int, tail: int) -> Tuple[int, int]:
        """(resident, swapped) block counts; tail >= n keeps the whole
        stack streamed under the original collection name."""
        if tail <= 0 or n <= 0:
            return (n, 0)
        if tail >= n:
            return (0, n)
        return (n - tail, tail)

    @property
    def double_split(self) -> Tuple[int, int]:
        tail = self.offload_tail_double
        if "double_blocks" in self.offload_blocks:
            tail = self.num_layers
        return self._swap_split(self.num_layers, tail)

    @property
    def single_split(self) -> Tuple[int, int]:
        tail = self.offload_tail_single
        if "single_blocks" in self.offload_blocks:
            tail = self.num_single_layers
        return self._swap_split(self.num_single_layers, tail)

    # keymap block-count attrs (BlockGroup.num_layers_attr)
    @property
    def num_double_res(self) -> int:
        return self.double_split[0]

    @property
    def num_double_swap(self) -> int:
        return self.double_split[1]

    @property
    def num_single_res(self) -> int:
        return self.single_split[0]

    @property
    def num_single_swap(self) -> int:
        return self.single_split[1]

    @property
    def lora_kwargs(self) -> dict:
        return dict(
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_dropout=self.lora_dropout,
            lora_dtype=self.lora_dtype,
            lora_type=self.lora_type,
            lokr_factor=self.lokr_factor,
            lokr_rank_dropout=self.lokr_rank_dropout,
        )

    @staticmethod
    def tiny(**kw) -> "FluxConfig":
        """Small config for tests."""
        defaults = dict(
            in_channels=64,   # 16 latent channels x 2x2 packing
            out_channels=64,
            num_layers=2,
            num_single_layers=2,
            attention_head_dim=32,
            num_attention_heads=4,
            joint_attention_dim=64,
            pooled_projection_dim=32,
            axes_dims_rope=(8, 12, 12),
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )
        defaults.update(kw)
        return FluxConfig(**defaults)


class FluxDoubleBlock(nn.Module):
    """MMDiT block: separate img/txt streams, joint attention."""

    config: FluxConfig

    @nn.compact
    def __call__(self, carry, temb, rope_cos, rope_sin, txt_mask):
        # nn.scan convention: (carry, *broadcast) -> (carry, out)
        img, txt = carry
        cfg = self.config
        dim = cfg.hidden_size
        heads = cfg.num_attention_heads
        hd = cfg.attention_head_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  kernel_dtype=cfg.base_kernel_dtype,
                  int8_matmul=cfg.int8_matmul)
        lora = cfg.lora_kwargs

        # adaLN-Zero: SiLU(temb) -> Linear -> 6 chunks, per stream
        mod_img = LoraDense(6 * dim, name="norm1_linear", **dd, **lora)(
            nn.silu(temb)
        )
        mod_txt = LoraDense(6 * dim, name="norm1_context_linear", **dd, **lora)(
            nn.silu(temb)
        )
        (i_shift_msa, i_scale_msa, i_gate_msa,
         i_shift_mlp, i_scale_mlp, i_gate_mlp) = jnp.split(mod_img, 6, axis=-1)
        (t_shift_msa, t_scale_msa, t_gate_msa,
         t_shift_mlp, t_scale_mlp, t_gate_mlp) = jnp.split(mod_txt, 6, axis=-1)

        img_n = modulate(layer_norm_no_affine(img), i_shift_msa, i_scale_msa)
        txt_n = modulate(layer_norm_no_affine(txt), t_shift_msa, t_scale_msa)

        def qkv(x, prefix):
            q = LoraDense(dim, name=f"{prefix}_q", kernel_axes=(None, "tensor"),
                          **dd, **lora)(x)
            k = LoraDense(dim, name=f"{prefix}_k", kernel_axes=(None, "tensor"),
                          **dd, **lora)(x)
            v = LoraDense(dim, name=f"{prefix}_v", kernel_axes=(None, "tensor"),
                          **dd, **lora)(x)
            b, s = x.shape[:2]
            return (y.reshape(b, s, heads, hd) for y in (q, k, v))

        iq, ik, iv = qkv(img_n, "attn_to")
        tq, tk, tv = qkv(txt_n, "attn_add")

        iq = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="attn_norm_q")(iq)
        ik = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="attn_norm_k")(ik)
        tq = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="attn_norm_added_q")(tq)
        tk = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="attn_norm_added_k")(tk)

        # joint sequence: [txt, img] (diffusers order; rope ids match)
        q = jnp.concatenate([tq, iq], axis=1)
        k = jnp.concatenate([tk, ik], axis=1)
        v = jnp.concatenate([tv, iv], axis=1)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)

        kv_mask = None
        if txt_mask is not None:
            img_valid = jnp.ones(
                (img.shape[0], img.shape[1]), dtype=jnp.int32
            )
            kv_mask = jnp.concatenate(
                [txt_mask.astype(jnp.int32), img_valid], axis=1
            )
        attn = dot_product_attention(q, k, v, kv_mask)
        b, s = attn.shape[:2]
        attn = attn.reshape(b, s, dim)
        txt_len = txt.shape[1]
        txt_attn, img_attn = attn[:, :txt_len], attn[:, txt_len:]

        img_attn = LoraDense(dim, name="attn_to_out",
                             kernel_axes=("tensor", None), **dd, **lora)(img_attn)
        txt_attn = LoraDense(dim, name="attn_to_add_out",
                             kernel_axes=("tensor", None), **dd, **lora)(txt_attn)

        img = img + i_gate_msa[:, None, :] * img_attn
        txt = txt + t_gate_msa[:, None, :] * txt_attn

        mlp_dim = int(dim * cfg.mlp_ratio)
        img_m = modulate(layer_norm_no_affine(img), i_shift_mlp, i_scale_mlp)
        img_m = LoraDense(mlp_dim, name="ff_in", kernel_axes=(None, "tensor"),
                          **dd, **lora)(img_m)
        img_m = nn.gelu(img_m, approximate=True)
        img_m = LoraDense(dim, name="ff_out", kernel_axes=("tensor", None),
                          **dd, **lora)(img_m)
        img = img + i_gate_mlp[:, None, :] * img_m

        txt_m = modulate(layer_norm_no_affine(txt), t_shift_mlp, t_scale_mlp)
        txt_m = LoraDense(mlp_dim, name="ff_context_in",
                          kernel_axes=(None, "tensor"), **dd, **lora)(txt_m)
        txt_m = nn.gelu(txt_m, approximate=True)
        txt_m = LoraDense(dim, name="ff_context_out",
                          kernel_axes=("tensor", None), **dd, **lora)(txt_m)
        txt = txt + t_gate_mlp[:, None, :] * txt_m
        return (img, txt), None


class FluxSingleBlock(nn.Module):
    """Single-stream DiT block over the joint [txt, img] sequence."""

    config: FluxConfig

    @nn.compact
    def __call__(self, x, temb, rope_cos, rope_sin, kv_mask):
        cfg = self.config
        dim = cfg.hidden_size
        heads = cfg.num_attention_heads
        hd = cfg.attention_head_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  kernel_dtype=cfg.base_kernel_dtype,
                  int8_matmul=cfg.int8_matmul)
        lora = cfg.lora_kwargs

        mod = LoraDense(3 * dim, name="norm_linear", **dd, **lora)(nn.silu(temb))
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        x_n = modulate(layer_norm_no_affine(x), shift, scale)

        q = LoraDense(dim, name="attn_to_q", kernel_axes=(None, "tensor"),
                      **dd, **lora)(x_n)
        k = LoraDense(dim, name="attn_to_k", kernel_axes=(None, "tensor"),
                      **dd, **lora)(x_n)
        v = LoraDense(dim, name="attn_to_v", kernel_axes=(None, "tensor"),
                      **dd, **lora)(x_n)
        b, s = x.shape[:2]
        q = q.reshape(b, s, heads, hd)
        k = k.reshape(b, s, heads, hd)
        v = v.reshape(b, s, heads, hd)
        q = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="attn_norm_q")(q)
        k = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="attn_norm_k")(k)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        attn = dot_product_attention(q, k, v, kv_mask).reshape(b, s, dim)

        mlp_dim = int(dim * cfg.mlp_ratio)
        mlp = LoraDense(mlp_dim, name="proj_mlp", kernel_axes=(None, "tensor"),
                        **dd, **lora)(x_n)
        mlp = nn.gelu(mlp, approximate=True)

        out = LoraDense(dim, name="proj_out", kernel_axes=("tensor", None),
                        **dd, **lora)(
            jnp.concatenate([attn, mlp], axis=-1)
        )
        return x + gate[:, None, :] * out, None


class FluxTransformer(nn.Module):
    """Full flux DiT. Inputs mirror the reference's layer plumbing
    (models/flux.py:461-485)."""

    config: FluxConfig

    def setup(self):
        cfg = self.config
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        self.x_embedder = LoraDense(dim, **dd)
        self.context_embedder = LoraDense(dim, **dd)
        self.timestep_embedder = TimestepEmbedder(dim, **dd)
        if cfg.guidance_embeds:
            self.guidance_embedder = TimestepEmbedder(dim, **dd)
        self.text_embedder = PixArtAlphaTextProjection(dim, **dd)

        def _scan(block_cls, length, name, streamed):
            b = block_cls
            if streamed:
                from ..parallel.offload import stream_params_from_host

                b = stream_params_from_host(b)
            if cfg.remat:
                b = remat_wrap(b, cfg.remat)
            return nn.scan(
                b,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                length=length,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )(cfg, name=name)

        # exact-N blocks_to_swap: the deepest n_swap blocks of each stack
        # live in a separate streamed "<stack>_swap" scan (reference
        # utils/offloading.py:184); whole-stack streaming keeps the
        # original single-collection layout.
        d_res, d_swap = cfg.double_split
        self.double_blocks = _scan(
            FluxDoubleBlock, d_res or cfg.num_layers, "double_blocks",
            streamed=(d_swap == cfg.num_layers),
        )
        self.double_blocks_swap = (
            _scan(FluxDoubleBlock, d_swap, "double_blocks_swap", True)
            if 0 < d_swap < cfg.num_layers else None
        )
        s_res, s_swap = cfg.single_split
        self.single_blocks = _scan(
            FluxSingleBlock, s_res or cfg.num_single_layers, "single_blocks",
            streamed=(s_swap == cfg.num_single_layers),
        )
        self.single_blocks_swap = (
            _scan(FluxSingleBlock, s_swap, "single_blocks_swap", True)
            if 0 < s_swap < cfg.num_single_layers else None
        )

        self.norm_out_linear = LoraDense(2 * dim, **dd)
        self.proj_out = LoraDense(cfg.out_channels, **dd)

    def time_text_embed(self, timestep, guidance, pooled):
        """timestep/guidance already in [0,1]; x1000 like reference
        models/flux.py:471-472."""
        cfg = self.config
        temb = self.timestep_embedder(timestep.astype(jnp.float32) * 1000.0)
        if cfg.guidance_embeds and guidance is not None:
            temb = temb + self.guidance_embedder(
                guidance.astype(jnp.float32) * 1000.0
            )
        temb = temb + self.text_embedder(pooled.astype(cfg.dtype))
        return temb

    def __call__(
        self,
        hidden_states,          # [B, S_img, in_channels] packed 2x2 latents
        encoder_hidden_states,  # [B, S_txt, joint_attention_dim] T5 embeds
        pooled_projections,     # [B, pooled_projection_dim] CLIP pooled
        timestep,               # [B] in [0, 1]
        img_ids,                # [S_img, 3]
        txt_ids,                # [S_txt, 3]
        guidance=None,          # [B] or None
        txt_mask=None,          # [B, S_txt] optional text validity
        img_seq_len: Optional[int] = None,  # output length (Kontext truncation)
    ):
        cfg = self.config

        def seq_shard(y):
            if not cfg.sequence_sharding:
                return y
            from jax.sharding import PartitionSpec as P

            try:
                return jax.lax.with_sharding_constraint(
                    y, P("data", "tensor", None)
                )
            except RuntimeError:
                return y  # no mesh in context (e.g. single-chip init)

        img = seq_shard(self.x_embedder(hidden_states))
        txt = seq_shard(self.context_embedder(encoder_hidden_states))
        temb = nn.silu(self.time_text_embed(timestep, guidance, pooled_projections))

        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        rope_cos, rope_sin = rope_frequencies(
            ids, cfg.axes_dims_rope, cfg.rope_theta
        )
        rope_cos = rope_cos.astype(jnp.float32)
        rope_sin = rope_sin.astype(jnp.float32)

        # streamed stacks take the one-block-ahead prefetch scan (same
        # wiring as wan_model._stream_prefetched; params already exist,
        # so init always goes through the nn.scan modules — identical
        # param layout either way)
        use_prefetch = bool(
            cfg.stream_prefetch and not self.is_initializing()
            and cfg.lora_dropout == 0.0
            and (jax.default_backend() != "cpu"
                 or cfg.stream_prefetch == "force")
        )

        def _prefetched(name, block_cls, length, carry, bc):
            from ..parallel.offload import prefetch_stream_scan

            storage = nn.unbox(self.scope.get_variable("params", name))
            blk = block_cls(cfg, parent=None)
            return prefetch_stream_scan(
                blk, storage, carry, bc, length,
                move=jax.default_backend() != "cpu",
                grad_leaves=cfg.stream_grad_leaves or None,
            )

        d_res, d_swap = cfg.double_split
        bc_d = (temb, rope_cos, rope_sin, txt_mask)
        if use_prefetch and d_swap == cfg.num_layers:
            img, txt = _prefetched("double_blocks", FluxDoubleBlock,
                                   cfg.num_layers, (img, txt), bc_d)
        else:
            (img, txt), _ = self.double_blocks(
                (img, txt), temb, rope_cos, rope_sin, txt_mask
            )
            if self.double_blocks_swap is not None:
                if use_prefetch:
                    img, txt = _prefetched(
                        "double_blocks_swap", FluxDoubleBlock, d_swap,
                        (img, txt), bc_d)
                else:
                    (img, txt), _ = self.double_blocks_swap(
                        (img, txt), temb, rope_cos, rope_sin, txt_mask
                    )

        x = seq_shard(jnp.concatenate([txt, img], axis=1))
        kv_mask = None
        if txt_mask is not None:
            kv_mask = jnp.concatenate(
                [txt_mask.astype(jnp.int32),
                 jnp.ones((img.shape[0], img.shape[1]), jnp.int32)],
                axis=1,
            )
        s_res, s_swap = cfg.single_split
        bc_s = (temb, rope_cos, rope_sin, kv_mask)
        if use_prefetch and s_swap == cfg.num_single_layers:
            x = _prefetched("single_blocks", FluxSingleBlock,
                            cfg.num_single_layers, x, bc_s)
        else:
            x, _ = self.single_blocks(x, temb, rope_cos, rope_sin, kv_mask)
            if self.single_blocks_swap is not None:
                if use_prefetch:
                    x = _prefetched("single_blocks_swap", FluxSingleBlock,
                                    s_swap, x, bc_s)
                else:
                    x, _ = self.single_blocks_swap(x, temb, rope_cos,
                                                   rope_sin, kv_mask)

        txt_len = txt.shape[1]
        out = x[:, txt_len:]
        if img_seq_len is not None:
            out = out[:, :img_seq_len]
        # AdaLayerNormContinuous: x*(1+scale)+shift with LN (no affine);
        # diffusers chunk order is (SCALE, shift) — matters for converted
        # pretrained weights
        mod = self.norm_out_linear(nn.silu(temb))
        scale, shift = jnp.split(mod, 2, axis=-1)
        out = modulate(layer_norm_no_affine(out), shift, scale)
        return self.proj_out(out)
