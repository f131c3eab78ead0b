"""HiDream-I1 model + pipeline (reference models/hidream.py).

Pipeline contract is faithful to the reference (hidream.py:183-260):
rectified flow with TARGET = latents - noise (sign-flipped vs flux,
hidream.py:254-256), timesteps t*1000, pre-patchified 2x2 tokens, pooled
CLIP-L+G concat, T5 features, and Llama-3.1-8B hidden states computed
IN-GRAPH (the reference keeps the Llama resident as a pipeline layer,
hidream.py:326-349; here it is a transformers Flax module applied inside
the forward). Each transformer block consumes its own Llama layer's hidden
state concatenated with the T5 features.

Model core is the HiDream MMDiT shape: 16 dual-stream + 32 single-stream
blocks at 2560 (20 heads x 128) with **MoE feed-forwards** (top-2 routed
experts + a shared expert). Expert kernels carry a leading 'tensor'-axis
partition annotation, giving expert parallelism on the mesh. Verify gate /
expert-count details against pretrained checkpoints before converted-weight
training.
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
from .flux import latent_image_ids, pack_latents, resize_mask_to_latents
from .layers import (
    LoraDense,
    RMSNorm,
    apply_rope,
    layer_norm_no_affine,
    remat_spec,
    remat_wrap,
    rope_frequencies,
    sinusoidal_timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class HiDreamConfig:
    in_channels: int = 64
    out_channels: int = 64
    hidden_size: int = 2560
    num_heads: int = 20
    num_double_layers: int = 16
    num_single_layers: int = 32
    t5_dim: int = 4096
    llama_dim: int = 4096
    pooled_dim: int = 2048       # CLIP-L (768) + CLIP-G (1280)
    num_routed_experts: int = 4
    num_activated_experts: int = 2
    mlp_ratio: float = 4.0
    # per-block llama hidden-state selection (index into the cached
    # [B, L, S, D] states); None = cycle i % L (hi_diffusers llama_layers)
    llama_layers: Any = None
    axes_dims_rope: Any = (32, 48, 48)
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
    # Exact-N blocks_to_swap (reference hidream.py:275-295 enable_block_swap:
    # double = N//2, single = (N - N//2)*2 + 1 like flux/hunyuan)
    offload_tail_double: int = 0
    offload_tail_single: int = 0

    @property
    def double_split(self):
        from ..parallel.offload import swap_split_of

        return swap_split_of(self.num_double_layers,
                             self.offload_tail_double)

    @property
    def single_split(self):
        from ..parallel.offload import swap_split_of

        return swap_split_of(self.num_single_layers,
                             self.offload_tail_single)

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
        d = dict(hidden_size=32, num_heads=2, num_double_layers=2,
                 num_single_layers=2, t5_dim=16, llama_dim=24, pooled_dim=16,
                 axes_dims_rope=(4, 6, 6), dtype=jnp.float32,
                 param_dtype=jnp.float32)
        d.update(kw)
        return HiDreamConfig(**d)


def swiglu_hidden(dim: int, mlp_ratio: float, multiple_of: int = 256) -> int:
    """FeedForwardSwiGLU hidden width: int(2/3 * dim*ratio) rounded up to
    `multiple_of` (the hi_diffusers FeedForwardSwiGLU rule)."""
    h = int(2 * int(dim * mlp_ratio) / 3)
    return multiple_of * ((h + multiple_of - 1) // multiple_of)


class MoEFeedForward(nn.Module):
    """Top-k routed SwiGLU experts + a shared expert (hi_diffusers
    MOEFeedForwardSwiGLU: `shared_experts` at half the expert width,
    `experts.{j}.w1/w2/w3`, bias-free `gate`).

    Dense formulation: every expert computes, the top-k gate mixes — exact
    for training semantics and maps onto the MXU without gather/scatter;
    expert kernels are sharded over 'tensor' (expert parallelism)."""

    config: HiDreamConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dim = cfg.hidden_size
        hid = swiglu_hidden(dim, cfg.mlp_ratio)
        shared_hid = swiglu_hidden(dim, cfg.mlp_ratio / 2)
        e = cfg.num_routed_experts
        k = cfg.num_activated_experts
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  kernel_dtype=cfg.base_kernel_dtype,
                  int8_matmul=cfg.int8_matmul)
        lora = cfg.lora_kwargs
        b, s, _ = x.shape

        # shared expert (always on)
        g = LoraDense(shared_hid, use_bias=False, name="shared_w1", **dd,
                      **lora)(x)
        u = LoraDense(shared_hid, use_bias=False, name="shared_w3", **dd,
                      **lora)(x)
        out = LoraDense(dim, use_bias=False, name="shared_w2", **dd,
                        **lora)(nn.silu(g) * u)

        # router (raw weight parameter `gate.weight` in the checkpoint)
        logits = LoraDense(e, use_bias=False, name="gate", dtype=jnp.float32,
                           param_dtype=cfg.param_dtype)(x.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)  # [B, S, E]
        topv, topi = jax.lax.top_k(probs, k)
        # scatter the top-k weights back into an [E]-sized mixture
        onehot = jax.nn.one_hot(topi, e, dtype=probs.dtype)  # [B,S,K,E]
        gate_w = jnp.einsum("bske,bsk->bse", onehot, topv)

        def expert_init(key, shape, dtype=cfg.param_dtype):
            return nn.initializers.lecun_normal()(key, shape, jnp.float32).astype(dtype)

        w1 = self.param("experts_w1", nn.with_partitioning(
            expert_init, ("tensor", None, None)), (e, dim, hid),
            cfg.base_kernel_dtype or cfg.param_dtype)
        w3 = self.param("experts_w3", nn.with_partitioning(
            expert_init, ("tensor", None, None)), (e, dim, hid),
            cfg.base_kernel_dtype or cfg.param_dtype)
        w2 = self.param("experts_w2", nn.with_partitioning(
            expert_init, ("tensor", None, None)), (e, hid, dim),
            cfg.base_kernel_dtype or cfg.param_dtype)
        xe = x.astype(cfg.dtype)
        eg = jnp.einsum("bsd,edh->besh", xe, jnp.asarray(w1, cfg.dtype))
        eu = jnp.einsum("bsd,edh->besh", xe, jnp.asarray(w3, cfg.dtype))
        eo = jnp.einsum("besh,ehd->besd", nn.silu(eg) * eu,
                        jnp.asarray(w2, cfg.dtype))
        routed = jnp.einsum("besd,bse->bsd", eo, gate_w.astype(cfg.dtype))
        return out + routed


class HiDreamDoubleBlock(nn.Module):
    """hi_diffusers HiDreamImageTransformerBlock: the text stream entering
    each block is [carried T5-length stream, this block's llama state]; the
    block updates the full text sequence and the caller keeps only the
    T5-length prefix (reference transformer forward re-injects fresh llama
    tokens every block)."""

    config: HiDreamConfig

    @nn.compact
    def __call__(self, carry, temb, llama_ctx, rope_cos, rope_sin):
        cfg = self.config
        dim = cfg.hidden_size
        heads, hd = cfg.num_heads, cfg.head_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  kernel_dtype=cfg.base_kernel_dtype,
                  int8_matmul=cfg.int8_matmul)
        lora = cfg.lora_kwargs
        img_s, txt_carry = carry
        b, si, _ = img_s.shape
        st_keep = txt_carry.shape[1]
        txt = jnp.concatenate([txt_carry, llama_ctx.astype(txt_carry.dtype)],
                              axis=1)
        st = txt.shape[1]

        # single fused adaLN: 12 chunks, image 6 then text 6
        mod = LoraDense(12 * dim, name="adaLN", **dd, **lora)(nn.silu(temb))
        (i1, i2, i3, i4, i5, i6,
         t1, t2, t3, t4, t5, t6) = jnp.split(mod, 12, -1)

        def rms(name, y):
            # full-dim RMS norm before the head split (hi_diffusers
            # q_rms_norm/k_rms_norm are RMSNorm(inner_dim))
            return RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                           name=name)(y)

        img_n = layer_norm_no_affine(img_s) * (1 + i2[:, None]) + i1[:, None]
        txt_n = layer_norm_no_affine(txt) * (1 + t2[:, None]) + t1[:, None]

        def qkv(x, suffix, s):
            q = rms(f"attn_q_norm{suffix}",
                    LoraDense(dim, name=f"attn_to_q{suffix}", **dd, **lora)(x))
            k = rms(f"attn_k_norm{suffix}",
                    LoraDense(dim, name=f"attn_to_k{suffix}", **dd, **lora)(x))
            v = LoraDense(dim, name=f"attn_to_v{suffix}", **dd, **lora)(x)
            return (q.reshape(b, s, heads, hd), k.reshape(b, s, heads, hd),
                    v.reshape(b, s, heads, hd))

        iq, ik, iv = qkv(img_n, "", si)
        tq, tk, tv = qkv(txt_n, "_t", st)
        q = jnp.concatenate([iq, tq], axis=1)
        kk = jnp.concatenate([ik, tk], axis=1)
        v = jnp.concatenate([iv, tv], axis=1)
        q = apply_rope(q, rope_cos, rope_sin)
        kk = apply_rope(kk, rope_cos, rope_sin)
        attn = dot_product_attention(q, kk, v).reshape(b, si + st, dim)
        ia, ta = attn[:, :si], attn[:, si:]
        img_s = img_s + i3[:, None] * LoraDense(dim, name="attn_to_out",
                                                **dd, **lora)(ia)
        txt = txt + t3[:, None] * LoraDense(dim, name="attn_to_out_t",
                                            **dd, **lora)(ta)

        y = layer_norm_no_affine(img_s) * (1 + i5[:, None]) + i4[:, None]
        img_s = img_s + i6[:, None] * MoEFeedForward(cfg, name="ff_i")(y)
        y = layer_norm_no_affine(txt) * (1 + t5[:, None]) + t4[:, None]
        ff_hid = swiglu_hidden(dim, cfg.mlp_ratio)
        g = LoraDense(ff_hid, use_bias=False, name="txt_ff_w1", **dd,
                      **lora)(y)
        u = LoraDense(ff_hid, use_bias=False, name="txt_ff_w3", **dd,
                      **lora)(y)
        txt = txt + t6[:, None] * LoraDense(dim, use_bias=False,
                                            name="txt_ff_w2", **dd, **lora)(
            nn.silu(g) * u)
        return (img_s, txt[:, :st_keep]), None


class HiDreamSingleBlock(nn.Module):
    """hi_diffusers HiDreamImageSingleTransformerBlock: per block, this
    block's llama state is appended to the [img, txt] stream, attended
    over, and dropped again by the caller."""

    config: HiDreamConfig

    @nn.compact
    def __call__(self, x, temb, llama_ctx, rope_cos, rope_sin):
        cfg = self.config
        dim = cfg.hidden_size
        heads, hd = cfg.num_heads, cfg.head_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  kernel_dtype=cfg.base_kernel_dtype,
                  int8_matmul=cfg.int8_matmul)
        lora = cfg.lora_kwargs
        s_keep = x.shape[1]
        x = jnp.concatenate([x, llama_ctx.astype(x.dtype)], axis=1)
        b, s, _ = x.shape

        mod = LoraDense(6 * dim, name="adaLN", **dd, **lora)(nn.silu(temb))
        m1, m2, m3, m4, m5, m6 = jnp.split(mod, 6, -1)
        y = layer_norm_no_affine(x) * (1 + m2[:, None]) + m1[:, None]
        q = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="attn_q_norm")(
            LoraDense(dim, name="attn_to_q", **dd, **lora)(y))
        k = RMSNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="attn_k_norm")(
            LoraDense(dim, name="attn_to_k", **dd, **lora)(y))
        v = LoraDense(dim, name="attn_to_v", **dd, **lora)(y)
        q = q.reshape(b, s, heads, hd)
        k = k.reshape(b, s, heads, hd)
        v = v.reshape(b, s, heads, hd)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        attn = dot_product_attention(q, k, v).reshape(b, s, dim)
        x = x + m3[:, None] * LoraDense(dim, name="attn_to_out", **dd,
                                        **lora)(attn)
        y = layer_norm_no_affine(x) * (1 + m5[:, None]) + m4[:, None]
        x = x + m6[:, None] * MoEFeedForward(cfg, name="ff_i")(y)
        return x[:, :s_keep], None


class HiDreamTransformer(nn.Module):
    config: HiDreamConfig

    @nn.compact
    def __call__(self, x_tokens, img_ids, timesteps, pooled, t5_embeds,
                 llama_embeds, img_seq_len: Optional[int] = None):
        """x_tokens: [B, S_img, 64]; llama_embeds: [B, L_layers, S_l, dim_l]
        (one hidden state per block, cycled if fewer)."""
        cfg = self.config
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, si, _ = x_tokens.shape

        img = LoraDense(dim, name="x_embedder", **dd)(
            x_tokens.astype(cfg.dtype)
        )
        # t_embedder / p_embedder are diffusers TimestepEmbedding pairs
        # (linear_1 -> silu -> linear_2); vec = t + pooled, blocks apply
        # their own SiLU inside adaLN (hi_diffusers TimestepEmbed /
        # PooledEmbed)
        t_sin = sinusoidal_timestep_embedding(
            timesteps.astype(jnp.float32), 256)
        temb = LoraDense(dim, name="t_embed_1", **dd)(t_sin.astype(cfg.dtype))
        temb = LoraDense(dim, name="t_embed_2", **dd)(nn.silu(temb))
        p = LoraDense(dim, name="p_embed_1", **dd)(pooled.astype(cfg.dtype))
        p = LoraDense(dim, name="p_embed_2", **dd)(nn.silu(p))
        temb = temb + p

        # caption projections: one bias-free linear per block for the
        # selected llama hidden states + a final one for T5
        # (hi_diffusers caption_projection ModuleList)
        t5 = LoraDense(dim, use_bias=False, name="t5_projection", **dd)(
            t5_embeds.astype(cfg.dtype)
        )
        nb = cfg.num_double_layers + cfg.num_single_layers
        n_layers = llama_embeds.shape[1]
        sel = cfg.llama_layers or tuple(
            i % n_layers for i in range(nb))
        cap_w = self.param(
            "caption_projection",
            lambda k, sh: nn.initializers.lecun_normal()(
                k, sh, jnp.float32).astype(cfg.param_dtype),
            (nb, cfg.llama_dim, dim),
        )
        selected = jnp.stack(
            [llama_embeds[:, sel[i]] for i in range(nb)], axis=1
        )  # [B, NB, S_l, llama_dim]
        llama_proj = jnp.einsum(
            "bnsd,ndo->bnso", selected.astype(cfg.dtype),
            jnp.asarray(cap_w, cfg.dtype),
        )

        st = t5.shape[1] + llama_proj.shape[2]
        txt_ids = jnp.zeros((st, 3), jnp.float32)
        ids = jnp.concatenate([img_ids, txt_ids], axis=0)
        rope_cos, rope_sin = rope_frequencies(
            ids, tuple(cfg.axes_dims_rope), cfg.rope_theta
        )

        from ..parallel.offload import apply_swap_split

        def _stack_runner(b_cls, lp0):
            # lp0: global llama_proj offset of this stack's first block —
            # each sub-stack consumes its own per-block caption slice
            def apply_blocks(state, length, name, streamed):
                carry, off = state
                b_ = b_cls
                if streamed:
                    from ..parallel.offload import stream_params_from_host

                    b_ = stream_params_from_host(b_)
                if cfg.remat:
                    b_ = remat_wrap(b_, cfg.remat)
                carry, _ = nn.scan(
                    b_,
                    variable_axes={"params": 0}, split_rngs={"params": True},
                    in_axes=(nn.broadcast, 1, nn.broadcast, nn.broadcast),
                    length=length,
                    metadata_params={nn.PARTITION_NAME: "layers"},
                )(cfg, name=name)(
                    carry, temb, llama_proj[:, lp0 + off:lp0 + off + length],
                    rope_cos, rope_sin)
                return carry, off + length

            return apply_blocks

        (img, txt), _ = apply_swap_split(
            ((img, t5), 0), cfg.double_split,
            _stack_runner(HiDreamDoubleBlock, 0), base="double_blocks")

        xcat = jnp.concatenate([img, txt], axis=1)
        xcat, _ = apply_swap_split(
            (xcat, 0), cfg.single_split,
            _stack_runner(HiDreamSingleBlock, cfg.num_double_layers),
            base="single_blocks")
        out = xcat[:, :si]
        if img_seq_len is not None:
            out = out[:, :img_seq_len]

        mod = LoraDense(2 * dim, name="final_mod", **dd)(nn.silu(temb))
        shift, scale = jnp.split(mod, 2, -1)
        out = layer_norm_no_affine(out) * (1 + scale[:, None]) + shift[:, None]
        return LoraDense(cfg.out_channels, name="proj_out", **dd)(out)


@register_model("hidream")
class HiDreamPipeline(BasePipeline):
    name = "hidream"
    cacheable_text_embeddings = ("t5_embeds", "pooled", "llama_embeds")

    def __init__(self, config):
        super().__init__(config)
        self.tdist = TimestepDistribution.from_model_config(self.model_config)
        self.hd_config = self._build_config()
        self.model = HiDreamTransformer(self.hd_config)

    def _build_config(self) -> HiDreamConfig:
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
        n = int(self.config.get("blocks_to_swap", 0) or 0)
        if n > 0:
            # reference split (hidream.py:281-284); past the num-2 caps,
            # whole-stack streaming instead of failing (flux policy)
            n_dbl = 16 if not mc.get("_tiny", False) else 2
            n_sgl = 32 if not mc.get("_tiny", False) else 2
            dbl = n // 2
            sgl = (n - dbl) * 2 + 1
            if dbl > n_dbl - 2 or sgl > n_sgl - 2:
                dbl, sgl = n_dbl, n_sgl
            kwargs["offload_tail_double"] = dbl
            kwargs["offload_tail_single"] = sgl
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
        if mc.get("llama_layers"):
            kwargs["llama_layers"] = tuple(
                int(i) for i in mc["llama_layers"])
        if mc.get("_tiny", False):
            return HiDreamConfig.tiny(**kwargs)
        return HiDreamConfig(**kwargs)

    # --- weights ------------------------------------------------------------

    def _keymap_config(self):
        return self.hd_config

    def keymap(self):
        """hi_diffusers HiDreamImageTransformer2DModel keys
        (`double_stream_blocks.{i}.block.*` wrappers, full-dim
        q_rms_norm/k_rms_norm, fused 12/6-way adaLN, MoE
        `ff_i.experts.{j}.w1/w2/w3` + half-width shared expert, per-block
        `caption_projection.{i}.linear` with the T5 projection last;
        reference models/hidream.py:45 targets these blocks and saves
        ComfyUI-prefix LoRA, :132-136) <-> our stacked flax layout."""
        from .keymaps import BlockGroup, KeyMap

        cfg = self.hd_config
        nb = cfg.num_double_layers + cfg.num_single_layers

        def attn(suffix):
            lin = {
                f"attn_to_q{suffix}": f"block.attn1.to_q{suffix}",
                f"attn_to_k{suffix}": f"block.attn1.to_k{suffix}",
                f"attn_to_v{suffix}": f"block.attn1.to_v{suffix}",
                f"attn_to_out{suffix}": f"block.attn1.to_out{suffix}",
            }
            norms = {
                f"attn_q_norm{suffix}": f"block.attn1.q_rms_norm{suffix}",
                f"attn_k_norm{suffix}": f"block.attn1.k_rms_norm{suffix}",
            }
            return lin, norms

        moe_lin = {
            "ff_i/shared_w1": "block.ff_i.shared_experts.w1",
            "ff_i/shared_w2": "block.ff_i.shared_experts.w2",
            "ff_i/shared_w3": "block.ff_i.shared_experts.w3",
            "ff_i/gate": "block.ff_i.gate",
        }
        moe_stacks = {
            "ff_i/experts_w1": ("block.ff_i.experts.{}.w1",
                                "num_routed_experts"),
            "ff_i/experts_w2": ("block.ff_i.experts.{}.w2",
                                "num_routed_experts"),
            "ff_i/experts_w3": ("block.ff_i.experts.{}.w3",
                                "num_routed_experts"),
        }
        d_lin, d_norms = attn("")
        dt_lin, dt_norms = attn("_t")
        s_lin, s_norms = attn("")
        from .keymaps import split_block_group

        d_res, d_swap = self.hd_config.double_split
        s_res, s_swap = self.hd_config.single_split
        return KeyMap(
            blocks=[
                *split_block_group(BlockGroup(
                    "double_blocks", "double_stream_blocks",
                    "num_double_layers",
                    linears={
                        **d_lin, **dt_lin, **moe_lin,
                        "adaLN": "block.adaLN_modulation.1",
                        "txt_ff_w1": "block.ff_t.w1",
                        "txt_ff_w2": "block.ff_t.w2",
                        "txt_ff_w3": "block.ff_t.w3",
                    },
                    norms={**d_norms, **dt_norms},
                    stacks=moe_stacks,
                ), d_res, d_swap),
                *split_block_group(BlockGroup(
                    "single_blocks", "single_stream_blocks",
                    "num_single_layers",
                    linears={**s_lin, **moe_lin,
                             "adaLN": "block.adaLN_modulation.1"},
                    norms=s_norms,
                    stacks=moe_stacks,
                ), s_res, s_swap),
            ],
            top_linears={
                "x_embedder": "x_embedder.proj",
                "t_embed_1": "t_embedder.timestep_embedder.linear_1",
                "t_embed_2": "t_embedder.timestep_embedder.linear_2",
                "p_embed_1": "p_embedder.pooled_embedder.linear_1",
                "p_embed_2": "p_embedder.pooled_embedder.linear_2",
                "t5_projection": f"caption_projection.{nb}.linear",
                "final_mod": "final_layer.adaLN_modulation.1",
                "proj_out": "final_layer.linear",
            },
            top_stacks={
                "caption_projection": ("caption_projection.{}.linear", nb),
            },
            lora_prefix="diffusion_model.",
        )

    def load_weights(self):
        from .keymaps import keymap_to_flax, load_sd_for_pipeline

        return keymap_to_flax(
            load_sd_for_pipeline(self), self.keymap(), self.hd_config
        )

    def init_params(self, rng):
        cfg = self.hd_config
        return jax.jit(self.model.init)(
            rng,
            jnp.zeros((1, 16, cfg.in_channels)),
            latent_image_ids(4, 4),
            jnp.zeros((1,)),
            jnp.zeros((1, cfg.pooled_dim)),
            jnp.zeros((1, 8, cfg.t5_dim)),
            jnp.zeros((1, 2, 8, cfg.llama_dim)),
        )

    def prepare_inputs(self, rng, batch, timestep_quantile=None):
        latents = batch["latents"].astype(jnp.float32)
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
        # SIGN FLIP vs flux (reference hidream.py:254-256)
        target = pack_latents(latents - noise)

        model_inputs = dict(
            x_tokens=x_t,
            img_ids=latent_image_ids(h // 2, w // 2),
            timesteps=t * 1000.0,
            pooled=batch["pooled"],
            t5_embeds=batch["t5_embeds"],
            llama_embeds=batch["llama_embeds"],
            img_seq_len=image_seq_len,
        )
        return model_inputs, target, mask

    def sample(self, params, width, height, key, num_steps=20,
               guidance_scale=1.0, **embeds):
        """Euler flow sampling through the training forward (reference
        CommonPipeline.sample, models/base.py:263-291). HiDream predicts
        latents - noise (sign flip, reference hidream.py:254-256), so the
        noise->data velocity is the NEGATED model output. Returns latents
        [B, C, h, w]."""
        from ..training.sampling import euler_flow_sample
        from .flux import unpack_latents

        t5 = embeds["t5_embeds"]
        b = t5.shape[0]
        c = self.hd_config.in_channels // 4  # 2x2-packed latent channels
        h, w = height // 8, width // 8
        img_ids = latent_image_ids(h // 2, w // 2)

        def vel(x, t):
            out = self.forward(params, dict(
                x_tokens=pack_latents(x),
                img_ids=img_ids,
                timesteps=t * 1000.0,
                pooled=embeds["pooled"],
                t5_embeds=t5,
                llama_embeds=embeds["llama_embeds"],
                img_seq_len=(h // 2) * (w // 2),
            ))
            return -unpack_latents(out.astype(jnp.float32), h, w)

        return euler_flow_sample(
            vel, (b, c, h, w), key, num_steps=num_steps,
            guidance_scale=guidance_scale,
            shift=self.model_config.get("shift"),
        )

    def make_pp_program(self):
        """Pipeline-parallel program: double then single block phases; the
        per-block Llama caption projections are computed on stage 0 and
        travel stacked in the payload, sliced by phase-local block index
        (PPPhase.needs_index). MoE expert kernels stay GSPMD-sharded over
        'tensor'. See parallel/model_pp.py."""
        cfg = self.hd_config
        for split, total in ((cfg.double_split, cfg.num_double_layers),
                             (cfg.single_split, cfg.num_single_layers)):
            if 0 < split[1] < total:
                raise NotImplementedError(
                    "partial blocks_to_swap (split block stacks) cannot "
                    "be combined with pipeline_stages > 1; use whole-stack "
                    "streaming or drop pipeline parallelism"
                )
        return _HiDreamPPProgram(self)

    def host_stack_names(self):
        """Exact-N blocks_to_swap over BOTH stacks (reference
        hidream.py:275-295 dual offloaders)."""
        from ..parallel.offload import swap_stack_names

        cfg = self.hd_config
        return swap_stack_names(
            (cfg.double_split, cfg.single_split),
            ("double_blocks", "single_blocks"),
        )

    def forward(self, params, model_inputs):
        return self.model.apply(params, **model_inputs)

    def get_call_vae_fn(self):
        from .flux import FluxPipeline

        return FluxPipeline.get_call_vae_fn(self)

    def _load_vae(self):
        from .flux import FluxPipeline

        return FluxPipeline._load_vae(self)

    def get_call_text_encoder_fns(self):
        mc = self.model_config
        if mc.get("_tiny", False):
            from ..data.bucketing import seed_from_hash

            cfg = self.hd_config

            def te(caps):
                out = {"t5_embeds": [], "pooled": [], "llama_embeds": []}
                for c in caps:
                    r = np.random.default_rng(seed_from_hash(c))
                    out["t5_embeds"].append(
                        r.standard_normal((8, cfg.t5_dim)).astype(np.float32))
                    out["pooled"].append(
                        r.standard_normal((cfg.pooled_dim,)).astype(np.float32))
                    out["llama_embeds"].append(
                        r.standard_normal((2, 8, cfg.llama_dim)).astype(
                            np.float32))
                return {k: np.stack(v) for k, v in out.items()}

            return [te]

        # CLIP-L + CLIP-G pooled (concat), T5-XXL embeds, and Llama-3.1-8B
        # per-layer hidden states hidden_states[1:] (reference
        # models/hidream.py:147-214, 333-343). The reference runs Llama
        # inside the training graph; here it is cached like the others —
        # same embeddings, no in-graph 8B encoder.
        from .llm_encoders import LLMTextEncoder
        from .text_encoders import HFTextEncoder

        clip_l = HFTextEncoder("clip_pooled", mc["clip_l_path"], max_length=77)
        clip_g = HFTextEncoder("clip_pooled", mc["clip_g_path"], max_length=77)
        t5 = HFTextEncoder("t5", mc["t5_path"],
                           max_length=int(mc.get("max_t5_sequence_length", 128)))
        llama_fp8 = bool(mc.get("llama3_4bit"))
        if llama_fp8:
            # reference hidream.py:76-83 loads Llama-3.1-8B in
            # bitsandbytes nf4; no TPU nf4 kernel exists — float8_e4m3
            # storage instead (2x nf4's footprint, half of bf16)
            import warnings

            warnings.warn(
                "llama3_4bit: TPU build stores Llama3 in float8_e4m3 "
                "instead of nf4 (no bitsandbytes on TPU).", stacklevel=2,
            )
        llama = LLMTextEncoder(
            mc["llama3_path"],
            max_length=int(mc.get("max_llama3_sequence_length", 128)),
            hidden_layer=-1,
            fp8=llama_fp8,
        )

        def pooled_fn(caps):
            a = np.asarray(clip_l.encode(caps))
            b = np.asarray(clip_g.encode(caps))
            return {"pooled": np.concatenate([a, b], axis=-1)}

        def t5_fn(caps):
            return {"t5_embeds": np.asarray(t5.encode(caps))}

        def llama_fn(caps):
            llama._load()
            enc = llama._tokenizer(
                caps, padding="max_length", truncation=True,
                max_length=llama.max_length, return_tensors="np",
            )
            import jax.numpy as jnp

            out, hiddens = llama._model.apply(
                llama._params, jnp.asarray(enc["input_ids"]),
                jnp.asarray(enc["attention_mask"]), collect_hidden=True,
            )
            # [B, n_layers, S, dim] (transformers hidden_states[1:])
            states = np.stack([np.asarray(h) for h in hiddens[1:]], axis=1)
            return {"llama_embeds": states}

        return [pooled_fn, t5_fn, llama_fn]


class _HiDreamPPProgram:
    """PPProgram for HiDreamTransformer (see parallel/model_pp.py).

    Raw-param re-expression of the __call__ split at the two block scans.
    Phase 1 payload: (img, txt, temb, llama_proj [B,NB,S_l,D]);
    phase 2 (after the img-first concat `pre`): (xcat, temb, llama_proj).
    Single blocks slice llama_proj at num_double_layers + local index.
    """

    def __init__(self, pipeline):
        from ..parallel.model_pp import PPPhase

        self.pipeline = pipeline
        cfg = pipeline.hd_config
        self.cfg = cfg
        self.phases = [
            PPPhase("double_blocks", cfg.num_double_layers,
                    self._apply_double, needs_index=True),
            PPPhase("single_blocks", cfg.num_single_layers,
                    self._apply_single, pre=self._to_single_stream,
                    needs_index=True),
        ]

    def _apply_double(self, p_i, payload, ctx, bi):
        img, txt, temb, lp = payload
        lctx = jax.lax.dynamic_index_in_dim(lp, bi, 1, False)
        (img, txt), _ = HiDreamDoubleBlock(self.cfg).apply(
            {"params": p_i}, (img, txt), temb, lctx, ctx["rope_cos"],
            ctx["rope_sin"],
        )
        return (img, txt, temb, lp)

    def _to_single_stream(self, payload, ctx):
        img, txt, temb, lp = payload
        return (jnp.concatenate([img, txt], axis=1), temb, lp)

    def _apply_single(self, p_i, payload, ctx, bi):
        xcat, temb, lp = payload
        lctx = jax.lax.dynamic_index_in_dim(
            lp, self.cfg.num_double_layers + bi, 1, False)
        xcat, _ = HiDreamSingleBlock(self.cfg).apply(
            {"params": p_i}, xcat, temb, lctx, ctx["rope_cos"],
            ctx["rope_sin"],
        )
        return (xcat, temb, lp)

    def make_ctx(self, p_rest, mi0):
        cfg = self.cfg
        st = (mi0["t5_embeds"].shape[1]
              + mi0["llama_embeds"].shape[2])
        txt_ids = jnp.zeros((st, 3), jnp.float32)
        ids = jnp.concatenate([mi0["img_ids"], txt_ids], axis=0)
        rope_cos, rope_sin = rope_frequencies(
            ids, tuple(cfg.axes_dims_rope), cfg.rope_theta
        )
        return {"rope_cos": rope_cos, "rope_sin": rope_sin}

    def embed(self, p_rest, mi, ctx):
        cfg = self.cfg
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        x_tokens = mi["x_tokens"]
        llama_embeds = mi["llama_embeds"]

        img = LoraDense(dim, **dd).apply(
            {"params": p_rest["x_embedder"]}, x_tokens.astype(cfg.dtype))
        t_sin = sinusoidal_timestep_embedding(
            mi["timesteps"].astype(jnp.float32), 256)
        temb = LoraDense(dim, **dd).apply(
            {"params": p_rest["t_embed_1"]}, t_sin.astype(cfg.dtype))
        temb = LoraDense(dim, **dd).apply(
            {"params": p_rest["t_embed_2"]}, nn.silu(temb))
        p = LoraDense(dim, **dd).apply(
            {"params": p_rest["p_embed_1"]}, mi["pooled"].astype(cfg.dtype))
        p = LoraDense(dim, **dd).apply(
            {"params": p_rest["p_embed_2"]}, nn.silu(p))
        temb = temb + p

        t5 = LoraDense(dim, use_bias=False, **dd).apply(
            {"params": p_rest["t5_projection"]},
            mi["t5_embeds"].astype(cfg.dtype))
        nb = cfg.num_double_layers + cfg.num_single_layers
        n_layers = llama_embeds.shape[1]
        sel = cfg.llama_layers or tuple(i % n_layers for i in range(nb))
        selected = jnp.stack(
            [llama_embeds[:, sel[i]] for i in range(nb)], axis=1)
        llama_proj = jnp.einsum(
            "bnsd,ndo->bnso", selected.astype(cfg.dtype),
            jnp.asarray(p_rest["caption_projection"], cfg.dtype),
        )
        return (img, t5, temb, llama_proj)

    def head_loss(self, p_rest, payload, target, mask, ctx):
        cfg = self.cfg
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        xcat, temb, _lp = payload

        out = xcat[:, : target.shape[1]]
        mod = LoraDense(2 * dim, **dd).apply(
            {"params": p_rest["final_mod"]}, nn.silu(temb))
        shift, scale = jnp.split(mod, 2, -1)
        out = layer_norm_no_affine(out) * (1 + scale[:, None]) + shift[:, None]
        out = LoraDense(cfg.out_channels, **dd).apply(
            {"params": p_rest["proj_out"]}, out)
        return self.pipeline.loss_fn(out, target, mask)
