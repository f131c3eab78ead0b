"""AuraFlow (fal, Pony-V7 base) model family.

Reference: models/auraflow.py (296 LoC wrapper over diffusers
AuraFlowTransformer2DModel). Architecture facts used here (fal lavenderflow
block design as ported to diffusers):
  - patchified latents + LEARNED positional embedding, center-cropped from a
    sqrt(pos_embed_max_size)^2 grid per resolution (no RoPE)
  - 8 learned register tokens prepended to the projected UMT5 context
    (reference auraflow.py:211-214)
  - N joint MMDiT blocks (separate img/ctx streams, joint attention over
    [ctx, img]) followed by M single DiT blocks over the CONCATENATED
    [ctx, img] stream (reference auraflow.py:148-157, 239-243)
  - "sandwich" residual: attn output enters the block only through
    norm2(residual + gate_msa*attn) -> modulated MLP; the final residual
    adds gate_mlp*ff onto the PRE-attention stream (fal block design)
  - fp32 non-affine layernorms; bias-free linears; per-head fp32 LN qk-norm
  - SwiGLU FFN with inner dim round_to_256(dim*4*2/3)
  - flow matching, x_t=(1-t)x+tn, target n-x (reference auraflow.py:141-146)

Flagged for verification against real checkpoints: the sandwich-residual
wiring and pos_embed_max_size default (set `pos_embed_max_size` in the
model config if the checkpoint differs).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from . import register_model
from .base import BasePipeline
from .layers import (
    LoraDense,
    layer_norm_no_affine,
    modulate,
    remat_spec,
    remat_wrap,
    sinusoidal_timestep_embedding,
)
from ..ops.attention import dot_product_attention
from ..training.flow import TimestepDistribution, sample_timesteps

Dtype = Any


@dataclasses.dataclass(frozen=True)
class AuraFlowConfig:
    in_channels: int = 4
    out_channels: int = 4
    patch_size: int = 2
    hidden_size: int = 3072
    num_attention_heads: int = 12
    attention_head_dim: int = 256
    joint_attention_dim: int = 2048  # UMT5 (Pile-T5) width
    num_layers: int = 4          # joint (MMDiT) blocks
    num_single_layers: int = 32  # single DiT blocks
    num_register_tokens: int = 8
    pos_embed_max_size: int = 9216  # 96x96 grid (AuraFlow v0.3)
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.bfloat16
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
    def ffn_dim(self) -> int:
        d = int(2 * (4 * self.hidden_size) / 3)
        return ((d + 255) // 256) * 256

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
            hidden_size=32, num_attention_heads=4, attention_head_dim=8,
            joint_attention_dim=24, num_layers=2, num_single_layers=2,
            pos_embed_max_size=64, dtype=jnp.float32, param_dtype=jnp.float32,
        )
        d.update(kw)
        return AuraFlowConfig(**d)


def _qk_norm(x):
    """Non-learned fp32 LayerNorm over head_dim (diffusers fp32_layer_norm
    with elementwise_affine=False)."""
    return layer_norm_no_affine(x, eps=1e-5)


def _swiglu(x, cfg, dd, lora, prefix):
    gate = LoraDense(cfg.ffn_dim, use_bias=False, name=f"{prefix}_linear_1",
                     kernel_axes=(None, "tensor"), **dd, **lora)(x)
    up = LoraDense(cfg.ffn_dim, use_bias=False, name=f"{prefix}_linear_2",
                   kernel_axes=(None, "tensor"), **dd, **lora)(x)
    return LoraDense(cfg.hidden_size, use_bias=False,
                     name=f"{prefix}_out_projection",
                     kernel_axes=("tensor", None), **dd, **lora)(
        nn.silu(gate) * up
    )


class AuraFlowJointBlock(nn.Module):
    config: AuraFlowConfig

    @nn.compact
    def __call__(self, carry, temb):
        img, ctx = carry
        cfg = self.config
        dim = cfg.hidden_size
        heads, hd = cfg.num_attention_heads, cfg.attention_head_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  kernel_dtype=cfg.base_kernel_dtype,
                  int8_matmul=cfg.int8_matmul)
        lora = cfg.lora_kwargs

        mod_i = LoraDense(6 * dim, use_bias=False, name="norm1_linear",
                          **dd, **lora)(nn.silu(temb))
        mod_c = LoraDense(6 * dim, use_bias=False, name="norm1_context_linear",
                          **dd, **lora)(nn.silu(temb))
        (i_sh, i_sc, i_g, i_sh2, i_sc2, i_g2) = jnp.split(mod_i, 6, axis=-1)
        (c_sh, c_sc, c_g, c_sh2, c_sc2, c_g2) = jnp.split(mod_c, 6, axis=-1)

        img_n = modulate(layer_norm_no_affine(img, 1e-6), i_sh, i_sc)
        ctx_n = modulate(layer_norm_no_affine(ctx, 1e-6), c_sh, c_sc)

        def qkv(x, prefix):
            b, s = x.shape[:2]
            out = []
            for nme in ("q", "k", "v"):
                y = LoraDense(heads * hd, use_bias=False,
                              name=f"{prefix}_{nme}",
                              kernel_axes=(None, "tensor"), **dd, **lora)(x)
                out.append(y.reshape(b, s, heads, hd))
            return out

        iq, ik, iv = qkv(img_n, "attn_to")
        cq, ck, cv = qkv(ctx_n, "attn_add")
        iq, ik = _qk_norm(iq), _qk_norm(ik)
        cq, ck = _qk_norm(cq), _qk_norm(ck)

        # joint sequence order [ctx, img] (reference auraflow.py:239-243)
        q = jnp.concatenate([cq, iq], axis=1)
        k = jnp.concatenate([ck, ik], axis=1)
        v = jnp.concatenate([cv, iv], axis=1)
        attn = dot_product_attention(q, k, v)
        b, s = attn.shape[:2]
        attn = attn.reshape(b, s, heads * hd)
        ctx_len = ctx.shape[1]
        ctx_attn, img_attn = attn[:, :ctx_len], attn[:, ctx_len:]
        img_attn = LoraDense(dim, use_bias=False, name="attn_to_out",
                             kernel_axes=("tensor", None), **dd, **lora)(img_attn)
        ctx_attn = LoraDense(dim, use_bias=False, name="attn_to_add_out",
                             kernel_axes=("tensor", None), **dd, **lora)(ctx_attn)

        # sandwich residual (see module docstring)
        img_h = layer_norm_no_affine(img + i_g[:, None, :] * img_attn, 1e-6)
        img_h = modulate(img_h, i_sh2, i_sc2)
        img = img + i_g2[:, None, :] * _swiglu(img_h, cfg, dd, lora, "ff")

        ctx_h = layer_norm_no_affine(ctx + c_g[:, None, :] * ctx_attn, 1e-6)
        ctx_h = modulate(ctx_h, c_sh2, c_sc2)
        ctx = ctx + c_g2[:, None, :] * _swiglu(ctx_h, cfg, dd, lora, "ff_context")
        return (img, ctx), None


class AuraFlowSingleBlock(nn.Module):
    config: AuraFlowConfig

    @nn.compact
    def __call__(self, x, temb):
        cfg = self.config
        dim = cfg.hidden_size
        heads, hd = cfg.num_attention_heads, cfg.attention_head_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  kernel_dtype=cfg.base_kernel_dtype,
                  int8_matmul=cfg.int8_matmul)
        lora = cfg.lora_kwargs

        mod = LoraDense(6 * dim, use_bias=False, name="norm1_linear",
                        **dd, **lora)(nn.silu(temb))
        sh, sc, g, sh2, sc2, g2 = jnp.split(mod, 6, axis=-1)
        h = modulate(layer_norm_no_affine(x, 1e-6), sh, sc)
        b, s = h.shape[:2]
        q = LoraDense(heads * hd, use_bias=False, name="attn_to_q",
                      kernel_axes=(None, "tensor"), **dd, **lora)(h)
        k = LoraDense(heads * hd, use_bias=False, name="attn_to_k",
                      kernel_axes=(None, "tensor"), **dd, **lora)(h)
        v = LoraDense(heads * hd, use_bias=False, name="attn_to_v",
                      kernel_axes=(None, "tensor"), **dd, **lora)(h)
        q = _qk_norm(q.reshape(b, s, heads, hd))
        k = _qk_norm(k.reshape(b, s, heads, hd))
        v = v.reshape(b, s, heads, hd)
        attn = dot_product_attention(q, k, v).reshape(b, s, heads * hd)
        attn = LoraDense(dim, use_bias=False, name="attn_to_out",
                         kernel_axes=("tensor", None), **dd, **lora)(attn)
        h2 = layer_norm_no_affine(x + g[:, None, :] * attn, 1e-6)
        h2 = modulate(h2, sh2, sc2)
        return x + g2[:, None, :] * _swiglu(h2, cfg, dd, lora, "ff"), None


def pe_selection_indices(pos_max: int, hp: int, wp: int) -> np.ndarray:
    """Center-crop the learned pos-embed grid to (hp, wp) patches
    (diffusers AuraFlowPatchEmbed.pe_selection_index_based_on_dim)."""
    side = int(pos_max ** 0.5)
    idx = np.arange(pos_max).reshape(side, side)
    sh = side // 2 - hp // 2
    sw = side // 2 - wp // 2
    return idx[sh:sh + hp, sw:sw + wp].reshape(-1)


class AuraFlowTransformer(nn.Module):
    config: AuraFlowConfig

    def setup(self):
        cfg = self.config
        dim = cfg.hidden_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, cfg.pos_embed_max_size, dim), cfg.param_dtype,
        )
        self.register_tokens = self.param(
            "register_tokens", nn.initializers.normal(0.02),
            (1, cfg.num_register_tokens, dim), cfg.param_dtype,
        )
        self.patch_proj = LoraDense(dim, name="patch_proj", **dd)
        self.context_embedder = LoraDense(dim, use_bias=False,
                                          name="context_embedder", **dd)
        self.time_linear_1 = LoraDense(dim, name="time_linear_1", **dd)
        self.time_linear_2 = LoraDense(dim, name="time_linear_2", **dd)

        joint, single = AuraFlowJointBlock, AuraFlowSingleBlock
        if cfg.remat:
            joint = remat_wrap(joint, cfg.remat)
            single = remat_wrap(single, cfg.remat)
        self.joint_blocks = nn.scan(
            joint, variable_axes={"params": 0}, split_rngs={"params": True},
            in_axes=nn.broadcast, length=cfg.num_layers,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )(cfg)
        self.single_blocks = nn.scan(
            single, variable_axes={"params": 0}, split_rngs={"params": True},
            in_axes=nn.broadcast, length=cfg.num_single_layers,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )(cfg)
        self.norm_out_linear = LoraDense(2 * dim, use_bias=False,
                                         name="norm_out_linear", **dd)
        self.proj_out = LoraDense(
            cfg.patch_size * cfg.patch_size * cfg.out_channels,
            use_bias=False, name="proj_out_linear", **dd)

    def __call__(self, latents, encoder_hidden_states, timestep):
        """latents: [B, C, H, W]; encoder_hidden_states: [B, S, joint_dim];
        timestep: [B] in [0,1]."""
        cfg = self.config
        b, c, hh, ww = latents.shape
        p = cfg.patch_size
        hp, wp = hh // p, ww // p

        # patchify: [B, hp*wp, p*p*C]
        x = latents.reshape(b, c, hp, p, wp, p)
        x = jnp.einsum("bchpwq->bhwpqc", x).reshape(b, hp * wp, p * p * c)
        x = self.patch_proj(x.astype(cfg.dtype))
        sel = pe_selection_indices(cfg.pos_embed_max_size, hp, wp)
        x = x + jnp.asarray(self.pos_embed, cfg.dtype)[:, sel]

        # Timesteps(256, flip_sin_to_cos, shift=0, scale=1000) -> MLP
        temb = sinusoidal_timestep_embedding(
            timestep.astype(jnp.float32), 256, scale=1000.0
        )
        temb = self.time_linear_2(nn.silu(self.time_linear_1(
            temb.astype(cfg.dtype))))

        ctx = self.context_embedder(encoder_hidden_states.astype(cfg.dtype))
        reg = jnp.broadcast_to(
            jnp.asarray(self.register_tokens, cfg.dtype),
            (b, cfg.num_register_tokens, cfg.hidden_size),
        )
        ctx = jnp.concatenate([reg, ctx], axis=1)

        (x, ctx), _ = self.joint_blocks((x, ctx), temb)
        combined = jnp.concatenate([ctx, x], axis=1)
        combined, _ = self.single_blocks(combined, temb)
        out = combined[:, ctx.shape[1]:]

        # AuraFlowPreFinalBlock: chunk order (scale, shift)
        mod = self.norm_out_linear(nn.silu(temb))
        scale, shift = jnp.split(mod, 2, axis=-1)
        out = modulate(layer_norm_no_affine(out, 1e-6), shift, scale)
        out = self.proj_out(out)

        # unpatchify
        out = out.reshape(b, hp, wp, p, p, cfg.out_channels)
        out = jnp.einsum("bhwpqc->bchpwq", out)
        return out.reshape(b, cfg.out_channels, hp * p, wp * p)


@register_model("auraflow")
class AuraFlowPipeline(BasePipeline):
    name = "auraflow"
    cacheable_text_embeddings = ("prompt_embeds",)

    def __init__(self, config):
        super().__init__(config)
        mc = self.model_config
        self.tdist = TimestepDistribution.from_model_config(mc)
        self.af_config = self._build_config()
        self.model = AuraFlowTransformer(self.af_config)

    def _build_config(self) -> AuraFlowConfig:
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
        if mc.get("pos_embed_max_size"):
            kwargs["pos_embed_max_size"] = int(mc["pos_embed_max_size"])
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
            return AuraFlowConfig.tiny(**kwargs)
        return AuraFlowConfig(**kwargs)

    def init_params(self, rng):
        cfg = self.af_config
        return jax.jit(self.model.init)(
            rng,
            jnp.zeros((1, cfg.in_channels, 8, 8)),
            jnp.zeros((1, 8, cfg.joint_attention_dim)),
            jnp.zeros((1,)),
        )

    def prepare_inputs(self, rng, batch, timestep_quantile=None):
        latents = batch["latents"].astype(jnp.float32)
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
        target = noise - latents  # reference auraflow.py:141-146
        model_inputs = dict(
            latents=x_t,
            encoder_hidden_states=batch["prompt_embeds"],
            timestep=t,
        )
        return model_inputs, target, mask

    def sample(self, params, width, height, key, num_steps=20,
               guidance_scale=1.0, **embeds):
        """Euler flow sampling through the training forward (reference
        CommonPipeline.sample, models/base.py:263-291). Returns latents
        [B, 4, h, w] (SDXL-arch VAE)."""
        from ..training.sampling import euler_flow_sample

        pe = embeds["prompt_embeds"]
        b = pe.shape[0]
        h, w = height // 8, width // 8
        c = self.af_config.in_channels

        def vel(x, t):
            return self.forward(params, dict(
                latents=x.astype(self.af_config.dtype),
                encoder_hidden_states=pe,
                timestep=t,
            )).astype(jnp.float32)

        return euler_flow_sample(
            vel, (b, c, h, w), key, num_steps=num_steps,
            guidance_scale=guidance_scale,
            shift=self.model_config.get("shift"),
        )

    def make_pp_program(self):
        """Pipeline-parallel program: joint then single block phases; the
        learned pos-embed crop + register tokens embed on stage 0, the
        pre-final modulation + unpatchify on the last stage. See
        parallel/model_pp.py."""
        return _AuraFlowPPProgram(self)

    def forward(self, params, model_inputs):
        return self.model.apply(params, **model_inputs)

    def load_weights(self):
        from .weights import load_safetensors_dir

        mc = self.model_config
        sd = load_safetensors_dir(mc["transformer_path"])
        sd = {k.removeprefix("model."): v for k, v in sd.items()}
        from .weights import merge_adapters_into_state_dict

        sd = merge_adapters_into_state_dict(
            sd, mc.get("merge_adapters", [])
        )
        return convert_diffusers_auraflow(sd, self.af_config)

    def get_call_vae_fn(self):
        # AuraFlow ships the SDXL-arch 4-channel VAE
        from .sdxl import SDXLPipeline

        return SDXLPipeline.get_call_vae_fn(self)

    def get_call_text_encoder_fns(self):
        mc = self.model_config
        if mc.get("_tiny", False):
            from ..data.bucketing import seed_from_hash

            cfg = self.af_config

            def te(caps):
                embs = []
                for cap in caps:
                    r = np.random.default_rng(seed_from_hash(cap))
                    embs.append(r.standard_normal(
                        (8, cfg.joint_attention_dim)).astype(np.float32))
                return {"prompt_embeds": np.stack(embs)}

            return [te]

        # Pile-T5 == UMT5 arch (reference auraflow.py:38-45)
        from .text_encoders import HFTextEncoder

        enc = HFTextEncoder(
            "t5", mc["text_encoder_path"],
            max_length=int(mc.get("max_sequence_length", 256)),
        )

        def fn(caps):
            return {"prompt_embeds": np.asarray(enc.encode(caps))}

        return [fn]


def convert_diffusers_auraflow(sd: Dict[str, np.ndarray], cfg: AuraFlowConfig):
    """diffusers AuraFlowTransformer2DModel state dict -> our stacked params.

    Key map mirrors the reference's loading path (models/auraflow.py:62-76,
    via convert_auraflow_transformer_checkpoint_to_diffusers)."""

    def lin(key, bias=True):
        d = {"kernel": np.ascontiguousarray(np.asarray(sd[key + ".weight"]).T)}
        if bias and key + ".bias" in sd:
            d["bias"] = np.asarray(sd[key + ".bias"])
        return d

    p: Dict[str, Any] = {
        "pos_embed": np.asarray(sd["pos_embed.pos_embed"]),
        "register_tokens": np.asarray(sd["register_tokens"]),
        "patch_proj": lin("pos_embed.proj"),
        "context_embedder": lin("context_embedder", bias=False),
        "time_linear_1": lin("time_step_proj.linear_1"),
        "time_linear_2": lin("time_step_proj.linear_2"),
        "norm_out_linear": lin("norm_out.linear", bias=False),
        "proj_out_linear": lin("proj_out", bias=False),
    }

    joint_map = {
        "norm1_linear": "norm1.linear",
        "norm1_context_linear": "norm1_context.linear",
        "attn_to_q": "attn.to_q",
        "attn_to_k": "attn.to_k",
        "attn_to_v": "attn.to_v",
        "attn_add_q": "attn.add_q_proj",
        "attn_add_k": "attn.add_k_proj",
        "attn_add_v": "attn.add_v_proj",
        "attn_to_out": "attn.to_out.0",
        "attn_to_add_out": "attn.to_add_out",
        "ff_linear_1": "ff.linear_1",
        "ff_linear_2": "ff.linear_2",
        "ff_out_projection": "ff.out_projection",
        "ff_context_linear_1": "ff_context.linear_1",
        "ff_context_linear_2": "ff_context.linear_2",
        "ff_context_out_projection": "ff_context.out_projection",
    }
    single_map = {
        "norm1_linear": "norm1.linear",
        "attn_to_q": "attn.to_q",
        "attn_to_k": "attn.to_k",
        "attn_to_v": "attn.to_v",
        "attn_to_out": "attn.to_out.0",
        "ff_linear_1": "ff.linear_1",
        "ff_linear_2": "ff.linear_2",
        "ff_out_projection": "ff.out_projection",
    }

    def stack(count, prefix, key_map):
        tree: Dict[str, Any] = {}
        for ours, theirs in key_map.items():
            ks = [np.ascontiguousarray(
                np.asarray(sd[f"{prefix}.{i}.{theirs}.weight"]).T)
                for i in range(count)]
            tree[ours] = {"kernel": np.stack(ks)}
        return tree

    p["joint_blocks"] = stack(cfg.num_layers, "joint_transformer_blocks",
                              joint_map)
    p["single_blocks"] = stack(cfg.num_single_layers,
                               "single_transformer_blocks", single_map)
    return {"params": p}


class _AuraFlowPPProgram:
    """PPProgram for AuraFlowTransformer (see parallel/model_pp.py).

    Raw-param re-expression of the __call__ split at the two block scans.
    Phase 1 payload: (x, ctx_emb, temb); phase 2 (after the [ctx, x]
    concat `pre`): (combined, temb).
    """

    def __init__(self, pipeline):
        from ..parallel.model_pp import PPPhase

        self.pipeline = pipeline
        cfg = pipeline.af_config
        self.cfg = cfg
        self.phases = [
            PPPhase("joint_blocks", cfg.num_layers, self._apply_joint),
            PPPhase("single_blocks", cfg.num_single_layers,
                    self._apply_single, pre=self._to_single_stream),
        ]

    def _apply_joint(self, p_i, payload, ctx):
        x, ce, temb = payload
        (x, ce), _ = AuraFlowJointBlock(self.cfg).apply(
            {"params": p_i}, (x, ce), temb)
        return (x, ce, temb)

    def _to_single_stream(self, payload, ctx):
        x, ce, temb = payload
        return (jnp.concatenate([ce, x], axis=1), temb)

    def _apply_single(self, p_i, payload, ctx):
        combined, temb = payload
        combined, _ = AuraFlowSingleBlock(self.cfg).apply(
            {"params": p_i}, combined, temb)
        return (combined, temb)

    def make_ctx(self, p_rest, mi0):
        cfg = self.cfg
        _b, _c, hh, ww = mi0["latents"].shape
        p = cfg.patch_size
        hp, wp = hh // p, ww // p
        ctx_len = (cfg.num_register_tokens
                   + mi0["encoder_hidden_states"].shape[1])
        return {"grid": (hp, wp), "hw": (hh, ww), "ctx_len": ctx_len}

    def embed(self, p_rest, mi, ctx):
        cfg = self.cfg
        dim = cfg.hidden_size
        p = cfg.patch_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        latents = mi["latents"]
        b, c = latents.shape[:2]
        hp, wp = ctx["grid"]

        x = latents.reshape(b, c, hp, p, wp, p)
        x = jnp.einsum("bchpwq->bhwpqc", x).reshape(b, hp * wp, p * p * c)
        x = LoraDense(dim, **dd).apply(
            {"params": p_rest["patch_proj"]}, x.astype(cfg.dtype))
        sel = pe_selection_indices(cfg.pos_embed_max_size, hp, wp)
        x = x + jnp.asarray(p_rest["pos_embed"], cfg.dtype)[:, sel]

        temb = sinusoidal_timestep_embedding(
            mi["timestep"].astype(jnp.float32), 256, scale=1000.0)
        temb = LoraDense(dim, **dd).apply(
            {"params": p_rest["time_linear_1"]}, temb.astype(cfg.dtype))
        temb = LoraDense(dim, **dd).apply(
            {"params": p_rest["time_linear_2"]}, nn.silu(temb))

        ce = LoraDense(dim, use_bias=False, **dd).apply(
            {"params": p_rest["context_embedder"]},
            mi["encoder_hidden_states"].astype(cfg.dtype))
        reg = jnp.broadcast_to(
            jnp.asarray(p_rest["register_tokens"], cfg.dtype),
            (b, cfg.num_register_tokens, dim),
        )
        ce = jnp.concatenate([reg, ce], axis=1)
        return (x, ce, temb)

    def head_loss(self, p_rest, payload, target, mask, ctx):
        cfg = self.cfg
        dim = cfg.hidden_size
        p = cfg.patch_size
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        hp, wp = ctx["grid"]
        hh, ww = ctx["hw"]
        combined, temb = payload
        b = combined.shape[0]

        out = combined[:, ctx["ctx_len"]:]
        mod = LoraDense(2 * dim, use_bias=False, **dd).apply(
            {"params": p_rest["norm_out_linear"]}, nn.silu(temb))
        scale, shift = jnp.split(mod, 2, axis=-1)
        out = modulate(layer_norm_no_affine(out, 1e-6), shift, scale)
        out = LoraDense(p * p * cfg.out_channels, use_bias=False, **dd).apply(
            {"params": p_rest["proj_out_linear"]}, out)
        out = out.reshape(b, hp, wp, p, p, cfg.out_channels)
        out = jnp.einsum("bhwpqc->bchpwq", out)
        out = out.reshape(b, cfg.out_channels, hp * p, wp * p)
        return self.pipeline.loss_fn(out, target, mask)
