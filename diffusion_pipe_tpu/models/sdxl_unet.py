"""SDXL UNet (diffusers UNet2DConditionModel architecture) in Flax, NHWC.

The reference drives diffusers' torch UNet sliced into ~30 pipeline layers
(models/sdxl.py:589-975 wrappers). Here it is a native Flax module: three
down stages (plain / depth-2 cross-attn / depth-10 cross-attn), a depth-10
mid block, mirrored up stages with skip concats, SDXL's combined
time + (pooled-text, time_ids) additive conditioning, and LoRA on every
linear inside the transformer blocks (the reference's PEFT targets).

Structure names mirror diffusers keys so the weight converter is mechanical.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from .layers import LoraDense, remat_wrap, sinusoidal_timestep_embedding


@dataclasses.dataclass(frozen=True)
class SDXLConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280)
    layers_per_block: int = 2
    transformer_layers: Tuple[int, ...] = (0, 2, 10)  # per down stage
    attention_head_dim: int = 64
    cross_attention_dim: int = 2048
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816  # 1280 + 6*256
    norm_groups: int = 32
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16
    lora_rank: int = 0
    lora_alpha: float = 0.0
    lora_dropout: float = 0.0
    lora_dtype: Any = jnp.float32
    lora_type: str = "lora"
    lokr_factor: int = -1
    lokr_rank_dropout: float = 0.0
    remat: bool = False

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @property
    def lora_kwargs(self) -> dict:
        return dict(
            lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            lora_dropout=self.lora_dropout, lora_dtype=self.lora_dtype,
            lora_type=self.lora_type, lokr_factor=self.lokr_factor,
            lokr_rank_dropout=self.lokr_rank_dropout,
        )

    @staticmethod
    def tiny(**kw):
        d = dict(
            block_out_channels=(16, 32, 32),
            transformer_layers=(0, 1, 2),
            attention_head_dim=8,
            cross_attention_dim=32,
            projection_class_embeddings_input_dim=16 + 6 * 256,
            norm_groups=8,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )
        d.update(kw)
        return SDXLConfig(**d)


class ResnetBlock2D(nn.Module):
    out_channels: int
    config: SDXLConfig

    @nn.compact
    def __call__(self, x, temb):
        cfg = self.config
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=cfg.norm_groups, epsilon=1e-5,
                         name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="conv1")(h)
        t = LoraDense(self.out_channels, dtype=cfg.dtype,
                      param_dtype=cfg.param_dtype, name="time_emb_proj")(
            nn.silu(temb)
        )
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=cfg.norm_groups, epsilon=1e-5,
                         name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype, name="conv_shortcut")(x)
        return x + h


class BasicTransformerBlock(nn.Module):
    dim: int
    config: SDXLConfig

    @nn.compact
    def __call__(self, x, context):
        cfg = self.config
        heads = self.dim // cfg.attention_head_dim
        hd = cfg.attention_head_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        lora = cfg.lora_kwargs
        b, s, _ = x.shape

        def attn(y, ctx, prefix):
            lc = ctx.shape[1]
            q = LoraDense(self.dim, use_bias=False, name=f"{prefix}_to_q",
                          **dd, **lora)(y).reshape(b, s, heads, hd)
            k = LoraDense(self.dim, use_bias=False, name=f"{prefix}_to_k",
                          **dd, **lora)(ctx).reshape(b, lc, heads, hd)
            v = LoraDense(self.dim, use_bias=False, name=f"{prefix}_to_v",
                          **dd, **lora)(ctx).reshape(b, lc, heads, hd)
            o = dot_product_attention(q, k, v).reshape(b, s, self.dim)
            return LoraDense(self.dim, name=f"{prefix}_to_out", **dd, **lora)(o)

        # self attention
        y = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="norm1")(x)
        x = x + attn(y, y, "attn1")
        # cross attention
        y = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="norm2")(x)
        x = x + attn(y, context, "attn2")
        # GEGLU feed-forward
        y = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="norm3")(x)
        y = LoraDense(8 * self.dim, name="ff_proj", **dd, **lora)(y)
        a, g = jnp.split(y, 2, axis=-1)
        y = a * nn.gelu(g)
        x = x + LoraDense(self.dim, name="ff_out", **dd, **lora)(y)
        return x


class Transformer2DModel(nn.Module):
    dim: int
    depth: int
    config: SDXLConfig

    @nn.compact
    def __call__(self, x, context):
        cfg = self.config
        b, h, w, c = x.shape
        res = x
        y = nn.GroupNorm(num_groups=cfg.norm_groups, epsilon=1e-6,
                         name="norm")(x)
        y = y.reshape(b, h * w, c)
        y = LoraDense(self.dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                      name="proj_in")(y)
        for i in range(self.depth):
            y = BasicTransformerBlock(self.dim, cfg, name=f"block_{i}")(
                y, context
            )
        y = LoraDense(self.dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                      name="proj_out")(y)
        return res + y.reshape(b, h, w, self.dim)


class SDXLUNet(nn.Module):
    config: SDXLConfig

    @nn.compact
    def __call__(
        self,
        sample,            # [B, 4, H, W] noisy latents (NCHW like reference)
        timesteps,         # [B] int
        encoder_hidden_states,  # [B, 77*, 2048] concat CLIP-L+G penultimates
        add_text_embeds,   # [B, 1280] pooled CLIP-G
        add_time_ids,      # [B, 6]
    ):
        cfg = self.config
        ted = cfg.time_embed_dim
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        x = jnp.transpose(sample, (0, 2, 3, 1)).astype(cfg.dtype)

        # time + added conditioning embeddings (diffusers text_time path)
        t_proj = sinusoidal_timestep_embedding(
            timesteps.astype(jnp.float32), cfg.block_out_channels[0],
            flip_sin_to_cos=True, downscale_freq_shift=0.0,
        )
        temb = LoraDense(ted, name="time_embedding_1", **dd)(
            t_proj.astype(cfg.dtype)
        )
        temb = LoraDense(ted, name="time_embedding_2", **dd)(nn.silu(temb))
        ids_proj = sinusoidal_timestep_embedding(
            add_time_ids.reshape(-1).astype(jnp.float32),
            cfg.addition_time_embed_dim, flip_sin_to_cos=True,
            downscale_freq_shift=0.0,
        ).reshape(add_time_ids.shape[0], -1)
        add_embeds = jnp.concatenate(
            [add_text_embeds.astype(jnp.float32), ids_proj], axis=-1
        )
        aemb = LoraDense(ted, name="add_embedding_1", **dd)(
            add_embeds.astype(cfg.dtype)
        )
        aemb = LoraDense(ted, name="add_embedding_2", **dd)(nn.silu(aemb))
        temb = temb + aemb

        ctx = encoder_hidden_states.astype(cfg.dtype)
        chs = cfg.block_out_channels

        # activation checkpointing: remat each resnet/transformer sub-block
        # (reference checkpoints per wrapped layer, train.py:578-594)
        Res, Attn = ResnetBlock2D, Transformer2DModel
        if cfg.remat:
            Res = remat_wrap(Res, cfg.remat)
            Attn = remat_wrap(Attn, cfg.remat)

        h = nn.Conv(chs[0], (3, 3), padding=1, name="conv_in", **dd)(x)
        skips = [h]

        # down blocks
        for i, ch in enumerate(chs):
            depth = cfg.transformer_layers[i]
            for j in range(cfg.layers_per_block):
                h = Res(ch, cfg, name=f"down_{i}_res_{j}")(h, temb)
                if depth > 0:
                    h = Attn(
                        ch, depth, cfg, name=f"down_{i}_attn_{j}"
                    )(h, ctx)
                skips.append(h)
            if i < len(chs) - 1:
                h = nn.Conv(ch, (3, 3), strides=2, padding=1,
                            name=f"down_{i}_downsample", **dd)(h)
                skips.append(h)

        # mid
        h = Res(chs[-1], cfg, name="mid_res_0")(h, temb)
        h = Attn(chs[-1], cfg.transformer_layers[-1], cfg,
                   name="mid_attn")(h, ctx)
        h = Res(chs[-1], cfg, name="mid_res_1")(h, temb)

        # up blocks (reversed channels, skip concat, 3 resnets per stage)
        rev = list(reversed(chs))
        for i, ch in enumerate(rev):
            depth = list(reversed(cfg.transformer_layers))[i]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = Res(ch, cfg, name=f"up_{i}_res_{j}")(h, temb)
                if depth > 0:
                    h = Attn(
                        ch, depth, cfg, name=f"up_{i}_attn_{j}"
                    )(h, ctx)
            if i < len(rev) - 1:
                b_, hh, ww, c_ = h.shape
                h = jax.image.resize(h, (b_, hh * 2, ww * 2, c_), "nearest")
                h = nn.Conv(c_, (3, 3), padding=1,
                            name=f"up_{i}_upsample", **dd)(h)

        h = nn.GroupNorm(num_groups=cfg.norm_groups, epsilon=1e-5,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, name="conv_out",
                    **dd)(h)
        return jnp.transpose(h, (0, 3, 1, 2))
