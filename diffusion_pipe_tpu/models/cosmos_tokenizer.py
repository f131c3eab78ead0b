"""Cosmos-1 continuous video tokenizer (CV8x8x8 family).

Reference: the Cosmos submodule's CausalContinuousVideoTokenizer consumed
by models/cosmos.py (EDM training caches its latents). Core structure:
causal 3D convs, three stride-(2,2,2) stages for 8x temporal / 8x spatial
compression, GroupNorm resnets, per-frame spatial attention at the
bottleneck, CONTINUOUS formulation (the encoder emits the latent directly,
no KL moments), 16 latent channels; causal frame count F = 8*(Fl-1) + 1.

Exact NVIDIA block internals (wavelet patcher variants) are flagged for
verification against real weights; load pre-converted flax params via
model.vae_params_path. Encoding for the latent cache is the training-path
deliverable (reference cosmos.py get_call_vae_fn).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .hunyuan_vae import CausalConv3dR, HVResnet, HVSpatialAttention

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CosmosTokenizerConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    temporal_downsamples: int = 3   # 8x temporal (CV8x8x8)
    sigma_data: float = 0.5
    dtype: Any = jnp.float32

    @staticmethod
    def tiny():
        return CosmosTokenizerConfig(
            block_out_channels=(8, 16, 16, 16), layers_per_block=1,
            latent_channels=4,
        )


class CosmosTokenizerEncoder(nn.Module):
    config: CosmosTokenizerConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        chans = cfg.block_out_channels
        h = CausalConv3dR(chans[0], dtype=cfg.dtype, name="conv_in")(x)
        n = len(chans)
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block):
                h = HVResnet(ch, dtype=cfg.dtype, name=f"down_{i}_res_{j}")(h)
            if i < n - 1:
                tstride = 2 if i >= n - 1 - cfg.temporal_downsamples else 1
                h = CausalConv3dR(ch, strides=(tstride, 2, 2),
                                  dtype=cfg.dtype,
                                  name=f"down_{i}_downsample")(h)
        h = HVResnet(chans[-1], dtype=cfg.dtype, name="mid_res_0")(h)
        h = HVSpatialAttention(dtype=cfg.dtype, name="mid_attn")(h)
        h = HVResnet(chans[-1], dtype=cfg.dtype, name="mid_res_1")(h)
        h = nn.GroupNorm(num_groups=min(32, h.shape[-1]), epsilon=1e-6,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        # continuous formulation: latent directly, no moments
        return CausalConv3dR(cfg.latent_channels, dtype=cfg.dtype,
                             name="conv_out")(h)


class CosmosTokenizerDecoder(nn.Module):
    config: CosmosTokenizerConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        chans = tuple(reversed(cfg.block_out_channels))
        h = CausalConv3dR(chans[0], dtype=cfg.dtype, name="conv_in")(z)
        h = HVResnet(chans[0], dtype=cfg.dtype, name="mid_res_0")(h)
        h = HVSpatialAttention(dtype=cfg.dtype, name="mid_attn")(h)
        h = HVResnet(chans[0], dtype=cfg.dtype, name="mid_res_1")(h)
        n = len(chans)
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block + 1):
                h = HVResnet(ch, dtype=cfg.dtype, name=f"up_{i}_res_{j}")(h)
            if i < n - 1:
                h = jnp.repeat(jnp.repeat(h, 2, axis=2), 2, axis=3)
                if i < cfg.temporal_downsamples:
                    first, rest = h[:, :1], h[:, 1:]
                    h = jnp.concatenate(
                        [first, jnp.repeat(rest, 2, axis=1)], axis=1)
                h = CausalConv3dR(ch, dtype=cfg.dtype,
                                  name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=min(32, h.shape[-1]), epsilon=1e-6,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return CausalConv3dR(cfg.out_channels, dtype=cfg.dtype,
                             name="conv_out")(h)


class CosmosVideoTokenizer(nn.Module):
    """encode/decode over (B, C, F, H, W)."""

    config: CosmosTokenizerConfig

    def setup(self):
        self.encoder = CosmosTokenizerEncoder(self.config)
        self.decoder = CosmosTokenizerDecoder(self.config)

    def encode(self, pixels):
        x = jnp.transpose(pixels, (0, 2, 3, 4, 1))
        z = self.encoder(x)
        return jnp.transpose(z, (0, 4, 1, 2, 3))

    def decode(self, latents):
        z = jnp.transpose(latents, (0, 2, 3, 4, 1))
        out = self.decoder(z)
        return jnp.transpose(out, (0, 4, 1, 2, 3))

    def __call__(self, pixels):
        return self.decode(self.encode(pixels))
