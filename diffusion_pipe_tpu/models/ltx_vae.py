"""LTX-Video causal VAE (CausalVideoAutoencoder family).

Reference: the LTX_Video submodule's VAE consumed by models/ltx_video.py
(vae loading + first-frame conditioning path). Core structure implemented
from the public architecture: 4x4 spatial patchify (pixel-unshuffle) in
front of the conv stack, causal 3D convs (time-front replicate pad),
PIXEL-RMS-normalized resnets (per-pixel channel RMS norm, no affine),
stride-2 spatio-temporal downsampling on the scaled blocks, a 4-resnet mid
block (no attention), 128 latent channels with PER-CHANNEL latents
mean/std normalization. Overall compression 32x spatial (4 patchify x 3
strided) / 8x temporal; causal frame count F = 8*(Fl-1) + 1.

Exact per-version block internals and checkpoint key layout (0.9.x
variants differ) are flagged for verification against real weights — the
converter handles the diffusers 0.9.0 naming and should be checked before
production loads. Encoding for the latent cache is the training-path
deliverable (reference ltx_video.py get_call_vae_fn).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .hunyuan_vae import CausalConv3dR

Dtype = Any


@dataclasses.dataclass(frozen=True)
class LTXVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 128
    patch_size: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: Tuple[int, ...] = (4, 3, 3, 3, 4)  # last = mid block
    spatio_temporal_scaling: Tuple[bool, ...] = (True, True, True, False)
    scaling_factor: float = 1.0
    dtype: Any = jnp.float32

    @staticmethod
    def tiny():
        return LTXVAEConfig(
            latent_channels=16, patch_size=2,
            block_out_channels=(8, 16, 16, 16),
            layers_per_block=(1, 1, 1, 1, 1),
        )


def _pixel_rms(x, eps=1e-8):
    """Per-pixel channel RMS norm, no affine (LTX pixel_norm)."""
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)).astype(x.dtype)


class LTXResnet(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _pixel_rms(x)
        h = nn.silu(h)
        h = CausalConv3dR(self.out_channels, dtype=self.dtype, name="conv1")(h)
        h = _pixel_rms(h)
        h = nn.silu(h)
        h = CausalConv3dR(self.out_channels, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


def _patchify(x, p):
    """(B,T,H,W,C) -> (B,T,H/p,W/p,C*p*p) pixel-unshuffle."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t, h // p, p, w // p, p, c)
    return jnp.transpose(x, (0, 1, 2, 4, 3, 5, 6)).reshape(
        b, t, h // p, w // p, c * p * p)


def _unpatchify(x, p, out_c):
    b, t, h, w, c = x.shape
    x = x.reshape(b, t, h, w, p, p, out_c)
    x = jnp.transpose(x, (0, 1, 2, 4, 3, 5, 6))
    return x.reshape(b, t, h * p, w * p, out_c)


class LTXVAEEncoder(nn.Module):
    config: LTXVAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        chans = cfg.block_out_channels
        h = _patchify(x, cfg.patch_size)
        h = CausalConv3dR(chans[0], dtype=cfg.dtype, name="conv_in")(h)
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block[i]):
                h = LTXResnet(ch, dtype=cfg.dtype, name=f"down_{i}_res_{j}")(h)
            if cfg.spatio_temporal_scaling[i]:
                h = CausalConv3dR(ch, strides=(2, 2, 2), dtype=cfg.dtype,
                                  name=f"down_{i}_downsample")(h)
            if i + 1 < len(chans) and ch != chans[i + 1]:
                h = LTXResnet(chans[i + 1], dtype=cfg.dtype,
                              name=f"down_{i}_conv_out")(h)
        for j in range(cfg.layers_per_block[-1]):
            h = LTXResnet(chans[-1], dtype=cfg.dtype, name=f"mid_res_{j}")(h)
        h = _pixel_rms(h)
        h = nn.silu(h)
        return CausalConv3dR(2 * cfg.latent_channels, dtype=cfg.dtype,
                             name="conv_out")(h)


class LTXVAEDecoder(nn.Module):
    config: LTXVAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        chans = tuple(reversed(cfg.block_out_channels))
        scaling = tuple(reversed(cfg.spatio_temporal_scaling))
        h = CausalConv3dR(chans[0], dtype=cfg.dtype, name="conv_in")(z)
        for j in range(cfg.layers_per_block[-1]):
            h = LTXResnet(chans[0], dtype=cfg.dtype, name=f"mid_res_{j}")(h)
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block[len(chans) - 1 - i]):
                h = LTXResnet(ch, dtype=cfg.dtype, name=f"up_{i}_res_{j}")(h)
            if scaling[i]:
                h = jnp.repeat(jnp.repeat(h, 2, axis=2), 2, axis=3)
                first, rest = h[:, :1], h[:, 1:]
                h = jnp.concatenate(
                    [first, jnp.repeat(rest, 2, axis=1)], axis=1)
                h = CausalConv3dR(ch, dtype=cfg.dtype,
                                  name=f"up_{i}_upsample")(h)
            if i + 1 < len(chans) and ch != chans[i + 1]:
                h = LTXResnet(chans[i + 1], dtype=cfg.dtype,
                              name=f"up_{i}_conv_out")(h)
        h = _pixel_rms(h)
        h = nn.silu(h)
        h = CausalConv3dR(cfg.out_channels * cfg.patch_size ** 2,
                          dtype=cfg.dtype, name="conv_out")(h)
        return _unpatchify(h, cfg.patch_size, cfg.out_channels)


class LTXVideoVAE(nn.Module):
    """encode/decode over (B, C, F, H, W); latents normalized by the
    per-channel stats (z - mean) / std like the reference pipeline."""

    config: LTXVAEConfig

    def setup(self):
        self.encoder = LTXVAEEncoder(self.config)
        self.decoder = LTXVAEDecoder(self.config)
        self.latents_mean = self.param(
            "latents_mean", nn.initializers.zeros_init(),
            (self.config.latent_channels,), jnp.float32)
        self.latents_std = self.param(
            "latents_std", nn.initializers.ones_init(),
            (self.config.latent_channels,), jnp.float32)

    def encode(self, pixels, rng: Optional[jax.Array] = None):
        x = jnp.transpose(pixels, (0, 2, 3, 4, 1))
        moments = self.encoder(x)
        moments = jnp.transpose(moments, (0, 4, 1, 2, 3))
        mean, logvar = jnp.split(moments, 2, axis=1)
        if rng is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            mean = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        stats_shape = (1, -1, 1, 1, 1)
        return (mean - self.latents_mean.reshape(stats_shape)) / \
            self.latents_std.reshape(stats_shape)

    def decode(self, latents):
        stats_shape = (1, -1, 1, 1, 1)
        z = latents * self.latents_std.reshape(stats_shape) + \
            self.latents_mean.reshape(stats_shape)
        z = jnp.transpose(z, (0, 2, 3, 4, 1))
        out = self.decoder(z)
        return jnp.transpose(out, (0, 4, 1, 2, 3))

    def __call__(self, pixels):
        return self.decode(self.encode(pixels))
