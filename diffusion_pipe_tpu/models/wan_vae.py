"""Wan 2.1 3D causal video VAE (encoder + decoder) in Flax.

Re-implements the reference's vendored Alibaba VAE (models/wan/vae2_1.py):
CausalConv3d with 2-frame temporal left-context, RMS-norm residual blocks,
single-head spatial attention at the bottleneck, temporal downsampling via
stride-2 time convs and upsampling via channel-doubling time convs, and the
exact 1+4k temporal chunking scheme of WanVAE_.encode/decode (vae2_1.py:
505-560) — the chunk recurrence IS the model's math (a single full-clip pass
gives different temporal downsampling), so here the per-conv feature caches
become explicit functional state threaded through chunk calls
(SURVEY.md section 7.4: "stateful conv caches become scan carries").

Layout: [B, T, H, W, C] (TPU conv-friendly); wrapper converts from/to the
reference's [B, C, T, H, W].
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CACHE_T = 2

WAN21_LATENT_MEAN = [
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
]
WAN21_LATENT_STD = [
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
]


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = ()
    temperal_downsample: Tuple[bool, ...] = (True, True, False)
    dtype: Any = jnp.float32

    @staticmethod
    def wan21():
        return WanVAEConfig()

    @staticmethod
    def tiny():
        return WanVAEConfig(dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                            temperal_downsample=(True,))


class Cache:
    """Mutable ordered cache list emulating the reference feat_cache/feat_idx
    protocol. Values are arrays [B, 2or1, H, W, C] or the sentinel 'Rep'."""

    def __init__(self, values: Optional[List] = None):
        self.values = list(values) if values is not None else []
        self.idx = 0
        self.init_mode = values is None

    def next(self, default=None):
        if self.init_mode:
            self.values.append(default)
            self.idx += 1
            return default
        v = self.values[self.idx]
        self.idx += 1
        return v

    def update(self, value):
        self.values[self.idx - 1] = value


class CausalConv3d(nn.Module):
    """k=(3,3,3) (or (3,1,1)) causal conv; temporal left-context via cache."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cache: Optional[Cache]):
        kt, kh, kw = self.kernel
        time_pad = 2 * (kt // 2)
        b, t, h, w, c = x.shape
        if time_pad > 0:
            if cache is not None:
                prev = cache.next(jnp.zeros((b, CACHE_T, h, w, c), x.dtype))
                if prev is None:
                    prev = jnp.zeros((b, CACHE_T, h, w, c), x.dtype)
                full = jnp.concatenate([prev, x], axis=1)
                cache.update(full[:, -CACHE_T:])
                x = full
            else:
                x = jnp.pad(x, ((0, 0), (time_pad, 0), (0, 0), (0, 0), (0, 0)))
        pad_h = (kh // 2, kh // 2)
        pad_w = (kw // 2, kw // 2)
        return nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=((0, 0), pad_h, pad_w), dtype=self.dtype, name="conv",
        )(x)


class RMSNormSpatial(nn.Module):
    """reference RMS_norm (vae2_1.py:35-50): F.normalize * sqrt(dim) * gamma."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones_init(), (dim,))
        xf = x.astype(jnp.float32)
        norm = xf * jax.lax.rsqrt(
            jnp.sum(xf * xf, axis=-1, keepdims=True) + 1e-12
        )
        return (norm * (dim**0.5) * gamma).astype(x.dtype)


class ResidualBlock3d(nn.Module):
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cache: Optional[Cache]):
        in_dim = x.shape[-1]
        h = RMSNormSpatial(self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = CausalConv3d(self.out_dim, dtype=self.dtype, name="conv1")(h, cache)
        h = RMSNormSpatial(self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = CausalConv3d(self.out_dim, dtype=self.dtype, name="conv2")(h, cache)
        if in_dim != self.out_dim:
            x = CausalConv3d(self.out_dim, kernel=(1, 1, 1),
                             dtype=self.dtype, name="shortcut")(x, None)
        return x + h


class AttentionBlock2d(nn.Module):
    """Single-head spatial attention per frame (vae2_1.py:219-258)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        y = RMSNormSpatial(self.dtype, name="norm")(x)
        y = y.reshape(b * t, h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="to_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(c).astype(q.dtype), -1
        )
        y = jnp.einsum("bqk,bkc->bqc", attn, v)
        y = nn.Dense(c, dtype=self.dtype, name="proj",
                     kernel_init=nn.initializers.zeros_init())(y)
        return x + y.reshape(b, t, h, w, c)


class _SpatialDown(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        y = x.reshape(b * t, h, w, c)
        y = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)))
        y = nn.Conv(c, (3, 3), strides=2, padding="VALID", dtype=self.dtype,
                    name="conv")(y)
        return y.reshape(b, t, h // 2, w // 2, c)


class _TimeDown(nn.Module):
    """stride-2 time conv, k=3, with 1-frame cache (vae2_1.py:141-157)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cache: Optional[Cache]):
        b, t, h, w, c = x.shape
        conv = nn.Conv(c, (3, 1, 1), strides=(2, 1, 1), padding="VALID",
                       dtype=self.dtype, name="time_conv")
        if cache is None:
            # cacheless: used only via chunk driver; shouldn't happen
            return conv(x)
        prev = cache.next(None)
        if prev is None:
            # first chunk (1 frame): no conv, cache the frame
            cache.update(x)
            # params must exist on init pass: trace conv on a dummy
            if self.is_initializing():
                conv(jnp.concatenate([x, x, x], axis=1))
            return x
        y = conv(jnp.concatenate([prev[:, -1:], x], axis=1))
        cache.update(x[:, -1:])
        return y


class Encoder3d(nn.Module):
    config: WanVAEConfig

    @nn.compact
    def __call__(self, x, cache: Optional[Cache]):
        cfg = self.config
        dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
        scale = 1.0
        h = CausalConv3d(dims[0], dtype=cfg.dtype, name="conv1")(x, cache)
        li = 0
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            for _ in range(cfg.num_res_blocks):
                h = ResidualBlock3d(out_dim, cfg.dtype,
                                    name=f"down_{li}")(h, cache)
                li += 1
                if scale in cfg.attn_scales:
                    h = AttentionBlock2d(cfg.dtype, name=f"down_{li}")(h)
                    li += 1
            if i != len(cfg.dim_mult) - 1:
                if cfg.temperal_downsample[i]:
                    h = _SpatialDown(cfg.dtype, name=f"down_{li}_s")(h)
                    h = _TimeDown(cfg.dtype, name=f"down_{li}_t")(h, cache)
                else:
                    h = _SpatialDown(cfg.dtype, name=f"down_{li}_s")(h)
                li += 1
                scale /= 2.0
        h = ResidualBlock3d(dims[-1], cfg.dtype, name="mid_res_0")(h, cache)
        h = AttentionBlock2d(cfg.dtype, name="mid_attn")(h)
        h = ResidualBlock3d(dims[-1], cfg.dtype, name="mid_res_1")(h, cache)
        h = RMSNormSpatial(cfg.dtype, name="head_norm")(h)
        h = nn.silu(h)
        h = CausalConv3d(2 * cfg.z_dim, dtype=cfg.dtype, name="head_conv")(
            h, cache
        )
        return h


class _TimeUp(nn.Module):
    """Channel-doubling causal time conv for temporal upsampling
    (Resample upsample3d, vae2_1.py:99-137). First chunk passes through
    untouched ('Rep' sentinel); later 1-frame chunks double to 2 frames."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cache: Optional[Cache]):
        b, t, h, w, c = x.shape
        conv = nn.Conv(2 * c, (3, 1, 1), padding="VALID", dtype=self.dtype,
                       name="time_conv")

        def doubled(y):
            # [B, T, H, W, 2C] -> interleave channel halves as time steps
            y = y.reshape(b, -1, h, w, 2, c)
            return jnp.transpose(y, (0, 1, 4, 2, 3, 5)).reshape(
                b, -1, h, w, c
            )

        prev = cache.next("Rep") if cache is not None else None
        if isinstance(prev, str):  # 'Rep' sentinel
            if cache.init_mode:
                # first chunk: no temporal upsample; create params for init
                if self.is_initializing():
                    conv(jnp.concatenate([x, x, x], axis=1))
                return x
            # second chunk: zero left-context (vae2_1.py:117-126 'Rep' branch)
            y = conv(jnp.pad(x, ((0, 0), (2, 0), (0, 0), (0, 0), (0, 0))))
            zx = jnp.concatenate([jnp.zeros_like(x[:, -1:]), x], axis=1)
            cache.update(zx[:, -CACHE_T:])
            return doubled(y)
        full = jnp.concatenate([prev, x], axis=1)
        cache.update(full[:, -CACHE_T:])
        y = conv(full)
        return doubled(y)


class _SpatialUp(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        y = x.reshape(b * t, h, w, c).astype(jnp.float32)
        y = jax.image.resize(y, (b * t, h * 2, w * 2, c), "nearest")
        y = nn.Conv(c // 2, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(y.astype(x.dtype))
        return y.reshape(b, t, h * 2, w * 2, c // 2)


class Decoder3d(nn.Module):
    config: WanVAEConfig

    @nn.compact
    def __call__(self, z, cache: Optional[Cache]):
        cfg = self.config
        dims = [cfg.dim * u for u in (cfg.dim_mult[-1],) + tuple(
            reversed(cfg.dim_mult)
        )]
        temperal_upsample = tuple(reversed(cfg.temperal_downsample))
        h = CausalConv3d(dims[0], dtype=cfg.dtype, name="conv1")(z, cache)
        h = ResidualBlock3d(dims[0], cfg.dtype, name="mid_res_0")(h, cache)
        h = AttentionBlock2d(cfg.dtype, name="mid_attn")(h)
        h = ResidualBlock3d(dims[0], cfg.dtype, name="mid_res_1")(h, cache)
        li = 0
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            for _ in range(cfg.num_res_blocks + 1):
                h = ResidualBlock3d(out_dim, cfg.dtype,
                                    name=f"up_{li}")(h, cache)
                li += 1
            if i != len(cfg.dim_mult) - 1:
                if temperal_upsample[i]:
                    h = _TimeUp(cfg.dtype, name=f"up_{li}_t")(h, cache)
                h = _SpatialUp(cfg.dtype, name=f"up_{li}_s")(h)
                li += 1
        h = RMSNormSpatial(cfg.dtype, name="head_norm")(h)
        h = nn.silu(h)
        return CausalConv3d(3, dtype=cfg.dtype, name="head_conv")(h, cache)


class WanVideoVAE(nn.Module):
    """Chunked encode matching WanVAE_.encode (vae2_1.py:511-538).

    encode(video [B, C, T, H, W] in [-1,1], T = 1 + 4k) ->
    latents [B, z, 1+k, H/8, W/8], normalized (mu - mean) / std.
    """

    config: WanVAEConfig

    def setup(self):
        self.encoder = Encoder3d(self.config)
        self.quant_conv = CausalConv3d(
            2 * self.config.z_dim, kernel=(1, 1, 1), dtype=self.config.dtype,
            name="conv1_quant",
        )
        self.decoder = Decoder3d(self.config)
        self.post_quant_conv = CausalConv3d(
            self.config.z_dim, kernel=(1, 1, 1), dtype=self.config.dtype,
        )

    def _encode_chunks(self, x):
        """x: [B, T, H, W, C]."""
        t = x.shape[1]
        n_chunks = 1 + (t - 1) // 4
        cache = Cache()  # init mode: first chunk populates structure
        outs = [self.encoder(x[:, :1], cache)]
        cache.init_mode = False
        for i in range(n_chunks - 1):
            cache.idx = 0
            outs.append(self.encoder(x[:, 1 + 4 * i : 1 + 4 * (i + 1)], cache))
        return jnp.concatenate(outs, axis=1)

    def encode(self, video, rng: Optional[jax.Array] = None):
        cfg = self.config
        x = jnp.transpose(video, (0, 2, 3, 4, 1)).astype(cfg.dtype)
        moments = self._encode_chunks(x)
        moments = self.quant_conv(moments, None)
        mu, log_var = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            std = jnp.exp(0.5 * jnp.clip(log_var, -30.0, 20.0))
            mu = mu + std * jax.random.normal(rng, mu.shape, mu.dtype)
        if cfg.z_dim == 16:
            mean = jnp.asarray(WAN21_LATENT_MEAN, mu.dtype)
            std_c = jnp.asarray(WAN21_LATENT_STD, mu.dtype)
            mu = (mu - mean) / std_c
        return jnp.transpose(mu, (0, 4, 1, 2, 3))  # [B, z, T', H', W']

    def decode(self, latents):
        """latents [B, z, T', H', W'] (normalized) -> video [B, 3, T, H, W]
        in [-1, 1]; one latent frame per decoder chunk (WanVAE_.decode,
        vae2_1.py:540-560)."""
        cfg = self.config
        z = jnp.transpose(latents, (0, 2, 3, 4, 1)).astype(cfg.dtype)
        if cfg.z_dim == 16:
            mean = jnp.asarray(WAN21_LATENT_MEAN, z.dtype)
            std_c = jnp.asarray(WAN21_LATENT_STD, z.dtype)
            z = z * std_c + mean
        z = self.post_quant_conv(z, None)
        cache = Cache()
        outs = [self.decoder(z[:, :1], cache)]
        cache.init_mode = False
        for i in range(1, z.shape[1]):
            cache.idx = 0
            outs.append(self.decoder(z[:, i : i + 1], cache))
        x = jnp.concatenate(outs, axis=1)
        x = jnp.clip(x, -1.0, 1.0)
        return jnp.transpose(x, (0, 4, 1, 2, 3))

    def __call__(self, video):
        # init both encoder and decoder params
        z = self.encode(video)
        return self.decode(z)
