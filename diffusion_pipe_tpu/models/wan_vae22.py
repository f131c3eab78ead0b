"""Wan2.2 (ti2v-5B) video VAE in Flax (reference models/wan/vae2_2.py).

Differences from the 2.1 VAE (wan_vae.py, whose primitives are reused):
- input is 2x2 spatially patchified to 12 channels before the encoder and
  unpatchified after the decoder (vae2_2.py:280-312, 785, 837),
- every stage is a residual MACRO block: the conv path plus a parameter-free
  AvgDown3D / DupUp3D shortcut (vae2_2.py:316-498),
- the upsample conv keeps the channel width (vae2_2.py:86-97; 2.1 halves),
- separate encoder/decoder widths (dim=160, dec_dim=256) and z_dim=48 with
  its own latent mean/std tables (vae2_2.py:888-1040),
- the decoder's first chunk trims the duplicated leading frames
  (first_chunk, vae2_2.py:390-411, 826).

Chunk protocol (1 + 4k frames, one latent frame per decoder chunk) is
identical to 2.1 and reuses the same Cache threading. Golden-parity-tested
against the reference torch module in tests/test_golden_parity.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from .wan_vae import (
    CACHE_T,
    AttentionBlock2d,
    Cache,
    CausalConv3d,
    ResidualBlock3d,
    RMSNormSpatial,
    _SpatialDown,
    _TimeDown,
    _TimeUp,
)

# extracted from reference vae2_2.py Wan2_2_VAE (z_dim=48)
WAN22_LATENT_MEAN = [
    -0.2289, -0.0052, -0.1323, -0.2339, -0.2799, 0.0174, 0.1838, 0.1557,
    -0.1382, 0.0542, 0.2813, 0.0891, 0.157, -0.0098, 0.0375, -0.1825,
    -0.2246, -0.1207, -0.0698, 0.5109, 0.2665, -0.2108, -0.2158, 0.2502,
    -0.2055, -0.0322, 0.1109, 0.1567, -0.0729, 0.0899, -0.2799, -0.123,
    -0.0313, -0.1649, 0.0117, 0.0723, -0.2839, -0.2083, -0.052, 0.3748,
    0.0152, 0.1957, 0.1433, -0.2944, 0.3573, -0.0548, -0.1681, -0.0667,
]
WAN22_LATENT_STD = [
    0.4765, 1.0364, 0.4514, 1.1677, 0.5313, 0.499, 0.4818, 0.5013,
    0.8158, 1.0344, 0.5894, 1.0901, 0.6885, 0.6165, 0.8454, 0.4978,
    0.5759, 0.3523, 0.7135, 0.6804, 0.5833, 1.4146, 0.8986, 0.5659,
    0.7069, 0.5338, 0.4889, 0.4917, 0.4069, 0.4999, 0.6866, 0.4093,
    0.5709, 0.6065, 0.6415, 0.4944, 0.5726, 1.2042, 0.5458, 1.6887,
    0.3971, 1.06, 0.3943, 0.5537, 0.5444, 0.4089, 0.7468, 0.7744,
]


@dataclasses.dataclass(frozen=True)
class Wan22VAEConfig:
    dim: int = 160
    dec_dim: int = 256
    z_dim: int = 48
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temperal_downsample: Tuple[bool, ...] = (False, True, True)
    dtype: Any = jnp.float32

    @staticmethod
    def ti2v_5b():
        return Wan22VAEConfig()

    @staticmethod
    def tiny():
        # the last two mults must be equal: the final stage's parameter-free
        # AvgDown3D shortcut cannot change the channel count (factor 1)
        return Wan22VAEConfig(dim=8, dec_dim=8, z_dim=8, dim_mult=(2, 2),
                              num_res_blocks=1, temperal_downsample=(True,))


def patchify2(x):
    """[B, T, Hp, Wp, C] -> [B, T, H, W, C*4], channel order (c, r, q)
    with q the H factor and r the W factor (vae2_2.py:280-296)."""
    b, t, hp, wp, c = x.shape
    h, w = hp // 2, wp // 2
    x = x.reshape(b, t, h, 2, w, 2, c)          # (q on H, r on W)
    x = jnp.transpose(x, (0, 1, 2, 4, 6, 5, 3))  # [B,T,H,W,C,r,q]
    return x.reshape(b, t, h, w, c * 4)


def unpatchify2(x):
    """Inverse of patchify2."""
    b, t, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, t, h, w, c, 2, 2)           # [...,C,r,q]
    x = jnp.transpose(x, (0, 1, 2, 6, 3, 5, 4))  # [B,T,H,q,W,r,C]
    return x.reshape(b, t, h * 2, w * 2, c)


def avg_down3d(x, out_channels: int, factor_t: int, factor_s: int):
    """AvgDown3D (vae2_2.py:316-367): group-average pooled shortcut.
    Channel order of the flattened factor axis is (C, ft, fs_h, fs_w)."""
    ft, fs = factor_t, factor_s
    b, t, h, w, c = x.shape
    pad_t = (ft - t % ft) % ft
    if pad_t:
        x = jnp.pad(x, ((0, 0), (pad_t, 0), (0, 0), (0, 0), (0, 0)))
        t = t + pad_t
    x = x.reshape(b, t // ft, ft, h // fs, fs, w // fs, fs, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 7, 2, 4, 6))
    x = x.reshape(b, t // ft, h // fs, w // fs, c * ft * fs * fs)
    group = (c * ft * fs * fs) // out_channels
    x = x.reshape(b, t // ft, h // fs, w // fs, out_channels, group)
    return jnp.mean(x, axis=-1)


def dup_up3d(x, out_channels: int, factor_t: int, factor_s: int,
             first_chunk: bool):
    """DupUp3D (vae2_2.py:370-411): repeat-interleave unpooled shortcut."""
    ft, fs = factor_t, factor_s
    b, t, h, w, c = x.shape
    repeats = out_channels * ft * fs * fs // c
    x = jnp.repeat(x, repeats, axis=-1)
    x = x.reshape(b, t, h, w, out_channels, ft, fs, fs)
    x = jnp.transpose(x, (0, 1, 5, 2, 6, 3, 7, 4))
    x = x.reshape(b, t * ft, h * fs, w * fs, out_channels)
    if first_chunk:
        x = x[:, ft - 1:]
    return x


class _SpatialUp22(nn.Module):
    """2.2 upsample conv keeps the channel width (vae2_2.py:86-97)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        y = x.reshape(b * t, h, w, c).astype(jnp.float32)
        y = jax.image.resize(y, (b * t, h * 2, w * 2, c), "nearest")
        y = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(y.astype(x.dtype))
        return y.reshape(b, t, h * 2, w * 2, c)


class Encoder22(nn.Module):
    config: Wan22VAEConfig

    @nn.compact
    def __call__(self, x, cache: Optional[Cache]):
        cfg = self.config
        dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
        n = len(cfg.dim_mult)
        h = CausalConv3d(dims[0], dtype=cfg.dtype, name="conv1")(x, cache)
        for i in range(n):
            in_dim, out_dim = dims[i], dims[i + 1]
            t_down = (cfg.temperal_downsample[i]
                      if i < len(cfg.temperal_downsample) else False)
            down = i != n - 1
            shortcut = avg_down3d(
                h, out_dim, factor_t=2 if t_down else 1,
                factor_s=2 if down else 1,
            )
            y = h
            for j in range(cfg.num_res_blocks):
                y = ResidualBlock3d(out_dim, cfg.dtype,
                                    name=f"down_{i}_res_{j}")(y, cache)
            if down:
                y = _SpatialDown(cfg.dtype, name=f"down_{i}_spatial")(y)
                if t_down:
                    y = _TimeDown(cfg.dtype, name=f"down_{i}_time")(y, cache)
            h = y + shortcut
        h = ResidualBlock3d(dims[-1], cfg.dtype, name="mid_res_0")(h, cache)
        h = AttentionBlock2d(cfg.dtype, name="mid_attn")(h)
        h = ResidualBlock3d(dims[-1], cfg.dtype, name="mid_res_1")(h, cache)
        h = RMSNormSpatial(cfg.dtype, name="head_norm")(h)
        h = nn.silu(h)
        return CausalConv3d(2 * cfg.z_dim, dtype=cfg.dtype,
                            name="head_conv")(h, cache)


class Decoder22(nn.Module):
    config: Wan22VAEConfig

    @nn.compact
    def __call__(self, z, cache: Optional[Cache], first_chunk: bool = False):
        cfg = self.config
        dims = [cfg.dec_dim * u for u in
                (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
        n = len(cfg.dim_mult)
        temperal_upsample = tuple(reversed(cfg.temperal_downsample))
        h = CausalConv3d(dims[0], dtype=cfg.dtype, name="conv1")(z, cache)
        h = ResidualBlock3d(dims[0], cfg.dtype, name="mid_res_0")(h, cache)
        h = AttentionBlock2d(cfg.dtype, name="mid_attn")(h)
        h = ResidualBlock3d(dims[0], cfg.dtype, name="mid_res_1")(h, cache)
        for i in range(n):
            in_dim, out_dim = dims[i], dims[i + 1]
            t_up = (temperal_upsample[i]
                    if i < len(temperal_upsample) else False)
            up = i != n - 1
            y = h
            for j in range(cfg.num_res_blocks + 1):
                y = ResidualBlock3d(out_dim, cfg.dtype,
                                    name=f"up_{i}_res_{j}")(y, cache)
            if up:
                if t_up:
                    y = _TimeUp(cfg.dtype, name=f"up_{i}_time")(y, cache)
                y = _SpatialUp22(cfg.dtype, name=f"up_{i}_spatial")(y)
                shortcut = dup_up3d(
                    h, out_dim, factor_t=2 if t_up else 1, factor_s=2,
                    first_chunk=first_chunk,
                )
                h = y + shortcut
            else:
                h = y
        h = RMSNormSpatial(cfg.dtype, name="head_norm")(h)
        h = nn.silu(h)
        return CausalConv3d(12, dtype=cfg.dtype, name="head_conv")(h, cache)


class WanVideoVAE22(nn.Module):
    """Wan2.2 ti2v VAE: 16x16x4 compression to z_dim latent channels."""

    config: Wan22VAEConfig

    def setup(self):
        self.encoder = Encoder22(self.config)
        self.quant_conv = CausalConv3d(
            2 * self.config.z_dim, kernel=(1, 1, 1), dtype=self.config.dtype,
            name="conv1_quant",
        )
        self.decoder = Decoder22(self.config)
        self.post_quant_conv = CausalConv3d(
            self.config.z_dim, kernel=(1, 1, 1), dtype=self.config.dtype,
        )

    def _stats(self, dtype):
        if self.config.z_dim == 48:
            return (jnp.asarray(WAN22_LATENT_MEAN, dtype),
                    jnp.asarray(WAN22_LATENT_STD, dtype))
        return None

    def encode(self, video, rng: Optional[jax.Array] = None):
        cfg = self.config
        x = jnp.transpose(video, (0, 2, 3, 4, 1)).astype(cfg.dtype)
        x = patchify2(x)
        t = x.shape[1]
        n_chunks = 1 + (t - 1) // 4
        cache = Cache()
        outs = [self.encoder(x[:, :1], cache)]
        cache.init_mode = False
        for i in range(n_chunks - 1):
            cache.idx = 0
            outs.append(self.encoder(x[:, 1 + 4 * i: 1 + 4 * (i + 1)], cache))
        moments = jnp.concatenate(outs, axis=1)
        moments = self.quant_conv(moments, None)
        mu, log_var = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            std = jnp.exp(0.5 * jnp.clip(log_var, -30.0, 20.0))
            mu = mu + std * jax.random.normal(rng, mu.shape, mu.dtype)
        stats = self._stats(mu.dtype)
        if stats is not None:
            mu = (mu - stats[0]) / stats[1]
        return jnp.transpose(mu, (0, 4, 1, 2, 3))

    def decode(self, latents):
        cfg = self.config
        z = jnp.transpose(latents, (0, 2, 3, 4, 1)).astype(cfg.dtype)
        stats = self._stats(z.dtype)
        if stats is not None:
            z = z * stats[1] + stats[0]
        z = self.post_quant_conv(z, None)
        cache = Cache()
        outs = [self.decoder(z[:, :1], cache, first_chunk=True)]
        cache.init_mode = False
        for i in range(1, z.shape[1]):
            cache.idx = 0
            outs.append(self.decoder(z[:, i: i + 1], cache))
        x = jnp.concatenate(outs, axis=1)
        x = unpatchify2(x)
        x = jnp.clip(x, -1.0, 1.0)
        return jnp.transpose(x, (0, 4, 1, 2, 3))

    def __call__(self, video):
        z = self.encode(video)
        return self.decode(z)


# --- weight conversion -------------------------------------------------------


def convert_wan22_vae(sd, cfg: Wan22VAEConfig):
    """Official Wan2.2 VAE checkpoint keys -> flax params (module indices:
    Down_ResidualBlock.downsamples = [res]*mult + [Resample];
    Up_ResidualBlock.upsamples = [res]*(mult+1) + [Resample])."""
    from .wan_vae_convert import _attn_block, _conv2d, _conv3d, _res_block, _rms

    sd = {k[len("vae."):] if k.startswith("vae.") else k: v
          for k, v in sd.items()}
    n = len(cfg.dim_mult)
    p_enc = {
        "conv1": _conv3d(sd, "encoder.conv1"),
        "mid_res_0": _res_block(sd, "encoder.middle.0"),
        "mid_attn": _attn_block(sd, "encoder.middle.1"),
        "mid_res_1": _res_block(sd, "encoder.middle.2"),
        "head_norm": _rms(sd, "encoder.head.0"),
        "head_conv": _conv3d(sd, "encoder.head.2"),
    }
    for i in range(n):
        t_down = (cfg.temperal_downsample[i]
                  if i < len(cfg.temperal_downsample) else False)
        down = i != n - 1
        base = f"encoder.downsamples.{i}.downsamples"
        for j in range(cfg.num_res_blocks):
            p_enc[f"down_{i}_res_{j}"] = _res_block(sd, f"{base}.{j}")
        if down:
            r = f"{base}.{cfg.num_res_blocks}"
            p_enc[f"down_{i}_spatial"] = _conv2d(sd, f"{r}.resample.1")
            if t_down:
                p_enc[f"down_{i}_time"] = {"time_conv": _conv3d(
                    sd, f"{r}.time_conv")["conv"]}
    p_dec = {
        "conv1": _conv3d(sd, "decoder.conv1"),
        "mid_res_0": _res_block(sd, "decoder.middle.0"),
        "mid_attn": _attn_block(sd, "decoder.middle.1"),
        "mid_res_1": _res_block(sd, "decoder.middle.2"),
        "head_norm": _rms(sd, "decoder.head.0"),
        "head_conv": _conv3d(sd, "decoder.head.2"),
    }
    temperal_upsample = tuple(reversed(cfg.temperal_downsample))
    for i in range(n):
        t_up = (temperal_upsample[i] if i < len(temperal_upsample) else False)
        up = i != n - 1
        base = f"decoder.upsamples.{i}.upsamples"
        for j in range(cfg.num_res_blocks + 1):
            p_dec[f"up_{i}_res_{j}"] = _res_block(sd, f"{base}.{j}")
        if up:
            r = f"{base}.{cfg.num_res_blocks + 1}"
            p_dec[f"up_{i}_spatial"] = _conv2d(sd, f"{r}.resample.1")
            if t_up:
                p_dec[f"up_{i}_time"] = {"time_conv": _conv3d(
                    sd, f"{r}.time_conv")["conv"]}
    return {"params": {
        "encoder": p_enc,
        "decoder": p_dec,
        "conv1_quant": _conv3d(sd, "conv1"),
        "post_quant_conv": _conv3d(sd, "conv2"),
    }}


def load_wan22_vae(path):
    """Load + convert a Wan2.2 (ti2v) VAE checkpoint."""
    cfg = Wan22VAEConfig.ti2v_5b()
    if str(path).endswith((".pth", ".pt", ".bin")):
        import torch

        sd = {k: v.float().numpy()
              for k, v in torch.load(path, map_location="cpu").items()}
    else:
        from .weights import load_safetensors_dir

        sd = load_safetensors_dir(path)
    return WanVideoVAE22(cfg), convert_wan22_vae(sd, cfg)
