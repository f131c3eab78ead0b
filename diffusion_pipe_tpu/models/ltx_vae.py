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


def _conv3d_kernel(w):
    """torch Conv3d [O, I, kt, kh, kw] -> flax [kt, kh, kw, I, O]."""
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 4, 1, 0))


def convert_ltx_vae(sd):
    """LTX-Video CausalVideoAutoencoder checkpoint -> (config, params).

    The reference loads this VAE via the LTX_Video submodule
    (models/ltx_video.py:42 CausalVideoAutoencoder.from_pretrained); its
    encoder is a flat `encoder.down_blocks.<k>` list mixing res_x groups
    (`res_blocks.<j>.conv{1,2}.conv`), compress convs (`conv`), and
    channel-change resnets (`conv1.conv` at top level), ending in
    `per_channel_statistics.{mean,std}-of-means` latent stats. Rather than
    hardcoding one version's block list, the block SEQUENCE and channel
    widths are discovered from the keys/shapes and matched to our
    [res group][compress?][change?]* + mid pattern; anything that doesn't
    fit (GroupNorm keys, attention blocks) raises instead of converting
    silently wrong. Encoder + stats only: training caches need encode
    (reference get_call_vae_fn, ltx_video.py:98-105); the 0.9.x decoders
    (DepthToSpaceUpsample + timestep conditioning) are not mirrored.
    """
    sd = {(k[4:] if k.startswith("vae.") else k): np.asarray(v)
          for k, v in sd.items()}
    enc = {k[len("encoder."):]: v for k, v in sd.items()
           if k.startswith("encoder.")}
    if not enc:
        raise ValueError("no encoder.* keys found in LTX VAE checkpoint")
    for k in enc:
        if "norm1.weight" in k or "attention" in k or "attn" in k:
            raise ValueError(
                f"unsupported LTX VAE variant (unexpected key {k}); expected "
                "pixel-norm resnets without attention")

    consumed = set()

    def take(key):
        consumed.add("encoder." + key)
        return enc[key]

    def lin_or_conv_shortcut(prefix):
        """make_linear_nd ([O,I]) or 1x1x1 conv shortcut -> flax conv."""
        if f"{prefix}.weight" in enc:
            w = take(f"{prefix}.weight")
        elif f"{prefix}.conv.weight" in enc:
            w = take(f"{prefix}.conv.weight")
        else:
            return None
        entry = {}
        if w.ndim == 2:
            entry["kernel"] = np.ascontiguousarray(
                w.T[None, None, None])  # [1,1,1,I,O]
        else:
            entry["kernel"] = _conv3d_kernel(w)
        for b in (f"{prefix}.bias", f"{prefix}.conv.bias"):
            if b in enc:
                entry["bias"] = take(b)
        return entry

    def conv(prefix):
        out = {"conv": {"kernel": _conv3d_kernel(take(f"{prefix}.conv.weight"))}}
        if f"{prefix}.conv.bias" in enc:
            out["conv"]["bias"] = take(f"{prefix}.conv.bias")
        return out

    def resnet(prefix):
        out = {"conv1": conv(f"{prefix}.conv1"),
               "conv2": conv(f"{prefix}.conv2")}
        sc = lin_or_conv_shortcut(f"{prefix}.conv_shortcut")
        if sc is not None:
            out["conv_shortcut"] = sc
        return out

    # --- discover the down_blocks sequence ---------------------------------
    import re

    idxs = sorted({int(m.group(1)) for k in enc
                   if (m := re.match(r"down_blocks\.(\d+)\.", k))})
    entries = []
    for k in idxs:
        keys_k = [k2[len(f"down_blocks.{k}."):] for k2 in enc
                  if k2.startswith(f"down_blocks.{k}.")]
        if any(k2.startswith("res_blocks.") for k2 in keys_k):
            layers = 1 + max(int(k2.split(".")[1]) for k2 in keys_k
                             if k2.startswith("res_blocks."))
            ch = enc[f"down_blocks.{k}.res_blocks.0.conv1.conv.weight"].shape[0]
            entries.append(("group", k, layers, ch))
        elif any(k2.startswith("conv1.") for k2 in keys_k):
            out_ch = enc[f"down_blocks.{k}.conv1.conv.weight"].shape[0]
            entries.append(("change", k, 1, out_ch))
        elif "conv.weight" in keys_k:
            ch = enc[f"down_blocks.{k}.conv.weight"].shape[0]
            entries.append(("compress", k, 0, ch))
        else:
            raise ValueError(
                f"unrecognized LTX encoder block down_blocks.{k}: {keys_k}")

    # --- fit to our [group][compress?][change?]* + mid pattern --------------
    groups = []  # (torch_idx, layers, ch, scaled, compress_idx, change_idx)
    i = 0
    while i < len(entries):
        kind, k, layers, ch = entries[i]
        if kind != "group":
            raise ValueError(
                f"LTX encoder sequence mismatch at down_blocks.{k}: "
                f"expected a res_x group, got {kind}")
        i += 1
        compress_idx = change_idx = None
        if i < len(entries) and entries[i][0] == "compress":
            compress_idx = entries[i][1]
            i += 1
        if i < len(entries) and entries[i][0] == "change":
            change_idx = entries[i][1]
            i += 1
        groups.append((k, layers, ch, compress_idx, change_idx))

    if len(groups) < 2 or groups[-1][3] is not None or groups[-1][4] is not None:
        raise ValueError("LTX encoder must end in an unscaled mid res group")

    conv_in_w = enc["conv_in.conv.weight"]
    in_dim = conv_in_w.shape[1]
    patch = int(round((in_dim / 3) ** 0.5))
    if patch * patch * 3 != in_dim:
        raise ValueError(f"cannot infer patch size from conv_in ({in_dim})")
    latent_channels = enc["conv_out.conv.weight"].shape[0] // 2

    chans, layers_pb, scaling = [], [], []
    for (k, layers, ch, comp, change) in groups[:-1]:
        chans.append(ch)
        layers_pb.append(layers)
        scaling.append(comp is not None)
    layers_pb.append(groups[-1][1])  # mid
    cfg = LTXVAEConfig(
        latent_channels=latent_channels, patch_size=patch,
        block_out_channels=tuple(chans),
        layers_per_block=tuple(layers_pb),
        spatio_temporal_scaling=tuple(scaling),
    )
    # structural consistency with our encoder's channel-change rule
    full_chans = chans + [groups[-1][2]]
    for gi in range(len(groups) - 1):
        expect_change = full_chans[gi] != full_chans[gi + 1]
        if expect_change != (groups[gi][4] is not None):
            raise ValueError(
                f"channel-change resnet mismatch at group {gi}")

    # --- assemble params ----------------------------------------------------
    ep = {"conv_in": conv(f"conv_in"), "conv_out": conv("conv_out")}
    for gi, (k, layers, ch, comp, change) in enumerate(groups[:-1]):
        for j in range(layers):
            ep[f"down_{gi}_res_{j}"] = resnet(f"down_blocks.{k}.res_blocks.{j}")
        if comp is not None:
            ep[f"down_{gi}_downsample"] = conv(f"down_blocks.{comp}")
        if change is not None:
            ep[f"down_{gi}_conv_out"] = resnet(f"down_blocks.{change}")
    mk, mlayers = groups[-1][0], groups[-1][1]
    for j in range(mlayers):
        ep[f"mid_res_{j}"] = resnet(f"down_blocks.{mk}.res_blocks.{j}")

    leftover = [k for k in enc if "encoder." + k not in consumed]
    if leftover:
        raise ValueError(f"unconverted LTX encoder keys: {leftover[:8]}")

    def stat(names):
        for n in names:
            if n in sd:
                return np.asarray(sd[n], np.float32).reshape(-1)
        raise ValueError(f"missing latent stats {names}")

    params = {"params": {
        "encoder": ep,
        "latents_mean": stat(("per_channel_statistics.mean-of-means",
                              "per_channel_statistics.mean_of_means")),
        "latents_std": stat(("per_channel_statistics.std-of-means",
                             "per_channel_statistics.std_of_means")),
    }}
    return cfg, params


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
