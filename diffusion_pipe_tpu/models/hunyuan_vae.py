"""HunyuanVideo 3D causal VAE (diffusers AutoencoderKLHunyuanVideo arch).

Reference: the hyvideo submodule's VAE consumed by models/hunyuan_video.py
(3D causal VAE with tiling); HunyuanImage-2.1/HunyuanVideo-1.5 ship the
same family at different compression ratios. Architecture facts (public
diffusers port): causal convs pad time-front with REPLICATED first frames
(k-1), GroupNorm(32) resnets, spatial 8x via three stride-2 downsamples,
temporal 4x via two of them, per-frame spatial attention in the mid block,
decoder mirrors with nearest-neighbour upsampling where the FIRST frame is
not duplicated in time (causal frame count F = 4*(Fl-1) + 1).

Channel-last (B, T, H, W, C) layout like wan_vae.py. Tiled encode/decode
(reference enable_tiling) is replaced by bucketed static shapes; latents
are scaled by scaling_factor on encode.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


@dataclasses.dataclass(frozen=True)
class HunyuanVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    temporal_downsamples: int = 2   # 4x temporal
    scaling_factor: float = 0.476986
    dtype: Any = jnp.float32

    @staticmethod
    def tiny():
        return HunyuanVAEConfig(
            block_out_channels=(8, 16, 16, 16), layers_per_block=1,
            latent_channels=4,
        )


class CausalConv3dR(nn.Module):
    """Causal 3D conv: time-front pad (k-1) REPLICATE (diffusers
    HunyuanVideoCausalConv3d), spatial symmetric zero pad."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        tpad = kt - 1
        if tpad > 0:
            front = jnp.repeat(x[:, :1], tpad, axis=1)
            x = jnp.concatenate([front, x], axis=1)
        return nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)),
            dtype=self.dtype, name="conv",
        )(x)


def _group_norm(x, name_scope, groups=32):
    return nn.GroupNorm(num_groups=min(groups, x.shape[-1]),
                        epsilon=1e-6, name=name_scope)(x)


class HVResnet(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=min(32, x.shape[-1]), epsilon=1e-6,
                         name="norm1")(x)
        h = nn.silu(h)
        h = CausalConv3dR(self.out_channels, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=min(32, self.out_channels), epsilon=1e-6,
                         name="norm2")(h)
        h = nn.silu(h)
        h = CausalConv3dR(self.out_channels, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class HVSpatialAttention(nn.Module):
    """Per-frame spatial self-attention (mid block)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=min(32, c), epsilon=1e-6,
                         name="group_norm")(x)
        y = y.reshape(b * t, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(c)
        attn = jax.nn.softmax(logits, -1).astype(v.dtype)
        y = jnp.einsum("bqk,bkc->bqc", attn, v)
        y = nn.Dense(c, dtype=self.dtype, name="to_out")(y)
        return x + y.reshape(b, t, h, w, c)


class HunyuanVAEEncoder(nn.Module):
    config: HunyuanVAEConfig

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
                # spatial stride always; temporal stride on the LAST
                # `temporal_downsamples` non-final blocks
                tstride = 2 if i >= n - 1 - cfg.temporal_downsamples else 1
                h = CausalConv3dR(
                    ch, strides=(tstride, 2, 2), dtype=cfg.dtype,
                    name=f"down_{i}_downsample",
                )(h)
        h = HVResnet(chans[-1], dtype=cfg.dtype, name="mid_res_0")(h)
        h = HVSpatialAttention(dtype=cfg.dtype, name="mid_attn")(h)
        h = HVResnet(chans[-1], dtype=cfg.dtype, name="mid_res_1")(h)
        h = nn.GroupNorm(num_groups=min(32, h.shape[-1]), epsilon=1e-6,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return CausalConv3dR(2 * cfg.latent_channels, dtype=cfg.dtype,
                             name="conv_out")(h)


class HunyuanVAEDecoder(nn.Module):
    config: HunyuanVAEConfig

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
                tup = 2 if i < cfg.temporal_downsamples else 1
                b, t, hh, ww, c = h.shape
                # spatial nearest 2x
                h = jnp.repeat(jnp.repeat(h, 2, axis=2), 2, axis=3)
                if tup == 2:
                    # causal temporal 2x: first frame NOT duplicated
                    first, rest = h[:, :1], h[:, 1:]
                    rest = jnp.repeat(rest, 2, axis=1)
                    h = jnp.concatenate([first, rest], axis=1)
                h = CausalConv3dR(ch, dtype=cfg.dtype,
                                  name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=min(32, h.shape[-1]), epsilon=1e-6,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return CausalConv3dR(cfg.out_channels, dtype=cfg.dtype,
                             name="conv_out")(h)


class HunyuanVAE(nn.Module):
    """encode/decode over (B, C, F, H, W) tensors (model-facing layout)."""

    config: HunyuanVAEConfig

    def setup(self):
        self.encoder = HunyuanVAEEncoder(self.config)
        self.decoder = HunyuanVAEDecoder(self.config)

    def encode_moments(self, pixels):
        x = jnp.transpose(pixels, (0, 2, 3, 4, 1))  # -> BTHWC
        moments = self.encoder(x)
        return jnp.transpose(moments, (0, 4, 1, 2, 3))

    def encode(self, pixels, rng: Optional[jax.Array] = None):
        moments = self.encode_moments(pixels)
        mean, logvar = jnp.split(moments, 2, axis=1)
        if rng is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            mean = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return mean * self.config.scaling_factor

    def decode(self, latents):
        z = latents / self.config.scaling_factor
        z = jnp.transpose(z, (0, 2, 3, 4, 1))
        out = self.decoder(z)
        return jnp.transpose(out, (0, 4, 1, 2, 3))

    def __call__(self, pixels):
        return self.decode(self.encode(pixels))


def normalize_hunyuan_vae_dialect(sd: dict) -> dict:
    """Original/ComfyUI SD-VAE naming (encoder.down.N.block.M, mid.block_1,
    attn q/k/v/proj_out as 1x1 convs, norm_out) -> the diffusers dialect
    convert_diffusers_hunyuan_vae expects. No-op for diffusers-layout
    dicts. The reference reaches this VAE through ComfyUI's loader
    (models/base.py:451-527), which accepts either dialect."""
    if any(".down_blocks." in k or k.startswith("encoder.down_blocks")
           for k in sd):
        return dict(sd)
    if not any(".down." in k for k in sd):
        return dict(sd)
    import re

    out = {}
    for k, v in sd.items():
        k = re.sub(r"\.down\.(\d+)\.block\.(\d+)\.", r".down_blocks.\1.resnets.\2.", k)
        k = re.sub(r"\.up\.(\d+)\.block\.(\d+)\.", r".up_blocks.\1.resnets.\2.", k)
        k = re.sub(r"\.down\.(\d+)\.downsample\.conv\.", r".down_blocks.\1.downsamplers.0.conv.", k)
        k = re.sub(r"\.up\.(\d+)\.upsample\.conv\.", r".up_blocks.\1.upsamplers.0.conv.", k)
        k = k.replace(".mid.block_1.", ".mid_block.resnets.0.")
        k = k.replace(".mid.block_2.", ".mid_block.resnets.1.")
        k = k.replace(".mid.attn_1.", ".mid_block.attentions.0.")
        k = k.replace(".norm_out.", ".conv_norm_out.")
        if ".attentions.0." in k:
            k = (k.replace(".q.", ".to_q.").replace(".k.", ".to_k.")
                 .replace(".v.", ".to_v.").replace(".proj_out.", ".to_out.0.")
                 .replace(".norm.", ".group_norm."))
            if k.endswith(".weight") and getattr(v, "ndim", 0) > 2:
                v = np.asarray(v).reshape(v.shape[0], v.shape[1])
        out[k] = v
    # SD-style decoder up blocks are indexed in REVERSE channel order
    # (up.0 = lowest-res); diffusers up_blocks.0 = highest channel count.
    ups = sorted({int(m.group(1)) for k in out
                  if (m := re.match(r"decoder\.up_blocks\.(\d+)\.", k))})
    if ups:
        n = max(ups)
        remapped = {}
        for k, v in out.items():
            m = re.match(r"decoder\.up_blocks\.(\d+)\.(.*)", k)
            if m:
                k = f"decoder.up_blocks.{n - int(m.group(1))}.{m.group(2)}"
            remapped[k] = v
        out = remapped
    return out


def infer_hunyuan_vae_config(
    sd: dict,
    temporal_downsamples: Optional[int] = None,
    scaling_factor: Optional[float] = None,
    dtype=jnp.float32,
) -> HunyuanVAEConfig:
    """Discover the causal-3D-VAE topology from a diffusers-dialect state
    dict: block count/widths from each down block's first resnet, layers
    per block from block 0, latent width from encoder.conv_out. Strides
    are invisible in shapes, so temporal_downsamples stays a parameter
    (HunyuanVideo family default: 4x temporal = 2)."""
    import re

    idxs = sorted({int(m.group(1)) for k in sd
                   if (m := re.match(r"encoder\.down_blocks\.(\d+)\.", k))})
    if not idxs:
        raise ValueError("no encoder.down_blocks.* keys found")
    chans = []
    for i in idxs:
        w = sd[f"encoder.down_blocks.{i}.resnets.0.conv1.weight"]
        chans.append(int(w.shape[0]))
    layers = 1 + max(
        int(m.group(1)) for k in sd
        if (m := re.match(r"encoder\.down_blocks\.0\.resnets\.(\d+)\.", k)))
    latent = int(sd["encoder.conv_out.weight"].shape[0]) // 2
    kw = {}
    if scaling_factor is not None:
        kw["scaling_factor"] = float(scaling_factor)
    return HunyuanVAEConfig(
        latent_channels=latent, block_out_channels=tuple(chans),
        layers_per_block=layers,
        temporal_downsamples=(2 if temporal_downsamples is None
                              else int(temporal_downsamples)),
        dtype=dtype, **kw,
    )


def convert_diffusers_hunyuan_vae(sd: dict, cfg: HunyuanVAEConfig):
    """diffusers AutoencoderKLHunyuanVideo state dict -> flax params.

    Keys: encoder.down_blocks.{i}.resnets.{j}.{norm1,conv1,norm2,conv2,
    conv_shortcut}, .downsamplers.0.conv, encoder.mid_block.resnets.{0,1},
    .attentions.0.{group_norm,to_q,to_k,to_v,to_out.0}, conv_norm_out,
    conv_in/out; decoder mirrors with up_blocks/upsamplers."""

    def g(key):
        t = sd[key]
        if hasattr(t, "detach"):
            t = t.detach().float().numpy()
        return np.asarray(t)

    def conv3d(key):
        w = g(key + ".weight")  # [out, in, kt, kh, kw]
        return {"kernel": np.transpose(w, (2, 3, 4, 1, 0)),
                "bias": g(key + ".bias")}

    def dense(key):
        return {"kernel": np.ascontiguousarray(g(key + ".weight").T),
                "bias": g(key + ".bias")}

    def norm(key):
        return {"scale": g(key + ".weight"), "bias": g(key + ".bias")}

    def resnet(prefix):
        d = {
            "norm1": norm(prefix + ".norm1"),
            "conv1": {"conv": conv3d(prefix + ".conv1")},
            "norm2": norm(prefix + ".norm2"),
            "conv2": {"conv": conv3d(prefix + ".conv2")},
        }
        if prefix + ".conv_shortcut.weight" in sd:
            w = g(prefix + ".conv_shortcut.weight")
            d["conv_shortcut"] = {
                "kernel": np.transpose(w, (2, 3, 4, 1, 0)),
                "bias": g(prefix + ".conv_shortcut.bias"),
            }
        return d

    def attn(prefix):
        return {
            "group_norm": norm(prefix + ".group_norm"),
            "to_q": dense(prefix + ".to_q"),
            "to_k": dense(prefix + ".to_k"),
            "to_v": dense(prefix + ".to_v"),
            "to_out": dense(prefix + ".to_out.0"),
        }

    def tower(side, updown, n_blocks, layers):
        p = {
            "conv_in": {"conv": conv3d(f"{side}.conv_in")},
            "conv_out": {"conv": conv3d(f"{side}.conv_out")},
            "conv_norm_out": norm(f"{side}.conv_norm_out"),
            "mid_res_0": resnet(f"{side}.mid_block.resnets.0"),
            "mid_attn": attn(f"{side}.mid_block.attentions.0"),
            "mid_res_1": resnet(f"{side}.mid_block.resnets.1"),
        }
        for i in range(n_blocks):
            for j in range(layers):
                p[f"{updown}_{i}_res_{j}"] = resnet(
                    f"{side}.{updown}_blocks.{i}.resnets.{j}")
            samp = (f"{side}.{updown}_blocks.{i}."
                    f"{'downsamplers' if updown == 'down' else 'upsamplers'}"
                    f".0.conv")
            if samp + ".weight" in sd:
                p[f"{updown}_{i}_{'downsample' if updown == 'down' else 'upsample'}"] = {
                    "conv": conv3d(samp)
                }
        return p

    n = len(cfg.block_out_channels)
    return {"params": {
        "encoder": tower("encoder", "down", n, cfg.layers_per_block),
        "decoder": tower("decoder", "up", n, cfg.layers_per_block + 1),
    }}
