"""Cosmos-1 continuous video tokenizer (CV8x8x8 family), factorized arch.

Reference: models/cosmos.py — CausalContinuousVideoTokenizer built from the
Cosmos submodule's EncoderFactorized/DecoderFactorized/CausalConv3d
(cosmos.py:17,48-75) and instantiated with the exact args at
cosmos.py:89-110: patch_size=4 patch_method="haar", channels=128,
channels_mult=[2,4,4], num_res_blocks=2, attn_resolutions=[32] (which at
resolution=1024 never fires inside the down path — only the mid block
carries attention), num_groups=1, z_channels=16, embedding_dim=16,
spatial_compression=8, temporal_compression=8. Latent normalization is
(z - mean) / std * sigma_data with per-(channel, latent-frame) statistics
viewed as [C, 16][:, :latent_t] (cosmos.py:62-75, sigma_data 0.5).

Architecture (NVIDIA Cosmos factorized magvit-style):
  - Patcher3D "haar": first frame replicated patch_size times (causal),
    then log2(patch_size) grouped haar DWT levels over (t, h, w), each
    level cat-ing the 8 subbands band-major (t, h, w nesting) and
    rescaling by 1/(2*sqrt(2)) — 3 -> 24 -> 192 channels at patch 4.
  - conv_in / conv_out / every resnet conv: a factorized pair of causal
    convs, spatial (1,3,3) then temporal (3,1,1) (time-front replicate).
  - Hybrid downsample: strided spatial conv + avg-pool residual, strided
    causal temporal conv + avg-pool residual, then a 1x1x1 mixer conv.
  - Mid: resnet, per-frame spatial attention + causal temporal attention
    (1x1x1 conv q/k/v/proj, GroupNorm(1)), resnet.

The training path needs ENCODE only (latent caching; reference
cosmos.py:116-120 vae_encode). Weight conversion discovers per-level
downsample presence from kernel shapes; unrecognized keys raise. Block
internals follow the public NVIDIA Cosmos tokenizer modules; flagged in
docs/supported_models.md pending a real-checkpoint spot check.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

_SQRT2 = 1.4142135623730951


@dataclasses.dataclass(frozen=True)
class CosmosTokenizerConfig:
    in_channels: int = 3
    z_channels: int = 16
    embedding_dim: int = 16
    channels: int = 128
    channels_mult: Tuple[int, ...] = (2, 4, 4)
    num_res_blocks: int = 2
    patch_size: int = 4
    # (spatial_down, temporal_down) per non-final level; CV8x8x8 =
    # patch 4x + one 2x hybrid conv stage in each of space and time
    downsample_flags: Tuple[Tuple[bool, bool], ...] = (
        (True, True), (False, False))
    # levels whose down path carries (spatial, temporal) attention pairs;
    # empty for the reference's 1024-resolution config (attn_resolutions
    # [32] is never reached before the bottleneck)
    attn_levels: Tuple[int, ...] = ()
    latent_temporal_chunk: int = 16
    sigma_data: float = 0.5
    dtype: Any = jnp.float32

    @staticmethod
    def tiny():
        return CosmosTokenizerConfig(
            channels=8, channels_mult=(1, 2), num_res_blocks=1,
            patch_size=2, z_channels=4, embedding_dim=4,
            downsample_flags=((True, True),),
        )


def haar_patch_3d(x: jax.Array, patch_size: int) -> jax.Array:
    """Causal 3D haar wavelet patchifier over (B, T, H, W, C).

    Mirrors Patcher3D._haar: the first frame is replicated patch_size
    times (so T=1+k*patch maps to latent-T=1+k/...), then log2(patch)
    grouped DWT levels; each level emits 8 subbands cat'ed band-major
    over (t, h, w) and rescaled by 1/(2*sqrt(2))."""
    levels = int(np.log2(patch_size))
    assert 2 ** levels == patch_size
    first, rest = x[:, :1], x[:, 1:]
    x = jnp.concatenate([jnp.repeat(first, patch_size, axis=1), rest], 1)
    for _ in range(levels):
        subbands = []
        for bt in (0, 1):
            for bh in (0, 1):
                for bw in (0, 1):
                    y = _haar_axis(x, 1, bt)
                    y = _haar_axis(y, 2, bh)
                    y = _haar_axis(y, 3, bw)
                    subbands.append(y)
        x = jnp.concatenate(subbands, axis=-1) / (2.0 * _SQRT2)
    return x


def _haar_axis(x, axis, high):
    n = x.shape[axis]
    assert n % 2 == 0, f"haar axis {axis} length {n} must be even"
    a = jax.lax.slice_in_dim(x, 0, n, 2, axis)
    b = jax.lax.slice_in_dim(x, 1, n, 2, axis)
    return (a - b) / _SQRT2 if high else (a + b) / _SQRT2


def haar_unpatch_3d(x: jax.Array, patch_size: int) -> jax.Array:
    """Exact inverse of haar_patch_3d (drops the replicated first frames)."""
    levels = int(np.log2(patch_size))
    for _ in range(levels):
        x = x * (2.0 * _SQRT2)
        c = x.shape[-1] // 8
        bands = [x[..., i * c:(i + 1) * c] for i in range(8)]
        merged = []
        for pair_start in (0, 4):          # t-low group, t-high group
            hl = _ihaar_axis(bands[pair_start], bands[pair_start + 1],
                             3, bands[pair_start].shape[3] * 2)
            hh = _ihaar_axis(bands[pair_start + 2], bands[pair_start + 3],
                             3, bands[pair_start].shape[3] * 2)
            merged.append(_ihaar_axis(hl, hh, 2, hl.shape[2] * 2))
        x = _ihaar_axis(merged[0], merged[1], 1, merged[0].shape[1] * 2)
    return x[:, patch_size - 1:]


def _ihaar_axis(low, high, axis, out_n):
    a = (low + high) / _SQRT2
    b = (low - high) / _SQRT2
    stacked = jnp.stack([a, b], axis=axis + 1)
    shape = list(low.shape)
    shape[axis] = out_n
    return stacked.reshape(shape)


class CausalConvF(nn.Module):
    """One causal conv with an arbitrary (kt, kh, kw) kernel: time-front
    pad (kt-1)*dilation REPLICATE, spatial symmetric zero pad (matching the
    Cosmos CausalConv3d wrapper; param path `conv` ~ torch `conv3d`)."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    spatial_pad: str = "same"     # "same" | "down" (pad (0,1) for stride 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        if kt > 1:
            front = jnp.repeat(x[:, :1], kt - 1, axis=1)
            x = jnp.concatenate([front, x], axis=1)
        if self.spatial_pad == "down":
            sp = ((0, 1), (0, 1))
        else:
            sp = ((kh // 2, kh // 2), (kw // 2, kw // 2))
        return nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=((0, 0),) + sp, dtype=self.dtype, name="conv",
        )(x)


class FactorizedConv(nn.Module):
    """Cosmos factorized conv pair: spatial (1,3,3) then temporal (3,1,1)
    (torch nn.Sequential -> checkpoint suffixes `.0` / `.1`)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = CausalConvF(self.features, (1, 3, 3), dtype=self.dtype,
                        name="s")(x)
        return CausalConvF(self.features, (3, 1, 1), dtype=self.dtype,
                           name="t")(x)


def _norm1g(x, name):
    # CausalNormalize(num_groups=1): GroupNorm over all channels
    return nn.GroupNorm(num_groups=1, epsilon=1e-6, name=name)(x)


class CosmosResnetF(nn.Module):
    """CausalResnetBlockFactorized3d: GroupNorm(1) -> silu -> factorized
    conv pair, twice, with a 1x1x1 nin_shortcut on channel change."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _norm1g(x, "norm1")
        h = nn.silu(h)
        h = FactorizedConv(self.out_channels, self.dtype, name="conv1")(h)
        h = _norm1g(h, "norm2")
        h = nn.silu(h)
        h = FactorizedConv(self.out_channels, self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = CausalConvF(self.out_channels, (1, 1, 1), dtype=self.dtype,
                            name="nin_shortcut")(x)
        return x + h


class CosmosSpatialAttn(nn.Module):
    """CausalAttnBlock: per-frame spatial self-attention, 1x1x1 convs."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = _norm1g(x, "norm")
        q = CausalConvF(c, (1, 1, 1), dtype=self.dtype, name="q")(h)
        k = CausalConvF(c, (1, 1, 1), dtype=self.dtype, name="k")(h)
        v = CausalConvF(c, (1, 1, 1), dtype=self.dtype, name="v")(h)
        b, t, hh, ww, _ = q.shape
        q = q.reshape(b * t, hh * ww, c)
        k = k.reshape(b * t, hh * ww, c)
        v = v.reshape(b * t, hh * ww, c)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) / np.sqrt(c), axis=-1)
        o = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, t, hh, ww, c)
        return x + CausalConvF(c, (1, 1, 1), dtype=self.dtype,
                               name="proj_out")(o)


class CosmosTemporalAttn(nn.Module):
    """CausalTemporalAttnBlock: causally-masked self-attention over time
    at each spatial position."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = _norm1g(x, "norm")
        q = CausalConvF(c, (1, 1, 1), dtype=self.dtype, name="q")(h)
        k = CausalConvF(c, (1, 1, 1), dtype=self.dtype, name="k")(h)
        v = CausalConvF(c, (1, 1, 1), dtype=self.dtype, name="v")(h)
        b, t, hh, ww, _ = q.shape
        q = q.transpose(0, 2, 3, 1, 4).reshape(b * hh * ww, t, c)
        k = k.transpose(0, 2, 3, 1, 4).reshape(b * hh * ww, t, c)
        v = v.transpose(0, 2, 3, 1, 4).reshape(b * hh * ww, t, c)
        logits = jnp.einsum("bqc,bkc->bqk", q, k) / np.sqrt(c)
        mask = jnp.tril(jnp.ones((t, t), bool))
        logits = jnp.where(mask[None], logits, -jnp.inf)
        o = jnp.einsum("bqk,bkc->bqc", jax.nn.softmax(logits, -1), v)
        o = o.reshape(b, hh, ww, t, c).transpose(0, 3, 1, 2, 4)
        return x + CausalConvF(c, (1, 1, 1), dtype=self.dtype,
                               name="proj_out")(o)


class CosmosHybridDownsample(nn.Module):
    """CausalHybridDownsample3d: strided conv + avg-pool residual per axis
    (spatial then temporal), then a 1x1x1 mixer."""

    spatial: bool
    temporal: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if not self.spatial and not self.temporal:
            return x
        c = x.shape[-1]
        if self.spatial:
            conv = CausalConvF(c, (1, 3, 3), strides=(1, 2, 2),
                               spatial_pad="down", dtype=self.dtype,
                               name="conv1")(x)
            pool = nn.avg_pool(x, (1, 2, 2), strides=(1, 2, 2))
            x = conv + pool
        if self.temporal:
            t = x.shape[1]
            assert t % 2 == 1, "causal video length must be odd"
            front = jnp.repeat(x[:, :1], 2, axis=1)
            xp = jnp.concatenate([front, x], axis=1)       # T+2
            conv = nn.Conv(c, (3, 1, 1), strides=(2, 1, 1),
                           padding=((0, 0), (0, 0), (0, 0)),
                           dtype=self.dtype, name="conv2_conv")(xp)
            pool = nn.avg_pool(xp, (2, 1, 1), strides=(2, 1, 1))
            x = conv + pool[:, :conv.shape[1]]
        return CausalConvF(c, (1, 1, 1), dtype=self.dtype, name="conv3")(x)


class CosmosHybridUpsample(nn.Module):
    """CausalHybridUpsample3d: causal temporal 2x (repeat, drop the
    duplicated first frame) + residual temporal conv, nearest spatial 2x +
    residual spatial conv, then a 1x1x1 mixer — the decoder mirror of
    CosmosHybridDownsample."""

    spatial: bool
    temporal: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if not self.spatial and not self.temporal:
            return x
        c = x.shape[-1]
        if self.temporal:
            x = jnp.repeat(x, 2, axis=1)[:, 1:]  # 1+k -> 1+2k (causal)
            x = CausalConvF(c, (3, 1, 1), dtype=self.dtype,
                            name="conv1")(x) + x
        if self.spatial:
            x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
            x = CausalConvF(c, (1, 3, 3), dtype=self.dtype,
                            name="conv2")(x) + x
        return CausalConvF(c, (1, 1, 1), dtype=self.dtype, name="conv3")(x)


class CosmosTokenizerDecoder(nn.Module):
    """DecoderFactorized mirror: conv_in pair -> mid (resnet, attn pair,
    resnet) -> up levels from deepest to shallowest (num_res_blocks+1
    resnets each, hybrid upsample between levels) -> norm_out -> conv_out
    pair -> inverse haar unpatcher."""

    config: CosmosTokenizerConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        n = len(cfg.channels_mult)
        ch = cfg.channels * cfg.channels_mult[-1]
        h = FactorizedConv(ch, cfg.dtype, name="conv_in")(z)
        h = CosmosResnetF(ch, cfg.dtype, name="mid_res_0")(h)
        h = CosmosSpatialAttn(cfg.dtype, name="mid_attn_s")(h)
        h = CosmosTemporalAttn(cfg.dtype, name="mid_attn_t")(h)
        h = CosmosResnetF(ch, cfg.dtype, name="mid_res_1")(h)
        for i in reversed(range(n)):
            ch = cfg.channels * cfg.channels_mult[i]
            for j in range(cfg.num_res_blocks + 1):
                h = CosmosResnetF(ch, cfg.dtype, name=f"up_{i}_res_{j}")(h)
                if i in cfg.attn_levels:
                    h = CosmosSpatialAttn(cfg.dtype,
                                          name=f"up_{i}_attn_{j}_s")(h)
                    h = CosmosTemporalAttn(cfg.dtype,
                                           name=f"up_{i}_attn_{j}_t")(h)
            if i > 0:
                sup, tup = cfg.downsample_flags[i - 1]
                h = CosmosHybridUpsample(sup, tup, cfg.dtype,
                                         name=f"up_{i}_upsample")(h)
        h = _norm1g(h, "norm_out")
        h = nn.silu(h)
        h = FactorizedConv(cfg.in_channels * cfg.patch_size ** 3,
                           cfg.dtype, name="conv_out")(h)
        return haar_unpatch_3d(h, cfg.patch_size)


class CosmosTokenizerEncoder(nn.Module):
    config: CosmosTokenizerConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = haar_patch_3d(x, cfg.patch_size)
        h = FactorizedConv(cfg.channels, cfg.dtype, name="conv_in")(x)
        in_mult = (1,) + tuple(cfg.channels_mult)
        n = len(cfg.channels_mult)
        for i in range(n):
            ch = cfg.channels * cfg.channels_mult[i]
            for j in range(cfg.num_res_blocks):
                h = CosmosResnetF(ch, cfg.dtype,
                                  name=f"down_{i}_res_{j}")(h)
                if i in cfg.attn_levels:
                    h = CosmosSpatialAttn(cfg.dtype,
                                          name=f"down_{i}_attn_{j}_s")(h)
                    h = CosmosTemporalAttn(cfg.dtype,
                                           name=f"down_{i}_attn_{j}_t")(h)
            if i < n - 1:
                sdown, tdown = cfg.downsample_flags[i]
                h = CosmosHybridDownsample(
                    sdown, tdown, cfg.dtype, name=f"down_{i}_downsample")(h)
        ch = cfg.channels * cfg.channels_mult[-1]
        h = CosmosResnetF(ch, cfg.dtype, name="mid_res_0")(h)
        h = CosmosSpatialAttn(cfg.dtype, name="mid_attn_s")(h)
        h = CosmosTemporalAttn(cfg.dtype, name="mid_attn_t")(h)
        h = CosmosResnetF(ch, cfg.dtype, name="mid_res_1")(h)
        h = _norm1g(h, "norm_out")
        h = nn.silu(h)
        return FactorizedConv(cfg.z_channels, cfg.dtype, name="conv_out")(h)


class CosmosVideoTokenizer(nn.Module):
    """encode over (B, C, F, H, W) -> sigma_data-scaled latents, exactly
    the reference CausalContinuousVideoTokenizer.encode (cosmos.py:67-75):
    encoder -> quant_conv -> ((z - mean) / std) * sigma_data with the
    per-(channel, latent-frame) stats [C*16] viewed [C, 16][:, :t]."""

    config: CosmosTokenizerConfig

    def setup(self):
        cfg = self.config
        self.encoder = CosmosTokenizerEncoder(cfg)
        self.decoder = CosmosTokenizerDecoder(cfg)
        self.quant_conv = CausalConvF(
            cfg.embedding_dim, (1, 1, 1), dtype=cfg.dtype)
        self.post_quant_conv = CausalConvF(
            cfg.z_channels, (1, 1, 1), dtype=cfg.dtype)
        k = cfg.embedding_dim * cfg.latent_temporal_chunk
        self.latent_mean = self.param(
            "latent_mean", nn.initializers.zeros_init(), (k,), jnp.float32)
        self.latent_std = self.param(
            "latent_std", nn.initializers.ones_init(), (k,), jnp.float32)

    def encode(self, pixels):
        cfg = self.config
        x = jnp.transpose(pixels, (0, 2, 3, 4, 1))
        z = self.quant_conv(self.encoder(x))
        z = jnp.transpose(z, (0, 4, 1, 2, 3))        # B, C, T, H, W
        t = z.shape[2]
        mean = self.latent_mean.reshape(cfg.embedding_dim, -1)[:, :t]
        std = self.latent_std.reshape(cfg.embedding_dim, -1)[:, :t]
        shape = (1, cfg.embedding_dim, t, 1, 1)
        return ((z - mean.reshape(shape)) / std.reshape(shape)) \
            * cfg.sigma_data

    def decode(self, latents):
        """Reference CausalContinuousVideoTokenizer.decode (cosmos.py:77-86):
        z / sigma_data * std + mean -> post_quant_conv -> decoder."""
        cfg = self.config
        t = latents.shape[2]
        mean = self.latent_mean.reshape(cfg.embedding_dim, -1)[:, :t]
        std = self.latent_std.reshape(cfg.embedding_dim, -1)[:, :t]
        shape = (1, cfg.embedding_dim, t, 1, 1)
        z = latents / cfg.sigma_data
        z = z * std.reshape(shape) + mean.reshape(shape)
        z = jnp.transpose(z, (0, 2, 3, 4, 1))
        z = self.post_quant_conv(z)
        out = self.decoder(z)
        return jnp.transpose(out, (0, 4, 1, 2, 3))

    def __call__(self, pixels):
        return self.decode(self.encode(pixels))


# --- weight conversion -------------------------------------------------------


def _conv3d_kernel(w):
    """torch Conv3d [O, I, kt, kh, kw] -> flax [kt, kh, kw, I, O]."""
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 4, 1, 0))


def convert_cosmos_tokenizer(sd) -> Tuple[CosmosTokenizerConfig, dict]:
    """NVIDIA Cosmos continuous-tokenizer checkpoint -> (config, params).

    Expects the CausalContinuousVideoTokenizer state dict the reference
    loads (cosmos.py:111 load_custom_video_vae): `encoder.*`, `decoder.*`,
    `quant_conv`/`post_quant_conv`, `latent_mean`/`latent_std`. Topology
    (levels, res blocks, channel widths, which hybrid down/upsample convs
    exist, attn presence) is DISCOVERED from the keys and kernel shapes —
    up/downsample conv roles are read from kernel shapes (kt==3 temporal,
    kh==3 spatial), not names; keys that fit no known slot raise instead
    of converting silently wrong."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    consumed = set()

    def take(key):
        consumed.add(key)
        return sd[key]

    def has(key):
        return key in sd

    def conv(prefix):
        # Cosmos CausalConv3d wraps `conv3d`; accept a bare Conv3d too
        base = (f"{prefix}.conv3d" if has(f"{prefix}.conv3d.weight")
                else prefix)
        out = {"kernel": _conv3d_kernel(take(f"{base}.weight"))}
        if has(f"{base}.bias"):
            out["bias"] = take(f"{base}.bias")
        return out

    def fconv(prefix):
        # factorized nn.Sequential pair: .0 spatial, .1 temporal
        return {"s": {"conv": conv(f"{prefix}.0")},
                "t": {"conv": conv(f"{prefix}.1")}}

    def norm(prefix):
        base = (f"{prefix}.norm" if has(f"{prefix}.norm.weight")
                else prefix)
        return {"scale": take(f"{base}.weight"),
                "bias": take(f"{base}.bias")}

    def resnet(prefix):
        p = {"norm1": norm(f"{prefix}.norm1"),
             "conv1": fconv(f"{prefix}.conv1"),
             "norm2": norm(f"{prefix}.norm2"),
             "conv2": fconv(f"{prefix}.conv2")}
        for nin in (f"{prefix}.nin_shortcut",):
            if has(f"{nin}.conv3d.weight") or has(f"{nin}.weight"):
                p["nin_shortcut"] = {"conv": conv(nin)}
        return p

    def attn(prefix):
        return {"norm": norm(f"{prefix}.norm"),
                **{k: {"conv": conv(f"{prefix}.{k}")}
                   for k in ("q", "k", "v", "proj_out")}}

    # ---- discover topology
    level_ids = sorted({int(m.group(1)) for k in sd
                        for m in [re.match(r"encoder\.down\.(\d+)\.", k)]
                        if m})
    n_levels = len(level_ids)
    assert level_ids == list(range(n_levels)), level_ids
    blocks_per = sorted({int(m.group(1)) for k in sd
                         for m in [re.match(
                             r"encoder\.down\.0\.block\.(\d+)\.", k)] if m})
    num_res_blocks = len(blocks_per)

    def cw(key):   # conv weight lookup for shape probing
        return sd.get(key + ".conv3d.weight", sd.get(key + ".weight"))

    conv_in_w = cw("encoder.conv_in.0")
    channels = conv_in_w.shape[0]
    in_ch_patched = conv_in_w.shape[1]
    # 8x channel growth per haar level
    levels = 0
    c = in_ch_patched
    while c % 8 == 0 and c // 8 >= 1 and c // 8 != c:
        nxt = c // 8
        levels += 1
        c = nxt
        if c in (1, 3):
            break
    patch_size = 2 ** levels
    in_channels = c
    mults = []
    for i in range(n_levels):
        w0 = cw(f"encoder.down.{i}.block.0.conv1.0")
        mults.append(w0.shape[0] // channels)

    flags = []
    for i in range(n_levels - 1):
        base = f"encoder.down.{i}.downsample"
        flags.append((cw(f"{base}.conv1") is not None,
                      cw(f"{base}.conv2") is not None))
    attn_levels = tuple(
        i for i in range(n_levels)
        if cw(f"encoder.down.{i}.attn.0.0.q") is not None)

    zc_w = cw("encoder.conv_out.0")
    qw = cw("quant_conv")
    emb = qw.shape[0]
    lm = np.asarray(take("latent_mean"), np.float32).reshape(-1)
    chunk = lm.shape[0] // emb
    cfg = CosmosTokenizerConfig(
        in_channels=in_channels, channels=channels,
        channels_mult=tuple(mults), num_res_blocks=num_res_blocks,
        patch_size=patch_size, z_channels=zc_w.shape[0],
        embedding_dim=emb, downsample_flags=tuple(flags),
        attn_levels=attn_levels, latent_temporal_chunk=chunk,
    )

    ep = {"conv_in": fconv("encoder.conv_in"),
          "conv_out": fconv("encoder.conv_out"),
          "norm_out": norm("encoder.norm_out")}
    for i in range(n_levels):
        for j in range(num_res_blocks):
            ep[f"down_{i}_res_{j}"] = resnet(f"encoder.down.{i}.block.{j}")
            if i in attn_levels:
                ep[f"down_{i}_attn_{j}_s"] = attn(
                    f"encoder.down.{i}.attn.{j}.0")
                ep[f"down_{i}_attn_{j}_t"] = attn(
                    f"encoder.down.{i}.attn.{j}.1")
        if i < n_levels - 1:
            base = f"encoder.down.{i}.downsample"
            d = {}
            if flags[i][0]:
                d["conv1"] = {"conv": conv(f"{base}.conv1")}
            if flags[i][1]:
                d["conv2_conv"] = conv(f"{base}.conv2")
            if flags[i][0] or flags[i][1]:
                d["conv3"] = {"conv": conv(f"{base}.conv3")}
            if d:
                ep[f"down_{i}_downsample"] = d
    ep["mid_res_0"] = resnet("encoder.mid.block_1")
    ep["mid_res_1"] = resnet("encoder.mid.block_2")
    ep["mid_attn_s"] = attn("encoder.mid.attn_1.0")
    ep["mid_attn_t"] = attn("encoder.mid.attn_1.1")

    # ---- decoder (mirror; up levels keep NVIDIA's indices) -------------
    dp = {"conv_in": fconv("decoder.conv_in"),
          "conv_out": fconv("decoder.conv_out"),
          "norm_out": norm("decoder.norm_out"),
          "mid_res_0": resnet("decoder.mid.block_1"),
          "mid_res_1": resnet("decoder.mid.block_2"),
          "mid_attn_s": attn("decoder.mid.attn_1.0"),
          "mid_attn_t": attn("decoder.mid.attn_1.1")}
    up_blocks = sorted({int(mm.group(1)) for kk in sd
                        for mm in [re.match(
                            r"decoder\.up\.\d+\.block\.(\d+)\.", kk)]
                        if mm})
    assert len(up_blocks) == num_res_blocks + 1, up_blocks
    for i in range(n_levels):
        for j in range(num_res_blocks + 1):
            dp[f"up_{i}_res_{j}"] = resnet(f"decoder.up.{i}.block.{j}")
            if cw(f"decoder.up.{i}.attn.{j}.0.q") is not None:
                dp[f"up_{i}_attn_{j}_s"] = attn(f"decoder.up.{i}.attn.{j}.0")
                dp[f"up_{i}_attn_{j}_t"] = attn(f"decoder.up.{i}.attn.{j}.1")
        base = f"decoder.up.{i}.upsample"
        u = {}
        for cname in ("conv1", "conv2"):
            w = cw(f"{base}.{cname}")
            if w is None:
                continue
            # role by kernel shape, not name: (3,1,1) temporal, (1,3,3)
            # spatial; flax names conv1=temporal, conv2=spatial
            if w.shape[2] == 3:
                u["conv1"] = {"conv": conv(f"{base}.{cname}")}
            else:
                u["conv2"] = {"conv": conv(f"{base}.{cname}")}
        if u:
            u["conv3"] = {"conv": conv(f"{base}.conv3")}
            dp[f"up_{i}_upsample"] = u
            # decoder upsample at index i inverts encoder downsample i-1
            assert i >= 1 and (flags[i - 1][0] or flags[i - 1][1]), (
                f"decoder.up.{i}.upsample present but encoder level "
                f"{i - 1} has no downsample")

    params = {"params": {
        "encoder": ep,
        "decoder": dp,
        "quant_conv": {"conv": conv("quant_conv")},
        "post_quant_conv": {"conv": conv("post_quant_conv")},
        "latent_mean": lm,
        "latent_std": np.asarray(take("latent_std"), np.float32).reshape(-1),
    }}
    leftover = [k for k in sd if k not in consumed
                and not re.search(r"(_arange|wavelets|patch_size_buffer)", k)]
    if leftover:
        raise ValueError(
            f"unconverted Cosmos tokenizer keys: {sorted(leftover)[:8]} "
            f"(+{max(0, len(leftover) - 8)} more)")
    return cfg, params
