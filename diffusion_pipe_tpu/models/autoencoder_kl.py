"""KL autoencoder (SD / SDXL / Flux image VAE) in Flax, NHWC on-device.

The reference loads diffusers `AutoencoderKL` for these models (e.g.
models/flux.py get_vae, models/sdxl.py) and runs it GPU-side during the
caching phase (dataset.py:1216-1255). Here the same architecture is a native
Flax module so latent caching is one jitted XLA program; layouts are NHWC
(TPU conv-friendly), with NCHW conversion at the call boundary.

Config presets:
  sd / sdxl : 4 latent channels, scaling 0.18215 / 0.13025, quant convs
  flux      : 16 latent channels, scaling 0.3611, shift 0.1159, no quant conv

Weight conversion from diffusers safetensors: convert_diffusers_vae().
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.3611
    shift_factor: float = 0.1159
    use_quant_conv: bool = False
    dtype: Any = jnp.float32

    @staticmethod
    def flux() -> "VAEConfig":
        return VAEConfig()

    @staticmethod
    def sdxl() -> "VAEConfig":
        return VAEConfig(
            latent_channels=4, scaling_factor=0.13025, shift_factor=0.0,
            use_quant_conv=True,
        )

    @staticmethod
    def sd() -> "VAEConfig":
        return VAEConfig(
            latent_channels=4, scaling_factor=0.18215, shift_factor=0.0,
            use_quant_conv=True,
        )

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(
            latent_channels=4, block_out_channels=(8, 16), norm_num_groups=4,
            layers_per_block=1, scaling_factor=1.0, shift_factor=0.0,
        )

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(c).astype(q.dtype),
            axis=-1,
        )
        y = jnp.einsum("bqk,bkc->bqc", attn, v)
        y = nn.Dense(c, dtype=self.dtype, name="to_out")(y)
        return x + y.reshape(b, h, w, c)


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=cfg.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, cfg.norm_num_groups, cfg.dtype,
                                name=f"down_{i}_res_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                # diffusers Downsample2D: pad right/bottom, stride-2 valid conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=2, padding="VALID",
                            dtype=cfg.dtype, name=f"down_{i}_downsample")(h)
        ch = cfg.block_out_channels[-1]
        h = ResnetBlock(ch, cfg.norm_num_groups, cfg.dtype, name="mid_res_0")(h)
        h = AttnBlock(cfg.norm_num_groups, cfg.dtype, name="mid_attn")(h)
        h = ResnetBlock(ch, cfg.norm_num_groups, cfg.dtype, name="mid_res_1")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                    dtype=cfg.dtype, name="conv_out")(h)
        if cfg.use_quant_conv:
            h = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=cfg.dtype,
                        name="quant_conv")(h)
        return h  # [..., 2*latent]: mean, logvar


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        if cfg.use_quant_conv:
            z = nn.Conv(cfg.latent_channels, (1, 1), dtype=cfg.dtype,
                        name="post_quant_conv")(z)
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=cfg.dtype, name="conv_in")(z)
        h = ResnetBlock(ch, cfg.norm_num_groups, cfg.dtype, name="mid_res_0")(h)
        h = AttnBlock(cfg.norm_num_groups, cfg.dtype, name="mid_attn")(h)
        h = ResnetBlock(ch, cfg.norm_num_groups, cfg.dtype, name="mid_res_1")(h)
        for i, ch in enumerate(reversed(cfg.block_out_channels)):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(ch, cfg.norm_num_groups, cfg.dtype,
                                name=f"up_{i}_res_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                h = nn.Conv(c, (3, 3), padding=1, dtype=cfg.dtype,
                            name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=cfg.dtype,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """encode(x NCHW [-1,1]) -> scaled latents NCHW; decode inverts."""

    config: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.config)
        self.decoder = Decoder(self.config)

    def encode_moments(self, pixels_nchw):
        x = jnp.transpose(pixels_nchw, (0, 2, 3, 1)).astype(self.config.dtype)
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, logvar

    def encode(self, pixels_nchw, rng: Optional[jax.Array] = None):
        """Posterior sample (or mode if rng None), scaled+shifted like
        diffusers: z = (sample - shift) * scale."""
        mean, logvar = self.encode_moments(pixels_nchw)
        if rng is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            mean = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        z = (mean - self.config.shift_factor) * self.config.scaling_factor
        return jnp.transpose(z, (0, 3, 1, 2))

    def decode(self, latents_nchw):
        z = jnp.transpose(latents_nchw, (0, 2, 3, 1)).astype(self.config.dtype)
        z = z / self.config.scaling_factor + self.config.shift_factor
        x = self.decoder(z)
        return jnp.transpose(x, (0, 3, 1, 2))

    def __call__(self, pixels_nchw):
        # round trip so init() creates both encoder and decoder params
        return self.decode(self.encode(pixels_nchw))


# --- diffusers weight conversion -------------------------------------------


def _conv(t):
    import numpy as np

    return np.transpose(np.asarray(t), (2, 3, 1, 0))  # OIHW -> HWIO


def convert_diffusers_vae(state_dict, config: VAEConfig):
    """diffusers AutoencoderKL state dict (torch-layout numpy arrays) ->
    flax params for this module. Keys per diffusers >= 0.30 naming."""
    import numpy as np

    p_enc, p_dec = {}, {}

    def put(tree, path, kernel, bias=None, is_conv=True):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        entry = {"kernel": _conv(kernel) if is_conv else np.asarray(kernel).T}
        if bias is not None:
            entry["bias"] = np.asarray(bias)
        node[path[-1]] = entry

    def put_norm(tree, path, scale, bias):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = {"scale": np.asarray(scale), "bias": np.asarray(bias)}

    sd = state_dict

    def g(key):
        return sd[key]

    def res(tree, src, dst):
        put_norm(tree, (dst, "norm1"), g(f"{src}.norm1.weight"), g(f"{src}.norm1.bias"))
        put(tree, (dst, "conv1"), g(f"{src}.conv1.weight"), g(f"{src}.conv1.bias"))
        put_norm(tree, (dst, "norm2"), g(f"{src}.norm2.weight"), g(f"{src}.norm2.bias"))
        put(tree, (dst, "conv2"), g(f"{src}.conv2.weight"), g(f"{src}.conv2.bias"))
        if f"{src}.conv_shortcut.weight" in sd:
            put(tree, (dst, "conv_shortcut"), g(f"{src}.conv_shortcut.weight"),
                g(f"{src}.conv_shortcut.bias"))

    def attn(tree, src, dst):
        put_norm(tree, (dst, "group_norm"), g(f"{src}.group_norm.weight"),
                 g(f"{src}.group_norm.bias"))
        for name in ("to_q", "to_k", "to_v"):
            put(tree, (dst, name), g(f"{src}.{name}.weight"),
                g(f"{src}.{name}.bias"), is_conv=False)
        put(tree, (dst, "to_out"), g(f"{src}.to_out.0.weight"),
            g(f"{src}.to_out.0.bias"), is_conv=False)

    n_blocks = len(config.block_out_channels)
    # encoder
    put(p_enc, ("conv_in",), g("encoder.conv_in.weight"), g("encoder.conv_in.bias"))
    for i in range(n_blocks):
        for j in range(config.layers_per_block):
            res(p_enc, f"encoder.down_blocks.{i}.resnets.{j}", f"down_{i}_res_{j}")
        if i < n_blocks - 1:
            put(p_enc, (f"down_{i}_downsample",),
                g(f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"),
                g(f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"))
    res(p_enc, "encoder.mid_block.resnets.0", "mid_res_0")
    res(p_enc, "encoder.mid_block.resnets.1", "mid_res_1")
    attn(p_enc, "encoder.mid_block.attentions.0", "mid_attn")
    put_norm(p_enc, ("conv_norm_out",), g("encoder.conv_norm_out.weight"),
             g("encoder.conv_norm_out.bias"))
    put(p_enc, ("conv_out",), g("encoder.conv_out.weight"), g("encoder.conv_out.bias"))
    if config.use_quant_conv:
        put(p_enc, ("quant_conv",), g("quant_conv.weight"), g("quant_conv.bias"))

    # decoder
    if config.use_quant_conv:
        put(p_dec, ("post_quant_conv",), g("post_quant_conv.weight"),
            g("post_quant_conv.bias"))
    put(p_dec, ("conv_in",), g("decoder.conv_in.weight"), g("decoder.conv_in.bias"))
    res(p_dec, "decoder.mid_block.resnets.0", "mid_res_0")
    res(p_dec, "decoder.mid_block.resnets.1", "mid_res_1")
    attn(p_dec, "decoder.mid_block.attentions.0", "mid_attn")
    for i in range(n_blocks):
        for j in range(config.layers_per_block + 1):
            res(p_dec, f"decoder.up_blocks.{i}.resnets.{j}", f"up_{i}_res_{j}")
        if i < n_blocks - 1:
            put(p_dec, (f"up_{i}_upsample",),
                g(f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"),
                g(f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"))
    put_norm(p_dec, ("conv_norm_out",), g("decoder.conv_norm_out.weight"),
             g("decoder.conv_norm_out.bias"))
    put(p_dec, ("conv_out",), g("decoder.conv_out.weight"), g("decoder.conv_out.bias"))

    return {"params": {"encoder": p_enc, "decoder": p_dec}}


# --- universal image-VAE loader ----------------------------------------------


def convert_sd_vae_keys_to_diffusers(sd):
    """Original SD first_stage_model keys -> diffusers AutoencoderKL keys
    (inverse of the reference's convert_vae_state_dict, sdxl.py:125-201).
    Mid-attention q/k/v/proj_out conv [O,I,1,1] weights flatten to linear."""
    import numpy as np

    renames = [
        ("conv_shortcut", "nin_shortcut"),
        ("conv_norm_out", "norm_out"),
        ("mid_block.attentions.0.", "mid.attn_1."),
    ]
    for i in range(4):
        for j in range(2):
            renames.append((f"encoder.down_blocks.{i}.resnets.{j}.",
                            f"encoder.down.{i}.block.{j}."))
        if i < 3:
            renames.append((f"down_blocks.{i}.downsamplers.0.",
                            f"down.{i}.downsample."))
            renames.append((f"up_blocks.{i}.upsamplers.0.",
                            f"up.{3-i}.upsample."))
        for j in range(3):
            renames.append((f"decoder.up_blocks.{i}.resnets.{j}.",
                            f"decoder.up.{3-i}.block.{j}."))
    for i in range(2):
        renames.append((f"mid_block.resnets.{i}.", f"mid.block_{i+1}."))
    attn_renames = [
        ("group_norm.", "norm."),
        ("to_q.", "q."),
        ("to_k.", "k."),
        ("to_v.", "v."),
        ("to_out.0.", "proj_out."),
    ]
    out = {}
    for k, v in sd.items():
        nk = k
        for hf_part, sd_part in renames:
            nk = nk.replace(sd_part, hf_part)
        if "mid_block.attentions" in nk:
            for hf_part, sd_part in attn_renames:
                nk = nk.replace(sd_part, hf_part)
            v = np.asarray(v)
            if v.ndim == 4 and v.shape[2] == v.shape[3] == 1:
                v = v.reshape(v.shape[0], v.shape[1])
        out[nk] = v
    return out


def infer_vae_config_from_sd(sd, **overrides) -> VAEConfig:
    """Derive the AutoencoderKL topology from weight shapes (works for SD1.5
    4ch, SDXL 4ch, flux 16ch, flux2 32ch, and deeper KL variants like
    HunyuanImage's 32x VAE — depth, widths, and latent channels all come
    from the tensors)."""
    import numpy as np

    blocks = []
    i = 0
    while f"encoder.down_blocks.{i}.resnets.0.conv1.weight" in sd:
        blocks.append(
            int(np.asarray(
                sd[f"encoder.down_blocks.{i}.resnets.0.conv1.weight"]
            ).shape[0])
        )
        i += 1
    if not blocks:
        raise ValueError("not an AutoencoderKL-shaped state dict")
    layers = 0
    while f"encoder.down_blocks.0.resnets.{layers}.conv1.weight" in sd:
        layers += 1
    latent = int(np.asarray(sd["encoder.conv_out.weight"]).shape[0]) // 2
    defaults = {
        16: dict(scaling_factor=0.3611, shift_factor=0.1159),   # flux
        4: dict(scaling_factor=0.13025, shift_factor=0.0),      # sdxl
    }
    kw = dict(
        latent_channels=latent,
        block_out_channels=tuple(blocks),
        layers_per_block=layers,
        use_quant_conv="quant_conv.weight" in sd,
        **defaults.get(latent, dict(scaling_factor=1.0, shift_factor=0.0)),
    )
    kw.update(overrides)
    return VAEConfig(**kw)


def load_image_vae(path, **config_overrides):
    """Load any AutoencoderKL-family image VAE from a safetensors file or
    directory: accepts diffusers keys, original-SD (`first_stage_model.`)
    keys, and ComfyUI `vae.` prefixes; topology inferred from shapes.
    Returns (vae, params, config)."""
    from .weights import load_safetensors_dir

    sd = load_safetensors_dir(path)
    stripped = {}
    for k, v in sd.items():
        for p in ("first_stage_model.", "vae."):
            if k.startswith(p):
                k = k[len(p):]
                break
        stripped[k] = v
    sd = stripped
    if any(k.startswith("encoder.down.") for k in sd):
        sd = convert_sd_vae_keys_to_diffusers(sd)
    cfg = infer_vae_config_from_sd(sd, **config_overrides)
    vae = AutoencoderKL(cfg)
    params = convert_diffusers_vae(sd, cfg)
    return vae, params, cfg
