"""HunyuanVideo 3D causal VAE: shape math, causal frame handling,
converter structure round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import traverse_util

from diffusion_pipe_tpu.models.hunyuan_vae import (
    HunyuanVAE,
    HunyuanVAEConfig,
    convert_diffusers_hunyuan_vae,
)


def test_encode_decode_shapes():
    cfg = HunyuanVAEConfig.tiny()
    vae = HunyuanVAE(cfg)
    px = jnp.zeros((1, 3, 9, 32, 32))  # F = 4k+1
    params = vae.init(jax.random.PRNGKey(0), px)
    z = vae.apply(params, px, method=HunyuanVAE.encode)
    # temporal 4x causal: (9-1)/4 + 1 = 3; spatial 8x: 32 -> 4
    assert z.shape == (1, cfg.latent_channels, 3, 4, 4), z.shape
    out = vae.apply(params, z, method=HunyuanVAE.decode)
    assert out.shape == (1, 3, 9, 32, 32), out.shape


def test_single_frame_image():
    cfg = HunyuanVAEConfig.tiny()
    vae = HunyuanVAE(cfg)
    px = jnp.zeros((1, 3, 1, 16, 16))
    params = vae.init(jax.random.PRNGKey(0), px)
    z = vae.apply(params, px, method=HunyuanVAE.encode)
    assert z.shape == (1, cfg.latent_channels, 1, 2, 2), z.shape


def test_causal_conv_is_causal():
    """CausalConv3dR output at time t depends only on frames <= t.

    (The full encoder is NOT strictly frame-causal because GroupNorm
    normalizes across time, exactly as in the torch reference arch —
    causality holds at the conv level.)"""
    from diffusion_pipe_tpu.models.hunyuan_vae import CausalConv3dR

    conv = CausalConv3dR(4)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 8, 8, 3))
    params = conv.init(jax.random.PRNGKey(0), x)
    y_full = conv.apply(params, x)
    x2 = x.at[:, 4:].set(0.0)
    y_mod = conv.apply(params, x2)
    np.testing.assert_allclose(
        np.asarray(y_full[:, :4]), np.asarray(y_mod[:, :4]), atol=1e-5
    )
    assert float(jnp.abs(y_full[:, 4:] - y_mod[:, 4:]).max()) > 1e-4


def _fake_diffusers_sd(params):
    """Invert convert_diffusers_hunyuan_vae on an init'd tree."""
    sd = {}
    flat = traverse_util.flatten_dict(params["params"])
    for path, v in flat.items():
        side = path[0]
        rest = path[1:]
        v = np.asarray(v)

        def put_conv(diff_key):
            sd[diff_key + ".weight"] = np.transpose(v, (4, 3, 0, 1, 2))

        name = "/".join(rest)
        if rest[0] in ("conv_in", "conv_out") and rest[1] == "conv":
            key = f"{side}.{rest[0]}"
            if rest[-1] == "kernel":
                put_conv(key)
            else:
                sd[key + ".bias"] = v
            continue
        if rest[0] == "conv_norm_out":
            sd[f"{side}.conv_norm_out." +
               ("weight" if rest[-1] == "scale" else "bias")] = v
            continue
        if rest[0].startswith("mid_res_"):
            j = rest[0][-1]
            base = f"{side}.mid_block.resnets.{j}"
        elif rest[0] == "mid_attn":
            base = f"{side}.mid_block.attentions.0"
        elif "_res_" in rest[0]:
            updown, i, _, j = rest[0].split("_")
            base = f"{side}.{updown}_blocks.{i}.resnets.{j}"
        elif rest[0].endswith("downsample") or rest[0].endswith("upsample"):
            parts = rest[0].split("_")
            updown, i = parts[0], parts[1]
            sub = "downsamplers" if updown == "down" else "upsamplers"
            key = f"{side}.{updown}_blocks.{i}.{sub}.0.conv"
            if rest[-1] == "kernel":
                put_conv(key)
            else:
                sd[key + ".bias"] = v
            continue
        else:
            raise AssertionError(name)
        leaf = rest[1]
        if leaf in ("norm1", "norm2", "group_norm"):
            sd[f"{base}.{leaf}." +
               ("weight" if rest[-1] == "scale" else "bias")] = v
        elif leaf in ("conv1", "conv2"):
            key = f"{base}.{leaf}"
            if rest[-1] == "kernel":
                put_conv(key)
            else:
                sd[key + ".bias"] = v
        elif leaf == "conv_shortcut":
            key = f"{base}.conv_shortcut"
            if rest[-1] == "kernel":
                put_conv(key)
            else:
                sd[key + ".bias"] = v
        elif leaf in ("to_q", "to_k", "to_v"):
            key = f"{base}.{leaf}"
            if rest[-1] == "kernel":
                sd[key + ".weight"] = np.ascontiguousarray(v.T)
            else:
                sd[key + ".bias"] = v
        elif leaf == "to_out":
            key = f"{base}.to_out.0"
            if rest[-1] == "kernel":
                sd[key + ".weight"] = np.ascontiguousarray(v.T)
            else:
                sd[key + ".bias"] = v
        else:
            raise AssertionError(name)
    return sd


def test_converter_roundtrip():
    cfg = HunyuanVAEConfig.tiny()
    vae = HunyuanVAE(cfg)
    px = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 5, 16, 16)) * 0.3
    params = nn.unbox(vae.init(jax.random.PRNGKey(0), px))
    sd = _fake_diffusers_sd(params)
    converted = convert_diffusers_hunyuan_vae(sd, cfg)
    flat_a = traverse_util.flatten_dict(params["params"])
    flat_b = traverse_util.flatten_dict(converted["params"])
    assert set(flat_a) == set(flat_b), (
        set(flat_a) - set(flat_b), set(flat_b) - set(flat_a))
    z_a = vae.apply(params, px, method=HunyuanVAE.encode)
    z_b = vae.apply(converted, px, method=HunyuanVAE.encode)
    np.testing.assert_allclose(np.asarray(z_a), np.asarray(z_b), atol=1e-6)
