"""LTX-Video rope numerics vs a numpy replica of the public
Lightricks/LTX-Video Transformer3DModel.precompute_freqs_cis ("exp"
spacing) + apply_rotary_emb pair: full-inner_dim tables from fractional
pixel coordinates, axis-fastest interleave, dim%6 leading identity
padding, rotation applied BEFORE the head split. The reference repo
feeds that transformer pixel_coords with time/framerate
(reference models/ltx_video.py:190-192)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pipe_tpu.models.ltx_video import (
    apply_rope_full_dim,
    ltx_rope_tables,
)


def _numpy_precompute_freqs_cis(indices_grid, dim, theta, max_pos):
    """Line-for-line numpy port of the torch math (indices_grid [3, S])."""
    fractional_positions = np.stack(
        [indices_grid[i] / np.float32(max_pos[i]) for i in range(3)],
        axis=-1,
    ).astype(np.float32)  # [S, 3]
    start, end = 1.0, float(theta)
    # float64 ladder cast to f32 (the torch original powers a float32
    # linspace; at the top band theta*pi/2 ~ 1.6e4 rad that construction
    # is only stable to ~1e-3 in cos — both sides here pin the same
    # f64-then-cast ladder so the PAIRING/LAYOUT math is tested tightly)
    indices = (
        theta ** np.linspace(
            math.log(start, theta), math.log(end, theta), dim // 6,
            dtype=np.float64,
        ) * (math.pi / 2)
    ).astype(np.float32)
    # freqs = (indices * (frac.unsqueeze(-1)*2 - 1)).transpose(-1,-2).flatten(2)
    freqs = indices[None, :, None] * (
        fractional_positions[:, None, :] * 2 - 1
    )  # [S, dim//6, 3] — already the transposed layout
    freqs = freqs.reshape(freqs.shape[0], -1)
    cos_freq = np.repeat(np.cos(freqs), 2, axis=-1)
    sin_freq = np.repeat(np.sin(freqs), 2, axis=-1)
    if dim % 6 != 0:
        cos_pad = np.ones_like(cos_freq[:, : dim % 6])
        sin_pad = np.zeros_like(sin_freq[:, : dim % 6])
        cos_freq = np.concatenate([cos_pad, cos_freq], axis=-1)
        sin_freq = np.concatenate([sin_pad, sin_freq], axis=-1)
    return cos_freq, sin_freq  # [S, dim]


def _numpy_apply_rotary_emb(x, cos, sin):
    """torch apply_rotary_emb: x [S, dim] flat (pre-head-split)."""
    t1 = x[..., 0::2]
    t2 = x[..., 1::2]
    rot = np.stack([-t2, t1], axis=-1).reshape(x.shape)
    return x * cos + rot * sin


@pytest.mark.quick
@pytest.mark.gate
@pytest.mark.parametrize("dim,heads", [(32, 2), (48, 4)])
def test_ltx_rope_matches_torch_math(dim, heads):
    # pixel-space coords: t in seconds (already / framerate), h/w in pixels
    rng = np.random.default_rng(0)
    s = 12
    coords = np.stack([
        rng.uniform(0, 3.0, s),       # seconds
        rng.integers(0, 2048, s).astype(np.float64),
        rng.integers(0, 2048, s).astype(np.float64),
    ]).astype(np.float32)  # [3, S]
    max_pos = (20, 2048, 2048)
    theta = 10000.0

    cos_ref, sin_ref = _numpy_precompute_freqs_cis(
        coords, dim, theta, max_pos)
    cos, sin = ltx_rope_tables(
        jnp.asarray(coords.T), dim, theta, max_pos)
    # pair format [S, dim//2] == every even column of the torch [S, dim]
    np.testing.assert_allclose(np.asarray(cos), cos_ref[:, 0::2],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin), sin_ref[:, 0::2],
                               rtol=1e-5, atol=1e-5)

    # full application: torch rotates the flat [S, dim] BEFORE head split
    x = rng.standard_normal((2, s, dim)).astype(np.float32)
    out_ref = _numpy_apply_rotary_emb(x, cos_ref[None], sin_ref[None])
    out_ref = out_ref.reshape(2, s, heads, dim // heads)
    out = apply_rope_full_dim(
        jnp.asarray(x.reshape(2, s, heads, dim // heads)), cos, sin)
    np.testing.assert_allclose(np.asarray(out), out_ref,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.quick
@pytest.mark.gate
def test_ltx_pixel_coords_and_causal_fix():
    """Pipeline coords are latent idx x VAE factors with time / framerate;
    causal_temporal_positioning clamps t*8 + 1 - 8 at 0 (first latent
    frame holds one pixel frame)."""
    from diffusion_pipe_tpu.models import get_model_class

    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "ltx-video", "dtype": "float32", "_tiny": True},
        "optimizer": {"type": "adamw", "lr": 1e-4},
    }
    pipe = get_model_class("ltx-video")(cfg)
    f, h, w = 3, 2, 2
    coords = np.asarray(pipe._pixel_coords(f, h, w, 1))[0]  # [3, S]
    assert coords.shape == (3, f * h * w)
    # time axis: frame k -> k*8/25 seconds
    np.testing.assert_allclose(coords[0, : h * w], 0.0)
    np.testing.assert_allclose(coords[0, h * w: 2 * h * w], 8.0 / 25.0)
    # spatial: latent idx * 32 pixels
    np.testing.assert_allclose(coords[1, :4], [0, 0, 32, 32])
    np.testing.assert_allclose(coords[2, :4], [0, 32, 0, 32])

    cfg["model"]["causal_temporal_positioning"] = True
    pipe = get_model_class("ltx-video")(cfg)
    coords = np.asarray(pipe._pixel_coords(f, h, w, 1))[0]
    # t=0 -> clamp(0+1-8,0)=0; t=1 -> 1*8+1-8 = 1; t=2 -> 9
    np.testing.assert_allclose(coords[0, : h * w], 0.0)
    np.testing.assert_allclose(coords[0, h * w: 2 * h * w], 1.0 / 25.0)
    np.testing.assert_allclose(coords[0, 2 * h * w:], 9.0 / 25.0)
