"""LTX-Video VAE converter: topology discovery + structural completeness
(VERDICT r2 item #3 / missing #6). The real checkpoint layout
(encoder.down_blocks.<k> flat list mixing res_x groups / compress convs /
channel-change resnets, per_channel_statistics latent stats) is synthesized
here at tiny dims; the converter must discover the block sequence, infer
patch size and latent width from shapes, fill every encoder leaf our
module expects, and reject unknown variants loudly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusion_pipe_tpu.models.ltx_vae import (
    LTXVideoVAE,
    convert_ltx_vae,
)

pytestmark = pytest.mark.quick


def _conv(o, i, k=3, rng=None):
    return rng.standard_normal((o, i, k, k, k)).astype(np.float32) * 0.05


def _synthetic_ltx_sd(rng):
    """0.9.0-style encoder layout at tiny dims: patch 2, channels 8->16,
    two compressions, latent 16."""
    sd = {}

    def causal(prefix, o, i):
        sd[f"{prefix}.conv.weight"] = _conv(o, i, rng=rng)
        sd[f"{prefix}.conv.bias"] = np.zeros((o,), np.float32)

    def resnet(prefix, o, i):
        causal(f"{prefix}.conv1", o, i)
        causal(f"{prefix}.conv2", o, o)
        if o != i:
            # make_linear_nd shortcut: plain [O, I] linear
            sd[f"{prefix}.conv_shortcut.weight"] = (
                rng.standard_normal((o, i)).astype(np.float32) * 0.05)
            sd[f"{prefix}.conv_shortcut.bias"] = np.zeros((o,), np.float32)

    causal("encoder.conv_in", 8, 3 * 2 * 2)
    # down_blocks.0: res_x group (2 layers @ 8)
    resnet("encoder.down_blocks.0.res_blocks.0", 8, 8)
    resnet("encoder.down_blocks.0.res_blocks.1", 8, 8)
    # down_blocks.1: compress_all
    causal("encoder.down_blocks.1", 8, 8)
    # down_blocks.2: res_x_y channel change 8 -> 16
    resnet("encoder.down_blocks.2", 16, 8)
    # down_blocks.3: res_x group (1 layer @ 16)
    resnet("encoder.down_blocks.3.res_blocks.0", 16, 16)
    # down_blocks.4: compress_all
    causal("encoder.down_blocks.4", 16, 16)
    # down_blocks.5: mid res group
    resnet("encoder.down_blocks.5.res_blocks.0", 16, 16)
    causal("encoder.conv_out", 32, 16)  # 2 * latent(16)
    sd["per_channel_statistics.mean-of-means"] = np.zeros((16,), np.float32)
    sd["per_channel_statistics.std-of-means"] = np.ones((16,), np.float32)
    # decoder keys exist in real files; converter must ignore them
    sd["decoder.conv_in.conv.weight"] = _conv(16, 16, rng=rng)
    sd["timestep_scale_multiplier"] = np.float32(1000.0)
    return sd


def test_convert_discovers_topology_and_encodes():
    rng = np.random.default_rng(0)
    sd = _synthetic_ltx_sd(rng)
    cfg, params = convert_ltx_vae(sd)

    assert cfg.patch_size == 2
    assert cfg.latent_channels == 16
    assert cfg.block_out_channels == (8, 16)
    assert cfg.layers_per_block == (2, 1, 1)
    assert cfg.spatio_temporal_scaling == (True, True)

    # every encoder leaf the module initializes must be present
    vae = LTXVideoVAE(cfg)
    ref = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 5, 16, 16)))
    from flax import traverse_util

    want = {k for k in traverse_util.flatten_dict(ref["params"])
            if k[0] in ("encoder", "latents_mean", "latents_std")}
    got = set(traverse_util.flatten_dict(params["params"]))
    assert want == got, sorted(want ^ got)[:10]
    for k, v in traverse_util.flatten_dict(params["params"]).items():
        rv = traverse_util.flatten_dict(ref["params"])[k]
        assert np.asarray(v).shape == np.asarray(rv).shape, k

    latents = vae.apply(
        params, jnp.asarray(
            rng.standard_normal((1, 3, 5, 16, 16)).astype(np.float32)),
        method=LTXVideoVAE.encode)
    # patch 2 x two stride-2 compressions = 8x spatial; temporal 4x causal
    assert latents.shape == (1, 16, 2, 2, 2)
    assert np.isfinite(np.asarray(latents)).all()
    assert float(jnp.abs(latents).max()) > 0


def test_convert_rejects_unknown_variants():
    rng = np.random.default_rng(1)
    sd = _synthetic_ltx_sd(rng)
    sd["encoder.down_blocks.0.res_blocks.0.norm1.weight"] = np.ones(
        (8,), np.float32)
    with pytest.raises(ValueError, match="unsupported"):
        convert_ltx_vae(sd)

    sd2 = {k: v for k, v in _synthetic_ltx_sd(rng).items()
           if not k.startswith("encoder.")}
    with pytest.raises(ValueError, match="no encoder"):
        convert_ltx_vae(sd2)


def test_pipeline_vae_fn_uses_converter(tmp_path):
    """ltx-video get_call_vae_fn loads + converts a real-layout VAE from
    single_file 'vae.'-prefixed keys (no vae_params_path escape hatch)."""
    from safetensors.numpy import save_file

    from diffusion_pipe_tpu.models import get_model_class

    rng = np.random.default_rng(2)
    sd = {f"vae.{k}": np.asarray(v)
          for k, v in _synthetic_ltx_sd(rng).items()}
    path = tmp_path / "ltx_vae_only.safetensors"
    save_file(sd, str(path))

    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "ltx-video", "dtype": "float32", "_tiny": True,
                  "vae_path": str(path)},
        "optimizer": {"type": "adamw", "lr": 1e-4},
    }
    pipe = get_model_class("ltx-video")(cfg)
    # bypass the tiny-mode branch: call the real-VAE path directly
    pipe.model_config = dict(pipe.model_config)
    pipe.model_config["_tiny"] = False
    fn = pipe.get_call_vae_fn()
    out = fn(rng.uniform(-1, 1, (1, 3, 5, 16, 16)).astype(np.float32))
    assert out["latents"].shape == (1, 16, 2, 2, 2)
    assert np.isfinite(out["latents"]).all()


def test_ltx2_pipeline_vae_fn(tmp_path):
    """ltx2's get_call_vae_fn converts the 'vae.'-prefixed keys of the
    combined checkpoint through the same topology discovery (reference
    ltx2.py:203-232)."""
    from safetensors.numpy import save_file

    from diffusion_pipe_tpu.models import get_model_class

    rng = np.random.default_rng(3)
    sd = {f"vae.{k}": np.ascontiguousarray(np.asarray(v))
          for k, v in _synthetic_ltx_sd(rng).items()}
    path = tmp_path / "ltx2_combined.safetensors"
    save_file(sd, str(path))

    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "ltx2", "dtype": "float32", "_tiny": True,
                  "diffusion_model": str(path)},
        "optimizer": {"type": "adamw", "lr": 1e-4},
    }
    pipe = get_model_class("ltx2")(cfg)
    pipe.model_config = dict(pipe.model_config)
    pipe.model_config["_tiny"] = False
    fn = pipe.get_call_vae_fn()
    out = fn(rng.uniform(-1, 1, (1, 3, 5, 16, 16)).astype(np.float32))
    assert out["latents"].shape == (1, 16, 2, 2, 2)
    assert np.isfinite(out["latents"]).all()
