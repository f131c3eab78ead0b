"""Keymap converters: flax params <-> torch-layout state dicts round-trip
exactly and cover EVERY param (missing map entries fail the key-set
comparison), forward outputs are preserved through a convert cycle, and
LoRA export emits the reference formats (ComfyUI 'diffusion_model.*' /
diffusers 'transformer.*', reference models/base.py:609-613)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pipe_tpu.models import get_model_class
from diffusion_pipe_tpu.models.keymaps import (
    export_lora_keymap,
    import_lora_keymap,
    keymap_from_flax,
    keymap_to_flax,
)

FAMILIES = ["qwen_image", "sd3", "hunyuan-video", "chroma", "lumina_2",
            "hunyuan_image", "hunyuan_video_15", "ltx-video", "omnigen2",
            "hidream", "flux2", "z_image", "ernie_image", "ideogram4",
            "krea2", "ltx2"]


def _pipeline(model_type, adapter=False, **mc_extra):
    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": model_type, "dtype": "float32", "_tiny": True,
                  **mc_extra},
        "optimizer": {"type": "adamw", "lr": 1e-4},
    }
    if adapter:
        cfg["adapter"] = {"type": "lora", "rank": 4, "alpha": 4,
                          "dropout": 0.0}
    return get_model_class(model_type)(cfg)


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flat(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def _example_inputs(pipe, model_type):
    if model_type == "qwen_image":
        from diffusion_pipe_tpu.models.flux import latent_image_ids

        cfg = pipe.qi_config
        return dict(
            hidden_states=jax.random.normal(
                jax.random.PRNGKey(1), (1, 16, cfg.in_channels)),
            encoder_hidden_states=jax.random.normal(
                jax.random.PRNGKey(2), (1, 8, cfg.joint_attention_dim)),
            timestep=jnp.full((1,), 0.4),
            img_ids=latent_image_ids(4, 4),
            txt_mask=jnp.ones((1, 8), jnp.int32),
        )
    if model_type == "sd3":
        cfg = pipe.sd3_config
        return dict(
            hidden_states=jax.random.normal(
                jax.random.PRNGKey(1), (1, cfg.in_channels, 8, 8)),
            timestep=jnp.full((1,), 400.0),
            encoder_hidden_states=jax.random.normal(
                jax.random.PRNGKey(2), (1, 8, cfg.joint_attention_dim)),
            pooled_projections=jax.random.normal(
                jax.random.PRNGKey(3), (1, cfg.pooled_projection_dim)),
        )
    if model_type == "hunyuan-video":
        cfg = pipe.hv_config
        return dict(
            x=jax.random.normal(
                jax.random.PRNGKey(1), (1, cfg.in_channels, 1, 8, 8)),
            t=jnp.full((1,), 400.0),
            text_states=jax.random.normal(
                jax.random.PRNGKey(2), (1, 8, cfg.text_dim)),
            text_mask=jnp.ones((1, 8), jnp.int32),
            pooled=jax.random.normal(
                jax.random.PRNGKey(3), (1, cfg.pooled_projection_dim)),
            guidance=jnp.full((1,), 1000.0),
        )
    if model_type == "chroma":
        from diffusion_pipe_tpu.models.flux import latent_image_ids

        cfg = pipe.chroma_config
        return dict(
            hidden_states=jax.random.normal(
                jax.random.PRNGKey(1), (1, 16, cfg.in_channels)),
            encoder_hidden_states=jax.random.normal(
                jax.random.PRNGKey(2), (1, 8, cfg.joint_attention_dim)),
            timestep=jnp.full((1,), 0.4),
            img_ids=latent_image_ids(4, 4),
            txt_ids=jnp.zeros((8, 3)),
            guidance=jnp.zeros((1,)),
            txt_mask=jnp.ones((1, 8), jnp.int32),
        )
    if model_type == "hunyuan_image":
        cfg = pipe.hi_config
        return dict(
            x=jax.random.normal(
                jax.random.PRNGKey(1), (1, cfg.in_channels, 8, 8)),
            t=jnp.full((1,), 400.0),
            text_states=jax.random.normal(
                jax.random.PRNGKey(2), (1, 8, cfg.text_dim)),
            text_mask=jnp.ones((1, 8), jnp.int32),
            byt5_states=jax.random.normal(
                jax.random.PRNGKey(3), (1, 4, cfg.byt5_dim)),
            byt5_mask=jnp.ones((1, 4), jnp.int32),
        )
    if model_type == "hunyuan_video_15":
        cfg = pipe.hv15_config
        return dict(
            x=jax.random.normal(
                jax.random.PRNGKey(1), (1, cfg.in_channels, 1, 8, 8)),
            t=jnp.full((1,), 400.0),
            text_states=jax.random.normal(
                jax.random.PRNGKey(2), (1, 8, cfg.text_dim)),
            text_mask=jnp.ones((1, 8), jnp.int32),
            byt5_states=jax.random.normal(
                jax.random.PRNGKey(3), (1, 4, cfg.byt5_dim)),
            byt5_mask=jnp.ones((1, 4), jnp.int32),
        )
    if model_type == "ltx-video":
        cfg = pipe.ltx_config
        f, h, w = 1, 4, 4
        fi = jnp.repeat(jnp.arange(f), h * w).astype(jnp.float32)
        hi = jnp.tile(jnp.repeat(jnp.arange(h), w), f).astype(jnp.float32)
        wi = jnp.tile(jnp.arange(w), f * h).astype(jnp.float32)
        coords = jnp.stack([fi / 25.0, hi, wi])[None]
        return dict(
            x=jax.random.normal(
                jax.random.PRNGKey(1), (1, f * h * w, cfg.in_channels)),
            prompt_embeds=jax.random.normal(
                jax.random.PRNGKey(2), (1, 8, cfg.caption_dim)),
            prompt_mask=jnp.ones((1, 8), jnp.int32),
            t=jnp.full((1,), 0.4),
            fractional_coords=coords,
        )
    if model_type == "hidream":
        from diffusion_pipe_tpu.models.flux import latent_image_ids

        cfg = pipe.hd_config
        return dict(
            x_tokens=jax.random.normal(
                jax.random.PRNGKey(1), (1, 16, cfg.in_channels)),
            img_ids=latent_image_ids(4, 4),
            timesteps=jnp.full((1,), 400.0),
            pooled=jax.random.normal(
                jax.random.PRNGKey(2), (1, cfg.pooled_dim)),
            t5_embeds=jax.random.normal(
                jax.random.PRNGKey(3), (1, 8, cfg.t5_dim)),
            llama_embeds=jax.random.normal(
                jax.random.PRNGKey(4), (1, 2, 8, cfg.llama_dim)),
        )
    if model_type == "flux2":
        from diffusion_pipe_tpu.models.flux2 import _latent_ids

        cfg = pipe.f2_config
        return dict(
            hidden_states=jax.random.normal(
                jax.random.PRNGKey(1), (1, 16, cfg.in_channels)),
            encoder_hidden_states=jax.random.normal(
                jax.random.PRNGKey(2), (1, 8, cfg.text_dim)),
            timestep=jnp.full((1,), 0.4),
            img_ids=jnp.asarray(_latent_ids(4, 4)),
            guidance=jnp.ones((1,)),
        )
    if model_type == "ernie_image":
        cfg = pipe.ernie_config
        return dict(
            x=jax.random.normal(
                jax.random.PRNGKey(1), (1, cfg.in_channels, 8, 8)),
            t=jnp.full((1,), 400.0),
            text_embeds=jax.random.normal(
                jax.random.PRNGKey(2), (1, 8, cfg.text_dim)),
            text_mask=jnp.ones((1, 8), jnp.int32),
        )
    if model_type == "ideogram4":
        cfg = pipe.ideo_config
        return dict(
            x=jax.random.normal(
                jax.random.PRNGKey(1), (1, cfg.latent_dim, 4, 4)),
            t=jnp.full((1,), 0.4),
            text_embeds=jax.random.normal(
                jax.random.PRNGKey(2), (1, 8, cfg.text_dim)),
            text_mask=jnp.ones((1, 8), jnp.int32),
        )
    if model_type == "krea2":
        cfg = pipe.krea_config
        return dict(
            x=jax.random.normal(
                jax.random.PRNGKey(1), (1, cfg.in_channels, 8, 8)),
            t=jnp.full((1,), 0.4),
            context=jax.random.normal(
                jax.random.PRNGKey(2),
                (1, 8, cfg.text_layers * cfg.text_dim)),
            text_mask=jnp.ones((1, 8), jnp.int32),
        )
    if model_type == "ltx2":
        cfg = pipe.ltx2_config
        return dict(
            x=jax.random.normal(
                jax.random.PRNGKey(1), (1, 8, cfg.in_channels)),
            prompt_embeds=jax.random.normal(
                jax.random.PRNGKey(2), (1, 8, cfg.cross_attention_dim)),
            prompt_mask=jnp.ones((1, 8), jnp.int32),
            t=jnp.full((1,), 0.4),
            fractional_coords=jnp.zeros((1, 3, 8)),
        )
    if model_type in ("lumina_2", "omnigen2", "z_image"):
        cfg = pipe.lumina_config
        return dict(
            x=jax.random.normal(
                jax.random.PRNGKey(1), (1, cfg.in_channels, 8, 8)),
            t=jnp.full((1,), 0.4),
            cap_feats=jax.random.normal(
                jax.random.PRNGKey(2), (1, 8, cfg.cap_dim)),
            cap_mask=jnp.ones((1, 8), jnp.int32),
        )
    raise NotImplementedError(model_type)


@pytest.mark.parametrize("model_type", FAMILIES)
def test_keymap_roundtrip_complete(model_type):
    pipe = _pipeline(model_type)
    params = nn.unbox(pipe.init_params(jax.random.PRNGKey(0)))
    km = pipe.keymap()
    cfg = pipe._keymap_config()

    sd = keymap_from_flax(params, km, cfg)
    back = keymap_to_flax(sd, km, cfg)

    f0 = _flat(params["params"])
    f1 = _flat(back["params"])
    assert set(f0) == set(f1), (
        sorted(set(f0) ^ set(f1))[:10]
    )
    for k in f0:
        np.testing.assert_allclose(f0[k], f1[k], atol=0, err_msg=k)

    # forward equivalence through the convert cycle
    inputs = _example_inputs(pipe, model_type)
    out0 = pipe.forward(params, inputs)
    back_f32 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), back)
    out1 = pipe.forward(back_f32, inputs)
    np.testing.assert_allclose(
        np.asarray(out0), np.asarray(out1), atol=1e-6
    )


@pytest.mark.parametrize("model_type", FAMILIES)
def test_lora_export_and_reimport(model_type, tmp_path):
    pipe = _pipeline(model_type, adapter=True)
    params = nn.unbox(pipe.init_params(jax.random.PRNGKey(0)))
    km = pipe.keymap()
    cfg = pipe._keymap_config()

    sd = export_lora_keymap(params, km, cfg)
    assert sd, "no adapter tensors exported"
    prefix = km.lora_prefix
    for k in sd:
        assert k.startswith(prefix), k
        assert k.endswith((".lora_A.weight", ".lora_B.weight")), k

    # save through the pipeline surface and warm-start back
    pipe.save_adapter(tmp_path / "adapter", params)
    assert (tmp_path / "adapter" / "adapter_model.safetensors").exists()

    # zero the factors, re-import, check they match the originals
    zeroed = jax.tree.map(np.asarray, params)

    def zero_lora(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                if "lora_a" in v:
                    v["lora_a"] = np.zeros_like(v["lora_a"])
                    v["lora_b"] = np.ones_like(v["lora_b"])
                else:
                    zero_lora(v)

    zero_lora(zeroed["params"])
    restored = import_lora_keymap(tmp_path / "adapter", km, cfg, zeroed)
    orig = _flat(params["params"])
    rest = _flat(restored["params"])
    matched = 0
    for k in orig:
        if k.endswith("/lora_a") or k.endswith("/lora_b"):
            if np.allclose(rest[k], orig[k]) and orig[k].size:
                matched += 1
    assert matched > 0


def test_flux_save_model_roundtrip(tmp_path):
    """Full-FT flux export (diffusers layout via the keymap) reloads
    through flux's own load_weights bit-exactly."""
    pipe = _pipeline("flux")
    params = nn.unbox(pipe.init_params(jax.random.PRNGKey(0)))
    pipe.save_model(tmp_path / "m", params)

    cfg2 = {
        "save_every_n_epochs": 1,
        "model": {"type": "flux", "dtype": "float32", "_tiny": True,
                  "transformer_path": str(tmp_path / "m")},
        "optimizer": {"type": "adamw", "lr": 1e-4},
    }
    pipe2 = get_model_class("flux")(cfg2)
    back = pipe2.load_weights()
    f0 = _flat(params["params"])
    f1 = _flat(back["params"])
    assert set(f0) == set(f1), sorted(set(f0) ^ set(f1))[:10]
    for k in f0:
        np.testing.assert_allclose(f0[k], f1[k], atol=0, err_msg=k)


def test_sdxl_save_model_roundtrip(tmp_path):
    """Full-FT SDXL export in the original SD single-file format reloads
    through SDXL's own load_weights (UNet exact; TEs ride under
    conditioner.embedders.* keys)."""
    pipe = _pipeline("sdxl")
    params = nn.unbox(pipe.init_params(jax.random.PRNGKey(0)))
    pipe.save_model(tmp_path / "m", params)

    from safetensors.numpy import load_file

    sd = load_file(str(tmp_path / "m" / "model.safetensors"))
    assert any(k.startswith("model.diffusion_model.") for k in sd)
    assert any(k.startswith("conditioner.embedders.0.transformer.")
               for k in sd)
    assert any(k.startswith("conditioner.embedders.1.model.") for k in sd)
    assert any(".in_proj_weight" in k for k in sd)  # fused open-clip qkv

    cfg2 = {
        "save_every_n_epochs": 1,
        "model": {"type": "sdxl", "dtype": "float32", "_tiny": True,
                  "checkpoint_path": str(tmp_path / "m")},
        "optimizer": {"type": "adamw", "lr": 1e-4},
    }
    pipe2 = get_model_class("sdxl")(cfg2)
    back = pipe2.load_weights()
    f0 = _flat(params["params"]["unet"])
    f1 = _flat(back["params"]["unet"])
    assert set(f0) == set(f1), sorted(set(f0) ^ set(f1))[:10]
    for k in f0:
        np.testing.assert_allclose(f0[k], f1[k], atol=0, err_msg=k)


def test_dequantize_comfy_fp8():
    """ComfyUI fp8_scaled checkpoints: fp8 weights times per-tensor
    scale_weight -> bf16, marker + scale keys dropped, non-fp8 tensors
    untouched (reference trains from *_fp8_scaled.safetensors directly,
    models/base.py:528-581)."""
    import ml_dtypes

    from diffusion_pipe_tpu.models.weights import dequantize_comfy_fp8

    rng = np.random.default_rng(0)
    w32 = rng.standard_normal((4, 8)).astype(np.float32)
    w8 = (w32 / 2.0).astype(ml_dtypes.float8_e4m3fn)
    plain8 = rng.standard_normal((3,)).astype(ml_dtypes.float8_e4m3fn)
    sd = {
        "scaled_fp8": np.zeros((), ml_dtypes.float8_e4m3fn),
        "blk.weight": w8,
        "blk.scale_weight": np.asarray(2.0, np.float32),
        "blk.scale_input": np.asarray(1.0, np.float32),
        "plain.weight": plain8,
        "norm.weight": np.ones((8,), np.float32),
    }
    out = dequantize_comfy_fp8(sd)
    assert set(out) == {"blk.weight", "plain.weight", "norm.weight"}
    assert out["blk.weight"].dtype == np.dtype(ml_dtypes.bfloat16)
    np.testing.assert_allclose(
        out["blk.weight"].astype(np.float32),
        (w8.astype(np.float32) * 2.0).astype(ml_dtypes.bfloat16)
        .astype(np.float32))
    np.testing.assert_allclose(
        out["plain.weight"].astype(np.float32),
        plain8.astype(np.float32), atol=1e-2)
    assert out["norm.weight"].dtype == np.float32

    # no fp8 anywhere -> identity (same dict object semantics not required)
    sd2 = {"a.weight": np.ones((2,), np.float32)}
    assert dequantize_comfy_fp8(sd2) is sd2
