"""Passthrough of frozen sidecar checkpoint tensors (KeyMap
passthrough_patterns).

The reference keeps tensors in the model checkpoint that training never
touches — the ltx2 audio branch (reference models/ltx2.py:408-420) and
the hv15 vision_in tower (reference models/hunyuan_video_15.py:216).
A full-model export must re-emit them verbatim or the exported file is
no longer a complete checkpoint for downstream tools.
"""

import flax.linen as nn
import jax
import numpy as np
import pytest
from safetensors.numpy import save_file

from diffusion_pipe_tpu.models import get_model_class
from diffusion_pipe_tpu.models.keymaps import keymap_from_flax

pytestmark = [pytest.mark.quick, pytest.mark.gate]

CASES = {
    "ltx2": {
        # spellings from the reference AV-transformer wrapper
        # (models/ltx2.py:400-420)
        "audio_patchify_proj.weight": (6, 4),
        "audio_adaln_single.linear.weight": (24, 4),
        "av_ca_a2v_gate_adaln_single.linear.weight": (4, 4),
        "transformer_blocks.0.audio_attn1.to_q.weight": (4, 4),
        "audio_embeddings_connector.learnable_registers": (1, 4, 4),
    },
    "hunyuan_video_15": {
        "vision_in.input_embedder.weight": (8, 6),
        "vision_in.input_embedder.bias": (8,),
    },
}


def _tiny_pipe(model_type, ckpt=None):
    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": model_type, "dtype": "float32", "_tiny": True},
        "optimizer": {"type": "adamw", "lr": 1e-4},
    }
    if ckpt is not None:
        cfg["model"]["ckpt_path"] = str(ckpt)
    return get_model_class(model_type)(cfg)


@pytest.mark.parametrize("model_type", sorted(CASES))
def test_passthrough_roundtrip(model_type, tmp_path):
    pipe = _tiny_pipe(model_type)
    params = nn.unbox(pipe.init_params(jax.random.PRNGKey(0)))
    sd = keymap_from_flax(params, pipe.keymap(), pipe._keymap_config())

    rng = np.random.default_rng(7)
    extra = {k: rng.standard_normal(shp).astype(np.float32)
             for k, shp in CASES[model_type].items()}
    # half the sidecar keys carry a wrapper prefix, as ComfyUI-combined
    # checkpoints do
    full = dict(sd)
    for j, (k, v) in enumerate(extra.items()):
        full["model.diffusion_model." + k if j % 2 else k] = v
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    save_file(full, str(ckpt / "model.safetensors"))

    pipe2 = _tiny_pipe(model_type, ckpt)
    loaded = pipe2.load_weights()
    assert jax.tree_util.tree_leaves(loaded), "load_weights returned empty"

    # sidecar captured, with prefixes stripped
    assert set(pipe2._passthrough_sd) == set(extra)
    for k, v in extra.items():
        np.testing.assert_array_equal(pipe2._passthrough_sd[k], v)

    # full-model export re-emits the sidecar verbatim
    out = tmp_path / "export"
    pipe2.save_model(out, loaded)
    from safetensors.numpy import load_file

    exported = load_file(str(out / "model.safetensors"))
    for k, v in extra.items():
        assert k in exported, f"sidecar key {k} dropped from export"
        np.testing.assert_array_equal(exported[k], v)
    # and the convertible keys are all still there
    for k in sd:
        assert k in exported


@pytest.mark.parametrize("model_type", sorted(CASES))
def test_adapter_export_unaffected(model_type, tmp_path):
    """LoRA export must not include sidecar tensors."""
    pipe = _tiny_pipe(model_type)
    params = nn.unbox(pipe.init_params(jax.random.PRNGKey(0)))
    sd = keymap_from_flax(params, pipe.keymap(), pipe._keymap_config())
    pipe._passthrough_sd = {
        k: np.zeros(shp, np.float32) for k, shp in CASES[model_type].items()
    }
    out = keymap_from_flax(params, pipe.keymap(), pipe._keymap_config())
    assert set(out) == set(sd)
