"""Anima (cosmos_predict2) T5-mask threading and adapter-loading fixes.

Reference behavior under test (/root/reference/models/cosmos_predict2.py):
- LLMAdapterLayer passes t5_attn_mask as target_attention_mask and zeroes
  padded adapter-output rows (lines 584-593), so padded T5 positions can
  never influence training numerics.
- load_diffusion_model strips the 'net.' prefix BEFORE checking for an
  embedded 'llm_adapter.out_proj.weight' (lines 264-284).
- llm_adapter_path may be a torch pickle, not just safetensors (the
  reference's load_state_dict accepts both).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pipe_tpu.models import get_model_class

REF = "/root/reference"

pytestmark = pytest.mark.quick


def _ref_path():
    if REF not in sys.path:
        sys.path.insert(0, REF)


def _anima_cfg(**model_extra):
    mc = {"type": "anima", "dtype": "float32", "_tiny": True}
    mc.update(model_extra)
    return {
        "save_every_n_epochs": 1,
        "model": mc,
        "optimizer": {"type": "adamw", "lr": 1e-3},
    }


def _anima_batch(seq=8, pad_from=5):
    r = np.random.default_rng(0)
    t5_mask = np.ones((2, seq), np.int32)
    t5_mask[:, pad_from:] = 0
    llm_mask = np.ones((2, seq), np.int32)
    llm_mask[1, 6:] = 0
    return {
        "latents": r.standard_normal((2, 16, 1, 8, 8)).astype(np.float32),
        "llm_hidden_states": r.standard_normal((2, seq, 16))
        .astype(np.float32),
        "llm_mask": llm_mask,
        "t5_input_ids": r.integers(0, 63, (2, seq)).astype(np.int32),
        "t5_mask": t5_mask,
    }


def test_padded_t5_positions_cannot_affect_output():
    """Mutating token ids at masked T5 positions (and Qwen states at masked
    source positions) must leave the forward output bit-identical — the
    reference masks self-attention over padding AND zeroes padded context
    rows before the DiT cross-attention."""
    pipe = get_model_class("anima")(_anima_cfg())
    params = pipe.init_params(jax.random.PRNGKey(0))

    batch = _anima_batch()
    mi, target, mask = pipe.prepare_inputs(
        jax.random.PRNGKey(1), {k: jnp.asarray(v) for k, v in batch.items()}
    )
    out0 = np.asarray(pipe.forward(params, mi))

    # scribble over every masked position
    b2 = {k: np.array(v) for k, v in batch.items()}
    b2["t5_input_ids"][:, 5:] = (b2["t5_input_ids"][:, 5:] + 17) % 63
    b2["llm_hidden_states"][1, 6:] = 99.0
    mi2, _, _ = pipe.prepare_inputs(
        jax.random.PRNGKey(1), {k: jnp.asarray(v) for k, v in b2.items()}
    )
    out1 = np.asarray(pipe.forward(params, mi2))
    np.testing.assert_array_equal(out0, out1)


def test_pp_context_matches_forward_masking():
    """The PP program's _context must apply the same mask semantics as the
    non-PP forward (padded rows zeroed)."""
    pipe = get_model_class("anima")(_anima_cfg())
    params = pipe.init_params(jax.random.PRNGKey(0))
    batch = _anima_batch()
    mi, _, _ = pipe.prepare_inputs(
        jax.random.PRNGKey(1), {k: jnp.asarray(v) for k, v in batch.items()}
    )
    prog = pipe.make_pp_program()
    ctx = prog._context(params["params"], mi)
    ctx = np.asarray(ctx)
    assert np.all(ctx[:, 5:] == 0), "padded context rows must be zeroed"
    assert np.any(ctx[:, :5] != 0)


def _ref_adapter_sd(cfg):
    """Reference-layout torch state dict for a tiny LLMAdapter."""
    import torch

    _ref_path()
    from models.llm_adapter import LLMAdapter as RefAdapter

    torch.manual_seed(5)
    ref = RefAdapter(source_dim=cfg.source_dim, target_dim=cfg.target_dim,
                     model_dim=cfg.model_dim, num_layers=cfg.num_layers,
                     num_heads=cfg.num_heads, self_attn=cfg.self_attn)
    return {k: v.detach().float() for k, v in ref.state_dict().items()}


def test_net_prefixed_embedded_adapter_detected(tmp_path):
    """An Anima checkpoint whose keys all carry the reference's 'net.'
    prefix must still trigger the embedded-llm_adapter branch (the check
    runs on the prefix-stripped dict, reference cosmos_predict2.py:264-284).
    Regression: previously the raw-dict check never fired for this layout
    and the trained adapter silently fell back to random init."""
    import torch
    from safetensors.numpy import save_file

    from diffusion_pipe_tpu.models.keymaps import keymap_from_flax
    from diffusion_pipe_tpu.models.llm_adapter import convert_llm_adapter

    pipe = get_model_class("anima")(_anima_cfg())
    # vocab must cover the reference adapter's T5 embed table row count?
    # No: tiny adapter keeps its config; we only compare loaded tensors.
    params = pipe.init_params(jax.random.PRNGKey(0))
    import flax.linen as nn

    params = nn.unbox(params)
    p = dict(params["params"])
    p.pop("llm_adapter")
    dit_sd = keymap_from_flax({"params": p}, pipe.keymap(),
                              pipe._keymap_config())

    asd_torch = _ref_adapter_sd(pipe.adapter_config)
    asd = {f"llm_adapter.{k}": v.numpy() for k, v in asd_torch.items()}

    full = {f"net.{k}": np.ascontiguousarray(np.asarray(v))
            for k, v in {**dit_sd, **asd}.items()}
    ckpt = tmp_path / "anima.safetensors"
    save_file(full, str(ckpt))

    cfg = _anima_cfg(transformer_path=str(ckpt))
    pipe2 = get_model_class("anima")(cfg)
    loaded = pipe2.load_weights()

    expected = convert_llm_adapter(
        {k: v.numpy() for k, v in asd_torch.items()})
    got = loaded["params"]["llm_adapter"]
    np.testing.assert_allclose(
        np.asarray(got["out_proj"]["kernel"]),
        np.asarray(expected["out_proj"]["kernel"]), atol=0)
    np.testing.assert_allclose(
        np.asarray(got["blocks_0_cross_attn"]["q_proj"]["kernel"]),
        np.asarray(expected["blocks_0_cross_attn"]["q_proj"]["kernel"]),
        atol=0)


def test_llm_adapter_path_accepts_torch_pt(tmp_path):
    """llm_adapter_path pointing at a torch .pt file loads (reference
    load_state_dict accepts torch pickles) instead of FileNotFoundError →
    silent random init."""
    import torch
    from safetensors.numpy import save_file

    from diffusion_pipe_tpu.models.keymaps import keymap_from_flax
    from diffusion_pipe_tpu.models.llm_adapter import convert_llm_adapter

    pipe = get_model_class("anima")(_anima_cfg())
    import flax.linen as nn

    params = nn.unbox(pipe.init_params(jax.random.PRNGKey(0)))
    p = dict(params["params"])
    p.pop("llm_adapter")
    dit_sd = keymap_from_flax({"params": p}, pipe.keymap(),
                              pipe._keymap_config())
    ckpt = tmp_path / "dit.safetensors"
    save_file({k: np.ascontiguousarray(np.asarray(v))
               for k, v in dit_sd.items()}, str(ckpt))

    asd_torch = _ref_adapter_sd(pipe.adapter_config)
    apath = tmp_path / "adapter.pt"
    torch.save(asd_torch, str(apath))

    cfg = _anima_cfg(transformer_path=str(ckpt),
                     llm_adapter_path=str(apath))
    pipe2 = get_model_class("anima")(cfg)
    loaded = pipe2.load_weights()
    expected = convert_llm_adapter(
        {k: v.numpy() for k, v in asd_torch.items()})
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["llm_adapter"]["out_proj"]["kernel"]),
        np.asarray(expected["out_proj"]["kernel"]), atol=1e-7)


def test_layer_norm_adapter_checkpoint_rejected():
    """layer_norm=True reference adapters (LayerNorm weight+bias) must be
    rejected loudly, not silently converted to RMSNorm."""
    from diffusion_pipe_tpu.models.llm_adapter import convert_llm_adapter

    sd = {
        "embed.weight": np.zeros((4, 8), np.float32),
        "norm.weight": np.ones((8,), np.float32),
        "blocks.0.norm_cross_attn.weight": np.ones((8,), np.float32),
        "blocks.0.norm_cross_attn.bias": np.zeros((8,), np.float32),
        "out_proj.weight": np.zeros((8, 8), np.float32),
    }
    with pytest.raises(ValueError, match="layer_norm"):
        convert_llm_adapter(sd)
