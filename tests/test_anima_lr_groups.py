"""Anima LLMAdapter training + per-module LR groups."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffusion_pipe_tpu.models import get_model_class
from diffusion_pipe_tpu.training.optimizers import (
    get_optimizer,
    scale_updates_by_path,
)
from diffusion_pipe_tpu.training.train_state import predicate_from_config
from diffusion_pipe_tpu.training.trainer import init_train_state, make_train_step
from flax import traverse_util


def _anima_cfg():
    return {
        "save_every_n_epochs": 1,
        "model": {"type": "anima", "dtype": "float32", "_tiny": True,
                  "llm_adapter_lr": 1e-2},
        "adapter": {"type": "lora", "rank": 4, "alpha": 4, "dropout": 0.0},
        "optimizer": {"type": "adamw", "lr": 1e-3},
    }


def test_anima_trains_adapter_and_lora():
    cfg = _anima_cfg()
    pipe = get_model_class("anima")(cfg)
    assert pipe.anima
    opt = get_optimizer(cfg, lr_scales=pipe.lr_scale_map(1e-3))
    pred = predicate_from_config(cfg)
    state = init_train_state(pipe, opt, jax.random.PRNGKey(0), pred)

    # both lora factors and llm_adapter params are trainable
    flat = traverse_util.flatten_dict(state.trainable)
    has_lora = any(
        any(p.startswith("lora_") for p in k)
        for k, v in flat.items() if v is not None
    )
    has_adapter = any(
        any("llm_adapter" in p for p in k)
        for k, v in flat.items() if v is not None
    )
    assert has_lora and has_adapter

    step = jax.jit(make_train_step(pipe, opt))
    k = jax.random.PRNGKey(1)
    r = np.random.default_rng(0)
    batch = {
        "latents": jax.random.normal(k, (2, 16, 1, 8, 8)),
        "llm_hidden_states": jax.random.normal(k, (2, 8, 16)),
        "llm_mask": jnp.ones((2, 8), jnp.int32),
        "t5_input_ids": jnp.asarray(r.integers(0, 63, (2, 8)), jnp.int32),
        "t5_mask": jnp.ones((2, 8), jnp.int32),
    }
    before = jax.tree.map(lambda x: x, state.trainable)
    losses = []
    for _ in range(4):
        state, m = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0] * 1.2

    # llm_adapter params actually moved
    fa = traverse_util.flatten_dict(before)
    fb = traverse_util.flatten_dict(state.trainable)
    moved = [
        float(np.abs(np.asarray(fb[k]) - np.asarray(fa[k])).max())
        for k in fa
        if fa[k] is not None and any("llm_adapter" in p for p in k)
    ]
    assert moved and max(moved) > 0


def test_scale_updates_by_path():
    tx = scale_updates_by_path({"b": 10.0, "b/c": 0.5})
    updates = {"a": {"w": jnp.ones(2)}, "b": {"c": jnp.ones(2),
                                              "d": jnp.ones(2)}}
    out, _ = tx.update(updates, tx.init(updates))
    np.testing.assert_allclose(np.asarray(out["a"]["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(out["b"]["d"]), 10.0)
    # last matching substring wins
    np.testing.assert_allclose(np.asarray(out["b"]["c"]), 0.5)


def test_sdxl_lr_scale_map():
    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "sdxl", "dtype": "float32", "_tiny": True,
                  "unet_lr": 2e-4, "text_encoder_1_lr": 1e-5,
                  "text_encoder_2_lr": 2e-5},
        "optimizer": {"type": "adamw", "lr": 1e-4},
    }
    pipe = get_model_class("sdxl")(cfg)
    scales = pipe.lr_scale_map(1e-4)
    # keys are slash-anchored so 'text_encoder/' can't match text_encoder_2
    assert scales["unet/"] == 2.0
    assert abs(scales["text_encoder/"] - 0.1) < 1e-9
    assert abs(scales["text_encoder_2/"] - 0.2) < 1e-9


def test_sdxl_lr_scale_te1_only_leaves_te2_at_base_lr():
    """text_encoder_1_lr alone must NOT scale text_encoder_2 params
    (reference exact-prefix param groups, models/sdxl.py:602-628)."""
    import numpy as np

    from diffusion_pipe_tpu.training.optimizers import scale_updates_by_path

    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "sdxl", "dtype": "float32", "_tiny": True,
                  "text_encoder_1_lr": 1e-5},
        "optimizer": {"type": "adamw", "lr": 1e-4},
    }
    pipe = get_model_class("sdxl")(cfg)
    scales = pipe.lr_scale_map(1e-4)
    tx = scale_updates_by_path(scales)
    updates = {
        "text_encoder": {"layer": {"kernel": np.ones(2, np.float32)}},
        "text_encoder_2": {"layer": {"kernel": np.ones(2, np.float32)}},
    }
    out, _ = tx.update(updates, tx.init(updates))
    np.testing.assert_allclose(
        np.asarray(out["text_encoder"]["layer"]["kernel"]), 0.1
    )
    np.testing.assert_allclose(
        np.asarray(out["text_encoder_2"]["layer"]["kernel"]), 1.0
    )
