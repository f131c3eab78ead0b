"""activation_checkpointing variants: true / 'unsloth' (host-offloaded
residuals) / 'dots' produce the same loss as no checkpointing.

Reference surface: train.py:578-589 accepts `activation_checkpointing =
true | 'unsloth'`; the unsloth mode (utils/unsloth_utils.py:23-71) offloads
saved hidden states to CPU. Our mapping (models/layers.py remat_spec) turns
'unsloth' into a jax.checkpoint policy that saves matmul residuals to
pinned host memory instead of recomputing them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pipe_tpu.models import get_model_class
from diffusion_pipe_tpu.models.layers import remat_spec, remat_wrap
from diffusion_pipe_tpu.training.optimizers import get_optimizer
from diffusion_pipe_tpu.training.train_state import lora_predicate
from diffusion_pipe_tpu.training.trainer import init_train_state, make_train_step


def test_remat_spec_mapping():
    assert remat_spec({"activation_checkpointing": False}) == ""
    assert not remat_spec({})
    assert remat_spec({"activation_checkpointing": True}) == "full"
    assert (
        remat_spec({"activation_checkpointing": True, "remat_policy": "dots"})
        == "dots"
    )
    assert remat_spec({"activation_checkpointing": "unsloth"}) == "unsloth"
    with pytest.raises(ValueError):
        remat_wrap(object, "bogus")


def _sdxl_loss(ac):
    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "sdxl", "dtype": "float32", "_tiny": True},
        "adapter": {"type": "lora", "rank": 4, "alpha": 4, "dropout": 0.0},
        "optimizer": {"type": "adamw", "lr": 2e-3},
        "activation_checkpointing": ac,
    }
    pipeline = get_model_class("sdxl")(cfg)
    optimizer = get_optimizer(cfg)
    state = init_train_state(
        pipeline, optimizer, jax.random.PRNGKey(0), lora_predicate
    )
    step = jax.jit(make_train_step(pipeline, optimizer))
    batch = pipeline.host_prepare(
        {
            "latents": jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16))
            * 0.3,
            "caption": np.array(["a cat", "a dog"]),
        }
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = []
    for i in range(2):
        state, m = step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(m["loss"]))
    return losses


@pytest.mark.parametrize("ac", [True, "unsloth", "dots"])
def test_sdxl_remat_matches_no_remat(ac):
    base = _sdxl_loss(False)
    got = _sdxl_loss(ac)
    np.testing.assert_allclose(got, base, rtol=2e-5)


def test_flux_unsloth_remat_runs():
    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "flux", "dtype": "float32", "_tiny": True,
                  "guidance": 1.0},
        "adapter": {"type": "lora", "rank": 4, "alpha": 4, "dropout": 0.0},
        "optimizer": {"type": "adamw", "lr": 1e-3},
        "activation_checkpointing": "unsloth",
    }
    pipeline = get_model_class("flux")(cfg)
    optimizer = get_optimizer(cfg)
    state = init_train_state(
        pipeline, optimizer, jax.random.PRNGKey(0), lora_predicate
    )
    step = jax.jit(make_train_step(pipeline, optimizer))
    k = jax.random.PRNGKey(1)
    b = 2
    batch = {
        "latents": jax.random.normal(k, (b, 16, 8, 8)),
        "t5_embed": jax.random.normal(k, (b, 8, 64)),
        "clip_embed": jax.random.normal(k, (b, 32)),
    }
    state, m = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))


@pytest.mark.parametrize("ac", ["attn", "offload_attn"])
def test_wan_attn_remat_matches_full(ac):
    """The selective 'attn' policy (save only named flash o/lse so the
    backward replay skips the forward attention kernel) reproduces the
    full-remat loss and LoRA grads on tiny wan."""
    def run(ac_value):
        cfg = {
            "save_every_n_epochs": 1,
            "model": {"type": "wan", "dtype": "float32", "_tiny": True},
            "adapter": {"type": "lora", "rank": 4, "alpha": 4,
                        "dropout": 0.0},
            "optimizer": {"type": "adamw", "lr": 1e-3},
            "activation_checkpointing": ac_value,
        }
        pipe = get_model_class("wan")(cfg)
        params = pipe.init_params(jax.random.PRNGKey(0))
        batch = {
            "latents": jax.random.normal(
                jax.random.PRNGKey(1), (1, 16, 1, 8, 8)),
            "text_embeddings": jax.random.normal(
                jax.random.PRNGKey(2), (1, 16, 32)),
        }

        def loss_fn(p):
            mi, tgt, msk = pipe.prepare_inputs(jax.random.PRNGKey(3), batch)
            return pipe.loss_fn(pipe.forward(p, mi), tgt, msk)

        import flax.linen as nn

        p = nn.unbox(params)
        return jax.value_and_grad(loss_fn)(p)

    l_full, g_full = run(True)
    l_attn, g_attn = run(ac)
    np.testing.assert_allclose(float(l_attn), float(l_full), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_attn), jax.tree.leaves(g_full)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
