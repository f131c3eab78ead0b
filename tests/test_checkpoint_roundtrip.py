"""Checkpoint round-trips for quantized optimizer states.

The reference resumes DeepSpeed checkpoints with torch-pickled optimizer
state (utils/saver.py:118-128); here Orbax stores the optax state pytree —
including the INT8 blockwise moment tensors of adamw8bit and automagic's
int8 per-element LR mask — and training must continue bit-identically to a
run that never checkpointed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pipe_tpu.training.optimizers import get_optimizer
from diffusion_pipe_tpu.training.saver import Saver
from diffusion_pipe_tpu.training.train_state import TrainState
from diffusion_pipe_tpu.training.trainer import make_train_step


class _StubPipeline:
    def prepare_inputs(self, rng, batch, timestep_quantile=None):
        return batch, jnp.zeros_like(batch["x"]), None

    def forward(self, params, batch):
        return batch["x"][:, None] * params["params"]["w"]

    def loss_fn(self, output, target, mask):
        return jnp.mean(output.astype(jnp.float32) ** 2)


def _fresh_state(optimizer):
    trainable = {
        "params": {"w": (jnp.arange(512, dtype=jnp.float32) / 256.0 - 1.0)}
    }
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        trainable=trainable,
        frozen={"params": {"w": None}},
        opt_state=optimizer.init(trainable),
        examples=jnp.zeros([], jnp.int32),
    )


@pytest.mark.parametrize("opt_type", ["adamw8bit", "automagic", "adamw"])
def test_quantized_opt_state_checkpoint_roundtrip(opt_type, tmp_path):
    config = {
        "save_every_n_epochs": 1,
        "optimizer": {"type": opt_type, "lr": 1e-2},
    }
    optimizer = get_optimizer(config)
    pipeline = _StubPipeline()
    step = jax.jit(make_train_step(pipeline, optimizer, donate=False))
    batch = {"x": jnp.linspace(-1.0, 1.0, 4)}

    # reference run: 4 steps, no checkpoint
    ref = _fresh_state(optimizer)
    for i in range(4):
        ref, _ = step(ref, batch, jax.random.PRNGKey(i))

    # checkpointed run: 2 steps, save, restore into a FRESH state, 2 more
    a = _fresh_state(optimizer)
    for i in range(2):
        a, _ = step(a, batch, jax.random.PRNGKey(i))
    saver = Saver(config, tmp_path / "run", pipeline)
    saver.save_checkpoint(a, 2)

    b = _fresh_state(optimizer)
    b, meta = saver.load_checkpoint(b)
    assert meta["step"] == 2
    # quantized leaves restored bit-exactly (int8 moments keep dtype)
    for la, lb in zip(jax.tree.leaves(a.opt_state),
                      jax.tree.leaves(b.opt_state)):
        assert la.dtype == lb.dtype
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    for i in range(2, 4):
        b, _ = step(b, batch, jax.random.PRNGKey(i))

    np.testing.assert_array_equal(
        np.asarray(ref.trainable["params"]["w"]),
        np.asarray(b.trainable["params"]["w"]),
    )
    assert int(b.step) == 4
