"""SDXL pipeline parallelism (models/sdxl_pp.py): the heterogeneous
UNet layer pipeline (lax.switch stage dispatch, shape-union payload,
static skip pyramid) reproduces single-device loss and LoRA gradients at
2 and 4 stages — reference behavior: models/sdxl.py:589-975 to_layers +
DeepSpeed PipelineModule partitions SDXL like any other model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pipe_tpu.mesh import make_mesh
from diffusion_pipe_tpu.models import get_model_class
from diffusion_pipe_tpu.models.sdxl_pp import make_sdxl_pipelined_loss_fn
from diffusion_pipe_tpu.parallel.sharding import shard_params
from diffusion_pipe_tpu.training.train_state import (
    lora_predicate,
    merge_params,
    partition_params,
)

M = 2  # microbatches


def _batch(b):
    k = jax.random.PRNGKey(1)
    ids = jax.random.randint(jax.random.PRNGKey(2), (b, 1, 77), 0, 256)
    return {
        "latents": jax.random.normal(k, (b, 4, 8, 8)),
        "input_ids": ids.astype(jnp.int32),
        "input_ids_2": ids.astype(jnp.int32),
    }


def _setup(stages, **mc_extra):
    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "sdxl", "dtype": "float32", "_tiny": True,
                  **mc_extra},
        "adapter": {"type": "lora", "rank": 4, "alpha": 4, "dropout": 0.0},
        "optimizer": {"type": "adamw", "lr": 1e-3},
        "pipeline_stages": stages,
    }
    pipeline = get_model_class("sdxl")(cfg)
    mesh = make_mesh(pipeline_stages=stages, tensor_parallel=1)
    params = pipeline.init_params(jax.random.PRNGKey(0))
    params = shard_params(mesh, params)
    trainable, frozen = partition_params(params, lora_predicate)
    return pipeline, mesh, trainable, frozen, _batch(M * 2)


def _reference_loss(pipeline, trainable, frozen, batch, rng):
    params = merge_params(trainable, frozen)
    keys = jax.random.split(rng, M)
    losses = []
    for i in range(M):
        mb = jax.tree.map(
            lambda x: x.reshape((M, x.shape[0] // M) + x.shape[1:])[i], batch
        )
        mi, tgt, msk = pipeline.prepare_inputs(keys[i], mb)
        out = pipeline.forward(params, mi)
        losses.append(pipeline.loss_fn(out, tgt, msk))
    return jnp.mean(jnp.stack(losses))


@pytest.mark.parametrize(
    "stages",
    [pytest.param(2, marks=pytest.mark.quick),
     pytest.param(4, marks=pytest.mark.slow)],
)
def test_sdxl_pp_loss_matches_single(stages):
    pipeline, mesh, trainable, frozen, batch = _setup(stages)
    rng = jax.random.PRNGKey(7)
    loss_fn = make_sdxl_pipelined_loss_fn(pipeline, mesh, M)
    with jax.set_mesh(mesh):
        loss_pp = float(jax.jit(loss_fn)(trainable, frozen, batch, rng))
    loss_ref = float(_reference_loss(pipeline, trainable, frozen, batch, rng))
    np.testing.assert_allclose(loss_pp, loss_ref, rtol=2e-5, atol=2e-5)


def test_sdxl_pp_grads_match_single():
    # 2 stages (the 4-stage switch-grad compile is minutes-long on CPU;
    # loss parity covers 4 stages above). This test also guards the
    # divergent-collective hazard: grads of per-stage lax.switch branches
    # must not issue per-branch psums (see sdxl_pp.py pcast comment) —
    # a regression deadlocks the backward across the stage ring.
    stages = 2
    pipeline, mesh, trainable, frozen, batch = _setup(stages)
    batch = jax.tree.map(lambda x: x[:M], batch)  # mbs=1: small compiles
    rng = jax.random.PRNGKey(7)
    loss_fn = make_sdxl_pipelined_loss_fn(pipeline, mesh, M)
    with jax.set_mesh(mesh):
        g_pp = jax.jit(jax.grad(loss_fn))(trainable, frozen, batch, rng)
    g_pp = jax.tree.map(np.asarray, g_pp)
    g_ref = jax.jit(jax.grad(
        lambda tr, fr, ba, rn: _reference_loss(pipeline, tr, fr, ba, rn)
    ))(trainable, frozen, batch, rng)
    flat_pp = jax.tree.leaves(g_pp)
    flat_ref = jax.tree.leaves(g_ref)
    assert len(flat_pp) == len(flat_ref)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat_pp)
    for a, b in zip(flat_pp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def test_sdxl_pp_manual_partition_split():
    """manual_partition_split boundaries apply over the flat 20-layer list
    (reference ManualPipelineModule semantics)."""
    pipeline, mesh, trainable, frozen, batch = _setup(
        2, partition_method="manual")
    # 20 layers; put 14 on stage 0, 6 on stage 1 (uneven)
    pipeline.config["partition_method"] = "manual"
    pipeline.config["partition_split"] = [14]
    rng = jax.random.PRNGKey(7)
    loss_fn = make_sdxl_pipelined_loss_fn(pipeline, mesh, M)
    with jax.set_mesh(mesh):
        loss_pp = float(jax.jit(loss_fn)(trainable, frozen, batch, rng))
    loss_ref = float(_reference_loss(pipeline, trainable, frozen, batch, rng))
    np.testing.assert_allclose(loss_pp, loss_ref, rtol=2e-5, atol=2e-5)
