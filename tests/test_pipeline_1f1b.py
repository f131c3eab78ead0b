"""Interleaved fwd/bwd (1F1B-family) pipeline: loss+grads == plain math.

Validates parallel/pipeline.pipeline_train_1f1b on a synthetic single-phase
block stack over a 4-stage CPU mesh, against the unpipelined computation —
the TPU analogue of validating the reference's DeepSpeed 1F1B TrainSchedule
against single-GPU training.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from diffusion_pipe_tpu.parallel.pipeline import pipeline_train_1f1b

S = 4          # stages
K = 2          # blocks per stage
L = S * K      # total blocks
D = 8
B = 2          # microbatch size


def _make_mesh():
    devs = jax.devices()
    if len(devs) < S:
        pytest.skip("needs >= 4 devices")
    return Mesh(np.array(devs[:S]), ("stage",))


def _block(w, x):
    return jnp.tanh(x @ w)


def _reference(params, inputs, targets, m_total):
    def loss_fn(p):
        total = 0.0
        for m in range(m_total):
            x = inputs[m]
            for i in range(L):
                x = _block(p[i], x)
            total = total + jnp.mean((x - targets[m]) ** 2)
        return total / m_total

    return jax.value_and_grad(loss_fn)(params)


@pytest.mark.parametrize("m_total", [3, 5])
def test_1f1b_matches_reference(m_total):
    mesh = _make_mesh()
    params = jax.random.normal(jax.random.PRNGKey(0), (L, D, D)) * 0.3
    inputs = jax.random.normal(jax.random.PRNGKey(1), (m_total, B, D))
    targets = jax.random.normal(jax.random.PRNGKey(2), (m_total, B, D))

    def body(local_params, inputs_rep, targets_rep):
        def stage_fwd(p, x):
            def one(c, w):
                return _block(w, c), None

            out, _ = jax.lax.scan(one, x, p)
            return out

        def inject(t):
            return inputs_rep[t]

        def loss_head(x, t):
            return jnp.mean((x - targets_rep[t]) ** 2)

        return pipeline_train_1f1b(
            stage_fwd, inject, loss_head, m_total, S,
            jnp.zeros((B, D)), local_params,
        )

    shard_body = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("stage"), P(), P()),
        out_specs=(P(), P("stage")),
        axis_names={"stage"},
    )
    with jax.set_mesh(mesh):
        loss_pp, grads_pp = jax.jit(shard_body)(
            jax.device_put(params, NamedSharding(mesh, P("stage"))),
            inputs, targets,
        )

    loss_ref, grads_ref = _reference(params, inputs, targets, m_total)
    np.testing.assert_allclose(float(loss_pp), float(loss_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grads_pp), np.asarray(grads_ref), atol=1e-5
    )


@pytest.mark.parametrize("m_total", [3, 6])
def test_1f1b_multiphase_matches_reference(m_total):
    """Two phases (doubles-then-singles layout): loss+grads == plain math."""
    from diffusion_pipe_tpu.parallel.pipeline import (
        pipeline_train_1f1b_multiphase,
    )

    mesh = _make_mesh()
    params_a = jax.random.normal(jax.random.PRNGKey(0), (L, D, D)) * 0.3
    params_b = jax.random.normal(jax.random.PRNGKey(3), (L, D, D)) * 0.3
    inputs = jax.random.normal(jax.random.PRNGKey(1), (m_total, B, D))
    targets = jax.random.normal(jax.random.PRNGKey(2), (m_total, B, D))

    def ref_loss(pa, pb):
        total = 0.0
        for m in range(m_total):
            x = inputs[m]
            for i in range(L):
                x = _block(pa[i], x)
            for i in range(L):
                x = _block(pb[i], x)
            total = total + jnp.mean((x - targets[m]) ** 2)
        return total / m_total

    loss_ref, (ga_ref, gb_ref) = jax.value_and_grad(
        ref_loss, argnums=(0, 1))(params_a, params_b)

    def body(pa_local, pb_local, inputs_rep, targets_rep):
        def stage_fwd(p, x):
            def one(c, w):
                return _block(w, c), None

            out, _ = jax.lax.scan(one, x, p)
            return out

        loss, (ga, gb) = pipeline_train_1f1b_multiphase(
            [stage_fwd, stage_fwd], [pa_local, pb_local],
            lambda t: inputs_rep[t],
            lambda x, t: jnp.mean((x - targets_rep[t]) ** 2),
            m_total, S, jnp.zeros((B, D)),
        )
        return loss, ga, gb

    shard_body = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("stage"), P("stage"), P(), P()),
        out_specs=(P(), P("stage"), P("stage")),
        axis_names={"stage"},
    )
    with jax.set_mesh(mesh):
        loss_pp, ga_pp, gb_pp = jax.jit(shard_body)(
            jax.device_put(params_a, NamedSharding(mesh, P("stage"))),
            jax.device_put(params_b, NamedSharding(mesh, P("stage"))),
            inputs, targets,
        )

    np.testing.assert_allclose(float(loss_pp), float(loss_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ga_pp), np.asarray(ga_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb_pp), np.asarray(gb_ref),
                               atol=1e-5)
