"""Pipeline parallelism correctness: GPipe shard_map == single-device math.

The pipelined flux loss (models/flux_pp.py) must reproduce the plain
forward/loss bit-for-bit-ish (f32 tolerances) and produce matching LoRA
gradients — the TPU analogue of validating the reference's patched DeepSpeed
schedule against a single-GPU run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pipe_tpu.mesh import make_mesh
from diffusion_pipe_tpu.models import get_model_class
from diffusion_pipe_tpu.models.flux_pp import make_pipelined_loss_fn
from diffusion_pipe_tpu.parallel.sharding import shard_params
from diffusion_pipe_tpu.training.train_state import (
    lora_predicate,
    merge_params,
    partition_params,
)

M = 2  # microbatches


def _setup(stages):
    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "flux", "dtype": "float32", "_tiny": True},
        "adapter": {"type": "lora", "rank": 4, "alpha": 4, "dropout": 0.0},
        "optimizer": {"type": "adamw", "lr": 1e-3},
        "pipeline_stages": stages,
    }
    pipeline = get_model_class("flux")(cfg)
    mesh = make_mesh(pipeline_stages=stages, tensor_parallel=1)
    params = pipeline.init_params(jax.random.PRNGKey(0))
    params = shard_params(mesh, params)
    trainable, frozen = partition_params(params, lora_predicate)
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (M * 2, 16, 8, 8)),
        "t5_embed": jax.random.normal(jax.random.PRNGKey(2), (M * 2, 16, 64)),
        "clip_embed": jax.random.normal(jax.random.PRNGKey(3), (M * 2, 32)),
    }
    return pipeline, mesh, trainable, frozen, batch


def _reference_loss(pipeline, trainable, frozen, batch, rng):
    """Plain per-microbatch loop matching flux_pp's key schedule."""
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


@pytest.mark.parametrize("stages", [2, 4])
def test_pipelined_loss_matches_single(stages):
    pipeline, mesh, trainable, frozen, batch = _setup(stages)
    rng = jax.random.PRNGKey(7)
    loss_fn = make_pipelined_loss_fn(pipeline, mesh, M)
    with jax.set_mesh(mesh):
        loss_pp = float(jax.jit(loss_fn)(trainable, frozen, batch, rng))
    loss_ref = float(_reference_loss(pipeline, trainable, frozen, batch, rng))
    np.testing.assert_allclose(loss_pp, loss_ref, rtol=2e-5, atol=2e-5)


def test_pipelined_grads_match_single():
    stages = 2
    pipeline, mesh, trainable, frozen, batch = _setup(stages)
    rng = jax.random.PRNGKey(7)
    loss_fn = make_pipelined_loss_fn(pipeline, mesh, M)
    with jax.set_mesh(mesh):
        g_pp = jax.jit(jax.grad(loss_fn))(trainable, frozen, batch, rng)
    g_ref = jax.grad(_reference_loss, argnums=1)(
        pipeline, trainable, frozen, batch, rng
    )
    flat_pp = jax.tree.leaves(g_pp)
    flat_ref = jax.tree.leaves(g_ref)
    assert len(flat_pp) == len(flat_ref)
    for a, b in zip(flat_pp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def test_dryrun_multichip_entrypoint():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_pp_train_and_eval_step_wiring():
    """The CLI wiring: make_train_step/make_eval_step with the pipelined
    loss override runs under the mesh and trains."""
    from diffusion_pipe_tpu.training.optimizers import get_optimizer
    from diffusion_pipe_tpu.training.trainer import (
        init_train_state,
        make_eval_step,
        make_train_step,
    )

    stages = 2
    pipeline, mesh, trainable, frozen, batch = _setup(stages)
    optimizer = get_optimizer(pipeline.config)
    pp_loss = make_pipelined_loss_fn(pipeline, mesh, num_microbatches=M)
    state = init_train_state(
        pipeline, optimizer, jax.random.PRNGKey(0),
        lora_predicate, params=None,
    )
    state = state.replace(trainable=trainable, frozen=frozen,
                          opt_state=optimizer.init(trainable))
    step = jax.jit(make_train_step(
        pipeline, optimizer, gradient_accumulation_steps=M,
        loss_fn_override=pp_loss,
    ))
    eval_step = jax.jit(make_eval_step(
        pipeline,
        loss_builder=lambda q: make_pipelined_loss_fn(
            pipeline, mesh, num_microbatches=M, timestep_quantile=q),
    ), static_argnums=(3,))
    with jax.set_mesh(mesh):
        losses = []
        for i in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(5 + i))
            losses.append(float(m["loss"]))
        ev = float(eval_step(state, batch, jax.random.PRNGKey(9), 0.5))
    assert np.isfinite(losses).all() and np.isfinite(ev)
    assert losses[-1] < losses[0] * 1.2, losses


def test_1f1b_flux_matches_gpipe_grads():
    """The interleaved 1F1B flux program reproduces the AD-GPipe loss and
    LoRA gradients."""
    from diffusion_pipe_tpu.models.flux_pp import make_pipelined_grad_fn_1f1b

    stages = 2
    pipeline, mesh, trainable, frozen, batch = _setup(stages)
    rng = jax.random.PRNGKey(11)

    loss_fn = make_pipelined_loss_fn(pipeline, mesh, M)
    grad_fn_1f1b = make_pipelined_grad_fn_1f1b(pipeline, mesh, M)
    with jax.set_mesh(mesh):
        loss_g, grads_g = jax.jit(jax.value_and_grad(loss_fn))(
            trainable, frozen, batch, rng)
        loss_i, grads_i = jax.jit(grad_fn_1f1b)(trainable, frozen, batch, rng)

    np.testing.assert_allclose(float(loss_i), float(loss_g), rtol=2e-5)
    from flax import traverse_util

    fg = traverse_util.flatten_dict(grads_g)
    fi = traverse_util.flatten_dict(grads_i)
    assert set(k for k, v in fg.items() if v is not None) == \
        set(k for k, v in fi.items() if v is not None)
    for k, v in fg.items():
        if v is None:
            continue
        np.testing.assert_allclose(
            np.asarray(fi[k]), np.asarray(v), atol=2e-5,
            err_msg=str(k),
        )


def test_1f1b_flux_full_ft_matches_gpipe_grads():
    """Flux's dedicated 1F1B program under FULL fine-tuning: embed/head
    (p_rest) cotangents flow via the multiphase rest_params support, so
    grads for every parameter match the AD-GPipe path."""
    from flax import traverse_util

    from diffusion_pipe_tpu.models.flux_pp import make_pipelined_grad_fn_1f1b
    from diffusion_pipe_tpu.training.train_state import full_ft_predicate

    stages = 2
    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "flux", "dtype": "float32", "_tiny": True},
        "optimizer": {"type": "adamw", "lr": 1e-3},
        "pipeline_stages": stages,
    }
    pipeline = get_model_class("flux")(cfg)
    mesh = make_mesh(pipeline_stages=stages, tensor_parallel=1)
    params = pipeline.init_params(jax.random.PRNGKey(0))
    params = shard_params(mesh, params)
    trainable, frozen = partition_params(params, full_ft_predicate)
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (M * 2, 16, 8, 8)),
        "t5_embed": jax.random.normal(jax.random.PRNGKey(2), (M * 2, 16, 64)),
        "clip_embed": jax.random.normal(jax.random.PRNGKey(3), (M * 2, 32)),
    }
    rng = jax.random.PRNGKey(11)

    loss_fn = make_pipelined_loss_fn(pipeline, mesh, M)
    grad_fn_1f1b = make_pipelined_grad_fn_1f1b(pipeline, mesh, M)
    with jax.set_mesh(mesh):
        loss_g, grads_g = jax.jit(jax.value_and_grad(loss_fn))(
            trainable, frozen, batch, rng)
        loss_i, grads_i = jax.jit(grad_fn_1f1b)(trainable, frozen, batch, rng)

    np.testing.assert_allclose(float(loss_i), float(loss_g), rtol=2e-5)
    fg = traverse_util.flatten_dict(grads_g["params"])
    fi = traverse_util.flatten_dict(grads_i["params"])
    assert set(fg) == set(fi)
    rest_nonzero = [
        float(jnp.abs(v).max()) for k, v in fi.items()
        if v is not None and k[0] not in ("double_blocks", "single_blocks")
    ]
    assert rest_nonzero and max(rest_nonzero) > 0
    for k, v in fg.items():
        if v is None:
            assert fi[k] is None, k
            continue
        np.testing.assert_allclose(
            np.asarray(fi[k]), np.asarray(v), atol=3e-5,
            err_msg=str(k),
        )


def test_1f1b_train_step_wiring():
    """make_train_step with the 1F1B grad override trains."""
    from diffusion_pipe_tpu.models.flux_pp import make_pipelined_grad_fn_1f1b
    from diffusion_pipe_tpu.training.optimizers import get_optimizer
    from diffusion_pipe_tpu.training.trainer import (
        init_train_state,
        make_train_step,
    )

    stages = 2
    pipeline, mesh, trainable, frozen, batch = _setup(stages)
    optimizer = get_optimizer(pipeline.config)
    pp_grad = make_pipelined_grad_fn_1f1b(pipeline, mesh, num_microbatches=M)
    state = init_train_state(
        pipeline, optimizer, jax.random.PRNGKey(0), lora_predicate,
        params=None,
    )
    state = state.replace(trainable=trainable, frozen=frozen,
                          opt_state=optimizer.init(trainable))
    step = jax.jit(make_train_step(
        pipeline, optimizer, gradient_accumulation_steps=M,
        grad_fn_override=pp_grad,
    ))
    with jax.set_mesh(mesh):
        losses = []
        for i in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(5 + i))
            losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.2, losses


def _setup_manual(stages, split):
    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "flux", "dtype": "float32", "_tiny": True},
        "adapter": {"type": "lora", "rank": 4, "alpha": 4, "dropout": 0.0},
        "optimizer": {"type": "adamw", "lr": 1e-3},
        "pipeline_stages": stages,
        "partition_method": "manual",
        "manual_partition_split": split,
    }
    pipeline = get_model_class("flux")(cfg)
    mesh = make_mesh(pipeline_stages=stages, tensor_parallel=1)
    params = pipeline.init_params(jax.random.PRNGKey(0))
    params = shard_params(mesh, params)
    trainable, frozen = partition_params(params, lora_predicate)
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (M * 2, 16, 8, 8)),
        "t5_embed": jax.random.normal(jax.random.PRNGKey(2), (M * 2, 16, 64)),
        "clip_embed": jax.random.normal(jax.random.PRNGKey(3), (M * 2, 32)),
    }
    return pipeline, mesh, trainable, frozen, batch


@pytest.mark.parametrize("split", [[1], [3]])
def test_manual_partition_split_loss_and_grads(split):
    """Uneven manual stage splits (reference ManualPipelineModule
    manual_partition_split, utils/pipeline.py:11-53) reproduce the
    single-device loss and LoRA grads. Tiny flux: 2 doubles + 2 singles;
    split [1] puts 1 double on each stage and both singles on stage 1;
    split [3] piles 2 doubles + 1 single on stage 0."""
    pipeline, mesh, trainable, frozen, batch = _setup_manual(2, split)
    rng = jax.random.PRNGKey(7)
    loss_fn = make_pipelined_loss_fn(pipeline, mesh, M)
    with jax.set_mesh(mesh):
        loss_pp, g_pp = jax.jit(jax.value_and_grad(loss_fn))(
            trainable, frozen, batch, rng)
    loss_ref = float(_reference_loss(pipeline, trainable, frozen, batch, rng))
    np.testing.assert_allclose(float(loss_pp), loss_ref, rtol=2e-5, atol=2e-5)
    g_ref = jax.grad(_reference_loss, argnums=1)(
        pipeline, trainable, frozen, batch, rng
    )
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def test_manual_partition_split_1f1b_matches():
    """The fused 1F1B schedule under an uneven manual split returns grads in
    BLOCK order (slot->block unpadding) matching AD-GPipe."""
    from diffusion_pipe_tpu.models.flux_pp import make_pipelined_grad_fn_1f1b

    pipeline, mesh, trainable, frozen, batch = _setup_manual(2, [1])
    rng = jax.random.PRNGKey(11)
    loss_fn = make_pipelined_loss_fn(pipeline, mesh, M)
    grad_fn_1f1b = make_pipelined_grad_fn_1f1b(pipeline, mesh, M)
    with jax.set_mesh(mesh):
        loss_g, grads_g = jax.jit(jax.value_and_grad(loss_fn))(
            trainable, frozen, batch, rng)
        loss_i, grads_i = jax.jit(grad_fn_1f1b)(trainable, frozen, batch, rng)
    np.testing.assert_allclose(float(loss_i), float(loss_g), rtol=2e-5)
    from flax import traverse_util

    fg = traverse_util.flatten_dict(grads_g)
    fi = traverse_util.flatten_dict(grads_i)
    for k, v in fg.items():
        if v is None:
            continue
        np.testing.assert_allclose(
            np.asarray(fi[k]), np.asarray(v), atol=2e-5, err_msg=str(k)
        )


def test_counts_from_manual_split_validation():
    from diffusion_pipe_tpu.parallel.pipeline import counts_from_manual_split

    assert counts_from_manual_split(10, 2, [4]) == [4, 6]
    assert counts_from_manual_split(10, 3, [2, 7]) == [2, 5, 3]
    # clipping (per-phase offsets can push boundaries outside the phase)
    assert counts_from_manual_split(10, 2, [-3]) == [0, 10]
    assert counts_from_manual_split(10, 2, [15]) == [10, 0]
    with pytest.raises(ValueError):
        counts_from_manual_split(10, 3, [7, 2])
    with pytest.raises(ValueError):
        counts_from_manual_split(10, 2, [1, 2])
