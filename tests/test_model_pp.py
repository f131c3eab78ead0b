"""Generic pipeline parallelism (parallel/model_pp.py): wan, hunyuan-video,
sd3, qwen_image, and the lumina_2 family (incl. z_image / omnigen2) GPipe
programs reproduce single-device loss and LoRA gradients at 2 and 4 stages —
the reference behavior where ANY model partitions via to_layers() +
PipelineModule (models/base.py:294-391, utils/pipeline.py:11-53).
BASELINE.json configs[4] is a 4-stage HunyuanVideo run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pipe_tpu.mesh import make_mesh
from diffusion_pipe_tpu.models import get_model_class
from diffusion_pipe_tpu.parallel.model_pp import make_generic_pipelined_loss_fn
from diffusion_pipe_tpu.parallel.sharding import shard_params
from diffusion_pipe_tpu.training.train_state import (
    lora_predicate,
    merge_params,
    partition_params,
)

M = 2  # microbatches


def _wan_batch(b):
    return {
        "latents": jax.random.normal(
            jax.random.PRNGKey(1), (b, 16, 1, 8, 8)),
        "text_embeddings": jax.random.normal(
            jax.random.PRNGKey(2), (b, 16, 32)),
        "seq_lens": jnp.full((b,), 7, jnp.int32),
    }


def _hv_batch(b):
    return {
        "latents": jax.random.normal(
            jax.random.PRNGKey(1), (b, 16, 1, 8, 8)),
        "text_states": jax.random.normal(jax.random.PRNGKey(2), (b, 8, 32)),
        "text_mask": jnp.concatenate(
            [jnp.ones((b, 5), jnp.int32), jnp.zeros((b, 3), jnp.int32)], 1),
        "clip_pooled": jax.random.normal(jax.random.PRNGKey(3), (b, 16)),
    }


def _sd3_batch(b):
    k = jax.random.PRNGKey(1)
    return {
        "latents": jax.random.normal(k, (b, 16, 8, 8)),
        "prompt_embed": jax.random.normal(k, (b, 8, 24)),
        "prompt_2_embed": jax.random.normal(k, (b, 8, 24)),
        "pooled_prompt_embed": jax.random.normal(k, (b, 16)),
        "pooled_prompt_2_embed": jax.random.normal(k, (b, 16)),
        "t5_prompt_embed": jax.random.normal(k, (b, 8, 64)),
    }


def _qwen_batch(b):
    k = jax.random.PRNGKey(1)
    return {
        "latents": jax.random.normal(k, (b, 16, 1, 8, 8)),
        "prompt_embeds": jax.random.normal(k, (b, 8, 48)),
        "prompt_embeds_mask": jnp.concatenate(
            [jnp.ones((b, 5), jnp.int32), jnp.zeros((b, 3), jnp.int32)], 1),
    }


def _lumina_batch(b):
    k = jax.random.PRNGKey(1)
    return {
        "latents": jax.random.normal(k, (b, 16, 8, 8)),
        "cap_feats": jax.random.normal(k, (b, 8, 32)),
        "cap_mask": jnp.concatenate(
            [jnp.ones((b, 5), jnp.int32), jnp.zeros((b, 3), jnp.int32)], 1),
    }


def _zimage_batch(b):
    lb = _lumina_batch(b)
    return {
        "latents": lb["latents"],
        "text_embeds_0": lb["cap_feats"],
        "attention_mask_0": lb["cap_mask"],
    }


def _omnigen2_batch(b):
    lb = _lumina_batch(b)
    return {
        "latents": lb["latents"],
        "prompt_embeds": lb["cap_feats"],
        "prompt_attention_mask": lb["cap_mask"],
    }


def _chroma_batch(b):
    k = jax.random.PRNGKey(1)
    return {
        "latents": jax.random.normal(k, (b, 16, 8, 8)),
        "t5_embed": jax.random.normal(k, (b, 8, 64)),
        "t5_mask": jnp.concatenate(
            [jnp.ones((b, 5), jnp.int32), jnp.zeros((b, 3), jnp.int32)], 1),
    }


def _cosmos_p2_batch(b):
    k = jax.random.PRNGKey(1)
    return {
        "latents": jax.random.normal(k, (b, 16, 1, 8, 8)),
        "t5_embed": jax.random.normal(k, (b, 8, 32)),
    }


def _cosmos_batch(b):
    k = jax.random.PRNGKey(1)
    return {
        "latents": jax.random.normal(k, (b, 16, 1, 8, 8)) * 0.5,
        "prompt_embeds": jax.random.normal(k, (b, 8, 32)),
    }


def _ltx_batch(b):
    k = jax.random.PRNGKey(1)
    return {
        "latents": jax.random.normal(k, (b, 16, 2, 4, 4)),
        "prompt_embeds": jax.random.normal(k, (b, 8, 32)),
        "prompt_attention_mask": jnp.concatenate(
            [jnp.ones((b, 5), jnp.int32), jnp.zeros((b, 3), jnp.int32)], 1),
    }


def _flux2_batch(b):
    k = jax.random.PRNGKey(1)
    return {
        "latents": jax.random.normal(k, (b, 4, 8, 8)),
        "text_embeds_0": jax.random.normal(k, (b, 8, 24)),
    }


def _hidream_batch(b):
    k = jax.random.PRNGKey(1)
    return {
        "latents": jax.random.normal(k, (b, 16, 8, 8)) * 0.5,
        "t5_embeds": jax.random.normal(k, (b, 8, 16)),
        "pooled": jax.random.normal(k, (b, 16)),
        "llama_embeds": jax.random.normal(k, (b, 2, 8, 24)),
    }


def _auraflow_batch(b):
    k = jax.random.PRNGKey(1)
    return {
        "latents": jax.random.normal(k, (b, 4, 8, 8)),
        "prompt_embeds": jax.random.normal(k, (b, 8, 24)),
    }


def _te0_batch(latent_shape, tdim=24):
    def fn(b):
        k = jax.random.PRNGKey(1)
        return {
            "latents": jax.random.normal(k, (b,) + latent_shape),
            "text_embeds_0": jax.random.normal(k, (b, 8, tdim)),
            "attention_mask_0": jnp.concatenate(
                [jnp.ones((b, 5), jnp.int32),
                 jnp.zeros((b, 3), jnp.int32)], 1),
        }
    return fn


def _byt5_batch(latent_shape):
    def fn(b):
        k = jax.random.PRNGKey(1)
        return {
            "latents": jax.random.normal(k, (b,) + latent_shape),
            "text_states": jax.random.normal(k, (b, 8, 32)),
            "text_mask": jnp.concatenate(
                [jnp.ones((b, 5), jnp.int32),
                 jnp.zeros((b, 3), jnp.int32)], 1),
            "byt5_states": jax.random.normal(k, (b, 4, 16)),
            "byt5_mask": jnp.ones((b, 4), jnp.int32),
        }
    return fn


PP_FAMILIES = [
    ("wan", _wan_batch),
    ("hunyuan-video", _hv_batch),
    ("sd3", _sd3_batch),
    ("qwen_image", _qwen_batch),
    ("lumina_2", _lumina_batch),
    ("chroma", _chroma_batch),
    ("cosmos_predict2", _cosmos_p2_batch),
    ("cosmos", _cosmos_batch),
    ("ltx-video", _ltx_batch),
    ("flux2", _flux2_batch),
    ("hidream", _hidream_batch),
    ("auraflow", _auraflow_batch),
    ("ernie_image", _te0_batch((4, 8, 8))),
    ("ideogram4", _te0_batch((16, 4, 4))),
    ("krea2", _te0_batch((4, 8, 8))),
    ("ltx2", _te0_batch((16, 2, 4, 4))),
    ("hunyuan_image", _byt5_batch((8, 8, 8))),
    ("hunyuan_video_15", _byt5_batch((4, 2, 8, 8))),
]


@pytest.mark.parametrize("model_type,batch_fn", [
    ("z_image", _zimage_batch), ("omnigen2", _omnigen2_batch),
])
def test_generic_pp_lumina_children(model_type, batch_fn):
    """z_image / omnigen2 inherit Lumina2Pipeline.make_pp_program; 2-stage
    loss parity confirms the shared program under their configs."""
    pipeline, mesh, trainable, frozen, batch = _setup(
        model_type, 2, batch_fn)
    rng = jax.random.PRNGKey(7)
    loss_fn = make_generic_pipelined_loss_fn(pipeline, mesh, M)
    with jax.set_mesh(mesh):
        loss_pp = float(jax.jit(loss_fn)(trainable, frozen, batch, rng))
    loss_ref = float(_reference_loss(pipeline, trainable, frozen, batch, rng))
    np.testing.assert_allclose(loss_pp, loss_ref, rtol=2e-5, atol=2e-5)


def _setup(model_type, stages, batch_fn):
    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": model_type, "dtype": "float32", "_tiny": True},
        "adapter": {"type": "lora", "rank": 4, "alpha": 4, "dropout": 0.0},
        "optimizer": {"type": "adamw", "lr": 1e-3},
        "pipeline_stages": stages,
    }
    pipeline = get_model_class(model_type)(cfg)
    mesh = make_mesh(pipeline_stages=stages, tensor_parallel=1)
    params = pipeline.init_params(jax.random.PRNGKey(0))
    params = shard_params(mesh, params)
    trainable, frozen = partition_params(params, lora_predicate)
    return pipeline, mesh, trainable, frozen, batch_fn(M * 2)


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


@pytest.mark.parametrize("model_type,batch_fn", PP_FAMILIES)
@pytest.mark.parametrize("stages", [2, 4])
def test_generic_pp_loss_matches_single(model_type, batch_fn, stages):
    pipeline, mesh, trainable, frozen, batch = _setup(
        model_type, stages, batch_fn)
    rng = jax.random.PRNGKey(7)
    loss_fn = make_generic_pipelined_loss_fn(pipeline, mesh, M)
    with jax.set_mesh(mesh):
        loss_pp = float(jax.jit(loss_fn)(trainable, frozen, batch, rng))
    loss_ref = float(_reference_loss(pipeline, trainable, frozen, batch, rng))
    np.testing.assert_allclose(loss_pp, loss_ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("model_type,batch_fn", PP_FAMILIES)
def test_generic_pp_grads_match_single(model_type, batch_fn):
    stages = 4
    pipeline, mesh, trainable, frozen, batch = _setup(
        model_type, stages, batch_fn)
    rng = jax.random.PRNGKey(7)
    loss_fn = make_generic_pipelined_loss_fn(pipeline, mesh, M)
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


def test_generic_pp_train_step_wiring():
    """The CLI wiring: make_train_step with the generic pipelined loss
    trains wan at 4 stages (and eval at a fixed quantile runs)."""
    from diffusion_pipe_tpu.training.optimizers import get_optimizer
    from diffusion_pipe_tpu.training.trainer import (
        init_train_state,
        make_eval_step,
        make_train_step,
    )

    pipeline, mesh, trainable, frozen, batch = _setup("wan", 4, _wan_batch)
    optimizer = get_optimizer(pipeline.config)
    pp_loss = make_generic_pipelined_loss_fn(pipeline, mesh,
                                             num_microbatches=M)
    state = init_train_state(
        pipeline, optimizer, jax.random.PRNGKey(0), lora_predicate,
        params=None,
    )
    state = state.replace(trainable=trainable, frozen=frozen,
                          opt_state=optimizer.init(trainable))
    step = jax.jit(make_train_step(
        pipeline, optimizer, gradient_accumulation_steps=M,
        loss_fn_override=pp_loss,
    ))
    eval_step = jax.jit(make_eval_step(
        pipeline,
        loss_builder=lambda q: make_generic_pipelined_loss_fn(
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


def test_generic_pp_manual_partition_split():
    """Uneven manual splits flow through stack_for_stages for the generic
    program too (wan: 2 blocks, split [1] -> 1 per stage over 2 stages)."""
    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "wan", "dtype": "float32", "_tiny": True},
        "adapter": {"type": "lora", "rank": 4, "alpha": 4, "dropout": 0.0},
        "optimizer": {"type": "adamw", "lr": 1e-3},
        "pipeline_stages": 2,
        "partition_method": "manual",
        "partition_split": [1],
    }
    pipeline = get_model_class("wan")(cfg)
    mesh = make_mesh(pipeline_stages=2, tensor_parallel=1)
    params = shard_params(mesh, pipeline.init_params(jax.random.PRNGKey(0)))
    trainable, frozen = partition_params(params, lora_predicate)
    batch = _wan_batch(M * 2)
    rng = jax.random.PRNGKey(7)
    loss_fn = make_generic_pipelined_loss_fn(pipeline, mesh, M)
    with jax.set_mesh(mesh):
        loss_pp = float(jax.jit(loss_fn)(trainable, frozen, batch, rng))
    loss_ref = float(_reference_loss(pipeline, trainable, frozen, batch, rng))
    np.testing.assert_allclose(loss_pp, loss_ref, rtol=2e-5, atol=2e-5)


def test_generic_1f1b_grads_match_single():
    """pipeline_schedule='1f1b' for single-phase PPProgram families: wan at
    4 stages reproduces single-device loss and LoRA grads (the reference's
    DeepSpeed 1F1B TrainSchedule runs every model)."""
    from diffusion_pipe_tpu.parallel.model_pp import (
        make_generic_pipelined_grad_fn_1f1b,
    )

    pipeline, mesh, trainable, frozen, batch = _setup("wan", 4, _wan_batch)
    rng = jax.random.PRNGKey(7)
    grad_fn = make_generic_pipelined_grad_fn_1f1b(pipeline, mesh, M)
    with jax.set_mesh(mesh):
        loss_pp, g_pp = jax.jit(grad_fn)(trainable, frozen, batch, rng)
    loss_ref = _reference_loss(pipeline, trainable, frozen, batch, rng)
    g_ref = jax.grad(_reference_loss, argnums=1)(
        pipeline, trainable, frozen, batch, rng
    )
    np.testing.assert_allclose(float(loss_pp), float(loss_ref),
                               rtol=2e-5, atol=2e-5)
    flat_pp = jax.tree.leaves(g_pp)
    flat_ref = jax.tree.leaves(g_ref)
    assert len(flat_pp) == len(flat_ref)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat_pp)
    for a, b in zip(flat_pp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def test_generic_1f1b_manual_split():
    """1F1B + manual_partition_split (uneven per-stage blocks)."""
    from diffusion_pipe_tpu.parallel.model_pp import (
        make_generic_pipelined_grad_fn_1f1b,
        make_generic_pipelined_loss_fn,
    )

    pipeline, mesh, trainable, frozen, batch = _setup("wan", 2, _wan_batch)
    pipeline.config["partition_method"] = "manual"
    pipeline.config["partition_split"] = [1]  # tiny wan: 2 blocks -> 1 + 1
    rng = jax.random.PRNGKey(7)
    grad_fn = make_generic_pipelined_grad_fn_1f1b(pipeline, mesh, M)
    with jax.set_mesh(mesh):
        loss_pp, g_pp = jax.jit(grad_fn)(trainable, frozen, batch, rng)
    g_ref = jax.grad(_reference_loss, argnums=1)(
        pipeline, trainable, frozen, batch, rng
    )
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def _setup_full_ft(model_type, stages, batch_fn):
    """Full fine-tune setup: no adapter, every param trainable."""
    from diffusion_pipe_tpu.training.train_state import full_ft_predicate

    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": model_type, "dtype": "float32", "_tiny": True},
        "optimizer": {"type": "adamw", "lr": 1e-3},
        "pipeline_stages": stages,
    }
    pipeline = get_model_class(model_type)(cfg)
    mesh = make_mesh(pipeline_stages=stages, tensor_parallel=1)
    params = pipeline.init_params(jax.random.PRNGKey(0))
    params = shard_params(mesh, params)
    trainable, frozen = partition_params(params, full_ft_predicate)
    return pipeline, mesh, trainable, frozen, batch_fn(M * 2)


@pytest.mark.parametrize("model_type,batch_fn,stages", [
    ("wan", _wan_batch, 2),
    ("wan", _wan_batch, 4),
    ("sd3", _sd3_batch, 2),
])
def test_generic_1f1b_full_ft_grads_match_single(model_type, batch_fn,
                                                 stages):
    """1F1B FULL fine-tuning (VERDICT r2 missing #3): embed/head (p_rest)
    cotangents now flow — loss-head vjp on the last stage plus an embed
    replay against stage 0's payload cotangent — so grads for EVERY
    parameter (blocks + embed + head) match unpipelined AD (the reference's
    1F1B TrainSchedule drives full FT, utils/patches.py:113-160)."""
    from diffusion_pipe_tpu.parallel.model_pp import (
        make_generic_pipelined_grad_fn_1f1b,
    )

    pipeline, mesh, trainable, frozen, batch = _setup_full_ft(
        model_type, stages, batch_fn)
    rng = jax.random.PRNGKey(7)
    grad_fn = make_generic_pipelined_grad_fn_1f1b(pipeline, mesh, M)
    with jax.set_mesh(mesh):
        loss_pp, g_pp = jax.jit(grad_fn)(trainable, frozen, batch, rng)
    loss_ref = _reference_loss(pipeline, trainable, frozen, batch, rng)
    g_ref = jax.grad(_reference_loss, argnums=1)(
        pipeline, trainable, frozen, batch, rng
    )
    np.testing.assert_allclose(float(loss_pp), float(loss_ref),
                               rtol=2e-5, atol=2e-5)

    from flax import traverse_util

    flat_pp = traverse_util.flatten_dict(g_pp["params"])
    flat_ref = traverse_util.flatten_dict(g_ref["params"])
    assert set(flat_pp) == set(flat_ref)
    # embed/head grads must be nonzero (full FT actually trains them)
    block_key = pipeline.make_pp_program().phases[0].param_key
    rest_nonzero = [
        float(jnp.abs(v).max()) for k, v in flat_pp.items()
        if v is not None and k[0] != block_key
    ]
    assert rest_nonzero and max(rest_nonzero) > 0
    for k in flat_pp:
        if flat_pp[k] is None:
            assert flat_ref[k] is None, k
            continue
        np.testing.assert_allclose(
            np.asarray(flat_pp[k]), np.asarray(flat_ref[k]),
            rtol=5e-4, atol=5e-5, err_msg=str(k),
        )


@pytest.mark.parametrize("model_type,batch_fn,stages", [
    ("hunyuan-video", _hv_batch, 2),
    ("flux2", _flux2_batch, 2),
    ("hidream", _hidream_batch, 2),
])
def test_generic_1f1b_multiphase_grads_match_single(model_type, batch_fn,
                                                    stages):
    """1F1B for MULTI-phase PPPrograms (double + single stream families):
    circular virtual stages with the PPPhase.pre hand-off transposed at
    the phase boundary reproduce single-device loss and LoRA grads."""
    from diffusion_pipe_tpu.parallel.model_pp import (
        make_generic_pipelined_grad_fn_1f1b,
    )

    pipeline, mesh, trainable, frozen, batch = _setup(
        model_type, stages, batch_fn)
    assert len(pipeline.make_pp_program().phases) > 1
    rng = jax.random.PRNGKey(7)
    grad_fn = make_generic_pipelined_grad_fn_1f1b(pipeline, mesh, M)
    with jax.set_mesh(mesh):
        loss_pp, g_pp = jax.jit(grad_fn)(trainable, frozen, batch, rng)
    loss_ref = _reference_loss(pipeline, trainable, frozen, batch, rng)
    g_ref = jax.grad(_reference_loss, argnums=1)(
        pipeline, trainable, frozen, batch, rng
    )
    np.testing.assert_allclose(float(loss_pp), float(loss_ref),
                               rtol=2e-5, atol=2e-5)
    flat_pp = jax.tree.leaves(g_pp)
    flat_ref = jax.tree.leaves(g_ref)
    assert len(flat_pp) == len(flat_ref)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat_pp)
    for a, b in zip(flat_pp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def test_generic_1f1b_multiphase_manual_split():
    """Multi-phase 1F1B composes with manual_partition_split: the
    reference's 1F1B TrainSchedule runs over ManualPipelineModule
    boundaries (utils/pipeline.py:11-53 + utils/patches.py:113-160).
    Tiny flux2 (2 double + 2 single = 4 combined blocks), split [1] ->
    stage0 holds 1 double; stage1 holds 1 double + both singles."""
    from diffusion_pipe_tpu.parallel.model_pp import (
        make_generic_pipelined_grad_fn_1f1b,
    )

    pipeline, mesh, trainable, frozen, batch = _setup(
        "flux2", 2, _flux2_batch)
    assert len(pipeline.make_pp_program().phases) > 1
    pipeline.config["partition_method"] = "manual"
    pipeline.config["partition_split"] = [1]
    rng = jax.random.PRNGKey(7)
    grad_fn = make_generic_pipelined_grad_fn_1f1b(pipeline, mesh, M)
    with jax.set_mesh(mesh):
        loss_pp, g_pp = jax.jit(grad_fn)(trainable, frozen, batch, rng)
    loss_ref = _reference_loss(pipeline, trainable, frozen, batch, rng)
    g_ref = jax.grad(_reference_loss, argnums=1)(
        pipeline, trainable, frozen, batch, rng
    )
    np.testing.assert_allclose(float(loss_pp), float(loss_ref),
                               rtol=2e-5, atol=2e-5)
    flat_pp = jax.tree.leaves(g_pp)
    flat_ref = jax.tree.leaves(g_ref)
    assert len(flat_pp) == len(flat_ref)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat_pp)
    for a, b in zip(flat_pp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def test_generic_1f1b_multiphase_full_ft_grads_match_single():
    """Multi-phase 1F1B full fine-tuning: embed/head cotangents flow
    through BOTH phases and the hand-off transpose; every parameter's
    grad matches unpipelined AD (hunyuan-video at 2 stages)."""
    from flax import traverse_util

    from diffusion_pipe_tpu.parallel.model_pp import (
        make_generic_pipelined_grad_fn_1f1b,
    )

    pipeline, mesh, trainable, frozen, batch = _setup_full_ft(
        "hunyuan-video", 2, _hv_batch)
    rng = jax.random.PRNGKey(7)
    grad_fn = make_generic_pipelined_grad_fn_1f1b(pipeline, mesh, M)
    with jax.set_mesh(mesh):
        loss_pp, g_pp = jax.jit(grad_fn)(trainable, frozen, batch, rng)
    loss_ref = _reference_loss(pipeline, trainable, frozen, batch, rng)
    g_ref = jax.grad(_reference_loss, argnums=1)(
        pipeline, trainable, frozen, batch, rng
    )
    np.testing.assert_allclose(float(loss_pp), float(loss_ref),
                               rtol=2e-5, atol=2e-5)
    flat_pp = traverse_util.flatten_dict(g_pp["params"])
    flat_ref = traverse_util.flatten_dict(g_ref["params"])
    assert set(flat_pp) == set(flat_ref)
    block_keys = {ph.param_key for ph in pipeline.make_pp_program().phases}
    rest_nonzero = [
        float(jnp.abs(v).max()) for k, v in flat_pp.items()
        if v is not None and k[0] not in block_keys
    ]
    assert rest_nonzero and max(rest_nonzero) > 0
    for k in flat_pp:
        if flat_pp[k] is None:
            assert flat_ref[k] is None, k
            continue
        np.testing.assert_allclose(
            np.asarray(flat_pp[k]), np.asarray(flat_ref[k]),
            rtol=5e-4, atol=5e-5, err_msg=str(k),
        )
