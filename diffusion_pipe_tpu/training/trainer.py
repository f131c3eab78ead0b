"""Generic jitted train/eval step builders.

TPU-native replacement for the reference's DeepSpeed train loop core
(train.py:905-961 + PipelineEngine.train_batch, SURVEY.md section 3.3):
one XLA program per (bucket shape) doing noising -> forward -> masked loss ->
backward (trainable subtree only) -> clip -> optimizer update. Gradient
accumulation is a lax.scan over the microbatch axis (the reference's GAS =
pipeline micro-batches); the loss/grad average matches DeepSpeed's
mean-over-microbatches semantics.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from .train_state import TrainState, merge_params


def make_loss_fn(pipeline, timestep_quantile=None):
    def loss_fn(trainable, frozen, batch, rng):
        params = merge_params(trainable, frozen)
        model_inputs, target, mask = pipeline.prepare_inputs(
            rng, batch, timestep_quantile=timestep_quantile
        )
        output = pipeline.forward(params, model_inputs)
        return pipeline.loss_fn(output, target, mask)

    return loss_fn


def make_train_step(
    pipeline,
    optimizer: optax.GradientTransformation,
    gradient_clipping: float = 1.0,
    gradient_accumulation_steps: int = 1,
    donate: bool = True,
    host_stacks=(),
    skip_invalid_grads: bool = False,
    stochastic_rounding: bool = False,
    gradient_release: bool = False,
    loss_fn_override=None,
    grad_fn_override=None,
    opt_state_shardings=None,
):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch leaves are [GAS * mbs, ...]; with GAS > 1 they are reshaped to
    [GAS, mbs, ...] and grads averaged across the scan (reference:
    micro-batches flow the 1F1B schedule; numerics identical).

    skip_invalid_grads: a parameter whose gradient contains Inf/NaN keeps
    its old value this step (reference optimizers/generic_optim.py:386-388,
    506 skips the param and warns); its grad is zeroed before the global
    norm so one bad leaf cannot poison the clip scale of the others.

    stochastic_rounding: bfloat16 params are updated as
    round_stochastic(p_f32 + u) via the hardware-PRNG Pallas kernel
    (ops/quant.py), the TPU-native equivalent of the reference's
    copy_stochastic bit trick / Kahan compensation for bf16 master weights
    (optimizer_utils.py:142-219, generic_optim.py:487-497).
    """
    loss_fn = loss_fn_override or make_loss_fn(pipeline)
    # grad_fn_override returns (loss, grads) directly (e.g. the fused
    # 1F1B pipeline program, which cannot be expressed via jax.grad)
    grad_fn = grad_fn_override or jax.value_and_grad(loss_fn)
    # a pipelined loss consumes the whole [gas*mbs] batch and microbatches
    # internally, so the outer accumulation scan is disabled
    pipelined = loss_fn_override is not None or grad_fn_override is not None
    gas = 1 if pipelined else gradient_accumulation_steps

    def _constrain_opt(opt_state):
        # ZeRO-1 state sharding (optimizer.state_sharding): pin the new
        # optimizer state to its 'data'-sharded layout so GSPMD keeps the
        # update math reduce-scattered instead of replicating it
        # (parallel/sharding.py zero1_opt_state_sharding).
        if opt_state_shardings is None:
            return opt_state
        return jax.lax.with_sharding_constraint(opt_state, opt_state_shardings)

    def gradient_release_step(state: TrainState, batch: Dict[str, Any], rng):
        """One optimizer step PER MICRO-BATCH (reference train.py:694-748
        gradient release): no gradient accumulator buffer is ever
        materialized. Pair with factory-side beta scaling **(1/gas)."""

        def micro(carry, xs):
            trainable, opt_state, acc_loss, acc_norm = carry
            mb, key = xs
            loss_i, g_i = grad_fn(trainable, state.frozen, mb, key)
            if skip_invalid_grads:
                finite = jax.tree.map(lambda g: jnp.isfinite(g).all(), g_i)
                g_i = jax.tree.map(
                    lambda g, ok: jnp.where(ok, g, 0.0), g_i, finite
                )
            gn = optax.global_norm(g_i)
            if gradient_clipping and gradient_clipping > 0:
                s = jnp.minimum(1.0, gradient_clipping / (gn + 1e-6))
                g_i = jax.tree.map(lambda g: g * s, g_i)
            updates, opt_state = optimizer.update(g_i, opt_state, trainable)
            opt_state = _constrain_opt(opt_state)
            if skip_invalid_grads:
                updates = jax.tree.map(
                    lambda u, ok: jnp.where(ok, u, jnp.zeros([], u.dtype)),
                    updates, finite,
                )
            trainable = _apply_updates(
                trainable, updates, state.step, stochastic_rounding
            )
            return (trainable, opt_state, acc_loss + loss_i, acc_norm + gn), None

        mbs = jax.tree.map(
            lambda x: x.reshape((gas, x.shape[0] // gas) + x.shape[1:]), batch
        )
        keys = jax.random.split(rng, gas)
        (trainable, opt_state, loss, norm), _ = jax.lax.scan(
            micro,
            (state.trainable, state.opt_state, jnp.zeros([], jnp.float32),
             jnp.zeros([], jnp.float32)),
            (mbs, keys),
        )
        batch_size = jax.tree.leaves(batch)[0].shape[0]
        new_state = state.replace(
            step=state.step + 1,
            trainable=trainable,
            opt_state=opt_state,
            examples=state.examples + batch_size,
        )
        return new_state, {"loss": loss / gas, "grad_norm": norm / gas}

    if gradient_release and gas > 1:
        return gradient_release_step

    def train_step(state: TrainState, batch: Dict[str, Any], rng):
        if gas == 1:
            loss, grads = grad_fn(state.trainable, state.frozen, batch, rng)
        else:
            def micro(carry, xs):
                mb, key = xs
                loss_i, g_i = grad_fn(state.trainable, state.frozen, mb, key)
                acc_loss, acc_g = carry
                return (
                    acc_loss + loss_i,
                    jax.tree.map(jnp.add, acc_g, g_i),
                ), None

            mbs = jax.tree.map(
                lambda x: x.reshape((gas, x.shape[0] // gas) + x.shape[1:]), batch
            )
            keys = jax.random.split(rng, gas)
            zero_g = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.trainable
            )
            (loss, grads), _ = jax.lax.scan(
                micro, (jnp.zeros([], jnp.float32), zero_g), (mbs, keys)
            )
            loss = loss / gas
            grads = jax.tree.map(lambda g: g / gas, grads)

        # grads come back on DEVICE and the whole optimizer path stays on
        # device: host offload applies to the FROZEN partition only (the
        # reference's block swap likewise keeps optimizer-stepped LoRA
        # params on the accelerator, utils/offloading.py:54-61), so
        # trainable params and optimizer state never leave HBM.
        src_trainable, src_opt = state.trainable, state.opt_state
        if skip_invalid_grads:
            finite = jax.tree.map(lambda g: jnp.isfinite(g).all(), grads)
            grads = jax.tree.map(
                lambda g, ok: jnp.where(ok, g, 0.0), grads, finite
            )
        grad_norm = optax.global_norm(grads)
        if gradient_clipping and gradient_clipping > 0:
            scale = jnp.minimum(1.0, gradient_clipping / (grad_norm + 1e-6))
            # keep the grad dtype: the f32 norm scale would silently
            # promote bf16 grads (and through them the adamw moments) to
            # f32 — measured DOUBLING the full-FT optimizer state and
            # defeating donation aliasing (output state no longer matches
            # the donated input dtype), which pushed wan-1.3B full FT
            # past HBM at execution
            grads = jax.tree.map(
                lambda g: (g * scale).astype(g.dtype), grads)

        updates, opt_state = optimizer.update(grads, src_opt, src_trainable)
        opt_state = _constrain_opt(opt_state)
        if skip_invalid_grads:
            updates = jax.tree.map(
                lambda u, ok: jnp.where(ok, u, jnp.zeros([], u.dtype)),
                updates, finite,
            )
        trainable = _apply_updates(
            src_trainable, updates, state.step, stochastic_rounding
        )
        batch_size = jax.tree.leaves(batch)[0].shape[0]
        new_state = state.replace(
            step=state.step + 1,
            trainable=trainable,
            opt_state=opt_state,
            examples=state.examples + batch_size,
        )
        metrics = {"loss": loss, "grad_norm": grad_norm}
        if skip_invalid_grads:
            metrics["skipped_params"] = sum(
                (1 - ok.astype(jnp.int32)) for ok in jax.tree.leaves(finite)
            )
        return new_state, metrics

    return train_step


def _apply_updates(params, updates, step, stochastic_rounding: bool):
    """params + updates; with stochastic_rounding, bf16 leaves are updated
    in fp32 and stochastically rounded back (seeded per step + leaf)."""
    if not stochastic_rounding:
        return optax.apply_updates(params, updates)
    from ..ops.quant import stochastic_round

    flat_p, treedef = jax.tree.flatten(params)
    flat_u = treedef.flatten_up_to(updates)
    out = []
    for i, (p, u) in enumerate(zip(flat_p, flat_u)):
        if u is None:
            out.append(p)
        elif p.dtype == jnp.bfloat16:
            seed = step.astype(jnp.int32) * jnp.int32(1000003) + jnp.int32(i)
            out.append(
                stochastic_round(
                    p.astype(jnp.float32) + u.astype(jnp.float32), seed
                )
            )
        else:
            out.append(jnp.asarray(p + u.astype(p.dtype), p.dtype))
    return treedef.unflatten(out)


def make_eval_step(pipeline, loss_builder=None):
    """eval_step(state, batch, rng, quantile) -> loss. Deterministic t via
    fixed quantiles (reference train.py:176-242). loss_builder(quantile)
    overrides the loss (e.g. the pipelined flux program)."""

    def eval_step(state: TrainState, batch, rng, timestep_quantile):
        if loss_builder is not None:
            loss_fn = loss_builder(timestep_quantile)
        else:
            loss_fn = make_loss_fn(pipeline, timestep_quantile=timestep_quantile)
        return loss_fn(state.trainable, state.frozen, batch, rng)

    return eval_step


def jit_train_step(step_fn, state, donate=True):
    """jax.jit a train step with entry-output layouts pinned to each state
    leaf's CURRENT memory kind. Required for host-offloaded stacks
    (blocks_to_swap analogue): updated params/opt-state computed for
    pinned_host leaves are moved back to host inside the graph, and XLA
    demands the matching output layout annotation — plain jax.jit fails
    with "moved to host ... but the layout for this output is not set"."""
    out_sh = jax.tree.map(
        lambda l: l.sharding if isinstance(l, jax.Array) else None, state
    )
    # in_shardings too: without it, call 1 compiles for the UNCOMMITTED
    # input layouts, returns committed outputs (out_shardings), and call 2
    # becomes a cache miss that recompiles the whole program (~24 s for
    # the streamed wan-14B step — measured polluting the round-4 bench
    # rows). Declaring the state's shardings removes the
    # commitment/memory-kind miss (verified call-2 == 40 ms at tiny
    # scale); at 14B one layout-level miss can remain (XLA picks tiled
    # layouts for some outputs that differ from the entry default), so
    # benchmarks warm up two steps before timing.
    return jax.jit(
        step_fn,
        donate_argnums=(0,) if donate else (),
        in_shardings=(out_sh, None, None),
        out_shardings=(out_sh, None),
    )


def _host_init_params(pipeline, rng):
    """Materialize init params in HOST RAM (numpy), never on device: a
    model whose offloaded block stack exceeds HBM (wan 14B = 28 GB bf16)
    cannot run device-side random init at all. Shapes/dtypes come from
    eval_shape; values are N(0, 0.02) — the real training flow loads
    pretrained weights host-side anyway (load_weights -> numpy), so this
    path only serves scratch-init and benchmarks, where per-param init
    distributions don't matter."""
    import numpy as np

    shapes = jax.eval_shape(pipeline.init_params, rng)
    gen = np.random.default_rng(np.asarray(jax.random.key_data(rng))[-1])
    # Full-entropy host RNG is far too slow for a 14B stack on this class
    # of host (~12M elem/s); tile a 1M-element N(0, 0.02) base instead —
    # runs at memcpy speed, and value repetition is invisible to step
    # timing (TPU compute is not data-dependent).
    bases = {}

    def materialize(leaf):
        if leaf is None:
            return None
        dt = np.dtype(leaf.dtype)
        if dt not in bases:
            bases[dt] = (
                gen.standard_normal(1 << 20, dtype=np.float32) * 0.02
            ).astype(dt)
        n = 1
        for d in leaf.shape:
            n *= d
        return np.resize(bases[dt], n).reshape(leaf.shape)

    return jax.tree.map(materialize, shapes)


def init_train_state(
    pipeline, optimizer, rng, predicate, params=None, host_stacks=(),
    zero_sharding_mesh=None, host_init=False,
) -> TrainState:
    from .train_state import partition_params

    if params is None:
        params = (_host_init_params(pipeline, rng) if host_init
                  else pipeline.init_params(rng))
    trainable, frozen = partition_params(params, predicate)
    # Frozen kernels under int8_matmul carry a kernel_scale companion param:
    # quantize them ONCE here (storage becomes int8 + real scales) instead of
    # re-quantizing on every forward/remat/dgrad. No-op otherwise. Donation
    # lets XLA alias the (same-byte-width) fp8->int8 buffers, so a 12B-param
    # model quantizes without 2x weight memory; the caller's original params
    # tree must not be used afterwards.
    from flax import traverse_util

    from ..models.layers import prequantize_int8_tree

    has_scales = any(
        k[-1] == "kernel_scale" and v is not None
        for k, v in traverse_util.flatten_dict(frozen).items()
    )
    if has_scales:
        frozen = jax.jit(prequantize_int8_tree, donate_argnums=0)(frozen)
    if host_stacks:
        from ..parallel.offload import offload_param_stacks

        # only the FROZEN partition offloads (reference block-swap keeps
        # optimizer-stepped params resident); optax init runs eager
        # zeros_like-style ops which must see device-resident params
        opt_state = optimizer.init(trainable)
        frozen = offload_param_stacks(frozen, host_stacks)
    else:
        opt_state = optimizer.init(trainable)
    if zero_sharding_mesh is not None:
        # ZeRO-1: moment leaves live 'data'-sharded from the start
        from ..parallel.sharding import zero1_opt_state_sharding

        opt_state = jax.device_put(
            opt_state, zero1_opt_state_sharding(zero_sharding_mesh, opt_state)
        )
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        trainable=trainable,
        frozen=frozen,
        opt_state=opt_state,
        examples=jnp.zeros([], jnp.int64) if jax.config.jax_enable_x64
        else jnp.zeros([], jnp.int32),
    )
