"""Generic pipeline-parallel (GPipe) training program for any model family.

The reference partitions ANY model across pipeline stages via to_layers() +
DeepSpeed's PipelineModule (models/base.py:294-391, utils/pipeline.py:11-53).
The TPU-native analogue here: a model pipeline exposes `make_pp_program()`
returning a PPProgram — its scan-stacked block phases plus embed / head-loss
in raw-param form — and this module turns that into a shard_map GPipe loss
over the 'stage' mesh axis (parallel/pipeline.py primitives: ppermute ring,
padded block slots, identity masking). flux keeps its specialized program
(models/flux_pp.py, which adds the fused 1F1B schedule); every other family
uses this builder.

'data' and 'tensor' stay GSPMD-auto (shard_map manualizes only 'stage'), so
DP and TP compose for free.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..training.train_state import merge_params
from .pipeline import (
    STAGE_AXIS,
    apply_local_blocks,
    counts_from_manual_split,
    gpipe_phase,
    last_stage_scalar,
    pad_stack_for_manual_split,
    pad_stack_for_stages,
    ring_shift,
)


@dataclasses.dataclass
class PPPhase:
    """One homogeneous run of scan-stacked blocks.

    apply_block(block_params_i, payload, ctx) -> payload — one block; the
    payload carries everything microbatch-dependent (hidden states + per-
    microbatch conditioning); ctx carries microbatch-independent tables
    (rope frequencies, grid dims).
    pre(payload, ctx) -> payload — transform entering this phase (e.g.
    concat streams), applied at inject time on stage 0.
    """

    param_key: str
    num_blocks: int
    apply_block: Callable
    pre: Optional[Callable] = None
    # when True, apply_block is called as (block_params_i, payload, ctx,
    # block_index) with the block's PHASE-LOCAL position (0-based within
    # this phase's stack) — for per-block-position conditioning (chroma
    # modulation slices, hidream llama injections)
    needs_index: bool = False


class PPProgram:
    """Model-declared pipeline program (see PPPhase).

    Subclasses / instances provide:
      phases: List[PPPhase]
      embed(p_rest, mi, ctx) -> payload           (stage 0, per microbatch)
      head_loss(p_rest, payload, target, mask, ctx) -> scalar (last stage)
      make_ctx(p_rest, mi0) -> Any                (inside shard_map, from a
        template microbatch; rope tables etc.)
    """

    phases: List[PPPhase] = []

    def make_ctx(self, p_rest, mi0):
        return None

    def embed(self, p_rest, mi, ctx):
        raise NotImplementedError

    def head_loss(self, p_rest, payload, target, mask, ctx):
        raise NotImplementedError


def stack_for_stages(config: Dict[str, Any], stacked, num_layers: int,
                     num_stages: int, phase_offset: int):
    """Split a [L, ...] stacked block tree across stages: equal chunks by
    default; `partition_method='manual'` + `partition_split` applies the
    reference ManualPipelineModule boundaries over the COMBINED block
    sequence (offset per phase; out-of-phase boundaries clip to empty
    chunks that run as identity slots).

    Returns (padded [S*k, ...], enabled [S*k], slot_to_block [S*k] int32 —
    the global block position each slot holds; 0 for disabled slots).
    """
    split = config.get("partition_split",
                       config.get("manual_partition_split"))
    if (str(config.get("partition_method", "")).lower() == "manual"
            and split is not None):
        counts = counts_from_manual_split(
            num_layers, num_stages, [int(b) - phase_offset for b in split]
        )
        padded, enabled, k = pad_stack_for_manual_split(
            stacked, num_layers, num_stages, counts
        )
        s2b = []
        start = 0
        for c in counts:
            s2b.extend(range(start, start + c))
            s2b.extend([0] * (k - c))  # disabled slots
            start += c
        return padded, enabled, jnp.asarray(s2b, jnp.int32)
    padded, enabled, k = pad_stack_for_stages(stacked, num_layers, num_stages)
    return padded, enabled, jnp.arange(k * num_stages, dtype=jnp.int32)


def make_generic_pipelined_loss_fn(pipeline, mesh, num_microbatches: int,
                                   timestep_quantile=None):
    """loss_fn(trainable, frozen, batch, rng) running the model's PPProgram
    as a GPipe pipeline over the 'stage' mesh axis. batch leaves are
    [M * mbs, ...]; call under jit with the mesh installed (jax.set_mesh).
    """
    program: PPProgram = pipeline.make_pp_program()
    s = mesh.shape[STAGE_AXIS]
    m_total = num_microbatches
    n_phases = len(program.phases)

    def loss_fn(trainable, frozen, batch, rng):
        params = merge_params(trainable, frozen)["params"]
        block_keys = {ph.param_key for ph in program.phases}
        p_rest = {k: v for k, v in params.items() if k not in block_keys}
        stacks, enables, slot_idx = [], [], []
        offset = 0
        for ph in program.phases:
            padded, en, s2b = stack_for_stages(
                pipeline.config, params[ph.param_key], ph.num_blocks, s,
                offset,
            )
            stacks.append(padded)
            enables.append(en)
            slot_idx.append(s2b)
            offset += ph.num_blocks

        # per-microbatch input prep (in-graph noising; M static)
        keys = jax.random.split(rng, m_total)
        preps = []
        for i in range(m_total):
            mb = jax.tree.map(
                lambda x: x.reshape(
                    (m_total, x.shape[0] // m_total) + x.shape[1:])[i],
                batch,
            )
            preps.append(pipeline.prepare_inputs(
                keys[i], mb, timestep_quantile=timestep_quantile))
        mi_mb = jax.tree.map(lambda *xs: jnp.stack(xs), *[p[0] for p in preps])
        target_mb = jnp.stack([p[1] for p in preps])
        mask_mb = (
            jnp.stack([p[2] for p in preps]) if preps[0][2] is not None
            else None
        )

        def body(p_rest, stacks, enables, slot_idx, mi_mb, target_mb,
                 mask_mb):
            mi0 = jax.tree.map(lambda x: x[0], mi_mb)
            ctx = program.make_ctx(p_rest, mi0)

            def get_mb(t):
                return jax.tree.map(
                    lambda x: jax.lax.dynamic_index_in_dim(x, t, 0, False),
                    mi_mb,
                )

            prev_out = None
            for i, ph in enumerate(program.phases):
                if i == 0:
                    def inject(t):
                        return program.embed(p_rest, get_mb(t), ctx)
                else:
                    def inject(t, _prev=prev_out, _pre=ph.pre):
                        payload = jax.tree.map(
                            lambda x: jax.lax.dynamic_index_in_dim(
                                x, t, 0, False),
                            _prev,
                        )
                        return _pre(payload, ctx) if _pre else payload

                def compute(payload, _ab=ph.apply_block, _p=stacks[i],
                            _en=enables[i], _si=slot_idx[i],
                            _ni=ph.needs_index):
                    if _ni:
                        return apply_local_blocks(
                            lambda p_i, c, bi: _ab(p_i, c, ctx, bi),
                            _p, _en, payload, local_index=_si,
                        )
                    return apply_local_blocks(
                        lambda p_i, c: _ab(p_i, c, ctx), _p, _en, payload
                    )

                template = jax.eval_shape(inject, jnp.zeros([], jnp.int32))
                template = jax.tree.map(
                    lambda sd: jnp.zeros(sd.shape, sd.dtype), template
                )
                out = gpipe_phase(compute, inject, m_total, s, template)
                if i < n_phases - 1:
                    # finished payloads live on the last stage; hop to 0
                    out = ring_shift(out, s)
                prev_out = out

            def head_loss_t(payload, target, mask_i):
                return program.head_loss(p_rest, payload, target, mask_i, ctx)

            if mask_mb is None:
                losses = jax.vmap(
                    lambda pl, tg: head_loss_t(pl, tg, None)
                )(prev_out, target_mb)
            else:
                losses = jax.vmap(head_loss_t)(prev_out, target_mb, mask_mb)
            return last_stage_scalar(jnp.mean(losses), s)

        shard_body = jax.shard_map(
            body,
            mesh=mesh,
            axis_names={STAGE_AXIS},
            in_specs=(P(), P(STAGE_AXIS), P(STAGE_AXIS), P(STAGE_AXIS),
                      P(), P(), P()),
            out_specs=P(),
        )
        return shard_body(
            p_rest, tuple(stacks), tuple(enables), tuple(slot_idx),
            mi_mb, target_mb, mask_mb
        )

    return loss_fn


def _block_to_slot(config: Dict[str, Any], num_layers: int, num_stages: int,
                   phase_offset: int = 0):
    """Inverse of stack_for_stages' slot layout: for each block j, the
    padded-slot index that holds it (pure python — usable under jit).
    phase_offset mirrors stack_for_stages: manual boundaries are global
    positions over the COMBINED block sequence, offset per phase."""
    split = config.get("partition_split",
                       config.get("manual_partition_split"))
    if (str(config.get("partition_method", "")).lower() == "manual"
            and split is not None):
        counts = counts_from_manual_split(
            num_layers, num_stages, [int(b) - phase_offset for b in split]
        )
        k = max(max(counts), 1)
        out = []
        for d, c in enumerate(counts):
            out.extend(d * k + i for i in range(c))
        return jnp.asarray(out, jnp.int32)
    return jnp.arange(num_layers, dtype=jnp.int32)


def make_generic_pipelined_grad_fn_1f1b(pipeline, mesh,
                                        num_microbatches: int,
                                        timestep_quantile=None):
    """True interleaved 1F1B for any PPProgram family
    (`pipeline_schedule = "1f1b"`): fn(trainable, frozen, batch, rng) ->
    (loss, grads). Single-phase programs run
    parallel/pipeline.pipeline_train_1f1b; multi-phase programs (double +
    single stream families: hunyuan-video, flux2, hidream, chroma,
    auraflow, hunyuan_image) run pipeline_train_1f1b_multiphase with one
    virtual stage per phase per device and the PPPhase.pre hand-off
    transposed at the phase boundary. Backward recomputes from rotating
    input buffers so in-flight activations are bounded by the schedule,
    not the micro-batch count (the reference's DeepSpeed 1F1B
    TrainSchedule analogue for every model, utils/patches.py:113-160).

    Drives BOTH adapter training and full fine-tuning (the reference's
    1F1B TrainSchedule covers every mode): trainability is read per-leaf
    from the trainable tree — block-stack leaves flow the stage-sharded
    grad path, embed/head (p_rest) trainables get their grads from the
    loss-head vjp (last stage) plus an embed replay against stage 0's
    payload cotangent, psum'd across stages. Caveat: grads do NOT flow
    through make_ctx outputs (rope/grid tables — constants in every
    program).
    """
    import flax
    from flax import traverse_util

    from .pipeline import apply_local_blocks, pipeline_train_1f1b

    program: PPProgram = pipeline.make_pp_program()
    if len(program.phases) != 1:
        return _make_generic_multiphase_grad_fn_1f1b(
            pipeline, mesh, program, num_microbatches, timestep_quantile)
    ph = program.phases[0]
    s = mesh.shape[STAGE_AXIS]
    m_total = num_microbatches

    def grad_fn(trainable, frozen, batch, rng):
        flat_t = traverse_util.flatten_dict(
            flax.core.unfreeze(trainable)["params"]
            if "params" in trainable else trainable
        )
        is_trainable = {p: (l is not None) for p, l in flat_t.items()}

        params = merge_params(trainable, frozen)["params"]
        p_rest = {k: v for k, v in params.items() if k != ph.param_key}
        padded, en, s2b = stack_for_stages(
            pipeline.config, params[ph.param_key], ph.num_blocks, s, 0
        )

        def split(tree, prefix=()):
            flat = traverse_util.flatten_dict(tree)
            tr = {k: (v if is_trainable.get(prefix + k, False) else None)
                  for k, v in flat.items()}
            fz = {k: (None if is_trainable.get(prefix + k, False) else v)
                  for k, v in flat.items()}
            return (traverse_util.unflatten_dict(tr),
                    traverse_util.unflatten_dict(fz))

        p_t, p_f = split(padded, (ph.param_key,))
        pr_t, pr_f = split(p_rest)
        has_rest_t = any(
            v is not None
            for v in traverse_util.flatten_dict(pr_t).values()
        )

        keys = jax.random.split(rng, m_total)
        preps = []
        for i in range(m_total):
            mb = jax.tree.map(
                lambda x: x.reshape(
                    (m_total, x.shape[0] // m_total) + x.shape[1:])[i],
                batch,
            )
            preps.append(pipeline.prepare_inputs(
                keys[i], mb, timestep_quantile=timestep_quantile))
        mi_mb = jax.tree.map(lambda *xs: jnp.stack(xs), *[p[0] for p in preps])
        target_mb = jnp.stack([p[1] for p in preps])
        mask_mb = (
            jnp.stack([p[2] for p in preps]) if preps[0][2] is not None
            else None
        )

        def body(pr_t, pr_f, p_t, p_f, en, s2b, mi_mb, target_mb, mask_mb):
            p_rest_full = merge_params(pr_t, pr_f)
            mi0 = jax.tree.map(lambda x: x[0], mi_mb)
            ctx = program.make_ctx(p_rest_full, mi0)

            def get_mb(t):
                return jax.tree.map(
                    lambda x: jax.lax.dynamic_index_in_dim(x, t, 0, False),
                    mi_mb,
                )

            def inject_p(rt, t):
                return program.embed(merge_params(rt, pr_f), get_mb(t), ctx)

            def stage_fwd(p_t_local, payload):
                p_full = merge_params(p_t_local, p_f)
                if ph.needs_index:
                    return apply_local_blocks(
                        lambda p_i, c, bi: ph.apply_block(p_i, c, ctx, bi),
                        p_full, en, payload, local_index=s2b,
                    )
                return apply_local_blocks(
                    lambda p_i, c: ph.apply_block(p_i, c, ctx),
                    p_full, en, payload,
                )

            def loss_head_p(rt, payload, t):
                target = jax.lax.dynamic_index_in_dim(target_mb, t, 0, False)
                mask_i = (
                    jax.lax.dynamic_index_in_dim(mask_mb, t, 0, False)
                    if mask_mb is not None else None
                )
                return program.head_loss(
                    merge_params(rt, pr_f), payload, target, mask_i, ctx)

            template = jax.eval_shape(
                inject_p, pr_t, jnp.zeros([], jnp.int32))
            template = jax.tree.map(
                lambda sd: jnp.zeros(sd.shape, sd.dtype), template
            )
            if has_rest_t:
                loss, g, g_rest = pipeline_train_1f1b(
                    stage_fwd, None, None, m_total, s, template, p_t,
                    rest_params=pr_t, inject_p=inject_p,
                    loss_head_p=loss_head_p,
                )
                # embed grads live on stage 0, head grads on the last
                # stage; sum to the replicated total
                g_rest = jax.tree.map(
                    lambda x: jax.lax.psum(x, STAGE_AXIS), g_rest
                )
            else:
                loss, g = pipeline_train_1f1b(
                    stage_fwd, lambda t: inject_p(pr_t, t),
                    lambda pl, t: loss_head_p(pr_t, pl, t),
                    m_total, s, template, p_t,
                )
                g_rest = jax.tree.map(lambda x: x, pr_t)  # all-None tree
            return loss, g, g_rest

        shard_body = jax.shard_map(
            body,
            mesh=mesh,
            axis_names={STAGE_AXIS},
            in_specs=(P(), P(), P(STAGE_AXIS), P(STAGE_AXIS), P(STAGE_AXIS),
                      P(STAGE_AXIS), P(), P(), P()),
            out_specs=(P(), P(STAGE_AXIS), P()),
        )
        loss, g, g_rest = shard_body(
            pr_t, pr_f, p_t, p_f, en, s2b, mi_mb, target_mb, mask_mb
        )

        # slot layout -> [L, ...] (block j's grad lives at slot b2s[j];
        # identity/padding slots drop)
        b2s = _block_to_slot(pipeline.config, ph.num_blocks, s)
        g = jax.tree.map(lambda x: x[b2s], g)
        flat_g = traverse_util.flatten_dict(g)
        flat_rest = traverse_util.flatten_dict(g_rest) if has_rest_t else {}
        flat_out = {}
        for path, leaf in flat_t.items():
            if leaf is None:
                flat_out[path] = None
            elif path[0] == ph.param_key:
                flat_out[path] = flat_g[path[1:]]
            else:
                flat_out[path] = flat_rest[path]
        grads = {"params": traverse_util.unflatten_dict(flat_out)}
        return loss, grads

    return grad_fn


def _make_generic_multiphase_grad_fn_1f1b(pipeline, mesh, program,
                                          num_microbatches: int,
                                          timestep_quantile=None):
    """Multi-phase half of make_generic_pipelined_grad_fn_1f1b (see its
    docstring): circular virtual stages, per-phase payload templates, and
    PPPhase.pre transposed at the phase hand-off."""
    import flax
    from flax import traverse_util

    from .pipeline import apply_local_blocks, pipeline_train_1f1b_multiphase

    s = mesh.shape[STAGE_AXIS]
    m_total = num_microbatches
    phases = program.phases
    n_phases = len(phases)
    def grad_fn(trainable, frozen, batch, rng):
        flat_t = traverse_util.flatten_dict(
            flax.core.unfreeze(trainable)["params"]
            if "params" in trainable else trainable
        )
        is_trainable = {p: (l is not None) for p, l in flat_t.items()}

        params = merge_params(trainable, frozen)["params"]
        block_keys = {ph.param_key for ph in phases}
        p_rest = {k: v for k, v in params.items() if k not in block_keys}
        stacks, enables, slot_idx = [], [], []
        offset = 0
        for ph in phases:
            padded, en, s2b = stack_for_stages(
                pipeline.config, params[ph.param_key], ph.num_blocks, s,
                offset,
            )
            stacks.append(padded)
            enables.append(en)
            slot_idx.append(s2b)
            offset += ph.num_blocks

        def split(tree, prefix=()):
            flat = traverse_util.flatten_dict(tree)
            tr = {k: (v if is_trainable.get(prefix + k, False) else None)
                  for k, v in flat.items()}
            fz = {k: (None if is_trainable.get(prefix + k, False) else v)
                  for k, v in flat.items()}
            return (traverse_util.unflatten_dict(tr),
                    traverse_util.unflatten_dict(fz))

        ps_t, ps_f = [], []
        for ph, stk in zip(phases, stacks):
            t, f = split(stk, (ph.param_key,))
            ps_t.append(t)
            ps_f.append(f)
        pr_t, pr_f = split(p_rest)
        has_rest_t = any(
            v is not None
            for v in traverse_util.flatten_dict(pr_t).values()
        )

        keys = jax.random.split(rng, m_total)
        preps = []
        for i in range(m_total):
            mb = jax.tree.map(
                lambda x: x.reshape(
                    (m_total, x.shape[0] // m_total) + x.shape[1:])[i],
                batch,
            )
            preps.append(pipeline.prepare_inputs(
                keys[i], mb, timestep_quantile=timestep_quantile))
        mi_mb = jax.tree.map(lambda *xs: jnp.stack(xs), *[p[0] for p in preps])
        target_mb = jnp.stack([p[1] for p in preps])
        mask_mb = (
            jnp.stack([p[2] for p in preps]) if preps[0][2] is not None
            else None
        )

        def body(pr_t, pr_f, ps_t, ps_f, enables, slot_idx, mi_mb,
                 target_mb, mask_mb):
            p_rest_full = merge_params(pr_t, pr_f)
            mi0 = jax.tree.map(lambda x: x[0], mi_mb)
            ctx = program.make_ctx(p_rest_full, mi0)

            def get_mb(t):
                return jax.tree.map(
                    lambda x: jax.lax.dynamic_index_in_dim(x, t, 0, False),
                    mi_mb,
                )

            def inject_p(rt, t):
                return program.embed(merge_params(rt, pr_f), get_mb(t), ctx)

            phase_fns = []
            for p, ph in enumerate(phases):
                def fn(p_t_local, payload, _p=p, _ph=ph):
                    p_full = merge_params(p_t_local, ps_f[_p])
                    if _ph.needs_index:
                        return apply_local_blocks(
                            lambda p_i, c, bi: _ph.apply_block(
                                p_i, c, ctx, bi),
                            p_full, enables[_p], payload,
                            local_index=slot_idx[_p],
                        )
                    return apply_local_blocks(
                        lambda p_i, c: _ph.apply_block(p_i, c, ctx),
                        p_full, enables[_p], payload,
                    )
                phase_fns.append(fn)

            handoffs = [None]
            for ph in phases[1:]:
                handoffs.append(
                    (lambda payload, _pre=ph.pre: _pre(payload, ctx))
                    if ph.pre is not None else None
                )

            def loss_head_p(rt, payload, t):
                target = jax.lax.dynamic_index_in_dim(target_mb, t, 0, False)
                mask_i = (
                    jax.lax.dynamic_index_in_dim(mask_mb, t, 0, False)
                    if mask_mb is not None else None
                )
                return program.head_loss(
                    merge_params(rt, pr_f), payload, target, mask_i, ctx)

            def as_zeros(sd_tree):
                return jax.tree.map(
                    lambda sd: jnp.zeros(sd.shape, sd.dtype), sd_tree
                )

            templates = [as_zeros(jax.eval_shape(
                inject_p, pr_t, jnp.zeros([], jnp.int32)))]
            for p in range(1, n_phases):
                prev = templates[p - 1]
                templates.append(
                    as_zeros(jax.eval_shape(handoffs[p], prev))
                    if handoffs[p] is not None else prev
                )

            if has_rest_t:
                loss, gs, g_rest = pipeline_train_1f1b_multiphase(
                    phase_fns, ps_t, None, None, m_total, s, None,
                    handoffs=handoffs, payload_templates=templates,
                    rest_params=pr_t, inject_p=inject_p,
                    loss_head_p=loss_head_p,
                )
                g_rest = jax.tree.map(
                    lambda x: jax.lax.psum(x, STAGE_AXIS), g_rest
                )
            else:
                loss, gs = pipeline_train_1f1b_multiphase(
                    phase_fns, ps_t, lambda t: inject_p(pr_t, t),
                    lambda pl, t: loss_head_p(pr_t, pl, t),
                    m_total, s, None, handoffs=handoffs,
                    payload_templates=templates,
                )
                g_rest = jax.tree.map(lambda x: x, pr_t)  # all-None tree
            return loss, tuple(gs), g_rest

        shard_body = jax.shard_map(
            body,
            mesh=mesh,
            axis_names={STAGE_AXIS},
            in_specs=(P(), P(), P(STAGE_AXIS), P(STAGE_AXIS), P(STAGE_AXIS),
                      P(STAGE_AXIS), P(), P(), P()),
            out_specs=(P(), P(STAGE_AXIS), P()),
        )
        loss, gs, g_rest = shard_body(
            pr_t, pr_f, tuple(ps_t), tuple(ps_f), tuple(enables),
            tuple(slot_idx), mi_mb, target_mb, mask_mb
        )

        flat_rest = traverse_util.flatten_dict(g_rest) if has_rest_t else {}
        flat_gs = []
        ph_offset = 0
        for ph, g in zip(phases, gs):
            b2s = _block_to_slot(pipeline.config, ph.num_blocks, s,
                                 phase_offset=ph_offset)
            g = jax.tree.map(lambda x: x[b2s], g)
            flat_gs.append(traverse_util.flatten_dict(g))
            ph_offset += ph.num_blocks
        key_to_phase = {ph.param_key: i for i, ph in enumerate(phases)}
        flat_out = {}
        for path, leaf in flat_t.items():
            if leaf is None:
                flat_out[path] = None
            elif path[0] in key_to_phase:
                flat_out[path] = flat_gs[key_to_phase[path[0]]][path[1:]]
            else:
                flat_out[path] = flat_rest[path]
        grads = {"params": traverse_util.unflatten_dict(flat_out)}
        return loss, grads

    return grad_fn
