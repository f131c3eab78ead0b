"""GPipe pipeline parallelism as a differentiable shard_map program.

TPU-native replacement for the reference's DeepSpeed 1F1B engine
(utils/patches.py:113-160 patched TrainSchedule + PipelineEngine p2p
send/recv): stage hand-off is a `ppermute` ring over the 'stage' mesh axis,
the microbatch loop is a `lax.scan` over pipeline ticks, and backward is
ordinary reverse-mode AD through the scan (the reverse program IS the
reverse pipeline; ppermute's transpose is the inverted ring).

Design (SURVEY.md section 7.1 "stage-partitioned modules under shard_map"):

- A *phase* is a homogeneous run of blocks (e.g. flux's 19 double blocks).
  Its stacked params [L, ...] are padded to [S*k, ...] and sharded P('stage')
  on axis 0, so each device owns k blocks; padded slots carry an enabled=0
  flag and act as identity. Heterogeneous models chain several phases
  (flux: doubles then singles) — microbatches traverse the device ring once
  per phase, which is structurally the "circular/interleaved" layout (each
  device hosts one virtual stage per phase).
- Within a tick every device computes its k blocks via an inner lax.scan,
  then the payload rotates one hop. Stage 0 injects freshly-embedded
  microbatch t; the last stage collects finished microbatches.
- The schedule is GPipe (fill/drain bubble 2*(S-1) ticks across both
  phases for flux). The tick-scan structure is the substrate a 1F1B
  variant slots into later.

Everything here is *manual* only over the 'stage' axis (shard_map
axis_names={'stage'}); 'data' and 'tensor' stay GSPMD-auto, so DP batch
sharding and TP kernel sharding compose with the pipeline for free.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

STAGE_AXIS = "stage"


def stage_index():
    return jax.lax.axis_index(STAGE_AXIS)


def num_stages_in_axis():
    return jax.lax.axis_size(STAGE_AXIS)


def ring_perm(s: int):
    return [(i, (i + 1) % s) for i in range(s)]


def ring_shift(tree: Any, s: int):
    """Move every device's value one hop forward on the stage ring."""
    return jax.tree.map(
        lambda x: jax.lax.ppermute(x, STAGE_AXIS, ring_perm(s)), tree
    )


def pad_stack_for_stages(stacked: Any, num_layers: int, num_stages: int):
    """Pad [L, ...] stacked block params to [S*k, ...] plus enabled mask.

    Returns (padded_params, enabled [S*k] float32). Padded slots are zeros
    and masked to identity at apply time.
    """
    k = -(-num_layers // num_stages)
    total = k * num_stages
    pad = total - num_layers

    def pad_leaf(x):
        if pad == 0:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )

    padded = jax.tree.map(pad_leaf, stacked)
    enabled = (jnp.arange(total) < num_layers).astype(jnp.float32)
    return padded, enabled, k


def counts_from_manual_split(num_layers: int, num_stages: int, split):
    """Reference `manual_partition_split` semantics (utils/pipeline.py:11-53):
    `split` lists the S-1 block indices where stages 1..S-1 begin. Returns
    per-stage block counts. Boundaries are clipped to [0, num_layers], so a
    flat split over a multi-phase block sequence can be applied per phase by
    offsetting (see models/flux_pp.py)."""
    split = list(split)
    if len(split) != num_stages - 1:
        raise ValueError(
            f"manual_partition_split needs {num_stages - 1} entries for "
            f"{num_stages} stages, got {len(split)}"
        )
    bounds = [0] + [min(max(int(b), 0), num_layers) for b in split] + [num_layers]
    if any(b < a for a, b in zip(bounds, bounds[1:])):
        raise ValueError(f"manual_partition_split must be ascending: {split}")
    return [b - a for a, b in zip(bounds, bounds[1:])]


def pad_stack_for_manual_split(stacked: Any, num_layers: int,
                               num_stages: int, counts):
    """Uneven stage partitioning: stage d owns `counts[d]` consecutive blocks
    of the [L, ...] stack (the reference's ManualPipelineModule uneven-VRAM
    mode). The stack is gathered into [S*k_max, ...] slot layout — stage d's
    slots are [d*k_max, (d+1)*k_max), the first counts[d] enabled, the rest
    identity — so the same sharded-scan stage computation runs unmodified.
    Returns (padded_params, enabled [S*k_max] float32, k_max)."""
    assert sum(counts) == num_layers, (counts, num_layers)
    k = max(max(counts), 1)
    idx = []
    en = []
    start = 0
    for c in counts:
        idx.extend(range(start, start + c))
        idx.extend([0] * (k - c))  # dummy gathers, masked off
        en.extend([1.0] * c + [0.0] * (k - c))
        start += c
    idx = jnp.asarray(idx, jnp.int32)
    padded = jax.tree.map(lambda x: jnp.take(x, idx, axis=0), stacked)
    return padded, jnp.asarray(en, jnp.float32), k


def apply_local_blocks(block_apply: Callable, local_params: Any,
                       local_enabled: jax.Array, carry: Any, *broadcast,
                       local_index: Any = None):
    """Run this stage's k blocks (inner scan), identity for disabled slots.

    block_apply(params_i, carry, *broadcast) -> new_carry
    local_params leaves: [k, ...]; local_enabled: [k].
    With local_index ([k] int32 global block positions), block_apply is
    called as block_apply(params_i, carry, block_index, *broadcast) —
    for blocks consuming per-block-position data (e.g. chroma's distilled
    modulation slices).
    """

    def body(c, xs):
        if local_index is None:
            p_i, en = xs
            new_c = block_apply(p_i, c, *broadcast)
        else:
            p_i, en, bi = xs
            new_c = block_apply(p_i, c, bi, *broadcast)
        out = jax.tree.map(
            lambda a, b: jnp.where(en > 0, a, b), new_c, c
        )
        return out, None

    xs = (
        (local_params, local_enabled) if local_index is None
        else (local_params, local_enabled, local_index)
    )
    out, _ = jax.lax.scan(body, carry, xs)
    return out


def gpipe_phase(
    stage_compute: Callable,
    inject: Callable,
    num_microbatches: int,
    num_stages: int,
    payload_template: Any,
):
    """One pipelined phase over the stage ring.

    Args:
      stage_compute: (payload) -> payload; this device's block stack.
      inject: (t: int32) -> payload; fresh input for microbatch t (used on
        stage 0 only; computed everywhere, selected by stage id).
      payload_template: pytree of arrays with the payload's shape/dtype.

    Returns [M, ...] stacked finished payloads — valid on the LAST stage
    (other stages hold garbage; mask or psum on use).
    """
    m_total = num_microbatches
    s = num_stages
    ticks = m_total + s - 1

    def to_varying(tree):
        # scan carries become device-varying after ppermute; the initial
        # value must carry the same vma type (shard_map VMA typing rule)
        return jax.tree.map(
            lambda x: jax.lax.pcast(x, (STAGE_AXIS,), to="varying"), tree
        )

    zero_payload = to_varying(jax.tree.map(jnp.zeros_like, payload_template))
    # +1 slot: out-of-range (bubble) writes land in the sacrificial tail.
    out0 = to_varying(jax.tree.map(
        lambda x: jnp.zeros((m_total + 1,) + x.shape, x.dtype), payload_template
    ))

    def tick(carry, t):
        buf, out = carry
        stage = stage_index()
        fresh = inject(jnp.minimum(t, m_total - 1))
        cur = jax.tree.map(
            lambda a, b: jnp.where(stage == 0, a, b), fresh, buf
        )
        cur = stage_compute(cur)
        # last stage collects microbatch m = t - (S-1)
        m = t - (s - 1)
        idx = jnp.where((m >= 0) & (stage == s - 1), m, m_total)
        out = jax.tree.map(
            lambda o, c: jax.lax.dynamic_update_index_in_dim(o, c, idx, 0),
            out, cur,
        )
        buf = ring_shift(cur, s)
        return (buf, out), None

    (_, out), _ = jax.lax.scan(
        tick, (zero_payload, out0), jnp.arange(ticks)
    )
    return jax.tree.map(lambda o: o[:m_total], out)


def reverse_perm(s: int):
    return [(i, (i - 1) % s) for i in range(s)]


def pipeline_train_1f1b(
    stage_fwd: Callable,
    inject: Callable,
    loss_head: Callable,
    num_microbatches: int,
    num_stages: int,
    payload_template: Any,
    local_params: Any,
    rest_params: Any = None,
    inject_p: Callable = None,
    loss_head_p: Callable = None,
):
    """Interleaved forward/backward (1F1B-family) pipelined loss+grad.

    The reference runs DeepSpeed's 1F1B TrainSchedule (utils/patches.py
    patched TrainSchedule) so backward of micro-batch m starts as soon as
    its forward drains, bounding in-flight activations per stage. This is
    the jax analogue as ONE fused tick loop: every tick does one forward
    subtick (GPipe ring step, input payload saved to a rotating buffer)
    and one backward subtick (jax.vjp recompute from the saved input —
    remat-style — with the cotangent travelling the REVERSE ring; the last
    stage seeds it from the loss head). In-flight inputs are bounded by
    2*S slots instead of GPipe-under-AD's M + S - 1 saved tick payloads
    (true torch 1F1B holds S; the factor 2 buys the uniform SPMD schedule
    where every device computes both subticks every tick). Bubble fraction
    is identical to 1F1B: (S-1)/(M+S-1).

    Args (all under the caller's shard_map over the 'stage' axis):
      stage_fwd(local_params, payload) -> payload  — this stage's blocks.
      inject(t) -> payload                         — micro-batch t input.
      loss_head(payload, t) -> scalar              — loss on the LAST stage.
    Returns (mean_loss, grads) where grads match local_params (each
    device's grads are for ITS stage's parameters; average over micros).

    Full fine-tuning (reference: 1F1B drives every training mode incl.
    full FT, utils/patches.py:113-160): pass `rest_params` (the trainable
    embed/head params) with `inject_p(rest, t)` and
    `loss_head_p(rest, payload, t)` replacing inject/loss_head. Each
    backward subtick then also vjps the loss head w.r.t. rest (nonzero
    only where the loss seed lives, the last stage) and replays the embed
    under vjp against this tick's OWN payload cotangent (nonzero only on
    stage 0, whose dx is exactly d(loss)/d(embed output)). Returns
    (mean_loss, grads, rest_grads); rest_grads are per-stage partials —
    psum over the stage axis before use.
    """
    m_total = num_microbatches
    s = num_stages
    nslots = 2 * s
    ticks = m_total + 2 * (s - 1) + 1

    full_ft = rest_params is not None
    if not full_ft:
        inject_p = lambda r, t: inject(t)  # noqa: E731
        loss_head_p = lambda r, pl, t: loss_head(pl, t)  # noqa: E731

    def to_varying(tree):
        return jax.tree.map(
            lambda x: jax.lax.pcast(x, (STAGE_AXIS,), to="varying"), tree
        )

    def _ensure_varying(x):
        if STAGE_AXIS in getattr(jax.typeof(x), "vma", ()):
            return x
        return jax.lax.pcast(x, (STAGE_AXIS,), to="varying")

    # rest_params usually arrives replicated (shard_map in_spec P()). Its
    # vjp cotangent would then be typed invariant, and vma-aware AD inserts
    # a hidden cross-stage psum in the transpose — which double-counts once
    # our per-stage gating + explicit psum run. Re-type it varying so every
    # stage gets ITS OWN partial and the accounting below stays exact.
    rest_t = (jax.tree.map(_ensure_varying, rest_params) if full_ft else {})

    zero_payload = to_varying(jax.tree.map(jnp.zeros_like, payload_template))
    inputs_buf0 = to_varying(jax.tree.map(
        lambda x: jnp.zeros((nslots,) + x.shape, x.dtype), payload_template
    ))
    zero_grads = to_varying(jax.tree.map(
        lambda p: jnp.zeros(p.shape, jnp.float32), local_params
    ))
    zero_rest_grads = to_varying(jax.tree.map(
        lambda p: jnp.zeros(p.shape, jnp.float32), rest_t
    ))

    def g_fn(params, rest, payload, m):
        out = stage_fwd(params, payload)
        return out, loss_head_p(rest, out, m)

    # Integer payload leaves (e.g. validity masks) ride the cotangent ring
    # as f32 zeros; at the vjp boundary they convert to/from float0.
    import numpy as _onp

    def _to_vjp_cot(cot_tree):
        return jax.tree.map(
            lambda c, t: c if jnp.issubdtype(t.dtype, jnp.inexact)
            else _onp.zeros(t.shape, jax.dtypes.float0),
            cot_tree, payload_template,
        )

    def _from_vjp_cot(dx_tree, gate):
        return jax.tree.map(
            lambda d, t: (gate * d) if jnp.issubdtype(t.dtype, jnp.inexact)
            else jnp.zeros(t.shape, jnp.float32),
            dx_tree, payload_template,
        )

    def tick(carry, tau):
        fwd_buf, inputs_buf, bwd_cot, grads, rest_grads, loss_acc = carry
        stage = stage_index()

        # ---- forward subtick (GPipe ring step) ----
        m_f = tau - stage
        fresh = inject_p(rest_t, jnp.clip(tau, 0, m_total - 1))
        cur_in = jax.tree.map(
            lambda a, b: jnp.where(stage == 0, a, b), fresh, fwd_buf
        )
        inputs_buf = jax.tree.map(
            lambda buf, x: jax.lax.dynamic_update_index_in_dim(
                buf, x, tau % nslots, 0
            ),
            inputs_buf, cur_in,
        )
        cur_out = stage_fwd(local_params, cur_in)
        fwd_buf = ring_shift(cur_out, s)

        # ---- backward subtick ----
        m_b = tau - 2 * (s - 1) + stage
        active_b = jnp.logical_and(m_b >= 0, m_b < m_total)
        slot = jnp.mod(m_b + stage, nslots)
        saved_in = jax.tree.map(
            lambda buf: jax.lax.dynamic_index_in_dim(
                buf, slot, 0, keepdims=False
            ),
            inputs_buf,
        )
        m_clamped = jnp.clip(m_b, 0, m_total - 1)
        (out_p, loss_p), vjp = jax.vjp(
            lambda p, r, x: g_fn(p, r, x, m_clamped),
            local_params, rest_t, saved_in,
        )
        is_last = stage == s - 1
        # cotangent: ring value for inner stages, loss seed on the last
        cot_out = jax.tree.map(
            lambda c, z: jnp.where(is_last, z, c), bwd_cot,
            jax.tree.map(jnp.zeros_like, bwd_cot),
        )
        loss_seed = jnp.where(is_last, 1.0, 0.0).astype(jnp.float32)
        dparams, drest, dx = vjp((_to_vjp_cot(cot_out), loss_seed))
        gate = active_b.astype(jnp.float32)
        grads = jax.tree.map(
            lambda g, d: g + gate * d.astype(jnp.float32), grads, dparams
        )
        if full_ft:
            # head-side rest grads: the loss seed already zeroes non-last
            # stages (stage_fwd never reads rest); gate kills bubble ticks
            rest_grads = jax.tree.map(
                lambda g, d: g + gate * d.astype(jnp.float32),
                rest_grads, drest,
            )
            # embed-side rest grads: stage 0's dx IS d(loss)/d(embed out)
            # for micro m_b — replay the embed under vjp against it
            emb_gate = gate * (stage == 0).astype(jnp.float32)
            _, vjp_e = jax.vjp(
                lambda r: inject_p(r, m_clamped), rest_t
            )
            (d_emb,) = vjp_e(_to_vjp_cot(_from_vjp_cot(dx, emb_gate)))
            rest_grads = jax.tree.map(
                lambda g, d: g + d.astype(jnp.float32), rest_grads, d_emb
            )
        loss_acc = loss_acc + jnp.where(
            jnp.logical_and(is_last, active_b), loss_p, 0.0
        )
        # cotangents travel the reverse ring (stage s -> s-1); zero out
        # inactive contributions so bubbles don't pollute
        dx = _from_vjp_cot(dx, gate)
        bwd_cot = jax.tree.map(
            lambda x: jax.lax.ppermute(x, STAGE_AXIS, reverse_perm(s)), dx
        )
        return (fwd_buf, inputs_buf, bwd_cot, grads, rest_grads,
                loss_acc), None

    carry0 = (
        zero_payload,
        inputs_buf0,
        to_varying(jax.tree.map(
            lambda x: jnp.zeros(x.shape, jnp.float32), payload_template
        )),
        zero_grads,
        zero_rest_grads,
        jax.lax.pcast(jnp.zeros([], jnp.float32), (STAGE_AXIS,), to="varying"),
    )
    (fwd_buf, inputs_buf, bwd_cot, grads, rest_grads, loss_acc), _ = (
        jax.lax.scan(tick, carry0, jnp.arange(ticks))
    )
    loss = jax.lax.psum(
        jnp.where(stage_index() == s - 1, loss_acc, 0.0), STAGE_AXIS
    ) / m_total
    grads = jax.tree.map(lambda g: g / m_total, grads)
    if full_ft:
        rest_grads = jax.tree.map(lambda g: g / m_total, rest_grads)
        return loss, grads, rest_grads
    return loss, grads


def pipeline_train_1f1b_multiphase(
    phase_fns,
    phase_params,
    inject: Callable,
    loss_head: Callable,
    num_microbatches: int,
    num_stages: int,
    payload_template: Any,
    handoffs=None,
    payload_templates=None,
    rest_params: Any = None,
    inject_p: Callable = None,
    loss_head_p: Callable = None,
):
    """Interleaved 1F1B over P phases of virtual stages (circular layout).

    The flux-style layout hosts one virtual stage per PHASE on every device
    (device d owns doubles-chunk d and singles-chunk d), so a micro-batch
    traverses the device ring once per phase — V = P*S virtual stages.
    Every tick each device runs one forward chunk per phase (ring A..P) and
    one backward chunk per phase (reverse rings), with jax.vjp recompute
    from a rotating 2V-slot input buffer per phase. Phase hand-off happens
    at the ring wrap: device 0's phase-p buffer receives device S-1's
    phase-(p-1) output. In-flight inputs are bounded by P * 2V slots;
    bubble is (V-1)/(M+V-1) — the circular-virtual-stage bubble the
    reference's interleaved DeepSpeed schedules also pay.

    Args (under the caller's shard_map over 'stage'):
      phase_fns[p](phase_params[p], payload) -> payload. Payload structure
        may DIFFER per phase: pass `payload_templates` (a list of
        per-phase input templates) and `handoffs[p]` (p >= 1) mapping
        phase p-1's output payload to phase p's input (a PPPhase.pre —
        e.g. concat double-stream (img, txt) into the single-stream
        xcat). With only `payload_template`, all phases are type-stable
        (flux).
      inject(t) -> phase-0 payload; loss_head(payload, t) -> scalar (last
        stage, LAST phase; earlier phases contribute a structurally-zero
        loss so the vjp signature stays uniform across devices).
    Returns (mean_loss, [grads_p]) matching phase_params.

    Full fine-tuning: pass `rest_params` (trainable embed/head params)
    with `inject_p(rest, t)` / `loss_head_p(rest, payload, t)` replacing
    inject/loss_head. Head-side rest grads come from the last phase's vjp
    (loss seed lives on last stage / last phase); embed-side grads replay
    inject under vjp against phase 0's input cotangent on stage 0.
    Returns (mean_loss, [grads_p], rest_grads) — rest_grads are per-stage
    partials, psum over the stage axis before use.

    The hand-off transpose needs the pre-image of handoffs[p]: each tick
    device 0 also records the incoming raw phase-(p-1) output in a second
    rotating buffer, and the backward pulls phase p's input cotangent back
    through jax.vjp(handoffs[p]) at that saved raw payload before the
    reverse ring delivers it to device S-1 of phase p-1.
    """
    m_total = num_microbatches
    s = num_stages
    n_phases = len(phase_fns)
    v_total = n_phases * s
    nslots = 2 * v_total
    ticks = m_total + 2 * (v_total - 1) + 1

    if payload_templates is not None:
        templates = list(payload_templates)
    else:
        templates = [payload_template] * n_phases
    if handoffs is None:
        handoffs = [None] * n_phases

    full_ft = rest_params is not None
    if not full_ft:
        inject_p = lambda r, t: inject(t)  # noqa: E731
        loss_head_p = lambda r, pl, t: loss_head(pl, t)  # noqa: E731

    def to_varying(tree):
        return jax.tree.map(
            lambda x: jax.lax.pcast(x, (STAGE_AXIS,), to="varying"), tree
        )

    def _ensure_varying(x):
        if STAGE_AXIS in getattr(jax.typeof(x), "vma", ()):
            return x
        return jax.lax.pcast(x, (STAGE_AXIS,), to="varying")

    # see pipeline_train_1f1b: re-type replicated rest as varying so the
    # vjp transpose cannot insert a hidden cross-stage psum
    rest_t = (jax.tree.map(_ensure_varying, rest_params) if full_ft else {})

    fwd_buf0 = to_varying([
        jax.tree.map(jnp.zeros_like, templates[p]) for p in range(n_phases)
    ])
    inputs_buf0 = to_varying([
        jax.tree.map(
            lambda x: jnp.zeros((nslots,) + x.shape, x.dtype), templates[p]
        )
        for p in range(n_phases)
    ])
    # raw hand-off pre-images (phase p-1's OUTPUT structure) for phases
    # with a structure-changing handoff; () placeholder otherwise
    raw_buf0 = to_varying([
        (jax.tree.map(
            lambda x: jnp.zeros((nslots,) + x.shape, x.dtype),
            templates[p - 1])
         if (p > 0 and handoffs[p] is not None) else ())
        for p in range(n_phases)
    ])
    cot0 = to_varying([
        jax.tree.map(lambda x: jnp.zeros(x.shape, jnp.float32), templates[p])
        for p in range(n_phases)
    ])
    grads0 = to_varying([
        jax.tree.map(lambda p_: jnp.zeros(p_.shape, jnp.float32), pp)
        for pp in phase_params
    ])
    zero_rest_grads = to_varying(jax.tree.map(
        lambda p_: jnp.zeros(p_.shape, jnp.float32), rest_t
    ))

    def g_fn(p_idx, params, rest, payload, m):
        # the loss output must carry the device-varying VMA type on every
        # phase so its vjp seed types check (seeded nonzero only on the
        # last phase / last stage); earlier phases emit a structural zero
        out = phase_fns[p_idx](params, payload)
        if p_idx == n_phases - 1:
            return out, loss_head_p(rest, out, m)
        anchor = jax.tree.leaves(out)[0]
        return out, jnp.sum(anchor).astype(jnp.float32) * 0.0

    # Integer payload leaves (e.g. validity masks) ride the cotangent ring
    # as f32 zeros; at the vjp boundary they convert to/from float0.
    import numpy as _onp

    def _to_vjp_cot(cot_tree, template):
        return jax.tree.map(
            lambda c, t: c if jnp.issubdtype(t.dtype, jnp.inexact)
            else _onp.zeros(t.shape, jax.dtypes.float0),
            cot_tree, template,
        )

    def _from_vjp_cot(dx_tree, gate, template):
        return jax.tree.map(
            lambda d, t: (gate * d) if jnp.issubdtype(t.dtype, jnp.inexact)
            else jnp.zeros(t.shape, jnp.float32),
            dx_tree, template,
        )

    def tick(carry, tau):
        (fwd_buf, inputs_buf, raw_buf, bwd_cot, grads, rest_grads,
         loss_acc) = carry
        stage = stage_index()
        is_first = stage == 0
        is_last = stage == s - 1

        # ---- forward subticks, one per phase ----
        outs = []
        new_inputs = []
        fresh = inject_p(rest_t, jnp.clip(tau, 0, m_total - 1))
        for p in range(n_phases):
            cur_in = fwd_buf[p]
            if p == 0:
                cur_in = jax.tree.map(
                    lambda a, b: jnp.where(is_first, a, b), fresh, cur_in
                )
            new_inputs.append(jax.tree.map(
                lambda buf, x: jax.lax.dynamic_update_index_in_dim(
                    buf, x, tau % nslots, 0
                ),
                inputs_buf[p], cur_in,
            ))
            outs.append(phase_fns[p](phase_params[p], cur_in))
        shifted = [ring_shift(o, s) for o in outs]
        new_fwd = []
        new_raw = list(raw_buf)
        for p in range(n_phases):
            if p == 0:
                new_fwd.append(shifted[0])
            else:
                # device 0's phase-p input is device S-1's phase-(p-1)
                # output, mapped through the phase hand-off
                cand = shifted[p - 1]
                if handoffs[p] is not None:
                    # save the raw pre-image at the slot of the tick that
                    # CONSUMES it (tau+1), for the backward transpose
                    new_raw[p] = jax.tree.map(
                        lambda buf, x: jax.lax.dynamic_update_index_in_dim(
                            buf, x, (tau + 1) % nslots, 0
                        ),
                        raw_buf[p], cand,
                    )
                    cand = handoffs[p](cand)
                new_fwd.append(jax.tree.map(
                    lambda a, b: jnp.where(is_first, a, b),
                    cand, shifted[p],
                ))

        # ---- backward subticks, one per phase ----
        new_grads = []
        new_rest_grads = rest_grads
        dxs = []
        slots = []
        for p in range(n_phases):
            v_base = p * s  # virtual stage of this phase at device `stage`
            m_b = tau - 2 * (v_total - 1) + v_base + stage
            active_b = jnp.logical_and(m_b >= 0, m_b < m_total)
            slot = jnp.mod(m_b + v_base + stage, nslots)
            slots.append(slot)
            saved_in = jax.tree.map(
                lambda buf: jax.lax.dynamic_index_in_dim(
                    buf, slot, 0, keepdims=False
                ),
                new_inputs[p],
            )
            m_clamped = jnp.clip(m_b, 0, m_total - 1)
            (out_p, loss_p), vjp = jax.vjp(
                lambda pr, r, x, _p=p: g_fn(_p, pr, r, x, m_clamped),
                phase_params[p], rest_t, saved_in,
            )
            seed_here = jnp.logical_and(is_last, p == n_phases - 1)
            cot_out = jax.tree.map(
                lambda c: jnp.where(seed_here, 0.0, c), bwd_cot[p]
            )
            loss_seed = jnp.where(seed_here, 1.0, 0.0).astype(jnp.float32)
            dparams, drest, dx = vjp(
                (_to_vjp_cot(cot_out, templates[p]), loss_seed))
            gate = active_b.astype(jnp.float32)
            new_grads.append(jax.tree.map(
                lambda g, d: g + gate * d.astype(jnp.float32), grads[p],
                dparams
            ))
            if full_ft:
                # head-side rest grads (nonzero only on the seeded phase)
                new_rest_grads = jax.tree.map(
                    lambda g, d: g + gate * d.astype(jnp.float32),
                    new_rest_grads, drest,
                )
                if p == 0:
                    # embed-side: stage 0's phase-0 dx IS d(loss)/d(embed
                    # out) for micro m_b — replay the embed under vjp
                    emb_gate = gate * (stage == 0).astype(jnp.float32)
                    _, vjp_e = jax.vjp(
                        lambda r: inject_p(r, m_clamped), rest_t
                    )
                    (d_emb,) = vjp_e(_to_vjp_cot(
                        _from_vjp_cot(dx, emb_gate, templates[0]),
                        templates[0]))
                    new_rest_grads = jax.tree.map(
                        lambda g, d: g + d.astype(jnp.float32),
                        new_rest_grads, d_emb,
                    )
            dxs.append(_from_vjp_cot(dx, gate, templates[p]))
            loss_acc = loss_acc + jnp.where(
                jnp.logical_and(seed_here, active_b), loss_p, 0.0
            )
        new_cot = []
        for p in range(n_phases):
            own = jax.tree.map(
                lambda x: jax.lax.ppermute(x, STAGE_AXIS, reverse_perm(s)),
                dxs[p],
            )
            if p == n_phases - 1:
                new_cot.append(own)
                continue
            # device S-1's phase-p cotangent comes from device 0's
            # phase-(p+1) dx (reverse of the forward phase hand-off),
            # pulled back through the hand-off transpose when one exists
            d_next = dxs[p + 1]
            if handoffs[p + 1] is not None:
                saved_raw = jax.tree.map(
                    lambda buf: jax.lax.dynamic_index_in_dim(
                        buf, slots[p + 1], 0, keepdims=False
                    ),
                    new_raw[p + 1],
                )
                _, vjp_h = jax.vjp(handoffs[p + 1], saved_raw)
                (d_next,) = vjp_h(_to_vjp_cot(d_next, templates[p + 1]))
                d_next = _from_vjp_cot(d_next, 1.0, templates[p])
            hand = jax.tree.map(
                lambda x: jax.lax.ppermute(x, STAGE_AXIS, reverse_perm(s)),
                d_next,
            )
            new_cot.append(jax.tree.map(
                lambda a, b: jnp.where(is_last, a, b), hand, own,
            ))

        return (new_fwd, new_inputs, new_raw, new_cot, new_grads,
                new_rest_grads, loss_acc), None

    carry0 = (
        fwd_buf0, inputs_buf0, raw_buf0, cot0, grads0, zero_rest_grads,
        jax.lax.pcast(jnp.zeros([], jnp.float32), (STAGE_AXIS,), to="varying"),
    )
    (_, _, _, _, grads, rest_grads, loss_acc), _ = jax.lax.scan(
        tick, carry0, jnp.arange(ticks)
    )
    loss = jax.lax.psum(
        jnp.where(stage_index() == s - 1, loss_acc, 0.0), STAGE_AXIS
    ) / m_total
    grads = [jax.tree.map(lambda g: g / m_total, gp) for gp in grads]
    if full_ft:
        rest_grads = jax.tree.map(lambda g: g / m_total, rest_grads)
        return loss, grads, rest_grads
    return loss, grads


def last_stage_scalar(value: jax.Array, num_stages: int):
    """Replicate a scalar computed validly only on the last stage."""
    stage = stage_index()
    return jax.lax.psum(
        jnp.where(stage == num_stages - 1, value, 0.0), STAGE_AXIS
    )
