"""Pallas TPU flash attention: blockwise online-softmax attention kernel.

Replaces the reference's flash-attn 2/3 dependency (reference
models/wan/attention.py:19-127 wraps CUDA flash_attn_varlen; every other model
uses torch SDPA). Design is TPU-first: the kernel tiles Q into VMEM blocks,
streams K/V blocks through the MXU with a running (m, l) online softmax, and
keeps the output accumulator in VMEM scratch across the innermost (contracted)
grid dimension. Variable-length sequences are expressed with a key-validity
mask (the TPU analogue of cu_seqlens packing: padded dense blocks + masking)
rather than CUDA varlen launches.

Backward is the standard recompute formulation (store only the per-row
logsumexp): one kernel accumulates dQ over KV blocks, one accumulates dK/dV
over Q blocks. All softmax math is float32; matmuls feed the MXU in the input
dtype with float32 accumulation.

The logsumexp and D=rowsum(dO*O) tensors are stored as [B, H, S, 1] column
tensors (one f32 per token) instead of a lane-broadcast [B, H, S, 128]
layout, so long video sequences (32k+ tokens) don't waste HBM, and no
in-kernel lane<->sublane relayout is needed.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
# exp2 trick (splash-attention style): exp(x) lowers to exp2(x * log2(e)) on
# TPU, costing a hidden per-element multiply inside every softmax exp. We
# fold log2(e) into the one scale multiply the kernel already does on the
# [bq, bk] score tile and call exp2 directly; the online-softmax max/sum
# run in the base-2 domain and finalize converts the stored lse back to
# natural log (external consumers — bwd recompute, ragged LSE-merge — keep
# natural-domain semantics).
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453

# Set DPIPE_PALLAS_INTERPRET=1 to run kernels in the Pallas interpreter
# (slow, but lets the CPU test suite exercise the real kernel code path).
def _interpret() -> bool:
    import os

    return os.environ.get("DPIPE_PALLAS_INTERPRET", "0") == "1"


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref, k_ref, v_ref, kvmask_ref,
    o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, num_k_blocks: int,
):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]  # [bq, d]
    k = k_ref[0, 0]  # [bk, d]
    v = v_ref[0, 0]  # [bk, d]

    # q arrives PRE-SCALED by scale*log2(e) (folded once outside the
    # kernel, O(S*d)), so s lands directly in the base-2 domain without a
    # per-tile [bq, bk] VPU multiply.
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    if kvmask_ref is not None:
        kvm = kvmask_ref[0, 0, :]  # [bk] int32; >0 means valid key
        s = jnp.where((kvm > 0)[None, :], s, DEFAULT_MASK_VALUE)

    m_prev = m_scr[:, 0:1]  # [bq, 1]
    l_prev = l_scr[:, 0:1]
    m_cur = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)  # [bq, 1]
    p = jnp.exp2(s - m_new)  # [bq, bk] f32
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, d]
    acc_scr[:] = acc_scr[:] * alpha + pv

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        l_fin = l_scr[:, 0:1]
        m_fin = m_scr[:, 0:1]
        # All-masked rows have l == 0; emit zeros there instead of inf/nan.
        safe_l = jnp.where(l_fin > 0.0, l_fin, 1.0)
        o_ref[0, 0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)
        # natural-domain lse: m is base-2, l is a plain probability sum
        lse = jnp.where(
            l_fin > 0.0, m_fin * LN2 + jnp.log(safe_l), DEFAULT_MASK_VALUE
        )  # [bq, 1]
        lse_ref[0, 0] = lse


def _prescale_q(q, scale):
    """Fold scale*log2(e) into q once (O(S*d)) so no kernel pays a
    per-tile [bq, bk] multiply. bf16 re-rounding of q is the same error
    class the score multiply had."""
    return (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)


def _flash_forward(q, k, v, kvmask, scale, block_q, block_k):
    q = _prescale_q(q, scale)
    batch, heads, sq, d = q.shape
    skv = k.shape[2]
    assert sq % block_q == 0 and skv % block_k == 0, (
        f"sequence ({sq}, {skv}) must divide blocks ({block_q}, {block_k}); "
        "use ops.attention.dot_product_attention for arbitrary lengths"
    )
    nq = sq // block_q
    nk = skv // block_k

    grid = (batch, heads, nq, nk)

    def q_map(b, h, i, j):
        return (b, h, i, 0)

    def kv_map(b, h, i, j):
        return (b, h, j, 0)

    def o_map(b, h, i, j):
        return (b, h, i, 0)

    def lse_map(b, h, i, j):
        return (b, h, i, 0)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), q_map),
        pl.BlockSpec((1, 1, block_k, d), kv_map),
        pl.BlockSpec((1, 1, block_k, d), kv_map),
    ]
    args = [q, k, v]
    if kvmask is not None:
        # [B, SUBLANES, Skv] int32 (row-replicated for sublane tiling)
        in_specs.append(
            pl.BlockSpec((1, SUBLANES, block_k), lambda b, h, i, j: (b, 0, j))
        )
        args.append(kvmask)
        kernel = functools.partial(
            _fwd_kernel, scale=scale, num_k_blocks=nk
        )
    else:
        kernel = functools.partial(
            _fwd_kernel_nomask, scale=scale, num_k_blocks=nk
        )

    out_shape = [
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((batch, heads, sq, 1), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, block_q, d), o_map),
        pl.BlockSpec((1, 1, block_q, 1), lse_map),
    ]
    scratch_shapes = [
        pltpu.VMEM((block_q, LANES), jnp.float32),
        pltpu.VMEM((block_q, LANES), jnp.float32),
        pltpu.VMEM((block_q, d), jnp.float32),
    ]
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * heads * sq * skv * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=batch * heads * sq * skv,
        ),
    )(*args)
    return o, lse


def _fwd_kernel_nomask(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr,
                       acc_scr, *, scale, num_k_blocks):
    _fwd_kernel(
        q_ref, k_ref, v_ref, None, o_ref, lse_ref, m_scr, l_scr, acc_scr,
        scale=scale, num_k_blocks=num_k_blocks,
    )


# ---------------------------------------------------------------------------
# Backward kernels (recompute p from q,k + stored lse)
# ---------------------------------------------------------------------------


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, kvmask_ref,
    dq_ref, dq_scr,
    *, scale: float, num_k_blocks: int,
):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0]  # [bq, 1]
    di = di_ref[0, 0]

    # q pre-scaled by scale*log2(e): s is already base-2
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if kvmask_ref is not None:
        kvm = kvmask_ref[0, 0, :]
        s = jnp.where((kvm > 0)[None, :], s, DEFAULT_MASK_VALUE)
    p = jnp.exp2(s - lse * LOG2E)  # [bq, bk]; lse scale is [bq,1]-cheap

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    ds = p * (dp - di) * scale
    dq_scr[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _dq_kernel_nomask(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref,
                      dq_scr, *, scale, num_k_blocks):
    _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, None, dq_ref,
               dq_scr, scale=scale, num_k_blocks=num_k_blocks)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, kvmask_ref,
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, scale: float, num_q_blocks: int,
):
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0]  # [bq, d]
    k = k_ref[0, 0]  # [bk, d]
    v = v_ref[0, 0]
    do = do_ref[0, 0]  # [bq, d]
    lse = lse_ref[0, 0]  # [bq, 1]
    di = di_ref[0, 0]

    # q pre-scaled by scale*log2(e): s is already base-2
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    if kvmask_ref is not None:
        kvm = kvmask_ref[0, 0, :]
        s = jnp.where((kvm > 0)[None, :], s, DEFAULT_MASK_VALUE)
    p = jnp.exp2(s - lse * LOG2E)  # [bq, bk]

    # dV += P^T @ dO
    dv_scr[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dS = P * (dP - D);  dP = dO @ V^T
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dK += dS^T @ Q — q in VMEM is scale*log2(e)-scaled, so the exact
    # dS factor `scale` becomes scale / (scale*log2(e)) = ln(2)
    ds = p * (dp - di) * LN2  # [bq, bk]
    dk_scr[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == num_q_blocks - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _dkv_kernel_nomask(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref,
                       dv_ref, dk_scr, dv_scr, *, scale, num_q_blocks):
    _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, None, dk_ref,
                dv_ref, dk_scr, dv_scr, scale=scale, num_q_blocks=num_q_blocks)


def _flash_backward(q, k, v, kvmask, o, lse, do, scale, block_q, block_k):
    q = _prescale_q(q, scale)
    batch, heads, sq, d = q.shape
    skv = k.shape[2]
    assert sq % block_q == 0 and skv % block_k == 0
    nq = sq // block_q
    nk = skv // block_k

    # D_i = rowsum(dO * O) as [B, H, Sq, 1]. Cheap elementwise -> plain XLA.
    di = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )

    q_map = lambda b, h, i, j: (b, h, i, 0)
    kv_map = lambda b, h, i, j: (b, h, j, 0)
    lse_map = lambda b, h, i, j: (b, h, i, 0)

    # --- dQ: grid over q blocks (parallel), k blocks innermost (contracted)
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), q_map),
        pl.BlockSpec((1, 1, block_k, d), kv_map),
        pl.BlockSpec((1, 1, block_k, d), kv_map),
        pl.BlockSpec((1, 1, block_q, d), q_map),
        pl.BlockSpec((1, 1, block_q, 1), lse_map),
        pl.BlockSpec((1, 1, block_q, 1), lse_map),
    ]
    args = [q, k, v, do, lse, di]
    if kvmask is not None:
        in_specs.append(
            pl.BlockSpec((1, SUBLANES, block_k), lambda b, h, i, j: (b, 0, j))
        )
        args.append(kvmask)
        dq_kern = functools.partial(_dq_kernel, scale=scale, num_k_blocks=nk)
    else:
        dq_kern = functools.partial(
            _dq_kernel_nomask, scale=scale, num_k_blocks=nk
        )

    dq = pl.pallas_call(
        dq_kern,
        grid=(batch, heads, nq, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, d), q_map),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*args)

    # --- dK/dV: grid over kv blocks (parallel), q blocks innermost
    kv_map2 = lambda b, h, i, j: (b, h, i, 0)
    q_map2 = lambda b, h, i, j: (b, h, j, 0)
    lse_map2 = lambda b, h, i, j: (b, h, j, 0)
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), q_map2),
        pl.BlockSpec((1, 1, block_k, d), kv_map2),
        pl.BlockSpec((1, 1, block_k, d), kv_map2),
        pl.BlockSpec((1, 1, block_q, d), q_map2),
        pl.BlockSpec((1, 1, block_q, 1), lse_map2),
        pl.BlockSpec((1, 1, block_q, 1), lse_map2),
    ]
    args = [q, k, v, do, lse, di]
    if kvmask is not None:
        in_specs.append(
            pl.BlockSpec((1, SUBLANES, block_k), lambda b, h, i, j: (b, 0, i))
        )
        args.append(kvmask)
        dkv_kern = functools.partial(_dkv_kernel, scale=scale, num_q_blocks=nq)
    else:
        dkv_kern = functools.partial(
            _dkv_kernel_nomask, scale=scale, num_q_blocks=nq
        )

    dk, dv = pl.pallas_call(
        dkv_kern,
        grid=(batch, heads, nk, nq),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), kv_map2),
            pl.BlockSpec((1, 1, block_k, d), kv_map2),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*args)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public entry point with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 2048,
    tail_len: Optional[int] = None,
) -> jax.Array:
    """Blockwise flash attention on TPU.

    Args:
      q: [B, H, Sq, D]; k, v: [B, H, Skv, D]. D must be a multiple of 128
        and sequence lengths multiples of the block sizes (the dispatcher in
        ops/attention.py pads + masks arbitrary lengths).
      kv_mask: optional [B, Skv] int32/bool; nonzero = valid key position.
      scale: softmax scale, default 1/sqrt(D).
      tail_len: number of VALID keys in the LAST kv block (ragged padding
        to a block multiple); exclusive with kv_mask. Only the last block
        pays any masking cost.
    Returns [B, H, Sq, D] in q.dtype.
    """
    o, _ = _flash_attention_fwd_res(
        q, k, v, kv_mask, scale, block_q, block_k, tail_len
    )
    return o


def _prep_mask(kv_mask):
    if kv_mask is None:
        return None
    m = kv_mask.astype(jnp.int32)
    return jnp.broadcast_to(m[:, None, :], (m.shape[0], SUBLANES, m.shape[1]))


def _split_tail(k, block_k, tail_len):
    """Static split point: the ragged region is the final kv block."""
    skv = k.shape[2]
    main = skv - block_k
    assert 0 < tail_len <= block_k and main % block_k == 0 and main > 0
    return main


def _tail_mask_tensor(batch, block_k, tail_len):
    idx = jnp.arange(block_k)[None, :]
    return jnp.broadcast_to(idx < tail_len, (batch, block_k)).astype(jnp.int32)


def _name_out(o, lse):
    """checkpoint_name the kernel outputs so selective-remat policies can
    save them: under `activation_checkpointing = "attn"` (policy
    save_only_these_names('flash_out'), models/layers.py) the backward
    replay skips re-running the forward kernel entirely — o and lse are the
    only fwd products its vjp consumes."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(o, "flash_out"), checkpoint_name(lse, "flash_out")


def _flash_attention_fwd_res(q, k, v, kv_mask, scale, block_q, block_k,
                             tail_len=None):
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    block_q = min(block_q, q.shape[2])
    block_k = min(block_k, k.shape[2])
    if tail_len is not None and k.shape[2] <= block_k:
        # single-block sequence: masked kernel over one block is cheap; the
        # synthetic mask stays OUT of the residuals (primal kv_mask is None
        # and _flash_attention_bwd rebuilds it from tail_len)
        tmask = _prep_mask(
            _tail_mask_tensor(q.shape[0], k.shape[2], tail_len)
        )
        o, lse = _name_out(*_flash_forward(
            q, k, v, tmask, scale, block_q, block_k))
        return o, (q, k, v, kv_mask, o, lse)
    if tail_len is not None and tail_len < k.shape[2]:
        # Ragged lengths: run the hot MASKLESS kernel over the full-block
        # prefix and a single masked block over the padded tail, then merge
        # the two partial softmaxes by logsumexp. The per-tile jnp.where of
        # the masked kernel (2.6x slowdown) is thus paid only on one tail
        # block instead of the whole sequence.
        main = _split_tail(k, block_k, tail_len)
        o1, lse1 = _flash_forward(
            q, k[:, :, :main], v[:, :, :main], None, scale, block_q, block_k
        )
        tmask = _prep_mask(_tail_mask_tensor(q.shape[0], block_k, tail_len))
        o2, lse2 = _flash_forward(
            q, k[:, :, main:], v[:, :, main:], tmask, scale, block_q, block_k
        )
        m = jnp.maximum(lse1, lse2)
        w1 = jnp.exp(lse1 - m)
        w2 = jnp.exp(lse2 - m)
        l = w1 + w2
        o = ((w1 * o1.astype(jnp.float32) + w2 * o2.astype(jnp.float32)) / l
             ).astype(q.dtype)
        lse = m + jnp.log(l)
        o, lse = _name_out(o, lse)
        return o, (q, k, v, kv_mask, o, lse)
    mask3 = _prep_mask(kv_mask)
    o, lse = _name_out(*_flash_forward(q, k, v, mask3, scale, block_q,
                                       block_k))
    return o, (q, k, v, kv_mask, o, lse)


def _flash_attention_fwd(q, k, v, kv_mask, scale, block_q, block_k,
                         tail_len=None):
    return _flash_attention_fwd_res(
        q, k, v, kv_mask, scale, block_q, block_k, tail_len
    )


def _flash_attention_bwd(scale, block_q, block_k, tail_len, res, do):
    q, k, v, kv_mask, o, lse = res
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    block_q = min(block_q, q.shape[2])
    block_k = min(block_k, k.shape[2])
    if tail_len is not None and k.shape[2] <= block_k:
        # single ragged block: masked kernel, but the PRIMAL kv_mask slot
        # stays None for the cotangent structure
        tmask = _prep_mask(_tail_mask_tensor(q.shape[0], k.shape[2], tail_len))
        dq, dk, dv = _flash_backward(
            q, k, v, tmask, o, lse, do, scale, block_q, block_k
        )
        return dq, dk, dv, None
    if tail_len is not None and tail_len < k.shape[2]:
        # Each part's backward against the MERGED lse partitions the exact
        # global-softmax gradient: p = exp(s - lse_global) per block set.
        main = _split_tail(k, block_k, tail_len)
        dq1, dk1, dv1 = _flash_backward(
            q, k[:, :, :main], v[:, :, :main], None, o, lse, do, scale,
            block_q, block_k,
        )
        tmask = _prep_mask(_tail_mask_tensor(q.shape[0], block_k, tail_len))
        dq2, dk2, dv2 = _flash_backward(
            q, k[:, :, main:], v[:, :, main:], tmask, o, lse, do, scale,
            block_q, block_k,
        )
        dq = dq1 + dq2
        dk = jnp.concatenate([dk1, dk2], axis=2)
        dv = jnp.concatenate([dv1, dv2], axis=2)
        return dq, dk, dv, None
    mask3 = _prep_mask(kv_mask)
    dq, dk, dv = _flash_backward(
        q, k, v, mask3, o, lse, do, scale, block_q, block_k
    )
    if kv_mask is None:
        mask_ct = None
    else:
        # Integer mask gets a float0 cotangent (jax custom_vjp convention).
        import numpy as np

        mask_ct = np.zeros(kv_mask.shape, jax.dtypes.float0)
    return dq, dk, dv, mask_ct


flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)
