"""Attention dispatcher: Pallas flash kernel on TPU, XLA elsewhere.

Single entry point replacing both of the reference's attention paths
(torch SDPA everywhere + flash-attn varlen in models/wan/attention.py:19-127).
Layout is [B, S, H, D] like jax.nn.dot_product_attention; arbitrary sequence
lengths are padded up to TPU block multiples with the padding masked out,
which is the dense-TPU analogue of CUDA varlen (cu_seqlens) packing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..common import round_up_to_multiple
from .flash_attention import LANES, flash_attention

# Below this many query tokens the plain XLA path is at least as fast as the
# kernel launch + padding overhead.
_MIN_SEQ_FOR_FLASH = 1024


def _use_flash(q, k) -> bool:
    platform = jax.devices()[0].platform if jax.devices() else "cpu"
    if platform not in ("tpu", "axon"):
        return False
    d = q.shape[-1]
    if d % LANES != 0:
        return False
    return q.shape[1] >= _MIN_SEQ_FOR_FLASH


def _pick_block(s: int, pref: int, min_divisor: int = 1024) -> int:
    """Largest multiple of LANES <= pref that divides s (so the kernel runs
    the unmasked, unpadded path), preferring multiples of 512 — MXU-tile-
    friendly blocks measurably beat larger non-512-multiples (21504-token
    wan self-attention: block_k 1536 runs 128.6 TFLOP/s fwd vs 115 for
    1792 with the pre-scaled-Q kernel).
    A too-small divisor costs more in per-block online-softmax bookkeeping
    than ragged-tail padding does (e.g. 18900 tokens: divisor 512 runs at
    63 TFLOP/s vs ~100 for 2048 blocks + tail_len), so below min_divisor we
    fall back to the preferred block and let the dispatcher pad + tail-mask
    the last block."""
    best = 0
    best512 = 0
    top = min(s, pref)
    for m in range(LANES, top + 1, LANES):
        if s % m == 0:
            best = m
            if m % 512 == 0:
                best512 = m
    cand = best512 if best512 >= min_divisor else best
    if cand and (cand >= min_divisor or cand == top):
        return cand
    return min(pref, round_up_to_multiple(s, LANES))


def _xla_attention(q, k, v, kv_mask, scale):
    """Reference XLA implementation, [B, S, H, D] layout, f32 softmax."""
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if kv_mask is not None:
        neg = jnp.asarray(-0.7 * jnp.finfo(jnp.float32).max, jnp.float32)
        logits = jnp.where(
            (kv_mask > 0)[:, None, None, :], logits, neg
        )
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v
    ).astype(q.dtype)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    force_flash: Optional[bool] = None,
) -> jax.Array:
    """Scaled dot-product attention.

    Args:
      q: [B, Sq, H, D]; k, v: [B, Skv, H, D].
      kv_mask: optional [B, Skv], nonzero = valid key/value position
        (text-padding masking; reference models/qwen_image.py:77-174 and
        models/wan/attention.py varlen semantics).
      scale: defaults to D**-0.5.
      force_flash: override the TPU/size heuristic (for tests).
    """
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    use_flash = _use_flash(q, k) if force_flash is None else force_flash
    if not use_flash:
        return _xla_attention(q, k, v, kv_mask, scale)

    b, sq, h, d = q.shape
    skv = k.shape[1]
    # Kernel layout is [B, H, S, D].
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)

    # Large K blocks amortize the per-block online-softmax bookkeeping
    # against MXU work (52 -> 103+ TFLOP/s forward vs small blocks);
    # multiple-of-512 blocks and block_q up to 1024 measured best on v5e
    # (21504-token wan self-attention with scale*log2e pre-folded into q:
    # (1024, 1536) = 128.6 TFLOP/s fwd / 125.9 effective fwd+bwd; larger
    # blocks OOM the 16M scoped VMEM in backward). When the lengths
    # don't divide the preferred
    # blocks, prefer DIVISOR blocks over pad+mask: the masked kernel runs
    # ~2.6x slower (jnp.where on every [bq, bk] tile breaks the MXU
    # pipeline; measured 38 vs 100+ TFLOP/s).
    block_q = _pick_block(sq, 1024, min_divisor=256)
    block_k = _pick_block(skv, 2048)
    # The dkv backward kernel materializes several [bq, bk] f32 tiles in
    # scoped VMEM (16M on v5e). (1024, 1536) is the largest measured-safe
    # product; a fallback pick like (1024, 1920) for s=1900 blows the
    # stack by ~0.5M at compile time. Shrink block_q (cheapest axis: q
    # tiles are streamed, k/v stay resident) until the product fits.
    while block_q > LANES and block_q * block_k > 1024 * 1536:
        block_q //= 2
    sq_pad = round_up_to_multiple(sq, block_q)
    skv_pad = round_up_to_multiple(skv, block_k)

    if sq_pad != sq:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
    tail_len = None
    if kv_mask is not None:
        kv_mask = jnp.pad(
            kv_mask.astype(jnp.int32), ((0, 0), (0, skv_pad - skv))
        )
    elif skv_pad != skv:
        # ragged tail: only the LAST kv block carries padded keys, masked
        # in-kernel by tail_len — the full mask tensor path costs ~2.6x
        tail_len = skv - (skv_pad // block_k - 1) * block_k
    if skv_pad != skv:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, skv_pad - skv), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, skv_pad - skv), (0, 0)))

    out = flash_attention(
        qt, kt, vt, kv_mask, scale, block_q, block_k, tail_len
    )
    if sq_pad != sq:
        out = out[:, :, :sq, :]
    return jnp.swapaxes(out, 1, 2)
