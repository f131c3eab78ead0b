"""Host-RAM parameter offloading: the TPU analogue of block swap.

Reference utils/offloading.py keeps the deepest `blocks_to_swap` transformer
blocks' non-LoRA weights in CPU RAM and swaps them over a CUDA stream ahead
of compute (SURVEY.md section 5.9). The TPU-native equivalent:

- offloaded block stacks live in host memory (`jax.memory.Space.Host`);
- the scanned block module is wrapped with `nn.map_variables` whose
  trans_in_fn device_puts the CURRENT iteration's param slice to device
  memory — inside `lax.scan`, XLA's latency-hiding scheduler overlaps the
  per-block host->HBM copy with the previous block's compute (the double
  buffering the reference implements by hand with streams and events);
- ALL leaves of an offloaded stack move host-side — the TPU runtime rejects
  mixed host/device inputs within one lax.scan, so unlike the reference's
  'lora stays on GPU' rule (offloading.py:54-61) the (tiny) LoRA factors of
  an offloaded stack live host-side too; their per-step optimizer transfer
  is negligible.

Granularity: wan, flux, and qwen_image honor the exact reference dial.
wan moves the DEEPEST N blocks to a separate "blocks_swap" scan that
streams from host while the first num_layers-N stay HBM-resident
(WanConfig.offload_tail / swap_split; reference utils/offloading.py:184
swaps exactly N); flux applies the reference's N//2-double /
(N-N//2)*2+1-single split (models/flux.py:404-418, flux.py exact_n);
qwen_image streams its deepest N (models/qwen_image.py). Other
single-stack families stream their whole "blocks" stack. An offload
request that matches no stack raises (see offload_param_stacks).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import traverse_util


# Sub-32-bit host DMA is broken in the axon PJRT runtime (bf16/fp8/int8
# host-resident scan inputs crash compile or execution; float32 streams
# fine at ~8 GB/s). Workaround: host copies of narrow-dtype leaves are
# BIT-PACKED into uint32 and unpacked on device right after the per-block
# transfer. The logical dtype/shape is encoded STATICALLY in the storage
# key name so the unpacking trans_in_fn needs no side-channel:
#   {"kernel": bf16[a, b]}  ->  {"kernel": {"__packed__|bfloat16|a,b|p":
#                                           uint32[..., ceil(a*b/2)]}}
# (p = pad elements added to fill the last word).
_PACK_TAG = "__packed__"


def _pack_key(dtype, shape, pad) -> str:
    dims = ",".join(str(d) for d in shape)
    return f"{_PACK_TAG}|{jnp.dtype(dtype).name}|{dims}|{pad}"


def _parse_pack_key(key: str):
    _, dtype, dims, pad = key.split("|")
    shape = tuple(int(d) for d in dims.split(",")) if dims else ()
    return jnp.dtype(dtype), shape, int(pad)


def _pack_leaf(x, lead_axes: int):
    """x [lead..., rest...] -> uint32 [lead..., packed] preserving the
    leading (scan-stacked) axes; returns (packed, key) or (x, None) when
    packing is unnecessary (>=4-byte dtypes). numpy inputs (host-side
    init/load paths — a 28 GB wan-14B stack must never touch HBM) are
    packed with numpy and stay host-resident."""
    import numpy as np

    itemsize = jnp.dtype(x.dtype).itemsize
    if itemsize >= 4:
        return x, None
    ratio = 4 // itemsize
    lead = x.shape[:lead_axes]
    rest = x.shape[lead_axes:]
    n = 1
    for d in rest:
        n *= d
    pad = (-n) % ratio
    if isinstance(x, np.ndarray):
        flat = np.reshape(x, lead + (n,))
        if pad:
            flat = np.concatenate(
                [flat, np.zeros(lead + (pad,), x.dtype)], axis=-1
            )
        words = np.ascontiguousarray(
            np.reshape(flat, lead + ((n + pad) // ratio, ratio))
        ).view(np.uint32).reshape(lead + ((n + pad) // ratio,))
        return words, _pack_key(x.dtype, rest, pad)
    flat = jnp.reshape(x, lead + (n,))
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros(lead + (pad,), x.dtype)], axis=-1
        )
    words = jax.lax.bitcast_convert_type(
        jnp.reshape(flat, lead + ((n + pad) // ratio, ratio)), jnp.uint32
    )
    return words, _pack_key(x.dtype, rest, pad)


def _unpack_leaf(words, key: str):
    """Inverse of _pack_leaf for a PER-BLOCK slice (leading axes consumed
    by the scan): uint32 [packed] -> dtype [rest...]."""
    dtype, rest, pad = _parse_pack_key(key)
    flat = jax.lax.bitcast_convert_type(words, dtype).reshape(-1)
    if pad:
        flat = flat[: flat.shape[0] - pad]
    return flat.reshape(rest)


def _unpack_tree(tree):
    """Storage format -> logical format, device-resident."""
    if isinstance(tree, dict):
        if len(tree) == 1:
            (k, v), = tree.items()
            if isinstance(k, str) and k.startswith(_PACK_TAG):
                return _unpack_leaf(
                    jax.device_put(v, jax.memory.Space.Device), k
                )
        return {k: _unpack_tree(v) for k, v in tree.items()}
    return jax.tree.map(
        lambda x: jax.device_put(x, jax.memory.Space.Device), tree
    )


def stream_params_from_host(block_cls):
    """Wrap a (to-be-scanned) block module so its params are copied to
    device memory at use time (unpacking uint32-packed narrow dtypes).
    No-op for already-device-resident params and on backends without a
    distinct host memory space (CPU)."""

    def to_device(tree):
        if jax.default_backend() == "cpu":
            return tree
        return _unpack_tree(tree)

    return nn.map_variables(
        block_cls, "params", trans_in_fn=to_device,
        trans_out_fn=lambda x: x, init=True,
    )


def offload_param_stacks(tree: Any, stack_names: Sequence[str],
                         lead_axes: int = 1):
    """Move param leaves under the named block stacks to host memory,
    bit-packing sub-32-bit dtypes (see _PACK_TAG note above).

    Apply to the FROZEN partition only — the reference's block swap
    likewise keeps optimizer-stepped (LoRA) params on the accelerator
    (utils/offloading.py:54-61), and the packed storage is not
    differentiable. None leaves preserved. No-op on backends without a
    distinct host memory space (CPU), where host-annotated avals would
    poison downstream dot_generals.
    """
    if not stack_names or jax.default_backend() == "cpu":
        return tree
    from flax.core import meta

    flat = traverse_util.flatten_dict(tree)
    matched = {
        name for name in stack_names
        if any(v is not None and name in k for k, v in flat.items())
    }
    if matched != set(stack_names):
        # A family whose block collection has a different name would
        # otherwise silently offload nothing and OOM later with no clue
        # (round-2 advisor finding): blocks_to_swap was configured, so an
        # unmatched stack name is a wiring bug, not a preference.
        raise ValueError(
            f"blocks_to_swap: no parameters matched stack name(s) "
            f"{sorted(set(stack_names) - matched)}; param tree has "
            f"top-level keys {sorted({k[0] for k in flat})}"
        )
    out = {}
    for k, v in flat.items():
        if v is not None and any(name in k for name in stack_names):
            boxed = isinstance(v, meta.AxisMetadata)
            arr = v.unbox() if boxed else v
            packed, key = _pack_leaf(arr, lead_axes)
            packed = jax.device_put(packed, jax.memory.Space.Host)
            if key is not None:
                # sharding metadata does not survive packing; host-resident
                # single-buffer storage has no use for it anyway
                out[k + (key,)] = packed
                continue
            v = v.replace_boxed(packed) if boxed else packed
        out[k] = v
    return traverse_util.unflatten_dict(out)


# backwards-compatible alias
offload_frozen_stacks = offload_param_stacks


# --- one-block-ahead prefetch streaming ------------------------------------
#
# The map_variables/nn.scan streaming above copies each block's params at
# USE time: inside one scan iteration the program is [copy block i ->
# compute block i], and the compute's data dependency on the copy puts the
# whole transfer latency on the critical path every iteration. Measured on
# the axon v5e runtime (stream 181 ms + compute 470 ms of synthetic work
# per 8-block scan): use-time = 913 ms vs 650 ms for back-to-back
# stream+compute — ~40% pure dependency-stall overhead. Issuing the NEXT
# block's copy while the CURRENT block computes (the reference's
# double-buffered CUDA-stream scheme, utils/offloading.py:69-87) removes
# the stall exactly: 662 ms measured. prefetch_stream_scan implements that
# schedule for BOTH directions with a custom VJP:
#   fwd scan carry holds block i's (storage-format, device-resident) param
#     slice; the body device_puts slice i+1 — independent of the compute —
#     then applies the block;
#   bwd scan walks blocks L-1..0 re-streaming the same slices with the
#     symmetric one-ahead (i-1) prefetch and differentiates one block per
#     step via jax.vjp (block forward recomputed — remat-"full" for the
#     streamed stack; saved residual per block is just its input x).
# Storage-format slices stay bit-packed across the transfer; the uint32
# decode happens on device inside the block apply, so packed (frozen)
# leaves are integer inputs to the VJP and get free float0 cotangents.


def _slice_block(storage, i):
    """Row i of every stacked leaf of a storage-format tree (traced i).

    keepdims=True on purpose: slicing host-resident leaves with an
    immediate squeeze makes the TPU backend fold the squeeze into the
    host->HBM copy, which its post-layout bitcast canonicalization
    miscompiles on sub-tile shapes ("Bitcast cannot have different shape
    sizes"). The leading unit axis is dropped on-device in apply_one."""
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=True),
        storage,
    )


def _squeeze_block(tree):
    """Drop the leading unit axis _slice_block kept (device-side)."""
    return jax.tree.map(lambda a: jax.lax.squeeze(a, (0,)), tree)


def _move_to_device(tree, move: bool):
    """device_put every leaf of a PER-BLOCK storage slice (no decode —
    packed leaves transfer as uint32). move=False (CPU tests) = identity."""
    if not move:
        return tree
    return jax.tree.map(
        lambda x: jax.device_put(x, jax.memory.Space.Device), tree
    )


def _decode_block(tree):
    """Storage-format per-block slice (device) -> logical params: unpack
    bit-packed leaves in place. Pure on-device bitcast/reshape, no
    transfers — safe (and recomputed for free) inside the backward."""
    if isinstance(tree, dict):
        if len(tree) == 1:
            (k, v), = tree.items()
            if isinstance(k, str) and k.startswith(_PACK_TAG):
                return _unpack_leaf(v, k)
        return {k: _decode_block(v) for k, v in tree.items()}
    return tree


def prefetch_stream_scan(block, storage, x, broadcast, length: int,
                         move: bool = True, grad_leaves=None):
    """Scan a detached `block` module over `length` host-resident blocks
    with one-block-ahead host->HBM prefetch (see note above).

    block:     nn.Module instance created with parent=None; its __call__
               must follow the nn.scan body convention
               (x, *broadcast) -> (x, _) and use no rngs (dropout off).
               x may be any pytree (e.g. flux's (img, txt) carry);
               integer broadcast operands (attention masks) are fine and
               get float0 cotangents.
    storage:   stacked storage-format param tree (leading axis = block),
               as produced by init + offload_param_stacks.
    broadcast: tuple of per-call constants handed to every block.
    grad_leaves: optional collection of LAST key-component names (e.g.
               ("lora_a", "lora_b")) whose leaves are the only trainable
               params in the stack; grads for the rest come back as
               broadcast-zeros that XLA folds away. None = real grads for
               every inexact leaf (full fine-tuning of a streamed stack).
    Returns the final carry x. Differentiable wrt storage/x/broadcast.
    ALL cotangents come back DEVICE-resident: the train step's optimizer
    path runs on device over the trainable partition (trainer.py), and
    the only host-resident storage leaves are the FROZEN ones
    (offload_param_stacks is applied to the frozen partition only), whose
    cotangents jax.grad discards — pinning them host-side would add a
    pointless HBM->host round-trip per trainable grad (round-4 advisor).
    """

    def apply_one(cur, xc, bc):
        p = _decode_block(_squeeze_block(cur))
        y, _ = block.apply({"params": p}, xc, *bc)
        return y

    def fwd_scan(sto, x0, bc):
        def body(carry, _):
            xc, cur, i = carry
            nxt = _move_to_device(
                _slice_block(sto, jnp.minimum(i + 1, length - 1)), move)
            y = apply_one(cur, xc, bc)
            return (y, nxt, i + 1), xc
        cur0 = _move_to_device(_slice_block(sto, 0), move)
        (y, _, _), xs = jax.lax.scan(
            body, (x0, cur0, jnp.int32(0)), None, length=length)
        return y, xs

    import numpy as np
    from jax import dtypes as jax_dtypes

    @jax.custom_vjp
    def run(sto, x0, bc):
        return fwd_scan(sto, x0, bc)[0]

    def run_fwd(sto, x0, bc):
        y, xs = fwd_scan(sto, x0, bc)
        return y, (sto, xs, bc)

    def run_bwd(res, gy):
        sto, xs, bc = res
        # f32 accumulators for the broadcast cotangents (the bf16 rope/ctx
        # trees would otherwise round on every one of `length` adds);
        # integer broadcast operands (attention masks) accumulate nothing
        # and return float0 cotangents like any int primal
        def acc0(a):
            if jnp.issubdtype(a.dtype, jnp.inexact):
                return jnp.zeros(a.shape, jnp.float32)
            return jnp.zeros((), jnp.float32)  # placeholder, unused

        gbc0 = jax.tree.map(acc0, bc)

        def emit_grad(key, leaf):
            # packed frozen leaves are integer primals -> float0 (which
            # lax.scan cannot stack, so they are never emitted); inexact
            # leaves outside grad_leaves are known-frozen -> skip their
            # (full [L, ...]-stacked!) grads and return broadcast-zeros
            if not jnp.issubdtype(leaf.dtype, jnp.inexact):
                return False
            return grad_leaves is None or key[-1] in grad_leaves

        def body(carry, x_in):
            gx, cur, i, gbc = carry
            nxt = _move_to_device(
                _slice_block(sto, jnp.maximum(i - 1, 0)), move)
            _, vjp = jax.vjp(apply_one, cur, x_in, bc)
            g_cur, g_x, g_b = vjp(gx)
            gbc = jax.tree.map(
                lambda acc, a, g: (acc + g.astype(jnp.float32))
                if jnp.issubdtype(a.dtype, jnp.inexact) else acc,
                gbc, bc, g_b)
            flat = traverse_util.flatten_dict(g_cur)
            # drop the leading unit axis the keepdims slice introduced so
            # the scan stacks per-block grads back to storage shape
            g_f = {k: jax.lax.squeeze(v, (0,)) for k, v in flat.items()
                   if emit_grad(k, v)}
            return (g_x, nxt, i - 1, gbc), g_f

        curL = _move_to_device(_slice_block(sto, length - 1), move)
        xs_rev = jax.tree.map(lambda a: jnp.flip(a, 0), xs)
        (g_x0, _, _, gbc), g_rev = jax.lax.scan(
            body, (gy, curL, jnp.int32(length - 1), gbc0), xs_rev)

        flat_sto = traverse_util.flatten_dict(sto)
        g_flat = {}
        for k, v in flat_sto.items():
            if k in g_rev:
                g_flat[k] = jnp.flip(g_rev[k], 0)
            elif jnp.issubdtype(jnp.dtype(v.dtype), jnp.inexact):
                # frozen float leaf filtered by grad_leaves: its cotangent
                # is discarded by jax.grad (trainable-only argnums), but
                # custom_vjp requires a dtype/shape-matching value — a
                # broadcasted zero costs no HBM and folds away
                g_flat[k] = jnp.zeros(v.shape, v.dtype)
            else:
                g_flat[k] = np.zeros(v.shape, jax_dtypes.float0)
        g_sto = traverse_util.unflatten_dict(g_flat)

        def bc_grad(a, acc):
            if jnp.issubdtype(a.dtype, jnp.inexact):
                return acc.astype(a.dtype)
            return np.zeros(a.shape, jax_dtypes.float0)

        g_bc = jax.tree.map(bc_grad, bc, gbc)
        return g_sto, g_x0, g_bc

    run.defvjp(run_fwd, run_bwd)
    return run(storage, x, tuple(broadcast))


def _unpack_leaf_np(words, key: str):
    """Host-side inverse of _pack_leaf for a WHOLE stacked leaf:
    uint32 [lead..., packed] -> dtype [lead..., rest...] (numpy)."""
    import numpy as np

    dtype, rest, pad = _parse_pack_key(key)
    w = np.ascontiguousarray(np.asarray(words))
    lead = w.shape[:-1]
    flat = w.view(np.dtype(dtype)).reshape(lead + (-1,))
    if pad:
        flat = flat[..., : flat.shape[-1] - pad]
    return flat.reshape(lead + rest)


def unstream_param_stacks(tree: Any, stack_names: Sequence[str]):
    """Inverse of offload_param_stacks for EVAL: the reference's
    `disable_block_swap_for_eval` moves every swapped block back to the
    accelerator before evaluation (train.py:234,
    utils/offloading.py prepare_block_swap_inference). Here: host-resident
    storage leaves become device-resident logical params (bit-packed
    narrow dtypes unpacked host-side first), and partial-swap
    "<base>_swap" collections fold back into "<base>" (concat on the
    block axis, resident-first — matching the swap_split that took the
    DEEPEST N blocks). None leaves (the other partition's holes) are
    preserved."""
    import numpy as np
    from flax.core import meta

    flat = traverse_util.flatten_dict(tree)
    swap_names = {n for n in stack_names if n.endswith("_swap")}
    final = {}
    swaps = {}
    for k, v in flat.items():
        if isinstance(v, meta.AxisMetadata):
            v = v.unbox()  # eval-only copy; sharding metadata not needed
        in_stack = any(name in k for name in stack_names)
        if in_stack and isinstance(k[-1], str) and \
                k[-1].startswith(_PACK_TAG):
            v = _unpack_leaf_np(v, k[-1])
            k = k[:-1]
        if in_stack and v is not None:
            host = isinstance(v, np.ndarray) or getattr(
                getattr(v, "sharding", None), "memory_kind", None
            ) == "pinned_host"
            if host:
                v = (jax.device_put(np.asarray(v), jax.memory.Space.Device)
                     if jax.default_backend() != "cpu" else jnp.asarray(v))
        si = next((i for i, p in enumerate(k) if p in swap_names), None)
        if si is not None:
            base_k = k[:si] + (k[si][:-len("_swap")],) + k[si + 1:]
            swaps[base_k] = v
        else:
            final[k] = v
    for base_k, sv in swaps.items():
        rv = final.get(base_k)
        if sv is None and rv is None:
            final[base_k] = None
        elif sv is not None and rv is not None:
            final[base_k] = jnp.concatenate(
                [jnp.asarray(rv), jnp.asarray(sv)], axis=0)
        else:
            # both partitions split a stack identically, so a one-sided
            # pair means the leaf exists only in one collection — keep it
            final[base_k] = rv if rv is not None else sv
    return traverse_util.unflatten_dict(final)


def apply_swap_split(carry, split, apply_stack, base="blocks"):
    """Run one block stack under the exact-N blocks_to_swap layout.

    split = (n_res, n_swap) as produced by a config's swap_split; the
    DEEPEST n_swap blocks stream from host in a separate "<base>_swap"
    collection (reference utils/offloading.py:184 swaps exactly N), a full
    swap keeps the single-collection layout, zero swap is a plain scan.
    apply_stack(carry, length, name, streamed) applies `length` blocks
    named `name` and returns the new carry — each family supplies its own
    scan construction (body signature / remat / prefetch differ); the
    split topology lives here once.
    """
    n_res, n_swap = split
    total = n_res + n_swap
    if total and n_swap == total:
        return apply_stack(carry, total, base, True)
    if n_res:
        carry = apply_stack(carry, n_res, base, False)
    if n_swap:
        carry = apply_stack(carry, n_swap, f"{base}_swap", True)
    return carry


def swap_split_of(num_layers: int, tail: int):
    """(resident, swapped) block counts for blocks_to_swap = tail."""
    if tail <= 0 or num_layers <= 0:
        return (num_layers, 0)
    if tail >= num_layers:
        return (0, num_layers)
    return (num_layers - tail, tail)


def swap_stack_names(splits, bases=("blocks",)):
    """host_stack_names for exact-N families: per (split, base) pair the
    streamed collection name, if any."""
    names = []
    for (n_res, n_swap), base in zip(splits, bases):
        if n_swap == 0:
            continue
        names.append(base if n_res == 0 else f"{base}_swap")
    return tuple(names)


def offload_stacks_from_config(config, num_single_layers=0):
    """Map the reference's blocks_to_swap config to stack names for flux-like
    models (doubles+singles) or single-stack models ('blocks')."""
    n = int(config.get("blocks_to_swap", 0) or 0)
    if n <= 0:
        return ()
    if num_single_layers:
        names = ["single_blocks"]
        if n > num_single_layers:
            names.append("double_blocks")
        return tuple(names)
    return ("blocks",)
