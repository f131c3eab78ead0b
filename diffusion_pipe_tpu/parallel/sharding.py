"""Parameter/batch sharding rules over the ('data','stage','tensor') mesh.

The models attach PartitionSpec metadata to tensor-parallel kernels via
nn.with_partitioning (axis name 'tensor'); nn.get_partition_spec turns the
param tree into specs, and everything without metadata is replicated. Batch
tensors shard their leading dim over 'data'.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_params_sharding(mesh: Mesh, params: Any):
    """Pytree of NamedSharding for a (possibly Partitioned-annotated) param
    tree. Leaves without metadata are replicated. Axis names that are not
    mesh axes (e.g. the scan-stacked 'layers' axis) are treated as
    replicated here — the pipeline shards the layer axis itself at
    shard_map dispatch (flux_pp.py)."""
    specs = nn.get_partition_spec(params)

    def to_sharding(spec):
        cleaned = P(*(ax if ax in mesh.axis_names else None for ax in spec))
        return NamedSharding(mesh, cleaned)

    return jax.tree.map(
        to_sharding, specs, is_leaf=lambda x: isinstance(x, P)
    )


def shard_params(mesh: Mesh, params: Any):
    """Device_put the param tree according to its metadata.

    Returns the tree UNBOXED (raw arrays, no Partitioned wrappers): under an
    active mesh, flax would re-apply boxed constraints at every `apply`, and
    the stale scan-axis name 'layers' is not a mesh axis.
    """
    shardings = get_params_sharding(mesh, params)
    return jax.device_put(nn.unbox(params), shardings)


def batch_sharding(mesh: Mesh, leading_microbatch_axis: bool = False):
    if leading_microbatch_axis:
        return NamedSharding(mesh, P(None, "data"))
    return NamedSharding(mesh, P("data"))


def zero1_opt_state_sharding(mesh: Mesh, opt_state: Any):
    """ZeRO-1-style optimizer-state sharding (`optimizer.state_sharding`).

    The reference replicates optimizer state per DP rank (its DeepSpeed
    pipeline engine excludes ZeRO, SURVEY.md section 2.7); on TPU the
    sharded variant comes nearly free under GSPMD: give every moment-like
    leaf a NamedSharding with the first evenly-divisible (and not already
    sharded) axis partitioned over 'data', and XLA turns the optimizer
    update into reduce-scatter + sharded-update + all-gather on its own.
    Scalars / tiny leaves (step counts) stay replicated; existing 'tensor'
    sharding on TP kernel moments is preserved.
    """
    n = int(mesh.shape.get("data", 1))

    def shard_of(x):
        cur = (
            x.sharding.spec
            if isinstance(getattr(x, "sharding", None), NamedSharding)
            else P()
        )
        # optimizer.type="offload" pins state leaves to pinned_host BEFORE
        # this runs; re-sharding must not silently move them back to HBM
        # (round-4 advisor) — carry the memory kind into the new sharding
        kind = getattr(getattr(x, "sharding", None), "memory_kind", None)

        def named(spec):
            s = NamedSharding(mesh, spec)
            return s.with_memory_kind(kind) if kind == "pinned_host" else s

        if n <= 1 or not hasattr(x, "ndim") or x.ndim == 0 or x.size < 2 * n:
            return named(cur)
        spec = list(cur) + [None] * (x.ndim - len(cur))
        for i in range(x.ndim):
            if spec[i] is None and x.shape[i] % n == 0:
                spec[i] = "data"
                break
        return named(P(*spec))

    return jax.tree.map(shard_of, opt_state)
