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

Granularity note: scan-stacked blocks offload per STACK (e.g. all of flux's
single blocks), not per arbitrary block count; `blocks_to_swap: N` maps to
the nearest stack boundary.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
from flax import traverse_util


def stream_params_from_host(block_cls):
    """Wrap a (to-be-scanned) block module so its params are copied to
    device memory at use time. No-op for already-device-resident params
    and on backends without a distinct host memory space (CPU)."""

    def to_device(tree):
        if jax.default_backend() == "cpu":
            return tree
        return jax.tree.map(
            lambda x: jax.device_put(x, jax.memory.Space.Device), tree
        )

    return nn.map_variables(
        block_cls, "params", trans_in_fn=to_device,
        trans_out_fn=lambda x: x, init=True,
    )


def offload_param_stacks(tree: Any, stack_names: Sequence[str]):
    """Move param leaves under the named block stacks to host memory.

    Apply to BOTH partitions of the train state (scan inputs must share one
    memory space). None leaves preserved. No-op on backends without a
    distinct host memory space (CPU), where host-annotated avals would
    poison downstream dot_generals.
    """
    if not stack_names or jax.default_backend() == "cpu":
        return tree
    flat = traverse_util.flatten_dict(tree)
    out = {}
    for k, v in flat.items():
        if v is not None and any(name in k for name in stack_names):
            v = jax.device_put(v, jax.memory.Space.Host)
        out[k] = v
    return traverse_util.unflatten_dict(out)


# backwards-compatible alias
offload_frozen_stacks = offload_param_stacks


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
