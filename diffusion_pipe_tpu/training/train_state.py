"""Train state + trainable/frozen parameter partitioning.

TPU-native replacement for the reference's requires_grad bookkeeping (PEFT
marks LoRA params trainable, train.py:522-526; per-stage optimizers see only
local trainables). Here the split is a pytree partition by parameter path:
gradients are computed ONLY for the trainable subtree, so frozen base weights
never materialize gradients (memory parity with LoRA training).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import flax
import jax
from flax import traverse_util


def lora_predicate(path: Tuple[str, ...], _leaf) -> bool:
    """Trainable iff the param is an adapter factor (LoraDense lora_a/lora_b
    or LoKr lokr_w1/lokr_w2*)."""
    return any(p.startswith(("lora_", "lokr_")) for p in path)


def full_ft_predicate(path: Tuple[str, ...], _leaf) -> bool:
    return True


def predicate_from_config(config: dict) -> Callable:
    # Anima trains the LLMAdapter alongside the LoRA (reference
    # cosmos_predict2 llm_adapter param group)
    extra = ("llm_adapter",) if config.get("model", {}).get("type") == "anima" \
        else ()
    if "adapter" in config:
        if extra:
            return lambda path, leaf: (
                lora_predicate(path, leaf)
                or any(e in p for e in extra for p in path)
            )
        return lora_predicate
    return full_ft_predicate


def partition_params(params: Any, predicate: Callable):
    """Split a nested params dict into (trainable, frozen) trees.

    Both keep the full structure with None at missing leaves, so
    merge_params is a simple overlay and optax masks line up.
    """
    flat = traverse_util.flatten_dict(flax.core.unfreeze(params))
    trainable = {k: (v if predicate(k, v) else None) for k, v in flat.items()}
    frozen = {k: (None if predicate(k, v) else v) for k, v in flat.items()}
    return (
        traverse_util.unflatten_dict(trainable),
        traverse_util.unflatten_dict(frozen),
    )


def complete_params(pipeline, params: Any, rng) -> Any:
    """Fill leaves the model expects but a converted checkpoint lacks.

    Weight converters return only the pretrained tensors; adapter factors
    (lora_a/lora_b/lokr_*), int8 kernel_scale companions, and trainable
    from-scratch submodules (e.g. Anima's llm_adapter) exist only in the
    flax init. The reference gets this for free because PEFT mutates the
    loaded torch modules in place (models/base.py:216-260); here the missing
    subtree is materialized from pipeline.init_params under jit, where XLA
    dead-code-eliminates the (potentially tens-of-GB) init of every leaf the
    checkpoint already provides — only the missing leaves are computed.
    """
    struct = jax.eval_shape(pipeline.init_params, rng)
    flat_s = traverse_util.flatten_dict(flax.core.unfreeze(struct))
    flat_p = traverse_util.flatten_dict(flax.core.unfreeze(params))
    missing = [k for k in flat_s if k not in flat_p]
    if not missing:
        return params

    def init_missing(r):
        full = traverse_util.flatten_dict(
            flax.core.unfreeze(pipeline.init_params(r))
        )
        return {k: full[k] for k in missing}

    vals = jax.jit(init_missing)(rng)
    flat_p.update(vals)
    return traverse_util.unflatten_dict(flat_p)


def merge_params(trainable: Any, frozen: Any):
    flat_t = traverse_util.flatten_dict(trainable)
    flat_f = traverse_util.flatten_dict(frozen)
    merged = {
        k: (flat_t.get(k) if flat_t.get(k) is not None else flat_f.get(k))
        for k in set(flat_t) | set(flat_f)
    }
    # drop placeholder Nones: every real leaf lives in exactly one
    # partition, and packed host storage (offload_param_stacks) nests an
    # extra key level under the original path, whose None twin from the
    # other partition would otherwise shadow the subtree
    merged = {k: v for k, v in merged.items() if v is not None}
    return traverse_util.unflatten_dict(merged)


def strip_nones(tree: Any):
    """Drop None leaves (for optimizer init over trainables only)."""
    flat = traverse_util.flatten_dict(tree)
    return traverse_util.unflatten_dict(
        {k: v for k, v in flat.items() if v is not None}
    )


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    trainable: Any
    frozen: Any
    opt_state: Any
    # number of examples seen (reference train.py tracks `examples` in
    # client_state for x_axis_examples logging / save triggers)
    examples: jax.Array
