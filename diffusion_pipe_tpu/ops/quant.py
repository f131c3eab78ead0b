"""Quantization ops: stochastic rounding (Pallas) + int8 blockwise helpers.

TPU-native replacement for reference optimizers/optimizer_utils.py:
- copy_stochastic (bit-level stochastic rounding fp32 -> bf16,
  optimizer_utils.py:142-219) becomes a Pallas kernel using the hardware
  PRNG + pltpu.stochastic_round; used for bf16-master-weight training modes.
- int8 blockwise absmax quantization lives in training/optimizers.py
  (_quantize_blockwise / _dequantize_blockwise) and backs the 8-bit AdamW
  and Automagic LR-mask states.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sr_kernel(seed_ref, x_ref, o_ref):
    pltpu.prng_seed(seed_ref[0])
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    o_ref[:] = pltpu.stochastic_round(
        x_ref[:], bits, target_dtype=o_ref.dtype
    )


def stochastic_round(x: jax.Array, seed: jax.Array,
                     target_dtype=jnp.bfloat16) -> jax.Array:
    """Stochastically round a float32 array to target_dtype (TPU kernel;
    rounds to nearest on non-TPU backends)."""
    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon"):
        # interpret-mode fallback keeps tests runnable on CPU
        return x.astype(target_dtype)
    orig_shape = x.shape
    flat = x.reshape(-1)
    pad = (-flat.size) % 256
    if pad:
        flat = jnp.pad(flat, (0, pad))
    x2 = flat.reshape(-1, 256)
    out = pl.pallas_call(
        _sr_kernel,
        out_shape=jax.ShapeDtypeStruct(x2.shape, target_dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(seed.reshape(1).astype(jnp.int32), x2.astype(jnp.float32))
    return out.reshape(-1)[: flat.size - pad if pad else None][
        : x.size
    ].reshape(orig_shape)
