"""Automagic optimizer: Adafactor second moment + per-element adaptive LR.

Pure-XLA re-implementation of reference optimizers/automagic.py (AI-Toolkit
derived): factored (row/col) second-moment EMA for matrices, full second
moment for vectors, update-RMS clipping, and a per-weight-element learning
rate that is bumped by `lr_bump` when the update sign agrees with the last
step and cut by `lr_bump` when it flips (automagic.py:271-298). The LR mask
is stored as blockwise int8 (the reference's Auto8bitTensor, automagic.py:
222-269) and the sign state as bool, so state overhead stays ~1.1 byte/param.
Kahan summation is unnecessary: master params here are fp32 (or optax applies
updates in fp32).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax

from .optimizers import _dequantize_blockwise, _quantize_blockwise


class AutomagicState(NamedTuple):
    count: chex.Array
    row_var: Any      # factored second moment (rows) or None-like zeros
    col_var: Any
    full_var: Any     # for 1D params
    polarity: Any     # bool: last update sign
    lr_q: Any         # int8 quantized per-element LR
    lr_scale: Any
    avg_lr: Any       # scalar per-leaf mean LR (for logging)


def automagic(
    lr_bump: float = 3e-6,
    min_lr: float = 1e-7,
    max_lr: float = 1e-3,
    eta: float = 1e-5,          # initial per-element LR (reference self.lr)
    beta2: float = 0.999,
    eps: float = 1e-30,
    clip_threshold: float = 1.0,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    def init_fn(params):
        def init_leaf(p):
            factored = p.ndim >= 2
            if factored:
                row = jnp.zeros(p.shape[:-1], jnp.float32)
                col = jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32)
                full = jnp.zeros((1,), jnp.float32)
            else:
                row = jnp.zeros((1,), jnp.float32)
                col = jnp.zeros((1,), jnp.float32)
                full = jnp.zeros(p.shape, jnp.float32)
            pol = jnp.zeros(p.shape, jnp.bool_)
            lr_q, lr_s = _quantize_blockwise(jnp.full(p.shape, eta, jnp.float32))
            return row, col, full, pol, lr_q, lr_s

        leaves = jax.tree.map(init_leaf, params)
        is_t = lambda t: isinstance(t, tuple)
        pick = lambda i: jax.tree.map(lambda t: t[i], leaves, is_leaf=is_t)
        return AutomagicState(
            jnp.zeros([], jnp.int32),
            pick(0), pick(1), pick(2), pick(3), pick(4), pick(5),
            jax.tree.map(lambda p: jnp.asarray(eta, jnp.float32), params),
        )

    def update_fn(updates, state, params=None):
        count = state.count + 1

        def upd(g, p, row, col, full, pol, lr_q, lr_s):
            g = g.astype(jnp.float32)
            factored = g.ndim >= 2
            sq = g * g + eps
            if factored:
                row = beta2 * row + (1 - beta2) * jnp.mean(sq, axis=-1)
                col = beta2 * col + (1 - beta2) * jnp.mean(sq, axis=-2)
                r = jax.lax.rsqrt(
                    row / jnp.mean(row, axis=-1, keepdims=True)
                )[..., None]
                c = jax.lax.rsqrt(col)[..., None, :]
                update = g * r * c
            else:
                full = beta2 * full + (1 - beta2) * sq
                update = g * jax.lax.rsqrt(full)
            rms = jnp.linalg.norm(update.reshape(-1)) / (update.size ** 0.5)
            update = update / jnp.maximum(1.0, rms / clip_threshold)

            cur_pol = update > 0
            agree = cur_pol == pol
            lr = _dequantize_blockwise(lr_q, lr_s, g.shape, g.size)
            lr = jnp.where(agree, lr + lr_bump, lr - lr_bump)
            lr = jnp.clip(lr, min_lr, max_lr)
            step = update * lr
            if weight_decay and p is not None:
                step = step + weight_decay * lr * p.astype(jnp.float32)
            lr_q2, lr_s2 = _quantize_blockwise(lr)
            return (-step, row, col, full, cur_pol, lr_q2, lr_s2,
                    jnp.mean(lr))

        flat_g, treedef = jax.tree.flatten(updates)
        get = lambda t: treedef.flatten_up_to(t)
        flat_p = get(params) if params is not None else [None] * len(flat_g)
        outs = [
            upd(*args)
            for args in zip(
                flat_g, flat_p, get(state.row_var), get(state.col_var),
                get(state.full_var), get(state.polarity), get(state.lr_q),
                get(state.lr_scale),
            )
        ]
        unflat = lambda i: treedef.unflatten([o[i] for o in outs])
        new_state = AutomagicState(
            count, unflat(1), unflat(2), unflat(3), unflat(4), unflat(5),
            unflat(6), unflat(7),
        )
        return unflat(0), new_state

    return optax.GradientTransformation(init_fn, update_fn)
