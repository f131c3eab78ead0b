"""Muon / NorMuon optimizer: momentum + Newton-Schulz orthogonalized updates.

Pure-XLA re-implementation of reference optimizers/generic_optim.py:152-233
(zeropower_via_newtonschulz5 with the quintic (3.4445, -4.7750, 2.0315)
coefficients, and the Polar Express variant of arXiv:2505.16932). Matrix
params get orthogonalized momentum scaled by sqrt(max(1, rows/cols))
(Muon convention); non-2D params fall back to plain AdamW.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax

NS_STEPS = 5

POLAR_EXPRESS_COEFFS = (
    (8.156554524902461, -22.48329292557795, 15.878769915207462),
    (4.042929935166739, -2.808917465908714, 0.5000178451051316),
    (3.8916678022926607, -2.772484153217685, 0.5060648178503393),
    (3.285753657755655, -2.3681294933425376, 0.46449024233003106),
    (2.3465413258596377, -1.7097828382687081, 0.42323551169305323),
)


def newton_schulz_orthogonalize(g: jax.Array, steps: int = NS_STEPS,
                                polar_express: bool = False) -> jax.Array:
    """Orthogonalize the trailing 2D of g (>=2D). bf16 iterations like the
    reference; the MXU eats these matmuls."""
    x = g.astype(jnp.bfloat16)
    transposed = x.shape[-2] > x.shape[-1]
    if transposed:
        x = jnp.swapaxes(x, -1, -2)

    def norm(v):
        return jnp.sqrt(
            jnp.sum(jnp.square(v.astype(jnp.float32)), axis=(-2, -1),
                    keepdims=True)
        ).astype(v.dtype)

    if polar_express:
        x = x / (norm(x) * (1 + 2e-2) + 1e-6)
        for a, b, c in POLAR_EXPRESS_COEFFS:
            A = x @ jnp.swapaxes(x, -1, -2)
            B = b * A + c * (A @ A)
            x = a * x + B @ x
    else:
        a, b, c = 3.4445, -4.7750, 2.0315
        x = x / (norm(x) + 1e-7)
        for _ in range(steps):
            A = x @ jnp.swapaxes(x, -1, -2)
            B = b * A + c * (A @ A)
            x = a * x + B @ x

    if transposed:
        x = jnp.swapaxes(x, -1, -2)
    return x.astype(jnp.float32)


class MuonState(NamedTuple):
    count: chex.Array
    momentum: Any
    adam_mu: Any
    adam_nu: Any


def muon(
    learning_rate,
    momentum: float = 0.95,
    nesterov: bool = True,
    weight_decay: float = 0.0,
    adam_b1: float = 0.9,
    adam_b2: float = 0.999,
    adam_eps: float = 1e-8,
    polar_express: bool = False,
) -> optax.GradientTransformation:
    """Muon for >=2D params (the last two axes orthogonalized; leading axes —
    e.g. scan-stacked layers — are batched), AdamW for the rest."""

    def is_matrix(p):
        return p.ndim >= 2 and p.shape[-1] > 1 and p.shape[-2] > 1

    def init_fn(params):
        zeros = lambda p: jnp.zeros(p.shape, jnp.float32)
        return MuonState(
            jnp.zeros([], jnp.int32),
            jax.tree.map(zeros, params),
            jax.tree.map(zeros, params),
            jax.tree.map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        count = state.count + 1
        cf = count.astype(jnp.float32)

        def upd(g, mom, mu, nu, p):
            g = g.astype(jnp.float32)
            if is_matrix(g):
                mom = momentum * mom + g
                use = g + momentum * mom if nesterov else mom
                o = newton_schulz_orthogonalize(use, polar_express=polar_express)
                scale = jnp.sqrt(
                    jnp.maximum(1.0, g.shape[-2] / g.shape[-1])
                )
                step = o * scale
                new_mu, new_nu = mu, nu
            else:
                mom_new = mom  # unused for adam path
                mu = adam_b1 * mu + (1 - adam_b1) * g
                nu = adam_b2 * nu + (1 - adam_b2) * g * g
                mhat = mu / (1 - adam_b1**cf)
                nhat = nu / (1 - adam_b2**cf)
                step = mhat / (jnp.sqrt(nhat) + adam_eps)
                new_mu, new_nu = mu, nu
                mom = mom_new
            if weight_decay and p is not None:
                step = step + weight_decay * p.astype(jnp.float32)
            return step, mom, new_mu, new_nu

        flat_g, treedef = jax.tree.flatten(updates)
        get = lambda t: treedef.flatten_up_to(t)
        flat_p = get(params) if params is not None else [None] * len(flat_g)
        outs = [
            upd(*args)
            for args in zip(flat_g, get(state.momentum), get(state.adam_mu),
                            get(state.adam_nu), flat_p)
        ]
        unflat = lambda i: treedef.unflatten([o[i] for o in outs])
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        steps = jax.tree.map(lambda s: -lr * s, unflat(0))
        return steps, MuonState(count, unflat(1), unflat(2), unflat(3))

    return optax.GradientTransformation(init_fn, update_fn)
