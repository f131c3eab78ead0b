"""GenericOptim: configurable momentum / second-moment / subspace optimizer.

TPU-native port of the reference's optimizers/generic_optim.py (657 LoC)
feature matrix:
  - momentum_type: 'ema' | 'none'
  - second_moment_type: 'ema' | 'adagrad' (beta2 >= 1 accumulation,
    generic_optim.py:60-64) | 'sn' (subset-norm, :28-51) | 'factored'
    (Adafactor row/col, :536-560) | 'none'
  - subspace momentum (GaLore-style, :67-131): per-matrix projector
    ('svd' | 'uniform' | 'topk') of given rank, refreshed every
    update_proj_gap steps (momentum reset on refresh, :84-88); the update
    is project_back(momentum) + the orthogonal complement of the raw
    gradient (:90-93)
  - bias correction, weight decay, lr schedule

All math is jit-compatible: projector refresh happens under lax.cond on
step % gap == 0 (SVD runs on-device only on refresh steps); stacked
per-layer parameters [L, m, n] are handled by vmapping over leading dims.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


class GenericOptimState(NamedTuple):
    step: jax.Array
    exp_avg: Any
    exp_avg_sq: Any
    proj: Any  # projection matrices (or None per-leaf)


def _matrix_side(shape) -> Optional[bool]:
    """True => project left (rows), False => right (cols), None => no 2D."""
    if len(shape) < 2:
        return None
    m, n = shape[-2], shape[-1]
    return m <= n


def _svd_projector(g, rank):
    """g: [..., m, n] -> P with orthonormal columns on the smaller side."""
    left = _matrix_side(g.shape)

    def one(mat):
        u, _, vt = jnp.linalg.svd(mat.astype(jnp.float32), full_matrices=False)
        return u[:, :rank] if left else vt[:rank].T  # [m,r] or [n,r]

    f = one
    for _ in range(g.ndim - 2):
        f = jax.vmap(f)
    return f(g)


def _row_select_projector(g, rank, topk: bool, step):
    """Selection projector: one-hot matrix choosing `rank` rows (left side)
    or cols (right side) — topk by norm or uniform-random."""
    left = _matrix_side(g.shape)
    dim = g.shape[-2] if left else g.shape[-1]

    def one(mat, key):
        sq = mat.astype(jnp.float32) ** 2
        norms = jnp.sum(sq, axis=-1) if left else jnp.sum(sq, axis=-2)
        if topk:
            _, idx = jax.lax.top_k(norms, rank)
        else:
            idx = jax.random.choice(key, dim, (rank,), replace=False)
        return jax.nn.one_hot(idx, dim, dtype=jnp.float32).T  # [dim, r]

    keys = jax.random.split(
        jax.random.fold_in(jax.random.PRNGKey(17), step),
        int(jnp.prod(jnp.asarray(g.shape[:-2]))) if g.ndim > 2 else 1,
    )
    if g.ndim == 2:
        return one(g, keys[0])
    f = jax.vmap(one)
    flat = g.reshape((-1,) + g.shape[-2:])
    out = f(flat, keys)
    return out.reshape(g.shape[:-2] + out.shape[-2:])


def _project(p_mat, g):
    """proj = P^T @ G (left) or G @ P (right)."""
    if _matrix_side(g.shape):
        return jnp.einsum("...mr,...mn->...rn", p_mat, g)
    return jnp.einsum("...mn,...nr->...mr", g, p_mat)


def _project_back(p_mat, proj):
    if p_mat.shape[-2] == proj.shape[-2]:  # right side: proj [..., m, r]
        return jnp.einsum("...mr,...nr->...mn", proj, p_mat)
    return jnp.einsum("...mr,...rn->...mn", p_mat, proj)


def scale_by_generic(
    momentum_type: str = "ema",
    second_moment_type: str = "ema",
    betas: Tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    correct_bias: bool = True,
    rank: int = 0,
    proj_type: str = "svd",
    update_proj_gap: int = 200,
) -> optax.GradientTransformation:
    """Core preconditioner; chain with add_decayed_weights + lr scaling."""
    b1, b2 = betas
    use_proj = rank > 0

    def leaf_projectable(g):
        return use_proj and g.ndim >= 2 and min(g.shape[-2:]) > rank

    def make_proj(g, step):
        if proj_type == "svd":
            return _svd_projector(g, rank)
        return _row_select_projector(g, rank, proj_type == "topk", step)

    # NOTE: "absent" state is an EMPTY array (size 0), not None — None
    # vanishes from jax pytrees and breaks treedef.flatten_up_to.
    _EMPTY = jnp.zeros((0,), jnp.float32)

    def init_fn(params):
        def init_m(p):
            if momentum_type == "none":
                return _EMPTY
            if leaf_projectable(p):
                if _matrix_side(p.shape):
                    return jnp.zeros(p.shape[:-2] + (rank, p.shape[-1]),
                                     jnp.float32)
                return jnp.zeros(p.shape[:-2] + (p.shape[-2], rank),
                                 jnp.float32)
            return jnp.zeros(p.shape, jnp.float32)

        def init_v(p):
            if second_moment_type == "none":
                return _EMPTY
            if second_moment_type == "sn" and p.ndim >= 2:
                if p.shape[-2] >= p.shape[-1]:
                    return jnp.zeros(p.shape[:-1] + (1,), jnp.float32)
                return jnp.zeros(p.shape[:-2] + (1, p.shape[-1]), jnp.float32)
            if second_moment_type == "factored" and p.ndim >= 2:
                return (
                    jnp.zeros(p.shape[:-1], jnp.float32),  # row (over cols)
                    jnp.zeros(p.shape[:-2] + (p.shape[-1],), jnp.float32),
                )
            return jnp.zeros(p.shape, jnp.float32)

        def init_p(p):
            if leaf_projectable(p):
                side = p.shape[-2] if _matrix_side(p.shape) else p.shape[-1]
                return jnp.zeros(p.shape[:-2] + (side, rank), jnp.float32)
            return _EMPTY

        return GenericOptimState(
            step=jnp.zeros([], jnp.int32),
            exp_avg=jax.tree.map(init_m, params),
            exp_avg_sq=jax.tree.map(init_v, params),
            proj=jax.tree.map(init_p, params),
        )

    def update_fn(updates, state, params=None):
        step = state.step + 1

        def upd(g, m, v, pmat, p):
            g32 = g.astype(jnp.float32)
            if m is not None and m.size == 0:
                m = None
            if v is not None and not isinstance(v, tuple) and v.size == 0:
                v = None
            if pmat is not None and pmat.size == 0:
                pmat = None

            if pmat is not None:
                refresh = jnp.logical_or(
                    step == 1, (step % update_proj_gap) == 0
                )
                pmat = jax.lax.cond(
                    refresh,
                    lambda: make_proj(g32, step).astype(jnp.float32),
                    lambda: pmat,
                )
                proj_g = _project(pmat, g32)
                # momentum reset on projector refresh (reference :84-88)
                if m is not None:
                    m = jnp.where(
                        jnp.logical_and(refresh, step > 1),
                        jnp.zeros_like(m), m,
                    )
            else:
                proj_g = g32

            if m is not None:
                m = b1 * m + (1.0 - b1) * proj_g
                if pmat is not None:
                    orth = g32 - _project_back(pmat, proj_g)
                    numerator = _project_back(pmat, m) + orth
                else:
                    numerator = m
            else:
                numerator = g32 if pmat is None else g32

            # second moment (full space)
            if v is None:
                denom = 1.0
            elif second_moment_type == "sn" and g.ndim >= 2:
                axis = -1 if g.shape[-2] >= g.shape[-1] else -2
                smu = jnp.sum(g32 * g32, axis=axis, keepdims=True)
                v = b2 * v + (1.0 - b2) * smu
                denom = jnp.sqrt(v) + eps
            elif second_moment_type == "factored" and g.ndim >= 2:
                vr, vc = v
                vr = b2 * vr + (1.0 - b2) * jnp.mean(g32 * g32, axis=-1)
                vc = b2 * vc + (1.0 - b2) * jnp.mean(g32 * g32, axis=-2)
                v = (vr, vc)
                r = vr / jnp.clip(jnp.mean(vr, axis=-1, keepdims=True),
                                  1e-30)
                denom = jnp.sqrt(r[..., None] * vc[..., None, :]) + eps
            elif second_moment_type == "adagrad":
                v = v + g32 * g32
                denom = jnp.sqrt(v) + eps
            elif second_moment_type == "ema":
                v = b2 * v + (1.0 - b2) * g32 * g32
                denom = jnp.sqrt(v) + eps
            else:
                denom = 1.0

            if correct_bias:
                bc1 = 1.0 - b1 ** step.astype(jnp.float32) \
                    if m is not None else 1.0
                numerator = numerator / bc1
                if v is not None and second_moment_type == "ema":
                    bc2 = 1.0 - b2 ** step.astype(jnp.float32)
                    denom = denom / jnp.sqrt(bc2)

            u = numerator / denom
            return (u.astype(g.dtype),
                    _EMPTY if m is None else m,
                    _EMPTY if v is None else v,
                    _EMPTY if pmat is None else pmat)

        flat_g, treedef = jax.tree.flatten(updates)
        flat_m = treedef.flatten_up_to(state.exp_avg)
        flat_v = treedef.flatten_up_to(state.exp_avg_sq)
        flat_p = treedef.flatten_up_to(state.proj)
        flat_params = (
            treedef.flatten_up_to(params) if params is not None
            else [None] * len(flat_g)
        )
        outs = [
            upd(g, m, v, pm, p)
            for g, m, v, pm, p in zip(flat_g, flat_m, flat_v, flat_p,
                                      flat_params)
        ]
        new_updates = treedef.unflatten([o[0] for o in outs])
        new_m = treedef.unflatten([o[1] for o in outs])
        new_v = treedef.unflatten([o[2] for o in outs])
        new_p = treedef.unflatten([o[3] for o in outs])
        return new_updates, GenericOptimState(step, new_m, new_v, new_p)

    return optax.GradientTransformation(init_fn, update_fn)
