"""Timestep sampling and flow-matching / diffusion target construction.

TPU-native re-expression of:
- reference utils/common.py:124-160 (get_t_distribution / slice_t_distribution
  / sample_t: bucketed icdf tables) — here sampling is closed-form with
  explicit jax PRNG keys instead of torch global RNG + 10k-bucket tables;
  min_t/max_t truncation is exact (inverse-CDF of a uniform on the truncated
  quantile range) rather than table slicing.
- reference models/flux.py:341-376 (logit-normal t, sigmoid_scale, shift /
  flux_shift resolution-dependent time shift, rectified-flow interpolation
  x_t=(1-t)x1+t*x0 with target x0-x1).
- reference train.py:39 TIMESTEP_QUANTILES_FOR_EVAL (fixed-quantile eval t).

Everything is jit-friendly: static config hashed into the closure, tensors in,
tensors out.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm

from ..common import get_lin_function, time_shift

# Fixed eval quantiles (reference train.py:39).
TIMESTEP_QUANTILES_FOR_EVAL = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]


@dataclasses.dataclass(frozen=True)
class TimestepDistribution:
    """Static timestep-sampling configuration (hashable; safe as a jit static arg).

    method: 'logit_normal' (default, reference models/flux.py:341) or 'uniform'.
    sigmoid_scale: scales the normal sample pre-sigmoid (flux.py:355-358).
    shift: discrete time shift t' = s*t / (1 + (s-1)*t) (flux.py:360-361).
    flux_shift: resolution-dependent shift using image seq len (flux.py:362-364).
    min_t/max_t: truncate the distribution (Wan2.2 dual-model ranges,
      reference wan.py:351-369 via utils/common.py slice_t_distribution).
    """

    method: str = "logit_normal"
    sigmoid_scale: float = 1.0
    shift: Optional[float] = None
    flux_shift: bool = False
    min_t: float = 0.0
    max_t: float = 1.0

    @staticmethod
    def from_model_config(model_config: dict) -> "TimestepDistribution":
        return TimestepDistribution(
            method=model_config.get("timestep_sample_method", "logit_normal"),
            sigmoid_scale=float(model_config.get("sigmoid_scale", 1.0)),
            shift=model_config.get("shift", None),
            flux_shift=bool(model_config.get("flux_shift", False)),
            min_t=float(model_config.get("min_t", 0.0)),
            max_t=float(model_config.get("max_t", 1.0)),
        )


def _base_cdf(dist: TimestepDistribution, t):
    """CDF of the pre-shift t distribution on (0,1)."""
    t = jnp.clip(t, 1e-7, 1 - 1e-7)
    if dist.method == "logit_normal":
        # t = sigmoid(scale * z), z ~ N(0,1)  =>  F(t) = Phi(logit(t)/scale)
        return norm.cdf(jnp.log(t / (1 - t)) / dist.sigmoid_scale)
    elif dist.method == "uniform":
        return t
    raise NotImplementedError(dist.method)


def _base_icdf(dist: TimestepDistribution, q):
    """Inverse CDF of the pre-shift t distribution."""
    q = jnp.clip(q, 1e-7, 1 - 1e-7)
    if dist.method == "logit_normal":
        z = norm.ppf(q) * dist.sigmoid_scale
        return jax.nn.sigmoid(z)
    elif dist.method == "uniform":
        return q
    raise NotImplementedError(dist.method)


def apply_time_shift(dist: TimestepDistribution, t, image_seq_len: Optional[int] = None):
    """Apply the configured (resolution-dependent) time shift.

    Reference models/flux.py:360-364. image_seq_len = (h//2)*(w//2) for flux.
    """
    if dist.shift is not None:
        s = dist.shift
        return (t * s) / (1 + (s - 1) * t)
    if dist.flux_shift:
        if image_seq_len is None:
            raise ValueError("flux_shift requires image_seq_len")
        mu = get_lin_function(y1=0.5, y2=1.15)(image_seq_len)
        return time_shift(mu, 1.0, t)
    return t


def _inverse_time_shift(dist: TimestepDistribution, t_shifted,
                        image_seq_len: Optional[int] = None):
    """Inverse of apply_time_shift, for expressing min_t/max_t bounds (which
    the reference applies on the SHIFTED distribution: utils/common.py
    slice_t_distribution runs after the shift in wan.py:351-369)."""
    if dist.shift is not None:
        s = dist.shift
        # t' = s*t / (1 + (s-1)*t)  =>  t = t' / (s - (s-1)*t')
        return t_shifted / (s - (s - 1) * t_shifted)
    if dist.flux_shift:
        if image_seq_len is None:
            raise ValueError("flux_shift requires image_seq_len")
        mu = get_lin_function(y1=0.5, y2=1.15)(image_seq_len)
        e_mu = jnp.exp(mu)
        # t' = e^mu / (e^mu + (1/t - 1))  =>  1/t - 1 = e^mu (1/t' - 1)
        return 1.0 / (1.0 + e_mu * (1.0 / t_shifted - 1.0))
    return t_shifted


def sample_timesteps(
    key: jax.Array,
    batch_size: int,
    dist: TimestepDistribution = TimestepDistribution(),
    quantile: Optional[float] = None,
    image_seq_len: Optional[int] = None,
):
    """Sample per-example t in (0,1).

    With `quantile` set (eval path, reference train.py:176-195 +
    flux.py:350-351), t is deterministic: the icdf of that quantile within
    the truncated distribution. min_t/max_t bound the post-shift t (the
    reference shifts the distribution table, then slices; wan.py:351-369).
    """
    if dist.min_t > 0.0:
        base_min = _inverse_time_shift(dist, jnp.asarray(dist.min_t), image_seq_len)
        qmin = _base_cdf(dist, base_min)
    else:
        qmin = 0.0
    if dist.max_t < 1.0:
        base_max = _inverse_time_shift(dist, jnp.asarray(dist.max_t), image_seq_len)
        qmax = _base_cdf(dist, base_max)
    else:
        qmax = 1.0
    if quantile is not None:
        q = jnp.full((batch_size,), qmin + (qmax - qmin) * quantile)
    else:
        q = qmin + (qmax - qmin) * jax.random.uniform(key, (batch_size,))
    t = _base_icdf(dist, q)
    return apply_time_shift(dist, t, image_seq_len=image_seq_len)


def rectified_flow_interpolate(latents, noise, t):
    """x_t = (1-t)*x1 + t*x0 and target v = x0 - x1.

    latents = clean data x1, noise = x0 ~ N(0,1). Reference models/flux.py:366-370.
    t broadcasts over trailing dims (t shape [B]).
    """
    t_exp = t.reshape(t.shape + (1,) * (latents.ndim - 1)).astype(latents.dtype)
    x_t = (1.0 - t_exp) * latents + t_exp * noise
    target = noise - latents
    return x_t, target


def make_flow_matching_inputs(
    key: jax.Array,
    latents: jax.Array,
    dist: TimestepDistribution = TimestepDistribution(),
    quantile: Optional[float] = None,
    image_seq_len: Optional[int] = None,
):
    """Full noising step: sample t, sample noise, interpolate.

    Returns (x_t, t, target). Uses two folds of `key` so data order and noise
    are independently reproducible.
    """
    t_key, n_key = jax.random.split(key)
    t = sample_timesteps(
        t_key, latents.shape[0], dist, quantile=quantile, image_seq_len=image_seq_len
    )
    noise = jax.random.normal(n_key, latents.shape, dtype=jnp.float32).astype(
        latents.dtype
    )
    x_t, target = rectified_flow_interpolate(latents, noise, t)
    return x_t, t, target
