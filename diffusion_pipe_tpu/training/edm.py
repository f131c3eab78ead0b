"""EDM (Karras et al.) objective for Cosmos-1 (reference models/cosmos.py).

sigma = exp(N(0,1)) (log-normal), x_t = x + sigma * n; the network is
preconditioned with the standard EDM scalings (sigma_data = 0.5,
cosmos.py:21):

  c_skip = sd^2 / (sigma^2 + sd^2)
  c_out  = sigma * sd / sqrt(sigma^2 + sd^2)
  c_in   = 1 / sqrt(sigma^2 + sd^2)
  c_noise = log(sigma) / 4

prediction x0_pred = c_skip * x_t + c_out * F(c_in * x_t, c_noise); target is
the CLEAN latents with per-sigma weights
w = (sigma^2 + sd^2) / (sigma * sd)^2 (cosmos.py:37-45, 426-431).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

SIGMA_DATA = 0.5


def edm_scalings(sigma, sigma_data: float = SIGMA_DATA):
    denom = jnp.sqrt(sigma**2 + sigma_data**2)
    c_skip = sigma_data**2 / (sigma**2 + sigma_data**2)
    c_out = sigma * sigma_data / denom
    c_in = 1.0 / denom
    c_noise = jnp.log(sigma) / 4.0
    return c_skip, c_out, c_in, c_noise


def per_sigma_loss_weights(sigma, sigma_data: float = SIGMA_DATA):
    return (sigma**2 + sigma_data**2) / (sigma * sigma_data) ** 2


def sample_sigma(
    key: jax.Array, batch_size: int, quantile: Optional[float] = None
):
    """sigma = exp(z), z ~ N(0,1); quantile -> icdf (cosmos.py:254-259)."""
    from jax.scipy.stats import norm

    if quantile is not None:
        z = jnp.full((batch_size,), norm.ppf(quantile))
    else:
        z = jax.random.normal(key, (batch_size,))
    return jnp.exp(z)


def edm_noise(
    key: jax.Array, latents: jax.Array, quantile: Optional[float] = None
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (net_input, x_t, c_noise, sigma)."""
    s_key, n_key = jax.random.split(key)
    b = latents.shape[0]
    sigma = sample_sigma(s_key, b, quantile)
    noise = jax.random.normal(n_key, latents.shape, jnp.float32)
    exp = (b,) + (1,) * (latents.ndim - 1)
    x_t = latents + sigma.reshape(exp) * noise
    _, _, c_in, c_noise = edm_scalings(sigma)
    return x_t * c_in.reshape(exp), x_t, c_noise, sigma
