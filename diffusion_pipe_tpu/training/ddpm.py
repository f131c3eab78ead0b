"""DDPM scheduler math for eps/v-prediction training (SDXL family).

Pure-array re-implementation of the scheduler pieces the reference uses:
- diffusers DDPMScheduler add_noise / get_velocity (driven from
  models/sdxl.py:536-566),
- zero-terminal-SNR beta rescale (sdxl.py:295-330, arXiv:2305.08891),
- all_snr table + min-SNR-gamma / debiased-estimation loss weights
  (sdxl.py:280-356).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def scaled_linear_betas(beta_start=0.00085, beta_end=0.012, n=1000) -> np.ndarray:
    """SD/SDXL 'scaled_linear' beta schedule."""
    return np.linspace(beta_start**0.5, beta_end**0.5, n, dtype=np.float64) ** 2


def enforce_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale betas so the last timestep has zero SNR (sdxl.py:299-318)."""
    alphas = 1.0 - betas
    alphas_bar = np.cumprod(alphas)
    abs_sqrt = np.sqrt(alphas_bar)
    abs_sqrt_0, abs_sqrt_T = abs_sqrt[0], abs_sqrt[-1]
    abs_sqrt = abs_sqrt - abs_sqrt_T
    abs_sqrt = abs_sqrt * abs_sqrt_0 / (abs_sqrt_0 - abs_sqrt_T)
    alphas_bar = abs_sqrt**2
    alphas = np.concatenate([alphas_bar[:1], alphas_bar[1:] / alphas_bar[:-1]])
    return 1.0 - alphas


@dataclasses.dataclass(frozen=True)
class DDPMSchedule:
    alphas_cumprod: Tuple[float, ...]  # hashable for jit-static closure use
    num_train_timesteps: int = 1000

    @staticmethod
    def sdxl(v_pred: bool = False, zero_terminal_snr: bool = False,
             num_train_timesteps: int = 1000) -> "DDPMSchedule":
        betas = scaled_linear_betas(n=num_train_timesteps)
        if zero_terminal_snr:
            betas = enforce_zero_terminal_snr(betas)
        ac = np.cumprod(1.0 - betas)
        return DDPMSchedule(tuple(float(x) for x in ac), num_train_timesteps)

    def _tables(self):
        ac = jnp.asarray(self.alphas_cumprod, jnp.float32)
        return jnp.sqrt(ac), jnp.sqrt(1.0 - ac)

    def add_noise(self, latents, noise, timesteps):
        """diffusers DDPMScheduler.add_noise."""
        sa, so = self._tables()
        a = sa[timesteps].reshape((-1,) + (1,) * (latents.ndim - 1))
        o = so[timesteps].reshape((-1,) + (1,) * (latents.ndim - 1))
        return a * latents + o * noise

    def get_velocity(self, latents, noise, timesteps):
        """v = alpha*noise - sigma*x0 (diffusers get_velocity)."""
        sa, so = self._tables()
        a = sa[timesteps].reshape((-1,) + (1,) * (latents.ndim - 1))
        o = so[timesteps].reshape((-1,) + (1,) * (latents.ndim - 1))
        return a * noise - o * latents

    def snr(self, timesteps):
        ac = jnp.asarray(self.alphas_cumprod, jnp.float32)[timesteps]
        return ac / (1.0 - ac)

    def sample_timesteps(self, key, batch_size, quantile=None):
        """Uniform integer timesteps; quantile -> fixed t (sdxl.py:551-557)."""
        if quantile is not None:
            t = int(quantile * self.num_train_timesteps)
            return jnp.full((batch_size,), t, jnp.int32)
        return jax.random.randint(
            key, (batch_size,), 0, self.num_train_timesteps, jnp.int32
        )


def snr_loss_weight(schedule: DDPMSchedule, timesteps, min_snr_gamma=None,
                    debiased_estimation=False, v_prediction=False):
    """Per-example loss weight combining min-SNR-gamma (sdxl.py:333-344) and
    debiased estimation (sdxl.py:347-356). Returns [B] f32 (ones if no
    weighting configured)."""
    w = jnp.ones_like(timesteps, jnp.float32)
    snr = schedule.snr(timesteps)
    if min_snr_gamma is not None:
        clipped = jnp.minimum(snr, float(min_snr_gamma))
        w = w * (clipped / (snr + 1.0) if v_prediction
                 else clipped / jnp.maximum(snr, 1e-8))
    if debiased_estimation:
        snr_t = jnp.minimum(snr, 1000.0)
        w = w * (1.0 / (snr_t + 1.0) if v_prediction
                 else 1.0 / jnp.sqrt(jnp.maximum(snr_t, 1e-8)))
    return w
