"""Loss functions: masked MSE / Huber / smooth-L1 (+ DDPM weighting helpers).

TPU-native analogue of reference models/base.py:364-382 (default masked loss
computed in float32 regardless of compute dtype) and models/sdxl.py:333-355
(min-SNR / debiased-estimation loss weighting for eps/v-prediction models).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def _elementwise_loss(output, target, loss_type: str = "mse",
                      huber_delta: float = 1.0, smooth_l1_beta: float = 1.0):
    output = output.astype(jnp.float32)
    target = target.astype(jnp.float32)
    diff = output - target
    if loss_type == "mse":
        return diff * diff
    if loss_type == "huber":
        # torch F.huber_loss semantics: 0.5*d^2 if |d|<delta else delta*(|d|-0.5*delta)
        ad = jnp.abs(diff)
        return jnp.where(
            ad < huber_delta, 0.5 * diff * diff, huber_delta * (ad - 0.5 * huber_delta)
        )
    if loss_type == "smooth_l1":
        # torch F.smooth_l1_loss: 0.5*d^2/beta if |d|<beta else |d|-0.5*beta
        ad = jnp.abs(diff)
        return jnp.where(
            ad < smooth_l1_beta, 0.5 * diff * diff / smooth_l1_beta,
            ad - 0.5 * smooth_l1_beta,
        )
    raise NotImplementedError(loss_type)


def masked_loss(
    output,
    target,
    mask: Optional[jnp.ndarray] = None,
    loss_type: str = "mse",
    huber_delta: float = 1.0,
    smooth_l1_beta: float = 1.0,
    per_example_weights: Optional[jnp.ndarray] = None,
):
    """Default training loss, reference models/base.py:364-382.

    mask (broadcastable to the loss shape, or None) multiplies elementwise;
    the result is a plain mean over all elements (the reference does NOT
    renormalize by mask density in the default path).
    per_example_weights: [B] weights (min-SNR etc.), broadcast over trailing dims.
    """
    loss = _elementwise_loss(output, target, loss_type, huber_delta, smooth_l1_beta)
    if mask is not None and mask.size > 0:
        loss = loss * jnp.broadcast_to(mask.astype(jnp.float32), loss.shape)
    if per_example_weights is not None:
        w = per_example_weights.astype(jnp.float32)
        loss = loss * w.reshape(w.shape + (1,) * (loss.ndim - 1))
    return jnp.mean(loss)


def loss_config_from_model_config(config: dict) -> dict:
    """Extract loss-type kwargs from a top-level config (reference checks
    'huber_delta' / 'smooth_l1_beta' keys, base.py:370-375)."""
    if "huber_delta" in config:
        return {"loss_type": "huber", "huber_delta": float(config["huber_delta"])}
    if "smooth_l1_beta" in config:
        return {
            "loss_type": "smooth_l1",
            "smooth_l1_beta": float(config["smooth_l1_beta"]),
        }
    return {"loss_type": "mse"}


# --- DDPM (eps / v-prediction) loss weighting, for SDXL-family models ------


def min_snr_weights(snr, gamma: float, v_prediction: bool):
    """min-SNR-gamma weighting (reference models/sdxl.py:333-344)."""
    snr = snr.astype(jnp.float32)
    clipped = jnp.minimum(snr, gamma)
    if v_prediction:
        return clipped / (snr + 1.0)
    return clipped / jnp.maximum(snr, 1e-8)


def debiased_estimation_weights(snr, v_prediction: bool):
    """Debiased-estimation weighting (reference models/sdxl.py:347-355)."""
    snr = snr.astype(jnp.float32)
    weight = 1.0 / jnp.sqrt(jnp.maximum(snr, 1e-8))
    if v_prediction:
        weight = weight * snr / (snr + 1.0)
    else:
        weight = jnp.minimum(weight, 1000.0 / jnp.maximum(snr, 1e-3))
    return weight
