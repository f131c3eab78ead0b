"""Loss function tests (reference models/base.py:364-382 semantics)."""

import jax.numpy as jnp
import numpy as np

from diffusion_pipe_tpu.training.losses import (
    debiased_estimation_weights,
    loss_config_from_model_config,
    masked_loss,
    min_snr_weights,
)


def test_mse_default():
    out = jnp.array([[1.0, 2.0]])
    tgt = jnp.array([[0.0, 0.0]])
    assert float(masked_loss(out, tgt)) == 2.5  # (1+4)/2


def test_mask_multiplies_without_renormalizing():
    out = jnp.ones((1, 4))
    tgt = jnp.zeros((1, 4))
    mask = jnp.array([[1.0, 1.0, 0.0, 0.0]])
    # loss elements [1,1,0,0], plain mean = 0.5 (reference does not renorm)
    assert float(masked_loss(out, tgt, mask)) == 0.5


def test_huber_matches_torch_semantics():
    out = jnp.array([[0.5, 3.0]])
    tgt = jnp.zeros((1, 2))
    # delta=1: 0.5*0.25=0.125 and 1*(3-0.5)=2.5 -> mean 1.3125
    got = float(masked_loss(out, tgt, loss_type="huber", huber_delta=1.0))
    np.testing.assert_allclose(got, 1.3125, rtol=1e-6)


def test_smooth_l1():
    out = jnp.array([[0.5, 3.0]])
    tgt = jnp.zeros((1, 2))
    # beta=1: 0.5*0.25/1=0.125 and 3-0.5=2.5 -> mean 1.3125
    got = float(masked_loss(out, tgt, loss_type="smooth_l1", smooth_l1_beta=1.0))
    np.testing.assert_allclose(got, 1.3125, rtol=1e-6)


def test_loss_config_selection():
    assert loss_config_from_model_config({})["loss_type"] == "mse"
    assert loss_config_from_model_config({"huber_delta": 0.5})["loss_type"] == "huber"
    assert (
        loss_config_from_model_config({"smooth_l1_beta": 2.0})["loss_type"]
        == "smooth_l1"
    )


def test_snr_weightings():
    snr = jnp.array([0.1, 5.0, 100.0])
    w = min_snr_weights(snr, gamma=5.0, v_prediction=False)
    np.testing.assert_allclose(np.asarray(w), [1.0, 1.0, 0.05], rtol=1e-5)
    wv = min_snr_weights(snr, gamma=5.0, v_prediction=True)
    assert float(wv[2]) < float(w[2]) + 1  # bounded
    d = debiased_estimation_weights(snr, v_prediction=False)
    assert np.all(np.isfinite(np.asarray(d)))
