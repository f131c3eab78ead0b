"""Flow-matching timestep sampling + target construction tests."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_pipe_tpu.training.flow import (
    TimestepDistribution,
    make_flow_matching_inputs,
    rectified_flow_interpolate,
    sample_timesteps,
)


def test_logit_normal_range_and_determinism():
    dist = TimestepDistribution()
    key = jax.random.PRNGKey(0)
    t1 = sample_timesteps(key, 1024, dist)
    t2 = sample_timesteps(key, 1024, dist)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert float(t1.min()) > 0.0 and float(t1.max()) < 1.0
    # logit-normal median is 0.5
    assert abs(float(jnp.median(t1)) - 0.5) < 0.05


def test_quantile_is_deterministic_icdf():
    dist = TimestepDistribution()
    t = sample_timesteps(jax.random.PRNGKey(0), 4, dist, quantile=0.5)
    np.testing.assert_allclose(np.asarray(t), 0.5, atol=1e-5)
    t9 = sample_timesteps(jax.random.PRNGKey(0), 4, dist, quantile=0.9)
    assert float(t9[0]) > 0.7


def test_min_max_t_truncation():
    dist = TimestepDistribution(min_t=0.4, max_t=0.6)
    t = sample_timesteps(jax.random.PRNGKey(1), 512, dist)
    assert float(t.min()) >= 0.4 - 1e-4
    assert float(t.max()) <= 0.6 + 1e-4


def test_shift_transform():
    # t' = s*t / (1 + (s-1)*t); at s=3, t=0.5 -> 0.75
    dist = TimestepDistribution(shift=3.0)
    t = sample_timesteps(jax.random.PRNGKey(0), 4, dist, quantile=0.5)
    np.testing.assert_allclose(np.asarray(t), 0.75, atol=1e-5)


def test_rectified_flow_target():
    latents = jnp.ones((2, 4, 8, 8))
    noise = jnp.zeros_like(latents)
    t = jnp.array([0.25, 1.0])
    x_t, target = rectified_flow_interpolate(latents, noise, t)
    np.testing.assert_allclose(np.asarray(x_t[0]), 0.75)
    np.testing.assert_allclose(np.asarray(x_t[1]), 0.0)
    np.testing.assert_allclose(np.asarray(target), -1.0)


def test_make_flow_matching_inputs_shapes():
    latents = jnp.zeros((3, 16, 8, 8))
    x_t, t, target = make_flow_matching_inputs(jax.random.PRNGKey(0), latents)
    assert x_t.shape == latents.shape
    assert target.shape == latents.shape
    assert t.shape == (3,)
