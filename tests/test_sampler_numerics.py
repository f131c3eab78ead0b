"""Sampler NUMERICS vs independent numpy replicas of the reference math.

The shape/finiteness tests (test_sampling_models.py) prove every family's
sampler runs; these tests anchor the step MATH:

- Euler flow sampler vs a numpy reimplementation of diffusers
  FlowMatchEulerDiscreteScheduler as the reference configures it
  (reference models/base.py:178-184: shift=3, set_timesteps(sigmas=
  linspace(1, 1/N, N)); step: x += (sigma_next - sigma) * v).
- SDXL DDIM (eta=0) sampler vs a numpy DDIMScheduler step loop driven by
  the SAME tiny UNet predictions, for both eps and v-prediction
  (reference models/sdxl.py DDPM math; diffusers DDIMScheduler.step with
  eta=0 and set_alpha_to_one -> final alpha_prod 1.0).
- Cosmos EDM Karras sigma schedule vs the EDM paper formula (rho=7).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pipe_tpu.models import get_model_class
from diffusion_pipe_tpu.training.sampling import euler_flow_sample, flow_sigmas


def _np_flow_sigmas(num_steps, shift=None):
    """diffusers FlowMatchEulerDiscreteScheduler.set_timesteps with explicit
    sigmas=linspace(1, 1/N, N): applies the static shift map
    s' = shift*s / (1 + (shift-1)*s), then appends the terminal 0."""
    s = np.linspace(1.0, 1.0 / num_steps, num_steps, dtype=np.float64)
    if shift:
        s = shift * s / (1 + (shift - 1) * s)
    return np.concatenate([s, [0.0]])


@pytest.mark.parametrize("shift", [None, 3.0])
def test_flow_sigmas_match_diffusers_formula(shift):
    ours = np.asarray(flow_sigmas(20, shift))
    ref = _np_flow_sigmas(20, shift)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-6)


@pytest.mark.parametrize("shift,cfg", [(None, 1.0), (3.0, 1.0), (3.0, 2.5)])
def test_euler_flow_sampler_matches_numpy_trajectory(shift, cfg):
    """Linear toy velocity fields (exact in fp32) through euler_flow_sample
    vs a numpy Euler loop over the diffusers sigma schedule."""
    num_steps = 8
    shape = (2, 3, 4)
    key = jax.random.PRNGKey(42)

    a_c, b_c = 0.7, -0.3          # conditional field v = a*x + b*t
    a_u, b_u = 0.2, 0.5           # unconditional field

    def v_cond(x, t):
        return a_c * x + b_c * t.reshape((-1,) + (1,) * (x.ndim - 1))

    def v_uncond(x, t):
        return a_u * x + b_u * t.reshape((-1,) + (1,) * (x.ndim - 1))

    out = euler_flow_sample(
        v_cond, shape, key, num_steps=num_steps, guidance_scale=cfg,
        uncond_velocity_fn=v_uncond if cfg != 1.0 else None, shift=shift,
    )

    # numpy replica, same initial noise
    sig = _np_flow_sigmas(num_steps, shift)
    x = np.asarray(jax.random.normal(key, shape, jnp.float32), np.float64)
    for i in range(num_steps):
        t = sig[i]
        v = a_c * x + b_c * t
        if cfg != 1.0:
            vu = a_u * x + b_u * t
            v = vu + cfg * (v - vu)
        x = x + (sig[i + 1] - sig[i]) * v

    np.testing.assert_allclose(np.asarray(out, np.float64), x,
                               rtol=2e-5, atol=2e-5)


def _sdxl_cfg(v_pred):
    return {
        "save_every_n_epochs": 1,
        "model": {"type": "sdxl", "dtype": "float32", "_tiny": True,
                  "v_pred": v_pred},
        "adapter": {"type": "lora", "rank": 4, "alpha": 4, "dropout": 0.0},
        "optimizer": {"type": "adamw", "lr": 1e-3},
    }


@pytest.mark.parametrize("v_pred", [False, True])
def test_sdxl_ddim_matches_numpy_ddim(v_pred):
    """Run the SDXL sampler, then replay the SAME UNet predictions through
    a numpy DDIM(eta=0) loop (diffusers DDIMScheduler step: x0/eps split,
    x_prev = sqrt(a_prev) x0 + sqrt(1-a_prev) eps, final a_prev = 1)."""
    pipe = get_model_class("sdxl")(_sdxl_cfg(v_pred))
    params = pipe.init_params(jax.random.PRNGKey(0))
    num_steps, width, height = 4, 64, 64
    key = jax.random.PRNGKey(2)

    lat = np.asarray(pipe.sample(
        params, width=width, height=height, key=key, num_steps=num_steps,
        caption="a cat"))

    # --- numpy replica driving the same UNet forward ---
    p = params["params"]
    ids = jnp.asarray(pipe._tokenize(["a cat"]))
    ctx, pooled = pipe.encode_text(p, ids, ids)
    add_time_ids = jnp.asarray(
        [[height, width, 0, 0, height, width]], jnp.float32)

    # float32 throughout to mirror the sampler's in-graph precision — the
    # comparison targets the DDIM update MATH, not accumulation precision
    # (a float64 replica drifts ~1e-3 relative over the trajectory).
    ac = np.asarray(pipe.schedule.alphas_cumprod, np.float32)
    n_train = pipe.schedule.num_train_timesteps
    steps = np.linspace(n_train - 1, 0, num_steps).astype(np.int32)

    def unet(x, t):
        return np.asarray(pipe.model.apply(
            {"params": p["unet"]}, jnp.asarray(x, jnp.float32),
            jnp.full((1,), int(t)), ctx, pooled, add_time_ids,
        ), np.float32)

    x = np.asarray(
        jax.random.normal(key, (1, 4, height // 8, width // 8), jnp.float32))
    for i, t in enumerate(steps):
        pred = unet(x, t)
        a = np.float32(np.sqrt(ac[t]))
        o = np.float32(np.sqrt(np.float32(1.0) - ac[t]))
        if v_pred:
            x0 = a * x - o * pred
            eps = o * x + a * pred
        else:
            eps = pred
            x0 = (x - o * eps) / a
        a_prev = ac[steps[i + 1]] if i + 1 < num_steps else np.float32(1.0)
        x = np.float32(np.sqrt(a_prev)) * x0 \
            + np.float32(np.sqrt(np.float32(1.0) - a_prev)) * eps

    np.testing.assert_allclose(lat, x, rtol=2e-4, atol=2e-4)


def test_cosmos_karras_sigma_schedule():
    """The cosmos EDM sampler's sigma grid is the EDM paper's Karras
    schedule (rho=7, [0.002, 80]); replicate in numpy and assert the
    in-sampler constants match (reference models/cosmos.py EDM setup)."""
    num_steps = 12
    rho, s_min, s_max = 7.0, 0.002, 80.0
    i = np.arange(num_steps, dtype=np.float64)
    ref = (s_max ** (1 / rho) + i / (num_steps - 1)
           * (s_min ** (1 / rho) - s_max ** (1 / rho))) ** rho
    ref = np.concatenate([ref, [0.0]])

    ii = jnp.arange(num_steps)
    ours = (s_max ** (1 / rho) + ii / max(num_steps - 1, 1)
            * (s_min ** (1 / rho) - s_max ** (1 / rho))) ** rho
    ours = np.asarray(jnp.concatenate([ours, jnp.zeros((1,))]))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    # and the sampler's Euler-in-sigma update on a linear x0 predictor:
    # d = (x - x0(x)) / sigma; x <- x + (sig_next - sig) * d
    c = 0.4

    def x0_fn(x):
        return c * x

    x = np.float64(1.7) * np.ones((2, 2))
    xs = [x]
    for j in range(num_steps):
        d = (x - x0_fn(x)) / ref[j]
        x = x + (ref[j + 1] - ref[j]) * d
        xs.append(x)

    xj = jnp.full((2, 2), 1.7, jnp.float64) if jax.config.jax_enable_x64 \
        else jnp.full((2, 2), 1.7, jnp.float32)
    for j in range(num_steps):
        sig = ours[j]
        d = (xj - c * xj) / sig
        xj = xj + (ours[j + 1] - sig) * d
    np.testing.assert_allclose(np.asarray(xj), xs[-1], rtol=2e-4, atol=1e-6)
