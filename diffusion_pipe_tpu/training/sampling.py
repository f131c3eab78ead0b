"""Euler flow-matching sampler (reference CommonPipeline.sample,
models/base.py:263-291: diffusers FlowMatchEulerDiscreteScheduler, 20 steps,
optional CFG), run through the SAME forward used in training so the
training graph is validated as the inference graph (reference
train.py:625-631 rationale)."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def flow_sigmas(num_steps: int, shift: Optional[float] = None) -> jnp.ndarray:
    """FlowMatchEulerDiscreteScheduler sigma schedule: linspace 1 -> 1/N,
    optionally shifted sigma' = s*sig / (1 + (s-1)*sig), with terminal 0."""
    sigmas = jnp.linspace(1.0, 1.0 / num_steps, num_steps)
    if shift:
        sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    return jnp.concatenate([sigmas, jnp.zeros((1,))])


def euler_flow_sample(
    velocity_fn: Callable,
    latents_shape,
    key: jax.Array,
    num_steps: int = 20,
    guidance_scale: float = 1.0,
    uncond_velocity_fn: Optional[Callable] = None,
    shift: Optional[float] = None,
):
    """velocity_fn(x, t[B]) -> v prediction (the model's training output:
    v = x0 - x1, pointing from data to noise). Euler step:
    x_{t'} = x + (t' - t) * v."""
    sigmas = flow_sigmas(num_steps, shift)
    x = jax.random.normal(key, latents_shape, jnp.float32)
    b = latents_shape[0]

    def body(i, x):
        t = jnp.full((b,), sigmas[i])
        v = velocity_fn(x, t).astype(jnp.float32)
        if guidance_scale != 1.0 and uncond_velocity_fn is not None:
            vu = uncond_velocity_fn(x, t).astype(jnp.float32)
            v = vu + guidance_scale * (v - vu)
        return x + (sigmas[i + 1] - sigmas[i]) * v

    return jax.lax.fori_loop(0, num_steps, body, x)
