"""Dynamic W8A8 int8 matmul for frozen kernels: accuracy + training path."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_pipe_tpu.models.layers import int8_dot


def test_int8_dot_accuracy():
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 128))
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 64)) * 0.05
    y8 = np.asarray(int8_dot(x, w))
    yb = np.asarray(x @ w)
    rel = np.abs(y8 - yb).max() / np.abs(yb).max()
    assert rel < 0.02, rel


def test_int8_dot_backward_is_straight_through():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
    w = jax.random.normal(jax.random.PRNGKey(1), (32, 16)) * 0.1
    g = jax.grad(lambda x_: jnp.sum(jnp.sin(int8_dot(x_, w))))(x)
    gref = jax.grad(lambda x_: jnp.sum(jnp.sin(x_ @ w)))(x)
    rel = float(jnp.abs(g - gref).max() / jnp.abs(gref).max())
    assert rel < 0.05, rel
    # frozen kernel gets zero grad (no wgrad path)
    gw = jax.grad(lambda w_: jnp.sum(int8_dot(x, w_)))(w)
    assert float(jnp.abs(gw).max()) == 0.0


def test_int8_bwd8_grad_close():
    from diffusion_pipe_tpu.models.layers import int8_dot_bwd8

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
    w = jax.random.normal(jax.random.PRNGKey(1), (32, 16)) * 0.1
    g = jax.grad(lambda x_: jnp.sum(jnp.sin(int8_dot_bwd8(x_, w))))(x)
    gref = jax.grad(lambda x_: jnp.sum(jnp.sin(x_ @ w)))(x)
    rel = float(jnp.abs(g - gref).max() / jnp.abs(gref).max())
    assert rel < 0.05, rel


def test_int8_flux_trains_close_to_bf16():
    from diffusion_pipe_tpu.models import get_model_class
    from diffusion_pipe_tpu.training.optimizers import get_optimizer
    from diffusion_pipe_tpu.training.train_state import lora_predicate
    from diffusion_pipe_tpu.training.trainer import (
        init_train_state,
        make_train_step,
    )

    def losses(int8):
        cfg = {
            "save_every_n_epochs": 1,
            "model": {"type": "flux", "dtype": "float32", "_tiny": True,
                      "int8_matmul": int8},
            "adapter": {"type": "lora", "rank": 4, "alpha": 4, "dropout": 0.0},
            "optimizer": {"type": "adamw", "lr": 2e-3},
        }
        pipe = get_model_class("flux")(cfg)
        opt = get_optimizer(cfg)
        state = init_train_state(pipe, opt, jax.random.PRNGKey(0),
                                 lora_predicate)
        step = jax.jit(make_train_step(pipe, opt))
        k = jax.random.PRNGKey(1)
        batch = {"latents": jax.random.normal(k, (2, 16, 8, 8)) * 0.5,
                 "t5_embed": jax.random.normal(k, (2, 8, 64)),
                 "clip_embed": jax.random.normal(k, (2, 32))}
        out = []
        for _ in range(6):
            state, m = step(state, batch, jax.random.PRNGKey(7))
            out.append(float(m["loss"]))
        return out

    l_bf = losses(False)
    l_i8 = losses("fwd_bwd")
    assert np.isfinite(l_i8).all()
    assert l_i8[-1] < l_i8[0], l_i8
    # trajectories agree to quantization noise
    np.testing.assert_allclose(l_i8, l_bf, rtol=0.05)
