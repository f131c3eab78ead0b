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

    # Share ONE init across both configs: the int8 config carries extra
    # kernel_scale params, and under nn.scan's split_rngs any param-count
    # change reshuffles every layer's init keys — so cross-config init
    # equality must be established explicitly (flax ignores the extra
    # kernel_scale leaves when the non-int8 model applies these params).
    shared = {}

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
        if "params" not in shared:
            # init from the int8 config: its params are a superset
            # (kernel_scale) of the bf16 config's
            assert int8, "call losses with the int8 config first"
            shared["params"] = pipe.init_params(jax.random.PRNGKey(0))
        # copy: init_train_state donates frozen kernels into the int8
        # prequantization, which would delete the shared leaves
        params = jax.tree.map(jnp.array, shared["params"])
        if not int8:
            # drop the int8-only scale params so the bf16 run neither
            # prequantizes nor carries unused leaves
            from flax import traverse_util

            flat = traverse_util.flatten_dict(params)
            params = traverse_util.unflatten_dict(
                {k: v for k, v in flat.items() if k[-1] != "kernel_scale"}
            )
        state = init_train_state(pipe, opt, jax.random.PRNGKey(0),
                                 lora_predicate, params=params)
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

    l_i8 = losses("fwd_bwd")
    l_bf = losses(False)
    assert np.isfinite(l_i8).all()
    assert l_i8[-1] < l_i8[0], l_i8
    # trajectories agree to quantization noise
    np.testing.assert_allclose(l_i8, l_bf, rtol=0.05)
