"""GenericOptim modes, optax fallback, gradient release."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from diffusion_pipe_tpu.training.generic_optim import (
    _project,
    _project_back,
    _svd_projector,
    scale_by_generic,
)
from diffusion_pipe_tpu.training.optimizers import get_optimizer


def _quadratic_losses(opt, steps=30, shape=(8, 16)):
    target = jax.random.normal(jax.random.PRNGKey(0), shape)
    params = {"w": jnp.zeros(shape)}
    state = opt.init(params)

    def loss(p):
        return jnp.mean((p["w"] - target) ** 2)

    losses = []
    for _ in range(steps):
        l, g = jax.value_and_grad(loss)(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(l))
    return losses


@pytest.mark.parametrize("second", ["ema", "adagrad", "sn", "factored", "none"])
def test_generic_second_moment_modes_converge(second):
    # 'none' mode is plain EMA-momentum SGD on raw grads: needs a much
    # larger step size than the normalized modes
    opt = optax.chain(
        scale_by_generic(second_moment_type=second),
        optax.scale(-20.0 if second == "none" else -0.05),
    )
    losses = _quadratic_losses(opt, steps=60 if second == "none" else 30)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, (second, losses[:3], losses[-3:])


@pytest.mark.parametrize("proj", ["svd", "uniform", "topk"])
def test_subspace_momentum_converges(proj):
    # subspace momentum is paired with the subset-norm second moment as in
    # the Subset-Norm & Subspace-Momentum recipe the reference implements
    # (elementwise EMA denominators amplify off-subspace components)
    opt = optax.chain(
        scale_by_generic(rank=4, proj_type=proj, update_proj_gap=10,
                         second_moment_type="sn"),
        optax.scale(-0.05),
    )
    losses = _quadratic_losses(opt, steps=40)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, (proj, losses[:3], losses[-3:])


def test_svd_projector_orthonormal_and_roundtrip():
    g = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 16))  # stacked
    p = _svd_projector(g, 4)
    assert p.shape == (3, 8, 4)
    ptp = jnp.einsum("lmr,lms->lrs", p, p)
    np.testing.assert_allclose(
        np.asarray(ptp), np.tile(np.eye(4), (3, 1, 1)), atol=1e-5
    )
    proj = _project(p, g)
    assert proj.shape == (3, 4, 16)
    back = _project_back(p, proj)
    assert back.shape == g.shape
    # projecting back and forth again is idempotent
    np.testing.assert_allclose(
        np.asarray(_project(p, back)), np.asarray(proj), atol=1e-5
    )


def test_factory_genericoptim_and_aliases():
    for otype, key in [("genericoptim", "rank"), ("adafactor", None),
                       ("adagrad", None)]:
        ocfg = {"type": otype, "lr": 1e-3}
        if key:
            ocfg.update(rank=2, proj_type="svd", update_proj_gap=5,
                        second_moment_type="sn")
        cfg = {"optimizer": ocfg, "save_every_n_epochs": 1}
        opt = get_optimizer(cfg)
        losses = _quadratic_losses(opt, steps=25)
        assert np.isfinite(losses).all() and losses[-1] < losses[0], otype


def test_offload_optimizer_matches_adamw():
    """optimizer.type = "offload" (reference train.py:677-681, torchao
    CPUOffloadOptimizer wrapping AdamW): host-resident optimizer state,
    UNCHANGED update math — a seeded train trajectory is bit-identical to
    type = "adamw" (on CPU the host round-trip is the identity; on TPU it
    is device_put to/from jax.memory.Space.Host, which preserves values)."""
    common = {"lr": 1e-3, "betas": [0.9, 0.99], "weight_decay": 0.02}
    opt_off = get_optimizer({"optimizer": {"type": "offload", **common},
                             "save_every_n_epochs": 1})
    opt_ref = get_optimizer({"optimizer": {"type": "adamw", **common},
                             "save_every_n_epochs": 1})
    losses_off = _quadratic_losses(opt_off, steps=20)
    losses_ref = _quadratic_losses(opt_ref, steps=20)
    np.testing.assert_array_equal(losses_off, losses_ref)
    assert losses_off[-1] < losses_off[0]


def test_factory_optax_fallback_prodigy_lion():
    for otype in ("prodigy", "lion"):
        cfg = {"optimizer": {"type": otype, "lr": 1e-2},
               "save_every_n_epochs": 1}
        opt = get_optimizer(cfg)
        losses = _quadratic_losses(opt, steps=25)
        assert np.isfinite(losses).all() and losses[-1] < losses[0], otype


def test_gradient_release_trains_tiny_flux():
    from diffusion_pipe_tpu.models import get_model_class
    from diffusion_pipe_tpu.training.train_state import lora_predicate
    from diffusion_pipe_tpu.training.trainer import (
        init_train_state,
        make_train_step,
    )

    cfg = {
        "save_every_n_epochs": 1,
        "gradient_accumulation_steps": 2,
        "model": {"type": "flux", "dtype": "float32", "_tiny": True},
        "adapter": {"type": "lora", "rank": 4, "alpha": 4, "dropout": 0.0},
        "optimizer": {"type": "adamw", "lr": 2e-3, "gradient_release": True},
    }
    pipe = get_model_class("flux")(cfg)
    opt = get_optimizer(cfg)
    state = init_train_state(pipe, opt, jax.random.PRNGKey(0), lora_predicate)
    step = jax.jit(make_train_step(
        pipe, opt, gradient_accumulation_steps=2, gradient_release=True,
    ))
    k = jax.random.PRNGKey(1)
    batch = {
        "latents": jax.random.normal(k, (4, 16, 8, 8)) * 0.5,
        "t5_embed": jax.random.normal(k, (4, 8, 64)),
        "clip_embed": jax.random.normal(k, (4, 32)),
    }
    losses = []
    for _ in range(6):
        state, m = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0], losses
