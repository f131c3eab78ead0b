"""Sequence parallelism (`sequence_sharding = true`): token-dim activation
sharding over 'tensor' is numerics-neutral for every video family on a
data=4 x tensor=2 mesh (flux is covered by the driver dryrun; wan by
tests/test_wan.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pipe_tpu.mesh import make_mesh
from diffusion_pipe_tpu.models import get_model_class


def _hv_batch(b):
    k = jax.random.PRNGKey(1)
    return {
        "latents": jax.random.normal(k, (b, 16, 1, 8, 8)),
        "text_states": jax.random.normal(k, (b, 8, 32)),
        "text_mask": jnp.ones((b, 8), jnp.int32),
        "clip_pooled": jax.random.normal(k, (b, 16)),
    }


def _cosmos_batch(b):
    k = jax.random.PRNGKey(1)
    return {
        "latents": jax.random.normal(k, (b, 16, 1, 8, 8)),
        "t5_embed": jax.random.normal(k, (b, 8, 32)),
    }


def _ltx_batch(b):
    k = jax.random.PRNGKey(1)
    return {
        "latents": jax.random.normal(k, (b, 16, 2, 4, 4)),
        "prompt_embeds": jax.random.normal(k, (b, 8, 32)),
        "prompt_attention_mask": jnp.ones((b, 8), jnp.int32),
    }


def _te0_batch(shape, tdim=24):
    def fn(b):
        k = jax.random.PRNGKey(1)
        return {
            "latents": jax.random.normal(k, (b,) + shape),
            "text_embeds_0": jax.random.normal(k, (b, 8, tdim)),
            "attention_mask_0": jnp.ones((b, 8), jnp.int32),
        }
    return fn


def _byt5_batch(shape):
    def fn(b):
        k = jax.random.PRNGKey(1)
        return {
            "latents": jax.random.normal(k, (b,) + shape),
            "text_states": jax.random.normal(k, (b, 8, 32)),
            "text_mask": jnp.ones((b, 8), jnp.int32),
            "byt5_states": jax.random.normal(k, (b, 4, 16)),
            "byt5_mask": jnp.ones((b, 4), jnp.int32),
        }
    return fn


FAMILIES = [
    ("hunyuan-video", _hv_batch),
    ("cosmos_predict2", _cosmos_batch),
    ("ltx-video", _ltx_batch),
    ("ltx2", _te0_batch((16, 2, 4, 4))),
    ("hunyuan_video_15", _byt5_batch((4, 2, 8, 8))),
]


@pytest.mark.parametrize("model_type,batch_fn", FAMILIES)
def test_sequence_sharding_loss_matches_unsharded(model_type, batch_fn):
    mesh = make_mesh(pipeline_stages=1, tensor_parallel=2)
    losses = {}
    for flag in (False, True):
        cfg = {
            "save_every_n_epochs": 1,
            "model": {"type": model_type, "dtype": "float32", "_tiny": True},
            "adapter": {"type": "lora", "rank": 4, "alpha": 4,
                        "dropout": 0.0},
            "optimizer": {"type": "adamw", "lr": 1e-3},
            "sequence_sharding": flag,
        }
        pipe = get_model_class(model_type)(cfg)
        params = pipe.init_params(jax.random.PRNGKey(0))
        batch = batch_fn(4)

        def loss(params, batch, rng):
            mi, tgt, msk = pipe.prepare_inputs(rng, batch)
            return pipe.loss_fn(pipe.forward(params, mi), tgt, msk)

        with jax.set_mesh(mesh):
            losses[flag] = float(
                jax.jit(loss)(params, batch, jax.random.PRNGKey(7)))
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=1e-5, atol=1e-6)
