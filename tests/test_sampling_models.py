"""Per-model Euler sampling paths (--test_sample surface)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_pipe_tpu.models import get_model_class


def _cfg(t):
    return {
        "save_every_n_epochs": 1,
        "model": {"type": t, "dtype": "float32", "_tiny": True},
        "adapter": {"type": "lora", "rank": 4, "alpha": 4, "dropout": 0.0},
        "optimizer": {"type": "adamw", "lr": 1e-3},
    }


def test_sd3_sample_shape_finite():
    pipe = get_model_class("sd3")(_cfg("sd3"))
    params = pipe.init_params(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(1)
    embeds = {
        "prompt_embed": jax.random.normal(k, (1, 8, 24)),
        "prompt_2_embed": jax.random.normal(k, (1, 8, 24)),
        "pooled_prompt_embed": jax.random.normal(k, (1, 16)),
        "pooled_prompt_2_embed": jax.random.normal(k, (1, 16)),
        "t5_prompt_embed": jax.random.normal(k, (1, 8, 64)),
    }
    lat = pipe.sample(params, width=64, height=64, key=jax.random.PRNGKey(2),
                      num_steps=4, **embeds)
    assert lat.shape == (1, 16, 8, 8)
    assert np.isfinite(np.asarray(lat)).all()


def test_lumina2_sample_shape_finite():
    pipe = get_model_class("lumina_2")(_cfg("lumina_2"))
    params = pipe.init_params(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(1)
    lat = pipe.sample(
        params, width=64, height=64, key=jax.random.PRNGKey(2), num_steps=4,
        cap_feats=jax.random.normal(k, (1, 8, 32)),
        cap_mask=jnp.ones((1, 8), jnp.int32),
    )
    assert lat.shape == (1, 16, 8, 8)
    assert np.isfinite(np.asarray(lat)).all()


def test_wan_sample_shape_finite():
    pipe = get_model_class("wan")(_cfg("wan"))
    params = pipe.init_params(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(1)
    lat = pipe.sample(
        params, width=64, height=64, key=jax.random.PRNGKey(2), num_steps=4,
        num_frames=5,
        text_embeddings=jax.random.normal(k, (1, 10, 32)),
    )
    assert lat.shape == (1, 16, 2, 8, 8)
    assert np.isfinite(np.asarray(lat)).all()
