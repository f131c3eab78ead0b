"""All registered pipelines: one jitted train step runs and is finite."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pipe_tpu.models import get_model_class
from diffusion_pipe_tpu.training.optimizers import get_optimizer
from diffusion_pipe_tpu.training.train_state import lora_predicate
from diffusion_pipe_tpu.training.trainer import init_train_state, make_train_step


def _cfg(model_type):
    return {
        "save_every_n_epochs": 1,
        "model": {"type": model_type, "dtype": "float32", "_tiny": True},
        "adapter": {"type": "lora", "rank": 4, "alpha": 4, "dropout": 0.0},
        "optimizer": {"type": "adamw", "lr": 1e-3},
    }


def _batch_for(name, pipeline):
    k = jax.random.PRNGKey(1)
    if name == "chroma":
        return {
            "latents": jax.random.normal(k, (2, 16, 8, 8)),
            "t5_embed": jax.random.normal(k, (2, 8, 64)),
            "t5_mask": jnp.ones((2, 8), jnp.int32),
        }
    if name == "sd3":
        return {
            "latents": jax.random.normal(k, (2, 16, 8, 8)),
            "prompt_embed": jax.random.normal(k, (2, 8, 24)),
            "prompt_2_embed": jax.random.normal(k, (2, 8, 24)),
            "pooled_prompt_embed": jax.random.normal(k, (2, 16)),
            "pooled_prompt_2_embed": jax.random.normal(k, (2, 16)),
            "t5_prompt_embed": jax.random.normal(k, (2, 8, 64)),
        }
    if name == "qwen_image":
        return {
            "latents": jax.random.normal(k, (2, 16, 1, 8, 8)),
            "prompt_embeds": jax.random.normal(k, (2, 8, 48)),
            "prompt_embeds_mask": jnp.ones((2, 8), jnp.int32),
        }
    if name == "hidream":
        return {
            "latents": jax.random.normal(k, (2, 16, 8, 8)) * 0.5,
            "t5_embeds": jax.random.normal(k, (2, 8, 16)),
            "pooled": jax.random.normal(k, (2, 16)),
            "llama_embeds": jax.random.normal(k, (2, 2, 8, 24)),
        }
    if name == "cosmos":
        return {
            "latents": jax.random.normal(k, (2, 16, 1, 8, 8)) * 0.5,
            "prompt_embeds": jax.random.normal(k, (2, 8, 32)),
        }
    if name == "cosmos_predict2":
        return {
            "latents": jax.random.normal(k, (2, 16, 1, 8, 8)),
            "t5_embed": jax.random.normal(k, (2, 8, 32)),
        }
    if name == "ltx-video":
        return {
            "latents": jax.random.normal(k, (2, 16, 2, 4, 4)),
            "prompt_embeds": jax.random.normal(k, (2, 8, 32)),
            "prompt_attention_mask": jnp.ones((2, 8), jnp.int32),
        }
    if name == "hunyuan_image":
        return {
            "latents": jax.random.normal(k, (2, 8, 8, 8)),
            "text_states": jax.random.normal(k, (2, 8, 32)),
            "text_mask": jnp.ones((2, 8), jnp.int32),
            "byt5_states": jax.random.normal(k, (2, 4, 16)),
            "byt5_mask": jnp.ones((2, 4), jnp.int32),
        }
    if name == "hunyuan_video_15":
        return {
            "latents": jax.random.normal(k, (2, 4, 2, 8, 8)),
            "text_states": jax.random.normal(k, (2, 8, 32)),
            "text_mask": jnp.ones((2, 8), jnp.int32),
            "byt5_states": jax.random.normal(k, (2, 4, 16)),
            "byt5_mask": jnp.ones((2, 4), jnp.int32),
        }
    if name == "ernie_image":
        return {
            "latents": jax.random.normal(k, (2, 4, 8, 8)),
            "text_embeds_0": jax.random.normal(k, (2, 8, 24)),
            "attention_mask_0": jnp.ones((2, 8), jnp.int32),
        }
    if name == "ideogram4":
        return {
            "latents": jax.random.normal(k, (2, 16, 4, 4)),
            "text_embeds_0": jax.random.normal(k, (2, 8, 24)),
            "attention_mask_0": jnp.ones((2, 8), jnp.int32),
        }
    if name == "krea2":
        return {
            "latents": jax.random.normal(k, (2, 4, 8, 8)),
            "text_embeds_0": jax.random.normal(k, (2, 8, 24)),
            "attention_mask_0": jnp.ones((2, 8), jnp.int32),
        }
    if name == "ltx2":
        return {
            "latents": jax.random.normal(k, (2, 16, 2, 4, 4)),
            "text_embeds_0": jax.random.normal(k, (2, 8, 24)),
            "attention_mask_0": jnp.ones((2, 8), jnp.int32),
        }
    if name == "flux2":
        return {
            "latents": jax.random.normal(k, (2, 4, 8, 8)),
            "text_embeds_0": jax.random.normal(k, (2, 8, 24)),
        }
    if name == "auraflow":
        return {
            "latents": jax.random.normal(k, (2, 4, 8, 8)),
            "prompt_embeds": jax.random.normal(k, (2, 8, 24)),
        }
    if name == "omnigen2":
        return {
            "latents": jax.random.normal(k, (2, 16, 8, 8)),
            "prompt_embeds": jax.random.normal(k, (2, 8, 32)),
            "prompt_attention_mask": jnp.ones((2, 8), jnp.int32),
        }
    if name == "z_image":
        return {
            "latents": jax.random.normal(k, (2, 16, 8, 8)),
            "text_embeds_0": jax.random.normal(k, (2, 8, 32)),
            "attention_mask_0": jnp.ones((2, 8), jnp.int32),
        }
    if name == "lumina_2":
        return {
            "latents": jax.random.normal(k, (2, 16, 8, 8)),
            "cap_feats": jax.random.normal(k, (2, 8, 32)),
            "cap_mask": jnp.ones((2, 8), jnp.int32),
        }
    if name == "hunyuan-video":
        return {
            "latents": jax.random.normal(k, (2, 16, 5, 16, 16)),
            "text_states": jax.random.normal(k, (2, 16, 32)),
            "text_mask": jnp.ones((2, 16), jnp.int32),
            "clip_pooled": jax.random.normal(k, (2, 16)),
        }
    raise NotImplementedError(name)


@pytest.mark.parametrize("model_type", ["chroma", "sd3", "hunyuan-video", "qwen_image", "cosmos", "cosmos_predict2", "ltx-video", "lumina_2", "hidream", "auraflow", "hunyuan_image", "hunyuan_video_15", "omnigen2", "z_image", "flux2", "ernie_image", "ideogram4", "krea2", "ltx2"])
def test_one_train_step(model_type):
    cfg = _cfg(model_type)
    pipeline = get_model_class(model_type)(cfg)
    optimizer = get_optimizer(cfg)
    state = init_train_state(pipeline, optimizer, jax.random.PRNGKey(0),
                             lora_predicate)
    step = jax.jit(make_train_step(pipeline, optimizer))
    batch = _batch_for(model_type, pipeline)
    losses = []
    for _ in range(4):
        state, m = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.2, losses


def test_unknown_model_raises():
    with pytest.raises(NotImplementedError):
        get_model_class("nope")
