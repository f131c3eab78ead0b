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


def _m(b, n=8, valid=5):
    return jnp.concatenate(
        [jnp.ones((b, valid), jnp.int32), jnp.zeros((b, n - valid), jnp.int32)],
        1)


def _run(t, expect_shape, width=64, height=64, **embeds):
    pipe = get_model_class(t)(_cfg(t))
    params = pipe.init_params(jax.random.PRNGKey(0))
    lat = pipe.sample(
        params, width=width, height=height, key=jax.random.PRNGKey(2),
        num_steps=3, **embeds)
    assert lat.shape == expect_shape, (t, lat.shape)
    assert np.isfinite(np.asarray(lat)).all(), t


def test_chroma_sample():
    k = jax.random.PRNGKey(1)
    _run("chroma", (1, 16, 8, 8),
         t5_embed=jax.random.normal(k, (1, 8, 64)), t5_mask=_m(1))


def test_hunyuan_video_sample():
    k = jax.random.PRNGKey(1)
    _run("hunyuan-video", (1, 16, 1, 8, 8),
         text_states=jax.random.normal(k, (1, 8, 32)),
         text_mask=_m(1), clip_pooled=jax.random.normal(k, (1, 16)))


def test_qwen_image_sample():
    k = jax.random.PRNGKey(1)
    _run("qwen_image", (1, 16, 8, 8),
         prompt_embeds=jax.random.normal(k, (1, 8, 48)),
         prompt_embeds_mask=_m(1))


def test_auraflow_sample():
    k = jax.random.PRNGKey(1)
    _run("auraflow", (1, 4, 8, 8),
         prompt_embeds=jax.random.normal(k, (1, 8, 24)))


def test_ltx_video_sample():
    k = jax.random.PRNGKey(1)
    _run("ltx-video", (1, 16, 2, 4, 4), width=128, height=128,
         num_frames=9,
         prompt_embeds=jax.random.normal(k, (1, 8, 32)),
         prompt_attention_mask=_m(1))


def test_hidream_sample():
    k = jax.random.PRNGKey(1)
    _run("hidream", (1, 16, 8, 8),
         t5_embeds=jax.random.normal(k, (1, 8, 16)),
         pooled=jax.random.normal(k, (1, 16)),
         llama_embeds=jax.random.normal(k, (1, 2, 8, 24)))


def test_flux2_sample():
    k = jax.random.PRNGKey(1)
    _run("flux2", (1, 4, 8, 8),
         text_embeds_0=jax.random.normal(k, (1, 8, 24)))


def test_ernie_image_sample():
    k = jax.random.PRNGKey(1)
    _run("ernie_image", (1, 4, 8, 8),
         text_embeds_0=jax.random.normal(k, (1, 8, 24)),
         attention_mask_0=_m(1))


def test_ideogram4_sample():
    k = jax.random.PRNGKey(1)
    _run("ideogram4", (1, 16, 4, 4),
         text_embeds_0=jax.random.normal(k, (1, 8, 24)),
         attention_mask_0=_m(1))


def test_krea2_sample():
    k = jax.random.PRNGKey(1)
    _run("krea2", (1, 4, 8, 8),
         text_embeds_0=jax.random.normal(k, (1, 8, 24)),
         attention_mask_0=_m(1))


def test_ltx2_sample():
    k = jax.random.PRNGKey(1)
    _run("ltx2", (1, 16, 2, 4, 4), width=128, height=128, num_frames=9,
         text_embeds_0=jax.random.normal(k, (1, 8, 24)),
         attention_mask_0=_m(1))


def test_hunyuan_image_sample():
    k = jax.random.PRNGKey(1)
    _run("hunyuan_image", (1, 8, 8, 8), width=256, height=256,
         text_states=jax.random.normal(k, (1, 8, 32)),
         text_mask=_m(1),
         byt5_states=jax.random.normal(k, (1, 4, 16)),
         byt5_mask=jnp.ones((1, 4), jnp.int32))


def test_hunyuan_video_15_sample():
    k = jax.random.PRNGKey(1)
    _run("hunyuan_video_15", (1, 4, 2, 8, 8), width=128, height=128,
         num_frames=5,
         text_states=jax.random.normal(k, (1, 8, 32)),
         text_mask=_m(1),
         byt5_states=jax.random.normal(k, (1, 4, 16)),
         byt5_mask=jnp.ones((1, 4), jnp.int32))


def test_cosmos_predict2_sample():
    k = jax.random.PRNGKey(1)
    _run("cosmos_predict2", (1, 16, 1, 8, 8),
         t5_embed=jax.random.normal(k, (1, 8, 32)))


def test_cosmos_edm_sample():
    k = jax.random.PRNGKey(1)
    _run("cosmos", (1, 16, 1, 8, 8),
         prompt_embeds=jax.random.normal(k, (1, 8, 32)))


def test_omnigen2_sample_via_aliased_keys():
    k = jax.random.PRNGKey(1)
    _run("omnigen2", (1, 16, 8, 8),
         prompt_embeds=jax.random.normal(k, (1, 8, 32)),
         prompt_attention_mask=_m(1))


def test_z_image_sample_via_aliased_keys():
    k = jax.random.PRNGKey(1)
    _run("z_image", (1, 16, 8, 8),
         text_embeds_0=jax.random.normal(k, (1, 8, 32)),
         attention_mask_0=_m(1))


def test_sdxl_sample_ddim():
    pipe = get_model_class("sdxl")(_cfg("sdxl"))
    params = pipe.init_params(jax.random.PRNGKey(0))
    lat = pipe.sample(
        params, width=64, height=64, key=jax.random.PRNGKey(2),
        num_steps=3, caption="a photo of a cat")
    assert lat.shape == (1, 4, 8, 8)
    assert np.isfinite(np.asarray(lat)).all()
