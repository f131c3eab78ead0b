"""SDXL pipeline: DDPM objectives, in-graph CLIP TEs, LoRA/full-FT split."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_pipe_tpu.models import get_model_class
from diffusion_pipe_tpu.training.ddpm import (
    DDPMSchedule,
    enforce_zero_terminal_snr,
    scaled_linear_betas,
    snr_loss_weight,
)
from diffusion_pipe_tpu.training.optimizers import get_optimizer
from diffusion_pipe_tpu.training.train_state import (
    full_ft_predicate,
    lora_predicate,
)
from diffusion_pipe_tpu.training.trainer import init_train_state, make_train_step


def _config(**model_kw):
    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "sdxl", "dtype": "float32", "_tiny": True,
                  **model_kw},
        "adapter": {"type": "lora", "rank": 4, "alpha": 4, "dropout": 0.0},
        "optimizer": {"type": "adamw", "lr": 2e-3},
    }
    return cfg


def _batch(key, b=2):
    pipeline_batch = {
        "latents": jax.random.normal(key, (b, 4, 16, 16)) * 0.3,
        "caption": np.array(["a cat", "a dog"][:b]),
    }
    return pipeline_batch


def test_ddpm_schedule_matches_known_values():
    betas = scaled_linear_betas()
    assert abs(betas[0] - 0.00085) < 1e-6
    assert abs(betas[-1] - 0.012) < 1e-6
    z = enforce_zero_terminal_snr(betas)
    ac = np.cumprod(1 - z)
    assert ac[-1] < 1e-10  # zero terminal SNR

    sched = DDPMSchedule.sdxl()
    lat = jnp.ones((1, 4, 2, 2))
    noise = jnp.zeros_like(lat)
    x0 = sched.add_noise(lat, noise, jnp.array([0]))
    np.testing.assert_allclose(
        float(x0[0, 0, 0, 0]), float(np.sqrt(sched.alphas_cumprod[0])), rtol=1e-6
    )
    v = sched.get_velocity(lat, noise, jnp.array([999]))
    assert np.isfinite(np.asarray(v)).all()


def test_snr_weights():
    sched = DDPMSchedule.sdxl()
    t = jnp.array([10, 500, 990])
    w = snr_loss_weight(sched, t, min_snr_gamma=5.0)
    assert np.asarray(w).shape == (3,)
    assert float(w[0]) < float(w[2])  # low t (high snr) downweighted


def test_sdxl_lora_training_reduces_loss():
    cfg = _config()
    pipeline = get_model_class("sdxl")(cfg)
    optimizer = get_optimizer(cfg)
    state = init_train_state(pipeline, optimizer, jax.random.PRNGKey(0),
                             lora_predicate)
    step = jax.jit(make_train_step(pipeline, optimizer))
    batch = pipeline.host_prepare(_batch(jax.random.PRNGKey(1)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = []
    for _ in range(6):
        state, m = step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_sdxl_full_ft_trains_text_encoders():
    cfg = _config()
    del cfg["adapter"]
    pipeline = get_model_class("sdxl")(cfg)
    optimizer = get_optimizer(cfg)
    state = init_train_state(pipeline, optimizer, jax.random.PRNGKey(0),
                             full_ft_predicate)
    step = jax.jit(make_train_step(pipeline, optimizer))
    batch = pipeline.host_prepare(_batch(jax.random.PRNGKey(1)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    te_before = jax.tree.leaves(state.trainable["params"]["text_encoder"])[0]
    te_before = np.asarray(te_before).copy()
    state, m = step(state, batch, jax.random.PRNGKey(2))
    te_after = np.asarray(
        jax.tree.leaves(state.trainable["params"]["text_encoder"])[0]
    )
    assert not np.array_equal(te_before, te_after)  # TEs are trainable


def test_sdxl_v_pred_and_weights_run():
    cfg = _config(v_pred=True, min_snr_gamma=5.0, zero_terminal_snr=True,
                  debiased_estimation_loss=True)
    pipeline = get_model_class("sdxl")(cfg)
    optimizer = get_optimizer(cfg)
    state = init_train_state(pipeline, optimizer, jax.random.PRNGKey(0),
                             lora_predicate)
    step = jax.jit(make_train_step(pipeline, optimizer))
    batch = pipeline.host_prepare(_batch(jax.random.PRNGKey(1)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, m = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))


def test_sdxl_long_prompt_chunking():
    """_tokenize splits >75-token prompts into [BOS ... EOS pad*] chunks and
    shares ONE tokenizer between TEs (reference sdxl.py:390-393, 742-776)."""

    class StubTok:
        bos_token_id, eos_token_id, pad_token_id = 490, 491, 0

        def __call__(self, text, truncation, add_special_tokens):
            assert truncation is False and add_special_tokens is False
            ids = [10 + (i % 100) for i in range(len(text.split()))]
            return type("E", (), {"input_ids": ids})()

    cfg = _config()
    cfg["model"]["_tiny"] = False  # force the real tokenizer path
    pipeline = get_model_class("sdxl")(cfg)
    pipeline._tokenizer = StubTok()

    short = "word " * 10
    long = "word " * 100  # 100 tokens -> 2 chunks
    ids = pipeline._tokenize([short.strip(), long.strip()])
    assert ids.shape == (2, 2, 77)
    # every chunk starts with BOS
    assert (ids[:, :, 0] == 490).all()
    # short prompt: first chunk has 10 tokens then EOS; second chunk empty
    assert ids[0, 0, 11] == 491 and (ids[0, 0, 12:] == 0).all()
    assert ids[0, 1, 1] == 491  # EOS right after BOS in the empty chunk
    # long prompt: first chunk full 75 tokens + EOS in last slot
    assert (ids[1, 0, 1:76] != 0).all() and ids[1, 0, 76] == 491
    # second chunk has the remaining 25 tokens then EOS
    assert (ids[1, 1, 1:26] != 0).all() and ids[1, 1, 26] == 491

    batch = pipeline.host_prepare({"caption": ["a", "b"]})
    assert batch["input_ids"] is batch["input_ids_2"]  # shared tokenizer


def test_sdxl_multi_chunk_forward():
    """The tiny model accepts [B, C, 77] chunked ids: context length C*77."""
    cfg = _config()
    pipeline = get_model_class("sdxl")(cfg)
    optimizer = get_optimizer(cfg)
    state = init_train_state(pipeline, optimizer, jax.random.PRNGKey(0),
                             lora_predicate)
    step = jax.jit(make_train_step(pipeline, optimizer))
    b = 2
    ids = np.random.default_rng(0).integers(0, 255, (b, 2, 77)).astype(np.int32)
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (b, 4, 16, 16)),
        "input_ids": jnp.asarray(ids),
        "input_ids_2": jnp.asarray(ids),
    }
    state, m = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
