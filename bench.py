"""Benchmark: Flux-dev-shaped LoRA training throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload matches BASELINE.md "samples/sec/chip, Flux-dev LoRA @512px":
full flux-dev architecture (19 double + 38 single blocks, 3072 hidden,
12B params), fp8 base-kernel STORAGE (the reference's
transformer_dtype='float8' mode) + dynamic W8A8 int8 COMPUTE on the
frozen block kernels (int8 MXU path, ~2.25x bf16 on v5e; LoRA factors
and gradients stay full precision, straight-through backward — tiny-flux
loss trajectories match bf16 within 5%, tests/test_int8_matmul.py),
LoRA rank 32 on all block linears, 512px latents (16x64x64 -> 1024 img
tokens) + 512 T5 tokens, batch 2 per chip, adamw8bit.

Sweep on v5e (samples/sec/chip): bs1 bf16-compute 1.87, bs2 1.92,
bs3 1.85, bs4 1.79, bs2+int8-fwd 2.20, bs2+int8-fwd_bwd 2.30 (the dgrad
matmul also int8; tiny-flux loss trajectories deviate <0.2% from bf16),
bs2+int8-fwd_bwd+prequantized-kernels 2.61 (frozen kernels quantized
ONCE at state init — int8 storage + per-channel scales — instead of
re-quantized on every forward/remat/dgrad; forward bit-identical to
the dynamic path), +activation_checkpointing='attn' (save flash o/lse
across remat so backward never re-runs the attention forward) 2.649;
'attn' at bs4 exceeds HBM (16.89G/15.75G).

vs_baseline is measured samples/sec divided by 1.0 samples/sec/chip — the
A100 ballpark for flux-dev LoRA @512 (the reference publishes no numbers;
BASELINE.md records `published: {}`).
"""

import json
import time

import jax
import jax.numpy as jnp

A100_BASELINE_SAMPLES_PER_SEC = 1.0


def bench_wan_1_3b():
    """Wan2.1-1.3B t2v LoRA-r32 512x512x81f (the second BASELINE.md
    north-star row). Flux is at its int8 roofline (~2.65 for three rounds),
    so this row is the non-saturated per-round perf carrier; returned as
    extra keys on the single bench JSON line."""
    from diffusion_pipe_tpu.models import get_model_class
    from diffusion_pipe_tpu.training.optimizers import get_optimizer
    from diffusion_pipe_tpu.training.train_state import lora_predicate
    from diffusion_pipe_tpu.training.trainer import (
        init_train_state,
        make_train_step,
    )

    config = {
        "save_every_n_epochs": 1,
        "model": {"type": "wan", "dtype": "bfloat16", "variant": "t2v-1.3b"},
        "adapter": {"type": "lora", "rank": 32, "alpha": 32, "dropout": 0.0},
        "optimizer": {"type": "adamw8bit", "lr": 1e-4},
        "gradient_clipping": 1.0,
        "activation_checkpointing": "attn",
    }
    pipeline = get_model_class("wan")(config)
    optimizer = get_optimizer(config)
    state = init_train_state(
        pipeline, optimizer, jax.random.PRNGKey(0), lora_predicate
    )
    step = jax.jit(make_train_step(pipeline, optimizer), donate_argnums=(0,))
    k = jax.random.PRNGKey(1)
    batch = {
        # 81 frames -> 21 latent frames (Wan VAE 4x temporal), 64x64 latents
        "latents": jax.random.normal(k, (1, 16, 21, 64, 64), jnp.float32),
        "text_embeddings": jax.random.normal(k, (1, 512, 4096), jnp.bfloat16),
        "seq_lens": jnp.full((1,), 512, jnp.int32),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    _ = jax.device_get(metrics["loss"])
    n_steps = 3
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(3 + i))
    _ = jax.device_get(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_steps
    return round(1.0 / dt, 4)


def main():
    from diffusion_pipe_tpu.models import get_model_class
    from diffusion_pipe_tpu.training.optimizers import get_optimizer
    from diffusion_pipe_tpu.training.train_state import lora_predicate

    config = {
        "save_every_n_epochs": 1,
        "model": {
            "type": "flux",
            "dtype": "bfloat16",
            "transformer_dtype": "float8",
            "int8_matmul": "fwd_bwd",
            "guidance": 1.0,
        },
        "adapter": {"type": "lora", "rank": 32, "alpha": 32, "dropout": 0.0},
        "optimizer": {"type": "adamw8bit", "lr": 1e-4},
        "gradient_clipping": 1.0,
        "activation_checkpointing": "attn",
    }

    batch_size = 2
    h = w = 64  # 512px / 8 (VAE) = 64 latent -> 1024 img tokens
    txt_len = 512

    pipeline = get_model_class("flux")(config)
    optimizer = get_optimizer(config)

    from diffusion_pipe_tpu.training.trainer import init_train_state, make_train_step

    state = init_train_state(
        pipeline, optimizer, jax.random.PRNGKey(0), lora_predicate
    )
    step = jax.jit(make_train_step(pipeline, optimizer), donate_argnums=(0,))

    k = jax.random.PRNGKey(1)
    batch = {
        "latents": jax.random.normal(k, (batch_size, 16, h, w), jnp.float32),
        "t5_embed": jax.random.normal(k, (batch_size, txt_len, 4096), jnp.bfloat16),
        "clip_embed": jax.random.normal(k, (batch_size, 768), jnp.bfloat16),
    }

    # warmup / compile
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    _ = jax.device_get(metrics["loss"])

    n_steps = 10
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(3 + i))
    _ = jax.device_get(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_steps

    samples_per_sec = batch_size / dt

    # free the flux state before the wan bench shares the 16 GB chip
    del state, batch, metrics, pipeline, optimizer, step
    try:
        wan_sps = bench_wan_1_3b()
    except Exception as e:  # the headline metric must still print
        wan_sps = f"error: {e}"

    print(
        json.dumps(
            {
                "metric": "samples/sec/chip Flux-dev(12B,fp8+int8) LoRA-r32 @512px",
                "value": round(samples_per_sec, 4),
                "unit": "samples/sec/chip",
                "vs_baseline": round(
                    samples_per_sec / A100_BASELINE_SAMPLES_PER_SEC, 3
                ),
                # second north-star row (BASELINE.md): non-saturated carrier
                "extra": {
                    "wan_1_3b_t2v_512px81f_lora_samples_per_sec_chip": wan_sps,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
