"""Sweep remat policy x batch size for the bench.py flux workload.

Usage: python tools/bench_flux_sweep.py <ac> <bs>
  ac in {true, attn, dots, unsloth}; bs int.
Prints one JSON line with the measured samples/sec/chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def run(ac, batch_size):
    from diffusion_pipe_tpu.models import get_model_class
    from diffusion_pipe_tpu.training.optimizers import get_optimizer
    from diffusion_pipe_tpu.training.train_state import lora_predicate
    from diffusion_pipe_tpu.training.trainer import (
        init_train_state,
        make_train_step,
    )

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
        "activation_checkpointing": True if ac == "true" else ac,
    }

    h = w = 64
    txt_len = 512
    pipeline = get_model_class("flux")(config)
    optimizer = get_optimizer(config)
    state = init_train_state(
        pipeline, optimizer, jax.random.PRNGKey(0), lora_predicate
    )
    step = jax.jit(make_train_step(pipeline, optimizer), donate_argnums=(0,))
    k = jax.random.PRNGKey(1)
    batch = {
        "latents": jax.random.normal(k, (batch_size, 16, h, w), jnp.float32),
        "t5_embed": jax.random.normal(
            k, (batch_size, txt_len, 4096), jnp.bfloat16),
        "clip_embed": jax.random.normal(k, (batch_size, 768), jnp.bfloat16),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    _ = jax.device_get(metrics["loss"])
    n_steps = 10
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(3 + i))
    _ = jax.device_get(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_steps
    print(json.dumps({
        "ac": ac, "bs": batch_size, "step_s": round(dt, 4),
        "samples_per_sec": round(batch_size / dt, 4),
    }), flush=True)


if __name__ == "__main__":
    run(sys.argv[1], int(sys.argv[2]))
