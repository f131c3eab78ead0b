"""SDXL LoRA-r16 @512px throughput on one TPU chip (random-init full-size weights)."""
import argparse, json, sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp
import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--bs", type=int, default=4)
p.add_argument("--remat", action="store_true")
p.add_argument("--int8", default=None)  # None | "true" | "fwd_bwd"
p.add_argument("--steps", type=int, default=10)
args = p.parse_args()

from diffusion_pipe_tpu.models import get_model_class
from diffusion_pipe_tpu.training.optimizers import get_optimizer
from diffusion_pipe_tpu.training.train_state import lora_predicate
from diffusion_pipe_tpu.training.trainer import init_train_state, make_train_step

mc = {
    "type": "sdxl", "dtype": "bfloat16", "_random_te": True, "_random_unet": True,
}
if args.int8:
    mc["int8_matmul"] = True if args.int8 == "true" else args.int8
config = {
    "save_every_n_epochs": 1,
    "model": mc,
    "adapter": {"type": "lora", "rank": 16, "alpha": 16, "dropout": 0.0},
    "optimizer": {"type": "adamw8bit", "lr": 1e-4},
    "gradient_clipping": 1.0,
    "activation_checkpointing": bool(args.remat),
}

pipeline = get_model_class("sdxl")(config)
optimizer = get_optimizer(config)
state = init_train_state(pipeline, optimizer, jax.random.PRNGKey(0), lora_predicate)
step = jax.jit(make_train_step(pipeline, optimizer), donate_argnums=(0,))

bs = args.bs
k = jax.random.PRNGKey(1)
batch = {
    "latents": jax.random.normal(k, (bs, 4, 64, 64), jnp.float32),
    "input_ids": jnp.asarray(np.random.randint(0, 49000, (bs, 77)), jnp.int32),
    "input_ids_2": jnp.asarray(np.random.randint(0, 49000, (bs, 77)), jnp.int32),
}

t0 = time.perf_counter()
state, metrics = step(state, batch, jax.random.PRNGKey(2))
_ = jax.device_get(metrics["loss"])
print(f"compile+first step: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
for i in range(args.steps):
    state, metrics = step(state, batch, jax.random.PRNGKey(3 + i))
_ = jax.device_get(metrics["loss"])
dt = (time.perf_counter() - t0) / args.steps
print(json.dumps({"bs": bs, "remat": args.remat, "int8": args.int8,
                  "step_ms": round(dt * 1e3, 1),
                  "samples_per_sec": round(bs / dt, 3)}))
