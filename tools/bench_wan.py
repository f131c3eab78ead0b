"""Wan t2v video LoRA training throughput on one TPU chip.

BASELINE.md target: Wan2.1-14B t2v LoRA >=1.5x A100 samples/sec/chip.
Workload mirrors the reference's wan_14b_min_vram example
(examples/wan_14b_min_vram.toml: 512x512x81-frame clips, LoRA r32):
latents [1, 16, 21, 64, 64] (Wan VAE: 8x spatial, 4x temporal -> 21
latent frames), UMT5 context [1, 512, 4096], rank-32 LoRA, adamw8bit.

Random-init full-size weights (no checkpoint needed for throughput).
--offload streams the whole block stack from pinned host RAM
(blocks_to_swap analogue) for configs that exceed 16GB HBM.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

p = argparse.ArgumentParser()
p.add_argument("--variant", default="t2v-1.3b")
p.add_argument("--dtype", default="bfloat16")
p.add_argument("--bs", type=int, default=1)
p.add_argument("--frames", type=int, default=21, help="latent frames")
p.add_argument("--size", type=int, default=64, help="latent h=w")
p.add_argument("--txt", type=int, default=512)
p.add_argument("--int8", default=None)
p.add_argument("--fp8", action="store_true")
p.add_argument("--offload", action="store_true")
p.add_argument("--swap", type=int, default=0,
               help="blocks_to_swap: stream only the deepest N blocks")
p.add_argument("--remat", default="full")  # full | dots | attn | unsloth | none
p.add_argument("--steps", type=int, default=5)
p.add_argument("--swap_remat", default=None,
               help="swap_activation_checkpointing override")
p.add_argument("--no_prefetch", action="store_true",
               help="disable the one-block-ahead prefetch scan (A/B)")
p.add_argument("--profile_dir", default=None,
               help="capture a jax.profiler trace of the timed steps")
p.add_argument("--layers", type=int, default=None,
               help="override num_layers (per-block 14B microbench)")
args = p.parse_args()

from diffusion_pipe_tpu.models import get_model_class
from diffusion_pipe_tpu.training.optimizers import get_optimizer
from diffusion_pipe_tpu.training.train_state import lora_predicate
from diffusion_pipe_tpu.training.trainer import (
    init_train_state,
    jit_train_step,
    make_train_step,
)

mc = {"type": "wan", "dtype": args.dtype, "variant": args.variant}
if args.layers:
    mc["num_layers"] = args.layers
if args.fp8:
    mc["transformer_dtype"] = "float8"
if args.int8:
    mc["int8_matmul"] = True if args.int8 == "true" else args.int8
config = {
    "save_every_n_epochs": 1,
    "model": mc,
    "adapter": {"type": "lora", "rank": 32, "alpha": 32, "dropout": 0.0},
    "optimizer": {"type": "adamw8bit", "lr": 1e-4},
    "gradient_clipping": 1.0,
}
if args.remat != "none":
    config["activation_checkpointing"] = (
        True if args.remat == "full" else args.remat
    )
    if args.remat == "dots":
        config["activation_checkpointing"] = True
        config["remat_policy"] = "dots"
if args.no_prefetch:
    config["stream_prefetch"] = False
if args.swap_remat:
    config["swap_activation_checkpointing"] = args.swap_remat
if args.swap:
    config["blocks_to_swap"] = args.swap
    args.offload = True
elif args.offload:
    config["blocks_to_swap"] = 40

pipeline = get_model_class("wan")(config)
host_stacks = ()
if args.offload:
    host_stacks = pipeline.host_stack_names()
optimizer = get_optimizer(config)
t0 = time.perf_counter()
state = init_train_state(
    pipeline, optimizer, jax.random.PRNGKey(0), lora_predicate,
    host_stacks=host_stacks,
    # random-init of an offloaded stack must not route through HBM
    # (wan-14B's 28 GB block stack OOMs device-side init)
    host_init=bool(host_stacks),
)
print(f"init: {time.perf_counter()-t0:.1f}s", flush=True)
step_fn = make_train_step(pipeline, optimizer, host_stacks=host_stacks)
step = (jit_train_step(step_fn, state) if host_stacks
        else jax.jit(step_fn, donate_argnums=(0,)))

bs, f, hw = args.bs, args.frames, args.size
k = jax.random.PRNGKey(1)
batch = {
    "latents": jax.random.normal(k, (bs, 16, f, hw, hw), jnp.float32),
    "text_embeddings": jax.random.normal(k, (bs, args.txt, 4096), jnp.bfloat16),
    "seq_lens": jnp.full((bs,), args.txt, jnp.int32),
}

t0 = time.perf_counter()
state, metrics = step(state, batch, jax.random.PRNGKey(2))
_ = jax.device_get(metrics["loss"])
print(f"compile+first step: {time.perf_counter()-t0:.1f}s", flush=True)
# second warmup: the first donated call can return leaves whose layout /
# memory-kind differs from the entry annotation, making call 2 a cache
# miss that RECOMPILES (~24 s at 14B — measured polluting the round-4
# timed window); time steady state only
t0 = time.perf_counter()
state, metrics = step(state, batch, jax.random.PRNGKey(2))
_ = jax.device_get(metrics["loss"])
print(f"second step (relayout recompile if any): "
      f"{time.perf_counter()-t0:.1f}s", flush=True)

if args.profile_dir:
    jax.profiler.start_trace(args.profile_dir)
t0 = time.perf_counter()
per_step = []
for i in range(args.steps):
    t1 = time.perf_counter()
    state, metrics = step(state, batch, jax.random.PRNGKey(3 + i))
    _ = jax.device_get(metrics["loss"])
    per_step.append(time.perf_counter() - t1)
print("per-step s:", [round(t, 2) for t in per_step], flush=True)
dt = (time.perf_counter() - t0) / args.steps
if args.profile_dir:
    jax.profiler.stop_trace()
tokens = f * (hw // 2) * (hw // 2)
print(json.dumps({
    "variant": args.variant, "bs": bs, "latent_frames": f,
    "latent_hw": hw, "img_tokens": tokens, "remat": args.remat,
    "int8": args.int8, "fp8": args.fp8, "offload": args.offload,
    "step_ms": round(dt * 1e3, 1),
    "samples_per_sec": round(bs / dt, 4),
}))
