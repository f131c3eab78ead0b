"""Training driver CLI.

TPU-native equivalent of reference train.py (the DeepSpeed launcher script):

    python train.py --config examples/flux.toml [--resume_from_checkpoint]
        [--regenerate_cache] [--cache_only] [--reset_dataloader]
        [--reset_optimizer] [--dump_dataset DIR]

Differences from the reference are architectural, not behavioral: one
process drives all local TPU chips (no per-GPU process group / NCCL init,
reference train.py:293-299); pipeline/data/tensor parallelism come from the
('data','stage','tensor') mesh; noising runs inside the jitted train step;
per-size-bucket XLA programs replace reset_activation_shape() retracing
(reference train.py:906).
"""

from __future__ import annotations

import argparse
import datetime
import os
import shutil
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--resume_from_checkpoint", nargs="?", const=True,
                   default=False)
    p.add_argument("--regenerate_cache", action="store_true")
    p.add_argument("--cache_only", action="store_true")
    p.add_argument("--trust_cache", action="store_true")
    p.add_argument("--reset_dataloader", action="store_true")
    p.add_argument("--reset_optimizer", action="store_true")
    # keep optimizer moments but take hyperparameters fresh from config and
    # restart the LR schedule (reference train.py:49, 863-867)
    p.add_argument("--reset_optimizer_params", action="store_true")
    p.add_argument("--dump_dataset", type=Path, default=None)
    p.add_argument("--i_know_what_i_am_doing", action="store_true")
    p.add_argument("--max_steps", type=int, default=None)
    # capture a jax.profiler trace of steps [2, N+2) into run_dir/profile
    # (first-class tracing; the reference has none, SURVEY.md section 5.1)
    p.add_argument("--profile_steps", type=int, default=0)
    # generate an example image with the current weights before training
    # (reference --test_sample, train.py:517-518, 625-631)
    p.add_argument("--test_sample", type=str, default=None)
    return p.parse_args(argv)


TIMESTEP_QUANTILES_FOR_EVAL = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]


def main(argv=None):
    args = parse_args(argv)

    from diffusion_pipe_tpu.config import (
        load_config,
        load_toml,
        resolve_batch_size_maps,
    )
    from diffusion_pipe_tpu.data.dataset import Dataset
    from diffusion_pipe_tpu.data.loader import DatasetManager, PipelineDataLoader
    from diffusion_pipe_tpu.mesh import local_mesh_or_default
    from diffusion_pipe_tpu.models import get_model_class
    from diffusion_pipe_tpu.parallel.sharding import shard_params
    from diffusion_pipe_tpu.training.metrics import MetricsWriter
    from diffusion_pipe_tpu.training.optimizers import get_optimizer
    from diffusion_pipe_tpu.training.saver import Saver, get_most_recent_run_dir
    from diffusion_pipe_tpu.training.train_state import predicate_from_config
    from diffusion_pipe_tpu.training.trainer import (
        init_train_state,
        make_eval_step,
        make_train_step,
    )

    config = load_config(args.config)
    dataset_config = load_toml(config["dataset"])
    bs_maps = resolve_batch_size_maps(config)

    pipeline = get_model_class(config["model"]["type"])(config)

    # --- caching phase ------------------------------------------------------
    train_data = Dataset(dataset_config, pipeline,
                         support_video=pipeline.framerate is not None)
    if not args.i_know_what_i_am_doing:
        # reference DirectoryDataset.validate (dataset.py:521-529): many
        # resolutions multiplies the bucket count (and here, the number of
        # compiled XLA programs) — refuse unless explicitly overridden
        for d in train_data.directories:
            n_res = len(d.resolutions or [])
            if n_res > 3:
                print(
                    f"WARNING: {d.path} configures {n_res} resolutions. "
                    "Each resolution multiplies the size-bucket count and "
                    "the number of compiled train-step programs. Re-run "
                    "with --i_know_what_i_am_doing to proceed anyway."
                )
                return 1
    eval_datasets = []
    for eval_cfg_path in config.get("eval_datasets", []):
        name = Path(eval_cfg_path).stem
        eval_datasets.append(
            (name, Dataset(load_toml(eval_cfg_path), pipeline,
                           support_video=pipeline.framerate is not None))
        )
    manager = DatasetManager(
        pipeline,
        regenerate_cache=args.regenerate_cache,
        trust_cache=args.trust_cache,
        caching_batch_size=config.get("caching_batch_size", 1),
    )
    manager.register(train_data)
    for _, ds in eval_datasets:
        manager.register(ds)
    manager.cache()
    if args.dump_dataset is not None:
        # decode cached latents back to PNGs for dataset-fidelity checks
        # (reference --dump_dataset, train.py:483-511)
        from PIL import Image

        vae, vae_params = pipeline._load_vae()
        decode = jax.jit(
            lambda z: vae.apply(vae_params, z, method=type(vae).decode)
        )
        args.dump_dataset.mkdir(parents=True, exist_ok=True)
        count = 0
        for bucket_ds in train_data.all_size_bucket_datasets():
            for i in range(min(len(bucket_ds), 16)):
                item = bucket_ds[i]
                z = jnp.asarray(item["latents"])[None]
                img = np.asarray(decode(z))[0]
                if img.ndim == 4:  # video: first frame
                    img = img[:, 0]
                arr = np.clip((img.transpose(1, 2, 0) + 1) * 127.5, 0, 255)
                Image.fromarray(arr.astype("uint8")).save(
                    args.dump_dataset / f"img_{count}.png"
                )
                count += 1
        print(f"dumped {count} decoded examples to {args.dump_dataset}")
        return 0
    if args.cache_only:
        print("Cache generated. Exiting.")
        return 0

    # --- run dir ------------------------------------------------------------
    output_dir = Path(config["output_dir"])
    if args.resume_from_checkpoint is True:
        run_dir = Path(get_most_recent_run_dir(output_dir))
    elif args.resume_from_checkpoint:
        run_dir = output_dir / str(args.resume_from_checkpoint)
    else:
        stamp = datetime.datetime.now().strftime("%Y%m%d_%H-%M-%S")
        run_dir = output_dir / stamp
        run_dir.mkdir(parents=True, exist_ok=True)
        shutil.copy(args.config, run_dir / Path(args.config).name)
        if os.path.exists(config["dataset"]):
            shutil.copy(config["dataset"], run_dir / Path(config["dataset"]).name)
    print(f"run_dir: {run_dir}")

    # --- mesh / params / optimizer ------------------------------------------
    mesh = local_mesh_or_default(config)
    dp_world = mesh.shape["data"]
    base_lr = float(config.get("optimizer", {}).get("lr", 1e-4))
    # linear/cosine lr_scheduler horizons need steps-per-epoch
    # (reference train.py:837-846); post_init fixes the per-epoch batch
    # count, so it runs before the optimizer is built
    gas = config["gradient_accumulation_steps"]
    # full_global: this single controller drives every chip, so each pull
    # carries ALL dp ranks' examples (microbatch-major) and the step shards
    # them over the 'data' mesh axis (reference: one process per GPU pulls
    # its own rank slice, train.py:815-821)
    train_data.post_init(
        0, dp_world, bs_maps["train"], gas,
        image_micro_batch_size=bs_maps["image"], full_global=True,
    )
    for _, ds in eval_datasets:
        ds.post_init(
            0, dp_world, bs_maps["eval"],
            config["eval_gradient_accumulation_steps"],
            image_micro_batch_size=bs_maps["eval_image"], full_global=True,
        )
    # one loader pull = gas microbatches = one optimizer step
    # (reference steps_per_epoch = len(dataloader)//gas, train.py:836-837,
    # with len(dataloader) = len(dataset)*gas, dataset.py:1323-1324)
    steps_per_epoch = max(1, len(train_data))
    if config.get("eval_every_n_examples"):
        # reference train.py:636-638: convert to steps via the global batch
        from diffusion_pipe_tpu.config import lookup_batch_size

        bs = bs_maps["train"]
        bs = bs if isinstance(bs, int) else lookup_batch_size(bs, None)
        gbs = max(1, bs * dp_world * gas)
        config["eval_every_n_steps"] = max(
            1, int(config["eval_every_n_examples"]) // gbs
        )
        print(f"Computed eval_every_n_steps = {config['eval_every_n_steps']}")
    config["_total_steps"] = int(config.get("epochs", 1)) * steps_per_epoch
    # force_constant_lr overrides every LR group with one constant
    # (reference train.py:883-886 sets all param-group lrs)
    lr_scales = (
        {} if "force_constant_lr" in config
        else pipeline.lr_scale_map(base_lr)
    )
    optimizer = get_optimizer(config, lr_scales=lr_scales)
    predicate = predicate_from_config(config)

    try:
        params = pipeline.load_weights()
        print("loaded pretrained weights")
        # converters carry only pretrained tensors; materialize adapter
        # factors / int8 kernel_scale / from-scratch submodules from init
        from diffusion_pipe_tpu.training.train_state import complete_params

        params = complete_params(
            pipeline, params, jax.random.PRNGKey(config["seed"])
        )
    except (NotImplementedError, KeyError, FileNotFoundError) as e:
        print(f"WARNING: training from random init ({e})")
        params = pipeline.init_params(jax.random.PRNGKey(config["seed"]))
    if init_from_existing := config.get("adapter", {}).get("init_from_existing"):
        # reference train.py:525-526: warm-start adapter factors
        params = pipeline.load_adapter(init_from_existing, params)
        print(f"initialized adapter from {init_from_existing}")
    params = shard_params(mesh, params)
    host_stacks = ()
    if config.get("blocks_to_swap"):
        host_stacks = pipeline.host_stack_names()
        print(f"host-offloading block stacks: {host_stacks}")
    # ZeRO-1-style optimizer-state sharding over the 'data' axis (the
    # reference's DeepSpeed pipeline engine excludes ZeRO and replicates
    # state per DP rank; on TPU GSPMD this is a sharding annotation)
    zero1 = (
        bool(config.get("optimizer", {}).get("state_sharding", False))
        and mesh.shape["data"] > 1
    )
    state = init_train_state(
        pipeline, optimizer, jax.random.PRNGKey(config["seed"]), predicate,
        params=params, host_stacks=host_stacks,
        zero_sharding_mesh=mesh if zero1 else None,
    )

    # `params` may be stale after init_train_state (int8 prequantization
    # donates the frozen kernels); always sample from the live state.
    del params
    if args.test_sample is not None and hasattr(pipeline, "sample"):
        from diffusion_pipe_tpu.training.train_state import merge_params

        te_fns = pipeline.get_call_text_encoder_fns()
        embeds = {}
        for fn in te_fns:
            embeds.update(fn([args.test_sample]))
        sample_kwargs = {k: jnp.asarray(v) for k, v in embeds.items()}
        if pipeline.pass_captions_to_batch:
            # in-graph text encoders (SDXL): hand the raw prompt through
            sample_kwargs["caption"] = args.test_sample
        latents = pipeline.sample(
            merge_params(state.trainable, state.frozen),
            width=512, height=512, key=jax.random.PRNGKey(0),
            num_steps=int(config.get("sample_steps", 20)), **sample_kwargs,
        )
        vae, vae_params = pipeline._load_vae()
        img = vae.apply(vae_params, latents, method=type(vae).decode)
        arr = np.asarray(jnp.clip((img[0] + 1) * 127.5, 0, 255)).astype("uint8")
        from PIL import Image

        out_path = Path(config["output_dir"]) / "example.png"
        out_path.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(arr.transpose(1, 2, 0)).save(out_path)
        print(f"test sample written to {out_path}")

    loader = PipelineDataLoader(train_data, gas)

    saver = Saver(config, run_dir, pipeline, dataloader=loader)
    if args.resume_from_checkpoint:
        state, meta = saver.load_checkpoint(
            state,
            reset_optimizer=args.reset_optimizer,
            reset_optimizer_params=args.reset_optimizer_params,
            reset_dataloader=args.reset_dataloader,
        )
        print(f"resumed from step {int(state.step)}")

    metrics_writer = MetricsWriter(
        run_dir, x_axis_examples=config.get("x_axis_examples", False),
        enable_wandb="monitoring" in config
        and config["monitoring"].get("enable_wandb", False),
        wandb_config=config.get("monitoring"),
    )

    # --- jitted steps, cached per bucket shape ------------------------------
    ocfg = config.get("optimizer", {})
    pp_loss = None
    pp_grad = None
    pp_eval_builder = None
    if mesh.shape["stage"] > 1:
        # pipeline parallelism: gradient-accumulation micro-batches flow the
        # stage ring (reference: GAS == DeepSpeed pipeline micro-batches)
        schedule = str(config.get("pipeline_schedule", "gpipe")).lower()
        if hasattr(pipeline, "flux_config"):
            # flux keeps its specialized program (adds the fused 1F1B
            # schedule + sequence sharding)
            from diffusion_pipe_tpu.models.flux_pp import (
                make_pipelined_grad_fn_1f1b,
                make_pipelined_loss_fn,
            )

            if schedule == "1f1b":
                # fused interleaved fwd/bwd schedule (adapter training)
                pp_grad = make_pipelined_grad_fn_1f1b(
                    pipeline, mesh, num_microbatches=gas
                )
            else:
                pp_loss = make_pipelined_loss_fn(
                    pipeline, mesh, num_microbatches=gas
                )
            pp_eval_builder = lambda q: make_pipelined_loss_fn(  # noqa: E731
                pipeline, mesh, num_microbatches=gas, timestep_quantile=q
            )
        elif hasattr(pipeline, "make_pp_loss_fn"):
            # heterogeneous-stage program (SDXL UNet: lax.switch stage
            # dispatch + shape-union payload, models/sdxl_pp.py)
            pp_loss = pipeline.make_pp_loss_fn(mesh, gas)
            pp_eval_builder = (
                lambda q: pipeline.make_pp_loss_fn(  # noqa: E731
                    mesh, gas, timestep_quantile=q
                )
            )
        elif hasattr(pipeline, "make_pp_program"):
            # generic GPipe program from the model's PPProgram
            # (reference: any model partitions via to_layers() +
            # PipelineModule, utils/pipeline.py:11-53)
            from diffusion_pipe_tpu.parallel.model_pp import (
                make_generic_pipelined_grad_fn_1f1b,
                make_generic_pipelined_loss_fn,
            )

            if schedule == "1f1b":
                # fused interleaved fwd/bwd schedule (single- AND
                # multi-phase programs; adapter training and full
                # fine-tuning)
                pp_grad = make_generic_pipelined_grad_fn_1f1b(
                    pipeline, mesh, num_microbatches=gas
                )
            else:
                pp_loss = make_generic_pipelined_loss_fn(
                    pipeline, mesh, num_microbatches=gas
                )
            pp_eval_builder = (
                lambda q: make_generic_pipelined_loss_fn(  # noqa: E731
                    pipeline, mesh, num_microbatches=gas, timestep_quantile=q
                )
            )
        else:
            raise NotImplementedError(
                f"pipeline_stages > 1: {pipeline.name} does not expose a "
                "pipeline program yet; train with DP/TP "
                "(set pipeline_stages = 1)"
            )
    train_step_raw = make_train_step(
        pipeline, optimizer,
        gradient_clipping=config.get("gradient_clipping", 1.0),
        gradient_accumulation_steps=gas,
        host_stacks=host_stacks,
        skip_invalid_grads=bool(ocfg.get("skip_invalid_grads", False)),
        stochastic_rounding=bool(ocfg.get("stochastic_rounding", False)),
        gradient_release=bool(ocfg.get("gradient_release", False)),
        loss_fn_override=pp_loss,
        grad_fn_override=pp_grad,
        opt_state_shardings=(
            jax.tree.map(lambda x: x.sharding, state.opt_state)
            if zero1 else None
        ),
    )
    offload_opt = str(ocfg.get("type", "")).lower() == "offload"
    if host_stacks or offload_opt:
        # entry-output layouts must carry the pinned_host memory kinds of
        # the offloaded leaves — frozen stacks (blocks_to_swap) and/or
        # host-resident optimizer state (trainer.jit_train_step)
        from diffusion_pipe_tpu.training.trainer import jit_train_step

        train_step = jit_train_step(train_step_raw, state)
    else:
        train_step = jax.jit(train_step_raw, donate_argnums=(0,))
    eval_step_raw = make_eval_step(pipeline, loss_builder=pp_eval_builder)
    eval_step = jax.jit(eval_step_raw, static_argnums=(3,))

    # disable_block_swap_for_eval (reference train.py:234 / offloading.py
    # prepare_block_swap_inference): evaluate with every swapped block back
    # in device memory. A second pipeline without the swap dial provides
    # the non-streamed eval graph; params fold back at eval time
    # (parallel/offload.py unstream_param_stacks).
    unswap_eval_step = None
    if config.get("disable_block_swap_for_eval") and host_stacks:
        if pp_eval_builder is not None:
            raise ValueError(
                "disable_block_swap_for_eval is not supported together "
                "with pipeline_stages > 1"
            )
        import copy as _copy

        eval_config = _copy.deepcopy(config)
        eval_config.pop("blocks_to_swap", None)
        eval_pipeline = get_model_class(config["model"]["type"])(eval_config)
        unswap_eval_step = jax.jit(
            make_eval_step(eval_pipeline), static_argnums=(3,))

    from diffusion_pipe_tpu.parallel.sharding import batch_sharding

    data_sharding = batch_sharding(mesh)

    def put_batch(batch):
        """Host batch -> device arrays with the leading dim sharded over
        'data' (reference: each DP rank holds its own slice; here GSPMD
        slices the full_global batch, train.py:596-622)."""
        return jax.device_put(
            {k: jnp.asarray(v) for k, v in batch.items()}, data_sharding
        )

    def run_eval(state, step_i, examples):
        step_fn = eval_step
        if unswap_eval_step is not None:
            from diffusion_pipe_tpu.parallel.offload import (
                unstream_param_stacks,
            )

            # one-time per eval: swapped stacks back to HBM, logical
            # layout; the temporary copy is dropped when eval ends
            state = state.replace(
                trainable=unstream_param_stacks(state.trainable,
                                                host_stacks),
                frozen=unstream_param_stacks(state.frozen, host_stacks),
            )
            step_fn = unswap_eval_step
        for name, ds in eval_datasets:
            eval_loader = PipelineDataLoader(
                ds, config["eval_gradient_accumulation_steps"]
            )
            start = time.time()
            quantile_losses = {q: [] for q in TIMESTEP_QUANTILES_FOR_EVAL}
            n_batches = ds.batches_per_epoch()
            for qi, q in enumerate(TIMESTEP_QUANTILES_FOR_EVAL):
                eval_loader.reset()
                for bi in range(n_batches):
                    _, batch = next(eval_loader)
                    batch = pipeline.host_prepare(batch)
                    jb = put_batch(batch)
                    # deterministic eval (reference isolate_rng + fixed
                    # seed, train.py:235-239) but the noise pattern varies
                    # per (batch, quantile) so eval loss is not narrowed to
                    # one fixed noise draw
                    key = jax.random.fold_in(
                        jax.random.PRNGKey(12345),
                        qi * 1_000_003 + bi,
                    )
                    loss = step_fn(state, jb, key, q)
                    quantile_losses[q].append(float(loss))
            out = {}
            for q, losses in quantile_losses.items():
                out[f"eval/{name}/loss_quantile_{q:.1f}"] = float(
                    np.mean(losses)
                )
            out[f"eval/{name}/loss"] = float(
                np.mean([v for vs in quantile_losses.values() for v in vs])
            )
            out[f"eval/{name}/eval_time_sec"] = time.time() - start
            metrics_writer.write(out, step_i, examples)

    # --- train loop ---------------------------------------------------------
    # the mesh context makes GSPMD treat every jitted step's shardings as
    # living on this mesh (dp x pp x tp; reference: implicit process groups)
    mesh_ctx = jax.set_mesh(mesh)
    mesh_ctx.__enter__()
    step_i = int(state.step)
    epoch = loader.epoch
    epoch_losses = []
    if config.get("eval_before_first_step", True) and not args.resume_from_checkpoint:
        run_eval(state, step_i, int(state.examples))

    max_steps = args.max_steps or config.get("max_steps", 10**12)
    quit_now = False
    profiling = False
    while not quit_now:
        if args.profile_steps and step_i == 1 and not profiling:
            jax.profiler.start_trace(str(run_dir / "profile"))
            profiling = True
        if profiling and step_i >= 1 + args.profile_steps:
            jax.profiler.stop_trace()
            profiling = False
            print(f"profile written to {run_dir / 'profile'}")
        _, batch = next(loader)
        batch = pipeline.host_prepare(batch)
        jb = put_batch(batch)
        state, metrics = train_step(state, jb, jax.random.PRNGKey(step_i))
        step_i += 1
        epoch_losses.append(float(metrics["loss"]))

        if step_i % config.get("logging_steps", 1) == 0:
            metrics_writer.write(
                {f"train/{k}": float(v) for k, v in metrics.items()},
                step_i, int(state.examples),
            )
            if int(metrics.get("skipped_params", 0)):
                print(f"WARNING: {int(metrics['skipped_params'])} parameter "
                      "updates were skipped due to Inf or NaN.")

        if loader.epoch != epoch:
            metrics_writer.write(
                {"train/epoch_loss": float(np.mean(epoch_losses))},
                step_i, int(state.examples),
            )
            epoch_losses = []
            new_epoch = saver.process_epoch(state, epoch, step_i)
            if new_epoch is None:
                break
            epoch = loader.epoch
            if (
                config.get("eval_every_n_epochs")
                and (epoch - 1) % config["eval_every_n_epochs"] == 0
            ):
                run_eval(state, step_i, int(state.examples))

        if (
            config.get("eval_every_n_steps")
            and step_i % config["eval_every_n_steps"] == 0
        ):
            run_eval(state, step_i, int(state.examples))

        quit_now = saver.process_step(state, step_i, int(state.examples))
        if step_i >= max_steps:
            break

    if profiling:
        jax.profiler.stop_trace()
    mesh_ctx.__exit__(None, None, None)
    saver.save_checkpoint(state, step_i)
    metrics_writer.close()
    print(f"done at step {step_i}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
