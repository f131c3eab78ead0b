"""Pipeline parallelism for the SDXL UNet.

The reference partitions SDXL across pipeline stages by slicing the UNet
into a flat layer list — InitialLayer (text encoders + embeddings), the
down/mid/up blocks, OutputLayer — and handing consecutive slices to
DeepSpeed's PipelineModule (reference models/sdxl.py:589-975 to_layers +
Unet*BlockLayer wrappers, utils/pipeline.py:11-53). Skip-connection
tensors travel between stages alongside the hidden state.

TPU-native version: the same flat layer decomposition, pipelined with the
GPipe ring primitives (parallel/pipeline.py). A UNet is heterogeneous —
hidden-state shape changes at every down/upsample and channel jump, and
skip tensors accumulate — so unlike the DiT families (scan-stacked
homogeneous blocks sharded P('stage')) each stage here runs its OWN static
slice of the layer list, selected per device with `lax.switch` on the
stage index. The ring payload is a shape-union:

  h      — one [B, H, W, max_ch] buffer; each layer statically knows the
           live (h, w, c) region and slices/pads around its real compute,
           so nothing dynamic reaches XLA.
  skips  — the fixed 9-slot skip pyramid (written by down layers at static
           indices, concat-consumed by up layers at static indices).
  ctx/temb/timesteps — conditioning computed on inject (stage 0).

Parameters stay replicated across the stage ring (SDXL's UNet is 2.6B
params — it fits every TPU HBM class whole; PP here buys compute
pipelining and per-stage ACTIVATION residency for large batch/resolution,
which is what the reference's SDXL pipelining is used for in practice).
Gradients for each stage's layers are produced only on the device that ran
them; shard_map's transpose psums the replicated-param gradients across
the ring automatically.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..training.train_state import merge_params
from ..parallel.pipeline import (
    STAGE_AXIS,
    counts_from_manual_split,
    gpipe_phase,
    last_stage_scalar,
    stage_index,
)
from .layers import remat_wrap
from .sdxl_unet import ResnetBlock2D, SDXLConfig, Transformer2DModel


@dataclasses.dataclass
class _Layer:
    """One pipeline layer: fn(p_unet, h, skips, temb, ctx) -> (h, skips).

    in_shape/out_shape are the static live (H, W, C) of the hidden state
    entering/leaving this layer (batch excluded).
    """

    fn: Callable
    in_shape: Tuple[int, int, int]
    out_shape: Tuple[int, int, int]


def build_layer_list(cfg: SDXLConfig, lat_h: int, lat_w: int) -> List[_Layer]:
    """The flat down/mid/up layer decomposition (reference to_layers
    granularity: one resnet(+transformer) or resample per layer)."""
    Res, Attn = ResnetBlock2D, Transformer2DModel
    if cfg.remat:
        Res = remat_wrap(Res, cfg.remat)
        Attn = remat_wrap(Attn, cfg.remat)
    dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)

    import flax.linen as nn

    chs = cfg.block_out_channels
    layers: List[_Layer] = []
    skip_shapes: List[Tuple[int, int, int]] = [(lat_h, lat_w, chs[0])]
    hw = (lat_h, lat_w)
    cur = (lat_h, lat_w, chs[0])  # conv_in output (written by inject)
    n_down_skips = 1 + len(chs) * cfg.layers_per_block + (len(chs) - 1)

    # --- down ---------------------------------------------------------------
    for i, ch in enumerate(chs):
        depth = cfg.transformer_layers[i]
        for j in range(cfg.layers_per_block):
            sidx = len(skip_shapes)

            def down_fn(p, h, skips, temb, ctx, i=i, j=j, ch=ch,
                        depth=depth, sidx=sidx):
                h = Res(ch, cfg).apply(
                    {"params": p[f"down_{i}_res_{j}"]}, h, temb)
                if depth > 0:
                    h = Attn(ch, depth, cfg).apply(
                        {"params": p[f"down_{i}_attn_{j}"]}, h, ctx)
                skips = skips[:sidx] + [h] + skips[sidx + 1:]
                return h, skips

            out = (hw[0], hw[1], ch)
            layers.append(_Layer(down_fn, cur, out))
            skip_shapes.append(out)
            cur = out
        if i < len(chs) - 1:
            sidx = len(skip_shapes)

            def ds_fn(p, h, skips, temb, ctx, i=i, sidx=sidx):
                h = nn.Conv(h.shape[-1], (3, 3), strides=2, padding=1,
                            **dd).apply(
                    {"params": p[f"down_{i}_downsample"]}, h)
                skips = skips[:sidx] + [h] + skips[sidx + 1:]
                return h, skips

            hw = (hw[0] // 2, hw[1] // 2)
            out = (hw[0], hw[1], ch)
            layers.append(_Layer(ds_fn, cur, out))
            skip_shapes.append(out)
            cur = out
    assert len(skip_shapes) == n_down_skips

    # --- mid ----------------------------------------------------------------
    def mid_fn(p, h, skips, temb, ctx):
        h = Res(chs[-1], cfg).apply({"params": p["mid_res_0"]}, h, temb)
        h = Attn(chs[-1], cfg.transformer_layers[-1], cfg).apply(
            {"params": p["mid_attn"]}, h, ctx)
        h = Res(chs[-1], cfg).apply({"params": p["mid_res_1"]}, h, temb)
        return h, skips

    layers.append(_Layer(mid_fn, cur, cur))

    # --- up -----------------------------------------------------------------
    rev = list(reversed(chs))
    rev_depth = list(reversed(cfg.transformer_layers))
    next_skip = len(skip_shapes) - 1
    for i, ch in enumerate(rev):
        depth = rev_depth[i]
        for j in range(cfg.layers_per_block + 1):
            sidx = next_skip
            next_skip -= 1

            def up_fn(p, h, skips, temb, ctx, i=i, j=j, ch=ch,
                      depth=depth, sidx=sidx):
                h = jnp.concatenate([h, skips[sidx]], axis=-1)
                h = Res(ch, cfg).apply(
                    {"params": p[f"up_{i}_res_{j}"]}, h, temb)
                if depth > 0:
                    h = Attn(ch, depth, cfg).apply(
                        {"params": p[f"up_{i}_attn_{j}"]}, h, ctx)
                return h, skips

            out = (cur[0], cur[1], ch)
            layers.append(_Layer(up_fn, cur, out))
            cur = out
        if i < len(rev) - 1:

            def us_fn(p, h, skips, temb, ctx, i=i):
                b_, hh, ww, c_ = h.shape
                h = jax.image.resize(h, (b_, hh * 2, ww * 2, c_), "nearest")
                h = nn.Conv(c_, (3, 3), padding=1, **dd).apply(
                    {"params": p[f"up_{i}_upsample"]}, h)
                return h, skips

            out = (cur[0] * 2, cur[1] * 2, cur[2])
            layers.append(_Layer(us_fn, cur, out))
            cur = out
    assert next_skip == -1, next_skip
    assert cur == (lat_h, lat_w, chs[0]), cur

    return layers, skip_shapes


def _partition_layers(config: Dict[str, Any], n_layers: int, s: int):
    """Per-stage consecutive layer counts; equal chunks by default,
    reference `manual_partition_split` boundaries when configured."""
    split = config.get("partition_split",
                       config.get("manual_partition_split"))
    if (str(config.get("partition_method", "")).lower() == "manual"
            and split is not None):
        return counts_from_manual_split(n_layers, s, split)
    base, extra = divmod(n_layers, s)
    return [base + (1 if i < extra else 0) for i in range(s)]


def make_sdxl_pipelined_loss_fn(pipeline, mesh, num_microbatches: int,
                                timestep_quantile=None):
    """loss_fn(trainable, frozen, batch, rng): SDXL GPipe pipeline over the
    'stage' mesh axis. Mirrors parallel/model_pp.py's generic builder but
    with the heterogeneous stage dispatch described in the module
    docstring. Call under jit with the mesh installed (jax.set_mesh).
    """
    cfg: SDXLConfig = pipeline.unet_config
    s = mesh.shape[STAGE_AXIS]
    m_total = num_microbatches
    max_ch = max(cfg.block_out_channels)

    def loss_fn(trainable, frozen, batch, rng):
        params = merge_params(trainable, frozen)["params"]

        lat = batch["latents"]
        mbs = lat.shape[0] // m_total
        lat_h, lat_w = lat.shape[2], lat.shape[3]
        layers, _skip_shapes = build_layer_list(cfg, lat_h, lat_w)
        counts = _partition_layers(pipeline.config, len(layers), s)
        bounds = [0]
        for c in counts:
            bounds.append(bounds[-1] + c)

        # per-microbatch input prep (in-graph noising; M static)
        keys = jax.random.split(rng, m_total)
        preps = []
        for i in range(m_total):
            mb = jax.tree.map(
                lambda x: x.reshape(
                    (m_total, x.shape[0] // m_total) + x.shape[1:])[i],
                batch,
            )
            preps.append(pipeline.prepare_inputs(
                keys[i], mb, timestep_quantile=timestep_quantile))
        mi_mb = jax.tree.map(lambda *xs: jnp.stack(xs), *[p[0] for p in preps])
        target_mb = jnp.stack([p[1] for p in preps])
        mask_mb = (
            jnp.stack([p[2] for p in preps]) if preps[0][2] is not None
            else None
        )

        def pad_h(h):
            hh, ww, cc = h.shape[1], h.shape[2], h.shape[3]
            return jnp.pad(h, ((0, 0), (0, lat_h - hh), (0, lat_w - ww),
                               (0, max_ch - cc)))

        def body(params, mi_mb, target_mb, mask_mb):
            import flax.linen as nn

            # Cast the replicated params to device-varying BEFORE any use
            # inside the per-stage lax.switch. Without this, shard_map's
            # transpose of each unvarying->varying broadcast puts a stage-
            # axis psum INSIDE the switch branch that used the param — and
            # since each device executes a different branch, devices would
            # issue different collectives and deadlock in the backward
            # pass. With the explicit pcast, the transpose is ONE uniform
            # psum outside the divergent control flow.
            p = jax.tree.map(
                lambda x: jax.lax.pcast(x, (STAGE_AXIS,), to="varying"),
                params,
            )
            p_unet = p["unet"]
            dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)

            def get_mb(t):
                return jax.tree.map(
                    lambda x: jax.lax.dynamic_index_in_dim(x, t, 0, False),
                    mi_mb,
                )

            def inject(t):
                """Stage-0 work: text encoders, combined time/added-cond
                embedding, conv_in (reference InitialLayer,
                models/sdxl.py:652-700)."""
                mi = get_mb(t)
                ctx, pooled = pipeline.encode_text(
                    p, mi["input_ids"], mi["input_ids_2"])
                temb = _time_embedding(
                    p_unet, cfg, mi["timesteps"], pooled, mi["add_time_ids"])
                x = jnp.transpose(mi["sample"], (0, 2, 3, 1)).astype(cfg.dtype)
                h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                            **dd).apply({"params": p_unet["conv_in"]}, x)
                skips = [
                    jnp.zeros((mbs,) + sh, cfg.dtype) for sh in _skip_shapes
                ]
                skips[0] = h
                return dict(
                    h=pad_h(h),
                    skips=tuple(skips),
                    ctx=ctx.astype(cfg.dtype),
                    temb=temb,
                    timesteps=mi["timesteps"],
                )

            def make_stage_fn(d):
                my_layers = layers[bounds[d]:bounds[d + 1]]

                def stage_fn(payload):
                    if not my_layers:
                        return payload
                    hh, ww, cc = my_layers[0].in_shape
                    h = payload["h"][:, :hh, :ww, :cc]
                    skips = list(payload["skips"])
                    for lay in my_layers:
                        h, skips = lay.fn(
                            p_unet, h, skips, payload["temb"], payload["ctx"]
                        )
                    return dict(
                        h=pad_h(h), skips=tuple(skips), ctx=payload["ctx"],
                        temb=payload["temb"], timesteps=payload["timesteps"],
                    )

                return stage_fn

            branches = [make_stage_fn(d) for d in range(s)]

            def compute(payload):
                return jax.lax.switch(stage_index(), branches, payload)

            template = jax.eval_shape(inject, jnp.zeros([], jnp.int32))
            template = jax.tree.map(
                lambda sd: jnp.zeros(sd.shape, sd.dtype), template
            )
            outs = gpipe_phase(compute, inject, m_total, s, template)

            def head_loss_t(payload, target, mask_i):
                """Output layer + loss (reference OutputLayer,
                models/sdxl.py:960-975 + loss sdxl.py:630-648)."""
                hh, ww, cc = lat_h, lat_w, cfg.block_out_channels[0]
                h = payload["h"][:, :hh, :ww, :cc]
                h = nn.GroupNorm(num_groups=cfg.norm_groups,
                                 epsilon=1e-5).apply(
                    {"params": p_unet["conv_norm_out"]}, h)
                h = nn.silu(h)
                h = nn.Conv(cfg.out_channels, (3, 3), padding=1, **dd).apply(
                    {"params": p_unet["conv_out"]}, h)
                pred = jnp.transpose(h, (0, 3, 1, 2))
                return pipeline.loss_fn(
                    (pred, payload["timesteps"]), target, mask_i)

            if mask_mb is None:
                losses = jax.vmap(
                    lambda pl, tg: head_loss_t(pl, tg, None)
                )(outs, target_mb)
            else:
                losses = jax.vmap(head_loss_t)(outs, target_mb, mask_mb)
            return last_stage_scalar(jnp.mean(losses), s)

        shard_body = jax.shard_map(
            body,
            mesh=mesh,
            axis_names={STAGE_AXIS},
            in_specs=(P(), P(), P(), P()),
            out_specs=P(),
        )
        return shard_body(params, mi_mb, target_mb, mask_mb)

    return loss_fn


def _time_embedding(p_unet, cfg: SDXLConfig, timesteps, pooled, add_time_ids):
    """SDXL combined time + (pooled text, time-id) additive conditioning
    (mirrors SDXLUNet.__call__'s embedding preamble, sdxl_unet.py:187-208)."""
    from .layers import LoraDense, sinusoidal_timestep_embedding
    import flax.linen as nn

    ted = cfg.time_embed_dim
    dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
    t_proj = sinusoidal_timestep_embedding(
        timesteps.astype(jnp.float32), cfg.block_out_channels[0],
        flip_sin_to_cos=True, downscale_freq_shift=0.0,
    )
    temb = LoraDense(ted, **dd).apply(
        {"params": p_unet["time_embedding_1"]}, t_proj.astype(cfg.dtype))
    temb = LoraDense(ted, **dd).apply(
        {"params": p_unet["time_embedding_2"]}, nn.silu(temb))
    ids_proj = sinusoidal_timestep_embedding(
        add_time_ids.reshape(-1).astype(jnp.float32),
        cfg.addition_time_embed_dim, flip_sin_to_cos=True,
        downscale_freq_shift=0.0,
    ).reshape(add_time_ids.shape[0], -1)
    add_embeds = jnp.concatenate(
        [pooled.astype(jnp.float32), ids_proj], axis=-1
    )
    aemb = LoraDense(ted, **dd).apply(
        {"params": p_unet["add_embedding_1"]}, add_embeds.astype(cfg.dtype))
    aemb = LoraDense(ted, **dd).apply(
        {"params": p_unet["add_embedding_2"]}, nn.silu(aemb))
    return temb + aemb
