"""Pipeline-parallel flux training step (GPipe over the 'stage' mesh axis).

Wires the generic shard_map pipeline (parallel/pipeline.py) to flux's layout:
embed on stage 0, the 19 double blocks as phase 1 and 38 single blocks as
phase 2 (each phase's stacked scan params sharded over 'stage'), head + loss
on the last stage. Replaces the reference's DeepSpeed layer-list partitioning
(ManualPipelineModule, utils/pipeline.py:11-53) and its patched 1F1B schedule
(utils/patches.py:113-160); the reference's first->last stage target
broadcast (dataset.py:1370-1388) is unnecessary because noising happens
in-graph from the same PRNG key everywhere.

'data' and 'tensor' mesh axes stay GSPMD-auto (shard_map axis_names only
manualizes 'stage'), so DP and TP compose without code here.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..parallel.pipeline import (
    STAGE_AXIS,
    apply_local_blocks,
    counts_from_manual_split,
    gpipe_phase,
    last_stage_scalar,
    pad_stack_for_manual_split,
    pad_stack_for_stages,
    ring_shift,
)


def _stack_for_stages(pipeline, stacked, num_layers: int, num_stages: int,
                      phase_offset: int):
    """Equal chunks by default; with partition_method='manual' +
    manual_partition_split (reference ManualPipelineModule TOML surface,
    utils/pipeline.py:11-53) the S-1 boundaries index the COMBINED block
    sequence (flux: 19 doubles then 38 singles) and are applied per phase by
    offsetting — boundaries outside a phase clip to empty chunks, which run
    as identity slots.

    Returns (padded [S*k, ...], enabled [S*k], block_to_slot [L] int32 —
    the slot holding each original block, for unpadding grads that come
    back in slot layout)."""
    config = pipeline.config
    # reference TOML key is `partition_split` (train.py:598);
    # `manual_partition_split` kept as an alias
    split = config.get("partition_split",
                       config.get("manual_partition_split"))
    if (str(config.get("partition_method", "")).lower() == "manual"
            and split is not None):
        counts = counts_from_manual_split(
            num_layers, num_stages, [int(b) - phase_offset for b in split]
        )
        padded, enabled, k = pad_stack_for_manual_split(
            stacked, num_layers, num_stages, counts
        )
        b2s = []
        for d, c in enumerate(counts):
            b2s.extend(range(d * k, d * k + c))
        return padded, enabled, jnp.asarray(b2s, jnp.int32)
    padded, enabled, _k = pad_stack_for_stages(stacked, num_layers, num_stages)
    return padded, enabled, jnp.arange(num_layers, dtype=jnp.int32)
from ..training.train_state import merge_params
from .flux_model import FluxConfig, FluxDoubleBlock, FluxSingleBlock
from .layers import (
    LoraDense,
    TimestepEmbedder,
    PixArtAlphaTextProjection,
    layer_norm_no_affine,
    modulate,
    rope_frequencies,
)

import flax.linen as nn


def _dense(cfg: FluxConfig, features: int):
    return LoraDense(features, dtype=cfg.dtype, param_dtype=cfg.param_dtype)


def _embed_microbatch(cfg: FluxConfig, p: Dict[str, Any], mi: Dict[str, Any]):
    """Stage-0 embedding: x/context embedders + combined time/guidance/text
    embedding (FluxTransformer.time_text_embed semantics)."""
    dim = cfg.hidden_size
    img = _dense(cfg, dim).apply({"params": p["x_embedder"]}, mi["hidden_states"])
    txt = _dense(cfg, dim).apply(
        {"params": p["context_embedder"]}, mi["encoder_hidden_states"]
    )
    te = TimestepEmbedder(dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype)
    temb = te.apply(
        {"params": p["timestep_embedder"]},
        mi["timestep"].astype(jnp.float32) * 1000.0,
    )
    if cfg.guidance_embeds:
        temb = temb + te.apply(
            {"params": p["guidance_embedder"]},
            mi["guidance"].astype(jnp.float32) * 1000.0,
        )
    pt = PixArtAlphaTextProjection(dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype)
    temb = temb + pt.apply(
        {"params": p["text_embedder"]}, mi["pooled_projections"].astype(cfg.dtype)
    )
    temb = nn.silu(temb)
    return img, txt, temb


def _head(cfg: FluxConfig, p: Dict[str, Any], x, temb, txt_len: int,
          img_seq_len: int):
    out = x[:, txt_len:][:, :img_seq_len]
    mod = _dense(cfg, 2 * cfg.hidden_size).apply(
        {"params": p["norm_out_linear"]}, nn.silu(temb)
    )
    scale, shift = jnp.split(mod, 2, axis=-1)  # diffusers (scale, shift)
    out = modulate(layer_norm_no_affine(out), shift, scale)
    return _dense(cfg, cfg.out_channels).apply({"params": p["proj_out"]}, out)


def _reject_partial_swap(cfg: FluxConfig):
    """Partial blocks_to_swap splits the block stacks; the pipelined
    programs index single 'double_blocks'/'single_blocks' collections
    (same constraint as wan, models/wan.py make_pp_program)."""
    if (0 < cfg.double_split[1] < cfg.num_layers
            or 0 < cfg.single_split[1] < cfg.num_single_layers):
        raise NotImplementedError(
            "partial blocks_to_swap (split block stacks) cannot be "
            "combined with pipeline_stages > 1; use whole-stack streaming "
            "or drop pipeline parallelism"
        )


def make_pipelined_loss_fn(pipeline, mesh, num_microbatches: int,
                           timestep_quantile=None):
    """Returns loss_fn(trainable, frozen, batch, rng) running the flux
    forward as a GPipe pipeline. batch leaves are [M * mbs, ...].

    Wrap with jax.shard_map(..., axis_names={'stage'}) via
    `pipelined_loss_under_mesh` below, or call under an outer jit with the
    mesh installed (jax.set_mesh) — shard_map is applied internally.
    """
    cfg: FluxConfig = pipeline.flux_config
    _reject_partial_swap(cfg)
    s = mesh.shape[STAGE_AXIS]
    m_total = num_microbatches

    def loss_fn(trainable, frozen, batch, rng):
        params = merge_params(trainable, frozen)["params"]
        p_double = params["double_blocks"]
        p_single = params["single_blocks"]
        p_rest = {
            k: v for k, v in params.items()
            if k not in ("double_blocks", "single_blocks")
        }
        pd, en_d, _ = _stack_for_stages(pipeline, p_double, cfg.num_layers, s, 0)
        ps, en_s, _ = _stack_for_stages(
            pipeline, p_single, cfg.num_single_layers, s, cfg.num_layers
        )

        # per-microbatch input prep (in-graph noising; M is static)
        keys = jax.random.split(rng, m_total)
        preps = []
        for i in range(m_total):
            mb = jax.tree.map(
                lambda x: x.reshape((m_total, x.shape[0] // m_total) + x.shape[1:])[i],
                batch,
            )
            preps.append(pipeline.prepare_inputs(
                keys[i], mb, timestep_quantile=timestep_quantile))
        mi_mb = jax.tree.map(lambda *xs: jnp.stack(xs), *[p[0] for p in preps])
        target_mb = jnp.stack([p[1] for p in preps])
        mask_mb = (
            jnp.stack([p[2] for p in preps]) if preps[0][2] is not None else None
        )
        img_seq_len = preps[0][0]["img_seq_len"]
        has_txt_mask = preps[0][0].get("txt_mask") is not None
        txt_len = preps[0][0]["encoder_hidden_states"].shape[1]

        # ids identical across microbatches
        ids = jnp.concatenate(
            [preps[0][0]["txt_ids"], preps[0][0]["img_ids"]], axis=0
        )

        def body(p_rest, pd, ps, en_d, en_s, mi_mb, target_mb, mask_mb, ids):
            from jax.sharding import PartitionSpec as P

            def seq_shard(y):
                # sequence parallelism over the auto 'tensor' axis (legal
                # inside partial-manual shard_map; 'stage' stays manual)
                if not cfg.sequence_sharding:
                    return y
                try:
                    return jax.lax.with_sharding_constraint(
                        y, P("data", "tensor", None)
                    )
                except RuntimeError:
                    return y  # no mesh in context


            rope_cos, rope_sin = rope_frequencies(
                ids, cfg.axes_dims_rope, cfg.rope_theta
            )
            dblock = FluxDoubleBlock(cfg)
            sblock = FluxSingleBlock(cfg)

            def get_mb(t):
                return jax.tree.map(
                    lambda x: jax.lax.dynamic_index_in_dim(x, t, 0, False),
                    mi_mb,
                )

            def inject1(t):
                mi = get_mb(t)
                img, txt, temb = _embed_microbatch(cfg, p_rest, mi)
                img, txt = seq_shard(img), seq_shard(txt)
                tm = (
                    mi["txt_mask"].astype(jnp.int32)
                    if has_txt_mask
                    else jnp.ones((txt.shape[0], txt_len), jnp.int32)
                )
                return (img, txt, temb, tm)

            def compute1(payload):
                img, txt, temb, tm = payload
                tmask = tm if has_txt_mask else None

                def apply_one(p_i, carry, temb, tmask):
                    (img, txt), _ = dblock.apply(
                        {"params": p_i}, carry, temb, rope_cos, rope_sin, tmask
                    )
                    return (img, txt)

                img, txt = apply_local_blocks(
                    functools.partial(apply_one, temb=temb, tmask=tmask),
                    pd, en_d, (img, txt),
                )
                return (img, txt, temb, tm)

            template = jax.eval_shape(inject1, jnp.zeros([], jnp.int32))
            template = jax.tree.map(
                lambda sd: jnp.zeros(sd.shape, sd.dtype), template
            )
            out1 = gpipe_phase(compute1, inject1, m_total, s, template)
            # finished doubles live on the last stage; hop to stage 0
            out1 = ring_shift(out1, s)

            def inject2(t):
                img, txt, temb, tm = jax.tree.map(
                    lambda x: jax.lax.dynamic_index_in_dim(x, t, 0, False), out1
                )
                x = seq_shard(jnp.concatenate([txt, img], axis=1))
                kvm = jnp.concatenate(
                    [tm, jnp.ones((img.shape[0], img.shape[1]), jnp.int32)],
                    axis=1,
                )
                return (x, temb, kvm)

            def compute2(payload):
                x, temb, kvm = payload
                kv_mask = kvm if has_txt_mask else None

                def apply_one(p_i, carry, temb, kv_mask):
                    y, _ = sblock.apply(
                        {"params": p_i}, carry, temb, rope_cos, rope_sin, kv_mask
                    )
                    return y

                x = apply_local_blocks(
                    functools.partial(apply_one, temb=temb, kv_mask=kv_mask),
                    ps, en_s, x,
                )
                return (x, temb, kvm)

            template2 = jax.eval_shape(inject2, jnp.zeros([], jnp.int32))
            template2 = jax.tree.map(
                lambda sd: jnp.zeros(sd.shape, sd.dtype), template2
            )
            out2 = gpipe_phase(compute2, inject2, m_total, s, template2)

            # head + loss on last stage, vectorized over microbatches
            x_mb, temb_mb, _ = out2

            def head_loss(x, temb, target, mask_i):
                out = _head(cfg, p_rest, x, temb, txt_len, img_seq_len)
                return pipeline.loss_fn(out, target, mask_i)

            if mask_mb is None:
                losses = jax.vmap(
                    lambda x, te, tg: head_loss(x, te, tg, None)
                )(x_mb, temb_mb, target_mb)
            else:
                losses = jax.vmap(head_loss)(x_mb, temb_mb, target_mb, mask_mb)
            return last_stage_scalar(jnp.mean(losses), s)

        from jax.sharding import PartitionSpec as P

        shard_body = jax.shard_map(
            body,
            mesh=mesh,
            axis_names={STAGE_AXIS},
            in_specs=(P(), P(STAGE_AXIS), P(STAGE_AXIS), P(STAGE_AXIS),
                      P(STAGE_AXIS), P(), P(), P(), P()),
            out_specs=P(),
        )
        return shard_body(
            p_rest, pd, ps, en_d, en_s, mi_mb, target_mb, mask_mb, ids
        )

    return loss_fn


def make_pipelined_grad_fn_1f1b(pipeline, mesh, num_microbatches: int,
                                timestep_quantile=None):
    """True interleaved 1F1B flux training: returns
    fn(trainable, frozen, batch, rng) -> (loss, grads) where grads matches
    the trainable tree. Runs parallel/pipeline.pipeline_train_1f1b_multiphase
    with TWO phases (doubles, singles) as circular virtual stages — each
    device hosts one chunk of each phase, the payload (img, txt, temb, tm)
    stays type-stable across phases, and the backward recomputes from a
    rotating input buffer, so in-flight activations are bounded by the
    schedule instead of the micro-batch count (the reference's DeepSpeed
    1F1B TrainSchedule analogue).

    Full fine-tuning works too: embed/head (p_rest) trainables get their
    grads from the loss-head vjp (last stage, singles phase) plus an embed
    replay against stage 0's doubles-input cotangent (see
    pipeline_train_1f1b_multiphase's rest_params support), psum'd across
    stages.
    """
    import flax

    from flax import traverse_util

    from ..parallel.pipeline import pipeline_train_1f1b_multiphase

    cfg: FluxConfig = pipeline.flux_config
    _reject_partial_swap(cfg)
    s = mesh.shape[STAGE_AXIS]
    m_total = num_microbatches

    def grad_fn(trainable, frozen, batch, rng):
        flat_t = traverse_util.flatten_dict(
            flax.core.unfreeze(trainable)["params"]
            if "params" in trainable else trainable
        )
        is_trainable = {p: (l is not None) for p, l in flat_t.items()}

        params = merge_params(trainable, frozen)["params"]
        p_rest = {
            k: v for k, v in params.items()
            if k not in ("double_blocks", "single_blocks")
        }
        pd_all, en_d, b2s_d = _stack_for_stages(
            pipeline, params["double_blocks"], cfg.num_layers, s, 0)
        ps_all, en_s, b2s_s = _stack_for_stages(
            pipeline, params["single_blocks"], cfg.num_single_layers, s,
            cfg.num_layers)

        def split(tree, prefix=()):
            flat = traverse_util.flatten_dict(tree)
            tr = {k: (v if is_trainable.get(prefix + k, False) else None)
                  for k, v in flat.items()}
            fz = {k: (None if is_trainable.get(prefix + k, False) else v)
                  for k, v in flat.items()}
            return (traverse_util.unflatten_dict(tr),
                    traverse_util.unflatten_dict(fz))

        pd_t, pd_f = split(pd_all, ("double_blocks",))
        ps_t, ps_f = split(ps_all, ("single_blocks",))
        pr_t, pr_f = split(p_rest)
        has_rest_t = any(
            v is not None
            for v in traverse_util.flatten_dict(pr_t).values()
        )

        # per-microbatch prepared inputs (same as the GPipe path)
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
        img_seq_len = preps[0][0]["img_seq_len"]
        has_txt_mask = preps[0][0].get("txt_mask") is not None
        txt_len = preps[0][0]["encoder_hidden_states"].shape[1]
        ids = jnp.concatenate(
            [preps[0][0]["txt_ids"], preps[0][0]["img_ids"]], axis=0
        )

        def body(pr_t, pr_f, pd_t, pd_f, ps_t, ps_f, en_d, en_s, mi_mb,
                 target_mb, mask_mb, ids):
            rope_cos, rope_sin = rope_frequencies(
                ids, cfg.axes_dims_rope, cfg.rope_theta
            )
            dblock = FluxDoubleBlock(cfg)
            sblock = FluxSingleBlock(cfg)

            def get_mb(t):
                return jax.tree.map(
                    lambda x: jax.lax.dynamic_index_in_dim(x, t, 0, False),
                    mi_mb,
                )

            def inject_p(rt, t):
                mi = get_mb(t)
                img, txt, temb = _embed_microbatch(
                    cfg, merge_params(rt, pr_f), mi)
                tm = (
                    mi["txt_mask"].astype(jnp.int32)
                    if has_txt_mask
                    else jnp.ones((txt.shape[0], txt_len), jnp.int32)
                )
                return (img, txt, temb, tm)

            def inject(t):
                return inject_p(pr_t, t)

            def phase_doubles(p_t, payload):
                img, txt, temb, tm = payload
                p_full = merge_params(p_t, pd_f)
                tmask = tm if has_txt_mask else None

                def apply_one(p_i, carry):
                    (img, txt), _ = dblock.apply(
                        {"params": p_i}, carry, temb, rope_cos, rope_sin,
                        tmask,
                    )
                    return (img, txt)

                img, txt = apply_local_blocks(
                    apply_one, p_full, en_d, (img, txt),
                )
                return (img, txt, temb, tm)

            def phase_singles(p_t, payload):
                img, txt, temb, tm = payload
                p_full = merge_params(p_t, ps_f)
                x = jnp.concatenate([txt, img], axis=1)
                kvm = jnp.concatenate(
                    [tm, jnp.ones((img.shape[0], img.shape[1]), jnp.int32)],
                    axis=1,
                )
                kv_mask = kvm if has_txt_mask else None

                def apply_one(p_i, carry):
                    y, _ = sblock.apply(
                        {"params": p_i}, carry, temb, rope_cos, rope_sin,
                        kv_mask,
                    )
                    return y

                x = apply_local_blocks(apply_one, p_full, en_s, x)
                return (x[:, txt_len:], x[:, :txt_len], temb, tm)

            def loss_head_p(rt, payload, t):
                img, txt, temb, _ = payload
                x = jnp.concatenate([txt, img], axis=1)
                out = _head(cfg, merge_params(rt, pr_f), x, temb, txt_len,
                            img_seq_len)
                target = jax.lax.dynamic_index_in_dim(target_mb, t, 0, False)
                mask_i = (
                    jax.lax.dynamic_index_in_dim(mask_mb, t, 0, False)
                    if mask_mb is not None else None
                )
                return pipeline.loss_fn(out, target, mask_i)

            template = jax.eval_shape(inject, jnp.zeros([], jnp.int32))
            template = jax.tree.map(
                lambda sd: jnp.zeros(sd.shape, sd.dtype), template
            )
            if has_rest_t:
                loss, (gd, gs), g_rest = pipeline_train_1f1b_multiphase(
                    [phase_doubles, phase_singles], [pd_t, ps_t],
                    None, None, m_total, s, template,
                    rest_params=pr_t, inject_p=inject_p,
                    loss_head_p=loss_head_p,
                )
                # embed grads live on stage 0, head grads on the last
                # stage; sum to the replicated total
                g_rest = jax.tree.map(
                    lambda x: jax.lax.psum(x, STAGE_AXIS), g_rest
                )
            else:
                loss, (gd, gs) = pipeline_train_1f1b_multiphase(
                    [phase_doubles, phase_singles], [pd_t, ps_t],
                    inject, lambda pl, t: loss_head_p(pr_t, pl, t),
                    m_total, s, template,
                )
                g_rest = jax.tree.map(lambda x: x, pr_t)  # all-None tree
            return loss, gd, gs, g_rest

        from jax.sharding import PartitionSpec as P

        shard_body = jax.shard_map(
            body,
            mesh=mesh,
            axis_names={STAGE_AXIS},
            in_specs=(P(), P(), P(STAGE_AXIS), P(STAGE_AXIS), P(STAGE_AXIS),
                      P(STAGE_AXIS), P(STAGE_AXIS), P(STAGE_AXIS), P(), P(),
                      P(), P()),
            out_specs=(P(), P(STAGE_AXIS), P(STAGE_AXIS), P()),
        )
        loss, gd, gs, g_rest = shard_body(
            pr_t, pr_f, pd_t, pd_f, ps_t, ps_f, en_d, en_s, mi_mb, target_mb,
            mask_mb, ids,
        )

        # unpad slot layout -> [L, ...] (block j's grad lives at slot
        # b2s[j]; identity slots drop) and rebuild the trainable structure
        gd = jax.tree.map(lambda g: g[b2s_d], gd)
        gs = jax.tree.map(lambda g: g[b2s_s], gs)
        flat_rest = traverse_util.flatten_dict(g_rest) if has_rest_t else {}
        flat_out = {}
        for path, leaf in flat_t.items():
            if leaf is None:
                flat_out[path] = None
            elif path[0] == "double_blocks":
                flat_out[path] = traverse_util.flatten_dict(gd)[path[1:]]
            elif path[0] == "single_blocks":
                flat_out[path] = traverse_util.flatten_dict(gs)[path[1:]]
            else:
                flat_out[path] = flat_rest[path]
        grads = {"params": traverse_util.unflatten_dict({
            k[0:]: v for k, v in flat_out.items()
        })}
        return loss, grads

    return grad_fn
