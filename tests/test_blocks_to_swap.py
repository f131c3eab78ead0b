"""Partial blocks_to_swap: the deepest N blocks live in a separate
"blocks_swap" scan (streamed from host on TPU; identity on CPU). The
split must be numerically invisible and export-compatible (reference
utils/offloading.py:184 swaps exactly N blocks per its config)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pipe_tpu.models import get_model_class


def _cfg(swap=0):
    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "wan", "dtype": "float32", "_tiny": True},
        "adapter": {"type": "lora", "rank": 4, "alpha": 4, "dropout": 0.0},
        "optimizer": {"type": "adamw", "lr": 1e-3},
    }
    if swap:
        cfg["blocks_to_swap"] = swap
    return cfg


def _split_params(base_params, n_res):
    """Re-slice a single-stack param tree into the split layout."""
    p = jax.tree.map(lambda x: x, base_params)  # shallow-ish copy
    blocks = p["params"]["blocks"]
    p["params"] = dict(p["params"])
    p["params"]["blocks"] = jax.tree.map(lambda x: x[:n_res], blocks)
    p["params"]["blocks_swap"] = jax.tree.map(lambda x: x[n_res:], blocks)
    return p


def test_partial_swap_forward_parity():
    base = get_model_class("wan")(_cfg())
    part = get_model_class("wan")(_cfg(swap=1))
    assert base.wan_config.num_layers == 2
    assert part.wan_config.swap_split == (1, 1)

    params = nn.unbox(base.init_params(jax.random.PRNGKey(0)))
    params_split = _split_params(params, 1)

    # the split model's own init produces exactly this structure
    init_split = nn.unbox(part.init_params(jax.random.PRNGKey(0)))
    assert set(init_split["params"]) == set(params_split["params"])
    assert (
        jax.tree.map(jnp.shape, init_split["params"]["blocks_swap"])
        == jax.tree.map(jnp.shape, params_split["params"]["blocks_swap"])
    )

    cfg = base.wan_config
    x = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.in_dim, 1, 8, 8))
    t = jnp.full((1,), 0.4)
    ctx = jax.random.normal(
        jax.random.PRNGKey(2), (1, cfg.text_len, cfg.text_dim))

    out_base = base.model.apply(params, x, t, ctx, None)
    out_split = part.model.apply(params_split, x, t, ctx, None)
    np.testing.assert_allclose(
        np.asarray(out_base), np.asarray(out_split), atol=1e-6)


def test_partial_swap_full_stream_keeps_single_stack():
    # blocks_to_swap >= num_layers: single "blocks" layout (checkpoint-
    # compatible with the non-offloaded layout)
    full = get_model_class("wan")(_cfg(swap=99))
    assert full.wan_config.swap_split == (0, 2)
    p = nn.unbox(full.init_params(jax.random.PRNGKey(0)))
    assert "blocks_swap" not in p["params"]
    assert full.host_stack_names() == ("blocks",)


def test_partial_swap_host_stack_names():
    part = get_model_class("wan")(_cfg(swap=1))
    assert part.host_stack_names() == ("blocks_swap",)
    none = get_model_class("wan")(_cfg())
    assert none.host_stack_names() == ()


def test_partial_swap_lora_export_offsets():
    from diffusion_pipe_tpu.models.wan import export_wan_lora_comfyui

    part = get_model_class("wan")(_cfg(swap=1))
    params = nn.unbox(part.init_params(jax.random.PRNGKey(0)))
    from diffusion_pipe_tpu.training.train_state import (
        lora_predicate,
        partition_params,
    )

    trainable, _ = partition_params(params, lora_predicate)
    sd = export_wan_lora_comfyui(trainable, part.wan_config)
    idx = {k.split(".")[2] for k in sd}
    # block indices 0 (resident stack) AND 1 (swap stack, offset back)
    assert idx == {"0", "1"}, idx

    # identical key set to a non-swapped export
    base = get_model_class("wan")(_cfg())
    params_b = nn.unbox(base.init_params(jax.random.PRNGKey(0)))
    trainable_b, _ = partition_params(params_b, lora_predicate)
    sd_b = export_wan_lora_comfyui(trainable_b, base.wan_config)
    assert set(sd) == set(sd_b)


def test_partial_swap_converter_split():
    """convert_wan_weights routes reference blocks.N.* into the right
    stack with the right local index."""
    from diffusion_pipe_tpu.models.wan import convert_wan_weights

    base = get_model_class("wan")(_cfg())
    part = get_model_class("wan")(_cfg(swap=1))
    params = nn.unbox(base.init_params(jax.random.PRNGKey(0)))

    # synthesize a reference-layout sd by inverting through the pair of
    # converters: build sd keys from the tiny shapes via the base layout
    rng = np.random.default_rng(0)
    cfg = base.wan_config

    def rnd(*shape):
        return rng.standard_normal(shape).astype(np.float32)

    d, f, t_l = cfg.dim, cfg.ffn_dim, cfg.text_len
    sd = {}
    for i in range(cfg.num_layers):
        p = f"blocks.{i}"
        for m in ("self_attn.q", "self_attn.k", "self_attn.v",
                  "self_attn.o", "cross_attn.q", "cross_attn.k",
                  "cross_attn.v", "cross_attn.o"):
            sd[f"{p}.{m}.weight"] = rnd(d, d)
            sd[f"{p}.{m}.bias"] = rnd(d)
        sd[f"{p}.ffn.0.weight"] = rnd(f, d)
        sd[f"{p}.ffn.0.bias"] = rnd(f)
        sd[f"{p}.ffn.2.weight"] = rnd(d, f)
        sd[f"{p}.ffn.2.bias"] = rnd(d)
        for m in ("self_attn.norm_q", "self_attn.norm_k",
                  "cross_attn.norm_q", "cross_attn.norm_k"):
            sd[f"{p}.{m}.weight"] = rnd(d)
        sd[f"{p}.norm3.weight"] = rnd(d)
        sd[f"{p}.norm3.bias"] = rnd(d)
        sd[f"{p}.modulation"] = rnd(1, 6, d)
    sd["patch_embedding.weight"] = rnd(d, cfg.in_dim, *cfg.patch_size)
    sd["patch_embedding.bias"] = rnd(d)
    sd["text_embedding.0.weight"] = rnd(d, cfg.text_dim)
    sd["text_embedding.0.bias"] = rnd(d)
    sd["text_embedding.2.weight"] = rnd(d, d)
    sd["text_embedding.2.bias"] = rnd(d)
    sd["time_embedding.0.weight"] = rnd(d, cfg.freq_dim)
    sd["time_embedding.0.bias"] = rnd(d)
    sd["time_embedding.2.weight"] = rnd(d, d)
    sd["time_embedding.2.bias"] = rnd(d)
    sd["time_projection.1.weight"] = rnd(6 * d, d)
    sd["time_projection.1.bias"] = rnd(6 * d)
    out_patch = int(np.prod(cfg.patch_size)) * cfg.out_dim
    sd["head.head.weight"] = rnd(out_patch, d)
    sd["head.head.bias"] = rnd(out_patch)
    sd["head.modulation"] = rnd(1, 2, d)

    got_base = convert_wan_weights(dict(sd), base.wan_config)
    got_part = convert_wan_weights(dict(sd), part.wan_config)

    b = got_base["params"]["blocks"]
    r = got_part["params"]["blocks"]
    s = got_part["params"]["blocks_swap"]
    flat_b = jax.tree_util.tree_leaves_with_path(b)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(r))
    flat_s = dict(jax.tree_util.tree_leaves_with_path(s))
    for path, leaf in flat_b:
        np.testing.assert_array_equal(np.asarray(flat_r[path]),
                                      np.asarray(leaf)[:1], err_msg=str(path))
        np.testing.assert_array_equal(np.asarray(flat_s[path]),
                                      np.asarray(leaf)[1:], err_msg=str(path))

    # full-model export is the exact inverse for BOTH layouts
    from diffusion_pipe_tpu.models.wan import export_wan_model

    for got, cfg_x in ((got_base, base.wan_config),
                       (got_part, part.wan_config)):
        back = export_wan_model(got, cfg_x)
        assert set(back) == set(sd)
        for k in sd:
            np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


# --------------------------------------------------------------------------
# flux: exact-N over TWO stacks (reference models/flux.py:404-418 splits
# blocks_to_swap as double = N//2, single = (N - N//2)*2 + 1)
# --------------------------------------------------------------------------

def _flux_cfg(swap=0):
    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "flux", "dtype": "float32", "_tiny": True,
                  "guidance": 1.0},
        "adapter": {"type": "lora", "rank": 4, "alpha": 4, "dropout": 0.0},
        "optimizer": {"type": "adamw", "lr": 1e-3},
    }
    if swap:
        cfg["blocks_to_swap"] = swap
    return cfg


def _flux_pipe(tail_d=0, tail_s=0, adapter=True):
    """Tiny flux (2 double + 2 single) with explicit per-stack tails: the
    reference N-split formula can never produce a partial split at tiny
    sizes (caps are num-2 = 0), so tests drive the tails directly."""
    import dataclasses

    from diffusion_pipe_tpu.models.flux_model import FluxTransformer

    cfg = _flux_cfg()
    if not adapter:
        del cfg["adapter"]
    pipe = get_model_class("flux")(cfg)
    if tail_d or tail_s:
        pipe.flux_config = dataclasses.replace(
            pipe.flux_config, offload_tail_double=tail_d,
            offload_tail_single=tail_s)
        pipe.model = FluxTransformer(pipe.flux_config)
    return pipe


def _flux_inputs(cfg):
    k = jax.random.PRNGKey
    b, simg, stxt = 1, 16, 8
    return dict(
        hidden_states=jax.random.normal(k(1), (b, simg, cfg.in_channels)),
        encoder_hidden_states=jax.random.normal(
            k(2), (b, stxt, cfg.joint_attention_dim)),
        pooled_projections=jax.random.normal(
            k(3), (b, cfg.pooled_projection_dim)),
        timestep=jnp.full((b,), 0.4),
        img_ids=jnp.zeros((simg, 3)),
        txt_ids=jnp.zeros((stxt, 3)),
        guidance=jnp.ones((b,)),
    )


def _flux_split_params(base_params, d_res, s_res):
    p = dict(base_params)
    p["params"] = dict(p["params"])
    for stack, res in (("double_blocks", d_res), ("single_blocks", s_res)):
        whole = p["params"][stack]
        p["params"][stack] = jax.tree.map(lambda x: x[:res], whole)
        p["params"][f"{stack}_swap"] = jax.tree.map(
            lambda x: x[res:], whole)
    return p


def test_flux_partial_swap_forward_parity():
    base = _flux_pipe()
    part = _flux_pipe(tail_d=1, tail_s=1)
    assert part.flux_config.double_split == (1, 1)
    assert part.flux_config.single_split == (1, 1)
    assert part.host_stack_names() == ("double_blocks_swap",
                                       "single_blocks_swap")

    params = nn.unbox(base.init_params(jax.random.PRNGKey(0)))
    params_split = _flux_split_params(params, 1, 1)
    init_split = nn.unbox(part.init_params(jax.random.PRNGKey(0)))
    assert set(init_split["params"]) == set(params_split["params"])

    mi = _flux_inputs(base.flux_config)
    out_base = base.model.apply(params, **mi)
    out_split = part.model.apply(params_split, **mi)
    np.testing.assert_allclose(
        np.asarray(out_base), np.asarray(out_split), atol=1e-6)


def test_flux_swap_formula_wiring():
    """blocks_to_swap N -> double = N//2, single = (N - N//2)*2 + 1 at
    full flux dims (reference models/flux.py:410-413)."""
    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "flux", "dtype": "bfloat16", "guidance": 1.0},
        "optimizer": {"type": "adamw", "lr": 1e-3},
        "blocks_to_swap": 10,
    }
    pipe = get_model_class("flux")(cfg)
    fc = pipe.flux_config
    assert fc.offload_tail_double == 5
    assert fc.offload_tail_single == 11
    assert fc.double_split == (14, 5)
    assert fc.single_split == (27, 11)
    assert pipe.host_stack_names() == ("double_blocks_swap",
                                       "single_blocks_swap")


def test_flux_swap_whole_stack_fallback():
    """When the reference caps (num-2) cannot hold the formula split, a
    16 GB chip still needs the memory: fall back to whole-stack streaming
    with the single-collection layout preserved."""
    pipe = get_model_class("flux")(_flux_cfg(swap=20))
    assert pipe.flux_config.double_split == (0, 2)
    assert pipe.flux_config.single_split == (0, 2)
    assert pipe.host_stack_names() == ("double_blocks", "single_blocks")
    p = nn.unbox(pipe.init_params(jax.random.PRNGKey(0)))
    assert "double_blocks_swap" not in p["params"]
    assert "single_blocks_swap" not in p["params"]


def test_flux_partial_swap_lora_export_offsets():
    from diffusion_pipe_tpu.models.flux_convert import export_lora_diffusers
    from diffusion_pipe_tpu.training.train_state import (
        lora_predicate,
        partition_params,
    )

    part = _flux_pipe(tail_d=1, tail_s=1)
    params = nn.unbox(part.init_params(jax.random.PRNGKey(0)))
    trainable, _ = partition_params(params, lora_predicate)
    sd = export_lora_diffusers(trainable, part.flux_config)
    d_idx = {k.split(".")[2] for k in sd if k.startswith(
        "transformer.transformer_blocks.")}
    s_idx = {k.split(".")[2] for k in sd if k.startswith(
        "transformer.single_transformer_blocks.")}
    assert d_idx == {"0", "1"}, d_idx
    assert s_idx == {"0", "1"}, s_idx

    base = _flux_pipe()
    params_b = nn.unbox(base.init_params(jax.random.PRNGKey(0)))
    trainable_b, _ = partition_params(params_b, lora_predicate)
    assert set(sd) == set(export_lora_diffusers(trainable_b,
                                                base.flux_config))


def test_flux_partial_swap_converter_and_keymap():
    """convert_diffusers_flux routes checkpoint blocks into the right
    stack/local index; keymap_from_flax inverts with reference indices."""
    from diffusion_pipe_tpu.models.flux_convert import convert_diffusers_flux
    from diffusion_pipe_tpu.models.keymaps import keymap_from_flax

    # no adapter: the converter produces base weights only
    base = _flux_pipe(adapter=False)
    part = _flux_pipe(tail_d=1, tail_s=1, adapter=False)
    params = nn.unbox(base.init_params(jax.random.PRNGKey(0)))

    sd = keymap_from_flax(params, base.keymap(), base.flux_config)
    got = convert_diffusers_flux(dict(sd), part.flux_config)
    for stack in ("double_blocks", "single_blocks"):
        whole = params["params"][stack]
        flat_w = jax.tree_util.tree_leaves_with_path(whole)
        flat_r = dict(jax.tree_util.tree_leaves_with_path(
            got["params"][stack]))
        flat_s = dict(jax.tree_util.tree_leaves_with_path(
            got["params"][f"{stack}_swap"]))
        for path, leaf in flat_w:
            np.testing.assert_allclose(
                np.asarray(flat_r[path]), np.asarray(leaf)[:1],
                atol=1e-6, err_msg=f"{stack}{path}")
            np.testing.assert_allclose(
                np.asarray(flat_s[path]), np.asarray(leaf)[1:],
                atol=1e-6, err_msg=f"{stack}{path}")

    # split-layout export emits the same reference key set as the base
    params_split = _flux_split_params(params, 1, 1)
    sd_split = keymap_from_flax(params_split, part.keymap(),
                                part.flux_config)
    assert set(sd_split) == set(sd)
    for k in sd:
        np.testing.assert_allclose(np.asarray(sd_split[k]),
                                   np.asarray(sd[k]), atol=1e-6,
                                   err_msg=k)


# --------------------------------------------------------------------------
# qwen_image: exact-N over the generic single "blocks" stack (the reference
# 24GB example uses blocks_to_swap=8, examples/qwen_image_24gb_vram.toml)
# --------------------------------------------------------------------------

def _qwen_cfg(swap=0):
    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "qwen_image", "dtype": "float32", "_tiny": True},
        "adapter": {"type": "lora", "rank": 4, "alpha": 4, "dropout": 0.0},
        "optimizer": {"type": "adamw", "lr": 1e-3},
    }
    if swap:
        cfg["blocks_to_swap"] = swap
    return cfg


def test_qwen_partial_swap_forward_parity():
    from diffusion_pipe_tpu.models.flux import latent_image_ids

    base = get_model_class("qwen_image")(_qwen_cfg())
    part = get_model_class("qwen_image")(_qwen_cfg(swap=1))
    assert base.qi_config.num_layers == 2
    assert part.qi_config.swap_split == (1, 1)
    assert part.host_stack_names() == ("blocks_swap",)

    params = nn.unbox(base.init_params(jax.random.PRNGKey(0)))
    p = dict(params)
    p["params"] = dict(p["params"])
    whole = p["params"]["blocks"]
    p["params"]["blocks"] = jax.tree.map(lambda x: x[:1], whole)
    p["params"]["blocks_swap"] = jax.tree.map(lambda x: x[1:], whole)

    init_split = nn.unbox(part.init_params(jax.random.PRNGKey(0)))
    assert set(init_split["params"]) == set(p["params"])

    cfg = base.qi_config
    mi = dict(
        hidden_states=jax.random.normal(
            jax.random.PRNGKey(1), (1, 16, cfg.in_channels)),
        encoder_hidden_states=jax.random.normal(
            jax.random.PRNGKey(2), (1, 8, cfg.joint_attention_dim)),
        timestep=jnp.full((1,), 0.4),
        img_ids=latent_image_ids(4, 4),
        txt_mask=jnp.ones((1, 8), jnp.int32),
    )
    out_base = base.model.apply(params, **mi)
    out_split = part.model.apply(p, **mi)
    np.testing.assert_allclose(
        np.asarray(out_base), np.asarray(out_split), atol=1e-6)


def test_qwen_partial_swap_keymap_offsets():
    from diffusion_pipe_tpu.models.keymaps import (
        export_lora_keymap,
        keymap_from_flax,
    )
    from diffusion_pipe_tpu.training.train_state import (
        lora_predicate,
        partition_params,
    )

    base = get_model_class("qwen_image")(_qwen_cfg())
    part = get_model_class("qwen_image")(_qwen_cfg(swap=1))
    params = nn.unbox(base.init_params(jax.random.PRNGKey(0)))
    p = dict(params)
    p["params"] = dict(p["params"])
    whole = p["params"]["blocks"]
    p["params"]["blocks"] = jax.tree.map(lambda x: x[:1], whole)
    p["params"]["blocks_swap"] = jax.tree.map(lambda x: x[1:], whole)

    sd_base = keymap_from_flax(params, base.keymap(), base.qi_config)
    sd_split = keymap_from_flax(p, part.keymap(), part.qi_config)
    assert set(sd_base) == set(sd_split)
    for k in sd_base:
        np.testing.assert_allclose(np.asarray(sd_split[k]),
                                   np.asarray(sd_base[k]), atol=1e-6,
                                   err_msg=k)

    # LoRA export: indices 0 (resident) and 1 (swap, offset back)
    trainable, _ = partition_params(p, lora_predicate)
    sd = export_lora_keymap(trainable, part.keymap(), part.qi_config)
    idx = {k.split(".")[2] for k in sd if "transformer_blocks" in k}
    assert idx == {"0", "1"}, idx


def test_qwen_whole_stack_fallback():
    full = get_model_class("qwen_image")(_qwen_cfg(swap=99))
    assert full.qi_config.swap_split == (0, 2)
    assert full.host_stack_names() == ("blocks",)
    p = nn.unbox(full.init_params(jax.random.PRNGKey(0)))
    assert "blocks_swap" not in p["params"]

def test_fp8_storage_trains_close_to_bf16():
    """transformer_dtype = "float8" (fp8 base-kernel STORAGE — what the
    fp8 host-stream operating point packs, reference models/flux.py:79
    keep-fp32 allowlist analogue): a seeded tiny-wan loss trajectory stays
    within quantization noise of full-precision storage. The TPU streaming
    itself is measured on hardware (BASELINE.md round 4); on CPU the
    offload wrapper is the identity, so this isolates the fp8 numerics."""
    from diffusion_pipe_tpu.training.optimizers import get_optimizer
    from diffusion_pipe_tpu.training.train_state import lora_predicate
    from diffusion_pipe_tpu.training.trainer import (
        init_train_state,
        make_train_step,
    )

    def losses(fp8):
        cfg = _cfg(swap=99)
        if fp8:
            cfg["model"]["transformer_dtype"] = "float8"
        pipe = get_model_class("wan")(cfg)
        opt = get_optimizer(cfg)
        state = init_train_state(
            pipe, opt, jax.random.PRNGKey(0), lora_predicate)
        step = jax.jit(make_train_step(pipe, opt))
        k = jax.random.PRNGKey(1)
        batch = {
            "latents": jax.random.normal(k, (2, 16, 3, 8, 8)) * 0.5,
            "text_embeddings": jax.random.normal(k, (2, 16, 32)),
            "seq_lens": jnp.full((2,), 16, jnp.int32),
        }
        out = []
        for _ in range(6):
            state, m = step(state, batch, jax.random.PRNGKey(7))
            out.append(float(m["loss"]))
        return out

    l_fp8 = losses(True)
    l_bf = losses(False)
    assert np.isfinite(l_fp8).all()
    assert l_fp8[-1] < l_fp8[0], l_fp8
    np.testing.assert_allclose(l_fp8, l_bf, rtol=0.05)

def test_partial_swap_attn_remat_offloads_swapped_stack():
    """swap_activation_checkpointing="offload_attn" (saved flash o/lse of
    swapped blocks pinned host-side) is EXPLICIT-ONLY: the auto-default
    was removed after the XLA TPU host-offload legalizer crashed on the
    nn.scan streaming path (host_offload_utils.cc operand-count check on
    a variadic reduce; BASELINE.md round 5). With no explicit setting the
    swapped stack keeps the main remat spec; the explicit dial still
    resolves; numerics are unchanged and training runs (CPU)."""
    from diffusion_pipe_tpu.training.optimizers import get_optimizer
    from diffusion_pipe_tpu.training.train_state import lora_predicate
    from diffusion_pipe_tpu.training.trainer import (
        init_train_state,
        make_train_step,
    )

    cfg = _cfg(swap=1)
    cfg["activation_checkpointing"] = "attn"
    pipe = get_model_class("wan")(cfg)
    assert pipe.wan_config.remat == "attn"
    assert pipe.wan_config.swap_remat == ""  # no auto offload_attn
    # explicit settings win
    cfg2 = _cfg(swap=1)
    cfg2["activation_checkpointing"] = "attn"
    cfg2["swap_activation_checkpointing"] = "offload_attn"
    pipe = get_model_class("wan")(cfg2)
    assert pipe.wan_config.swap_remat == "offload_attn"

    opt = get_optimizer(cfg)
    state = init_train_state(pipe, opt, jax.random.PRNGKey(0),
                             lora_predicate)
    step = jax.jit(make_train_step(pipe, opt))
    k = jax.random.PRNGKey(1)
    batch = {
        "latents": jax.random.normal(k, (2, 16, 3, 8, 8)) * 0.5,
        "text_embeddings": jax.random.normal(k, (2, 16, 32)),
        "seq_lens": jnp.full((2,), 16, jnp.int32),
    }
    losses = []
    for _ in range(4):
        state, m = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

def test_prefetch_stream_scan_grad_parity():
    """The one-block-ahead prefetch scan (parallel/offload.py
    prefetch_stream_scan, custom VJP — the TPU analogue of the reference's
    double-buffered block swap, utils/offloading.py:69-87) is numerically
    invisible: loss AND grads of a seeded tiny-wan train step with
    stream_prefetch="force" match the map_variables/nn.scan streaming
    path exactly (same init, same batch, CPU backend where both paths
    skip the actual host transfers)."""
    from diffusion_pipe_tpu.training.optimizers import get_optimizer
    from diffusion_pipe_tpu.training.train_state import lora_predicate
    from diffusion_pipe_tpu.training.trainer import (
        init_train_state,
        make_train_step,
    )

    def run(prefetch, swap):
        cfg = _cfg(swap=swap)
        cfg["activation_checkpointing"] = "attn"
        if prefetch:
            cfg["stream_prefetch"] = "force"
        else:
            cfg["stream_prefetch"] = False
        pipe = get_model_class("wan")(cfg)
        opt = get_optimizer(cfg)
        state = init_train_state(
            pipe, opt, jax.random.PRNGKey(0), lora_predicate)
        step = jax.jit(make_train_step(pipe, opt))
        k = jax.random.PRNGKey(1)
        batch = {
            "latents": jax.random.normal(k, (2, 16, 3, 8, 8)) * 0.5,
            "text_embeddings": jax.random.normal(k, (2, 16, 32)),
            "seq_lens": jnp.full((2,), 16, jnp.int32),
        }
        losses = []
        for i in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(7 + i))
            losses.append(float(m["loss"]))
        return losses, nn.unbox(state.trainable)

    for swap in (1, 99):  # partial tail AND whole-stack streamed layouts
        l_pf, t_pf = run(True, swap)
        l_ref, t_ref = run(False, swap)
        assert np.isfinite(l_pf).all()
        np.testing.assert_allclose(l_pf, l_ref, rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree.leaves(t_pf), jax.tree.leaves(t_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_prefetch_grad_leaves_filter():
    """prefetch_stream_scan(grad_leaves=...): trainable-leaf cotangents are
    IDENTICAL to the unfiltered run, and known-frozen float leaves come
    back as exact zeros (the round-4 advisor fix — the backward no longer
    emits, or host-pins, full stacked base-weight gradients)."""
    from flax import traverse_util

    from diffusion_pipe_tpu.models.wan_model import (
        WanAttentionBlock,
        WanConfig,
    )
    from diffusion_pipe_tpu.parallel.offload import prefetch_stream_scan

    cfg = WanConfig.tiny(lora_rank=2, lora_alpha=2.0, dtype=jnp.float32,
                         param_dtype=jnp.float32)
    blk = WanAttentionBlock(cfg, parent=None)
    L, B, S, D = 3, 1, 4, cfg.dim
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, S, D))
    e0 = jax.random.normal(k, (B, 1, 6, D)) * 0.1
    ids = jnp.zeros((S, 3), jnp.int32)
    from diffusion_pipe_tpu.models.wan_model import rope_frequencies

    cos, sin = rope_frequencies(ids, cfg.rope_axes_dim)
    ctx = jax.random.normal(k, (B, 5, D))

    def init_one(key):
        return blk.init(key, x, e0, cos, sin, ctx)["params"]

    storage = nn.unbox(jax.vmap(init_one)(jax.random.split(k, L)))

    def loss(sto, gl):
        y = prefetch_stream_scan(blk, sto, x, (e0, cos, sin, ctx), L,
                                 move=False, grad_leaves=gl)
        return jnp.sum(y ** 2)

    g_all = jax.grad(lambda s: loss(s, None))(storage)
    g_fil = jax.grad(lambda s: loss(s, ("lora_a", "lora_b")))(storage)
    flat_all = traverse_util.flatten_dict(g_all)
    flat_fil = traverse_util.flatten_dict(g_fil)
    n_lora = n_frozen = 0
    for kk, gf in flat_fil.items():
        if kk[-1] in ("lora_a", "lora_b"):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(flat_all[kk]), rtol=1e-6)
            n_lora += 1
        else:
            assert not np.asarray(gf).any(), kk
            n_frozen += 1
    assert n_lora > 0 and n_frozen > 0


def test_unstream_pack_roundtrip_np():
    """_pack_leaf (numpy, host path) and _unpack_leaf_np are exact
    inverses for the stacked storage layout, incl. pad words."""
    from diffusion_pipe_tpu.parallel.offload import (
        _pack_key,
        _pack_leaf,
        _unpack_leaf_np,
    )

    rng = np.random.default_rng(0)
    for shape, dt in [((3, 5, 7), jnp.bfloat16), ((2, 9), jnp.float16),
                      ((4, 3, 3, 3), jnp.bfloat16)]:
        x = rng.standard_normal(shape).astype(dt)
        packed, key = _pack_leaf(x, 1)
        assert key == _pack_key(dt, shape[1:],
                                int(key.split("|")[-1]))
        back = _unpack_leaf_np(packed, key)
        np.testing.assert_array_equal(back, x)


def test_disable_block_swap_for_eval_parity():
    """unstream_param_stacks folds a partial-swap state back into the
    non-swapped layout and the non-streamed eval graph computes the SAME
    loss (reference disable_block_swap_for_eval, train.py:234 /
    prepare_block_swap_inference)."""
    from diffusion_pipe_tpu.parallel.offload import unstream_param_stacks
    from diffusion_pipe_tpu.training.optimizers import get_optimizer
    from diffusion_pipe_tpu.training.train_state import lora_predicate
    from diffusion_pipe_tpu.training.trainer import (
        init_train_state,
        make_eval_step,
    )

    cfg = _cfg(swap=1)
    pipe = get_model_class("wan")(cfg)
    opt = get_optimizer(cfg)
    state = init_train_state(pipe, opt, jax.random.PRNGKey(0),
                             lora_predicate)
    host_stacks = pipe.host_stack_names()
    assert host_stacks == ("blocks_swap",)

    k = jax.random.PRNGKey(1)
    batch = {
        "latents": jax.random.normal(k, (2, 16, 3, 8, 8)) * 0.5,
        "text_embeddings": jax.random.normal(k, (2, 16, 32)),
        "seq_lens": jnp.full((2,), 16, jnp.int32),
    }
    loss_swapped = make_eval_step(pipe)(state, batch,
                                        jax.random.PRNGKey(7), 0.5)

    eval_cfg = _cfg(swap=0)
    eval_pipe = get_model_class("wan")(eval_cfg)
    estate = state.replace(
        trainable=unstream_param_stacks(state.trainable, host_stacks),
        frozen=unstream_param_stacks(state.frozen, host_stacks),
    )
    loss_unswapped = make_eval_step(eval_pipe)(estate, batch,
                                               jax.random.PRNGKey(7), 0.5)
    np.testing.assert_allclose(float(loss_unswapped), float(loss_swapped),
                               rtol=1e-6)


def _hv_cfg(swap=0):
    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "hunyuan-video", "dtype": "float32",
                  "_tiny": True},
        "adapter": {"type": "lora", "rank": 4, "alpha": 4, "dropout": 0.0},
        "optimizer": {"type": "adamw", "lr": 1e-3},
    }
    if swap:
        cfg["blocks_to_swap"] = swap
    return cfg


def _hv_split_params(params, d_res, s_res):
    p = dict(params)
    p["params"] = dict(p["params"])
    for base, res in (("double_blocks", d_res), ("single_blocks", s_res)):
        whole = p["params"][base]
        p["params"][base] = jax.tree.map(lambda x: x[:res], whole)
        p["params"][base + "_swap"] = jax.tree.map(
            lambda x: x[res:], whole)
    return p


def _hv_inputs(cfg):
    k = jax.random.PRNGKey(1)
    return dict(
        x=jax.random.normal(k, (1, cfg.in_channels, 1, 8, 8)),
        t=jnp.full((1,), 400.0),
        text_states=jax.random.normal(k, (1, 6, cfg.text_dim)),
        text_mask=jnp.ones((1, 6), jnp.int32),
        pooled=jax.random.normal(k, (1, cfg.pooled_projection_dim)),
        guidance=jnp.full((1,), 1000.0),
    )


def test_hv_partial_swap_forward_parity():
    """Exact-N blocks_to_swap for hunyuan-video's DUAL stacks (reference
    dual offloaders double=N//2 / single=(N-N//2)*2+1, ref
    models/hunyuan_video.py:492-512) via the generic apply_swap_split —
    numerically invisible vs the single-stack layout."""
    base = get_model_class("hunyuan-video")(_hv_cfg())
    # tiny caps (num-2 = 0) force whole-stack fallback for any real N, so
    # drive the splits directly through the config object
    part = get_model_class("hunyuan-video")(_hv_cfg())
    import dataclasses

    part.hv_config = dataclasses.replace(
        part.hv_config, offload_tail_double=1, offload_tail_single=1)
    part.model = type(part.model)(part.hv_config)
    assert part.hv_config.double_split == (1, 1)
    assert part.hv_config.single_split == (1, 1)
    assert part.host_stack_names() == ("double_blocks_swap",
                                       "single_blocks_swap")

    params = nn.unbox(base.init_params(jax.random.PRNGKey(0)))
    p = _hv_split_params(params, 1, 1)
    init_split = nn.unbox(part.init_params(jax.random.PRNGKey(0)))
    assert set(init_split["params"]) == set(p["params"])

    mi = _hv_inputs(base.hv_config)
    out_base = base.model.apply(params, **mi)
    out_split = part.model.apply(p, **mi)
    np.testing.assert_allclose(
        np.asarray(out_base), np.asarray(out_split), atol=1e-6)


def test_hv_partial_swap_keymap_offsets():
    from diffusion_pipe_tpu.models.keymaps import (
        export_lora_keymap,
        keymap_from_flax,
    )
    from diffusion_pipe_tpu.training.train_state import (
        lora_predicate,
        partition_params,
    )
    import dataclasses

    base = get_model_class("hunyuan-video")(_hv_cfg())
    part = get_model_class("hunyuan-video")(_hv_cfg())
    part.hv_config = dataclasses.replace(
        part.hv_config, offload_tail_double=1, offload_tail_single=1)

    params = nn.unbox(base.init_params(jax.random.PRNGKey(0)))
    p = _hv_split_params(params, 1, 1)

    sd_base = keymap_from_flax(params, base.keymap(), base.hv_config)
    sd_split = keymap_from_flax(p, part.keymap(), part.hv_config)
    assert set(sd_base) == set(sd_split)
    for k in sd_base:
        np.testing.assert_allclose(np.asarray(sd_split[k]),
                                   np.asarray(sd_base[k]), atol=1e-6,
                                   err_msg=k)

    trainable, _ = partition_params(p, lora_predicate)
    sd = export_lora_keymap(trainable, part.keymap(), part.hv_config)
    for stack in ("double_blocks", "single_blocks"):
        idx = {k.split(".")[2] for k in sd if f".{stack}." in k}
        assert idx == {"0", "1"}, (stack, idx)


def test_hv_swap_formula_and_fallback():
    # real-size config: N=8 -> double=4, single=(8-4)*2+1=9 (reference
    # formula, models/hunyuan_video.py:498-501)
    cfg = _hv_cfg(swap=8)
    cfg["model"]["_tiny"] = False
    pipe = get_model_class("hunyuan-video")(cfg)
    assert pipe.hv_config.offload_tail_double == 4
    assert pipe.hv_config.offload_tail_single == 9
    assert pipe.hv_config.double_split == (16, 4)
    assert pipe.hv_config.single_split == (31, 9)
    # beyond the reference caps -> whole-stack streaming
    cfg2 = _hv_cfg(swap=40)
    cfg2["model"]["_tiny"] = False
    pipe2 = get_model_class("hunyuan-video")(cfg2)
    assert pipe2.hv_config.double_split == (0, 20)
    assert pipe2.hv_config.single_split == (0, 40)
    assert pipe2.host_stack_names() == ("double_blocks", "single_blocks")


def _ltx2_cfg(swap=0):
    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "ltx2", "dtype": "float32", "_tiny": True},
        "adapter": {"type": "lora", "rank": 4, "alpha": 4, "dropout": 0.0},
        "optimizer": {"type": "adamw", "lr": 1e-3},
    }
    if swap:
        cfg["blocks_to_swap"] = swap
    return cfg


def test_ltx2_partial_swap_forward_parity():
    """Exact-N blocks_to_swap for ltx2 (docs blocks_to_swap=46) via the
    generic apply_swap_split — numerically invisible."""
    base = get_model_class("ltx2")(_ltx2_cfg())
    part = get_model_class("ltx2")(_ltx2_cfg(swap=1))
    assert part.ltx2_config.swap_split == (1, 1)
    assert part.host_stack_names() == ("blocks_swap",)
    full = get_model_class("ltx2")(_ltx2_cfg(swap=99))
    assert full.ltx2_config.swap_split == (0, 2)
    assert full.host_stack_names() == ("blocks",)

    params = nn.unbox(base.init_params(jax.random.PRNGKey(0)))
    p = _split_params(params, 1)
    init_split = nn.unbox(part.init_params(jax.random.PRNGKey(0)))
    assert set(init_split["params"]) == set(p["params"])

    cfg = base.ltx2_config
    k = jax.random.PRNGKey(1)
    seq, ltxt = 8, 6
    coords = jnp.tile(
        jnp.arange(seq, dtype=jnp.float32)[None, None, :], (1, 3, 1))
    mi = dict(
        x=jax.random.normal(k, (1, seq, cfg.in_channels)),
        prompt_embeds=jax.random.normal(
            k, (1, ltxt, cfg.cross_attention_dim)),
        prompt_mask=jnp.ones((1, ltxt), jnp.int32),
        t=jnp.full((1,), 0.4),
        fractional_coords=coords,
    )
    out_base = base.model.apply(params, **mi)
    out_split = part.model.apply(p, **mi)
    np.testing.assert_allclose(
        np.asarray(out_base), np.asarray(out_split), atol=1e-6)


def test_ltx2_partial_swap_keymap_offsets():
    from diffusion_pipe_tpu.models.keymaps import (
        export_lora_keymap,
        keymap_from_flax,
    )
    from diffusion_pipe_tpu.training.train_state import (
        lora_predicate,
        partition_params,
    )

    base = get_model_class("ltx2")(_ltx2_cfg())
    part = get_model_class("ltx2")(_ltx2_cfg(swap=1))
    params = nn.unbox(base.init_params(jax.random.PRNGKey(0)))
    p = _split_params(params, 1)

    sd_base = keymap_from_flax(params, base.keymap(), base.ltx2_config)
    sd_split = keymap_from_flax(p, part.keymap(), part.ltx2_config)
    assert set(sd_base) == set(sd_split)
    for k in sd_base:
        np.testing.assert_allclose(np.asarray(sd_split[k]),
                                   np.asarray(sd_base[k]), atol=1e-6,
                                   err_msg=k)

    trainable, _ = partition_params(p, lora_predicate)
    sd = export_lora_keymap(trainable, part.keymap(), part.ltx2_config)
    idx = {k.split(".")[2] for k in sd if "transformer_blocks" in k}
    assert idx == {"0", "1"}, idx


def _prefetch_parity_model(pipe_factory, inputs_fn, lora_paths):
    """Loss + lora-grad parity: stream_prefetch='force' (one-block-ahead
    custom-VJP scan, CPU 'force' mode) vs the map_variables/nn.scan
    streaming path, same params, whole-stack AND partial-tail layouts."""
    import dataclasses

    def run(prefetch):
        pipe = pipe_factory()
        pipe_cfg = pipe._keymap_config()
        cfg2 = dataclasses.replace(
            pipe_cfg,
            stream_prefetch="force" if prefetch else False)
        pipe.model = type(pipe.model)(cfg2)
        params = nn.unbox(pipe.init_params(jax.random.PRNGKey(0)))
        mi = inputs_fn(pipe)

        def loss(p):
            out = pipe.model.apply(p, **mi)
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-3

        l, g = jax.value_and_grad(loss)(params)
        return float(l), g

    l_pf, g_pf = run(True)
    l_ref, g_ref = run(False)
    np.testing.assert_allclose(l_pf, l_ref, rtol=1e-5)
    from flax import traverse_util

    flat_pf = traverse_util.flatten_dict(g_pf["params"])
    flat_ref = traverse_util.flatten_dict(g_ref["params"])
    n = 0
    for k, v in flat_pf.items():
        if k[-1] in lora_paths:
            np.testing.assert_allclose(
                np.asarray(v, np.float32),
                np.asarray(flat_ref[k], np.float32),
                rtol=2e-4, atol=1e-6, err_msg=str(k))
            n += 1
    assert n > 0


def test_flux_prefetch_stream_parity():
    def factory():
        return _flux_pipe(tail_d=99, tail_s=99)  # whole-stack streamed

    _prefetch_parity_model(
        factory, lambda p: _flux_inputs(p.flux_config),
        ("lora_a", "lora_b"))

    def factory_partial():
        return _flux_pipe(tail_d=1, tail_s=1)

    _prefetch_parity_model(
        factory_partial, lambda p: _flux_inputs(p.flux_config),
        ("lora_a", "lora_b"))


def test_qwen_prefetch_stream_parity():
    from diffusion_pipe_tpu.models.flux import latent_image_ids

    def inputs(pipe):
        cfg = pipe.qi_config
        return dict(
            hidden_states=jax.random.normal(
                jax.random.PRNGKey(1), (1, 16, cfg.in_channels)),
            encoder_hidden_states=jax.random.normal(
                jax.random.PRNGKey(2), (1, 8, cfg.joint_attention_dim)),
            timestep=jnp.full((1,), 0.4),
            img_ids=latent_image_ids(4, 4),
            txt_mask=jnp.ones((1, 8), jnp.int32),
        )

    for swap in (99, 1):
        def factory(s=swap):
            return get_model_class("qwen_image")(_qwen_cfg(swap=s))

        _prefetch_parity_model(factory, inputs, ("lora_a", "lora_b"))


@pytest.mark.parametrize("model_type,cfg_attr,stack", [
    ("krea2", "krea_config", "blocks"),
    ("ernie_image", "ernie_config", "layers"),
    ("ideogram4", "ideo_config", "layers"),
])
def test_single_stack_family_exact_n_swap(model_type, cfg_attr, stack):
    """Exact-N blocks_to_swap via the generic apply_swap_split /
    split_block_group machinery for the remaining single-stack families
    whose reference supports enable_block_swap (ref models/<family>.py):
    forward parity, init-layout match, host stack names, LoRA export
    offsets, and whole-stack fallback."""
    import dataclasses

    from diffusion_pipe_tpu.models.keymaps import (
        export_lora_keymap,
        keymap_from_flax,
    )
    from diffusion_pipe_tpu.training.train_state import (
        lora_predicate,
        partition_params,
    )

    def mk(swap):
        cfg = {
            "save_every_n_epochs": 1,
            "model": {"type": model_type, "dtype": "float32",
                      "_tiny": True},
            "adapter": {"type": "lora", "rank": 4, "alpha": 4,
                        "dropout": 0.0},
            "optimizer": {"type": "adamw", "lr": 1e-3},
        }
        if swap:
            cfg["blocks_to_swap"] = swap
        return get_model_class(model_type)(cfg)

    base, part, full = mk(0), mk(1), mk(99)
    cfg = getattr(base, cfg_attr)
    assert getattr(part, cfg_attr).swap_split == (cfg.num_layers - 1, 1)
    assert part.host_stack_names() == (f"{stack}_swap",)
    assert full.host_stack_names() == (stack,)
    assert base.host_stack_names() == ()

    params = nn.unbox(base.init_params(jax.random.PRNGKey(0)))
    p = dict(params)
    p["params"] = dict(p["params"])
    whole = p["params"][stack]
    p["params"][stack] = jax.tree.map(lambda x: x[:-1], whole)
    p["params"][f"{stack}_swap"] = jax.tree.map(lambda x: x[-1:], whole)
    init_split = nn.unbox(part.init_params(jax.random.PRNGKey(0)))
    assert set(init_split["params"]) == set(p["params"])
    init_full = nn.unbox(full.init_params(jax.random.PRNGKey(0)))
    assert f"{stack}_swap" not in init_full["params"]

    k = jax.random.PRNGKey(1)
    if model_type == "krea2":
        mi = (jax.random.normal(k, (1, cfg.in_channels, 8, 8)),
              jnp.full((1,), 0.4),
              jax.random.normal(k, (1, 8, cfg.text_layers * cfg.text_dim)),
              jnp.ones((1, 8), jnp.int32))
    elif model_type == "ideogram4":
        mi = (jax.random.normal(k, (1, cfg.latent_dim, 4, 4)),
              jnp.full((1,), 0.4),
              jax.random.normal(k, (1, 8, cfg.text_dim)),
              jnp.ones((1, 8), jnp.int32))
    else:
        mi = (jax.random.normal(k, (1, cfg.in_channels, 8, 8)),
              jnp.full((1,), 0.4),
              jax.random.normal(k, (1, 8, cfg.text_dim)),
              jnp.ones((1, 8), jnp.int32))
    out_base = base.model.apply(params, *mi)
    out_split = part.model.apply(p, *mi)
    np.testing.assert_allclose(np.asarray(out_base), np.asarray(out_split),
                               atol=1e-6)

    # keymap: identical checkpoint keys + values across layouts
    sd_base = keymap_from_flax(params, base.keymap(), cfg)
    sd_split = keymap_from_flax(p, part.keymap(), getattr(part, cfg_attr))
    assert set(sd_base) == set(sd_split)
    for kk in sd_base:
        np.testing.assert_allclose(np.asarray(sd_split[kk]),
                                   np.asarray(sd_base[kk]), atol=1e-6,
                                   err_msg=kk)

    # LoRA export keeps reference indices (offset folds back)
    trainable, _ = partition_params(p, lora_predicate)
    sd = export_lora_keymap(trainable, part.keymap(),
                            getattr(part, cfg_attr))
    import re

    idx = {m.group(1) for kk in sd
           if (m := re.match(rf"diffusion_model\.{stack}\.(\d+)\.", kk))}
    assert idx == {str(i) for i in range(cfg.num_layers)}, idx


def test_hidream_partial_swap_forward_parity_and_keymap():
    """Exact-N blocks_to_swap for hidream's dual stacks (reference
    hidream.py:275-295, same N//2 / (N-N//2)*2+1 split as flux/hunyuan)
    via apply_swap_split — forward parity incl. the per-block llama
    caption slices, keymap values, LoRA export offsets."""
    import dataclasses

    from diffusion_pipe_tpu.models.flux import latent_image_ids
    from diffusion_pipe_tpu.models.keymaps import (
        export_lora_keymap,
        keymap_from_flax,
    )
    from diffusion_pipe_tpu.training.train_state import (
        lora_predicate,
        partition_params,
    )

    def mk():
        return get_model_class("hidream")({
            "save_every_n_epochs": 1,
            "model": {"type": "hidream", "dtype": "float32", "_tiny": True},
            "adapter": {"type": "lora", "rank": 4, "alpha": 4,
                        "dropout": 0.0},
            "optimizer": {"type": "adamw", "lr": 1e-3},
        })

    base, part = mk(), mk()
    part.hd_config = dataclasses.replace(
        part.hd_config, offload_tail_double=1, offload_tail_single=1)
    part.model = type(part.model)(part.hd_config)
    assert part.hd_config.double_split == (1, 1)
    assert part.host_stack_names() == ("double_blocks_swap",
                                       "single_blocks_swap")

    params = nn.unbox(base.init_params(jax.random.PRNGKey(0)))
    p = dict(params)
    p["params"] = dict(p["params"])
    for stack in ("double_blocks", "single_blocks"):
        whole = p["params"][stack]
        p["params"][stack] = jax.tree.map(lambda x: x[:1], whole)
        p["params"][stack + "_swap"] = jax.tree.map(lambda x: x[1:], whole)
    init_split = nn.unbox(part.init_params(jax.random.PRNGKey(0)))
    assert set(init_split["params"]) == set(p["params"])

    cfg = base.hd_config
    k = jax.random.PRNGKey(1)
    mi = (jax.random.normal(k, (1, 16, cfg.in_channels)),
          latent_image_ids(4, 4),
          jnp.full((1,), 0.4),
          jax.random.normal(k, (1, cfg.pooled_dim)),
          jax.random.normal(k, (1, 8, cfg.t5_dim)),
          jax.random.normal(k, (1, 2, 8, cfg.llama_dim)))
    out_base = base.model.apply(params, *mi)
    out_split = part.model.apply(p, *mi)
    np.testing.assert_allclose(np.asarray(out_base),
                               np.asarray(out_split), atol=1e-6)

    sd_base = keymap_from_flax(params, base.keymap(), cfg)
    sd_split = keymap_from_flax(p, part.keymap(), part.hd_config)
    assert set(sd_base) == set(sd_split)
    for kk in sd_base:
        np.testing.assert_allclose(np.asarray(sd_split[kk]),
                                   np.asarray(sd_base[kk]), atol=1e-6,
                                   err_msg=kk)

    trainable, _ = partition_params(p, lora_predicate)
    sd = export_lora_keymap(trainable, part.keymap(), part.hd_config)
    import re

    for tstack in ("double_stream_blocks", "single_stream_blocks"):
        idx = {m.group(1) for kk in sd
               if (m := re.search(rf"\.{tstack}\.(\d+)\.", kk))}
        assert idx == {"0", "1"}, (tstack, idx)
