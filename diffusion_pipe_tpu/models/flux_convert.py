"""Flux weight-key conversion: diffusers <-> this framework, LoRA export.

The reference consumes diffusers FluxTransformer2DModel weights directly and
saves adapters in diffusers-lora / BFL formats (models/flux.py:22-109 BFL key
map, 255-288 save). Here the mapping targets our scanned/stacked param
layout: per-block trees are stacked along a leading [L] axis.

Key map (diffusers -> ours), per double block N in transformer_blocks:
  norm1.linear                -> norm1_linear
  norm1_context.linear        -> norm1_context_linear
  attn.{to_q,to_k,to_v}       -> attn_to_{q,k,v}
  attn.{add_q,add_k,add_v}_proj -> attn_add_{q,k,v}
  attn.to_out.0               -> attn_to_out
  attn.to_add_out             -> attn_to_add_out
  attn.norm_q/norm_k          -> attn_norm_q/attn_norm_k (scale)
  attn.norm_added_q/_k        -> attn_norm_added_q/_k
  ff.net.0.proj / ff.net.2    -> ff_in / ff_out
  ff_context.net.0.proj/net.2 -> ff_context_in / ff_context_out
and per single block N in single_transformer_blocks:
  norm.linear -> norm_linear; attn.to_q/k/v -> attn_to_q/k/v;
  attn.norm_q/k -> attn_norm_q/k; proj_mlp -> proj_mlp; proj_out -> proj_out
top level: x_embedder, context_embedder, time_text_embed.{timestep_embedder,
guidance_embedder,text_embedder}.linear_{1,2}, norm_out.linear ->
norm_out_linear, proj_out.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .flux_model import FluxConfig
from .weights import linear, norm_scale, stack_layers

_DOUBLE_MAP = {
    "norm1_linear": "norm1.linear",
    "norm1_context_linear": "norm1_context.linear",
    "attn_to_q": "attn.to_q",
    "attn_to_k": "attn.to_k",
    "attn_to_v": "attn.to_v",
    "attn_add_q": "attn.add_q_proj",
    "attn_add_k": "attn.add_k_proj",
    "attn_add_v": "attn.add_v_proj",
    "attn_to_out": "attn.to_out.0",
    "attn_to_add_out": "attn.to_add_out",
    "ff_in": "ff.net.0.proj",
    "ff_out": "ff.net.2",
    "ff_context_in": "ff_context.net.0.proj",
    "ff_context_out": "ff_context.net.2",
}
_DOUBLE_NORMS = {
    "attn_norm_q": "attn.norm_q",
    "attn_norm_k": "attn.norm_k",
    "attn_norm_added_q": "attn.norm_added_q",
    "attn_norm_added_k": "attn.norm_added_k",
}
_SINGLE_MAP = {
    "norm_linear": "norm.linear",
    "attn_to_q": "attn.to_q",
    "attn_to_k": "attn.to_k",
    "attn_to_v": "attn.to_v",
    "proj_mlp": "proj_mlp",
    "proj_out": "proj_out",
}
_SINGLE_NORMS = {"attn_norm_q": "attn.norm_q", "attn_norm_k": "attn.norm_k"}


def convert_diffusers_flux(sd: Dict[str, np.ndarray], config: FluxConfig):
    """diffusers state dict (numpy) -> flax variables for FluxTransformer."""
    def block(prefix, lin_map, norm_map):
        out = {}
        for ours, theirs in lin_map.items():
            out[ours] = linear(sd, f"{prefix}.{theirs}")
        for ours, theirs in norm_map.items():
            out[ours] = norm_scale(sd, f"{prefix}.{theirs}")
        return out

    # partial blocks_to_swap: deepest n_swap blocks go to a separate
    # "<stack>_swap" collection (flux_model.FluxConfig.double_split)
    d_res, d_swap = config.double_split
    s_res, s_swap = config.single_split
    doubles = stack_layers([
        block(f"transformer_blocks.{i}", _DOUBLE_MAP, _DOUBLE_NORMS)
        for i in range(d_res or config.num_layers)
    ])
    singles = stack_layers([
        block(f"single_transformer_blocks.{i}", _SINGLE_MAP, _SINGLE_NORMS)
        for i in range(s_res or config.num_single_layers)
    ])

    params = {
        "x_embedder": linear(sd, "x_embedder"),
        "context_embedder": linear(sd, "context_embedder"),
        "timestep_embedder": {
            "linear_1": linear(sd, "time_text_embed.timestep_embedder.linear_1"),
            "linear_2": linear(sd, "time_text_embed.timestep_embedder.linear_2"),
        },
        "text_embedder": {
            "linear_1": linear(sd, "time_text_embed.text_embedder.linear_1"),
            "linear_2": linear(sd, "time_text_embed.text_embedder.linear_2"),
        },
        "norm_out_linear": linear(sd, "norm_out.linear"),
        "proj_out": linear(sd, "proj_out"),
        "double_blocks": doubles,
        "single_blocks": singles,
    }
    if 0 < d_swap < config.num_layers:
        params["double_blocks_swap"] = stack_layers([
            block(f"transformer_blocks.{d_res + i}", _DOUBLE_MAP,
                  _DOUBLE_NORMS)
            for i in range(d_swap)
        ])
    if 0 < s_swap < config.num_single_layers:
        params["single_blocks_swap"] = stack_layers([
            block(f"single_transformer_blocks.{s_res + i}", _SINGLE_MAP,
                  _SINGLE_NORMS)
            for i in range(s_swap)
        ])
    if config.guidance_embeds:
        params["guidance_embedder"] = {
            "linear_1": linear(sd, "time_text_embed.guidance_embedder.linear_1"),
            "linear_2": linear(sd, "time_text_embed.guidance_embedder.linear_2"),
        }
    return {"params": params}


_LOKR_LEAVES = {
    "lokr_w1": "lokr_w1",
    "lokr_w2": "lokr_w2",
    "lokr_w2_a": "lokr_w2_a",
    "lokr_w2_b": "lokr_w2_b",
}


def export_lora_diffusers(trainable, config: FluxConfig) -> Dict[str, np.ndarray]:
    """Our trainable (LoRA) tree -> diffusers-lora state dict keys:
    transformer.<block path>.lora_A.weight [r, in] / lora_B.weight [out, r]
    (kohya/ComfyUI variants derive from this naming; reference saves the
    diffusers format for flux adapters, models/flux.py:255-288)."""
    out = {}
    p = trainable["params"]

    def emit(prefix_theirs, leaf):
        if leaf is None:
            return
        if "lora_a" in leaf:
            a = np.asarray(leaf["lora_a"])  # [in, r]
            b = np.asarray(leaf["lora_b"])  # [r, out]
            out[f"transformer.{prefix_theirs}.lora_A.weight"] = (
                np.ascontiguousarray(a.T.astype(np.float32))
            )
            out[f"transformer.{prefix_theirs}.lora_B.weight"] = (
                np.ascontiguousarray(b.T.astype(np.float32))
            )
        # LoKr factors (PEFT LoKrLayer param names, torch [out, in] orientation)
        for ours_name, theirs_name in _LOKR_LEAVES.items():
            if ours_name in leaf:
                w = np.asarray(leaf[ours_name])
                out[f"transformer.{prefix_theirs}.{theirs_name}"] = (
                    np.ascontiguousarray(w.T.astype(np.float32))
                )

    def emit_stacked(tree, count, prefix_fmt, lin_map, offset=0):
        for ours, theirs in lin_map.items():
            leaf = tree.get(ours)
            if leaf is None or not isinstance(leaf, dict):
                continue
            for i in range(count):
                emit_single = {
                    k: np.asarray(v)[i]
                    for k, v in leaf.items()
                    if k == "lora_a" or k == "lora_b" or k in _LOKR_LEAVES
                }
                emit(prefix_fmt.format(i=offset + i) + "." + theirs,
                     emit_single)

    d_res, d_swap = config.double_split
    s_res, s_swap = config.single_split
    emit_stacked(p.get("double_blocks", {}), d_res or config.num_layers,
                 "transformer_blocks.{i}", _DOUBLE_MAP)
    if "double_blocks_swap" in p:
        emit_stacked(p["double_blocks_swap"], d_swap,
                     "transformer_blocks.{i}", _DOUBLE_MAP, offset=d_res)
    emit_stacked(p.get("single_blocks", {}), s_res or config.num_single_layers,
                 "single_transformer_blocks.{i}", _SINGLE_MAP)
    if "single_blocks_swap" in p:
        emit_stacked(p["single_blocks_swap"], s_swap,
                     "single_transformer_blocks.{i}", _SINGLE_MAP,
                     offset=s_res)
    return out


def import_lora_diffusers(sd: Dict[str, np.ndarray], config: FluxConfig, params):
    """Inverse of export_lora_diffusers: init lora_a/lora_b leaves from a
    diffusers-lora (or ComfyUI `diffusion_model.`-prefixed) state dict.

    Implements the reference's adapter.init_from_existing
    (train.py:525-526 -> models/base.py:313-332): keys present in the file
    overwrite our stacked per-block LoRA factors; leaves without a
    corresponding key keep their fresh initialization. Preserves flax
    Partitioned boxes on the target tree.
    """
    import re

    import flax.linen as nn
    import jax.numpy as jnp
    from flax import traverse_util

    sd = {re.sub(r"^(transformer|diffusion_model)\.", "", k): v for k, v in sd.items()}

    def put(leaf, new):
        new = np.ascontiguousarray(new)
        if isinstance(leaf, nn.Partitioned):
            return leaf.replace(value=jnp.asarray(new, leaf.value.dtype))
        return jnp.asarray(new, np.asarray(leaf).dtype)

    flat = traverse_util.flatten_dict(params["params"])
    loaded = 0

    leaf_to_theirs = {
        "lora_a": "lora_A.weight",
        "lora_b": "lora_B.weight",
        **_LOKR_LEAVES,
    }

    def fill(block_key: str, count: int, prefix_fmt: str,
             lin_map: Dict[str, str], offset: int = 0):
        nonlocal loaded
        for ours, theirs in lin_map.items():
            for leaf_name, their_leaf in leaf_to_theirs.items():
                key = (block_key, ours, leaf_name)
                if key not in flat:
                    continue
                stack = np.array(nn.unbox(flat[key]), dtype=np.float32, copy=True)
                hit = False
                for i in range(count):
                    k = f"{prefix_fmt.format(i=offset + i)}.{theirs}.{their_leaf}"
                    if k in sd:
                        # saved in torch [out, in] orientation; ours is [in, out]
                        stack[i] = np.asarray(sd[k], np.float32).T
                        hit = True
                        loaded += 1
                if hit:
                    flat[key] = put(flat[key], stack)

    d_res, d_swap = config.double_split
    s_res, s_swap = config.single_split
    fill("double_blocks", d_res or config.num_layers,
         "transformer_blocks.{i}", _DOUBLE_MAP)
    if 0 < d_swap < config.num_layers:
        fill("double_blocks_swap", d_swap, "transformer_blocks.{i}",
             _DOUBLE_MAP, offset=d_res)
    fill("single_blocks", s_res or config.num_single_layers,
         "single_transformer_blocks.{i}", _SINGLE_MAP)
    if 0 < s_swap < config.num_single_layers:
        fill("single_blocks_swap", s_swap, "single_transformer_blocks.{i}",
             _SINGLE_MAP, offset=s_res)
    if loaded == 0:
        raise RuntimeError(
            "init_from_existing: no LoRA keys in the file matched this model"
        )
    return {**params, "params": traverse_util.unflatten_dict(flat)}


def convert_bfl_flux(sd: Dict[str, np.ndarray], config: FluxConfig):
    """BFL single-file flux checkpoint -> flax params.

    Implements the reference's BFL<->diffusers key map (models/flux.py:22-109):
    fused double-block qkv splits into to_q/k/v (and add_*), the single-block
    linear1 splits into qkv + proj_mlp, embedder names remap, then the
    diffusers converter applies.
    """
    d = {}
    h = config.hidden_size

    def put(dst, src_key):
        if src_key in sd:
            d[dst] = np.asarray(sd[src_key])

    top = {
        "time_in.in_layer": "time_text_embed.timestep_embedder.linear_1",
        "time_in.out_layer": "time_text_embed.timestep_embedder.linear_2",
        "vector_in.in_layer": "time_text_embed.text_embedder.linear_1",
        "vector_in.out_layer": "time_text_embed.text_embedder.linear_2",
        "guidance_in.in_layer": "time_text_embed.guidance_embedder.linear_1",
        "guidance_in.out_layer": "time_text_embed.guidance_embedder.linear_2",
        "txt_in": "context_embedder",
        "img_in": "x_embedder",
        "final_layer.linear": "proj_out",
    }
    for bfl, diff in top.items():
        put(f"{diff}.weight", f"{bfl}.weight")
        put(f"{diff}.bias", f"{bfl}.bias")
    # final adaLN: BFL order is (shift, scale); diffusers norm_out.linear is
    # (scale, shift) -> swap halves (reference swaps when converting)
    w = np.asarray(sd["final_layer.adaLN_modulation.1.weight"])
    b = np.asarray(sd["final_layer.adaLN_modulation.1.bias"])
    d["norm_out.linear.weight"] = np.concatenate([w[h:], w[:h]], axis=0)
    d["norm_out.linear.bias"] = np.concatenate([b[h:], b[:h]], axis=0)

    def split3(key, names, prefix):
        w = np.asarray(sd[f"{key}.weight"])
        parts = np.split(w, 3, axis=0)
        for n, pw in zip(names, parts):
            d[f"{prefix}.{n}.weight"] = pw
        if f"{key}.bias" in sd:
            for n, pb in zip(names, np.split(np.asarray(sd[f"{key}.bias"]), 3)):
                d[f"{prefix}.{n}.bias"] = pb

    for i in range(config.num_layers):
        bp = f"double_blocks.{i}"
        dp = f"transformer_blocks.{i}"
        pairs = {
            "img_mod.lin": "norm1.linear",
            "txt_mod.lin": "norm1_context.linear",
            "img_attn.proj": "attn.to_out.0",
            "txt_attn.proj": "attn.to_add_out",
            "img_mlp.0": "ff.net.0.proj",
            "img_mlp.2": "ff.net.2",
            "txt_mlp.0": "ff_context.net.0.proj",
            "txt_mlp.2": "ff_context.net.2",
        }
        for bfl, diff in pairs.items():
            put(f"{dp}.{diff}.weight", f"{bp}.{bfl}.weight")
            put(f"{dp}.{diff}.bias", f"{bp}.{bfl}.bias")
        split3(f"{bp}.img_attn.qkv", ["attn.to_q", "attn.to_k", "attn.to_v"], dp)
        split3(f"{bp}.txt_attn.qkv",
               ["attn.add_q_proj", "attn.add_k_proj", "attn.add_v_proj"], dp)
        norms = {
            "img_attn.norm.query_norm.scale": "attn.norm_q.weight",
            "img_attn.norm.key_norm.scale": "attn.norm_k.weight",
            "txt_attn.norm.query_norm.scale": "attn.norm_added_q.weight",
            "txt_attn.norm.key_norm.scale": "attn.norm_added_k.weight",
        }
        for bfl, diff in norms.items():
            put(f"{dp}.{diff}", f"{bp}.{bfl}")

    mlp_dim = int(h * config.mlp_ratio)
    for i in range(config.num_single_layers):
        bp = f"single_blocks.{i}"
        dp = f"single_transformer_blocks.{i}"
        put(f"{dp}.norm.linear.weight", f"{bp}.modulation.lin.weight")
        put(f"{dp}.norm.linear.bias", f"{bp}.modulation.lin.bias")
        put(f"{dp}.proj_out.weight", f"{bp}.linear2.weight")
        put(f"{dp}.proj_out.bias", f"{bp}.linear2.bias")
        put(f"{dp}.attn.norm_q.weight", f"{bp}.norm.query_norm.scale")
        put(f"{dp}.attn.norm_k.weight", f"{bp}.norm.key_norm.scale")
        w = np.asarray(sd[f"{bp}.linear1.weight"])
        parts = np.split(w, [h, 2 * h, 3 * h], axis=0)
        for n, pw in zip(["attn.to_q", "attn.to_k", "attn.to_v", "proj_mlp"],
                         parts):
            d[f"{dp}.{n}.weight"] = pw
        if f"{bp}.linear1.bias" in sd:
            for n, pb in zip(
                ["attn.to_q", "attn.to_k", "attn.to_v", "proj_mlp"],
                np.split(np.asarray(sd[f"{bp}.linear1.bias"]), [h, 2 * h, 3 * h]),
            ):
                d[f"{dp}.{n}.bias"] = pb

    return convert_diffusers_flux(d, config)
