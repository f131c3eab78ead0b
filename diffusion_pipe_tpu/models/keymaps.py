"""Declarative weight-key maps: torch checkpoints <-> flax params, LoRA export.

One KeyMap per model family drives all three serialization surfaces the
reference implements per model by hand:
  - load_weights   (reference per-model from_pretrained / manual safetensors
                    loads, e.g. models/qwen_image.py:247-269)
  - save_adapter   (reference ComfyUI 'diffusion_model.*' / diffusers
                    'transformer.*' LoRA exports, models/base.py:609-613,
                    utils/saver.py:58-116)
  - save_model     (full fine-tune export: invert the load map)

Conventions:
  - flax paths are '/'-joined into nested param dicts.
  - torch Linear [O, I] <-> flax Dense kernel [I, O] (transposed).
  - Conv3d/Conv2d kernels transpose [O, I, *k] <-> [*k, I, O].
  - scan-stacked block groups carry a leading [L] layer axis on every leaf.
  - `fused` entries split one torch tensor into several flax leaves along
    the output dim (e.g. BFL qkv -> attn_to_q/k/v).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .weights import linear, norm_scale, stack_layers


@dataclasses.dataclass
class BlockGroup:
    """One scan-stacked run of blocks.

    linears: flax leaf name -> torch submodule path (within the block).
    norms:   scale-only norms (torch `.weight` -> flax `scale`).
    raw:     direct tensors (modulation tables); torch key used verbatim.
    fused:   torch submodule path -> (flax leaf names...) split equally
             along the torch OUT dim (row blocks).
    """

    flax_key: str
    prefix: str                       # e.g. "transformer_blocks"
    # config attr holding the block count, or a literal int (partial
    # blocks_to_swap splits embed concrete counts via split_block_group)
    num_layers_attr: Any = None
    # torch index base: flax stack slot i <-> torch `{prefix}.{offset+i}`.
    # Used by partial blocks_to_swap splits, where the deepest N blocks
    # live in a separate "<stack>_swap" flax collection but keep the
    # reference's single-stack checkpoint indexing (utils/offloading.py:184).
    offset: int = 0
    linears: Dict[str, str] = dataclasses.field(default_factory=dict)
    norms: Dict[str, str] = dataclasses.field(default_factory=dict)
    raw: Dict[str, str] = dataclasses.field(default_factory=dict)
    fused: Dict[str, Tuple] = dataclasses.field(default_factory=dict)
    # stacked bias-free linears: flax leaf -> (torch_subpath_fmt with one
    # {} slot, count | config-attr). Per block i, torch weights
    # `{prefix}.{i}.{fmt.format(j)}.weight` [O, I] are stacked to one
    # [N, I, O] kernel leaf (MoE expert banks, per-index projections).
    stacks: Dict[str, Tuple[str, Any]] = dataclasses.field(
        default_factory=dict)
    # torch norm param suffix: "weight" (torch RMS/LN) or "scale" (BFL)
    norm_suffix: str = "weight"


@dataclasses.dataclass
class KeyMap:
    blocks: List[BlockGroup]
    top_linears: Dict[str, str] = dataclasses.field(default_factory=dict)
    top_norms: Dict[str, str] = dataclasses.field(default_factory=dict)
    top_raw: Dict[str, str] = dataclasses.field(default_factory=dict)
    # flax path -> torch prefix for conv weights ([O,I,*k] <-> [*k,I,O])
    top_convs: Dict[str, str] = dataclasses.field(default_factory=dict)
    # patchify-projection: torch Conv2d/3d [O,C,*k] <-> flax Dense kernel
    # [prod(k)*C, O] applied to (k..., C)-ordered flattened patches
    top_patch_linears: Dict[str, str] = dataclasses.field(default_factory=dict)
    # required with top_patch_linears for inversion: flax path -> (C, *k)
    patch_linear_shapes: Dict[str, Tuple[int, ...]] = dataclasses.field(
        default_factory=dict)
    # fused linears outside block stacks: torch path -> entries (see
    # BlockGroup.fused); flax names here are full '/'-joined paths
    top_fused: Dict[str, Tuple] = dataclasses.field(default_factory=dict)
    # stacked bias-free linears outside blocks (see BlockGroup.stacks)
    top_stacks: Dict[str, Tuple[str, Any]] = dataclasses.field(
        default_factory=dict)
    top_norm_suffix: str = "weight"
    lora_prefix: str = "diffusion_model."
    strip_prefixes: Sequence[str] = (
        "model.diffusion_model.", "diffusion_model.", "transformer.",
    )
    # Regex patterns (re.search over prefix-stripped keys) naming
    # checkpoint tensors with no compute-path module in this framework —
    # frozen sidecar towers the reference keeps in the same file (ltx2
    # audio branch, hv15 vision_in). Matched keys are excluded from
    # conversion, stashed on the pipeline at load, and re-emitted verbatim
    # by save_model so a full-model export stays a complete checkpoint.
    passthrough_patterns: Sequence[str] = ()


def _set_path(tree: dict, path: str, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _get_path(tree: dict, path: str):
    node = tree
    for k in path.split("/"):
        node = node[k]
    return node


def strip_known_prefixes(sd: Dict[str, np.ndarray], km: KeyMap):
    """Normalize wrapper prefixes; picks the longest matching per key."""
    out = {}
    for k, v in sd.items():
        for p in km.strip_prefixes:
            if k.startswith(p):
                k = k[len(p):]
                break
        out[k] = v
    return out


def split_passthrough(sd: Dict[str, np.ndarray], km: KeyMap):
    """Partition a (stripped-key) state dict into (convertible,
    passthrough) per km.passthrough_patterns."""
    if not km.passthrough_patterns:
        return sd, {}
    pats = [re.compile(p) for p in km.passthrough_patterns]
    main: Dict[str, np.ndarray] = {}
    keep: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        (keep if any(p.search(k) for p in pats) else main)[k] = v
    return main, keep


def split_block_group(bg: "BlockGroup", n_res: int, n_swap: int):
    """Partial blocks_to_swap keymap split: one BlockGroup becomes a
    [resident, "<flax_key>_swap"] pair that SHARES the reference's
    single-stack checkpoint indexing (utils/offloading.py:184 swaps
    exactly the deepest N; checkpoints and LoRA exports keep the
    original indices via `offset`). Returns [bg] unchanged when either
    side of the split is empty (no swap, or whole-stack streaming which
    keeps the single-collection layout)."""
    if n_res <= 0 or n_swap <= 0:
        return [bg]
    res = dataclasses.replace(bg, num_layers_attr=n_res)
    swap = dataclasses.replace(
        bg, flax_key=bg.flax_key + "_swap", num_layers_attr=n_swap,
        offset=bg.offset + n_res,
    )
    return [res, swap]


def _resolve_count(count, config) -> int:
    return getattr(config, count) if isinstance(count, str) else int(count)


def _stack_from_sd(sd, base: str, fmt: str, n: int) -> np.ndarray:
    return np.stack([
        np.ascontiguousarray(np.asarray(
            sd[f"{base}{fmt.format(j)}.weight"]).T)
        for j in range(n)
    ])


def _stack_to_sd(sd, base: str, fmt: str, kernel: np.ndarray):
    for j in range(kernel.shape[0]):
        sd[f"{base}{fmt.format(j)}.weight"] = np.ascontiguousarray(
            kernel[j].T)


def _block_from_sd(sd, bg: BlockGroup, i: int, config=None) -> dict:
    prefix = f"{bg.prefix}.{bg.offset + i}"
    out: dict = {}
    for ours, (fmt, count) in bg.stacks.items():
        _set_path(out, ours, _stack_from_sd(
            sd, f"{prefix}.", fmt, _resolve_count(count, config)))
    for ours, theirs in bg.linears.items():
        _set_path(out, ours, linear(sd, f"{prefix}.{theirs}"))
    for ours, theirs in bg.norms.items():
        _set_path(out, ours, {"scale": np.asarray(
            sd[f"{prefix}.{theirs}.{bg.norm_suffix}"])})
    for ours, theirs in bg.raw.items():
        _set_path(out, ours, np.asarray(sd[f"{prefix}.{theirs}"]))
    for theirs, entries in bg.fused.items():
        names, sizes = _fused_names_sizes(entries)
        w = np.asarray(sd[f"{prefix}.{theirs}.weight"])
        has_bias = f"{prefix}.{theirs}.bias" in sd
        b = np.asarray(sd[f"{prefix}.{theirs}.bias"]) if has_bias else None
        chunks = _split_rows(w, names, sizes)
        bchunks = (_split_rows(b, names, sizes)
                   if b is not None else [None] * len(names))
        for name, cw, cb in zip(names, chunks, bchunks):
            entry = {"kernel": np.ascontiguousarray(cw.T)}
            if cb is not None:
                entry["bias"] = cb
            _set_path(out, name, entry)
    return out


def _fused_names_sizes(entries):
    """entries: tuple of str (equal split) or (name, out_size) pairs."""
    if all(isinstance(e, str) for e in entries):
        return list(entries), None
    return [e[0] for e in entries], [int(e[1]) for e in entries]


def _split_rows(w, names, sizes):
    if sizes is None:
        return np.split(w, len(names), axis=0)
    assert sum(sizes) == w.shape[0], (sizes, w.shape)
    out = []
    row = 0
    for s in sizes:
        out.append(w[row:row + s])
        row += s
    return out


def keymap_to_flax(sd: Dict[str, np.ndarray], km: KeyMap, config) -> dict:
    """torch-layout state dict -> {"params": ...} flax tree."""
    sd = strip_known_prefixes(sd, km)
    params: dict = {}
    for ours, theirs in km.top_linears.items():
        _set_path(params, ours, linear(sd, theirs))
    for ours, theirs in km.top_norms.items():
        _set_path(params, ours, {"scale": np.asarray(
            sd[f"{theirs}.{km.top_norm_suffix}"])})
    for ours, theirs in km.top_raw.items():
        _set_path(params, ours, np.asarray(sd[theirs]))
    for ours, theirs in km.top_convs.items():
        w = np.asarray(sd[f"{theirs}.weight"])
        nk = w.ndim - 2
        entry = {"kernel": np.transpose(
            w, tuple(range(2, 2 + nk)) + (1, 0))}
        if f"{theirs}.bias" in sd:
            entry["bias"] = np.asarray(sd[f"{theirs}.bias"])
        _set_path(params, ours, entry)
    for ours, theirs in km.top_patch_linears.items():
        w = np.asarray(sd[f"{theirs}.weight"])  # [O, C, *k]
        o = w.shape[0]
        nk = w.ndim - 2
        kernel = np.transpose(w, tuple(range(2, 2 + nk)) + (1, 0)).reshape(
            -1, o)
        entry = {"kernel": np.ascontiguousarray(kernel)}
        if f"{theirs}.bias" in sd:
            entry["bias"] = np.asarray(sd[f"{theirs}.bias"])
        _set_path(params, ours, entry)
    for theirs, entries in km.top_fused.items():
        names, sizes = _fused_names_sizes(entries)
        w = np.asarray(sd[f"{theirs}.weight"])
        b = (np.asarray(sd[f"{theirs}.bias"])
             if f"{theirs}.bias" in sd else None)
        chunks = _split_rows(w, names, sizes)
        bchunks = (_split_rows(b, names, sizes)
                   if b is not None else [None] * len(names))
        for name, cw, cb in zip(names, chunks, bchunks):
            entry = {"kernel": np.ascontiguousarray(cw.T)}
            if cb is not None:
                entry["bias"] = cb
            _set_path(params, name, entry)
    for ours, (fmt, count) in km.top_stacks.items():
        _set_path(params, ours, _stack_from_sd(
            sd, "", fmt, _resolve_count(count, config)))
    for bg in km.blocks:
        n = _resolve_count(bg.num_layers_attr, config)
        params[bg.flax_key] = stack_layers(
            [_block_from_sd(sd, bg, i, config) for i in range(n)]
        )
    return {"params": params}


def _block_to_sd(sd, bg: BlockGroup, block_tree: dict, i: int):
    prefix = f"{bg.prefix}.{bg.offset + i}"

    def leaf(path):
        return _get_path(block_tree, path)

    for ours, (fmt, _count) in bg.stacks.items():
        _stack_to_sd(sd, f"{prefix}.", fmt, np.asarray(leaf(ours))[i])

    for ours, theirs in bg.linears.items():
        entry = leaf(ours)
        sd[f"{prefix}.{theirs}.weight"] = np.ascontiguousarray(
            np.asarray(entry["kernel"])[i].T)
        if "bias" in entry:
            sd[f"{prefix}.{theirs}.bias"] = np.asarray(entry["bias"])[i]
    for ours, theirs in bg.norms.items():
        sd[f"{prefix}.{theirs}.{bg.norm_suffix}"] = np.asarray(
            leaf(ours)["scale"])[i]
    for ours, theirs in bg.raw.items():
        sd[f"{prefix}.{theirs}"] = np.asarray(leaf(ours))[i]
    for theirs, entries in bg.fused.items():
        leaf_names, _sizes = _fused_names_sizes(entries)
        ws, bs = [], []
        for name in leaf_names:
            entry = leaf(name)
            ws.append(np.asarray(entry["kernel"])[i].T)
            if "bias" in entry:
                bs.append(np.asarray(entry["bias"])[i])
        sd[f"{prefix}.{theirs}.weight"] = np.ascontiguousarray(
            np.concatenate(ws, axis=0))
        if bs:
            sd[f"{prefix}.{theirs}.bias"] = np.concatenate(bs, axis=0)


def keymap_from_flax(params: dict, km: KeyMap, config
                     ) -> Dict[str, np.ndarray]:
    """Invert keymap_to_flax: flax tree -> torch-layout state dict
    (full-model export / test synthesis)."""
    p = params["params"] if "params" in params else params
    sd: Dict[str, np.ndarray] = {}
    for ours, theirs in km.top_linears.items():
        entry = _get_path(p, ours)
        sd[f"{theirs}.weight"] = np.ascontiguousarray(
            np.asarray(entry["kernel"]).T)
        if "bias" in entry:
            sd[f"{theirs}.bias"] = np.asarray(entry["bias"])
    for ours, theirs in km.top_norms.items():
        sd[f"{theirs}.{km.top_norm_suffix}"] = np.asarray(
            _get_path(p, ours)["scale"])
    for ours, theirs in km.top_raw.items():
        sd[theirs] = np.asarray(_get_path(p, ours))
    for ours, theirs in km.top_convs.items():
        entry = _get_path(p, ours)
        w = np.asarray(entry["kernel"])
        nk = w.ndim - 2
        sd[f"{theirs}.weight"] = np.ascontiguousarray(
            np.transpose(w, (nk + 1, nk) + tuple(range(nk))))
        if "bias" in entry:
            sd[f"{theirs}.bias"] = np.asarray(entry["bias"])
    for ours, theirs in km.top_patch_linears.items():
        entry = _get_path(p, ours)
        kernel = np.asarray(entry["kernel"])  # [prod(k)*C, O]
        shape = km.patch_linear_shapes[ours]  # (C, *k)
        c, *k = shape
        o = kernel.shape[1]
        w = kernel.reshape(tuple(k) + (c, o))
        nk = len(k)
        sd[f"{theirs}.weight"] = np.ascontiguousarray(
            np.transpose(w, (nk + 1, nk) + tuple(range(nk))))
        if "bias" in entry:
            sd[f"{theirs}.bias"] = np.asarray(entry["bias"])
    for theirs, entries in km.top_fused.items():
        names, _sizes = _fused_names_sizes(entries)
        ws, bs = [], []
        for name in names:
            entry = _get_path(p, name)
            ws.append(np.asarray(entry["kernel"]).T)
            if "bias" in entry:
                bs.append(np.asarray(entry["bias"]))
        sd[f"{theirs}.weight"] = np.ascontiguousarray(
            np.concatenate(ws, axis=0))
        if bs:
            sd[f"{theirs}.bias"] = np.concatenate(bs, axis=0)
    for ours, (fmt, _count) in km.top_stacks.items():
        _stack_to_sd(sd, "", fmt, np.asarray(_get_path(p, ours)))
    for bg in km.blocks:
        n = _resolve_count(bg.num_layers_attr, config)
        for i in range(n):
            _block_to_sd(sd, bg, p[bg.flax_key], i)
    return sd


_LOKR_LEAVES = ("lokr_w1", "lokr_w2", "lokr_w2_a", "lokr_w2_b")


def export_lora_keymap(trainable: dict, km: KeyMap, config
                       ) -> Dict[str, np.ndarray]:
    """Adapter factors -> reference-format LoRA state dict
    (`<lora_prefix><torch_path>.lora_A/B.weight`, fused entries exported
    under the fused torch path with stacked factors like PEFT does for
    merged qkv: the A factor is shared-input so identical, B factors are
    block-diagonal — here we export per-split paths with `.q/.k/.v`-style
    suffixes only when the map has separate entries; fused targets export
    the concatenated B rows)."""
    p = trainable["params"] if "params" in trainable else trainable
    out: Dict[str, np.ndarray] = {}

    def put(torch_path, leaf, i):
        if leaf is None:
            return
        if "lora_a" in leaf:
            a = np.asarray(leaf["lora_a"])[i]
            b = np.asarray(leaf["lora_b"])[i]
            out[f"{km.lora_prefix}{torch_path}.lora_A.weight"] = (
                np.ascontiguousarray(a.T.astype(np.float32)))
            out[f"{km.lora_prefix}{torch_path}.lora_B.weight"] = (
                np.ascontiguousarray(b.T.astype(np.float32)))
        for name in _LOKR_LEAVES:
            if name in leaf:
                out[f"{km.lora_prefix}{torch_path}.{name}"] = (
                    np.ascontiguousarray(
                        np.asarray(leaf[name])[i].T.astype(np.float32)))

    def maybe(tree, path):
        node = tree
        for k in path.split("/"):
            if not isinstance(node, dict) or k not in node:
                return None
            node = node[k]
        return node if isinstance(node, dict) else None

    for bg in km.blocks:
        blocks = p.get(bg.flax_key)
        if not isinstance(blocks, dict):
            continue
        n = _resolve_count(bg.num_layers_attr, config)
        for ours, theirs in bg.linears.items():
            leaf = maybe(blocks, ours)
            if leaf is None:
                continue
            for i in range(n):
                put(f"{bg.prefix}.{bg.offset + i}.{theirs}", leaf, i)
        for theirs, entries in bg.fused.items():
            leaf_names, _sizes = _fused_names_sizes(entries)
            leaves = [maybe(blocks, name) for name in leaf_names]
            if all(lf is None or "lora_a" not in lf for lf in leaves):
                continue
            for i in range(n):
                # fused export: stack B factors block-diagonally so
                # up @ down reproduces the per-split deltas on the fused
                # [sum(O), I] torch weight; A factors concatenate on rank
                a_list, b_blocks = [], []
                o_sizes = []
                for lf in leaves:
                    a = np.asarray(lf["lora_a"])[i]      # [I, r]
                    b = np.asarray(lf["lora_b"])[i]      # [r, O]
                    a_list.append(a.T)                    # [r, I]
                    b_blocks.append(b.T)                  # [O, r]
                    o_sizes.append(b.shape[1])
                r = a_list[0].shape[0]
                big_a = np.concatenate(a_list, axis=0)    # [nr, I]
                big_b = np.zeros((sum(o_sizes), r * len(leaves)), np.float32)
                row = 0
                for j, bb in enumerate(b_blocks):
                    big_b[row:row + bb.shape[0], j * r:(j + 1) * r] = bb
                    row += bb.shape[0]
                out[f"{km.lora_prefix}{bg.prefix}.{bg.offset + i}.{theirs}"
                    ".lora_A.weight"] = big_a.astype(np.float32)
                out[f"{km.lora_prefix}{bg.prefix}.{bg.offset + i}.{theirs}"
                    ".lora_B.weight"] = big_b.astype(np.float32)
    # top-level adapters (rare; embedders usually carry none)
    for ours, theirs in km.top_linears.items():
        node = p
        found = True
        for k in ours.split("/"):
            if not isinstance(node, dict) or k not in node:
                found = False
                break
            node = node[k]
        if found and isinstance(node, dict) and (
            "lora_a" in node or any(n in node for n in _LOKR_LEAVES)
        ):
            if "lora_a" in node:
                a = np.asarray(node["lora_a"])
                b = np.asarray(node["lora_b"])
                out[f"{km.lora_prefix}{theirs}.lora_A.weight"] = (
                    np.ascontiguousarray(a.T.astype(np.float32)))
                out[f"{km.lora_prefix}{theirs}.lora_B.weight"] = (
                    np.ascontiguousarray(b.T.astype(np.float32)))
    return out


def save_lora_safetensors(path, sd: Dict[str, np.ndarray],
                          alpha: Optional[float] = None):
    """Write adapter_model.safetensors (+ per-pair .alpha entries when
    given, kohya-compatible scaling metadata)."""
    from pathlib import Path

    from safetensors.numpy import save_file

    out = dict(sd)
    if alpha is not None:
        for k in list(sd):
            if k.endswith(".lora_A.weight"):
                out[k[: -len(".lora_A.weight")] + ".alpha"] = np.asarray(
                    alpha, np.float32)
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    save_file(out, str(path / "adapter_model.safetensors"),
              metadata={"format": "pt"})


def load_sd_for_pipeline(pipeline, path_keys=("ckpt_path",
                                              "transformer_path",
                                              "single_file_path",
                                              "diffusers_path")):
    """Resolve the checkpoint path from model config and load it.
    diffusers_path loads the `transformer/` subdir when present."""
    from pathlib import Path

    from .weights import (
        dequantize_comfy_fp8,
        load_safetensors_dir,
        merge_adapters_into_state_dict,
    )

    mc = pipeline.model_config
    path = None
    for key in path_keys:
        if mc.get(key):
            path = mc[key]
            if key == "diffusers_path":
                sub = Path(path) / "transformer"
                if sub.is_dir():
                    path = str(sub)
            break
    if path is None:
        raise FileNotFoundError(
            f"no checkpoint path in model config (looked for {path_keys})"
        )
    sd = load_safetensors_dir(path)
    # ComfyUI fp8/fp8_scaled checkpoints dequantize before any key mapping
    # or LoRA merging (reference models/base.py:528-581)
    sd = dequantize_comfy_fp8(sd)
    sd = merge_adapters_into_state_dict(sd, mc.get("merge_adapters"))
    km = pipeline.keymap() if hasattr(pipeline, "keymap") else None
    if km is not None and km.passthrough_patterns:
        sd = strip_known_prefixes(sd, km)
        sd, keep = split_passthrough(sd, km)
        pipeline._passthrough_sd = keep
    return sd


def _maybe_subtree(tree, path: str):
    node = tree
    for k in path.split("/"):
        if not isinstance(node, dict) or k not in node:
            return None
        node = node[k]
    return node if isinstance(node, dict) else None


def import_lora_keymap(path, km: KeyMap, config, params: dict) -> dict:
    """Warm-start adapter factors from a saved adapter dir (reference
    adapter.init_from_existing, train.py:525-526). Accepts the prefixes in
    km.strip_prefixes plus km.lora_prefix, and the lora_A/B and
    lora_down/up dialects. Returns a copy of `params` with matching
    lora_a/lora_b leaves replaced."""
    import copy

    from .weights import load_safetensors_dir

    raw = load_safetensors_dir(path)
    sd = {}
    prefixes = tuple(km.strip_prefixes) + (km.lora_prefix,)
    for k, v in raw.items():
        for p in sorted(prefixes, key=len, reverse=True):
            if k.startswith(p):
                k = k[len(p):]
                break
        k = k.replace(".lora_down.", ".lora_A.").replace(
            ".lora_up.", ".lora_B.")
        sd[k] = v

    params = copy.deepcopy(params)
    p = params["params"] if "params" in params else params
    loaded = 0
    for bg in km.blocks:
        blocks = p.get(bg.flax_key)
        if not isinstance(blocks, dict):
            continue
        n = _resolve_count(bg.num_layers_attr, config)
        for ours, theirs in bg.linears.items():
            leaf = _maybe_subtree(blocks, ours)
            if leaf is None or "lora_a" not in leaf:
                continue
            a_stack, b_stack = [], []
            complete = True
            for i in range(n):
                ka = f"{bg.prefix}.{bg.offset + i}.{theirs}.lora_A.weight"
                kb = f"{bg.prefix}.{bg.offset + i}.{theirs}.lora_B.weight"
                if ka not in sd or kb not in sd:
                    complete = False
                    break
                a_stack.append(np.asarray(sd[ka], np.float32).T)  # [I, r]
                b_stack.append(np.asarray(sd[kb], np.float32).T)  # [r, O]
            if not complete:
                continue
            leaf["lora_a"] = np.stack(a_stack).astype(
                np.asarray(leaf["lora_a"]).dtype)
            leaf["lora_b"] = np.stack(b_stack).astype(
                np.asarray(leaf["lora_b"]).dtype)
            loaded += n
    print(f"init_from_existing: loaded {loaded} LoRA pairs from {path}")
    if loaded == 0:
        raise RuntimeError(
            f"no LoRA pairs in {path} matched this model's keymap"
        )
    return params
