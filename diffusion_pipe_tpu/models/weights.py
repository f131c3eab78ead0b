"""Weight-file utilities: safetensors loading, dtype casting, key mapping."""

from __future__ import annotations

import glob
import os
from pathlib import Path
from typing import Dict, Optional

import numpy as np


def load_safetensors_dir(path) -> Dict[str, np.ndarray]:
    """Load all *.safetensors in a file-or-directory path into one dict of
    numpy arrays (framework-independent; bf16 preserved via ml_dtypes)."""
    from safetensors import safe_open

    path = str(path)
    files = [path] if os.path.isfile(path) else sorted(
        glob.glob(os.path.join(path, "*.safetensors"))
    )
    if not files:
        raise FileNotFoundError(f"no safetensors found at {path}")
    out = {}
    for f in files:
        fp8_keys = []
        with safe_open(f, framework="np") as sf:
            for k in sf.keys():
                try:
                    out[k] = sf.get_tensor(k)
                except (AttributeError, TypeError):
                    # this safetensors/numpy combo cannot decode fp8;
                    # collect and decode those via torch below
                    fp8_keys.append(k)
        if fp8_keys:
            import ml_dtypes
            import torch

            fp8_map = {torch.float8_e4m3fn: ml_dtypes.float8_e4m3fn,
                       torch.float8_e5m2: ml_dtypes.float8_e5m2}
            with safe_open(f, framework="pt") as sf:
                for k in fp8_keys:
                    t = sf.get_tensor(k)
                    out[k] = (t.view(torch.uint8).numpy()
                              .view(fp8_map[t.dtype]))
    return out


def dequantize_comfy_fp8(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Dequantize ComfyUI fp8 checkpoints at load.

    The reference trains directly from fp8_scaled ComfyUI files (its
    example configs name e.g. ideogram4_fp8_scaled.safetensors;
    ComfyPipeline dequantizes QuantizedTensor weights at load,
    models/base.py:528-581). Layout: a marker tensor named `scaled_fp8`
    (possibly prefixed) whose dtype names the fp8 flavor, fp8-stored
    `X.weight` tensors with per-tensor `X.scale_weight` factors, and
    optional `X.scale_input` activation scales (inference-only).
    Dequant: w = float32(w) * scale_weight, emitted as bf16. Plain-fp8
    tensors without a scale upcast unchanged. No-op for checkpoints with
    no fp8 tensors."""
    import ml_dtypes

    fp8_dtypes = (np.dtype(ml_dtypes.float8_e4m3fn),
                  np.dtype(ml_dtypes.float8_e5m2))
    if not any(v.dtype in fp8_dtypes for v in sd.values()):
        return sd
    out = {}
    for k, v in sd.items():
        base = k.rsplit(".", 1)[0] if "." in k else k
        if (k.endswith("scaled_fp8") or k.endswith(".scale_weight")
                or k.endswith(".scale_input")):
            continue
        if v.dtype in fp8_dtypes:
            w = v.astype(np.float32)
            scale = sd.get(f"{base}.scale_weight")
            if scale is not None and k.endswith(".weight"):
                w = w * np.asarray(scale, np.float32).reshape(
                    (-1,) + (1,) * (w.ndim - 1))
            out[k] = w.astype(ml_dtypes.bfloat16)
        else:
            out[k] = v
    return out


def load_state_dict_any(path) -> Dict[str, np.ndarray]:
    """Load a checkpoint that may be safetensors OR a torch pickle
    (.pt/.pth/.bin/.ckpt). The reference's `load_state_dict`
    (utils/common.py) accepts both for paths like `llm_adapter_path`
    (models/cosmos_predict2.py:274-280); mirror that here so configs valid
    in the reference don't silently fall back to random init."""
    p = str(path)
    if os.path.isfile(p) and p.endswith((".pt", ".pth", ".bin", ".ckpt")):
        import torch

        sd = torch.load(p, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and isinstance(sd.get("state_dict"), dict):
            sd = sd["state_dict"]

        def to_np(v):
            if v.dtype == torch.bfloat16:
                import ml_dtypes

                return v.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
            return v.numpy()

        return {k: to_np(v) for k, v in sd.items()
                if isinstance(v, torch.Tensor)}
    return load_safetensors_dir(p)


def merge_adapters_into_state_dict(
    sd: Dict[str, np.ndarray], adapter_paths
) -> Dict[str, np.ndarray]:
    """Fuse pre-trained LoRA files into a raw (torch-layout) state dict
    before conversion: W += (alpha/r) * up @ down.

    Reference `model.merge_adapters = [path, ...]` (models/base.py:562-581
    ComfyPipeline merge + models/ltx2.py:248) — used e.g. to fold the
    Z-Image turbo training adapter into the base weights. Accepts the
    ComfyUI (`lora_A`/`lora_B` or `lora_down`/`lora_up`) and kohya
    (`.alpha` scalar) dialects; keys are matched against the base dict with
    the common `diffusion_model.`/`transformer.`/`lora_unet_` prefixes
    stripped.
    """
    if not adapter_paths:
        return sd
    sd = dict(sd)
    # kohya dialect writes module paths with '_' separators under a
    # lora_unet_/lora_te*_ prefix; resolve them against an underscorized
    # view of the base keys (minus '.weight').
    und_index = {}
    for k in sd:
        if k.endswith(".weight"):
            und_index[k[: -len(".weight")].replace(".", "_")] = k
    _KOHYA_PREFIXES = ("lora_unet_", "lora_te1_", "lora_te2_", "lora_te_")
    for path in adapter_paths:
        lora = load_safetensors_dir(path)
        down_keys = [
            k for k in lora
            if ".lora_down." in k or ".lora_A." in k
            or k.endswith("lora_down.weight") or k.endswith("lora_A.weight")
        ]
        merged = 0
        skipped = 0
        for dk in down_keys:
            uk = (dk.replace("lora_down", "lora_up")
                    .replace("lora_A", "lora_B"))
            if uk not in lora:
                continue
            stem = dk
            for tok in (".lora_down.weight", ".lora_A.weight",
                        ".lora_down", ".lora_A"):
                if tok in stem:
                    stem = stem.split(tok)[0]
                    break
            alpha_key = stem + ".alpha"
            down = np.asarray(lora[dk], np.float32)
            up = np.asarray(lora[uk], np.float32)
            rank = down.shape[0]
            scale = (
                float(np.asarray(lora[alpha_key])) / rank
                if alpha_key in lora else 1.0
            )
            # locate the base weight: try the stem as-is, then with common
            # wrapper prefixes stripped/added
            candidates = [
                stem + ".weight", stem,
                stem.replace("diffusion_model.", "") + ".weight",
                stem.replace("transformer.", "") + ".weight",
                "model.diffusion_model." + stem + ".weight",
            ]
            target = next((c for c in candidates if c in sd), None)
            if target is None and any(
                stem.startswith(p) for p in _KOHYA_PREFIXES
            ):
                for p in _KOHYA_PREFIXES:
                    if stem.startswith(p):
                        target = und_index.get(stem[len(p):])
                        break
            if target is None:
                skipped += 1
                continue
            w = np.asarray(sd[target], np.float32)
            delta = (up.reshape(up.shape[0], -1)
                     @ down.reshape(down.shape[0], -1)) * scale
            sd[target] = (w + delta.reshape(w.shape)).astype(sd[target].dtype)
            merged += 1
        print(f"merge_adapters: fused {merged} LoRA pairs from {path}")
        if skipped:
            print(
                f"WARNING: merge_adapters: {skipped} LoRA pairs in {path} "
                "matched no base weight and were skipped"
            )
        if merged == 0:
            raise ValueError(
                f"merge_adapters: no LoRA pair in {path} matched any base "
                "weight — wrong model or unsupported key dialect"
            )
    return sd


def linear(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """torch nn.Linear -> flax Dense params ({weight [O,I]} -> kernel [I,O])."""
    entry = {"kernel": np.ascontiguousarray(np.asarray(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        entry["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return entry


def norm_scale(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": np.asarray(sd[f"{prefix}.weight"])}


def stack_layers(per_layer: list) -> Dict:
    """List of identical param trees -> one tree with leading layer axis."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *per_layer)


def cast_tree(tree, dtype):
    import jax

    return jax.tree.map(lambda x: np.asarray(x).astype(dtype), tree)
