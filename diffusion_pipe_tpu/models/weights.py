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
        with safe_open(f, framework="np") as sf:
            for k in sf.keys():
                out[k] = sf.get_tensor(k)
    return out


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
