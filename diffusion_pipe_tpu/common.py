"""Shared small utilities: dtype mapping, timing, math helpers.

TPU-native analogue of reference utils/common.py (DTYPE_MAP at
utils/common.py:14-21, lin/time-shift helpers at 110-122, t-distribution
utilities at 124-160 — the latter live in training/flow.py here since they
are part of the objective, not generic utils).
"""

from __future__ import annotations

import contextlib
import time

import jax.numpy as jnp
import ml_dtypes  # noqa: F401  (jnp exposes float8 via ml_dtypes)

# String -> jnp dtype. Reference: utils/common.py:14-21 (torch dtypes).
DTYPE_MAP = {
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "float16": jnp.float16,
    "fp16": jnp.float16,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float8": jnp.float8_e4m3fn,
    "float8_e4m3fn": jnp.float8_e4m3fn,
    "float8_e5m2": jnp.float8_e5m2,
}

VIDEO_EXTENSIONS = {
    ".mp4", ".avi", ".mov", ".mkv", ".webm", ".m4v", ".wmv", ".flv",
    ".mpg", ".mpeg", ".gif",
}
IMAGE_EXTENSIONS = {".png", ".jpg", ".jpeg", ".webp", ".bmp", ".tiff", ".tif"}


def dtype_from_string(name):
    """Map a config dtype string to a jnp dtype (passthrough if already a dtype)."""
    if isinstance(name, str):
        return DTYPE_MAP[name]
    return name


def round_to_nearest_multiple(x: int, multiple: int) -> int:
    return int(round(x / multiple) * multiple)


def round_down_to_multiple(x: int, multiple: int) -> int:
    return (int(x) // multiple) * multiple


def round_up_to_multiple(x: int, multiple: int) -> int:
    return -(-int(x) // multiple) * multiple


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def get_lin_function(x1: float = 256, y1: float = 0.5, x2: float = 4096,
                     y2: float = 1.15):
    """Linear interpolation helper used by flux resolution-dependent time shift.

    Reference: utils/common.py:110-118 (same math; used by models/flux.py:362-364).
    """
    m = (y2 - y1) / (x2 - x1)
    b = y1 - m * x1
    return lambda x: m * x + b


def time_shift(mu: float, sigma: float, t):
    """Flux-style timestep shift. Reference: utils/common.py:120-122."""
    e_mu = jnp.exp(mu)
    return e_mu / (e_mu + (1 / t - 1) ** sigma)


@contextlib.contextmanager
def log_duration(name: str, enabled: bool = True):
    """Print-based duration logging (reference utils/common.py:59-65)."""
    start = time.time()
    try:
        yield
    finally:
        if enabled:
            print(f"{name}: {time.time() - start:.3f}s")


def first_not_none(*vals):
    for v in vals:
        if v is not None:
            return v
    return None
