"""Qwen2.5-VL vision tower (ViT) in Flax, for edit-mode image conditioning.

The reference's qwen_image_edit feeds the control image through the
Qwen2.5-VL processor + vision tower so the VLM conditions on it
(reference models/qwen_image.py:353-374). This is the transformers
Qwen2_5_VisionTransformerPretrainedModel forward re-expressed with STATIC
shapes (fixed grid per bucket):

  - 3D conv patch embed (temporal 2 x spatial 14x14, no bias)
  - 2D rotary embedding with spatial-merge-blocked position ids
  - window attention: tokens reordered so each window is contiguous
    (merge-unit granularity, computed in numpy at trace time), block-
    diagonal masks from cu_seqlens; designated full-attention layers
  - RMSNorm + SwiGLU MLP blocks, qkv with bias
  - 2x2 patch merger (RMSNorm -> MLP) to out_hidden_size

Parity-tested against the torch implementation (tests/test_vision_tower.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


@dataclasses.dataclass(frozen=True)
class QwenVLVisionConfig:
    depth: int = 32
    hidden_size: int = 1280
    intermediate_size: int = 3420
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112
    out_hidden_size: int = 3584
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    rms_eps: float = 1e-6
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @staticmethod
    def from_hf_config(cfg: dict, dtype=jnp.float32) -> "QwenVLVisionConfig":
        v = cfg.get("vision_config", cfg)
        return QwenVLVisionConfig(
            depth=v["depth"], hidden_size=v["hidden_size"],
            intermediate_size=v["intermediate_size"],
            num_heads=v["num_heads"],
            patch_size=v.get("patch_size", 14),
            temporal_patch_size=v.get("temporal_patch_size", 2),
            spatial_merge_size=v.get("spatial_merge_size", 2),
            window_size=v.get("window_size", 112),
            out_hidden_size=v.get("out_hidden_size", 3584),
            fullatt_block_indexes=tuple(
                v.get("fullatt_block_indexes", (7, 15, 23, 31))),
            dtype=dtype, param_dtype=dtype,
        )


def rot_pos_ids(grid_thw, merge: int) -> np.ndarray:
    """Per-token (h, w) position ids with spatial-merge-blocked ordering
    (transformers Qwen2_5 rot_pos_emb)."""
    out = []
    for t, h, w in grid_thw:
        hp = np.tile(np.arange(h)[:, None], (1, w))
        hp = hp.reshape(h // merge, merge, w // merge, merge)
        hp = hp.transpose(0, 2, 1, 3).reshape(-1)
        wp = np.tile(np.arange(w)[None, :], (h, 1))
        wp = wp.reshape(h // merge, merge, w // merge, merge)
        wp = wp.transpose(0, 2, 1, 3).reshape(-1)
        ids = np.stack([hp, wp], axis=-1)
        out.append(np.tile(ids, (t, 1)))
    return np.concatenate(out, axis=0)


def window_index(grid_thw, window_size: int, merge: int, patch: int):
    """(window_index [n_merged], cu_window_seqlens) — transformers
    get_window_index, numpy/static."""
    idx_list = []
    cu = [0]
    base = 0
    vit_win = window_size // merge // patch
    unit = merge * merge
    for t, h, w in grid_thw:
        lh, lw = h // merge, w // merge
        index = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h = (-lh) % vit_win
        pad_w = (-lw) % vit_win
        nwh = (lh + pad_h) // vit_win
        nww = (lw + pad_w) // vit_win
        padded = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
        padded[:, :lh, :lw] = index
        padded = padded.reshape(t, nwh, vit_win, nww, vit_win)
        padded = padded.transpose(0, 1, 3, 2, 4).reshape(
            t, nwh * nww, vit_win, vit_win)
        seqlens = (padded != -100).sum((2, 3)).reshape(-1) * unit
        flat = padded.reshape(-1)
        flat = flat[flat != -100]
        idx_list.append(flat + base)
        cu.extend((np.cumsum(seqlens) + cu[-1]).tolist())
        base += t * lh * lw
    cu = [c for i, c in enumerate(cu) if i == 0 or c != cu[i - 1]]
    return np.concatenate(idx_list), np.asarray(cu, np.int64)


def _block_diag_mask(cu: np.ndarray, seq: int) -> np.ndarray:
    """[seq, seq] bool, True = attend (same cu segment)."""
    seg = np.zeros((seq,), np.int64)
    for i in range(len(cu) - 1):
        seg[cu[i]:cu[i + 1]] = i
    return seg[:, None] == seg[None, :]


class QwenVLVisionBlock(nn.Module):
    config: QwenVLVisionConfig

    @nn.compact
    def __call__(self, x, cos, sin, mask):
        cfg = self.config
        H, D = cfg.num_heads, cfg.head_dim
        s = x.shape[0]
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)

        def rms(name, y):
            scale = self.param(name, nn.initializers.ones_init(),
                               (y.shape[-1],), cfg.param_dtype)
            yf = y.astype(jnp.float32)
            yf = yf * jax.lax.rsqrt(
                jnp.mean(yf * yf, -1, keepdims=True) + cfg.rms_eps)
            return (yf * scale).astype(y.dtype)

        h = rms("norm1", x)
        qkv = nn.Dense(3 * H * D, use_bias=True, name="qkv", **dd)(h)
        q, k, v = [u.reshape(s, H, D) for u in jnp.split(qkv, 3, -1)]

        def rope(y):
            c = cos[:, None, :].astype(jnp.float32)
            sn = sin[:, None, :].astype(jnp.float32)
            yf = y.astype(jnp.float32)
            half = D // 2
            y1, y2 = yf[..., :half], yf[..., half:]
            rot = jnp.concatenate([-y2, y1], -1)
            return (yf * c + rot * sn).astype(y.dtype)

        q, k = rope(q), rope(k)
        logits = jnp.einsum("qhd,khd->hqk", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(D)
        logits = jnp.where(mask[None], logits, jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(logits, -1).astype(v.dtype)
        o = jnp.einsum("hqk,khd->qhd", attn, v).reshape(s, H * D)
        x = x + nn.Dense(cfg.hidden_size, use_bias=True, name="proj", **dd)(o)

        h = rms("norm2", x)
        gate = nn.Dense(cfg.intermediate_size, use_bias=True,
                        name="mlp_gate", **dd)(h)
        up = nn.Dense(cfg.intermediate_size, use_bias=True,
                      name="mlp_up", **dd)(h)
        down = nn.Dense(cfg.hidden_size, use_bias=True,
                        name="mlp_down", **dd)(nn.silu(gate) * up)
        return x + down


class QwenVLVisionTower(nn.Module):
    """pixels: [seq, C*tp*ps*ps] flattened patches; grid_thw static tuple of
    (t, h, w). Returns [n_merged_tokens, out_hidden_size]."""

    config: QwenVLVisionConfig
    grid_thw: Tuple[Tuple[int, int, int], ...]

    @nn.compact
    def __call__(self, pixels):
        cfg = self.config
        grid = self.grid_thw
        merge = cfg.spatial_merge_size
        unit = merge * merge
        seq = pixels.shape[0]
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)

        # patch embed: conv3d == one dense over the flattened patch
        x = pixels.reshape(
            seq, cfg.in_channels * cfg.temporal_patch_size
            * cfg.patch_size * cfg.patch_size
        ).astype(cfg.dtype)
        x = nn.Dense(cfg.hidden_size, use_bias=False, name="patch_embed",
                     **dd)(x)

        # rotary tables (head_dim/2 split over h and w axes)
        pos = rot_pos_ids(grid, merge)  # [seq, 2]
        half = cfg.head_dim // 2
        inv = 1.0 / (10000.0 ** (np.arange(0, half, 2, np.float32) / half))
        freqs = np.concatenate(
            [pos[:, 0:1] * inv[None], pos[:, 1:2] * inv[None]], axis=-1
        )  # [seq, half]
        emb = np.concatenate([freqs, freqs], axis=-1)  # [seq, head_dim]
        cos_t, sin_t = np.cos(emb), np.sin(emb)

        # window reordering (merge-unit granularity)
        widx, cu_win = window_index(
            grid, cfg.window_size, merge, cfg.patch_size)
        order = (widx[:, None] * unit + np.arange(unit)[None]).reshape(-1)
        rev = np.argsort(order)
        cu_full = np.concatenate(
            [[0], np.cumsum([t * h * w for t, h, w in grid])])
        mask_full = jnp.asarray(_block_diag_mask(cu_full, seq))
        mask_win = jnp.asarray(_block_diag_mask(cu_win, seq))

        x = x[order]
        cos = jnp.asarray(cos_t[order])
        sin = jnp.asarray(sin_t[order])

        for i in range(cfg.depth):
            full = i in cfg.fullatt_block_indexes
            x = QwenVLVisionBlock(cfg, name=f"block_{i}")(
                x, cos, sin, mask_full if full else mask_win
            )

        # merger: RMSNorm -> group 2x2 -> MLP
        scale = self.param("merger_ln_q", nn.initializers.ones_init(),
                           (cfg.hidden_size,), cfg.param_dtype)
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(
            jnp.mean(xf * xf, -1, keepdims=True) + cfg.rms_eps)
        x = (xf * scale).astype(cfg.dtype)
        x = x.reshape(seq // unit, unit * cfg.hidden_size)
        x = nn.Dense(unit * cfg.hidden_size, use_bias=True,
                     name="merger_fc1", **dd)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(cfg.out_hidden_size, use_bias=True,
                     name="merger_fc2", **dd)(x)
        # restore pre-window order (merged-token granularity)
        return x[np.argsort(widx)]


def convert_hf_qwen_vision(sd: dict, cfg: QwenVLVisionConfig,
                           prefix: str = "visual."):
    """transformers Qwen2_5 vision state dict -> flax params."""

    def g(key):
        t = sd[prefix + key]
        if hasattr(t, "detach"):
            t = t.detach().float().numpy()
        return np.asarray(t)

    def lin(key):
        d = {"kernel": np.ascontiguousarray(g(key + ".weight").T)}
        if prefix + key + ".bias" in sd:
            d["bias"] = g(key + ".bias")
        return d

    p = {
        # conv3d [out, in, t, h, w] -> dense [in*t*h*w, out]
        "patch_embed": {"kernel": np.ascontiguousarray(
            g("patch_embed.proj.weight").reshape(cfg.hidden_size, -1).T)},
        "merger_ln_q": g("merger.ln_q.weight"),
        "merger_fc1": lin("merger.mlp.0"),
        "merger_fc2": lin("merger.mlp.2"),
    }
    for i in range(cfg.depth):
        b = f"blocks.{i}."
        p[f"block_{i}"] = {
            "norm1": g(b + "norm1.weight"),
            "norm2": g(b + "norm2.weight"),
            "qkv": lin(b + "attn.qkv"),
            "proj": lin(b + "attn.proj"),
            "mlp_gate": lin(b + "mlp.gate_proj"),
            "mlp_up": lin(b + "mlp.up_proj"),
            "mlp_down": lin(b + "mlp.down_proj"),
        }
    return {"params": p}


def qwen_vl_rope_index(ids: np.ndarray, image_token_id: int,
                       grid_thw, merge: int) -> np.ndarray:
    """Multimodal (t, h, w) position ids for ONE image in the sequence
    (transformers Qwen2_5 get_rope_index, single-image static case).
    ids: [S] numpy token ids. Returns [3, S]."""
    s = ids.shape[0]
    pos = np.zeros((3, s), np.int64)
    img_positions = np.nonzero(ids == image_token_id)[0]
    if img_positions.size == 0:
        pos[:] = np.arange(s)
        return pos
    t, h, w = grid_thw
    lh, lw = h // merge, w // merge
    st = int(img_positions[0])
    # text before the image: sequential
    pos[:, :st] = np.arange(st)
    # image block: t constant at st, h rows, w cols offset by st
    ti = np.repeat(np.arange(t), lh * lw)
    hi = np.tile(np.repeat(np.arange(lh), lw), t)
    wi = np.tile(np.arange(lw), t * lh)
    n_img = t * lh * lw
    pos[0, st:st + n_img] = st + ti
    pos[1, st:st + n_img] = st + hi
    pos[2, st:st + n_img] = st + wi
    # text after: resumes at max + 1
    nxt = st + max(t, lh, lw)
    rest = s - (st + n_img)
    pos[:, st + n_img:] = nxt + np.arange(rest)
    return pos


def image_to_qwen_patches(img: np.ndarray, patch: int = 14,
                          temporal_patch: int = 2,
                          merge: int = 2) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """RGB image [C, H, W] in [-1, 1] -> (flattened patches
    [gh*gw, C*tp*ps*ps], grid (1, gh, gw)) with the transformers
    Qwen2VL patch flatten order and CLIP normalization. H, W must be
    multiples of patch*merge."""
    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
    x = (img.astype(np.float32) + 1.0) / 2.0
    x = (x - mean[:, None, None]) / std[:, None, None]
    c, hh, ww = x.shape
    gh, gw = hh // patch, ww // patch
    frames = np.tile(x[None], (temporal_patch, 1, 1, 1))  # [tp, C, H, W]
    p = frames.reshape(
        1, temporal_patch, c, gh // merge, merge, patch,
        gw // merge, merge, patch,
    )
    p = p.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    flat = p.reshape(gh * gw, c * temporal_patch * patch * patch)
    return flat, (1, gh, gw)
