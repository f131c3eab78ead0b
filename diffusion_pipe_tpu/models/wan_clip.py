"""Wan i2v CLIP-vision tower (XLM-Roberta-CLIP ViT-H/14 visual) in Flax.

Re-implements the visual path of the reference's vendored CLIP
(models/wan/clip.py): ViT-H/14 (224px, patch 14 -> 256 patches + cls = 257
tokens, dim 1280, 16 heads, gelu, pre-norm), run through the FIRST 31 of 32
blocks (`use_31_block=True`, clip.py:533-535) with no post-norm/head — the
raw 257x1280 tokens feed WanModel's img_emb MLPProj. Preprocessing matches
CLIPModel.visual (clip.py:521-535): bicubic resize of the first frame to
224, [-1,1] -> [0,1], CLIP mean/std normalize.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class WanClipVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    mlp_ratio: float = 4.0
    num_heads: int = 16
    num_layers: int = 32          # forward runs num_layers - 1 (31)
    dtype: Any = jnp.float32

    @staticmethod
    def tiny():
        return WanClipVisionConfig(image_size=28, patch_size=14, dim=32,
                                   num_heads=4, num_layers=2)


class _ViTBlock(nn.Module):
    config: WanClipVisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        heads, hd = cfg.num_heads, cfg.dim // cfg.num_heads
        b, s, c = x.shape
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        qkv = nn.Dense(3 * cfg.dim, dtype=cfg.dtype, name="to_qkv")(y)
        q, k, v = [u.reshape(b, s, heads, hd) for u in jnp.split(qkv, 3, -1)]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        attn = jax.nn.softmax(logits, -1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, s, c)
        x = x + nn.Dense(cfg.dim, dtype=cfg.dtype, name="proj")(o)
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(cfg.dim * cfg.mlp_ratio), dtype=cfg.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        x = x + nn.Dense(cfg.dim, dtype=cfg.dtype, name="mlp_fc2")(y)
        return x


class WanClipVision(nn.Module):
    config: WanClipVisionConfig

    @nn.compact
    def __call__(self, pixels):
        """pixels: [B, 3, H, W] in [-1, 1] -> tokens [B, 1+P^2, dim]."""
        cfg = self.config
        b = pixels.shape[0]
        x = jnp.transpose(pixels, (0, 2, 3, 1)).astype(jnp.float32)
        size = (b, cfg.image_size, cfg.image_size, 3)
        x = jax.image.resize(x, size, method="bicubic")
        x = (x * 0.5 + 0.5 - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)

        x = nn.Conv(cfg.dim, (cfg.patch_size,) * 2, strides=cfg.patch_size,
                    padding="VALID", use_bias=False, dtype=cfg.dtype,
                    name="patch_embedding")(x.astype(cfg.dtype))
        n = (cfg.image_size // cfg.patch_size) ** 2
        x = x.reshape(b, n, cfg.dim)
        gain = 1.0 / np.sqrt(cfg.dim)
        cls = self.param("cls_embedding",
                         nn.initializers.normal(gain), (1, 1, cfg.dim))
        pos = self.param("pos_embedding",
                         nn.initializers.normal(gain), (1, n + 1, cfg.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.dim)), x], 1)
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, name="pre_norm")(x)
        for i in range(cfg.num_layers - 1):  # use_31_block
            x = _ViTBlock(cfg, name=f"block_{i}")(x)
        return x


def convert_wan_clip_visual(sd, cfg: WanClipVisionConfig):
    """Wan CLIP checkpoint (visual.* keys, torch) -> flax params."""
    def lin(key):
        out = {"kernel": np.ascontiguousarray(np.asarray(sd[f"{key}.weight"]).T)}
        if f"{key}.bias" in sd:
            out["bias"] = np.asarray(sd[f"{key}.bias"])
        return out

    def ln(key):
        return {"scale": np.asarray(sd[f"{key}.weight"]),
                "bias": np.asarray(sd[f"{key}.bias"])}

    conv_w = np.asarray(sd["visual.patch_embedding.weight"])  # [O, 3, k, k]
    params = {
        "patch_embedding": {"kernel": np.transpose(conv_w, (2, 3, 1, 0))},
        "cls_embedding": np.asarray(sd["visual.cls_embedding"]),
        "pos_embedding": np.asarray(sd["visual.pos_embedding"]),
        "pre_norm": ln("visual.pre_norm"),
    }
    for i in range(cfg.num_layers - 1):
        p = f"visual.transformer.{i}"
        params[f"block_{i}"] = {
            "norm1": ln(f"{p}.norm1"),
            "to_qkv": lin(f"{p}.attn.to_qkv"),
            "proj": lin(f"{p}.attn.proj"),
            "norm2": ln(f"{p}.norm2"),
            "mlp_fc1": lin(f"{p}.mlp.0"),
            "mlp_fc2": lin(f"{p}.mlp.2"),
        }
    return {"params": params}
