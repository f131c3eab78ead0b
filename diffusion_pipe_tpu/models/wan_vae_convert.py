"""Wan 2.1 VAE checkpoint -> flax params conversion.

Maps the reference checkpoint layout (vae2_1.py module tree: encoder with
nn.Sequential `downsamples`/`middle`/`head`, quant convs `conv1`/`conv2`,
decoder with `upsamples`) onto our named modules by replaying the same
construction loops. Accepts raw torch .pth or safetensors; ComfyUI-style
key prefixes are stripped.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .wan_vae import WanVAEConfig, WanVideoVAE


def _conv3d(sd, key):
    w = np.asarray(sd[f"{key}.weight"])  # [O, I, kt, kh, kw]
    out = {"conv": {"kernel": np.transpose(w, (2, 3, 4, 1, 0)),
                    "bias": np.asarray(sd[f"{key}.bias"])}}
    return out


def _conv2d(sd, key):
    w = np.asarray(sd[f"{key}.weight"])  # [O, I, kh, kw]
    return {"conv": {"kernel": np.transpose(w, (2, 3, 1, 0)),
                     "bias": np.asarray(sd[f"{key}.bias"])}}


def _rms(sd, key):
    return {"gamma": np.asarray(sd[f"{key}.gamma"]).reshape(-1)}


def _res_block(sd, prefix):
    out = {
        "norm1": _rms(sd, f"{prefix}.residual.0"),
        "conv1": _conv3d(sd, f"{prefix}.residual.2"),
        "norm2": _rms(sd, f"{prefix}.residual.3"),
        "conv2": _conv3d(sd, f"{prefix}.residual.6"),
    }
    if f"{prefix}.shortcut.weight" in sd:
        out["shortcut"] = _conv3d(sd, f"{prefix}.shortcut")
    return out


def _attn_block(sd, prefix):
    qkv_w = np.asarray(sd[f"{prefix}.to_qkv.weight"])[..., 0, 0]  # [3C, C]
    proj_w = np.asarray(sd[f"{prefix}.proj.weight"])[..., 0, 0]
    return {
        "norm": _rms(sd, f"{prefix}.norm"),
        "to_qkv": {"kernel": np.ascontiguousarray(qkv_w.T),
                   "bias": np.asarray(sd[f"{prefix}.to_qkv.bias"])},
        "proj": {"kernel": np.ascontiguousarray(proj_w.T),
                 "bias": np.asarray(sd[f"{prefix}.proj.bias"])},
    }


def convert_wan_vae(sd: Dict[str, np.ndarray], cfg: WanVAEConfig):
    sd = {
        k.removeprefix("vae.").removeprefix("model."): v for k, v in sd.items()
    }
    n_stages = len(cfg.dim_mult)

    # --- encoder: replay the Sequential index layout (vae2_1.py:285-303)
    enc = {"conv1": _conv3d(sd, "encoder.conv1")}
    seq = 0   # index in encoder.downsamples
    li = 0    # our running block index
    scale = 1.0
    for i in range(n_stages):
        for _ in range(cfg.num_res_blocks):
            enc[f"down_{li}"] = _res_block(sd, f"encoder.downsamples.{seq}")
            seq += 1
            li += 1
            if scale in cfg.attn_scales:
                enc[f"down_{li}"] = _attn_block(
                    sd, f"encoder.downsamples.{seq}"
                )
                seq += 1
                li += 1
        if i != n_stages - 1:
            base = f"encoder.downsamples.{seq}"
            enc[f"down_{li}_s"] = _conv2d(sd, f"{base}.resample.1")
            if cfg.temperal_downsample[i]:
                w = np.asarray(sd[f"{base}.time_conv.weight"])
                enc[f"down_{li}_t"] = {
                    "time_conv": {
                        "kernel": np.transpose(w, (2, 3, 4, 1, 0)),
                        "bias": np.asarray(sd[f"{base}.time_conv.bias"]),
                    }
                }
            seq += 1
            li += 1
            scale /= 2.0
    enc["mid_res_0"] = _res_block(sd, "encoder.middle.0")
    enc["mid_attn"] = _attn_block(sd, "encoder.middle.1")
    enc["mid_res_1"] = _res_block(sd, "encoder.middle.2")
    enc["head_norm"] = _rms(sd, "encoder.head.0")
    enc["head_conv"] = _conv3d(sd, "encoder.head.2")

    # --- decoder (vae2_1.py:395-420)
    dec = {"conv1": _conv3d(sd, "decoder.conv1")}
    dec["mid_res_0"] = _res_block(sd, "decoder.middle.0")
    dec["mid_attn"] = _attn_block(sd, "decoder.middle.1")
    dec["mid_res_1"] = _res_block(sd, "decoder.middle.2")
    temperal_upsample = tuple(reversed(cfg.temperal_downsample))
    seq = 0
    li = 0
    for i in range(n_stages):
        for _ in range(cfg.num_res_blocks + 1):
            dec[f"up_{li}"] = _res_block(sd, f"decoder.upsamples.{seq}")
            seq += 1
            li += 1
        if i != n_stages - 1:
            base = f"decoder.upsamples.{seq}"
            if temperal_upsample[i]:
                w = np.asarray(sd[f"{base}.time_conv.weight"])
                dec[f"up_{li}_t"] = {
                    "time_conv": {
                        "kernel": np.transpose(w, (2, 3, 4, 1, 0)),
                        "bias": np.asarray(sd[f"{base}.time_conv.bias"]),
                    }
                }
            dec[f"up_{li}_s"] = _conv2d(sd, f"{base}.resample.1")
            seq += 1
            li += 1
    dec["head_norm"] = _rms(sd, "decoder.head.0")
    dec["head_conv"] = _conv3d(sd, "decoder.head.2")

    params = {
        "encoder": enc,
        "decoder": dec,
        "conv1_quant": _conv3d(sd, "conv1"),
        "post_quant_conv": _conv3d(sd, "conv2"),
    }
    return {"params": params}


def load_wan_vae(path):
    """Load + convert a Wan2.1 VAE checkpoint (.pth or .safetensors)."""
    cfg = WanVAEConfig.wan21()
    if str(path).endswith((".pth", ".pt", ".bin")):
        import torch

        sd = {k: v.float().numpy()
              for k, v in torch.load(path, map_location="cpu").items()}
    else:
        from .weights import load_safetensors_dir

        sd = load_safetensors_dir(path)
    vae = WanVideoVAE(cfg)
    converted = convert_wan_vae(sd, cfg)
    # structural validation against a fresh init (catches key-layout drift)
    import jax
    import jax.numpy as jnp

    ref = jax.eval_shape(
        lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 1, 64, 64)))
    )
    ref_paths = {jax.tree_util.keystr(k) for k, _ in
                 jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_paths = {jax.tree_util.keystr(k) for k, _ in
                 jax.tree_util.tree_flatten_with_path(converted)[0]}
    missing = ref_paths - got_paths
    extra = got_paths - ref_paths
    if missing or extra:
        raise ValueError(
            f"wan vae conversion mismatch; missing={sorted(missing)[:5]} "
            f"extra={sorted(extra)[:5]}"
        )
    return vae, converted
