"""SDXL UNet weight conversion: diffusers UNet2DConditionModel -> our flax.

Covers the diffusers-folder path (the reference additionally converts
original SD-format single files via its key maps, models/sdxl.py:24-276;
those load after diffusers' own remapping, which this targets). Kohya-format
LoRA export for the trained adapter lives here too (reference
sdxl.py:465-474 saves kohya naming).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .sdxl_unet import SDXLConfig
from .weights import linear


def _conv(sd, key):
    w = np.asarray(sd[f"{key}.weight"])  # [O, I, kh, kw]
    return {"kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": np.asarray(sd[f"{key}.bias"])}


def _norm(sd, key):
    return {"scale": np.asarray(sd[f"{key}.weight"]),
            "bias": np.asarray(sd[f"{key}.bias"])}


def _resnet(sd, p):
    out = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "time_emb_proj": linear(sd, f"{p}.time_emb_proj"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _basic_block(sd, p):
    out = {}
    for i, norm in enumerate(["norm1", "norm2", "norm3"], start=1):
        out[norm] = _norm(sd, f"{p}.norm{i}")
    for attn in ["attn1", "attn2"]:
        for proj in ["to_q", "to_k", "to_v"]:
            out[f"{attn}_{proj}"] = linear(sd, f"{p}.{attn}.{proj}")
        out[f"{attn}_to_out"] = linear(sd, f"{p}.{attn}.to_out.0")
    out["ff_proj"] = linear(sd, f"{p}.ff.net.0.proj")
    out["ff_out"] = linear(sd, f"{p}.ff.net.2")
    return out


def _transformer(sd, p, depth):
    out = {
        "norm": _norm(sd, f"{p}.norm"),
        "proj_in": linear(sd, f"{p}.proj_in"),
        "proj_out": linear(sd, f"{p}.proj_out"),
    }
    for i in range(depth):
        out[f"block_{i}"] = _basic_block(sd, f"{p}.transformer_blocks.{i}")
    return out


def convert_diffusers_sdxl_unet(sd: Dict[str, np.ndarray], cfg: SDXLConfig):
    p: Dict[str, dict] = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding_1": linear(sd, "time_embedding.linear_1"),
        "time_embedding_2": linear(sd, "time_embedding.linear_2"),
        "add_embedding_1": linear(sd, "add_embedding.linear_1"),
        "add_embedding_2": linear(sd, "add_embedding.linear_2"),
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    n = len(cfg.block_out_channels)
    for i in range(n):
        depth = cfg.transformer_layers[i]
        for j in range(cfg.layers_per_block):
            p[f"down_{i}_res_{j}"] = _resnet(
                sd, f"down_blocks.{i}.resnets.{j}"
            )
            if depth > 0:
                p[f"down_{i}_attn_{j}"] = _transformer(
                    sd, f"down_blocks.{i}.attentions.{j}", depth
                )
        if i < n - 1:
            p[f"down_{i}_downsample"] = _conv(
                sd, f"down_blocks.{i}.downsamplers.0.conv"
            )
    p["mid_res_0"] = _resnet(sd, "mid_block.resnets.0")
    p["mid_res_1"] = _resnet(sd, "mid_block.resnets.1")
    p["mid_attn"] = _transformer(
        sd, "mid_block.attentions.0", cfg.transformer_layers[-1]
    )
    rev_depths = list(reversed(cfg.transformer_layers))
    for i in range(n):
        depth = rev_depths[i]
        for j in range(cfg.layers_per_block + 1):
            p[f"up_{i}_res_{j}"] = _resnet(sd, f"up_blocks.{i}.resnets.{j}")
            if depth > 0:
                p[f"up_{i}_attn_{j}"] = _transformer(
                    sd, f"up_blocks.{i}.attentions.{j}", depth
                )
        if i < n - 1:
            p[f"up_{i}_upsample"] = _conv(
                sd, f"up_blocks.{i}.upsamplers.0.conv"
            )
    return p


# --- kohya LoRA export ------------------------------------------------------

_KOHYA_ATTN = {
    "attn1_to_q": "attn1_to_q", "attn1_to_k": "attn1_to_k",
    "attn1_to_v": "attn1_to_v", "attn1_to_out": "attn1_to_out_0",
    "attn2_to_q": "attn2_to_q", "attn2_to_k": "attn2_to_k",
    "attn2_to_v": "attn2_to_v", "attn2_to_out": "attn2_to_out_0",
    "ff_proj": "ff_net_0_proj", "ff_out": "ff_net_2",
}


def export_sdxl_lora_kohya(trainable, cfg: SDXLConfig) -> Dict[str, np.ndarray]:
    """Our LoRA tree -> kohya sd-scripts keys:
    lora_unet_<module path with _>_lora_{down,up}.weight + alpha."""
    out: Dict[str, np.ndarray] = {}
    p = trainable["params"]["unet"]

    def emit(kohya_mod, leaf):
        if leaf is None:
            return
        if "lora_a" in leaf:
            a = np.asarray(leaf["lora_a"], np.float32)  # [in, r]
            b = np.asarray(leaf["lora_b"], np.float32)  # [r, out]
            out[f"lora_unet_{kohya_mod}.lora_down.weight"] = (
                np.ascontiguousarray(a.T))
            out[f"lora_unet_{kohya_mod}.lora_up.weight"] = (
                np.ascontiguousarray(b.T))
            out[f"lora_unet_{kohya_mod}.alpha"] = np.asarray(
                float(cfg.lora_alpha), np.float32
            )
        # LoKr factors (lycoris kohya naming, torch orientation)
        emitted_lokr = False
        for name in ("lokr_w1", "lokr_w2", "lokr_w2_a", "lokr_w2_b"):
            if name in leaf:
                w = np.asarray(leaf[name], np.float32)
                out[f"lycoris_unet_{kohya_mod}.{name}"] = (
                    np.ascontiguousarray(w.T))
                emitted_lokr = True
        if emitted_lokr:
            out[f"lycoris_unet_{kohya_mod}.alpha"] = np.asarray(
                float(cfg.lora_alpha), np.float32
            )

    def walk_transformer(our_prefix, kohya_prefix, depth):
        tree = p.get(our_prefix)
        if tree is None:
            return
        for i in range(depth):
            blk = tree.get(f"block_{i}", {})
            for ours, kohya in _KOHYA_ATTN.items():
                emit(f"{kohya_prefix}_transformer_blocks_{i}_{kohya}",
                     blk.get(ours))

    n = len(cfg.block_out_channels)
    for i in range(n):
        depth = cfg.transformer_layers[i]
        for j in range(cfg.layers_per_block):
            walk_transformer(
                f"down_{i}_attn_{j}",
                f"down_blocks_{i}_attentions_{j}", depth,
            )
    walk_transformer("mid_attn", "mid_block_attentions_0",
                     cfg.transformer_layers[-1])
    rev = list(reversed(cfg.transformer_layers))
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            walk_transformer(
                f"up_{i}_attn_{j}", f"up_blocks_{i}_attentions_{j}", rev[i]
            )
    return out


# --- original SD-format (single-file) key conversion -------------------------
# Tables mirror the reference's kohya-derived maps (models/sdxl.py:24-113).

SD_HF_TOP = [
    ("time_embed.0.weight", "time_embedding.linear_1.weight"),
    ("time_embed.0.bias", "time_embedding.linear_1.bias"),
    ("time_embed.2.weight", "time_embedding.linear_2.weight"),
    ("time_embed.2.bias", "time_embedding.linear_2.bias"),
    ("input_blocks.0.0.weight", "conv_in.weight"),
    ("input_blocks.0.0.bias", "conv_in.bias"),
    ("out.0.weight", "conv_norm_out.weight"),
    ("out.0.bias", "conv_norm_out.bias"),
    ("out.2.weight", "conv_out.weight"),
    ("out.2.bias", "conv_out.bias"),
    ("label_emb.0.0.weight", "add_embedding.linear_1.weight"),
    ("label_emb.0.0.bias", "add_embedding.linear_1.bias"),
    ("label_emb.0.2.weight", "add_embedding.linear_2.weight"),
    ("label_emb.0.2.bias", "add_embedding.linear_2.bias"),
]
SD_HF_RESNET = [
    ("in_layers.0", "norm1"),
    ("in_layers.2", "conv1"),
    ("out_layers.0", "norm2"),
    ("out_layers.3", "conv2"),
    ("emb_layers.1", "time_emb_proj"),
    ("skip_connection", "conv_shortcut"),
]


def _sd_hf_layer_map():
    """Unambiguous (sd_prefix, hf_prefix) pairs. SDXL up stages have 3
    resnets (j 0..2); the up0 upsampler shares output_blocks.2 with
    attention j=2, living at .2.conv (kohya's special case,
    reference sdxl.py:90)."""
    m = []
    for i in range(3):
        for j in range(2):
            m.append((f"input_blocks.{3*i + j + 1}.0.",
                      f"down_blocks.{i}.resnets.{j}."))
            if i > 0:
                m.append((f"input_blocks.{3*i + j + 1}.1.",
                          f"down_blocks.{i}.attentions.{j}."))
        for j in range(3):
            m.append((f"output_blocks.{3*i + j}.0.",
                      f"up_blocks.{i}.resnets.{j}."))
            if i < 2:
                m.append((f"output_blocks.{3*i + j}.1.",
                          f"up_blocks.{i}.attentions.{j}."))
        if i < 2:
            m.append((f"input_blocks.{3*(i+1)}.0.op.",
                      f"down_blocks.{i}.downsamplers.0.conv."))
    m.append(("output_blocks.2.2.conv.", "up_blocks.0.upsamplers.0.conv."))
    m.append(("output_blocks.5.2.", "up_blocks.1.upsamplers.0."))
    m.append(("middle_block.1.", "mid_block.attentions.0."))
    for j in range(2):
        m.append((f"middle_block.{2*j}.", f"mid_block.resnets.{j}."))
    return m


def convert_sd_unet_to_diffusers(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Original SD-format SDXL UNet keys (optionally prefixed with
    model.diffusion_model.) -> diffusers keys."""
    sd = {k.removeprefix("model.diffusion_model."): v for k, v in sd.items()
          if "diffusion_model" in k or not k.startswith(
              ("first_stage_model.", "conditioner."))}
    top = dict(SD_HF_TOP)
    # longest prefixes first so e.g. output_blocks.2.2. wins over .2.
    layer = sorted(_sd_hf_layer_map(), key=lambda kv: -len(kv[0]))
    out = {}
    for k, v in sd.items():
        if k in top:
            out[top[k]] = v
            continue
        nk = k
        for sd_p, hf_p in layer:
            if nk.startswith(sd_p):
                nk = hf_p + nk[len(sd_p):]
                break
        if "resnets" in nk:
            for sd_p, hf_p in SD_HF_RESNET:
                nk = nk.replace(sd_p, hf_p)
        out[nk] = v
    return out


def convert_diffusers_unet_to_sd(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """diffusers SDXL UNet keys -> original SD-format keys (for save_model
    parity with reference sdxl.py:476-525)."""
    top = {hf: s for s, hf in SD_HF_TOP}
    layer = sorted(_sd_hf_layer_map(), key=lambda kv: -len(kv[1]))
    out = {}
    for k, v in sd.items():
        if k in top:
            out[top[k]] = v
            continue
        nk = k
        if "resnets" in nk:
            for sd_p, hf_p in SD_HF_RESNET:
                nk = nk.replace(hf_p, sd_p)
        for sd_p, hf_p in layer:
            if nk.startswith(hf_p):
                nk = sd_p + nk[len(hf_p):]
                break
        out[nk] = v
    return out


# --- full-model export (reference save_model, sdxl.py:487-525) ---------------


def _inv_conv(entry):
    out = {"weight": np.ascontiguousarray(
        np.transpose(np.asarray(entry["kernel"]), (3, 2, 0, 1)))}
    if "bias" in entry:
        out["bias"] = np.asarray(entry["bias"])
    return out


def _inv_linear(entry):
    out = {"weight": np.ascontiguousarray(np.asarray(entry["kernel"]).T)}
    if "bias" in entry:
        out["bias"] = np.asarray(entry["bias"])
    return out


def _inv_norm(entry):
    return {"weight": np.asarray(entry["scale"]),
            "bias": np.asarray(entry["bias"])}


def _emit(sd, prefix, entries):
    for suffix, v in entries.items():
        sd[f"{prefix}.{suffix}"] = v


def export_sdxl_unet_diffusers(p: Dict[str, dict], cfg: SDXLConfig
                               ) -> Dict[str, np.ndarray]:
    """Invert convert_diffusers_sdxl_unet: flax UNet tree -> diffusers keys."""
    sd: Dict[str, np.ndarray] = {}

    def put_resnet(prefix, tree):
        _emit(sd, f"{prefix}.norm1", _inv_norm(tree["norm1"]))
        _emit(sd, f"{prefix}.conv1", _inv_conv(tree["conv1"]))
        _emit(sd, f"{prefix}.time_emb_proj", _inv_linear(tree["time_emb_proj"]))
        _emit(sd, f"{prefix}.norm2", _inv_norm(tree["norm2"]))
        _emit(sd, f"{prefix}.conv2", _inv_conv(tree["conv2"]))
        if "conv_shortcut" in tree:
            _emit(sd, f"{prefix}.conv_shortcut",
                  _inv_conv(tree["conv_shortcut"]))

    def put_basic(prefix, tree):
        for i in (1, 2, 3):
            _emit(sd, f"{prefix}.norm{i}", _inv_norm(tree[f"norm{i}"]))
        for attn in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                _emit(sd, f"{prefix}.{attn}.{proj}",
                      _inv_linear(tree[f"{attn}_{proj}"]))
            _emit(sd, f"{prefix}.{attn}.to_out.0",
                  _inv_linear(tree[f"{attn}_to_out"]))
        _emit(sd, f"{prefix}.ff.net.0.proj", _inv_linear(tree["ff_proj"]))
        _emit(sd, f"{prefix}.ff.net.2", _inv_linear(tree["ff_out"]))

    def put_transformer(prefix, tree, depth):
        _emit(sd, f"{prefix}.norm", _inv_norm(tree["norm"]))
        _emit(sd, f"{prefix}.proj_in", _inv_linear(tree["proj_in"]))
        _emit(sd, f"{prefix}.proj_out", _inv_linear(tree["proj_out"]))
        for i in range(depth):
            put_basic(f"{prefix}.transformer_blocks.{i}", tree[f"block_{i}"])

    _emit(sd, "conv_in", _inv_conv(p["conv_in"]))
    _emit(sd, "time_embedding.linear_1", _inv_linear(p["time_embedding_1"]))
    _emit(sd, "time_embedding.linear_2", _inv_linear(p["time_embedding_2"]))
    _emit(sd, "add_embedding.linear_1", _inv_linear(p["add_embedding_1"]))
    _emit(sd, "add_embedding.linear_2", _inv_linear(p["add_embedding_2"]))
    _emit(sd, "conv_norm_out", _inv_norm(p["conv_norm_out"]))
    _emit(sd, "conv_out", _inv_conv(p["conv_out"]))
    n = len(cfg.block_out_channels)
    for i in range(n):
        depth = cfg.transformer_layers[i]
        for j in range(cfg.layers_per_block):
            put_resnet(f"down_blocks.{i}.resnets.{j}", p[f"down_{i}_res_{j}"])
            if depth > 0:
                put_transformer(f"down_blocks.{i}.attentions.{j}",
                                p[f"down_{i}_attn_{j}"], depth)
        if i < n - 1:
            _emit(sd, f"down_blocks.{i}.downsamplers.0.conv",
                  _inv_conv(p[f"down_{i}_downsample"]))
    put_resnet("mid_block.resnets.0", p["mid_res_0"])
    put_resnet("mid_block.resnets.1", p["mid_res_1"])
    put_transformer("mid_block.attentions.0", p["mid_attn"],
                    cfg.transformer_layers[-1])
    rev = list(reversed(cfg.transformer_layers))
    for i in range(n):
        depth = rev[i]
        for j in range(cfg.layers_per_block + 1):
            put_resnet(f"up_blocks.{i}.resnets.{j}", p[f"up_{i}_res_{j}"])
            if depth > 0:
                put_transformer(f"up_blocks.{i}.attentions.{j}",
                                p[f"up_{i}_attn_{j}"], depth)
        if i < n - 1:
            _emit(sd, f"up_blocks.{i}.upsamplers.0.conv",
                  _inv_conv(p[f"up_{i}_upsample"]))
    return sd


def flax_hf_to_torch_sd(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    """Generic transformers-flax param tree -> HF torch key dict
    (kernel->weight.T, embedding->weight, scale->weight)."""
    out: Dict[str, np.ndarray] = {}

    def rec(node, path):
        for k, v in node.items():
            if not isinstance(v, dict):
                out[".".join(path + [k])] = np.asarray(v)
                continue
            key = ".".join(path + [k])
            if "kernel" in v and not any(
                isinstance(x, dict) for x in v.values()
            ):
                out[key + ".weight"] = np.ascontiguousarray(
                    np.asarray(v["kernel"]).T)
                if "bias" in v:
                    out[key + ".bias"] = np.asarray(v["bias"])
            elif set(v) == {"embedding"}:
                out[key + ".weight"] = np.asarray(v["embedding"])
            elif "scale" in v and not any(
                isinstance(x, dict) for x in v.values()
            ):
                out[key + ".weight"] = np.asarray(v["scale"])
                if "bias" in v:
                    out[key + ".bias"] = np.asarray(v["bias"])
            else:
                rec(v, path + [k])

    rec(tree, [prefix] if prefix else [])
    return out


_OPENCLIP_RENAMES = [
    # (stable-diffusion, HF) — reference sdxl.py:209-220
    ("transformer.resblocks.", "text_model.encoder.layers."),
    ("ln_1", "layer_norm1"),
    ("ln_2", "layer_norm2"),
    (".c_fc.", ".fc1."),
    (".c_proj.", ".fc2."),
    (".attn", ".self_attn"),
    ("ln_final.", "text_model.final_layer_norm."),
    ("token_embedding.weight", "text_model.embeddings.token_embedding.weight"),
    ("positional_embedding", "text_model.embeddings.position_embedding.weight"),
]


def convert_hf_clip_to_openclip(sd: Dict[str, np.ndarray]
                                ) -> Dict[str, np.ndarray]:
    """HF CLIPTextModel keys -> original open-clip keys with fused
    in_proj (reference convert_openclip_text_enc_state_dict,
    sdxl.py:228-275)."""
    def rename(k):
        for sd_part, hf_part in _OPENCLIP_RENAMES:
            k = k.replace(hf_part, sd_part)
        return k

    out: Dict[str, np.ndarray] = {}
    qkv_w: Dict[str, list] = {}
    qkv_b: Dict[str, list] = {}
    code = {"q": 0, "k": 1, "v": 2}
    for k, v in sd.items():
        for kind, store in (("weight", qkv_w), ("bias", qkv_b)):
            matched = False
            for c in "qkv":
                suffix = f".self_attn.{c}_proj.{kind}"
                if k.endswith(suffix):
                    pre = k[: -len(f".{c}_proj.{kind}")]
                    store.setdefault(pre, [None, None, None])[code[c]] = v
                    matched = True
                    break
            if matched:
                break
        else:
            out[rename(k)] = v
    for pre, tensors in qkv_w.items():
        assert all(t is not None for t in tensors), pre
        out[rename(pre) + ".in_proj_weight"] = np.concatenate(tensors, axis=0)
    for pre, tensors in qkv_b.items():
        assert all(t is not None for t in tensors), pre
        out[rename(pre) + ".in_proj_bias"] = np.concatenate(tensors, axis=0)
    return out


_VAE_SD_RENAMES = None


def convert_diffusers_vae_keys_to_sd(sd: Dict[str, np.ndarray]
                                     ) -> Dict[str, np.ndarray]:
    """diffusers AutoencoderKL keys -> original SD first_stage_model keys
    (reference convert_vae_state_dict, sdxl.py:125-201)."""
    renames = [
        ("nin_shortcut", "conv_shortcut"),
        ("norm_out", "conv_norm_out"),
        ("mid.attn_1.", "mid_block.attentions.0."),
    ]
    for i in range(4):
        for j in range(2):
            renames.append((f"encoder.down.{i}.block.{j}.",
                            f"encoder.down_blocks.{i}.resnets.{j}."))
        if i < 3:
            renames.append((f"down.{i}.downsample.",
                            f"down_blocks.{i}.downsamplers.0."))
            renames.append((f"up.{3-i}.upsample.",
                            f"up_blocks.{i}.upsamplers.0."))
        for j in range(3):
            renames.append((f"decoder.up.{3-i}.block.{j}.",
                            f"decoder.up_blocks.{i}.resnets.{j}."))
    for i in range(2):
        renames.append((f"mid.block_{i+1}.", f"mid_block.resnets.{i}."))
    attn_renames = [
        ("norm.", "group_norm."),
        ("q.", "to_q."),
        ("k.", "to_k."),
        ("v.", "to_v."),
        ("proj_out.", "to_out.0."),
    ]
    out = {}
    for k, v in sd.items():
        nk = k
        for sd_part, hf_part in renames:
            nk = nk.replace(hf_part, sd_part)
        if "attn_1" in nk or "attentions" in k:
            for sd_part, hf_part in attn_renames:
                nk = nk.replace(hf_part, sd_part)
        if any(f"mid.attn_1.{w}.weight" in nk
               for w in ("q", "k", "v", "proj_out")) and v.ndim == 2:
            v = v.reshape(*v.shape, 1, 1)
        out[nk] = v
    return out
