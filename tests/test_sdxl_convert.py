"""SDXL UNet converter: diffusers keys -> our structure, kohya LoRA export."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_pipe_tpu.models.sdxl_convert import (
    convert_diffusers_sdxl_unet,
    export_sdxl_lora_kohya,
)
from diffusion_pipe_tpu.models.sdxl_unet import SDXLConfig, SDXLUNet


def _init(cfg):
    model = SDXLUNet(cfg)
    args = (
        jnp.zeros((1, 4, 16, 16)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 8, cfg.cross_attention_dim)),
        jnp.zeros((1, cfg.projection_class_embeddings_input_dim - 6 * 256)),
        jnp.zeros((1, 6)),
    )
    return model, args, nn.unbox(model.init(jax.random.PRNGKey(0), *args))


def _invert(params, cfg):
    """Build a diffusers-keyed sd from our init params (inverse mapping)."""
    sd = {}

    def put_lin(theirs, leaf):
        sd[f"{theirs}.weight"] = np.asarray(leaf["kernel"]).T
        if "bias" in leaf:
            sd[f"{theirs}.bias"] = np.asarray(leaf["bias"])

    def put_conv(theirs, leaf):
        sd[f"{theirs}.weight"] = np.transpose(
            np.asarray(leaf["kernel"]), (3, 2, 0, 1)
        )
        sd[f"{theirs}.bias"] = np.asarray(leaf["bias"])

    def put_norm(theirs, leaf):
        sd[f"{theirs}.weight"] = np.asarray(leaf["scale"])
        sd[f"{theirs}.bias"] = np.asarray(leaf["bias"])

    def put_resnet(theirs, tree):
        put_norm(f"{theirs}.norm1", tree["norm1"])
        put_conv(f"{theirs}.conv1", tree["conv1"])
        put_lin(f"{theirs}.time_emb_proj", tree["time_emb_proj"])
        put_norm(f"{theirs}.norm2", tree["norm2"])
        put_conv(f"{theirs}.conv2", tree["conv2"])
        if "conv_shortcut" in tree:
            put_conv(f"{theirs}.conv_shortcut", tree["conv_shortcut"])

    def put_transformer(theirs, tree, depth):
        put_norm(f"{theirs}.norm", tree["norm"])
        put_lin(f"{theirs}.proj_in", tree["proj_in"])
        put_lin(f"{theirs}.proj_out", tree["proj_out"])
        for i in range(depth):
            b = tree[f"block_{i}"]
            tb = f"{theirs}.transformer_blocks.{i}"
            for k in range(1, 4):
                put_norm(f"{tb}.norm{k}", b[f"norm{k}"])
            for attn in ["attn1", "attn2"]:
                for proj in ["to_q", "to_k", "to_v"]:
                    put_lin(f"{tb}.{attn}.{proj}", b[f"{attn}_{proj}"])
                put_lin(f"{tb}.{attn}.to_out.0", b[f"{attn}_to_out"])
            put_lin(f"{tb}.ff.net.0.proj", b["ff_proj"])
            put_lin(f"{tb}.ff.net.2", b["ff_out"])

    p = params["params"]
    put_conv("conv_in", p["conv_in"])
    put_lin("time_embedding.linear_1", p["time_embedding_1"])
    put_lin("time_embedding.linear_2", p["time_embedding_2"])
    put_lin("add_embedding.linear_1", p["add_embedding_1"])
    put_lin("add_embedding.linear_2", p["add_embedding_2"])
    put_norm("conv_norm_out", p["conv_norm_out"])
    put_conv("conv_out", p["conv_out"])
    n = len(cfg.block_out_channels)
    for i in range(n):
        depth = cfg.transformer_layers[i]
        for j in range(cfg.layers_per_block):
            put_resnet(f"down_blocks.{i}.resnets.{j}", p[f"down_{i}_res_{j}"])
            if depth > 0:
                put_transformer(
                    f"down_blocks.{i}.attentions.{j}",
                    p[f"down_{i}_attn_{j}"], depth,
                )
        if i < n - 1:
            put_conv(f"down_blocks.{i}.downsamplers.0.conv",
                     p[f"down_{i}_downsample"])
    put_resnet("mid_block.resnets.0", p["mid_res_0"])
    put_resnet("mid_block.resnets.1", p["mid_res_1"])
    put_transformer("mid_block.attentions.0", p["mid_attn"],
                    cfg.transformer_layers[-1])
    rev = list(reversed(cfg.transformer_layers))
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            put_resnet(f"up_blocks.{i}.resnets.{j}", p[f"up_{i}_res_{j}"])
            if rev[i] > 0:
                put_transformer(f"up_blocks.{i}.attentions.{j}",
                                p[f"up_{i}_attn_{j}"], rev[i])
        if i < n - 1:
            put_conv(f"up_blocks.{i}.upsamplers.0.conv", p[f"up_{i}_upsample"])
    return sd


def test_sdxl_unet_convert_roundtrip():
    cfg = SDXLConfig.tiny()
    model, args, params = _init(cfg)
    sd = _invert(params, cfg)
    converted = {"params": convert_diffusers_sdxl_unet(sd, cfg)}
    assert jax.tree.structure(converted) == jax.tree.structure(params)
    out = model.apply(converted, *args)
    ref = model.apply(params, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_sdxl_kohya_export():
    cfg = SDXLConfig.tiny(lora_rank=4, lora_alpha=4.0)
    _, _, params = _init(cfg)
    trainable = {"params": {"unet": params["params"]}}
    sd = export_sdxl_lora_kohya(trainable, cfg)
    assert any(k.startswith("lora_unet_mid_block_attentions_0") for k in sd)
    downs = [k for k in sd if k.endswith("lora_down.weight")]
    ups = [k for k in sd if k.endswith("lora_up.weight")]
    alphas = [k for k in sd if k.endswith("alpha")]
    assert len(downs) == len(ups) == len(alphas) > 0
    a = sd["lora_unet_mid_block_attentions_0_transformer_blocks_0_attn1_to_q"
           ".lora_down.weight"]
    assert a.shape[0] == 4


def test_sd_single_file_roundtrip():
    from diffusion_pipe_tpu.models.sdxl_convert import (
        convert_diffusers_unet_to_sd,
        convert_sd_unet_to_diffusers,
    )

    cfg = SDXLConfig.tiny()
    model, args, params = _init(cfg)
    dsd = _invert(params, cfg)
    sd_format = convert_diffusers_unet_to_sd(dsd)
    back = convert_sd_unet_to_diffusers(sd_format)
    assert set(back) == set(dsd)
    for k in dsd:
        np.testing.assert_array_equal(dsd[k], back[k])
    conv = {"params": convert_diffusers_sdxl_unet(back, cfg)}
    out = model.apply(conv, *args)
    ref = model.apply(params, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
