"""Flux weight conversion: diffusers state dict -> flax params round trip."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_pipe_tpu.models.flux_convert import (
    _DOUBLE_MAP,
    _DOUBLE_NORMS,
    _SINGLE_MAP,
    _SINGLE_NORMS,
    convert_diffusers_flux,
    export_lora_diffusers,
)
from diffusion_pipe_tpu.models.flux_model import FluxConfig, FluxTransformer


def _init_params(cfg):
    model = FluxTransformer(cfg)
    B, Simg, Stxt = 1, 16, 8
    args = (
        jnp.zeros((B, Simg, cfg.in_channels)),
        jnp.zeros((B, Stxt, cfg.joint_attention_dim)),
        jnp.zeros((B, cfg.pooled_projection_dim)),
        jnp.zeros((B,)),
        jnp.zeros((Simg, 3)),
        jnp.zeros((Stxt, 3)),
        jnp.ones((B,)),
    )
    return model, args, nn.unbox(model.init(jax.random.PRNGKey(0), *args))


def _fake_diffusers_sd(params, cfg):
    """Invert our param tree into a diffusers-keyed state dict."""
    sd = {}
    p = params["params"]

    def put_linear(theirs, leaf):
        sd[f"{theirs}.weight"] = np.asarray(leaf["kernel"]).T
        if "bias" in leaf:
            sd[f"{theirs}.bias"] = np.asarray(leaf["bias"])

    def put_norm(theirs, leaf):
        sd[f"{theirs}.weight"] = np.asarray(leaf["scale"])

    put_linear("x_embedder", p["x_embedder"])
    put_linear("context_embedder", p["context_embedder"])
    for ours, theirs in [
        ("timestep_embedder", "time_text_embed.timestep_embedder"),
        ("guidance_embedder", "time_text_embed.guidance_embedder"),
        ("text_embedder", "time_text_embed.text_embedder"),
    ]:
        put_linear(f"{theirs}.linear_1", p[ours]["linear_1"])
        put_linear(f"{theirs}.linear_2", p[ours]["linear_2"])
    put_linear("norm_out.linear", p["norm_out_linear"])
    put_linear("proj_out", p["proj_out"])

    for i in range(cfg.num_layers):
        for ours, theirs in _DOUBLE_MAP.items():
            leaf = jax.tree.map(lambda x: x[i], p["double_blocks"][ours])
            put_linear(f"transformer_blocks.{i}.{theirs}", leaf)
        for ours, theirs in _DOUBLE_NORMS.items():
            leaf = jax.tree.map(lambda x: x[i], p["double_blocks"][ours])
            put_norm(f"transformer_blocks.{i}.{theirs}", leaf)
    for i in range(cfg.num_single_layers):
        for ours, theirs in _SINGLE_MAP.items():
            leaf = jax.tree.map(lambda x: x[i], p["single_blocks"][ours])
            put_linear(f"single_transformer_blocks.{i}.{theirs}", leaf)
        for ours, theirs in _SINGLE_NORMS.items():
            leaf = jax.tree.map(lambda x: x[i], p["single_blocks"][ours])
            put_norm(f"single_transformer_blocks.{i}.{theirs}", leaf)
    return sd


def test_convert_roundtrip_structure_and_values():
    cfg = FluxConfig.tiny()
    model, args, params = _init_params(cfg)
    sd = _fake_diffusers_sd(params, cfg)
    converted = convert_diffusers_flux(sd, cfg)
    # identical structure
    assert jax.tree.structure(converted) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(converted), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the converted params actually run
    out = model.apply(converted, *args)
    ref = model.apply(params, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_lora_export_keys():
    cfg = FluxConfig.tiny(lora_rank=4, lora_alpha=4.0)
    _, _, params = _init_params(cfg)
    from diffusion_pipe_tpu.training.train_state import (
        lora_predicate,
        partition_params,
    )

    trainable, _ = partition_params(params, lora_predicate)
    sd = export_lora_diffusers(trainable, cfg)
    assert f"transformer.transformer_blocks.0.attn.to_q.lora_A.weight" in sd
    assert (
        f"transformer.single_transformer_blocks.{cfg.num_single_layers-1}"
        ".proj_out.lora_B.weight" in sd
    )
    a = sd["transformer.transformer_blocks.0.attn.to_q.lora_A.weight"]
    assert a.shape == (4, cfg.hidden_size)
    # one A/B pair per lora'd linear per block
    n_lin = len(_DOUBLE_MAP) * cfg.num_layers + len(_SINGLE_MAP) * cfg.num_single_layers
    assert len(sd) == 2 * n_lin
