"""AuraFlow: converter structure round-trip + forward determinism."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import traverse_util

from diffusion_pipe_tpu.models.auraflow import (
    AuraFlowConfig,
    AuraFlowTransformer,
    convert_diffusers_auraflow,
    pe_selection_indices,
)


def _fake_sd_from_params(params, cfg):
    """Invert convert_diffusers_auraflow: our params -> diffusers-keyed sd."""
    p = params["params"]
    sd = {}
    sd["pos_embed.pos_embed"] = np.asarray(p["pos_embed"])
    sd["register_tokens"] = np.asarray(p["register_tokens"])

    def put(theirs, leaf, bias=True):
        sd[theirs + ".weight"] = np.asarray(leaf["kernel"]).T
        if bias and "bias" in leaf:
            sd[theirs + ".bias"] = np.asarray(leaf["bias"])

    put("pos_embed.proj", p["patch_proj"])
    put("context_embedder", p["context_embedder"], bias=False)
    put("time_step_proj.linear_1", p["time_linear_1"])
    put("time_step_proj.linear_2", p["time_linear_2"])
    put("norm_out.linear", p["norm_out_linear"], bias=False)
    put("proj_out", p["proj_out_linear"], bias=False)

    from diffusion_pipe_tpu.models.auraflow import (  # noqa: PLC0415
        convert_diffusers_auraflow as _c,
    )

    joint_map = {
        "norm1_linear": "norm1.linear",
        "norm1_context_linear": "norm1_context.linear",
        "attn_to_q": "attn.to_q", "attn_to_k": "attn.to_k",
        "attn_to_v": "attn.to_v", "attn_add_q": "attn.add_q_proj",
        "attn_add_k": "attn.add_k_proj", "attn_add_v": "attn.add_v_proj",
        "attn_to_out": "attn.to_out.0", "attn_to_add_out": "attn.to_add_out",
        "ff_linear_1": "ff.linear_1", "ff_linear_2": "ff.linear_2",
        "ff_out_projection": "ff.out_projection",
        "ff_context_linear_1": "ff_context.linear_1",
        "ff_context_linear_2": "ff_context.linear_2",
        "ff_context_out_projection": "ff_context.out_projection",
    }
    single_map = {k: v for k, v in joint_map.items()
                  if "context" not in k and "add" not in k}
    for ours, theirs in joint_map.items():
        stacked = np.asarray(p["joint_blocks"][ours]["kernel"])
        for i in range(cfg.num_layers):
            sd[f"joint_transformer_blocks.{i}.{theirs}.weight"] = stacked[i].T
    for ours, theirs in single_map.items():
        stacked = np.asarray(p["single_blocks"][ours]["kernel"])
        for i in range(cfg.num_single_layers):
            sd[f"single_transformer_blocks.{i}.{theirs}.weight"] = stacked[i].T
    return sd


def test_pe_selection_center_crop():
    idx = pe_selection_indices(64, 4, 4)  # 8x8 grid -> center 4x4
    grid = np.arange(64).reshape(8, 8)
    np.testing.assert_array_equal(idx.reshape(4, 4), grid[2:6, 2:6])


def test_converter_roundtrip_forward():
    cfg = AuraFlowConfig.tiny()
    model = AuraFlowTransformer(cfg)
    x = jnp.ones((1, 4, 8, 8)) * 0.1
    ctx = jnp.ones((1, 8, cfg.joint_attention_dim)) * 0.1
    t = jnp.full((1,), 0.5)
    params = nn.unbox(model.init(jax.random.PRNGKey(0), x, ctx, t))
    sd = _fake_sd_from_params(params, cfg)
    converted = convert_diffusers_auraflow(sd, cfg)

    flat_a = traverse_util.flatten_dict(params["params"])
    flat_b = traverse_util.flatten_dict(converted["params"])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_allclose(
            np.asarray(flat_a[k], np.float32),
            np.asarray(flat_b[k], np.float32),
            rtol=1e-6, err_msg=str(k),
        )
    out_a = model.apply(params, x, ctx, t)
    out_b = model.apply(converted, x, ctx, t)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)
    assert out_a.shape == (1, 4, 8, 8)
