"""UMT5 encoder: forward, masking, ComfyUI-key converter round trip."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_pipe_tpu.models.umt5 import (
    UMT5Config,
    UMT5Encoder,
    convert_umt5_comfy,
    relative_position_buckets,
)


def _invert_to_comfy(params, cfg):
    p = nn.unbox(params)["params"]
    sd = {
        "shared.weight": np.asarray(p["token_embedding"]["embedding"]),
        "encoder.final_layer_norm.weight": np.asarray(p["final_norm"]),
    }
    for i in range(cfg.num_layers):
        b = p[f"block_{i}"]
        pre = f"encoder.block.{i}"
        sd[f"{pre}.layer.0.layer_norm.weight"] = np.asarray(b["norm1"])
        for n in ["q", "k", "v", "o"]:
            sd[f"{pre}.layer.0.SelfAttention.{n}.weight"] = np.asarray(
                b[f"attn_{n}"]["kernel"]
            ).T
        sd[f"{pre}.layer.0.SelfAttention.relative_attention_bias.weight"] = (
            np.asarray(b["pos_embedding"])
        )
        sd[f"{pre}.layer.1.layer_norm.weight"] = np.asarray(b["norm2"])
        sd[f"{pre}.layer.1.DenseReluDense.wi_0.weight"] = np.asarray(
            b["ffn_gate"]["kernel"]
        ).T
        sd[f"{pre}.layer.1.DenseReluDense.wi_1.weight"] = np.asarray(
            b["ffn_fc1"]["kernel"]
        ).T
        sd[f"{pre}.layer.1.DenseReluDense.wo.weight"] = np.asarray(
            b["ffn_fc2"]["kernel"]
        ).T
    return sd


def test_umt5_forward_and_converter():
    cfg = UMT5Config.tiny()
    enc = UMT5Encoder(cfg)
    ids = jnp.array([[3, 5, 7, 9, 0, 0], [2, 4, 6, 8, 10, 12]])
    mask = jnp.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]])
    params = enc.init(jax.random.PRNGKey(0), ids, mask)
    out = enc.apply(params, ids, mask)
    assert out.shape == (2, 6, cfg.dim)
    conv = convert_umt5_comfy(_invert_to_comfy(params, cfg), cfg)
    out2 = enc.apply(conv, ids, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_umt5_mask_changes_valid_tokens_only_via_attention():
    cfg = UMT5Config.tiny()
    enc = UMT5Encoder(cfg)
    ids = jnp.array([[3, 5, 7, 9, 11, 13]])
    params = enc.init(jax.random.PRNGKey(0), ids, None)
    full = enc.apply(params, ids, jnp.ones((1, 6), jnp.int32))
    # masking out the tail changes the valid tokens' outputs (attention sees
    # fewer keys)
    part = enc.apply(params, ids, jnp.array([[1, 1, 1, 0, 0, 0]]))
    assert not np.allclose(np.asarray(full[:, :3]), np.asarray(part[:, :3]))


def test_relative_buckets_symmetry():
    b = relative_position_buckets(8, 8, 32, 128)
    assert b.shape == (8, 8)
    assert b[0, 0] == 0
    assert b[0, 1] != b[1, 0]  # direction-sensitive (bidirectional halves)
