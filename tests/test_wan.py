"""Wan pipeline: tiny video training, i2v conditioning, weight conversion."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_pipe_tpu.models import get_model_class
from diffusion_pipe_tpu.models.wan import convert_wan_weights, export_wan_lora_comfyui
from diffusion_pipe_tpu.models.wan_model import WanConfig
from diffusion_pipe_tpu.training.optimizers import get_optimizer
from diffusion_pipe_tpu.training.train_state import lora_predicate
from diffusion_pipe_tpu.training.trainer import init_train_state, make_train_step


def _config(variant_type="t2v", min_t=0.0, max_t=1.0):
    return {
        "save_every_n_epochs": 1,
        "model": {
            "type": "wan", "dtype": "float32", "_tiny": True,
            "variant_type": variant_type, "min_t": min_t, "max_t": max_t,
            "shift": 3.0 if (min_t or max_t != 1.0) else None,
        },
        "adapter": {"type": "lora", "rank": 4, "alpha": 4, "dropout": 0.0},
        "optimizer": {"type": "adamw", "lr": 2e-3},
    }


def _batch(key, b=2, f=5, h=16, w=16, i2v=False):
    ks = jax.random.split(key, 4)
    batch = {
        "latents": jax.random.normal(ks[0], (b, 16, f, h, w)) * 0.5,
        "text_embeddings": jax.random.normal(ks[1], (b, 16, 32)),
        "seq_lens": jnp.array([10, 16]),
    }
    if i2v:
        batch["y"] = jax.random.normal(ks[2], (b, 16, f, h, w)) * 0.5
        batch["clip_context"] = jax.random.normal(ks[3], (b, 257, 1280))
    return batch


def test_wan_t2v_training_reduces_loss():
    cfg = _config()
    pipeline = get_model_class("wan")(cfg)
    assert pipeline.framerate == 16
    optimizer = get_optimizer(cfg)
    state = init_train_state(pipeline, optimizer, jax.random.PRNGKey(0),
                             lora_predicate)
    step = jax.jit(make_train_step(pipeline, optimizer))
    batch = _batch(jax.random.PRNGKey(1))
    losses = []
    for _ in range(6):
        state, m = step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all() if hasattr(np, "isfinite") else True
    assert losses[-1] < losses[0], losses


def test_wan_i2v_forward():
    cfg = _config(variant_type="i2v")
    pipeline = get_model_class("wan")(cfg)
    params = pipeline.init_params(jax.random.PRNGKey(0))
    mi, target, mask = pipeline.prepare_inputs(
        jax.random.PRNGKey(1), _batch(jax.random.PRNGKey(2), i2v=True)
    )
    assert mi["x"].shape[1] == 36  # 16 latent + 4 mask + 16 y channels
    out = pipeline.forward(params, mi)
    assert out.shape == target.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_wan_min_max_t_applies_to_shifted_t():
    cfg = _config(min_t=0.0, max_t=0.875)
    pipeline = get_model_class("wan")(cfg)
    mi, _, _ = pipeline.prepare_inputs(
        jax.random.PRNGKey(1), _batch(jax.random.PRNGKey(2))
    )
    t = mi["t"] / 1000.0
    assert float(t.max()) <= 0.875 + 1e-4


def test_wan_weight_conversion_roundtrip():
    cfg = WanConfig.tiny()
    pipeline = get_model_class("wan")(_config())
    params = nn.unbox(pipeline.init_params(jax.random.PRNGKey(0)))

    # invert our params into an official-style state dict
    sd = {}
    p = params["params"]

    def put_lin(theirs, leaf):
        sd[f"{theirs}.weight"] = np.asarray(leaf["kernel"]).T
        if "bias" in leaf:
            sd[f"{theirs}.bias"] = np.asarray(leaf["bias"])

    kw = np.asarray(p["patch_embedding"]["kernel"])  # [kt,kh,kw,I,O]
    sd["patch_embedding.weight"] = np.transpose(kw, (4, 3, 0, 1, 2))
    sd["patch_embedding.bias"] = np.asarray(p["patch_embedding"]["bias"])
    put_lin("text_embedding.0", p["text_embedding_1"])
    put_lin("text_embedding.2", p["text_embedding_2"])
    put_lin("time_embedding.0", p["time_embedding_1"])
    put_lin("time_embedding.2", p["time_embedding_2"])
    put_lin("time_projection.1", p["time_projection"])
    put_lin("head.head", p["head"])
    sd["head.modulation"] = np.asarray(p["head_modulation"])
    from diffusion_pipe_tpu.models.wan import _BLOCK_LINEARS, _BLOCK_RMS

    wan_cfg = pipeline.wan_config
    for i in range(wan_cfg.num_layers):
        blk = jax.tree.map(lambda x: x[i], p["blocks"])
        for ours, theirs in _BLOCK_LINEARS.items():
            put_lin(f"blocks.{i}.{theirs}", blk[ours])
        for ours, theirs in _BLOCK_RMS.items():
            sd[f"blocks.{i}.{theirs}.weight"] = np.asarray(blk[ours]["scale"])
        sd[f"blocks.{i}.norm3.weight"] = np.asarray(blk["norm3_scale"])
        sd[f"blocks.{i}.norm3.bias"] = np.asarray(blk["norm3_bias"])
        sd[f"blocks.{i}.modulation"] = np.asarray(blk["modulation"])

    converted = convert_wan_weights(sd, wan_cfg)
    # LoRA params exist only in live init, not in checkpoints: compare the
    # non-lora subtree
    from diffusion_pipe_tpu.training.train_state import partition_params

    _, frozen = partition_params(params, lora_predicate)
    _, frozen_conv = partition_params(
        {"params": {**converted["params"]}}, lora_predicate
    )
    flat_a = jax.tree.leaves(frozen)
    flat_b = jax.tree.leaves(frozen_conv)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_wan_lora_export():
    cfg = _config()
    pipeline = get_model_class("wan")(cfg)
    params = nn.unbox(pipeline.init_params(jax.random.PRNGKey(0)))
    from diffusion_pipe_tpu.training.train_state import partition_params

    trainable, _ = partition_params(params, lora_predicate)
    sd = export_wan_lora_comfyui(trainable, pipeline.wan_config)
    assert "diffusion_model.blocks.0.self_attn.q.lora_A.weight" in sd
    assert sd["diffusion_model.blocks.0.self_attn.q.lora_A.weight"].shape == (
        4, pipeline.wan_config.dim,
    )


def test_wan_uncached_text_embeddings():
    """cache_text_embeddings=false: captions tokenized host-side, frozen
    UMT5 runs inside the jitted step (reference wan.py:77, 338-342,
    442-447); T5 params stay out of the train state."""
    cfg = _config()
    cfg["model"]["cache_text_embeddings"] = False
    pipeline = get_model_class("wan")(cfg)
    assert pipeline.cacheable_text_embeddings == ()
    assert pipeline.pass_captions_to_batch
    optimizer = get_optimizer(cfg)
    state = init_train_state(pipeline, optimizer, jax.random.PRNGKey(0),
                             lora_predicate)
    assert "t5" not in str(jax.tree_util.tree_structure(state.trainable))
    step = jax.jit(make_train_step(pipeline, optimizer))
    batch = pipeline.host_prepare({
        "latents": jax.random.normal(jax.random.PRNGKey(1), (2, 16, 5, 16, 16))
        * 0.5,
        "caption": np.array(["a cat swims", "dog"]),
    })
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    assert batch["t5_input_ids"].shape == (2, 16)
    losses = []
    for _ in range(4):
        state, m = step(state, batch, jax.random.PRNGKey(3))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_wan_sequence_sharding_loss_matches_unsharded():
    """`sequence_sharding = true` (token dim over 'tensor' between attention
    ops) is numerics-neutral: same loss as the unsharded program on a
    data=4 x tensor=2 mesh."""
    import numpy as np

    from diffusion_pipe_tpu.mesh import make_mesh

    mesh = make_mesh(pipeline_stages=1, tensor_parallel=2)
    losses = {}
    for flag in (False, True):
        cfg = {
            "save_every_n_epochs": 1,
            "model": {"type": "wan", "dtype": "float32", "_tiny": True},
            "adapter": {"type": "lora", "rank": 4, "alpha": 4,
                        "dropout": 0.0},
            "optimizer": {"type": "adamw", "lr": 1e-3},
            "sequence_sharding": flag,
        }
        pipe = get_model_class("wan")(cfg)
        params = pipe.init_params(jax.random.PRNGKey(0))
        k = jax.random.PRNGKey(1)
        batch = {
            "latents": jax.random.normal(k, (4, 16, 2, 8, 8)),
            "text_embeddings": jax.random.normal(k, (4, 16, 32)),
            "seq_lens": jnp.full((4,), 7, jnp.int32),
        }

        def loss(params, batch, rng):
            mi, tgt, msk = pipe.prepare_inputs(rng, batch)
            return pipe.loss_fn(pipe.forward(params, mi), tgt, msk)

        with jax.set_mesh(mesh):
            losses[flag] = float(
                jax.jit(loss)(params, batch, jax.random.PRNGKey(7)))
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=1e-5, atol=1e-6)
