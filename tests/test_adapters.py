"""Adapter system: LoKr dense, adapter export/import, init_from_existing.

Reference parity targets: peft.LoKrConfig injection (models/base.py:216-260)
and adapter.init_from_existing warm start (train.py:525-526,
models/base.py:313-332).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

from diffusion_pipe_tpu.models.layers import LoraDense, lokr_factorization
from diffusion_pipe_tpu.training.train_state import lora_predicate, partition_params


def test_lokr_factorization():
    # balanced split, m <= n, product preserved
    for dim in [64, 3072, 1536, 100, 7]:
        m, n = lokr_factorization(dim)
        assert m * n == dim and m <= n
    # pinned factor when it divides
    assert lokr_factorization(3072, 8) == (8, 384)
    # non-divisor factor caps the small side
    m, n = lokr_factorization(100, 7)
    assert m * n == 100 and m <= 7


def test_lokr_starts_at_base_and_trains():
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
    m = LoraDense(32, lora_rank=4, lora_alpha=4.0, lora_type="lokr")
    v = m.init(jax.random.PRNGKey(0), x)
    assert {"lokr_w1", "lokr_w2_a", "lokr_w2_b"} <= set(v["params"].keys())

    # zero-init w1 => output equals the base dense at init
    base = LoraDense(32)
    vb = {"params": {k: v["params"][k] for k in ("kernel", "bias")}}
    np.testing.assert_allclose(
        np.asarray(m.apply(v, x)), np.asarray(base.apply(vb, x)), rtol=1e-6
    )

    # adapter params are trainable under the standard predicate and the
    # loss decreases when only they are trained
    trainable, frozen = partition_params(v["params"], lora_predicate)
    from flax import traverse_util

    assert all(
        any(p.startswith("lokr_") for p in path)
        for path, leaf in traverse_util.flatten_dict(trainable).items()
        if leaf is not None
    )
    y_target = jax.random.normal(jax.random.PRNGKey(2), (4, 32))

    def loss(tr):
        merged = {**vb["params"], **{k: x_ for k, x_ in tr.items() if x_ is not None}}
        out = m.apply({"params": merged}, x)
        return jnp.mean((out - y_target) ** 2)

    tr = {k: v["params"][k] for k in ("lokr_w1", "lokr_w2_a", "lokr_w2_b")}
    opt = optax.adam(1e-2)
    ost = opt.init(tr)
    l0 = loss(tr)
    for _ in range(20):
        g = jax.grad(loss)(tr)
        upd, ost = opt.update(g, ost)
        tr = optax.apply_updates(tr, upd)
    assert loss(tr) < l0 * 0.9


def test_lokr_unfactored_when_rank_large():
    x = jnp.ones((2, 64))
    m = LoraDense(32, lora_rank=64, lora_alpha=64.0, lora_type="lokr")
    v = m.init(jax.random.PRNGKey(0), x)
    assert "lokr_w2" in v["params"] and "lokr_w2_a" not in v["params"]


def _tiny_flux_pipeline(adapter_type="lora", tmp_path=None):
    from diffusion_pipe_tpu.models.flux import FluxPipeline

    config = {
        "output_dir": str(tmp_path or "/tmp"),
        "save_every_n_epochs": 1,
        "model": {"type": "flux", "dtype": "bfloat16", "_tiny": True},
        "adapter": {
            "type": adapter_type,
            "rank": 4,
            "dtype": "float32",
        },
    }
    from diffusion_pipe_tpu.config import set_config_defaults

    return FluxPipeline(set_config_defaults(config))


def test_flux_lora_export_import_roundtrip(tmp_path):
    pipe = _tiny_flux_pipeline("lora", tmp_path)
    params = nn.unbox(pipe.init_params(jax.random.PRNGKey(0)))
    # randomize lora factors so the roundtrip is non-trivial
    params = jax.tree.map(
        lambda a: jax.random.normal(jax.random.PRNGKey(3), a.shape, a.dtype)
        if a.ndim >= 2
        else a,
        params,
    )
    pipe.save_adapter(tmp_path, params)

    fresh = nn.unbox(pipe.init_params(jax.random.PRNGKey(7)))
    loaded = pipe.load_adapter(tmp_path, fresh)

    src = params["params"]["double_blocks"]["attn_to_q"]
    dst = loaded["params"]["double_blocks"]["attn_to_q"]
    np.testing.assert_allclose(
        np.asarray(src["lora_a"], np.float32),
        np.asarray(dst["lora_a"], np.float32),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(src["lora_b"], np.float32),
        np.asarray(dst["lora_b"], np.float32),
        rtol=1e-6,
    )
    # non-adapter leaves keep the fresh init
    assert np.asarray(loaded["params"]["proj_out"]["kernel"]).shape


def test_flux_lokr_export_import_roundtrip(tmp_path):
    pipe = _tiny_flux_pipeline("lokr", tmp_path)
    params = nn.unbox(pipe.init_params(jax.random.PRNGKey(0)))
    params = jax.tree.map(
        lambda a: jax.random.normal(jax.random.PRNGKey(3), a.shape, a.dtype)
        if a.ndim >= 2
        else a,
        params,
    )
    pipe.save_adapter(tmp_path, params)
    fresh = nn.unbox(pipe.init_params(jax.random.PRNGKey(7)))
    loaded = pipe.load_adapter(tmp_path, fresh)
    src = params["params"]["double_blocks"]["attn_to_q"]
    dst = loaded["params"]["double_blocks"]["attn_to_q"]
    for leaf in ("lokr_w1", "lokr_w2_a", "lokr_w2_b"):
        np.testing.assert_allclose(
            np.asarray(src[leaf], np.float32),
            np.asarray(dst[leaf], np.float32),
            rtol=1e-6,
            err_msg=leaf,
        )


def test_load_adapter_rejects_mismatched_file(tmp_path):
    from safetensors.numpy import save_file

    save_file({"not_a_lora_key": np.zeros((2, 2), np.float32)},
              str(tmp_path / "adapter_model.safetensors"))
    pipe = _tiny_flux_pipeline("lora", tmp_path)
    params = nn.unbox(pipe.init_params(jax.random.PRNGKey(0)))
    with pytest.raises(RuntimeError):
        pipe.load_adapter(tmp_path, params)
