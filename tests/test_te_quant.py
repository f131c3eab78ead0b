"""text_encoder_fp8 analogue (reference wan/wan.py:188-191,
cosmos_predict2.py:229-232): 2-D TE matmul weights stored float8_e4m3fn,
embeddings / relative-position tables kept full precision; compute
dequantizes on use."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from diffusion_pipe_tpu.models.text_encoders import cast_te_params_fp8
from diffusion_pipe_tpu.models.umt5 import UMT5Config, UMT5Encoder


def _tiny_te():
    cfg = UMT5Config.tiny()
    enc = UMT5Encoder(cfg)
    ids = jnp.zeros((2, 6), jnp.int32).at[:, :4].set(
        jnp.arange(1, 5)[None])
    mask = jnp.zeros((2, 6), jnp.int32).at[:, :4].set(1)
    params = enc.init(jax.random.PRNGKey(0), ids, mask)
    return enc, params, ids, mask


def test_fp8_cast_skips_embeddings():
    enc, params, ids, mask = _tiny_te()
    q = cast_te_params_fp8(params)
    flat = traverse_util.flatten_dict(q)
    n_fp8 = n_kept = 0
    for k, v in flat.items():
        path = "/".join(str(p) for p in k)
        if v.dtype == jnp.float8_e4m3fn:
            n_fp8 += 1
            assert v.ndim == 2
            assert "embedding" not in path, path
        elif hasattr(v, "ndim") and v.ndim == 2:
            n_kept += 1
            assert any(s in path for s in
                       ("embedding", "scale", "norm")), path
    assert n_fp8 > 0 and n_kept > 0


def test_fp8_te_output_close():
    enc, params, ids, mask = _tiny_te()
    ref = enc.apply(params, ids, mask)
    out = enc.apply(cast_te_params_fp8(params), ids, mask)
    # fp8-e4m3 weight storage: ~2^-3 relative mantissa error per weight
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
    assert err / scale < 0.25, (err, scale)
    assert np.isfinite(np.asarray(out, np.float32)).all()
