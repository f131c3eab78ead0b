"""Flash-attention kernel correctness vs the XLA reference implementation.

Runs the real Pallas kernel code under the interpreter on CPU (conftest sets
DPIPE_PALLAS_INTERPRET=1); the same tests pass compiled on a real TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pipe_tpu.ops.attention import _xla_attention, dot_product_attention


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


@pytest.mark.parametrize("masked", [False, True])
def test_flash_forward_matches_xla(masked):
    B, S, H, D = 1, 256, 2, 128
    q, k, v = (_rand(i, (B, S, H, D)) for i in range(3))
    mask = None
    if masked:
        mask = (jax.random.uniform(jax.random.PRNGKey(9), (B, S)) > 0.3).astype(
            jnp.int32
        )
    out = dot_product_attention(q, k, v, mask, force_flash=True)
    ref = dot_product_attention(q, k, v, mask, force_flash=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_backward_matches_xla():
    B, S, H, D = 1, 256, 2, 128
    q, k, v = (_rand(i, (B, S, H, D)) for i in range(3))
    mask = (jax.random.uniform(jax.random.PRNGKey(9), (B, S)) > 0.3).astype(jnp.int32)

    def loss(ff):
        return lambda q, k, v: jnp.sum(
            dot_product_attention(q, k, v, mask, force_flash=ff) ** 2
        )

    g_flash = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss(False), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)


def test_unpadded_lengths_are_padded_and_masked():
    # Sq not a multiple of the lane count: dispatcher pads + masks internally.
    B, Sq, Skv, H, D = 1, 200, 392, 2, 128
    q = _rand(0, (B, Sq, H, D))
    k = _rand(1, (B, Skv, H, D))
    v = _rand(2, (B, Skv, H, D))
    out = dot_product_attention(q, k, v, force_flash=True)
    ref = _xla_attention(q, k, v, None, D**-0.5)
    assert out.shape == (B, Sq, H, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_ragged_tail_multi_block_fwd_bwd():
    """Skv spanning multiple kv blocks with a ragged last block: the
    in-kernel tail_len mask (fwd + dq + dkv) must match XLA, and padded-key
    grads must be produced only for real positions."""
    B, Sq, Skv, H, D = 1, 256, 300, 2, 128  # blocks (256, 128): tail 44
    q = _rand(0, (B, Sq, H, D)) * 0.5
    k = _rand(1, (B, Skv, H, D)) * 0.5
    v = _rand(2, (B, Skv, H, D))

    def loss(ff):
        return lambda q, k, v: jnp.sum(
            dot_product_attention(q, k, v, force_flash=ff) ** 2
        )

    out = dot_product_attention(q, k, v, force_flash=True)
    ref = _xla_attention(q, k, v, None, D**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    g_flash = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss(False), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)
