"""LTX VAE + Cosmos tokenizer: shape math and round-trip structure."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_pipe_tpu.models.cosmos_tokenizer import (
    CosmosTokenizerConfig,
    CosmosVideoTokenizer,
)
from diffusion_pipe_tpu.models.ltx_vae import LTXVAEConfig, LTXVideoVAE


def test_ltx_vae_shapes():
    cfg = LTXVAEConfig.tiny()  # patch 2, 3 strided stages -> 16x spatial, 8x t
    vae = LTXVideoVAE(cfg)
    px = jnp.zeros((1, 3, 9, 32, 32))
    params = vae.init(jax.random.PRNGKey(0), px)
    z = vae.apply(params, px, method=LTXVideoVAE.encode)
    # temporal: (9-1)/8 + 1 = 2; spatial: 32 / (2*8) = 2
    assert z.shape == (1, cfg.latent_channels, 2, 2, 2), z.shape
    out = vae.apply(params, z, method=LTXVideoVAE.decode)
    assert out.shape == (1, 3, 9, 32, 32), out.shape


def test_ltx_latent_stats_applied():
    cfg = LTXVAEConfig.tiny()
    vae = LTXVideoVAE(cfg)
    px = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 1, 16, 16)) * 0.2
    params = jax.tree.map(lambda x: x, vae.init(jax.random.PRNGKey(0), px))
    z0 = vae.apply(params, px, method=LTXVideoVAE.encode)
    # shifting latents_mean must shift the normalized latents
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params["params"])
    flat[("latents_mean",)] = flat[("latents_mean",)] + 1.0
    params2 = {"params": traverse_util.unflatten_dict(flat)}
    z1 = vae.apply(params2, px, method=LTXVideoVAE.encode)
    np.testing.assert_allclose(np.asarray(z0 - z1), 1.0, atol=1e-5)


def test_cosmos_tokenizer_shapes():
    cfg = CosmosTokenizerConfig.tiny()
    tok = CosmosVideoTokenizer(cfg)
    px = jnp.zeros((1, 3, 9, 32, 32))
    params = tok.init(jax.random.PRNGKey(0), px)
    z = tok.apply(params, px, method=CosmosVideoTokenizer.encode)
    # continuous: latent directly; temporal (9-1)/8+1=2, spatial 32/8=4
    assert z.shape == (1, cfg.latent_channels, 2, 4, 4), z.shape
    out = tok.apply(params, z, method=CosmosVideoTokenizer.decode)
    assert out.shape == (1, 3, 9, 32, 32), out.shape
