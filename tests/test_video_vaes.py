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
    cfg = CosmosTokenizerConfig.tiny()  # patch 2 + one 2x hybrid stage
    tok = CosmosVideoTokenizer(cfg)
    px = jnp.zeros((1, 3, 9, 32, 32))
    params = tok.init(jax.random.PRNGKey(0), px)
    z = tok.apply(params, px, method=CosmosVideoTokenizer.encode)
    # continuous: latent directly; temporal (9-1)/4+1=3, spatial 32/4=8
    assert z.shape == (1, cfg.embedding_dim, 3, 8, 8), z.shape
    out = tok.apply(params, z, method=CosmosVideoTokenizer.decode)
    assert out.shape == (1, 3, 9, 32, 32), out.shape


def test_cosmos_haar_patcher_roundtrip():
    """The causal 3D haar patchifier must be exactly invertible (orthonormal
    wavelets; the replicated first frame drops out in the inverse)."""
    from diffusion_pipe_tpu.models.cosmos_tokenizer import (
        haar_patch_3d,
        haar_unpatch_3d,
    )

    for patch in (2, 4):
        x = jax.random.normal(jax.random.PRNGKey(0),
                              (2, 1 + 2 * patch, 8, 8, 3))
        y = haar_patch_3d(x, patch)
        assert y.shape == (2, (1 + 2 * patch + (patch - 1)) // patch,
                           8 // patch, 8 // patch, 3 * patch ** 3), y.shape
        back = haar_unpatch_3d(y, patch)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                                   atol=1e-5)


def test_cosmos_latent_stats_applied():
    """encode = ((z - mean) / std) * sigma_data with per-(channel, frame)
    stats viewed [C, chunk][:, :t] (reference cosmos.py:67-75)."""
    from flax import traverse_util

    cfg = CosmosTokenizerConfig.tiny()
    tok = CosmosVideoTokenizer(cfg)
    px = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 5, 16, 16)) * 0.2
    params = tok.init(jax.random.PRNGKey(0), px)
    z0 = tok.apply(params, px, method=CosmosVideoTokenizer.encode)
    flat = traverse_util.flatten_dict(params["params"])
    flat[("latent_mean",)] = flat[("latent_mean",)] + 1.0
    params2 = {"params": traverse_util.unflatten_dict(flat)}
    z1 = tok.apply(params2, px, method=CosmosVideoTokenizer.encode)
    np.testing.assert_allclose(np.asarray(z0 - z1), cfg.sigma_data,
                               atol=1e-5)


def _cosmos_synthetic_sd(rng):
    """Synthetic checkpoint in the NVIDIA CausalContinuousVideoTokenizer
    key grammar (encoder.down.N.block.M.conv1.{0,1}.conv3d.*, hybrid
    downsample conv1/conv2/conv3, mid.attn_1.{0,1} spatial/temporal pair,
    quant_conv, latent_mean/std) at tiny dims: channels 8, mult (1, 2),
    1 res block, patch 2, z 4, embedding_dim 4."""
    ch, z, emb, chunk = 8, 4, 4, 16
    widths = [8, 16]

    def w(o, i, kt, kh, kw):
        return rng.standard_normal((o, i, kt, kh, kw)).astype(np.float32) \
            * 0.05

    sd = {}

    def conv(prefix, o, i, k3):
        sd[f"{prefix}.conv3d.weight"] = w(o, i, *k3)
        sd[f"{prefix}.conv3d.bias"] = np.zeros((o,), np.float32)

    def fconv(prefix, o, i):
        conv(f"{prefix}.0", o, i, (1, 3, 3))
        conv(f"{prefix}.1", o, o, (3, 1, 1))

    def norm(prefix, c):
        sd[f"{prefix}.norm.weight"] = np.ones((c,), np.float32)
        sd[f"{prefix}.norm.bias"] = np.zeros((c,), np.float32)

    def resnet(prefix, i, o):
        norm(f"{prefix}.norm1", i)
        fconv(f"{prefix}.conv1", o, i)
        norm(f"{prefix}.norm2", o)
        fconv(f"{prefix}.conv2", o, o)
        if i != o:
            conv(f"{prefix}.nin_shortcut", o, i, (1, 1, 1))

    def attnblock(prefix, c):
        norm(f"{prefix}.norm", c)
        for nm in ("q", "k", "v", "proj_out"):
            conv(f"{prefix}.{nm}", c, c, (1, 1, 1))

    fconv("encoder.conv_in", ch, 3 * 2 ** 3)
    prev = ch
    for i, width in enumerate(widths):
        resnet(f"encoder.down.{i}.block.0", prev, width)
        prev = width
        if i == 0:
            base = f"encoder.down.{i}.downsample"
            conv(f"{base}.conv1", width, width, (1, 3, 3))
            conv(f"{base}.conv2", width, width, (3, 1, 1))
            conv(f"{base}.conv3", width, width, (1, 1, 1))
    resnet("encoder.mid.block_1", prev, prev)
    attnblock("encoder.mid.attn_1.0", prev)
    attnblock("encoder.mid.attn_1.1", prev)
    resnet("encoder.mid.block_2", prev, prev)
    norm("encoder.norm_out", prev)
    fconv("encoder.conv_out", z, prev)
    conv("quant_conv", emb, z, (1, 1, 1))
    conv("post_quant_conv", z, emb, (1, 1, 1))
    # decoder mirror (up levels keep NVIDIA indices; upsample at up.1
    # inverts the encoder's level-0 downsample; its convs are written
    # with SWAPPED names to exercise the kernel-shape role discovery)
    fconv("decoder.conv_in", widths[-1], emb)
    resnet("decoder.mid.block_1", widths[-1], widths[-1])
    attnblock("decoder.mid.attn_1.0", widths[-1])
    attnblock("decoder.mid.attn_1.1", widths[-1])
    resnet("decoder.mid.block_2", widths[-1], widths[-1])
    resnet("decoder.up.1.block.0", widths[-1], widths[-1])
    resnet("decoder.up.1.block.1", widths[-1], widths[-1])
    conv("decoder.up.1.upsample.conv1", widths[-1], widths[-1], (3, 1, 1))
    conv("decoder.up.1.upsample.conv2", widths[-1], widths[-1], (1, 3, 3))
    conv("decoder.up.1.upsample.conv3", widths[-1], widths[-1], (1, 1, 1))
    resnet("decoder.up.0.block.0", widths[-1], widths[0])
    resnet("decoder.up.0.block.1", widths[0], widths[0])
    norm("decoder.norm_out", widths[0])
    fconv("decoder.conv_out", 3 * 2 ** 3, widths[0])
    sd["latent_mean"] = np.zeros((emb * chunk,), np.float32)
    sd["latent_std"] = np.ones((emb * chunk,), np.float32)
    return sd


def test_cosmos_tokenizer_converter():
    """Topology discovery + full key consumption on the NVIDIA grammar,
    and the converted params drive encode at the discovered config."""
    from diffusion_pipe_tpu.models.cosmos_tokenizer import (
        convert_cosmos_tokenizer,
    )

    sd = _cosmos_synthetic_sd(np.random.default_rng(0))

    # the converter raises on any encoder key it did not consume, so a
    # clean return certifies full consumption (see its leftover check)
    cfg, params = convert_cosmos_tokenizer(sd)
    assert cfg.patch_size == 2 and cfg.channels == 8
    assert cfg.channels_mult == (1, 2) and cfg.num_res_blocks == 1
    assert cfg.downsample_flags == ((True, True),)
    assert cfg.embedding_dim == 4 and cfg.z_channels == 4
    assert cfg.attn_levels == ()

    tok = CosmosVideoTokenizer(cfg)
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 5, 16, 16)) * 0.1
    z = tok.apply(params, px, method=CosmosVideoTokenizer.encode)
    assert z.shape == (1, 4, 2, 4, 4), z.shape
    assert np.isfinite(np.asarray(z)).all()
    out = tok.apply(params, z, method=CosmosVideoTokenizer.decode)
    assert out.shape == (1, 3, 5, 16, 16), out.shape
    assert np.isfinite(np.asarray(out)).all()


def test_cosmos_tokenizer_converter_rejects_unknown():
    from diffusion_pipe_tpu.models.cosmos_tokenizer import (
        convert_cosmos_tokenizer,
    )

    sd = _cosmos_synthetic_sd(np.random.default_rng(0))
    sd["encoder.mystery_block.weight"] = np.zeros((2, 2), np.float32)
    try:
        convert_cosmos_tokenizer(sd)
    except ValueError as e:
        assert "unconverted" in str(e)
    else:
        raise AssertionError("unknown key did not raise")
