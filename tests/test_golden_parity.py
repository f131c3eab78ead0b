"""Numerical parity vs the reference's own torch modules (no downloads):
instantiate the reference implementation with random seeded weights,
transfer them through OUR converters, and compare outputs — the golden-file
strategy VERDICT #7 prescribes (reference's own VAE-round-trip tools,
tools/wan_vae_test.py:1-72, are the manual analogue).

The reference is imported READ-ONLY from /root/reference; only numbers
cross into assertions.
"""

import sys

import numpy as np
import pytest

REF = "/root/reference"


def _ref_path():
    if REF not in sys.path:
        sys.path.insert(0, REF)


def _small_wan_vae():
    import torch

    _ref_path()
    from models.wan.vae2_1 import WanVAE_

    torch.manual_seed(0)
    ref = WanVAE_(dim=32, z_dim=16, dim_mult=[1, 2, 4], num_res_blocks=1,
                  attn_scales=[], temperal_downsample=[True, False],
                  dropout=0.0)
    ref.eval()
    return ref


@pytest.fixture(scope="module")
def wan_vae_pair():
    import jax
    import jax.numpy as jnp  # noqa: F401

    from diffusion_pipe_tpu.models.wan_vae import WanVAEConfig, WanVideoVAE
    from diffusion_pipe_tpu.models.wan_vae_convert import convert_wan_vae

    ref = _small_wan_vae()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = WanVAEConfig(dim=32, z_dim=16, dim_mult=(1, 2, 4),
                       num_res_blocks=1, attn_scales=(),
                       temperal_downsample=(True, False))
    params = convert_wan_vae(sd, cfg)
    return ref, WanVideoVAE(cfg), params


def _wan_scale():
    import torch

    from diffusion_pipe_tpu.models.wan_vae import (
        WAN21_LATENT_MEAN,
        WAN21_LATENT_STD,
    )

    mean = torch.tensor(WAN21_LATENT_MEAN).view(1, 16, 1, 1, 1)
    std = torch.tensor(WAN21_LATENT_STD).view(1, 16, 1, 1, 1)
    return [mean, 1.0 / std]


def test_wan21_vae_encode_matches_reference(wan_vae_pair):
    import jax.numpy as jnp
    import torch

    ref, vae, params = wan_vae_pair
    x = np.random.default_rng(0).standard_normal(
        (1, 3, 5, 32, 32)).astype(np.float32)
    with torch.no_grad():
        z_ref = ref.encode(torch.from_numpy(x), _wan_scale())
    z_ref = np.asarray(z_ref)
    z_ours = np.asarray(
        vae.apply(params, jnp.asarray(x), method=type(vae).encode)
    )
    assert z_ref.shape == z_ours.shape
    np.testing.assert_allclose(z_ours, z_ref, atol=2e-5)


def test_wan21_vae_decode_matches_reference(wan_vae_pair):
    import jax.numpy as jnp
    import torch

    ref, vae, params = wan_vae_pair
    z = (np.random.default_rng(1).standard_normal(
        (1, 16, 3, 8, 8)) * 0.5).astype(np.float32)
    with torch.no_grad():
        x_ref = ref.decode(torch.from_numpy(z), _wan_scale())
    # our decode clamps to [-1, 1] (the reference pipeline clamps at its
    # use sites); clamp the raw reference output for comparison
    x_ref = np.clip(np.asarray(x_ref), -1.0, 1.0)
    x_ours = np.asarray(
        vae.apply(params, jnp.asarray(z), method=type(vae).decode)
    )
    assert x_ref.shape == x_ours.shape
    np.testing.assert_allclose(x_ours, x_ref, atol=2e-4)


def _stub_modules():
    """Stub ftfy (tokenizer-only) and the diffusers mixins so the reference
    t5.py / model.py import on CPU without their pip deps."""
    import importlib.machinery
    import types

    if "ftfy" not in sys.modules:
        ftfy = types.ModuleType("ftfy")
        ftfy.__spec__ = importlib.machinery.ModuleSpec("ftfy", None)
        ftfy.fix_text = lambda s: s
        sys.modules["ftfy"] = ftfy
    if "diffusers" not in sys.modules:
        import torch

        diff = types.ModuleType("diffusers")
        cu = types.ModuleType("diffusers.configuration_utils")

        class ConfigMixin:
            pass

        def register_to_config(fn=None, **kw):
            if fn is None:
                return lambda f: f
            return fn

        cu.ConfigMixin = ConfigMixin
        cu.register_to_config = register_to_config
        mu = types.ModuleType("diffusers.models.modeling_utils")

        class ModelMixin(torch.nn.Module):
            pass

        mu.ModelMixin = ModelMixin
        mm = types.ModuleType("diffusers.models")
        mm.modeling_utils = mu
        diff.configuration_utils = cu
        diff.models = mm
        for name, m in [("diffusers", diff),
                        ("diffusers.configuration_utils", cu),
                        ("diffusers.models", mm),
                        ("diffusers.models.modeling_utils", mu)]:
            # A real ModuleSpec so later find_spec("diffusers") probes
            # (transformers availability checks) don't ValueError.
            m.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = m


def _sdpa_flash(q, k, v, q_lens=None, k_lens=None, **kw):
    """CPU stand-in for the reference's flash_attention wrapper: SDPA with
    the same k_lens key-padding mask semantics (attention.py:19-127)."""
    import torch

    mask = None
    if k_lens is not None:
        idx = torch.arange(k.shape[1])[None, :]
        mask = (idx < k_lens[:, None])[:, None, None, :]
    out = torch.nn.functional.scaled_dot_product_attention(
        q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
        attn_mask=mask,
    )
    return out.transpose(1, 2)


def test_wan_dit_forward_matches_reference():
    """One full Wan DiT forward (patch embed -> blocks -> head ->
    unpatchify, composed exactly as the reference wan.py layer wrappers
    drive model.py) vs our WanTransformer with converted weights."""
    import torch

    _ref_path()
    _stub_modules()
    import models.wan.model as ref_model_mod
    from models.wan.model import WanModel, sinusoidal_embedding_1d

    ref_model_mod.flash_attention = _sdpa_flash

    torch.manual_seed(0)
    m = WanModel(model_type="t2v", patch_size=(1, 2, 2), text_len=16,
                 in_dim=16, dim=64, ffn_dim=128, freq_dim=32, text_dim=32,
                 out_dim=16, num_heads=4, num_layers=2)
    m.eval()
    m = m.float()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}

    import jax
    import jax.numpy as jnp

    from diffusion_pipe_tpu.models.wan import convert_wan_weights
    from diffusion_pipe_tpu.models.wan_model import WanConfig, WanTransformer

    cfg = WanConfig.tiny()  # dim=64 ffn=128 heads=4 layers=2 freq=32
    assert cfg.dim == 64 and cfg.num_layers == 2 and cfg.text_len == 16
    params = convert_wan_weights(sd, cfg)
    ours = WanTransformer(cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, 1, 8, 8)).astype(np.float32)
    ctx = np.zeros((1, 16, 32), np.float32)
    ctx[:, :5] = rng.standard_normal((1, 5, 32)).astype(np.float32)
    t_val = 500.0

    with torch.no_grad():
        xt = torch.from_numpy(x)
        e = m.time_embedding(
            sinusoidal_embedding_1d(m.freq_dim,
                                    torch.tensor([t_val])).float())
        # blocks/head broadcast e over the token dim: [B, 1, 6, C]
        e0 = m.time_projection(e).unflatten(1, (6, m.dim)).unsqueeze(1)
        context = m.text_embedding(torch.from_numpy(ctx))
        h = m.patch_embedding(xt)
        grid_sizes = torch.tensor([list(h.shape[2:])], dtype=torch.long)
        h = h.flatten(2).transpose(1, 2)
        seq_lens = torch.tensor([h.shape[1]], dtype=torch.long)
        for block in m.blocks:
            h = block(h, e=e0, seq_lens=seq_lens, grid_sizes=grid_sizes,
                      freqs=m.freqs, context=context, context_lens=None)
        h = m.head(h, e.unsqueeze(1))
        out_ref = m.unpatchify(h, grid_sizes)[0].numpy()[None]

    out_ours = np.asarray(ours.apply(
        jax.tree_util.tree_map(np.asarray, params),
        jnp.asarray(x), jnp.asarray([t_val]), jnp.asarray(ctx), None,
    ))
    assert out_ref.shape == out_ours.shape
    np.testing.assert_allclose(out_ours, out_ref, atol=5e-4)


def test_umt5_encoder_matches_reference():
    """Reference vendored UMT5 encoder (models/wan/t5.py, per-block relative
    position bias) vs our UMT5Encoder with converted weights."""
    import torch

    _ref_path()
    _stub_modules()
    if not torch.cuda.is_available():
        # t5.py evaluates torch.cuda.current_device() in a class-body
        # default arg (t5.py:547); neutralize for CPU import
        torch.cuda.current_device = lambda: "cpu"
    from models.wan.t5 import T5Encoder

    torch.manual_seed(0)
    ref = T5Encoder(vocab=64, dim=32, dim_attn=32, dim_ffn=64, num_heads=4,
                    num_layers=2, num_buckets=8, shared_pos=False,
                    dropout=0.0)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    # reference t5.py module names -> the HF dialect our converter expects
    hf = {
        "shared.weight": sd["token_embedding.weight"],
        "encoder.final_layer_norm.weight": sd["norm.weight"],
    }
    for i in range(2):
        b = f"blocks.{i}"
        o = f"encoder.block.{i}"
        hf[f"{o}.layer.0.layer_norm.weight"] = sd[f"{b}.norm1.weight"]
        for n in "qkvo":
            hf[f"{o}.layer.0.SelfAttention.{n}.weight"] = (
                sd[f"{b}.attn.{n}.weight"])
        hf[f"{o}.layer.0.SelfAttention.relative_attention_bias.weight"] = (
            sd[f"{b}.pos_embedding.embedding.weight"])
        hf[f"{o}.layer.1.layer_norm.weight"] = sd[f"{b}.norm2.weight"]
        hf[f"{o}.layer.1.DenseReluDense.wi_0.weight"] = (
            sd[f"{b}.ffn.gate.0.weight"])
        hf[f"{o}.layer.1.DenseReluDense.wi_1.weight"] = (
            sd[f"{b}.ffn.fc1.weight"])
        hf[f"{o}.layer.1.DenseReluDense.wo.weight"] = (
            sd[f"{b}.ffn.fc2.weight"])

    import jax.numpy as jnp

    from diffusion_pipe_tpu.models.umt5 import (
        UMT5Config,
        UMT5Encoder,
        convert_umt5_comfy,
    )

    cfg = UMT5Config(vocab=64, dim=32, dim_attn=32, dim_ffn=64, num_heads=4,
                     num_layers=2, num_buckets=8, dtype=jnp.float32,
                     param_dtype=jnp.float32)
    params = convert_umt5_comfy(hf, cfg)
    enc = UMT5Encoder(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 64, (2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.int32)
    mask[0, 7:] = 0
    ids[0, 7:] = 0

    with torch.no_grad():
        out_ref = ref(torch.from_numpy(ids).long(),
                      torch.from_numpy(mask).long()).numpy()
    out_ours = np.asarray(
        enc.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    )
    assert out_ref.shape == out_ours.shape
    # compare only valid tokens (padding rows differ by design)
    m = mask[..., None].astype(bool)
    np.testing.assert_allclose(
        np.where(m, out_ours, 0), np.where(m, out_ref, 0), atol=2e-4
    )


def test_wan22_vae_parity():
    """Wan2.2 (ti2v) patchified VAE with macro-residual stages
    (vae2_2.py): encode AND decode parity vs the reference torch module."""
    import torch

    _ref_path()
    from models.wan.vae2_2 import WanVAE_ as WanVAE22Ref

    import jax.numpy as jnp

    from diffusion_pipe_tpu.models.wan_vae22 import (
        Wan22VAEConfig,
        WanVideoVAE22,
        convert_wan22_vae,
    )

    torch.manual_seed(0)
    ref = WanVAE22Ref(dim=16, dec_dim=24, z_dim=8, dim_mult=[1, 2, 2],
                      num_res_blocks=1, attn_scales=[],
                      temperal_downsample=[False, True], dropout=0.0)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = Wan22VAEConfig(dim=16, dec_dim=24, z_dim=8, dim_mult=(1, 2, 2),
                         num_res_blocks=1,
                         temperal_downsample=(False, True))
    params = convert_wan22_vae(sd, cfg)
    vae = WanVideoVAE22(cfg)

    x = np.random.default_rng(0).standard_normal(
        (1, 3, 5, 32, 32)).astype(np.float32)
    with torch.no_grad():
        z_ref = ref.encode(torch.from_numpy(x), [0.0, 1.0]).numpy()
    z_ours = np.asarray(
        vae.apply(params, jnp.asarray(x), method=WanVideoVAE22.encode)
    )
    assert z_ref.shape == z_ours.shape, (z_ref.shape, z_ours.shape)
    np.testing.assert_allclose(z_ours, z_ref, atol=5e-5)

    z = (np.random.default_rng(1).standard_normal(z_ref.shape) * 0.5
         ).astype(np.float32)
    with torch.no_grad():
        x_ref = ref.decode(torch.from_numpy(z), [0.0, 1.0]).numpy()
    x_ref = np.clip(x_ref, -1.0, 1.0)
    x_ours = np.asarray(
        vae.apply(params, jnp.asarray(z), method=WanVideoVAE22.decode)
    )
    assert x_ref.shape == x_ours.shape, (x_ref.shape, x_ours.shape)
    np.testing.assert_allclose(x_ours, x_ref, atol=5e-4)


def _cosmos_keymap():
    from diffusion_pipe_tpu.models.cosmos_predict2 import (
        cosmos_predict2_keymap,
    )

    return cosmos_predict2_keymap()


def _stub_torchvision():
    """torchvision is not installed; the reference modules only touch
    transforms.functional.resize / InterpolationMode, stub those."""
    import types
    import importlib.machinery

    import torch

    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
    tr = types.ModuleType("torchvision.transforms")
    tr.__spec__ = importlib.machinery.ModuleSpec(
        "torchvision.transforms", None)

    class _F:
        @staticmethod
        def resize(img, size, **kw):
            if tuple(img.shape[-2:]) == tuple(size):
                return img
            return torch.nn.functional.interpolate(img, size=tuple(size))

    tr.functional = _F
    tr.InterpolationMode = type("IM", (), {"NEAREST": "nearest",
                                           "BICUBIC": "bicubic"})

    class _Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class _Normalize:
        def __init__(self, mean, std):
            self.mean, self.std = mean, std

        def __call__(self, x):
            mean = torch.tensor(self.mean).view(-1, 1, 1)
            std = torch.tensor(self.std).view(-1, 1, 1)
            return (x - mean) / std

    tr.Compose = _Compose
    tr.Normalize = _Normalize
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr


def test_cosmos_predict2_forward_matches_reference():
    """Full MiniTrainDIT forward (reference vendored
    models/cosmos_predict2_modeling.py) vs our CosmosPredict2Transformer
    with keymap-converted weights."""
    import torch

    _ref_path()
    _stub_torchvision()

    from models.cosmos_predict2_modeling import MiniTrainDIT

    torch.manual_seed(0)
    m = MiniTrainDIT(
        max_img_h=64, max_img_w=64, max_frames=8, in_channels=16,
        out_channels=16, patch_spatial=2, patch_temporal=1,
        concat_padding_mask=True, model_channels=64, num_blocks=2,
        num_heads=4, mlp_ratio=4.0, crossattn_emb_channels=32,
        pos_emb_cls="rope3d", pos_emb_learnable=False,
        pos_emb_interpolation="crop", min_fps=1, max_fps=30,
        use_adaln_lora=True, adaln_lora_dim=16,
        rope_h_extrapolation_ratio=1.0, rope_w_extrapolation_ratio=1.0,
        rope_t_extrapolation_ratio=1.0, extra_per_block_abs_pos_emb=False,
        rope_enable_fps_modulation=False,
    )
    m = m.float().eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}

    import jax.numpy as jnp

    from diffusion_pipe_tpu.models.cosmos_predict2_model import (
        CosmosPredict2Config,
        CosmosPredict2Transformer,
    )
    from diffusion_pipe_tpu.models.keymaps import keymap_to_flax

    cfg = CosmosPredict2Config.tiny()
    params = keymap_to_flax(sd, _cosmos_keymap(), cfg)
    ours = CosmosPredict2Transformer(cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, 2, 16, 16)).astype(np.float32)
    ctx = rng.standard_normal((1, 24, 32)).astype(np.float32)
    t = np.array([0.7], np.float32)
    pad = torch.zeros((1, 1, 16, 16))  # reference cosmos_predict2.py:556
    with torch.no_grad():
        out_ref = m(torch.from_numpy(x), torch.from_numpy(t),
                    torch.from_numpy(ctx), padding_mask=pad).numpy()
    out_ours = np.asarray(ours.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
    ))
    assert out_ref.shape == out_ours.shape
    np.testing.assert_allclose(out_ours, out_ref, atol=5e-4)


def test_wan_clip_vision_matches_reference():
    """Reference vendored XLM-Roberta-CLIP vision tower
    (models/wan/clip.py VisionTransformer, use_31_block=True — the i2v
    conditioning path, clip.py:521-535) vs our WanClipVision with
    converted weights. The reference forward takes already CLIP-normalized
    pixels; ours takes [-1,1] pixels and normalizes in-graph, so the torch
    side gets the normalization applied manually here."""
    import torch

    _ref_path()
    _stub_modules()
    _stub_torchvision()
    import models.wan.clip as ref_clip_mod
    from models.wan.clip import VisionTransformer

    ref_clip_mod.flash_attention = _sdpa_flash

    torch.manual_seed(0)
    m = VisionTransformer(
        image_size=28, patch_size=14, dim=32, mlp_ratio=4, out_dim=16,
        num_heads=4, num_layers=2, pool_type="token", pre_norm=True,
        post_norm=False, activation="gelu", norm_eps=1e-5,
    )
    m = m.float().eval()
    sd = {"visual." + k: v.detach().numpy() for k, v in m.state_dict().items()}

    import jax
    import jax.numpy as jnp

    from diffusion_pipe_tpu.models.wan_clip import (
        CLIP_MEAN,
        CLIP_STD,
        WanClipVision,
        WanClipVisionConfig,
        convert_wan_clip_visual,
    )

    cfg = WanClipVisionConfig.tiny()  # 28px/14 dim=32 heads=4 layers=2
    assert cfg.image_size == 28 and cfg.num_layers == 2
    params = convert_wan_clip_visual(sd, cfg)
    ours = WanClipVision(cfg)

    rng = np.random.default_rng(0)
    # pixels in [-1, 1] at the target size (resize is then identity on
    # both sides, so only the module math is compared)
    px = rng.uniform(-1.0, 1.0, (2, 3, 28, 28)).astype(np.float32)

    mean = np.asarray(CLIP_MEAN, np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(CLIP_STD, np.float32).reshape(1, 3, 1, 1)
    px_norm = (px * 0.5 + 0.5 - mean) / std
    with torch.no_grad():
        out_ref = m(torch.from_numpy(px_norm), use_31_block=True).numpy()

    out_ours = np.asarray(ours.apply(
        jax.tree_util.tree_map(np.asarray, params), jnp.asarray(px)
    ))
    assert out_ref.shape == out_ours.shape
    np.testing.assert_allclose(out_ours, out_ref, atol=2e-4)


def test_llm_adapter_matches_reference():
    """Anima's trainable LLMAdapter (reference models/llm_adapter.py, fully
    self-contained torch) vs our Flax port through convert_llm_adapter —
    the converter the llm_adapter_path load path uses. self_attn=True is
    the reference's hardcoded Anima construction
    (cosmos_predict2_modeling.py:1257-1263)."""
    import torch

    _ref_path()
    from models.llm_adapter import LLMAdapter as RefAdapter

    torch.manual_seed(3)
    ref = RefAdapter(source_dim=24, target_dim=40, model_dim=32,
                     num_layers=2, num_heads=4, self_attn=True)
    ref = ref.float().eval()

    import jax.numpy as jnp

    from diffusion_pipe_tpu.models.llm_adapter import (
        LLMAdapter,
        LLMAdapterConfig,
        convert_llm_adapter,
    )

    cfg = LLMAdapterConfig(source_dim=24, target_dim=40, model_dim=32,
                           num_layers=2, num_heads=4, vocab=32128,
                           self_attn=True)
    params = convert_llm_adapter(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})

    rng = np.random.default_rng(1)
    src = rng.standard_normal((2, 7, 24)).astype(np.float32)
    ids = rng.integers(0, 32128, (2, 5)).astype(np.int64)
    tmask = np.array([[1, 1, 1, 1, 0], [1, 1, 1, 0, 0]], np.int64)
    smask = np.array([[1] * 7, [1, 1, 1, 1, 1, 0, 0]], np.int64)

    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(src), torch.from_numpy(ids),
            target_attention_mask=torch.from_numpy(tmask),
            source_attention_mask=torch.from_numpy(smask),
        ).numpy()

    out_ours = np.asarray(LLMAdapter(cfg).apply(
        {"params": params}, jnp.asarray(src), jnp.asarray(ids, jnp.int32),
        target_mask=jnp.asarray(tmask), source_mask=jnp.asarray(smask),
    ))
    assert out_ref.shape == out_ours.shape
    np.testing.assert_allclose(out_ours, out_ref, atol=2e-4)
