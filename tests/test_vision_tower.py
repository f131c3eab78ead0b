"""Qwen2.5-VL vision tower parity vs the torch reference implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from diffusion_pipe_tpu.models.vision_encoders import (
    QwenVLVisionConfig,
    QwenVLVisionTower,
    convert_hf_qwen_vision,
)

torch = pytest.importorskip("torch")


def _run_parity(grid, fullatt, window_size):
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLVisionConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel,
    )

    vc = Qwen2_5_VLVisionConfig(
        depth=4, hidden_size=32, intermediate_size=64, num_heads=4,
        patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
        window_size=window_size, out_hidden_size=48,
        fullatt_block_indexes=list(fullatt),
    )
    torch.manual_seed(0)
    m = Qwen2_5_VisionTransformerPretrainedModel(vc).eval().float()
    seq = sum(t * h * w for t, h, w in grid)
    pixels = torch.randn(seq, 3 * 2 * 14 * 14)
    with torch.no_grad():
        ref = m(pixels, grid_thw=torch.tensor(grid)).numpy()

    cfg = QwenVLVisionConfig(
        depth=4, hidden_size=32, intermediate_size=64, num_heads=4,
        window_size=window_size, out_hidden_size=48,
        fullatt_block_indexes=tuple(fullatt),
    )
    tower = QwenVLVisionTower(cfg, tuple(tuple(g) for g in grid))
    params = convert_hf_qwen_vision(dict(m.state_dict()), cfg, prefix="")
    ours = tower.apply(params, jnp.asarray(pixels.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4, rtol=1e-3)


def test_vision_tower_parity_full_attention():
    # window covers the whole 4x4 grid -> all-full attention path
    _run_parity([(1, 4, 4)], fullatt=[1, 3], window_size=112)


def test_vision_tower_parity_windowed():
    # 8x8 grid with 2x2 (merged) windows exercises the reorder path
    _run_parity([(1, 8, 8)], fullatt=[3], window_size=56)


def test_qwen_vl_end_to_end_parity():
    """Full VL encode (vision tower -> embed splice -> mrope text model)
    vs torch Qwen2_5_VLModel."""
    import jax.numpy as jnp_
    from transformers import Qwen2_5_VLConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLModel,
    )

    from diffusion_pipe_tpu.models.llm_encoders import (
        CausalLM,
        CausalLMConfig,
        convert_hf_causal_lm,
    )
    from diffusion_pipe_tpu.models.vision_encoders import qwen_vl_rope_index

    IMG = 151655
    cfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=151700, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rope_theta=1e6,
            rope_scaling={"type": "mrope", "mrope_section": [2, 1, 1]},
        ),
        vision_config=dict(
            depth=2, hidden_size=16, intermediate_size=32, num_heads=2,
            patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
            window_size=112, out_hidden_size=32, fullatt_block_indexes=[1],
        ),
        image_token_id=IMG, attn_implementation="eager",
    )
    torch.manual_seed(7)
    m = Qwen2_5_VLModel(cfg).eval().float()

    grid = (1, 4, 4)  # 16 patches -> 4 merged image tokens
    pixels = torch.randn(16, 3 * 2 * 14 * 14)
    VSTART, VEND = 151652, 151653
    ids = torch.tensor([[5, 9, VSTART, IMG, IMG, IMG, IMG, VEND, 11, 3]])
    with torch.no_grad():
        ref = m(
            input_ids=ids, pixel_values=pixels,
            image_grid_thw=torch.tensor([list(grid)]),
        ).last_hidden_state.numpy()

    sd = dict(m.state_dict())
    vcfg = QwenVLVisionConfig(
        depth=2, hidden_size=16, intermediate_size=32, num_heads=2,
        window_size=112, out_hidden_size=32, fullatt_block_indexes=(1,),
    )
    tower = QwenVLVisionTower(vcfg, (grid,))
    vparams = convert_hf_qwen_vision(sd, vcfg, prefix="visual.")
    vis = tower.apply(vparams, jnp_.asarray(pixels.numpy()))

    tcfg = CausalLMConfig.from_hf_config(cfg.to_dict(), dtype=jnp_.float32)
    tparams = convert_hf_causal_lm(sd, tcfg, prefix="language_model.")
    lm = CausalLM(tcfg)
    ids_np = ids.numpy()[0]
    embeds = jnp_.asarray(
        np.asarray(tparams["params"]["token_embedding"]["embedding"])
        [ids_np][None]
    )
    img_pos = np.nonzero(ids_np == IMG)[0]
    embeds = embeds.at[0, img_pos].set(vis)
    pos = qwen_vl_rope_index(ids_np, IMG, grid, merge=2)
    ours, _ = lm.apply(
        tparams, None, input_embeds=embeds,
        position_ids=jnp_.asarray(pos)[None],
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4, rtol=1e-3)
