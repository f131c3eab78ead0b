"""CausalLM encoder parity vs torch transformers reference implementations.

Each family is instantiated tiny with random weights in torch, the state
dict is converted with convert_hf_causal_lm, and hidden states must match
to float32 tolerance. This pins down the arch flags (GQA, qk-norm, Gemma
sandwich norms / (1+w) scale / soft-capping, sliding-window patterns, dual
RoPE bases) that the reference gets from transformers' own modeling code.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from diffusion_pipe_tpu.models.llm_encoders import (
    CausalLM,
    CausalLMConfig,
    convert_hf_causal_lm,
)

torch = pytest.importorskip("torch")
import transformers  # noqa: E402


def _compare(hf_model, hf_cfg_dict, ids_np, atol=2e-4, collect=False,
             prefix="model."):
    hf_model = hf_model.eval().float()
    with torch.no_grad():
        out = hf_model(
            torch.from_numpy(ids_np), output_hidden_states=True
        )
    cfg = CausalLMConfig.from_hf_config(hf_cfg_dict, dtype=jnp.float32)
    params = convert_hf_causal_lm(
        {k: v for k, v in hf_model.state_dict().items()}, cfg, prefix=prefix
    )
    model = CausalLM(cfg)
    ours, hiddens = model.apply(params, jnp.asarray(ids_np),
                                collect_hidden=collect)
    theirs = out.last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=atol, rtol=1e-3)
    if collect:
        for i, h in enumerate(hiddens):
            np.testing.assert_allclose(
                np.asarray(h), out.hidden_states[i].numpy(),
                atol=atol, rtol=1e-3, err_msg=f"hidden {i}",
            )


IDS = np.array([[3, 17, 94, 7, 201, 5, 12, 99, 42, 1]], dtype=np.int64)


def test_llama_parity():
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=500000.0,
    )
    torch.manual_seed(0)
    m = transformers.LlamaModel(cfg)
    _compare(m, cfg.to_dict(), IDS, collect=True, prefix="")


def test_qwen2_parity():
    cfg = transformers.Qwen2Config(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=1e6,
    )
    torch.manual_seed(1)
    m = transformers.Qwen2Model(cfg)
    _compare(m, cfg.to_dict(), IDS, prefix="")


def test_qwen3_parity():
    cfg = transformers.Qwen3Config(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, rope_theta=1e6,
    )
    torch.manual_seed(2)
    m = transformers.Qwen3Model(cfg)
    _compare(m, cfg.to_dict(), IDS, prefix="")


def test_mistral_sliding_parity():
    cfg = transformers.MistralConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        sliding_window=4, attn_implementation="eager",
    )
    torch.manual_seed(3)
    m = transformers.MistralModel(cfg, )
    _compare(m, cfg.to_dict(), IDS, prefix="")


def test_gemma2_parity():
    cfg = transformers.Gemma2Config(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, sliding_window=4, attn_logit_softcapping=50.0,
        query_pre_attn_scalar=8, attn_implementation="eager",
    )
    torch.manual_seed(4)
    m = transformers.Gemma2Model(cfg)
    _compare(m, cfg.to_dict(), IDS, prefix="")


def test_gemma3_parity():
    cfg = transformers.Gemma3TextConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, sliding_window=4, sliding_window_pattern=3,
        query_pre_attn_scalar=8, rope_theta=1e6, rope_local_base_freq=1e4,
        attn_implementation="eager",
    )
    torch.manual_seed(5)
    m = transformers.Gemma3TextModel(cfg)
    _compare(m, cfg.to_dict(), IDS, prefix="")


def test_attention_mask_blocks_padding():
    cfg = CausalLMConfig.tiny()
    model = CausalLM(cfg)
    import jax

    ids = jnp.asarray(IDS)
    params = model.init(jax.random.PRNGKey(0), ids)
    mask = jnp.ones_like(ids)
    full, _ = model.apply(params, ids, mask)
    # changing a padded-out token must not change unmasked positions
    mask2 = mask.at[:, -2:].set(0)
    out_a, _ = model.apply(params, ids, mask2)
    ids_b = ids.at[:, -1].set(7)
    out_b, _ = model.apply(params, ids_b, mask2)
    np.testing.assert_allclose(
        np.asarray(out_a[:, :-2]), np.asarray(out_b[:, :-2]), atol=1e-6
    )


def test_qwen25vl_mrope_parity():
    """Multimodal rope + inputs_embeds path vs torch Qwen2_5_VLTextModel."""
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLTextConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLTextModel,
    )

    cfg = Qwen2_5_VLTextConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=1e6, rope_scaling={"type": "mrope",
                                      "mrope_section": [2, 1, 1]},
        attn_implementation="eager",
    )
    torch.manual_seed(6)
    m = Qwen2_5_VLTextModel(cfg).eval().float()
    B, S = 1, 10
    embeds = torch.randn(B, S, 32)
    # multimodal-style position ids: text 0..3 then a 2x3 "image" block
    pos = torch.zeros(3, B, S, dtype=torch.long)
    pos[:, 0, :4] = torch.arange(4)
    pos[0, 0, 4:] = 4
    pos[1, 0, 4:] = torch.tensor([4, 4, 4, 5, 5, 5])
    pos[2, 0, 4:] = torch.tensor([4, 5, 6, 4, 5, 6])
    with torch.no_grad():
        ref = m(inputs_embeds=embeds, position_ids=pos).last_hidden_state

    our_cfg = CausalLMConfig.from_hf_config(cfg.to_dict(), dtype=jnp.float32)
    assert our_cfg.mrope_section == (2, 1, 1)
    params = convert_hf_causal_lm(dict(m.state_dict()), our_cfg, prefix="")
    model = CausalLM(our_cfg)
    ours, _ = model.apply(
        params, None,
        input_embeds=jnp.asarray(embeds.numpy()),
        position_ids=jnp.asarray(pos.numpy().transpose(1, 0, 2)),
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy(), atol=3e-4, rtol=1e-3
    )
