"""Checkpoint key-layout audit vs UPSTREAM public naming.

The keymap round-trip tests (test_keymaps.py) prove invertibility but are
self-referential: a systematically wrong key name would round-trip fine.
This test breaks that loop by hardcoding EXPECTED reference-layout key
names, written from the upstream models' published state-dict naming (the
very classes the reference loads into):

- sd3:        diffusers SD3Transformer2DModel
              (reference models/sd3.py:47 from_pretrained)
- qwen_image: diffusers QwenImageTransformer2DModel
              (reference models/qwen_image.py:247-269 manual key loop)
- chroma:     lodestone-rock Chroma (flow submodule; BFL flux dialect +
              distilled_guidance_layer Approximator;
              reference models/chroma.py:152-153 direct load_state_dict)
- lumina_2:   Alpha-VLLM Lumina-Image-2.0 NextDiT
              (reference models/lumina_2.py direct state-dict load)
- hidream:    HiDream-I1 HiDreamImageTransformer2DModel
              (reference models/hidream.py:105 from_pretrained)

A key listed here that the exporter does not emit = a checkpoint the
reference loads that we would mis-load. A key listed in `absent` is a
plausible near-miss (wrong-dialect name) that must NOT appear.
"""

import flax.linen as nn
import jax
import pytest

from diffusion_pipe_tpu.models import get_model_class
from diffusion_pipe_tpu.models.keymaps import keymap_from_flax


def _export(model_type):
    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": model_type, "dtype": "float32", "_tiny": True},
        "optimizer": {"type": "adamw", "lr": 1e-4},
    }
    pipe = get_model_class(model_type)(cfg)
    params = nn.unbox(pipe.init_params(jax.random.PRNGKey(0)))
    return pipe, keymap_from_flax(params, pipe.keymap(), pipe._keymap_config())


# Per-block templates are formatted with i=block index.
AUDIT = {
    "sd3": dict(
        n_attr=("sd3_config", "num_layers"),
        per_block=[
            "transformer_blocks.{i}.norm1.linear.weight",
            "transformer_blocks.{i}.norm1.linear.bias",
            "transformer_blocks.{i}.norm1_context.linear.weight",
            "transformer_blocks.{i}.attn.to_q.weight",
            "transformer_blocks.{i}.attn.to_k.bias",
            "transformer_blocks.{i}.attn.to_v.weight",
            "transformer_blocks.{i}.attn.add_q_proj.weight",
            "transformer_blocks.{i}.attn.add_k_proj.weight",
            "transformer_blocks.{i}.attn.add_v_proj.bias",
            "transformer_blocks.{i}.attn.to_out.0.weight",
            "transformer_blocks.{i}.ff.net.0.proj.weight",
            "transformer_blocks.{i}.ff.net.2.weight",
        ],
        # all but the context_pre_only final block
        per_inner_block=[
            "transformer_blocks.{i}.attn.to_add_out.weight",
            "transformer_blocks.{i}.ff_context.net.0.proj.weight",
            "transformer_blocks.{i}.ff_context.net.2.weight",
        ],
        top=[
            "pos_embed.proj.weight", "pos_embed.proj.bias",
            "time_text_embed.timestep_embedder.linear_1.weight",
            "time_text_embed.timestep_embedder.linear_2.weight",
            "time_text_embed.text_embedder.linear_1.weight",
            "time_text_embed.text_embedder.linear_2.bias",
            "context_embedder.weight", "context_embedder.bias",
            "norm_out.linear.weight", "proj_out.weight", "proj_out.bias",
        ],
        absent=[
            # BFL/ComfyUI dialect names that must not leak into the
            # diffusers-layout export
            "double_blocks.0.img_attn.qkv.weight",
            "joint_blocks.0.x_block.attn.qkv.weight",  # SD-format mmdit
            "x_embedder.proj.weight",
            "t_embedder.mlp.0.weight",
        ],
        # context_pre_only: the final block has no to_add_out / ff_context
        final_block_absent=[
            "transformer_blocks.{last}.attn.to_add_out.weight",
            "transformer_blocks.{last}.ff_context.net.0.proj.weight",
        ],
    ),
    "qwen_image": dict(
        n_attr=("qi_config", "num_layers"),
        per_block=[
            "transformer_blocks.{i}.img_mod.1.weight",
            "transformer_blocks.{i}.img_mod.1.bias",
            "transformer_blocks.{i}.txt_mod.1.weight",
            "transformer_blocks.{i}.attn.to_q.weight",
            "transformer_blocks.{i}.attn.to_k.weight",
            "transformer_blocks.{i}.attn.to_v.weight",
            "transformer_blocks.{i}.attn.add_q_proj.weight",
            "transformer_blocks.{i}.attn.add_k_proj.weight",
            "transformer_blocks.{i}.attn.add_v_proj.weight",
            "transformer_blocks.{i}.attn.to_out.0.weight",
            "transformer_blocks.{i}.attn.to_add_out.weight",
            "transformer_blocks.{i}.attn.norm_q.weight",
            "transformer_blocks.{i}.attn.norm_k.weight",
            "transformer_blocks.{i}.attn.norm_added_q.weight",
            "transformer_blocks.{i}.attn.norm_added_k.weight",
            "transformer_blocks.{i}.img_mlp.net.0.proj.weight",
            "transformer_blocks.{i}.img_mlp.net.2.weight",
            "transformer_blocks.{i}.txt_mlp.net.0.proj.weight",
            "transformer_blocks.{i}.txt_mlp.net.2.weight",
        ],
        top=[
            "img_in.weight", "img_in.bias",
            "txt_in.weight", "txt_norm.weight",
            "time_text_embed.timestep_embedder.linear_1.weight",
            "time_text_embed.timestep_embedder.linear_2.weight",
            "norm_out.linear.weight", "proj_out.weight",
        ],
        absent=[
            # sd3/flux dialect near-misses
            "transformer_blocks.0.norm1.linear.weight",
            "transformer_blocks.0.ff.net.0.proj.weight",
            "double_blocks.0.img_attn.qkv.weight",
        ],
    ),
    "chroma": dict(
        n_attr=("chroma_config", "num_layers"),
        per_block=[
            "double_blocks.{i}.img_attn.qkv.weight",
            "double_blocks.{i}.img_attn.qkv.bias",
            "double_blocks.{i}.img_attn.proj.weight",
            "double_blocks.{i}.img_attn.norm.query_norm.scale",
            "double_blocks.{i}.img_attn.norm.key_norm.scale",
            "double_blocks.{i}.img_mlp.0.weight",
            "double_blocks.{i}.img_mlp.2.weight",
            "double_blocks.{i}.txt_attn.qkv.weight",
            "double_blocks.{i}.txt_attn.proj.weight",
            "double_blocks.{i}.txt_mlp.0.weight",
            "double_blocks.{i}.txt_mlp.2.weight",
        ],
        top=[
            "img_in.weight", "img_in.bias", "txt_in.weight",
            "distilled_guidance_layer.in_proj.weight",
            "distilled_guidance_layer.layers.0.in_layer.weight",
            "distilled_guidance_layer.layers.0.out_layer.weight",
            "distilled_guidance_layer.norms.0.scale",
            "distilled_guidance_layer.out_proj.weight",
            "single_blocks.0.linear1.weight",
            "single_blocks.0.linear2.weight",
            "single_blocks.0.norm.query_norm.scale",
            "single_blocks.0.norm.key_norm.scale",
            "final_layer.linear.weight",
        ],
        absent=[
            # chroma distills ALL per-block modulation into the
            # approximator: flux's modulation layers must not exist
            "double_blocks.0.img_mod.lin.weight",
            "double_blocks.0.txt_mod.lin.weight",
            "single_blocks.0.modulation.lin.weight",
            "final_layer.adaLN_modulation.1.weight",
            "time_in.in_layer.weight",
            "vector_in.in_layer.weight",
            "guidance_in.in_layer.weight",
        ],
    ),
    "lumina_2": dict(
        n_attr=("lumina_config", "num_layers"),
        per_block=[
            "layers.{i}.attention.qkv.weight",
            "layers.{i}.attention.out.weight",
            "layers.{i}.attention.q_norm.weight",
            "layers.{i}.attention.k_norm.weight",
            "layers.{i}.attention_norm1.weight",
            "layers.{i}.attention_norm2.weight",
            "layers.{i}.feed_forward.w1.weight",
            "layers.{i}.feed_forward.w2.weight",
            "layers.{i}.feed_forward.w3.weight",
            "layers.{i}.ffn_norm1.weight",
            "layers.{i}.ffn_norm2.weight",
            "layers.{i}.adaLN_modulation.1.weight",
        ],
        top=[
            "x_embedder.weight", "x_embedder.bias",
            "t_embedder.mlp.0.weight", "t_embedder.mlp.2.weight",
            "cap_embedder.0.weight", "cap_embedder.1.weight",
            "noise_refiner.0.attention.qkv.weight",
            "noise_refiner.0.adaLN_modulation.1.weight",
            "context_refiner.0.attention.qkv.weight",
            "final_layer.linear.weight",
            "final_layer.adaLN_modulation.1.weight",
        ],
        absent=[
            # context refiner blocks carry NO adaLN (no t conditioning on
            # the caption path) and no separate q/k/v
            "context_refiner.0.adaLN_modulation.1.weight",
            "layers.0.attention.wq.weight",
            "layers.0.attention.to_q.weight",
            "transformer_blocks.0.attn.to_q.weight",
        ],
    ),
    "hidream": dict(
        n_attr=("hd_config", "num_double_layers"),
        per_block=[
            "double_stream_blocks.{i}.block.adaLN_modulation.1.weight",
            "double_stream_blocks.{i}.block.attn1.to_q.weight",
            "double_stream_blocks.{i}.block.attn1.to_k.weight",
            "double_stream_blocks.{i}.block.attn1.to_v.weight",
            "double_stream_blocks.{i}.block.attn1.to_out.weight",
            "double_stream_blocks.{i}.block.attn1.q_rms_norm.weight",
            "double_stream_blocks.{i}.block.attn1.k_rms_norm.weight",
            "double_stream_blocks.{i}.block.attn1.to_q_t.weight",
            "double_stream_blocks.{i}.block.attn1.to_k_t.weight",
            "double_stream_blocks.{i}.block.attn1.to_v_t.weight",
            "double_stream_blocks.{i}.block.attn1.to_out_t.weight",
            "double_stream_blocks.{i}.block.attn1.q_rms_norm_t.weight",
            "double_stream_blocks.{i}.block.attn1.k_rms_norm_t.weight",
            "double_stream_blocks.{i}.block.ff_i.gate.weight",
            "double_stream_blocks.{i}.block.ff_i.experts.0.w1.weight",
            "double_stream_blocks.{i}.block.ff_i.experts.0.w2.weight",
            "double_stream_blocks.{i}.block.ff_i.experts.0.w3.weight",
            "double_stream_blocks.{i}.block.ff_i.shared_experts.w1.weight",
            "double_stream_blocks.{i}.block.ff_t.w1.weight",
            "double_stream_blocks.{i}.block.ff_t.w2.weight",
            "double_stream_blocks.{i}.block.ff_t.w3.weight",
        ],
        top=[
            "x_embedder.proj.weight",
            "t_embedder.timestep_embedder.linear_1.weight",
            "p_embedder.pooled_embedder.linear_1.weight",
            "caption_projection.0.linear.weight",
            "single_stream_blocks.0.block.attn1.to_q.weight",
            "single_stream_blocks.0.block.ff_i.gate.weight",
            "final_layer.linear.weight",
            "final_layer.adaLN_modulation.1.weight",
        ],
        absent=[
            # single-stream blocks have no text-branch (_t) projections
            "single_stream_blocks.0.block.attn1.to_q_t.weight",
            "double_blocks.0.img_attn.qkv.weight",
            "transformer_blocks.0.attn.to_q.weight",
        ],
    ),
}


def test_auraflow_import_consumes_diffusers_layout():
    """auraflow converts IMPORT-side only (no KeyMap); anchor it by
    building a synthetic checkpoint with the diffusers
    AuraFlowTransformer2DModel key names (hardcoded below from the
    upstream naming; reference models/auraflow.py:65-76 loads exactly
    this layout) and asserting the converter (a) raises on nothing and
    (b) READS every key — an unread key is a layout mismatch a
    round-trip can't see. AuraFlow qk-norm is fp32_layer_norm with
    elementwise_affine=False, so checkpoints carry NO norm_q weights."""
    import numpy as np

    from diffusion_pipe_tpu.models.auraflow import (
        AuraFlowConfig,
        convert_diffusers_auraflow,
    )

    cfg = AuraFlowConfig(
        hidden_size=32, num_attention_heads=2, attention_head_dim=16,
        joint_attention_dim=24, num_layers=2, num_single_layers=2,
        num_register_tokens=8, pos_embed_max_size=64,
        in_channels=4, out_channels=4, patch_size=2,
    )
    rng = np.random.default_rng(0)

    def rnd(*shape):
        return rng.standard_normal(shape).astype(np.float32)

    d, ff = cfg.hidden_size, 4 * cfg.hidden_size
    sd = {
        "pos_embed.pos_embed": rnd(1, cfg.pos_embed_max_size, d),
        "pos_embed.proj.weight": rnd(d, cfg.in_channels * 4),
        "pos_embed.proj.bias": rnd(d),
        "register_tokens": rnd(1, 8, d),
        "context_embedder.weight": rnd(d, cfg.joint_attention_dim),
        "time_step_proj.linear_1.weight": rnd(d, 256),
        "time_step_proj.linear_1.bias": rnd(d),
        "time_step_proj.linear_2.weight": rnd(d, d),
        "time_step_proj.linear_2.bias": rnd(d),
        "norm_out.linear.weight": rnd(2 * d, d),
        "proj_out.weight": rnd(cfg.patch_size**2 * cfg.out_channels, d),
    }
    for i in range(cfg.num_layers):
        p = f"joint_transformer_blocks.{i}"
        sd[f"{p}.norm1.linear.weight"] = rnd(6 * d, d)
        sd[f"{p}.norm1_context.linear.weight"] = rnd(6 * d, d)
        for m in ("attn.to_q", "attn.to_k", "attn.to_v",
                  "attn.add_q_proj", "attn.add_k_proj", "attn.add_v_proj",
                  "attn.to_out.0", "attn.to_add_out"):
            sd[f"{p}.{m}.weight"] = rnd(d, d)
        for br in ("ff", "ff_context"):
            sd[f"{p}.{br}.linear_1.weight"] = rnd(ff, d)
            sd[f"{p}.{br}.linear_2.weight"] = rnd(ff, d)
            sd[f"{p}.{br}.out_projection.weight"] = rnd(d, ff)
    for i in range(cfg.num_single_layers):
        p = f"single_transformer_blocks.{i}"
        sd[f"{p}.norm1.linear.weight"] = rnd(6 * d, d)
        for m in ("attn.to_q", "attn.to_k", "attn.to_v", "attn.to_out.0"):
            sd[f"{p}.{m}.weight"] = rnd(d, d)
        sd[f"{p}.ff.linear_1.weight"] = rnd(ff, d)
        sd[f"{p}.ff.linear_2.weight"] = rnd(ff, d)
        sd[f"{p}.ff.out_projection.weight"] = rnd(d, ff)

    read = set()

    class Tracking(dict):
        def __getitem__(self, k):
            read.add(k)
            return dict.__getitem__(self, k)

        def __contains__(self, k):
            return dict.__contains__(self, k)

    params = convert_diffusers_auraflow(Tracking(sd), cfg)
    assert "params" in params
    unread = set(sd) - read
    assert not unread, f"converter ignored checkpoint keys: {sorted(unread)[:8]}"


@pytest.mark.parametrize("model_type", sorted(AUDIT))
def test_reference_layout_keys(model_type):
    spec = AUDIT[model_type]
    pipe, sd = _export(model_type)
    cfg_attr, n_attr = spec["n_attr"]
    n = getattr(getattr(pipe, cfg_attr), n_attr)

    missing = []
    for i in range(n):
        for tpl in spec["per_block"]:
            k = tpl.format(i=i)
            if k not in sd:
                missing.append(k)
    for tpl in spec.get("per_inner_block", []):
        for i in range(n - 1):
            k = tpl.format(i=i)
            if k not in sd:
                missing.append(k)
    for k in spec["top"]:
        if k not in sd:
            missing.append(k)
    assert not missing, f"{model_type}: expected reference keys missing: " \
                        f"{missing[:8]} (+{max(0, len(missing)-8)} more)"

    present = [k for k in spec["absent"] if k in sd]
    for tpl in spec.get("final_block_absent", []):
        k = tpl.format(last=n - 1)
        if k in sd:
            present.append(k)
    assert not present, f"{model_type}: wrong-dialect keys emitted: {present}"
