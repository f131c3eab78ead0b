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
    # Z-Image: ComfyUI NextDiT checkpoint (reference models/z_image.py is a
    # ComfyPipeline; its to_layers()/InitialLayer access the attribute names
    # below verbatim — t_embedder/cap_embedder/x_embedder/noise_refiner/
    # context_refiner/final_layer at z_image.py:126-133 and
    # x_pad_token/cap_pad_token at z_image.py:23,200-206). Block internals
    # follow the Alpha-VLLM NextDiT naming lumina_2 is audited for (Z-Image
    # reuses that architecture with GQA + caption rope offset).
    "z_image": dict(
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
            "x_pad_token", "cap_pad_token",
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
            "context_refiner.0.adaLN_modulation.1.weight",
            # diffusers-dialect names must not leak
            "layers.0.attn.to_q.weight",
            "layers.0.norm1.linear.weight",
            "time_caption_embed.timestep_embedder.linear_1.weight",
        ],
    ),
    # Flux 2: the reference's own wrapper names every top-level module
    # verbatim (keep_in_high_precision at models/flux2.py:22 and the
    # InitialLayer/FinalLayer attribute accesses :237-245,360,403:
    # img_in / time_in / guidance_in / txt_norm / txt_in /
    # double_stream_modulation_{img,txt} / single_stream_modulation /
    # final_layer) and autodetects model size from the `img_in.weight` key
    # (:32 — a LINEAR, not a conv: no `.proj`). Block internals follow the
    # BFL/ComfyUI flux dialect (fused qkv, norm.query_norm.scale), which
    # the flux family verifies against real BFL single-file checkpoints.
    "flux2": dict(
        n_attr=("f2_config", "num_layers"),
        per_block=[
            "double_blocks.{i}.img_attn.qkv.weight",
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
            "img_in.weight", "img_in.bias",
            "txt_in.weight", "txt_norm.scale",
            "time_in.in_layer.weight", "time_in.out_layer.weight",
            "guidance_in.in_layer.weight", "guidance_in.out_layer.weight",
            "double_stream_modulation_img.lin.weight",
            "double_stream_modulation_txt.lin.weight",
            "single_stream_modulation.lin.weight",
            "single_blocks.0.linear1.weight",
            "single_blocks.0.linear2.weight",
            "single_blocks.0.norm.query_norm.scale",
            "final_layer.linear.weight",
            "final_layer.adaLN_modulation.1.weight",
        ],
        absent=[
            # flux1 carries per-block modulation linears + a pooled-text
            # vector_in; flux2's GLOBAL modulation has neither (reference
            # flux2.py:214 asserts vector_in is None, :308-318 computes
            # mods once from vec)
            "double_blocks.0.img_mod.lin.weight",
            "double_blocks.0.txt_mod.lin.weight",
            "single_blocks.0.modulation.lin.weight",
            "vector_in.in_layer.weight",
            "img_in.proj.weight",
        ],
    ),
    # HunyuanVideo 1.5: reference wrapper accesses the top-level modules
    # verbatim (models/hunyuan_video_15.py:215-221: img_in / time_in /
    # txt_in / cond_type_embedding / byt5_in / vision_in / pe_embedder,
    # :212-214 guidance_embed off + vector_in None, :103 double_blocks).
    # Block internals = the ComfyUI HunyuanVideo MM dialect (img_mod.lin,
    # img_attn.qkv, norm.query_norm.scale, img_mlp.0/2) whose math + fused
    # qkv layout is golden-tested against the reference's vendored torch
    # MM blocks (tests/test_golden_hunyuan_blocks.py).
    "hunyuan_video_15": dict(
        n_attr=("hv15_config", "num_layers"),
        per_block=[
            "double_blocks.{i}.img_mod.lin.weight",
            "double_blocks.{i}.img_attn.qkv.weight",
            "double_blocks.{i}.img_attn.qkv.bias",
            "double_blocks.{i}.img_attn.proj.weight",
            "double_blocks.{i}.img_attn.norm.query_norm.scale",
            "double_blocks.{i}.img_attn.norm.key_norm.scale",
            "double_blocks.{i}.img_mlp.0.weight",
            "double_blocks.{i}.img_mlp.2.weight",
            "double_blocks.{i}.txt_mod.lin.weight",
            "double_blocks.{i}.txt_attn.qkv.weight",
            "double_blocks.{i}.txt_attn.proj.weight",
            "double_blocks.{i}.txt_mlp.0.weight",
            "double_blocks.{i}.txt_mlp.2.weight",
        ],
        top=[
            "img_in.proj.weight", "img_in.proj.bias",
            "time_in.in_layer.weight", "time_in.out_layer.weight",
            "txt_in.input_embedder.weight",
            "txt_in.t_embedder.mlp.0.weight",
            "txt_in.t_embedder.mlp.2.weight",
            "txt_in.c_embedder.linear_1.weight",
            "txt_in.c_embedder.linear_2.weight",
            "txt_in.individual_token_refiner.blocks.0.self_attn_qkv.weight",
            "txt_in.individual_token_refiner.blocks.0.self_attn_proj.weight",
            "txt_in.individual_token_refiner.blocks.0.mlp.fc1.weight",
            "txt_in.individual_token_refiner.blocks.0.norm1.weight",
            "txt_in.individual_token_refiner.blocks.0.adaLN_modulation.1.weight",
            "cond_type_embedding.weight",
            "byt5_in.fc1.weight", "byt5_in.fc2.weight", "byt5_in.fc3.weight",
            "byt5_in.layernorm.weight", "byt5_in.layernorm.bias",
            "final_layer.linear.weight",
            "final_layer.adaLN_modulation.1.weight",
        ],
        absent=[
            # hv15 has no single-stream blocks, no guidance embedder, no
            # pooled-text vector_in (reference hunyuan_video_15.py:212-214)
            "single_blocks.0.linear1.weight",
            "guidance_in.in_layer.weight",
            "vector_in.in_layer.weight",
        ],
    ),
    # LTX-2: reference wrapper names the video-path top-level modules
    # verbatim (models/ltx2.py:400-403: patchify_proj / adaln_single /
    # prompt_adaln_single / caption_projection) and the block internals
    # (ltx2.py:66-77: attn1 / attn2 / scale_shift_table /
    # prompt_scale_shift_table). Audio-branch tensors (audio_* at
    # :404-411) belong to the frozen audio path this port runs empty, as
    # the reference does for video-only training; they pass through
    # full-model export via the frozen-sidecar mechanism.
    "ltx2": dict(
        n_attr=("ltx2_config", "num_layers"),
        per_block=[
            "transformer_blocks.{i}.attn1.to_q.weight",
            "transformer_blocks.{i}.attn1.to_k.weight",
            "transformer_blocks.{i}.attn1.to_v.weight",
            "transformer_blocks.{i}.attn1.to_out.0.weight",
            "transformer_blocks.{i}.attn1.q_norm.weight",
            "transformer_blocks.{i}.attn1.k_norm.weight",
            "transformer_blocks.{i}.attn2.to_q.weight",
            "transformer_blocks.{i}.attn2.to_k.weight",
            "transformer_blocks.{i}.attn2.to_v.weight",
            "transformer_blocks.{i}.attn2.to_out.0.weight",
            "transformer_blocks.{i}.ff.net.0.proj.weight",
            "transformer_blocks.{i}.ff.net.2.weight",
            "transformer_blocks.{i}.scale_shift_table",
            "transformer_blocks.{i}.prompt_scale_shift_table",
        ],
        top=[
            "patchify_proj.weight", "patchify_proj.bias",
            "adaln_single.emb.timestep_embedder.linear_1.weight",
            "adaln_single.emb.timestep_embedder.linear_2.weight",
            "adaln_single.linear.weight",
            "prompt_adaln_single.linear.weight",
            "caption_projection.linear.weight",
            "video_embeddings_connector.learnable_registers",
            "video_embeddings_connector.transformer_1d_blocks.0.attn.q_proj.weight",
            "scale_shift_table",
            "proj_out.weight", "proj_out.bias",
        ],
        absent=[
            # ltx1 dialect (GEGLU names match but ltx1 has no prompt tables)
            "transformer_blocks.0.attn1.norm_q.weight",
            "time_embed.emb.timestep_embedder.linear_1.weight",
            # the connector container is transformer_1d_blocks
            # (reference ltx2.py:456), not blocks
            "video_embeddings_connector.blocks.0.attn.q_proj.weight",
        ],
    ),
    # ERNIE image: reference wrapper names every top-level module verbatim
    # (keep_in_high_precision at models/ernie_image.py:19 + InitialLayer
    # accesses :122-127,213: x_embedder / text_proj / pos_embed (paramless
    # sincos) / time_proj (paramless) / time_embedding / shared
    # adaLN_modulation / final_norm / final_linear; blocks via
    # diffusion_model.layers :28). Block-internal names live in the
    # (absent) ComfyUI submodule — tops-only audit; block internals stay
    # flagged in docs/supported_models.md.
    "ernie_image": dict(
        n_attr=("ernie_config", "num_layers"),
        per_block=[],
        top=[
            "x_embedder.weight", "x_embedder.bias",
            "text_proj.weight", "text_proj.bias",
            "time_embedding.linear_1.weight",
            "time_embedding.linear_2.weight",
            "adaLN_modulation.1.weight", "adaLN_modulation.1.bias",
            "final_norm.linear.weight",
            "final_linear.weight", "final_linear.bias",
        ],
        absent=[
            # the shared adaLN lives at the TOP level (one set for all
            # blocks, reference ernie_image.py:127,172), not per block
            "layers.0.adaLN_modulation.1.weight",
            "t_embedder.mlp.0.weight",
            "final_layer.linear.weight",
        ],
    ),
    # Ideogram 4: reference wrapper names every top-level module verbatim
    # (keep_in_high_precision at models/ideogram4.py:26 + InitialLayer
    # accesses :137-142,246: input_proj / t_embedding / adaln_proj /
    # llm_cond_norm / llm_cond_proj / embed_image_indicator / final_layer;
    # blocks via diffusion_model.layers :38). The keep-list's 'mlp_in'
    # entry is substring-matched against real param names (base.py:539),
    # grounding a flat per-block mlp_in/mlp_out FFN; the old nested
    # mlp.gate_proj SwiGLU guess is asserted ABSENT. Attention internals
    # stay flagged in docs.
    "ideogram4": dict(
        n_attr=("ideo_config", "num_layers"),
        per_block=[
            "layers.{i}.mlp_in.weight",
            "layers.{i}.mlp_out.weight",
        ],
        top=[
            "input_proj.weight", "input_proj.bias",
            "t_embedding.linear_1.weight",
            "t_embedding.linear_2.weight",
            "adaln_proj.weight", "adaln_proj.bias",
            "llm_cond_norm.weight",
            "llm_cond_proj.weight", "llm_cond_proj.bias",
            "embed_image_indicator.weight",
            "final_layer.linear.weight",
            "final_layer.adaLN_modulation.1.weight",
        ],
        absent=[
            "x_embedder.weight",
            "caption_projection.linear_1.weight",
            "context_embedder.weight",
            # the round-3 SwiGLU gate/up/down guess the keep-list's
            # mlp_in entry contradicts (reference ideogram4.py:26)
            "layers.0.mlp.gate_proj.weight",
            "layers.0.mlp.up_proj.weight",
            "layers.0.mlp.down_proj.weight",
        ],
    ),
    # Krea 2: reference wrapper names every top-level module verbatim
    # (keep_in_high_precision at models/krea2.py:22 + InitialLayer/
    # FinalLayer accesses :184-188,268: first / tmlp / tproj / txtfusion /
    # txtmlp / last; blocks via diffusion_model.blocks :84). The main
    # blocks follow the flux single-stream dialect (Krea2 is
    # flux-derived): fused linear1/linear2 + modulation.lin +
    # norm.query_norm.scale.
    "krea2": dict(
        n_attr=("krea_config", "num_layers"),
        per_block=[
            "blocks.{i}.linear1.weight",
            "blocks.{i}.linear2.weight",
            "blocks.{i}.modulation.lin.weight",
            "blocks.{i}.norm.query_norm.scale",
            "blocks.{i}.norm.key_norm.scale",
        ],
        top=[
            "first.weight", "first.bias",
            "tmlp.in_layer.weight", "tmlp.out_layer.weight",
            "tproj.weight", "tproj.bias",
            "txtfusion.layer_weights",
            "txtfusion.blocks.0.attn.q_proj.weight",
            "txtfusion.blocks.0.mlp.fc1.weight",
            "txtfusion.blocks.0.norm1.weight",
            "txtmlp.0.weight", "txtmlp.2.weight",
            "last.linear.weight",
            "last.adaLN_modulation.1.weight",
        ],
        absent=[
            "img_in.weight",
            "single_blocks.0.linear1.weight",
            "final_layer.linear.weight",
            "time_in.in_layer.weight",
        ],
    ),
    # LTX-Video: Lightricks Transformer3DModel single-file checkpoint
    # (reference models/ltx_video.py:58-70 loads it via the LTX_Video
    # submodule; its KEEP_IN_HIGH_PRECISION list at ltx_video.py:21 names
    # the top-level modules verbatim: scale_shift_table / patchify_proj /
    # proj_out / adaln_single / caption_projection). Block internals follow
    # the Lightricks attention naming: per-head RMS `q_norm`/`k_norm` (NOT
    # diffusers' norm_q/norm_k), to_out.0, GEGLU ff.net.0.proj/ff.net.2,
    # per-block scale_shift_table (PixArt adaLN-single).
    "ltx-video": dict(
        n_attr=("ltx_config", "num_layers"),
        per_block=[
            "transformer_blocks.{i}.attn1.to_q.weight",
            "transformer_blocks.{i}.attn1.to_k.weight",
            "transformer_blocks.{i}.attn1.to_v.weight",
            "transformer_blocks.{i}.attn1.to_out.0.weight",
            "transformer_blocks.{i}.attn1.q_norm.weight",
            "transformer_blocks.{i}.attn1.k_norm.weight",
            "transformer_blocks.{i}.attn2.to_q.weight",
            "transformer_blocks.{i}.attn2.to_k.weight",
            "transformer_blocks.{i}.attn2.to_v.weight",
            "transformer_blocks.{i}.attn2.to_out.0.weight",
            "transformer_blocks.{i}.attn2.q_norm.weight",
            "transformer_blocks.{i}.attn2.k_norm.weight",
            "transformer_blocks.{i}.ff.net.0.proj.weight",
            "transformer_blocks.{i}.ff.net.2.weight",
            "transformer_blocks.{i}.scale_shift_table",
        ],
        top=[
            "patchify_proj.weight", "patchify_proj.bias",
            "adaln_single.emb.timestep_embedder.linear_1.weight",
            "adaln_single.emb.timestep_embedder.linear_2.weight",
            "adaln_single.linear.weight",
            "caption_projection.linear_1.weight",
            "caption_projection.linear_2.weight",
            "scale_shift_table",
            "proj_out.weight", "proj_out.bias",
        ],
        absent=[
            # diffusers LTXVideoTransformer3DModel dialect must not leak
            "transformer_blocks.0.attn1.norm_q.weight",
            "transformer_blocks.0.norm1.weight",
            "time_embed.emb.timestep_embedder.linear_1.weight",
            "proj_in.weight",
        ],
    ),
    # OmniGen2: upstream VectorSpaceLab/OmniGen2 transformer_omnigen2.py
    # (diffusers-style Lumina-NextDiT derivative; reference
    # models/omnigen2.py:17,52 loads OmniGen2Transformer2DModel
    # from_pretrained). Naming: LuminaRMSNormZero `norm1.linear`+`norm1.norm`
    # on modulated blocks, plain `norm1` on context-refiner blocks,
    # separate GQA to_q/to_k/to_v + norm_q/norm_k, LuminaFeedForward
    # linear_1/2/3, Lumina2CombinedTimestepCaptionEmbedding
    # `time_caption_embed.{timestep_embedder,caption_embedder}`, and the
    # LuminaLayerNormContinuous `norm_out.linear_1/linear_2` head.
    "omnigen2": dict(
        n_attr=("lumina_config", "num_layers"),
        per_block=[
            "layers.{i}.norm1.linear.weight",
            "layers.{i}.norm1.norm.weight",
            "layers.{i}.attn.to_q.weight",
            "layers.{i}.attn.to_k.weight",
            "layers.{i}.attn.to_v.weight",
            "layers.{i}.attn.to_out.0.weight",
            "layers.{i}.attn.norm_q.weight",
            "layers.{i}.attn.norm_k.weight",
            "layers.{i}.norm2.weight",
            "layers.{i}.feed_forward.linear_1.weight",
            "layers.{i}.feed_forward.linear_2.weight",
            "layers.{i}.feed_forward.linear_3.weight",
            "layers.{i}.ffn_norm1.weight",
            "layers.{i}.ffn_norm2.weight",
        ],
        top=[
            "x_embedder.weight", "x_embedder.bias",
            "time_caption_embed.timestep_embedder.linear_1.weight",
            "time_caption_embed.timestep_embedder.linear_2.weight",
            "time_caption_embed.caption_embedder.0.weight",
            "time_caption_embed.caption_embedder.1.weight",
            "noise_refiner.0.norm1.linear.weight",
            "noise_refiner.0.attn.to_q.weight",
            "context_refiner.0.norm1.weight",
            "context_refiner.0.attn.to_q.weight",
            "norm_out.linear_1.weight",
            "norm_out.linear_2.weight",
        ],
        absent=[
            # context-refiner blocks carry no adaLN modulation
            "context_refiner.0.norm1.linear.weight",
            # original Alpha-VLLM NextDiT dialect must not leak
            "layers.0.attention.qkv.weight",
            "layers.0.feed_forward.w1.weight",
            "layers.0.adaLN_modulation.1.weight",
            "t_embedder.mlp.0.weight",
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


def test_z_image_turbo_merge_end_to_end(tmp_path):
    """The Z-Image turbo adapter-merge path, end to end on the real
    loader: `model.merge_adapters = [path]` folds a ComfyUI-dialect LoRA
    (diffusion_model.<module>.lora_A/B + .alpha — the naming comfy
    load_lora_for_models consumes, reference models/base.py:562-581) into
    the base state dict BEFORE keymap conversion, and the merged weight
    survives the flax round trip. Also asserts the loud failure on an
    adapter whose keys match nothing (wrong model)."""
    import numpy as np
    from safetensors.numpy import save_file

    pipe, sd = _export("z_image")
    base = {k: np.ascontiguousarray(np.asarray(v)) for k, v in sd.items()}
    save_file(base, str(tmp_path / "model.safetensors"))

    tgt = "layers.0.attention.qkv.weight"
    w = base[tgt]
    rng = np.random.default_rng(3)
    rank = 2
    down = rng.standard_normal((rank, w.shape[1])).astype(np.float32)
    up = rng.standard_normal((w.shape[0], rank)).astype(np.float32)
    save_file({
        "diffusion_model.layers.0.attention.qkv.lora_A.weight": down,
        "diffusion_model.layers.0.attention.qkv.lora_B.weight": up,
        "diffusion_model.layers.0.attention.qkv.alpha":
            np.asarray(4.0, np.float32),
    }, str(tmp_path / "turbo.safetensors"))

    cfg = {
        "save_every_n_epochs": 1,
        "model": {
            "type": "z_image", "dtype": "float32", "_tiny": True,
            "ckpt_path": str(tmp_path / "model.safetensors"),
            "merge_adapters": [str(tmp_path / "turbo.safetensors")],
        },
        "optimizer": {"type": "adamw", "lr": 1e-4},
    }
    pipe2 = get_model_class("z_image")(cfg)
    params = pipe2.load_weights()
    sd2 = keymap_from_flax(
        nn.unbox(params), pipe2.keymap(), pipe2._keymap_config())
    expected = w + (4.0 / rank) * (up @ down)
    np.testing.assert_allclose(sd2[tgt], expected, rtol=1e-4, atol=1e-5)
    # untouched weights unchanged
    other = "layers.1.attention.qkv.weight"
    np.testing.assert_allclose(sd2[other], base[other], rtol=1e-6)

    save_file({
        "diffusion_model.not_a_module.lora_A.weight": down,
        "diffusion_model.not_a_module.lora_B.weight": up,
    }, str(tmp_path / "wrong.safetensors"))
    cfg["model"]["merge_adapters"] = [str(tmp_path / "wrong.safetensors")]
    pipe3 = get_model_class("z_image")(cfg)
    with pytest.raises(ValueError, match="merge_adapters"):
        pipe3.load_weights()


@pytest.mark.parametrize("glu", [True, False])
def test_ideogram4_mlp_shape_discovery(tmp_path, glu):
    """load_weights discovers the FFN variant from mlp_in/mlp_out shapes
    (the keep-list grounds only the NAMES, reference ideogram4.py:26; the
    width and GLU-vs-plain split come from the checkpoint itself)."""
    import numpy as np
    from safetensors.numpy import save_file

    pipe, sd = _export("ideogram4")
    d = pipe.ideo_config.hidden_size
    h_mlp = 48  # differs from the config default to prove discovery wins
    rng = np.random.default_rng(0)
    n = pipe.ideo_config.num_layers
    for i in range(n):
        sd[f"layers.{i}.mlp_in.weight"] = rng.standard_normal(
            ((2 * h_mlp) if glu else h_mlp, d)).astype(np.float32)
        sd[f"layers.{i}.mlp_out.weight"] = rng.standard_normal(
            (d, h_mlp)).astype(np.float32)
    f = tmp_path / "ideogram4.safetensors"
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, str(f))

    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "ideogram4", "dtype": "float32", "_tiny": True,
                  "ckpt_path": str(f)},
        "optimizer": {"type": "adamw", "lr": 1e-4},
    }
    pipe2 = get_model_class("ideogram4")(cfg)
    params = pipe2.load_weights()
    assert pipe2.ideo_config.mlp_glu is glu
    assert pipe2.ideo_config.mlp_dim == h_mlp
    kin = params["params"]["layers"]["mlp_in"]["kernel"]
    assert kin.shape == (n, d, (2 * h_mlp) if glu else h_mlp)

    import jax.numpy as jnp
    c = pipe2.ideo_config
    out = pipe2.forward(params, dict(
        x=jnp.zeros((1, c.latent_dim, 4, 4)),
        t=jnp.full((1,), 0.5),
        text_embeds=jnp.zeros((1, 8, c.text_dim)),
        text_mask=jnp.ones((1, 8), jnp.int32),
    ))
    assert out.shape == (1, c.latent_dim, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_cosmos_general_dit_checkpoint_loads(tmp_path):
    """Cosmos-1 GeneralDIT serialization loads end-to-end through the
    real loader: a synthetically GeneralDIT-keyed checkpoint (the
    `blocks.blockN.blocks.{0,1,2}` FA/CA/MLP nesting + `_extra_state`
    blobs the reference consumes via load_state_dict(strict=False),
    ref models/cosmos.py:165-172) round-trips to the exact Predict2-layout
    params. Genuinely unknown layouts still fail loudly."""
    import re

    import numpy as np
    from safetensors.numpy import save_file

    from diffusion_pipe_tpu.models.cosmos import _GD_ATTN

    pipe, sd = _export("cosmos")
    inv_attn = {v: k for k, v in _GD_ATTN.items()}
    sub_of = {"self_attn": "0", "cross_attn": "1", "mlp": "2"}
    ada_of = {
        "adaln_modulation_self_attn": "0",
        "adaln_modulation_cross_attn": "1",
        "adaln_modulation_mlp": "2",
    }
    gd = {}
    for k, v in sd.items():
        m = re.match(r"blocks\.(\d+)\.([a-z_]+)\.(.+)$", k)
        if m:
            i, mod, rest = m.groups()
            if mod in ada_of:
                gd[f"net.blocks.block{i}.blocks.{ada_of[mod]}"
                   f".adaLN_modulation.{rest}"] = v
            elif mod == "mlp":
                gd[f"net.blocks.block{i}.blocks.2.block.{rest}"] = v
            else:
                proj, leaf = rest.split(".", 1)
                gd[f"net.blocks.block{i}.blocks.{sub_of[mod]}"
                   f".block.attn.{inv_attn[proj]}.{leaf}"] = v
        elif k.startswith("t_embedding_norm."):
            gd["net.affline_norm." + k[len("t_embedding_norm."):]] = v
        elif k.startswith("final_layer.adaln_modulation."):
            gd["net.final_layer.adaLN_modulation."
               + k[len("final_layer.adaln_modulation."):]] = v
        else:
            gd["net." + k] = v
    # extras the reference also tolerates: TE blobs + unknown buffers
    gd["net.blocks.block0.blocks.0.block.attn._extra_state"] = np.zeros(
        (1,), np.uint8)
    gd["net.pos_embedder.seq"] = np.zeros((4,), np.float32)
    save_file({k: np.ascontiguousarray(np.asarray(v))
               for k, v in gd.items()}, str(tmp_path / "gd.safetensors"))

    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "cosmos", "dtype": "float32", "_tiny": True,
                  "transformer_path": str(tmp_path / "gd.safetensors")},
        "optimizer": {"type": "adamw", "lr": 1e-4},
    }
    pipe2 = get_model_class("cosmos")(cfg)
    params = nn.unbox(pipe2.load_weights())
    sd2 = keymap_from_flax(params, pipe2.keymap(), pipe2._keymap_config())
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(sd2[k], sd[k]), k

    # unknown layout: block marker present but nothing converts
    bogus = {"net.blocks.block0.weird.q.weight": np.zeros((4, 4), np.float32)}
    save_file(bogus, str(tmp_path / "bogus.safetensors"))
    cfg["model"]["transformer_path"] = str(tmp_path / "bogus.safetensors")
    pipe3 = get_model_class("cosmos")(cfg)
    with pytest.raises((ValueError, KeyError)):
        pipe3.load_weights()
