"""OmniGen2 model family (t2i training, as in the reference).

Reference: models/omnigen2.py (322 LoC over the OmniGen2 submodule's
OmniGen2Transformer2DModel). The architecture is the Lumina-Image-2.0
NextDiT design this repo already implements (lumina_2.py): context refiner
(no adaLN) + noise refiner (adaLN) + joint [text, img] GQA blocks with
sandwich RMS norms and SwiGLU, final adaLN-scale head. Differences are
dimensional (hidden 2520, 21 heads / 7 kv heads, 32 layers, Qwen2.5-VL
captions, rope axes (40, 40, 40), theta 10000) plus a reference-image
branch (ref_image_patch_embedder / ref_image_refiner /
image_index_embedding) that the reference trains with
ref_image_hidden_states=None (omnigen2.py:229) — i.e. t2i only — so it is
not instantiated here.

Objective matches the reference (omnigen2.py:174-179): x_t=(1-t)x+tn,
model gets 1-t, target = latents - noise. Text encoder: Qwen2.5-VL
hidden_states[-1], max_length 256, plain (non-templated) captions
(omnigen2.py:82-124).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from . import register_model
from .lumina_2 import Lumina2Config, Lumina2Pipeline
from .layers import remat_spec


@register_model("omnigen2")
class OmniGen2Pipeline(Lumina2Pipeline):
    name = "omnigen2"
    cacheable_text_embeddings = ("prompt_embeds", "prompt_attention_mask")

    def _build_config(self) -> Lumina2Config:
        from ..common import dtype_from_string

        mc = self.model_config
        adapter = self.config.get("adapter", {})
        kwargs: Dict[str, Any] = dict(
            dtype=dtype_from_string(mc.get("dtype", "bfloat16")),
            param_dtype=dtype_from_string(mc.get("dtype", "bfloat16")),
            base_kernel_dtype=(
                dtype_from_string(mc["transformer_dtype"])
                if mc.get("transformer_dtype") else None
            ),
            remat=remat_spec(self.config),
            int8_matmul=mc.get("int8_matmul", False),
        )
        if adapter.get("type") in ("lora", "lokr"):
            kwargs.update(
                lora_rank=int(adapter["rank"]),
                lora_type=adapter["type"],
                lokr_factor=int(adapter.get("decompose_factor", -1)),
                lokr_rank_dropout=float(adapter.get("rank_dropout", 0.0)),
                lora_alpha=float(adapter["alpha"]),
                lora_dropout=float(adapter.get("dropout", 0.0)),
                lora_dtype=dtype_from_string(
                    adapter.get("dtype", mc.get("dtype", "bfloat16"))
                ),
            )
        if mc.get("_tiny", False):
            return Lumina2Config.tiny(**kwargs)
        # OmniGen2 dims (diffusers OmniGen2Transformer2DModel config)
        kwargs.setdefault("dim", 2520)
        kwargs.setdefault("num_layers", 32)
        kwargs.setdefault("num_refiner_layers", 2)
        kwargs.setdefault("num_heads", 21)
        kwargs.setdefault("num_kv_heads", 7)
        kwargs.setdefault("cap_dim", 3584)  # Qwen2.5-VL-7B hidden
        kwargs.setdefault("axes_dims_rope", (40, 40, 40))
        return Lumina2Config(**kwargs)

    def keymap(self):
        """OmniGen2Transformer2DModel (diffusers-dialect) keys: separate
        GQA to_q/to_k/to_v, LuminaRMSNormZero `norm1.linear`+`norm1.norm`,
        LuminaFeedForward linear_1/2/3, combined
        `time_caption_embed.{timestep_embedder,caption_embedder}`,
        `norm_out.linear_1/linear_2` head (reference models/omnigen2.py:
        49-62 loads the diffusers `transformer/` subfolder; LoRA saved with
        the ComfyUI `diffusion_model.` prefix, :67-71). The flax modules
        are the Lumina-2 NextDiT this family shares; only the torch paths
        differ from lumina_2's keymap."""
        from .keymaps import BlockGroup, KeyMap

        cfg = self.lumina_config

        def block_maps(adaln: bool):
            linears = {
                "attn_wq": "attn.to_q",
                "attn_wk": "attn.to_k",
                "attn_wv": "attn.to_v",
                "attn_wo": "attn.to_out.0",
                "ffn_w1": "feed_forward.linear_1",
                "ffn_w2": "feed_forward.linear_2",
                "ffn_w3": "feed_forward.linear_3",
            }
            norms = {
                "attn_q_norm": "attn.norm_q",
                "attn_k_norm": "attn.norm_k",
                "attention_norm2": "norm2",
                "ffn_norm1": "ffn_norm1",
                "ffn_norm2": "ffn_norm2",
            }
            if adaln:
                linears["adaLN_modulation"] = "norm1.linear"
                norms["attention_norm1"] = "norm1.norm"
            else:
                norms["attention_norm1"] = "norm1"
            return linears, norms

        lin, norms = block_maps(adaln=True)
        top_linears = {
            "x_embedder": "x_embedder",
            "t_embedder_1": "time_caption_embed.timestep_embedder.linear_1",
            "t_embedder_2": "time_caption_embed.timestep_embedder.linear_2",
            "cap_embedder": "time_caption_embed.caption_embedder.1",
            "final_adaLN": "norm_out.linear_1",
            "final_linear": "norm_out.linear_2",
        }
        top_norms = {
            "cap_embedder_norm": "time_caption_embed.caption_embedder.0",
        }
        for group, use_adaln in (("context_refiner", False),
                                 ("noise_refiner", True)):
            glin, gnorms = block_maps(use_adaln)
            for i in range(cfg.num_refiner_layers):
                base = f"{group}.{i}"
                ours = f"{group}_{i}"
                for fl, th in glin.items():
                    top_linears[f"{ours}/{fl}"] = f"{base}.{th}"
                for fl, th in gnorms.items():
                    top_norms[f"{ours}/{fl}"] = f"{base}.{th}"
        wrap = "Lumina2Block_0/"
        return KeyMap(
            blocks=[BlockGroup(
                "layers", "layers", "num_layers",
                linears={wrap + k: v for k, v in lin.items()},
                norms={wrap + k: v for k, v in norms.items()},
            )],
            top_linears=top_linears,
            top_norms=top_norms,
            lora_prefix="diffusion_model.",
        )

    def prepare_inputs(self, rng, batch, timestep_quantile=None):
        mapped = dict(batch)
        mapped["cap_feats"] = mapped.pop("prompt_embeds")
        mapped["cap_mask"] = mapped.pop("prompt_attention_mask")
        return super().prepare_inputs(
            rng, mapped, timestep_quantile=timestep_quantile
        )

    def get_call_text_encoder_fns(self):
        mc = self.model_config
        if mc.get("_tiny", False):
            from ..data.bucketing import seed_from_hash

            cfg = self.lumina_config

            def te(caps):
                embs, masks = [], []
                for cap in caps:
                    r = np.random.default_rng(seed_from_hash(cap))
                    n = min(len(cap) + 1, 8)
                    e = np.zeros((8, cfg.cap_dim), np.float32)
                    e[:n] = r.standard_normal((n, cfg.cap_dim))
                    m = np.zeros((8,), np.int32)
                    m[:n] = 1
                    embs.append(e)
                    masks.append(m)
                return {"prompt_embeds": np.stack(embs),
                        "prompt_attention_mask": np.stack(masks)}

            return [te]

        from .llm_encoders import LLMTextEncoder

        enc = LLMTextEncoder(
            mc["text_encoder_path"],
            max_length=int(mc.get("max_sequence_length", 256)),
            hidden_layer=-1,
        )

        def fn(caps):
            h, m = enc.encode(caps)
            return {"prompt_embeds": h,
                    "prompt_attention_mask": m.astype(np.int32)}

        return [fn]
