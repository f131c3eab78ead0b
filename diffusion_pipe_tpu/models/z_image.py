"""Z-Image (Tongyi) model family.

Reference: models/z_image.py (258 LoC over the ComfyUI NextDiT
implementation). Structure extracted from that wrapper:
  - Lumina NextDiT family: t_embedder + cap_embedder, context_refiner
    (masked, no adaLN) + noise_refiner (adaLN) + joint [cap, img]
    JointTransformerBlocks, adaLN final layer (z_image.py:123-219)
  - rope position ids: caption axis-0 = 1..L (offset 1), image tokens
    axis-0 = cap_len + 1 with 2D (row, col) (z_image.py:188-198)
  - timestep sign flip t = 1 - timesteps inside the model (z_image.py:144),
    target = latents - noise (z_image.py:88-93)
  - pad-token multiple handling disabled for shape stability
    (z_image.py:167-184) — static shapes here anyway
  - Qwen3-4B captions via the ComfyUI CLIP loader -> plain HF Qwen3 tower
    here, final hidden states

Model dims are checkpoint-configurable (dim/num_layers/... in the model
config table). The turbo training-adapter merge (merge_adapters) maps to
load-time LoRA fusion — pending with real weights.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from . import register_model
from .lumina_2 import Lumina2Config, Lumina2Pipeline
from .layers import remat_spec


@register_model("z_image")
class ZImagePipeline(Lumina2Pipeline):
    name = "z_image"
    cacheable_text_embeddings = ("text_embeds_0", "attention_mask_0")

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
            rope_cap_offset=1,
            # learned image pad tokens (reference z_image.py:200-206);
            # must match the upstream model config's multiple — override
            # via model.pad_tokens_multiple (0/None disables)
            pad_tokens_multiple=mc.get("pad_tokens_multiple", 32),
        )
        for knob in ("dim", "num_layers", "num_refiner_layers", "num_heads",
                     "num_kv_heads", "cap_dim", "in_channels", "out_channels"):
            if mc.get(knob) is not None:
                kwargs[knob] = int(mc[knob])
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
        # Z-Image-Turbo release dims (S6B single-stream NextDiT);
        # override via the model config if the checkpoint differs.
        kwargs.setdefault("dim", 3072)
        kwargs.setdefault("num_layers", 30)
        kwargs.setdefault("num_refiner_layers", 2)
        kwargs.setdefault("num_heads", 24)
        kwargs.setdefault("num_kv_heads", 8)
        kwargs.setdefault("cap_dim", 2560)  # Qwen3-4B hidden
        return Lumina2Config(**kwargs)

    def prepare_inputs(self, rng, batch, timestep_quantile=None):
        mapped = dict(batch)
        mapped["cap_feats"] = mapped.pop("text_embeds_0")
        mapped["cap_mask"] = mapped.pop("attention_mask_0")
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
                return {"text_embeds_0": np.stack(embs),
                        "attention_mask_0": np.stack(masks)}

            return [te]

        from .llm_encoders import LLMTextEncoder

        enc = LLMTextEncoder(
            mc["text_encoder_path"],
            max_length=int(mc.get("max_sequence_length", 512)),
            hidden_layer=-1,
        )

        def fn(caps):
            h, m = enc.encode(caps)
            return {"text_embeds_0": h,
                    "attention_mask_0": m.astype(np.int32)}

        return [fn]
