"""Text-encoder wrappers: jitted Flax T5/CLIP encoders for caching.

The reference runs torch T5/CLIP/etc. on GPU inside the multi-process
caching system (dataset.py:1216-1255). Here each encoder is a transformers
Flax model jitted once; DatasetManager streams caption batches through it.
Weights load from the same diffusers-layout folders the reference consumes
(docs/supported_models.md model paths).
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np


def cast_te_params_fp8(params, skip=("shared", "embed_tokens",
                                     "relative_attention_bias",
                                     "token_embedding", "pos_embedding",
                                     "position_embedding", "embedding",
                                     "lm_head")):
    """`text_encoder_fp8` analogue (reference wan/wan.py:188-191,
    cosmos_predict2.py:229-232 cast 2-D TE weights except embeddings /
    relpos tables to torch.float8_e4m3fn): matmul weights become
    float8_e4m3fn STORAGE; the encoder's nn.Dense promote_dtype casts them
    back to the compute dtype at use, so XLA fuses the dequant into the
    matmul — half the resident-TE footprint, embeddings kept full."""
    import jax.numpy as jnp
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    out = {}
    for k, v in flat.items():
        if (hasattr(v, "ndim") and v.ndim == 2
                and jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating)
                and not any(s in str(part) for part in k for s in skip)):
            v = jnp.asarray(v).astype(jnp.float8_e4m3fn)
        out[k] = v
    return traverse_util.unflatten_dict(out)


class HFTextEncoder:
    """Lazy wrapper around a transformers Flax text encoder.

    kind: 't5' | 'clip' | 'clip_pooled'
    path: HF-layout folder with weights + tokenizer (pass tokenizer_path to
    override). fp8=True applies cast_te_params_fp8 after load
    (`text_encoder_fp8`).
    """

    def __init__(self, kind: str, path: str, max_length: int,
                 tokenizer_path: Optional[str] = None,
                 output_key: Optional[str] = None, dtype=None,
                 fp8: bool = False):
        self.kind = kind
        self.path = path
        self.max_length = max_length
        self.tokenizer_path = tokenizer_path or path
        self.output_key = output_key
        self.dtype = dtype
        self.fp8 = fp8
        self._model = None
        self._tokenizer = None
        self._jitted = None

    def _load(self):
        if self._model is not None:
            return
        import jax
        from transformers import AutoTokenizer

        self._tokenizer = AutoTokenizer.from_pretrained(self.tokenizer_path)
        if self.kind == "t5":
            from transformers import FlaxT5EncoderModel

            self._model = FlaxT5EncoderModel.from_pretrained(
                self.path, from_pt=True
            )

            def run(input_ids, attention_mask):
                out = self._model.module.apply(
                    {"params": self._model.params},
                    input_ids=input_ids,
                    attention_mask=attention_mask,
                )
                return out.last_hidden_state

        elif self.kind in ("clip", "clip_pooled"):
            from transformers import FlaxCLIPTextModel

            self._model = FlaxCLIPTextModel.from_pretrained(
                self.path, from_pt=True
            )
            pooled = self.kind == "clip_pooled"

            def run(input_ids, attention_mask):
                out = self._model.module.apply(
                    {"params": self._model.params},
                    input_ids=input_ids,
                    attention_mask=attention_mask,
                )
                return out.pooler_output if pooled else out.last_hidden_state

        else:
            raise NotImplementedError(self.kind)
        if self.fp8:
            self._model.params = cast_te_params_fp8(self._model.params)
        self._jitted = jax.jit(run)

    def encode(self, captions: List[str], return_mask: bool = False):
        self._load()
        tok = self._tokenizer(
            captions,
            padding="max_length",
            truncation=True,
            max_length=self.max_length,
            return_tensors="np",
        )
        emb = np.asarray(
            self._jitted(tok["input_ids"], tok["attention_mask"])
        )
        if return_mask:
            return emb, np.asarray(tok["attention_mask"])
        return emb
