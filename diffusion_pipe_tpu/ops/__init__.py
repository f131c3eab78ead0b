"""Compute primitives: Pallas TPU kernels + XLA fallbacks.

TPU-native replacement for the reference's native-kernel dependency surface
(SURVEY.md section 2.6): flash-attn 2/3 and torch SDPA become the in-repo
Pallas flash-attention kernel (ops/flash_attention.py) behind a single
dispatcher (ops/attention.py); bitsandbytes 8-bit optimizer kernels become
int8 blockwise quantization ops (ops/quant.py).
"""

from .attention import dot_product_attention  # noqa: F401
