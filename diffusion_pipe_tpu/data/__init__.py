"""Data pipeline: media preprocessing, bucketing, fingerprinted cache, loader.

TPU-native re-design of reference utils/dataset.py (1462 LoC) + utils/cache.py
+ models/base.py PreprocessMediaFile. The multi-process GPU-server caching
system (reference dataset.py:1047-1255 with tensor-IPC, utils/reduction.py)
collapses into a process-local loop around *jitted, batched* VAE/TE encoders —
XLA inference is the throughput story, so no queue/Pipe machinery is needed.
"""
