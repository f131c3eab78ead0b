"""diffusion-pipe-tpu: TPU-native training framework for diffusion models.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of
tdrussell/diffusion-pipe (reference at /root/reference): pipeline- and
data-parallel training of large image/video diffusion transformers with
LoRA/full fine-tuning, pre-cached VAE latents and text embeddings,
aspect-ratio/size/frame bucketing, masked flow-matching and
eps/v-prediction losses, TOML configs, and checkpoint/resume.

Layer map (mirrors SURVEY.md section 1, re-expressed TPU-first):
  config.py    - TOML config surface (reference train.py:93-143 schema)
  mesh.py      - device mesh + named sharding axes (data/stage/tensor)
  ops/         - Pallas kernels + XLA compute primitives (attention, RoPE, ...)
  models/      - Flax model definitions + per-model pipeline plugins
  parallel/    - GPipe/1F1B pipeline over the 'stage' mesh axis
  data/        - bucketing, fingerprinted latent/text-embed cache, loader
  training/    - flow-matching objectives, losses, LoRA, optimizers, trainer
"""

__version__ = "0.1.0"
