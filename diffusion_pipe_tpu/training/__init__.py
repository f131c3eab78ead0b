"""Training core: objectives, losses, LoRA, optimizers, trainer, checkpointing."""
