"""Checkpoint/save triggers + Orbax train-state checkpoints + model export.

TPU-native re-design of reference utils/saver.py:14-177:
- training-state checkpoints (resume artifact): Orbax save of
  {trainable, opt_state, step, examples} + dataloader state JSON, replacing
  DeepSpeed save_checkpoint with client_state (saver.py:118-128). Frozen
  base weights are excluded (exclude_frozen_parameters=True parity).
- saved models/LoRAs (inference artifact): per-model export writers
  (e.g. diffusers-lora safetensors via pipeline.save_adapter), replacing the
  per-stage partial-state-dict merge (saver.py:58-116) — unnecessary here
  because params live in one sharded pytree.
- triggers: save_every_n_epochs / steps / examples, checkpoint_every_n_*,
  and the 'save' / 'save_quit' signal files polled each step
  (saver.py:148-163).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Any, Dict, Optional


def _reset_schedule_counts(opt_state):
    """Zero every ScaleByScheduleState.count in a (possibly nested) optax
    state tree, restarting LR schedules without touching moments."""
    import jax.numpy as jnp
    import optax

    def rec(node):
        if isinstance(node, optax.ScaleByScheduleState):
            return node._replace(count=jnp.zeros_like(node.count))
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*(rec(getattr(node, f)) for f in node._fields))
        if isinstance(node, tuple):
            return tuple(rec(x) for x in node)
        if isinstance(node, list):
            return [rec(x) for x in node]
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(opt_state)


class Saver:
    def __init__(self, config: Dict[str, Any], run_dir, pipeline,
                 dataloader=None):
        self.config = config
        self.run_dir = Path(run_dir)
        self.pipeline = pipeline
        self.dataloader = dataloader
        self.last_checkpoint_time = time.time()
        self.run_dir.mkdir(parents=True, exist_ok=True)

    # --- training-state checkpoints ----------------------------------------

    def _ckpt_dir(self, step: int) -> Path:
        return self.run_dir / f"global_step{step}"

    def save_checkpoint(self, state, step: int):
        import orbax.checkpoint as ocp

        path = self._ckpt_dir(step)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                (path / "state").absolute(),
                {
                    "trainable": state.trainable,
                    "opt_state": state.opt_state,
                    "step": state.step,
                    "examples": state.examples,
                },
            )
        meta = {"step": int(step)}
        if self.dataloader is not None:
            meta["custom_loader"] = self.dataloader.state_dict()
        (path / "client_state.json").write_text(json.dumps(meta))
        (self.run_dir / "latest").write_text(path.name)
        self.last_checkpoint_time = time.time()

    def load_checkpoint(self, state, step: Optional[int] = None,
                        reset_optimizer: bool = False,
                        reset_optimizer_params: bool = False,
                        reset_dataloader: bool = False):
        """Restore into an abstract/concrete state template. Returns
        (state, client_meta)."""
        import orbax.checkpoint as ocp

        if step is None:
            latest = self.run_dir / "latest"
            if not latest.exists():
                raise FileNotFoundError(f"no checkpoint in {self.run_dir}")
            path = self.run_dir / latest.read_text().strip()
        else:
            path = self._ckpt_dir(step)
        target = {
            "trainable": state.trainable,
            "opt_state": state.opt_state,
            "step": state.step,
            "examples": state.examples,
        }
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore((path / "state").absolute(), target)
        meta = json.loads((path / "client_state.json").read_text())
        opt_state = (
            state.opt_state if reset_optimizer else restored["opt_state"]
        )
        if reset_optimizer_params and not reset_optimizer:
            # reference --reset_optimizer_params (train.py:49,863-867): keep
            # the optimizer moments but take hyperparameters afresh from the
            # config and restart the LR schedule
            # (load_lr_scheduler_states=False + param_groups restore). Our
            # hyperparams are rebuilt from config every run already; the only
            # checkpointed schedule position is the ScaleByScheduleState
            # count, which we zero here.
            opt_state = _reset_schedule_counts(opt_state)
        new_state = state.replace(
            trainable=restored["trainable"],
            step=restored["step"],
            examples=restored["examples"],
            opt_state=opt_state,
        )
        if (
            self.dataloader is not None
            and not reset_dataloader
            and "custom_loader" in meta
        ):
            self.dataloader.load_state_dict(meta["custom_loader"])
        return new_state, meta

    # --- model / adapter export --------------------------------------------

    def save_model(self, name: str, state):
        out_dir = self.run_dir / name
        out_dir.mkdir(parents=True, exist_ok=True)
        if "adapter" in self.config:
            self.pipeline.save_adapter(out_dir, state.trainable)
        else:
            from ..training.train_state import merge_params

            self.pipeline.save_model(
                out_dir, merge_params(state.trainable, state.frozen)
            )
        # provenance: copy of the run config (reference saver.py:84)
        cfg_path = self.config.get("_config_path")
        if cfg_path and os.path.exists(cfg_path):
            import shutil

            shutil.copy(cfg_path, out_dir / "training_config.toml")

    # --- triggers -----------------------------------------------------------

    def _need_to_checkpoint(self, epoch_rollover=False, epoch=0) -> bool:
        c = self.config
        if epoch_rollover:
            return (
                "checkpoint_every_n_epochs" in c
                and epoch % c["checkpoint_every_n_epochs"] == 0
            )
        if "checkpoint_every_n_minutes" in c:
            elapsed = (time.time() - self.last_checkpoint_time) / 60
            return elapsed >= c["checkpoint_every_n_minutes"]
        return False

    def process_epoch(self, state, epoch: int, step: int):
        """Call when the dataloader rolled into a new epoch. Returns the new
        epoch number or None when config['epochs'] is exhausted."""
        if self._need_to_checkpoint(epoch_rollover=True, epoch=epoch):
            self.save_checkpoint(state, step)
        if (
            "save_every_n_epochs" in self.config
            and epoch % self.config["save_every_n_epochs"] == 0
        ):
            self.save_model(f"epoch{epoch}", state)
        new_epoch = epoch + 1
        if new_epoch > self.config.get("epochs", 10**9):
            return None
        return new_epoch

    def process_step(self, state, step: int, examples: int):
        """Per-step triggers incl. signal files. Returns True to quit."""
        should_save, should_quit = False, False
        save_f = self.run_dir / "save"
        quit_f = self.run_dir / "save_quit"
        if save_f.is_file():
            should_save = True
            save_f.unlink()
        elif quit_f.is_file():
            should_save = should_quit = True
            quit_f.unlink()

        c = self.config
        if "save_every_n_steps" in c and step % c["save_every_n_steps"] == 0:
            self.save_model(f"step{step}", state)
        if "save_every_n_examples" in c:
            per = c["save_every_n_examples"]
            if examples // per != getattr(self, "_last_examples_save", 0):
                self._last_examples_save = examples // per
                self.save_model(f"examples{examples}", state)
        if self._need_to_checkpoint() or should_save:
            self.save_checkpoint(state, step)
        return should_quit


def get_most_recent_run_dir(output_dir) -> str:
    """Reference train.py:146-147."""
    runs = sorted(Path(output_dir).glob("*"))
    if not runs:
        raise FileNotFoundError(f"no runs in {output_dir}")
    return str(runs[-1])
