"""Config-surface parity extras: lr schedulers, force_constant_lr,
merge_adapters fusion, dataset subsample/shuffle/default-mask options.

Reference surfaces: train.py:839-852 (lr_scheduler + warmup),
train.py:883-886 (force_constant_lr), models/base.py:562-581
(merge_adapters), utils/dataset.py:480, 661-662 (default_mask_file),
703-707 (shuffle_metadata), 732, 760-762 (shuffle_tags), 983-985
(subsample_ratio), 970-978 (fixed seed-0 bucket interleave).
"""

import numpy as np
import pytest

from diffusion_pipe_tpu.training.optimizers import build_lr_schedule


def _lr_at(sched, step):
    return float(sched(step)) if callable(sched) else float(sched)


def test_lr_scheduler_constant_default():
    s = build_lr_schedule({}, 1e-3)
    assert _lr_at(s, 0) == pytest.approx(1e-3)
    assert _lr_at(s, 10_000) == pytest.approx(1e-3)


def test_lr_scheduler_linear():
    s = build_lr_schedule({"lr_scheduler": "linear", "_total_steps": 100}, 1.0)
    assert _lr_at(s, 0) == pytest.approx(1.0)
    assert _lr_at(s, 50) == pytest.approx(0.5)
    assert _lr_at(s, 100) == pytest.approx(0.0)


def test_lr_scheduler_cosine():
    s = build_lr_schedule({"lr_scheduler": "cosine", "_total_steps": 100}, 1.0)
    assert _lr_at(s, 0) == pytest.approx(1.0)
    # CosineAnnealingLR(T_max=100, eta_min=1e-6) midpoint
    mid = 1e-6 + (1.0 - 1e-6) * 0.5
    assert _lr_at(s, 50) == pytest.approx(mid, rel=1e-4)
    assert _lr_at(s, 100) == pytest.approx(1e-6, abs=1e-7)


def test_lr_scheduler_warmup_then_main():
    cfg = {"lr_scheduler": "linear", "_total_steps": 100, "warmup_steps": 10}
    s = build_lr_schedule(cfg, 1.0)
    # LinearLR(start_factor=1/10): first step at base/10
    assert _lr_at(s, 0) == pytest.approx(0.1)
    assert _lr_at(s, 10) == pytest.approx(1.0)
    # main schedule restarts at the milestone (SequentialLR semantics)
    assert _lr_at(s, 60) == pytest.approx(0.5)


def test_force_constant_lr():
    cfg = {"lr_scheduler": "cosine", "_total_steps": 100,
           "warmup_steps": 10, "force_constant_lr": 3e-5}
    s = build_lr_schedule(cfg, 1.0)
    assert _lr_at(s, 0) == pytest.approx(3e-5)
    assert _lr_at(s, 99) == pytest.approx(3e-5)


def test_lr_scheduler_unknown_raises():
    with pytest.raises(NotImplementedError):
        build_lr_schedule({"lr_scheduler": "polynomial"}, 1.0)


def test_merge_adapters_fuses_lora(tmp_path):
    from safetensors.numpy import save_file

    from diffusion_pipe_tpu.models.weights import (
        merge_adapters_into_state_dict,
    )

    rng = np.random.default_rng(0)
    w = rng.standard_normal((8, 6)).astype(np.float32)
    sd = {"blocks.0.attn.q.weight": w.copy()}
    down = rng.standard_normal((2, 6)).astype(np.float32)
    up = rng.standard_normal((8, 2)).astype(np.float32)
    lora = {
        "diffusion_model.blocks.0.attn.q.lora_A.weight": down,
        "diffusion_model.blocks.0.attn.q.lora_B.weight": up,
        "diffusion_model.blocks.0.attn.q.alpha": np.asarray(4.0, np.float32),
    }
    f = tmp_path / "adapter.safetensors"
    save_file(lora, str(f))
    out = merge_adapters_into_state_dict(sd, [str(f)])
    expected = w + (4.0 / 2) * (up @ down)
    np.testing.assert_allclose(
        out["blocks.0.attn.q.weight"], expected, rtol=1e-6
    )
    # kohya lora_down/lora_up dialect, no alpha -> scale 1
    lora2 = {
        "blocks.0.attn.q.lora_down.weight": down,
        "blocks.0.attn.q.lora_up.weight": up,
    }
    f2 = tmp_path / "adapter2.safetensors"
    save_file(lora2, str(f2))
    out2 = merge_adapters_into_state_dict(sd, [str(f2)])
    np.testing.assert_allclose(
        out2["blocks.0.attn.q.weight"], w + up @ down, rtol=1e-6
    )


def test_int8_matmul_without_adapter_rejected():
    """int8_matmul freezes base kernels (dw=0 custom vjp); full fine-tune
    must be rejected at config time rather than silently not training."""
    import pytest

    from diffusion_pipe_tpu.config import set_config_defaults

    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "flux", "dtype": "bfloat16", "int8_matmul": True},
        "optimizer": {"type": "adamw", "lr": 1e-4},
    }
    with pytest.raises(ValueError, match="int8_matmul"):
        set_config_defaults(cfg)
    cfg["adapter"] = {"type": "lora", "rank": 4}
    set_config_defaults(cfg)  # fine with an adapter


def test_reset_schedule_counts():
    import jax.numpy as jnp
    import numpy as np
    import optax

    from diffusion_pipe_tpu.training.saver import _reset_schedule_counts

    tx = optax.chain(
        optax.scale_by_adam(),
        optax.scale_by_schedule(optax.linear_schedule(1e-3, 0.0, 100)),
    )
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    for _ in range(5):
        _, state = tx.update({"w": jnp.ones(3)}, state, params)
    adam_state, sched_state = state
    assert int(sched_state.count) == 5 and int(adam_state.count) == 5
    reset = _reset_schedule_counts(state)
    # schedule restarts; adam moments/count untouched
    assert int(reset[1].count) == 0
    assert int(reset[0].count) == 5
    np.testing.assert_array_equal(
        np.asarray(reset[0].mu["w"]), np.asarray(adam_state.mu["w"])
    )
