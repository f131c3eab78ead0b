"""Config surface tests (reference train.py:93-143 semantics)."""

import pytest

from diffusion_pipe_tpu.config import (
    load_toml,
    lookup_batch_size,
    normalize_batch_size_map,
    resolve_batch_size_maps,
    set_config_defaults,
)


def _minimal_config(**kw):
    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "flux", "dtype": "bfloat16"},
    }
    cfg.update(kw)
    return cfg


def test_requires_save_trigger():
    with pytest.raises(ValueError):
        set_config_defaults({"model": {"type": "flux", "dtype": "bfloat16"}})


def test_defaults_applied():
    cfg = set_config_defaults(_minimal_config())
    assert cfg["pipeline_stages"] == 1
    assert cfg["gradient_clipping"] == 1.0
    assert cfg["model"]["guidance"] == 1.0
    assert cfg["model"]["dtype"] == "bfloat16"
    assert cfg["eval_before_first_step"] is True


def test_adapter_alpha_forced_to_rank():
    cfg = set_config_defaults(
        _minimal_config(adapter={"type": "lora", "rank": 16})
    )
    assert cfg["adapter"]["alpha"] == 16
    assert cfg["adapter"]["dropout"] == 0.0
    assert cfg["adapter"]["dtype"] == "bfloat16"
    with pytest.raises(NotImplementedError):
        set_config_defaults(
            _minimal_config(adapter={"type": "lora", "rank": 16, "alpha": 8})
        )


def test_batch_size_maps():
    assert normalize_batch_size_map(4) == {None: 4}
    assert normalize_batch_size_map([[512, 4], [768, 2]]) == {512: 4, 768: 2}
    m = {512: 4, 768: 2}
    assert lookup_batch_size(m, 512) == 4
    assert lookup_batch_size(m, 640) == 4  # largest configured <= resolution
    assert lookup_batch_size(m, 1024) == 2
    maps = resolve_batch_size_maps(
        _minimal_config(micro_batch_size_per_gpu=[[512, 4]])
    )
    assert maps["train"] == {512: 4}
    assert maps["eval"] == maps["train"]


def test_toml_roundtrip(tmp_path):
    p = tmp_path / "c.toml"
    p.write_text(
        "save_every_n_epochs = 1\n[model]\ntype = 'flux'\ndtype = 'bfloat16'\n"
    )
    cfg = load_toml(str(p))
    assert cfg["model"]["type"] == "flux"
