"""Test configuration: force an 8-virtual-device CPU platform.

Multi-device (DP/PP/TP) logic is tested on a CPU mesh so the suite runs
anywhere (SURVEY.md section 4 "Implication for the TPU build"). Pallas
kernels run under the interpreter (DPIPE_PALLAS_INTERPRET=1) so the real
kernel code path is exercised without TPU hardware.

Must set env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("DPIPE_PALLAS_INTERPRET", "1")

import jax  # noqa: E402

# The environment's jax plugin may force its own platform list at import time
# (observed: jax_platforms == "axon,cpu" regardless of env); override it.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite is dominated by XLA compiles of
# tiny-model train steps; cache them across runs.
_cache_dir = os.environ.get(
    "DPIPE_TEST_CACHE", os.path.expanduser("~/.cache/dpipe_tpu_xla_tests")
)
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402

# Fast core tier: config/data/flow/PP/1F1B/flash-attention.
# Run with `pytest -m quick`; target <5 minutes with a warm compile cache.
_QUICK_FILES = {
    "test_config.py", "test_config_extras.py", "test_data_pipeline.py",
    "test_flow.py", "test_losses.py", "test_mesh.py",
    "test_model_registry.py", "test_pipeline_parallel.py",
    "test_pipeline_1f1b.py", "test_flash_attention.py",
}

# Gate tier: the quick tier minus its two compile-heavy files
# (test_model_registry ~9 min and test_pipeline_parallel ~20 min on a
# single-CPU host — measured cold; everything below finishes <90 s cold
# combined). `pytest -m gate` is the pre-commit / CI-entry check sized
# for ONE cpu with a cold XLA cache; sampler numerics ride along because
# they are pure-math fast.
_GATE_FILES = (_QUICK_FILES - {
    "test_model_registry.py", "test_pipeline_parallel.py",
}) | {"test_sampler_numerics.py"}


def pytest_collection_modifyitems(items):
    for item in items:
        base = item.fspath.basename
        if base in _QUICK_FILES:
            item.add_marker(pytest.mark.quick)
        if base in _GATE_FILES:
            item.add_marker(pytest.mark.gate)


# Modules whose individual tests each compile a full (often multi-device)
# train step: cache accumulation WITHIN one such module segfaulted the
# single-process full run at ~288/423 (inside test_model_pp.py) even with
# the per-module cleanup below — clear after every test there. Warm
# recompiles come from the persistent on-disk cache.
_PER_TEST_CLEAR_FILES = {
    "test_model_pp.py", "test_pipeline_parallel.py", "test_pipeline_1f1b.py",
}


@pytest.fixture(autouse=True)
def _release_jax_memory_per_test(request):
    yield
    fspath = getattr(request.node, "fspath", None)
    if fspath is not None and fspath.basename in _PER_TEST_CLEAR_FILES:
        import gc

        jax.clear_caches()
        gc.collect()


@pytest.fixture(autouse=True, scope="module")
def _release_jax_memory_per_module():
    """Keep one-process full-suite runs within host RAM.

    Every jitted executable and its constant buffers stay alive in jax's
    in-process caches; across ~300 compile-heavy tests that accumulation
    segfaulted the single-process run (observed at ~260 tests on this
    125 GB host). Dropping the caches after each module trades warm
    recompiles (served from the persistent on-disk cache above) for a
    bounded footprint."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
