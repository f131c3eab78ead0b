"""Every registered model family can run the caching phase (--cache_only
semantics: scan -> VAE latent cache -> text-embedding caches) on a tiny
image dataset, and the loader yields a collated batch with the family's
cacheable keys — the reference's universal latent/TE caching contract
(get_call_vae_fn / get_call_text_encoder_fn, models/base.py:340-358)."""

import numpy as np
import pytest
from PIL import Image

from diffusion_pipe_tpu.data.dataset import Dataset
from diffusion_pipe_tpu.data.loader import DatasetManager, PipelineDataLoader
from diffusion_pipe_tpu.models import get_model_class

# one representative type per family file (aliases excluded)
ALL_TYPES = [
    "flux", "sdxl", "wan", "sd3", "hunyuan-video", "chroma", "ltx-video",
    "lumina_2", "qwen_image", "qwen_image_edit", "cosmos_predict2", "anima",
    "cosmos", "hidream", "auraflow", "omnigen2", "z_image", "flux2",
    "ernie_image", "hunyuan_image", "hunyuan_video_15", "ideogram4",
    "krea2", "ltx2",
]


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    for i in range(4):
        arr = rng.integers(0, 255, (96, 96, 3), np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.png")
        (d / f"img_{i}.txt").write_text(f"caption {i}")
    return d


@pytest.mark.parametrize("model_type", ALL_TYPES)
def test_cache_and_load(model_type, image_dir, tmp_path):
    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": model_type, "dtype": "float32", "_tiny": True},
        "optimizer": {"type": "adamw", "lr": 1e-4},
    }
    pipeline = get_model_class(model_type)(cfg)
    ds_cfg = {
        "resolutions": [64],
        "directory": [{"path": str(image_dir)}],
    }
    ds = Dataset(ds_cfg, pipeline,
                 support_video=pipeline.framerate is not None)
    manager = DatasetManager(pipeline, caching_batch_size=2)
    manager.register(ds)
    manager.cache()

    ds.post_init(0, 1, micro_batch_size=2, gradient_accumulation_steps=1)
    loader = PipelineDataLoader(ds)
    _, batch = next(loader)
    assert "latents" in batch
    assert np.isfinite(batch["latents"]).all()
    for key in pipeline.cacheable_text_embeddings:
        assert key in batch, (model_type, key, sorted(batch))


def test_wan_ti2v_cache_and_forward(image_dir):
    """ti2v-5b path: latents cache through the Wan2.2 VAE
    (reference models/wan/vae2_2.py; VERDICT missing #4) and a forward
    step runs."""
    import jax
    import jax.numpy as jnp

    cfg = {
        "save_every_n_epochs": 1,
        "model": {"type": "wan", "dtype": "float32", "_tiny": True,
                  "variant_type": "ti2v"},
        "optimizer": {"type": "adamw", "lr": 1e-4},
    }
    pipeline = get_model_class("wan")(cfg)
    assert pipeline.wan_config.model_type == "ti2v"
    assert pipeline.framerate == 24
    ds = Dataset({"resolutions": [64], "directory": [{"path": str(image_dir)}]},
                 pipeline, support_video=True)
    manager = DatasetManager(pipeline, caching_batch_size=2)
    manager.register(ds)
    manager.cache()
    ds.post_init(0, 1, micro_batch_size=2, gradient_accumulation_steps=1)
    _, batch = next(PipelineDataLoader(ds))
    assert batch["latents"].shape[1] == 8  # tiny wan2.2 z_dim
    params = pipeline.init_params(jax.random.PRNGKey(0))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    mi, target, mask = pipeline.prepare_inputs(jax.random.PRNGKey(1), jb)
    out = pipeline.forward(params, mi)
    loss = pipeline.loss_fn(out, target, mask)
    assert np.isfinite(float(loss))
