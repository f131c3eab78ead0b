"""Data pipeline: scan -> bucket -> cache -> load, determinism and resume."""

import numpy as np
import pytest
from PIL import Image

from diffusion_pipe_tpu.data.cache import Cache, map_and_cache
from diffusion_pipe_tpu.data.dataset import Dataset
from diffusion_pipe_tpu.data.loader import DatasetManager, PipelineDataLoader
from diffusion_pipe_tpu.data.preprocess import PreprocessMediaFile


class FakePipeline:
    """Identity-ish encoders: VAE = 8x avg-pool to 4ch, TEs = fixed vectors."""

    name = "fake"
    framerate = None

    def get_call_vae_fn(self):
        def fn(pixels):
            b, c, h, w = pixels.shape
            lat = pixels.reshape(b, c, h // 8, 8, w // 8, 8).mean((3, 5))
            lat = np.concatenate([lat, lat[:, :1]], axis=1)  # 4 channels
            return {"latents": lat.astype(np.float32)}

        return fn

    def get_call_text_encoder_fns(self):
        def te1(captions):
            return {
                "t5_embed": np.stack(
                    [np.full((7, 16), len(c), np.float32) for c in captions]
                )
            }

        def te2(captions):
            return {
                "clip_embed": np.stack(
                    [np.full((8,), hash(c) % 97, np.float32) for c in captions]
                )
            }

        return [te1, te2]


@pytest.fixture
def image_dir(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    rng = np.random.default_rng(0)
    sizes = [(256, 256), (256, 256), (320, 240), (240, 320), (256, 256),
             (512, 512)]
    for i, (w, h) in enumerate(sizes):
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.png")
        (d / f"img_{i}.txt").write_text(f"caption number {i}")
    return d


def _dataset_config(image_dir, **kw):
    cfg = {
        "resolutions": [64],
        "enable_ar_bucket": True,
        "min_ar": 0.5,
        "max_ar": 2.0,
        "num_ar_buckets": 5,
        "directory": [{"path": str(image_dir), "num_repeats": 1}],
    }
    cfg.update(kw)
    return cfg


def test_cache_roundtrip(tmp_path):
    c = Cache(tmp_path / "c", "fp1")
    c.write(0, {"a": np.arange(6, dtype=np.float32).reshape(2, 3)},
            {"caption": "hello"})
    out = c.read(0)
    np.testing.assert_array_equal(out["a"], np.arange(6).reshape(2, 3))
    tensors, meta = c.read(0, with_metadata=True)
    assert meta["caption"] == "hello"
    # fingerprint mismatch clears
    c2 = Cache(tmp_path / "c", "fp2")
    assert len(c2) == 0


def test_map_and_cache_resumes(tmp_path):
    calls = []

    def map_fn(items):
        calls.extend(items)
        return [({"x": np.array([i], np.float32)}, None) for i in items]

    c = map_and_cache([1, 2, 3, 4], map_fn, tmp_path / "c", "fp", batch_size=2)
    assert len(c) == 4 and calls == [1, 2, 3, 4]
    calls.clear()
    c = map_and_cache([1, 2, 3, 4], map_fn, tmp_path / "c", "fp", batch_size=2)
    assert calls == []  # fully cached


def test_preprocess_image(tmp_path):
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (100, 150, 3), np.uint8)
    )
    p = tmp_path / "x.png"
    img.save(p)
    pre = PreprocessMediaFile(round_height=16, round_width=16)
    results = pre((None, str(p)), None, (64, 48, 1))
    px, mask = results[0]
    assert px.shape == (3, 48, 64)  # (C, H, W), rounded to 16
    assert px.min() >= -1.0 and px.max() <= 1.0
    assert mask is None


def test_end_to_end_scan_cache_iterate(image_dir):
    pipeline = FakePipeline()
    ds = Dataset(_dataset_config(image_dir), pipeline)
    manager = DatasetManager(pipeline, caching_batch_size=2)
    manager.register(ds)
    manager.cache()
    ds.post_init(0, 1, micro_batch_size=2, gradient_accumulation_steps=1)
    loader = PipelineDataLoader(ds)
    sb, batch = next(loader)
    assert batch["latents"].shape[0] == 2
    assert "t5_embed" in batch and "clip_embed" in batch
    assert batch["latents"].shape[2:] == (sb[1] // 8, sb[0] // 8)

    # deterministic order: a fresh loader yields the same first batch
    loader2 = PipelineDataLoader(ds)
    sb2, batch2 = next(loader2)
    assert sb2 == sb
    np.testing.assert_array_equal(batch["latents"], batch2["latents"])


def test_loader_epoch_and_resume(image_dir):
    pipeline = FakePipeline()
    ds = Dataset(_dataset_config(image_dir), pipeline)
    DatasetManager(pipeline).register(ds)
    m = DatasetManager(pipeline, caching_batch_size=2)
    m.register(ds)
    m.cache()
    ds.post_init(0, 1, micro_batch_size=1, gradient_accumulation_steps=1)
    loader = PipelineDataLoader(ds)
    n = ds.batches_per_epoch()
    seq = [next(loader) for _ in range(n + 1)]
    assert loader.epoch == 2

    # resume: replay to the same position and continue identically
    loader_b = PipelineDataLoader(ds)
    for _ in range(3):
        next(loader_b)
    state = loader_b.state_dict()
    loader_c = PipelineDataLoader(ds)
    loader_c.load_state_dict(state)
    sb_b, batch_b = next(loader_b)
    sb_c, batch_c = next(loader_c)
    assert sb_b == sb_c
    np.testing.assert_array_equal(batch_b["latents"], batch_c["latents"])


def test_dp_rank_slicing(image_dir):
    pipeline = FakePipeline()
    ds = Dataset(_dataset_config(image_dir), pipeline)
    m = DatasetManager(pipeline, caching_batch_size=2)
    m.register(ds)
    m.cache()
    # two DP ranks must see disjoint examples within the same global batch
    ds.post_init(0, 2, micro_batch_size=1, gradient_accumulation_steps=1)
    b0 = [next(PipelineDataLoader(ds))[1]]
    ds.post_init(1, 2, micro_batch_size=1, gradient_accumulation_steps=1)
    b1 = [next(PipelineDataLoader(ds))[1]]
    assert not np.array_equal(b0[0]["latents"], b1[0]["latents"])


def test_tar_dataset_scan_and_cache(tmp_path):
    """Images inside a .tar archive with captions.json (reference
    dataset.py:636-687 tar member enumeration)."""
    import io
    import json
    import tarfile

    d = tmp_path / "data"
    d.mkdir()
    rng = np.random.default_rng(1)
    captions = {}
    with tarfile.TarFile(d / "shard.tar", "w") as tf:
        for i in range(4):
            arr = rng.integers(0, 255, (256, 256, 3), np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            buf.seek(0)
            info = tarfile.TarInfo(name=f"sub/img_{i}.png")
            info.size = len(buf.getvalue())
            tf.addfile(info, buf)
            captions[f"sub/img_{i}.png"] = [f"tar caption {i}"]
    (d / "captions.json").write_text(json.dumps(captions))

    pipeline = FakePipeline()
    ds = Dataset(_dataset_config(d), pipeline)
    manager = DatasetManager(pipeline, caching_batch_size=2)
    manager.register(ds)
    manager.cache()
    ds.post_init(0, 1, micro_batch_size=2, gradient_accumulation_steps=1)
    loader = PipelineDataLoader(ds)
    sb, batch = next(loader)
    assert batch["latents"].shape[0] == 2
    assert "t5_embed" in batch


def test_subsample_ratio_and_fixed_interleave(image_dir):
    """subsample_ratio truncates the seed-0 interleave (reference
    dataset.py:970-985); the order is identical across epochs."""
    pipeline = FakePipeline()
    full = Dataset(_dataset_config(image_dir), pipeline)
    m = DatasetManager(pipeline, caching_batch_size=2)
    m.register(full)
    m.cache()
    full.post_init(0, 1, micro_batch_size=1, gradient_accumulation_steps=1)
    n_full = full.batches_per_epoch()
    assert len(full) == n_full

    sub = Dataset(_dataset_config(image_dir, subsample_ratio=0.5), pipeline)
    m2 = DatasetManager(pipeline, caching_batch_size=2)
    m2.register(sub)
    m2.cache()
    sub.post_init(0, 1, micro_batch_size=1, gradient_accumulation_steps=1)
    assert sub.batches_per_epoch() == int(n_full * 0.5)
    # the subsampled order is the truncated prefix of the full order
    assert sub.iteration_order == full.iteration_order[: len(sub)]
    # identical order each epoch (reference shuffles ONCE with seed 0)
    e1 = [sb for sb, _ in full.iter_epoch(1)]
    e2 = [sb for sb, _ in full.iter_epoch(2)]
    assert e1 == e2


def test_default_mask_file_and_shuffle_metadata(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    rng = np.random.default_rng(1)
    for i in range(8):
        Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), np.uint8)
        ).save(d / f"img_{i}.png")
        (d / f"img_{i}.txt").write_text(f"cap {i}")
    mask = tmp_path / "mask.png"
    Image.fromarray(np.full((64, 64), 255, np.uint8)).save(mask)

    cfg = _dataset_config(d)
    cfg["directory"][0]["default_mask_file"] = str(mask)
    ds = Dataset(cfg, FakePipeline())
    buckets = ds.scan()
    recs = [r for bs in buckets.values() for b in bs for r in b.records]
    assert all(r.mask_path == str(mask) for r in recs)

    # shuffle_metadata=False keeps sorted file order at the directory
    # level (before the per-size-bucket shuffle)
    cfg2 = _dataset_config(d, shuffle_metadata=False)
    ds2 = Dataset(cfg2, FakePipeline())
    g2 = ds2.directories[0].scan()
    files = [r.spec[1] for recs in g2.values() for r in recs]
    assert files == sorted(files)
    # default (shuffle_metadata=True) permutes that order
    g3 = Dataset(_dataset_config(d), FakePipeline()).directories[0].scan()
    files3 = [r.spec[1] for recs in g3.values() for r in recs]
    assert sorted(files3) == sorted(files)
    assert files3 != files

    # bogus default_mask_file fails fast
    cfg3 = _dataset_config(d)
    cfg3["directory"][0]["default_mask_file"] = str(tmp_path / "nope.png")
    with pytest.raises(RuntimeError):
        Dataset(cfg3, FakePipeline())


def test_shuffle_tags_backcompat(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(d / "a.png")
    (d / "a.txt").write_text("tag1, tag2, tag3")
    cfg = _dataset_config(d, shuffle_tags=True)
    ds = Dataset(cfg, FakePipeline())
    assert ds.directories[0].cache_shuffle_num == 1


def test_native_cache_reader_matches_python(tmp_path):
    """The mmap+prefetch C++ reader (native/cache_reader.cpp) returns
    byte-identical records to the Python read path and tolerates missing
    indices, invalidation-on-write, and prefetch calls."""
    from diffusion_pipe_tpu.data import native_cache

    if not native_cache.available():
        import pytest

        pytest.skip("no C++ toolchain for the native reader")
    c = Cache(tmp_path / "c", "fp1", shard_size=4096)  # force multi-shard
    rng = np.random.default_rng(0)
    tensors = []
    for i in range(12):
        t = {"a": rng.standard_normal((64, 8)).astype(np.float32),
             "b": rng.integers(0, 100, (5,)).astype(np.int32)}
        tensors.append(t)
        c.write(i, t, {"caption": f"cap {i}"})
    assert c._native_reader() is not None  # built and loaded
    c.prefetch(np.arange(12))
    for i in range(12):
        out = c.read(i)
        np.testing.assert_array_equal(out["a"], tensors[i]["a"])
        np.testing.assert_array_equal(out["b"], tensors[i]["b"])
    _, meta = c.read(3, with_metadata=True)
    assert meta["caption"] == "cap 3"
    # write invalidates; reader rebuilds with the new record
    c.write(12, {"a": np.ones((2, 2), np.float32)})
    np.testing.assert_array_equal(c.read(12)["a"], np.ones((2, 2)))
    c.close()


def test_metadata_cache_skips_probing(image_dir, monkeypatch):
    """Second scan loads dims/captions from metadata.json without opening
    any media file; --trust_cache even skips fingerprint revalidation
    (reference train.py:52, dataset.py:532-553)."""
    from diffusion_pipe_tpu.data.dataset import DirectoryDataset

    pipeline = FakePipeline()
    probes = []
    orig_probe = DirectoryDataset._probe

    def counting_probe(self, filepath, tar_path=None):
        probes.append(filepath)
        return orig_probe(self, filepath, tar_path=tar_path)

    monkeypatch.setattr(DirectoryDataset, "_probe", counting_probe)

    ds = Dataset(_dataset_config(image_dir), pipeline)
    ds.scan()
    assert len(probes) > 0
    first = dict(ds.buckets_by_size)

    probes.clear()
    ds2 = Dataset(_dataset_config(image_dir), pipeline)
    ds2.scan()
    assert probes == []  # fingerprint hit: loaded from metadata.json
    assert sorted(ds2.buckets_by_size) == sorted(first)
    # record identity preserved
    for sb in first:
        for b1, b2 in zip(first[sb], ds2.buckets_by_size[sb]):
            assert [r.key() for r in b1.records] == [r.key() for r in b2.records]

    # touching a caption invalidates the fingerprint -> re-probe
    caption = next(image_dir.glob("*.txt"))
    caption.write_text("changed caption")
    probes.clear()
    ds3 = Dataset(_dataset_config(image_dir), pipeline)
    ds3.scan()
    assert len(probes) > 0

    # trust_cache: loads blindly, even with a stale caption change
    caption.write_text("changed again")
    probes.clear()
    ds4 = Dataset(_dataset_config(image_dir), pipeline)
    ds4.scan(trust_cache=True)
    assert probes == []


def test_full_global_batch_layout(image_dir):
    """full_global yields microbatch-major [(m0: r0..r3), (m1: r0..r3)]
    rows so a leading-axis gas-split + P('data') sharding reproduces each
    reference rank's microbatches exactly."""
    pipeline = FakePipeline()
    ds = Dataset(_dataset_config(image_dir), pipeline)
    m = DatasetManager(pipeline, caching_batch_size=2)
    m.register(ds)
    m.cache()

    # per-rank views (reference: one process per GPU)
    rank_batches = []
    for r in range(2):
        ds_r = Dataset(_dataset_config(image_dir), pipeline)
        m_r = DatasetManager(pipeline, caching_batch_size=2)
        m_r.register(ds_r)
        m_r.cache()  # already on disk: reuses the shard caches
        ds_r.post_init(r, 2, micro_batch_size=1, gradient_accumulation_steps=2)
        _, b = next(PipelineDataLoader(ds_r, 2))
        rank_batches.append(b["latents"])  # [gas*mbs=2, ...]

    ds.post_init(0, 2, micro_batch_size=1, gradient_accumulation_steps=2,
                 full_global=True)
    _, full = next(PipelineDataLoader(ds, 2))
    lat = full["latents"]  # [gas*mbs*dp=4, ...] microbatch-major
    # microbatch m, rank r lives at row m*dp + r
    np.testing.assert_array_equal(lat[0], rank_batches[0][0])
    np.testing.assert_array_equal(lat[1], rank_batches[1][0])
    np.testing.assert_array_equal(lat[2], rank_batches[0][1])
    np.testing.assert_array_equal(lat[3], rank_batches[1][1])
