"""Data pipeline + config system tests."""

import os

import numpy as np
import pytest

from contrad_tpu.config import default_config_files, finalize_options, load_config
from contrad_tpu.data import BatchIterator, get_dataset, get_dataset_ref
from contrad_tpu.data.core import ArrayDataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_synthetic_dataset():
    train, test, size = get_dataset("synthetic_16")
    assert size == (16, 16, 3)
    assert train.images.dtype == np.uint8
    assert len(train) == 2048 and len(test) == 512
    ref = get_dataset_ref("synthetic_16")
    assert len(ref) == len(test)


def test_batch_iterator_epoch_semantics():
    ds = ArrayDataset(np.arange(40, dtype=np.uint8).reshape(10, 2, 2, 1),
                      np.arange(10))
    it = BatchIterator(ds, batch_size=4, seed=7)
    seen = []
    for _ in range(2):  # one epoch = 2 batches of 4 (2 dropped)
        imgs, labels = next(it)
        assert imgs.shape == (4, 2, 2, 1)
        seen.extend(labels.tolist())
    assert len(set(seen)) == 8, "no repeats within an epoch"

    # determinism: same seed -> same order
    it2 = BatchIterator(ds, batch_size=4, seed=7)
    imgs2, labels2 = next(it2)
    it3 = BatchIterator(ds, batch_size=4, seed=7)
    imgs3, labels3 = next(it3)
    np.testing.assert_array_equal(labels2, labels3)


def test_batch_iterator_rejects_oversized_batch():
    ds = ArrayDataset(np.zeros((4, 2, 2, 1), np.uint8))
    with pytest.raises(ValueError):
        BatchIterator(ds, batch_size=8)


def test_unknown_dataset():
    with pytest.raises(NotImplementedError):
        get_dataset("imagenet")


def test_config_layering_and_overrides():
    files = default_config_files(
        os.path.join(REPO, "configs/gan/cifar10/c10_b512.toml"), REPO)
    cfg = load_config(files, ["options.lr=0.001", "options.n_critic=5"])
    finalize_options(cfg)
    assert cfg.options.batch_size == 512
    assert cfg.options.lbd == 10.0  # from defaults/gan.toml
    assert cfg.options.lr == 0.001  # override wins
    assert cfg.options.n_critic == 5
    assert cfg.options.lr_d == 0.001  # lr_d defaults to lr
    assert cfg.augment.color_jitter.brightness == 0.4


def test_config_experiment_overrides_defaults():
    files = default_config_files(
        os.path.join(REPO, "configs/gan/stylegan2/afhq_dog_style64.toml"), REPO)
    cfg = load_config(files)
    finalize_options(cfg)
    assert cfg.augment.color_jitter.brightness == 0.8  # experiment overrides
    assert cfg.augment.cutout.length == 255
    assert cfg.options.fid_size == 50000
    assert tuple(cfg.options.beta) == (0.0, 0.99)


def test_config_requires_dataset_and_loss(tmp_path):
    f = tmp_path / "bad.toml"
    f.write_text("[options]\nbatch_size = 8\n")
    cfg = load_config([f])
    with pytest.raises(ValueError):
        finalize_options(cfg)


def test_all_experiment_configs_parse():
    import glob

    for path in glob.glob(os.path.join(REPO, "configs/gan/**/*.toml"),
                          recursive=True):
        cfg = load_config(default_config_files(path, REPO))
        finalize_options(cfg)
        assert cfg.options.batch_size > 0, path


def test_device_batch_iterator(devices):
    import jax

    from contrad_tpu.data.core import DeviceBatchIterator
    from contrad_tpu.parallel.mesh import get_mesh

    ds = ArrayDataset(
        np.arange(16 * 4 * 4 * 3, dtype=np.uint8).reshape(16, 4, 4, 3) % 251,
        np.arange(16))
    mesh = get_mesh(devices)
    it = DeviceBatchIterator(ds, batch_size=8, mesh=mesh, seed=3)
    imgs, labels = next(it)
    assert imgs.shape == (8, 4, 4, 3)
    # device gather must equal host gather for the same epoch order
    ref = BatchIterator(ds, batch_size=8, seed=3)
    ref_imgs, ref_labels = next(ref)
    np.testing.assert_array_equal(np.asarray(jax.device_get(imgs)), ref_imgs)
    np.testing.assert_array_equal(labels, ref_labels)
    # second batch completes the epoch without repeats
    _, labels2 = next(it)
    assert set(labels.tolist()) | set(labels2.tolist()) == set(range(16))


def test_prefetch_iterator_close_stops_worker():
    """close() must actually stop a put-blocked worker: the wrapped iterator
    stops being consumed and the thread exits (no leak for second iterators
    in-process)."""
    import itertools
    import time

    from contrad_tpu.data.core import PrefetchIterator

    consumed = itertools.count()

    class Src:
        def __next__(self):
            return np.full((2, 4, 4, 3), next(consumed) % 251, np.uint8), \
                np.zeros((2,), np.int64)

    it = PrefetchIterator(Src(), depth=1)
    next(it)
    time.sleep(0.3)  # let the worker fill the queue and block on put
    it.close()
    assert not it._thread.is_alive(), "worker thread still running after close()"
    n_after_close = next(consumed)
    time.sleep(0.3)
    assert next(consumed) == n_after_close + 1, "iterator still consumed after close()"


def test_sharded_device_batch_iterator(devices):
    """ShardedDeviceBatchIterator: each device holds 1/8 of the dataset;
    batches pair images with the right labels, one epoch covers every staged
    sample exactly once, and the epoch-boundary ring rotation changes which
    chunk each device draws from."""
    import jax

    from contrad_tpu.data.core import ShardedDeviceBatchIterator
    from contrad_tpu.parallel.mesh import get_mesh

    n = 64
    # encode the sample id into the image so image<->label pairing is checkable
    images = np.zeros((n, 4, 4, 3), dtype=np.uint8)
    images[:, 0, 0, 0] = np.arange(n) % 256
    ds = ArrayDataset(images, np.arange(n))
    mesh = get_mesh(devices)
    it = ShardedDeviceBatchIterator(ds, batch_size=16, mesh=mesh, seed=5)
    assert it.shard_len == 8 and it.local_batch == 2

    seen = []
    for _ in range(4):  # one epoch = shard_len/local_batch = 4 steps
        imgs, labels = next(it)
        assert imgs.shape == (16, 4, 4, 3)
        ids = np.asarray(jax.device_get(imgs))[:, 0, 0, 0]
        np.testing.assert_array_equal(ids, labels % 256)  # pairing
        seen.extend(labels.tolist())
    assert sorted(seen) == list(range(n))  # full coverage, no repeats

    # epoch 2: rotation moved chunks one hop; device 0 now draws from the
    # chunk device 1 held in epoch 1 (chunk ids = staging permutation order)
    chunk0_before = it._chunk_of(0)
    imgs, labels = next(it)  # first batch of epoch 1 (triggers the rotation)
    assert it.epoch == 1
    assert it._chunk_of(0) == (chunk0_before - 1) % 8
    # coverage still holds after rotation
    seen2 = []
    for step in range(4):
        if step:
            imgs, labels = next(it)
        seen2.extend(labels.tolist())
    assert sorted(seen2) == list(range(n))


def test_sharded_device_batch_iterator_resume(devices):
    """start_epoch replays rotations: a fresh iterator resumed at epoch e
    produces the same batches as one that trained through e epochs."""
    from contrad_tpu.data.core import ShardedDeviceBatchIterator
    from contrad_tpu.parallel.mesh import get_mesh

    import jax

    n = 32
    images = np.zeros((n, 2, 2, 3), dtype=np.uint8)
    images[:, 0, 0, 0] = np.arange(n)
    ds = ArrayDataset(images, np.arange(n))
    mesh = get_mesh(devices)

    it_live = ShardedDeviceBatchIterator(ds, batch_size=8, mesh=mesh, seed=7)
    for _ in range(it_live.shard_len // it_live.local_batch):  # epoch 0
        next(it_live)
    live_imgs, live_labels = next(it_live)  # first batch of epoch 1

    it_resumed = ShardedDeviceBatchIterator(ds, batch_size=8, mesh=mesh,
                                            seed=7, start_epoch=1)
    res_imgs, res_labels = next(it_resumed)
    np.testing.assert_array_equal(live_labels, res_labels)
    np.testing.assert_array_equal(np.asarray(jax.device_get(live_imgs)),
                                  np.asarray(jax.device_get(res_imgs)))


def test_sharded_iterator_resume_rotation_period(devices):
    """The ring rotation has period n_dev, so resuming at epoch n_dev + k
    must produce the same device placement (and batches) as resuming at k —
    and do so with O(n_dev) startup rotations, not O(start_epoch)."""
    import jax

    from contrad_tpu.data.core import ShardedDeviceBatchIterator
    from contrad_tpu.parallel.mesh import get_mesh

    n = 32
    images = np.zeros((n, 2, 2, 3), dtype=np.uint8)
    images[:, 0, 0, 0] = np.arange(n)
    ds = ArrayDataset(images, np.arange(n))
    mesh = get_mesh(devices)
    n_dev = int(mesh.devices.size)

    it_k = ShardedDeviceBatchIterator(ds, batch_size=8, mesh=mesh, seed=3,
                                      start_epoch=2)
    it_far = ShardedDeviceBatchIterator(ds, batch_size=8, mesh=mesh, seed=3,
                                        start_epoch=2 + 5 * n_dev)
    assert it_far._chunk_of(0) == it_k._chunk_of(0)
    far_imgs, _ = next(it_far)
    # placement parity: both iterators hold identical device-side shards
    np.testing.assert_array_equal(np.asarray(jax.device_get(it_k._images)),
                                  np.asarray(jax.device_get(it_far._images)))
    assert far_imgs.shape == (8, 2, 2, 3)


def test_make_train_loader_selection_and_resume_epoch(devices, monkeypatch):
    """make_train_loader picks the right path per dataset size / world and
    computes the resume epoch drop-last-aware (regression: the epoch was
    derived from images-consumed // len(dataset), which drifts because epoch
    remainders are dropped)."""
    from contrad_tpu.data.core import (
        DeviceBatchIterator,
        PrefetchIterator,
        ShardedDeviceBatchIterator,
        make_train_loader,
    )
    from contrad_tpu.parallel.mesh import get_mesh

    mesh = get_mesh(devices)
    ds = ArrayDataset(np.zeros((100, 4, 4, 3), dtype=np.uint8))

    # 100 imgs, batch 24 -> 4 steps/epoch (drop-last). After 12 steps training
    # is entering epoch 3; the consumed-images formula would say epoch 2.
    loader = make_train_loader(ds, 24, mesh, place_fn=None, seed=0,
                               starting_step=13)
    assert isinstance(loader, DeviceBatchIterator)
    assert loader._indices.epoch == 3

    # multihost shard -> prefetched host path with the same epoch math
    loader = make_train_loader(ds, 24, mesh, place_fn=lambda x: x, seed=0,
                               starting_step=13, shard=(1, 4))
    assert isinstance(loader, PrefetchIterator)
    assert loader._it.epoch == 3
    loader.close()

    # too big to replicate but fits sharded -> ShardedDeviceBatchIterator
    monkeypatch.setattr(DeviceBatchIterator, "MAX_BYTES", 2048)
    big = ArrayDataset(np.zeros((64, 8, 8, 3), dtype=np.uint8))  # 12 KB
    loader = make_train_loader(big, 16, mesh, place_fn=None, seed=0)
    assert isinstance(loader, ShardedDeviceBatchIterator)

    # too big even sharded -> host streaming
    monkeypatch.setattr(DeviceBatchIterator, "MAX_BYTES", 128)
    loader = make_train_loader(big, 16, mesh, place_fn=lambda x: x, seed=0)
    assert isinstance(loader, PrefetchIterator)
    loader.close()


def test_image_folder_loader(tmp_path):
    """The CelebA/AFHQ ImageFolder path (reference datasets.py:71-126):
    decode-once memmap cache, resize to target, cache reuse, and rebuild
    when the folder contents change."""
    from PIL import Image

    from contrad_tpu.data.folder import _cache_path, load_image_folder

    folder = tmp_path / "afhq_mini" / "train"
    folder.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(6):  # mixed sizes: loader must resize to target
        side = 12 if i % 2 else 20
        arr = rng.integers(0, 256, size=(side, side, 3), dtype=np.uint8)
        Image.fromarray(arr).save(folder / f"img_{i}.png")

    ds = load_image_folder(str(folder), (16, 16, 3))
    assert ds.images.shape == (6, 16, 16, 3)
    assert ds.images.dtype == np.uint8
    cache = _cache_path(str(folder), (16, 16, 3))
    assert os.path.exists(cache)

    # second load: memmap reuse, identical pixels
    ds2 = load_image_folder(str(folder), (16, 16, 3))
    np.testing.assert_array_equal(np.asarray(ds.images),
                                  np.asarray(ds2.images))

    # folder grows -> stale cache detected and rebuilt
    arr = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    Image.fromarray(arr).save(folder / "img_6.png")
    ds3 = load_image_folder(str(folder), (16, 16, 3))
    assert ds3.images.shape == (7, 16, 16, 3)
    np.testing.assert_array_equal(np.asarray(ds3.images[-1]), arr)

    # a different target size gets its own cache
    ds4 = load_image_folder(str(folder), (8, 8, 3))
    assert ds4.images.shape == (7, 8, 8, 3)

    with pytest.raises(FileNotFoundError):
        load_image_folder(str(tmp_path / "nope"), (16, 16, 3))
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        load_image_folder(str(empty), (16, 16, 3))


def test_dump_toml_round_trips_effective_config(tmp_path):
    """The logdir config copy is the EFFECTIVE config: dump_toml(load+override)
    must re-load to the same dict (a raw file copy would drop --override,
    so load_run would reconstruct the wrong run)."""
    import tomllib

    from contrad_tpu.config import (default_config_files, dump_toml,
                                    finalize_options, load_config)

    cfg = load_config(
        default_config_files("configs/gan/cifar10/c10_b512.toml"),
        ["options.dataset=synthetic_32", "options.max_steps=20000"])
    finalize_options(cfg)
    text = dump_toml(cfg)
    back = tomllib.loads(text)
    assert back["options"]["dataset"] == "synthetic_32"
    assert back["options"]["max_steps"] == 20000
    # full round trip (tuples come back as lists; normalize)
    def norm(d):
        return {k: (norm(v) if isinstance(v, dict)
                    else list(v) if isinstance(v, (list, tuple)) else v)
                for k, v in d.items()}
    assert norm(back) == norm(cfg.to_dict())


def test_get_image_size_without_data():
    from contrad_tpu.data import get_image_size

    assert get_image_size("cifar10") == (32, 32, 3)
    assert get_image_size("cifar100_lin") == (32, 32, 3)
    assert get_image_size("celeba128") == (128, 128, 3)
    assert get_image_size("afhq_dog") == (512, 512, 3)
    assert get_image_size("synthetic_16") == (16, 16, 3)
    assert get_image_size("synthetic_32_50000") == (32, 32, 3)
    with pytest.raises(NotImplementedError):
        get_image_size("imagenet")
