"""Multihost data-path tests (single-process equivalents on the virtual mesh).

Real multi-host (jax.distributed) cannot run here, but every piece of the
multihost feeding path is exercised: the DistributedSampler-equivalent sharded
BatchIterator (reference train_gan.py:245-251), and global-array assembly from
process-local rows via jax.make_array_from_process_local_data (trivially
1-process here, but the identical code path the multihost CLI takes).
"""

import jax
import jax.numpy as jnp
import numpy as np

from contrad_tpu.data.core import ArrayDataset, BatchIterator
from contrad_tpu.parallel.mesh import (
    batch_sharding, data_shard, get_mesh, place_global_batch)


def _dataset(n=64):
    return ArrayDataset(
        (np.arange(n * 4 * 4 * 3, dtype=np.int64).reshape(n, 4, 4, 3) % 251
         ).astype(np.uint8),
        np.arange(n))


def test_sharded_batches_tile_the_global_batch():
    """world rank-slices drawn with the same seed concatenate exactly to the
    unsharded global batch, with no overlap — DistributedSampler semantics."""
    ds = _dataset()
    world = 4
    ref = BatchIterator(ds, batch_size=16, seed=5)
    shards = [BatchIterator(ds, batch_size=16, seed=5, shard=(r, world))
              for r in range(world)]
    for _ in range(6):  # crosses an epoch boundary (64/16 = 4 steps/epoch)
        g_imgs, g_labels = next(ref)
        parts = [next(s) for s in shards]
        np.testing.assert_array_equal(
            np.concatenate([p[0] for p in parts]), g_imgs)
        np.testing.assert_array_equal(
            np.concatenate([p[1] for p in parts]), g_labels)
        assert len(set(g_labels.tolist())) == 16  # no duplicate rows


def test_shard_validation():
    ds = _dataset()
    import pytest

    with pytest.raises(ValueError):
        BatchIterator(ds, batch_size=10, seed=0, shard=(0, 3))
    with pytest.raises(ValueError):
        BatchIterator(ds, batch_size=8, seed=0, shard=(4, 4))


def test_place_global_batch_matches_device_put(devices):
    mesh = get_mesh(devices)
    x = np.random.default_rng(0).uniform(size=(16, 4, 4, 3)).astype(np.float32)
    a = place_global_batch(x, mesh)
    b = jax.device_put(x, batch_sharding(mesh))
    assert a.sharding == b.sharding
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_data_shard_single_process():
    assert data_shard() == (0, 1)


def test_train_step_via_process_local_path(devices):
    """A step fed through place_global_batch equals one fed via device_put."""
    from contrad_tpu.augment import get_augment
    from contrad_tpu.models.sndcgan import DSndcgan, GSndcgan
    from contrad_tpu.training import (
        GANTrainer, create_train_state, make_optimizer)

    IMG = (16, 16, 3)
    g = GSndcgan(image_size=IMG, ngf=8, nz=16)
    d = DSndcgan(image_size=IMG, ndf=8, mlp_linear=True, d_hidden=32)
    g_opt = make_optimizer(2e-4, (0.5, 0.999))
    d_opt = make_optimizer(2e-4, (0.5, 0.999))
    batch = np.random.default_rng(1).uniform(size=(8,) + IMG).astype(np.float32)

    outs = []
    for use_local in (False, True):
        trainer = GANTrainer(
            generator=g, discriminator=d, mode="contrad",
            augment_fn=get_augment("none"), g_optimizer=g_opt,
            d_optimizer=d_opt, loss_type="nonsat", mesh=get_mesh(devices))
        state = trainer.place_state(create_train_state(
            jax.random.PRNGKey(0), g, d, IMG, g_opt, d_opt))
        placed = (place_global_batch(batch, trainer.mesh) if use_local
                  else jax.device_put(batch, batch_sharding(trainer.mesh)))
        _, metrics = trainer.train_step(state, placed)
        outs.append({k: float(v) for k, v in metrics.items()})
    assert outs[0] == outs[1]
