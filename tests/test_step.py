"""SPMD train-step tests on the 8-device virtual mesh: every mode runs, state
advances, metrics are finite, and sharded == single-device numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrad_tpu.augment import get_augment
from contrad_tpu.models.sndcgan import DSndcgan, GSndcgan
from contrad_tpu.parallel.mesh import get_mesh
from contrad_tpu.training.state import create_train_state, make_optimizer
from contrad_tpu.training.step import GANTrainer

IMG = (16, 16, 3)
BATCH = 8


def _make_trainer(mode="contrad", penalty="none", aug="hflip", n_critic=1,
                  loss_type="nonsat", devices=None, ema=False,
                  real_aug_fn=None):
    g = GSndcgan(image_size=IMG, ngf=8, nz=16)
    d = DSndcgan(image_size=IMG, ndf=8, mlp_linear=True, d_hidden=32)
    g_opt = make_optimizer(2e-4, (0.5, 0.999))
    d_opt = make_optimizer(2e-4, (0.5, 0.999))
    trainer = GANTrainer(
        generator=g, discriminator=d, mode=mode,
        augment_fn=get_augment(aug),
        g_optimizer=g_opt, d_optimizer=d_opt,
        loss_type=loss_type, penalty=penalty, temp=0.1, lbd_a=1.0,
        n_critic=n_critic, ema=ema,
        mesh=get_mesh(devices),
        real_aug_fn=real_aug_fn,
    )
    state = create_train_state(
        jax.random.PRNGKey(0), g, d, IMG, g_opt, d_opt, ema=ema)
    return trainer, state


def _batch(n=BATCH, seed=1):
    return jax.random.uniform(jax.random.PRNGKey(seed), (n,) + IMG)


@pytest.mark.parametrize("mode", ["std", "aug", "aug_both", "simclr_only", "contrad"])
def test_modes_one_step(mode, devices):
    trainer, state = _make_trainer(mode=mode)
    state = trainer.place_state(state)
    images = trainer.place_batch(_batch())
    new_state, metrics = trainer.train_step(state, images)
    assert int(new_state.step) == 1
    for k in ("G_loss", "D_loss", "D_penalty", "D_real", "D_gen"):
        assert np.isfinite(float(metrics[k])), f"{k} not finite in mode={mode}"
    assert float(jnp.abs(
        jax.tree.leaves(new_state.g_params)[0]).sum()) > 0


@pytest.mark.parametrize("penalty", ["gp", "cr", "bcr"])
def test_penalties_one_step(penalty, devices):
    trainer, state = _make_trainer(mode="std", penalty=penalty)
    state = trainer.place_state(state)
    images = trainer.place_batch(_batch())
    _, metrics = trainer.train_step(state, images)
    assert np.isfinite(float(metrics["D_penalty"]))
    if penalty == "gp":
        assert float(metrics["D_penalty"]) > 0.0


def test_n_critic_consumes_batches(devices):
    trainer, state = _make_trainer(mode="std", n_critic=3)
    state = trainer.place_state(state)
    images = trainer.place_batch(_batch(n=3 * BATCH))
    new_state, metrics = trainer.train_step(state, images)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["D_loss"]))


def test_real_aug_fn_transforms_reals(devices):
    """Dataset-baked augmentation (train_aug='hflip', reference
    datasets.py:49-69,83-126) must hit the reals before the loss path: a
    deterministic-flip real_aug_fn on batch X is step-for-step identical to
    no real_aug_fn on a pre-flipped X (with the rng advanced the same way)."""
    flip = lambda rng, x: jnp.flip(x, axis=2)
    batch = _batch()

    trainer_a, state_a = _make_trainer(mode="contrad", aug="simclr",
                                       real_aug_fn=flip)
    state_a = trainer_a.place_state(state_a)
    new_a, metrics_a = trainer_a.train_step(state_a, trainer_a.place_batch(batch))

    trainer_b, state_b = _make_trainer(mode="contrad", aug="simclr")
    # consume the same split the real_aug path takes from state.rng
    state_b = state_b.replace(rng=jax.random.split(state_b.rng)[0])
    state_b = trainer_b.place_state(state_b)
    new_b, metrics_b = trainer_b.train_step(
        state_b, trainer_b.place_batch(jnp.flip(batch, axis=2)))

    for k in metrics_a:
        np.testing.assert_allclose(float(metrics_a[k]), float(metrics_b[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    for a, b in zip(jax.tree.leaves(jax.device_get(new_a.d_params)),
                    jax.tree.leaves(jax.device_get(new_b.d_params))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    # and with the identity real_aug, results differ (the flip is real)
    trainer_c, state_c = _make_trainer(mode="contrad", aug="simclr",
                                       real_aug_fn=lambda rng, x: x)
    state_c = trainer_c.place_state(state_c)
    _, metrics_c = trainer_c.train_step(state_c, trainer_c.place_batch(batch))
    assert float(metrics_c["D_loss"]) != float(metrics_a["D_loss"])


def test_params_and_spectral_state_advance(devices):
    trainer, state = _make_trainer(mode="contrad", aug="simclr")
    state = trainer.place_state(state)
    images = trainer.place_batch(_batch())
    new_state, _ = trainer.train_step(state, images)

    def changed(a, b):
        return any(
            not np.allclose(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))

    # Cannot compare against donated buffers; rebuild the original state.
    _, state0 = _make_trainer(mode="contrad", aug="simclr")
    assert changed(state0.d_params, new_state.d_params)
    assert changed(state0.g_params, new_state.g_params)
    assert changed(state0.d_state["spectral"], new_state.d_state["spectral"])
    assert changed(state0.g_state["batch_stats"], new_state.g_state["batch_stats"])


def test_sharded_matches_single_device(devices):
    """Global-batch SPMD must equal single-device math (collective correctness
    oracle — SURVEY §4(c))."""
    metrics_by_n = {}
    states_by_n = {}
    for n_dev in (1, 8):
        trainer, state = _make_trainer(mode="contrad", aug="none",
                                       devices=devices[:n_dev])
        state = trainer.place_state(state)
        images = trainer.place_batch(_batch())
        new_state, metrics = trainer.train_step(state, images)
        metrics_by_n[n_dev] = {k: float(v) for k, v in metrics.items()}
        states_by_n[n_dev] = jax.device_get(new_state.d_params)

    for k in metrics_by_n[1]:
        np.testing.assert_allclose(
            metrics_by_n[1][k], metrics_by_n[8][k], rtol=2e-4, atol=1e-5,
            err_msg=f"metric {k} diverges between 1 and 8 devices")
    for a, b in zip(jax.tree.leaves(states_by_n[1]), jax.tree.leaves(states_by_n[8])):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


@pytest.mark.parametrize("sharded", [False, True])
def test_indexed_step_matches_regular(sharded, devices):
    """train_step_indexed — the batch gather fused INTO the jitted step —
    must be step-identical to materialize-then-train_step, for both global-row
    (DeviceBatchIterator) and shard-local (ShardedDeviceBatchIterator)
    indexing."""
    from contrad_tpu.data.core import (
        ArrayDataset, DeviceBatchIterator, ShardedDeviceBatchIterator)

    n = 64
    rng = np.random.default_rng(5)
    ds = ArrayDataset(
        rng.integers(0, 256, size=(n,) + IMG, dtype=np.uint8), np.arange(n))
    mesh_devices = devices
    cls = ShardedDeviceBatchIterator if sharded else DeviceBatchIterator
    it = cls(ds, batch_size=BATCH, mesh=get_mesh(mesh_devices), seed=2)
    assert it.supports_indexed and it.local_indexing == sharded
    idx, _ = it.next_indices()
    batch = it.materialize(idx)

    trainer_a, state_a = _make_trainer(mode="contrad", aug="simclr")
    state_a = trainer_a.place_state(state_a)
    _, metrics_a = trainer_a.train_step(state_a, batch)

    trainer_b, state_b = _make_trainer(mode="contrad", aug="simclr")
    state_b = trainer_b.place_state(state_b)
    _, metrics_b = trainer_b.train_step_indexed(
        state_b, it.images, idx, local=it.local_indexing)

    for k in metrics_a:
        np.testing.assert_allclose(float(metrics_a[k]), float(metrics_b[k]),
                                   rtol=1e-6, atol=1e-7, err_msg=k)


@pytest.mark.parametrize("sharded", [False, True])
def test_multi_step_block_matches_sequential(sharded, devices):
    """train_steps_indexed (K steps in ONE jitted lax.scan program — the
    dispatch-amortizing CLI fast path) must be numerically identical to K
    sequential train_step_indexed calls with the same index vectors."""
    from contrad_tpu.data.core import (
        ArrayDataset, DeviceBatchIterator, ShardedDeviceBatchIterator)

    n, k = 64, 3
    rng = np.random.default_rng(7)
    ds = ArrayDataset(
        rng.integers(0, 256, size=(n,) + IMG, dtype=np.uint8), np.arange(n))
    cls = ShardedDeviceBatchIterator if sharded else DeviceBatchIterator
    it = cls(ds, batch_size=BATCH, mesh=get_mesh(devices), seed=3)
    idx_block = np.stack([it.next_indices()[0] for _ in range(k)])

    trainer_a, state_a = _make_trainer(mode="contrad", aug="simclr")
    state_a = trainer_a.place_state(state_a)
    for i in range(k):
        state_a, metrics_a = trainer_a.train_step_indexed(
            state_a, it.images, idx_block[i], local=it.local_indexing)

    trainer_b, state_b = _make_trainer(mode="contrad", aug="simclr")
    state_b = trainer_b.place_state(state_b)
    state_b, metrics_b = trainer_b.train_steps_indexed(
        state_b, it.images, idx_block, local=it.local_indexing)

    assert int(state_b.step) == k
    for m_a, m_b in ((metrics_a, metrics_b),):
        for key in m_a:
            np.testing.assert_allclose(float(m_a[key]), float(m_b[key]),
                                       rtol=1e-5, atol=1e-6, err_msg=key)
    for leaf_a, leaf_b in zip(jax.tree.leaves(state_a.d_params),
                              jax.tree.leaves(state_b.d_params)):
        np.testing.assert_allclose(np.asarray(leaf_a), np.asarray(leaf_b),
                                   rtol=1e-5, atol=1e-6)


def test_determinism(devices):
    outs = []
    for _ in range(2):
        trainer, state = _make_trainer(mode="contrad", aug="simclr")
        state = trainer.place_state(state)
        images = trainer.place_batch(_batch())
        _, metrics = trainer.train_step(state, images)
        outs.append({k: float(v) for k, v in metrics.items()})
    assert outs[0] == outs[1]


def test_ema_updates(devices):
    trainer, state = _make_trainer(mode="std", ema=True)
    state = trainer.place_state(state)
    images = trainer.place_batch(_batch())
    new_state, _ = trainer.train_step(state, images, ema_decay=0.5)
    _, state0 = _make_trainer(mode="std", ema=True)
    # ema = 0.5*old + 0.5*new, must differ from both old ema and new params
    leaves_ema = jax.tree.leaves(new_state.g_ema_params)
    leaves_old = jax.tree.leaves(state0.g_ema_params)
    leaves_new = jax.tree.leaves(new_state.g_params)
    assert any(not np.allclose(e, o) for e, o in zip(leaves_ema, leaves_old))
    assert any(not np.allclose(e, n) for e, n in zip(leaves_ema, leaves_new))


def test_sampling(devices):
    trainer, state = _make_trainer(mode="std")
    state = trainer.place_state(state)
    images = trainer.place_batch(_batch())
    state, _ = trainer.train_step(state, images)
    samples = trainer.sample_fn(state, 4, False, False)
    assert samples.shape == (4,) + IMG
    assert float(samples.min()) >= 0.0 and float(samples.max()) <= 1.0


def test_bf16_compute_dtype(devices):
    """Models with dtype=bfloat16: heads/losses stay f32, metrics finite."""
    import jax.numpy as jnp

    # small direct instances (same dtype plumbing as get_architecture(...,
    # dtype=...), which is covered by test_models.py registry tests)
    g = GSndcgan(image_size=IMG, ngf=8, nz=16, dtype=jnp.bfloat16)
    d = DSndcgan(image_size=IMG, ndf=8, mlp_linear=True, d_hidden=32,
                 dtype=jnp.bfloat16)
    g_opt = make_optimizer(2e-4, (0.5, 0.999))
    d_opt = make_optimizer(2e-4, (0.5, 0.999))
    trainer = GANTrainer(
        generator=g, discriminator=d, mode="contrad",
        augment_fn=get_augment("hflip"),
        g_optimizer=g_opt, d_optimizer=d_opt, loss_type="nonsat",
        mesh=get_mesh())
    # the bf16 backbone dtype must reach the step's image path (the augment
    # chain runs at half the HBM bytes — step.py _to_float)
    assert trainer.image_dtype == jnp.bfloat16
    state = trainer.place_state(create_train_state(
        jax.random.PRNGKey(0), g, d, IMG, g_opt, d_opt))
    # params stay f32
    assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(state.g_params))
    images = trainer.place_batch(_batch())
    new_state, metrics = trainer.train_step(state, images)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    samples = trainer.sample_fn(new_state, 4, False, False)
    assert samples.dtype == jnp.float32


@pytest.mark.parametrize("mode", ["std", "contrad"])
def test_conditional_training_step(mode, devices):
    """n_classes>1 trains end-to-end: y-head (linear_y SNEmbed) params exist,
    receive gradients from real labels, and the step stays finite — the one
    latent BaseDiscriminator capability (reference base.py:107-130) made
    runnable."""
    # small direct instances; the registry's n_classes plumbing is covered by
    # test_models.py / test_data_config.py
    g = GSndcgan(image_size=IMG, ngf=8, nz=16)
    d = DSndcgan(image_size=IMG, ndf=8, mlp_linear=True, d_hidden=32,
                 n_classes=10)
    g_opt = make_optimizer(2e-4, (0.5, 0.999))
    d_opt = make_optimizer(2e-4, (0.5, 0.999))
    trainer = GANTrainer(
        generator=g, discriminator=d, mode=mode,
        augment_fn=get_augment("hflip"), g_optimizer=g_opt, d_optimizer=d_opt,
        loss_type="nonsat", mesh=get_mesh())
    assert trainer.conditional
    state = trainer.place_state(create_train_state(
        jax.random.PRNGKey(0), g, d, IMG, g_opt, d_opt))

    def y_embed(params):
        flat = jax.tree_util.tree_leaves_with_path(params)
        return {jax.tree_util.keystr(p): np.asarray(v) for p, v in flat
                if "linear_y" in jax.tree_util.keystr(p)}

    y0 = y_embed(jax.device_get(state.d_params))
    assert y0, "conditional D must have linear_y params"

    images = trainer.place_batch(_batch())
    labels = trainer.place_batch(
        jnp.arange(BATCH, dtype=jnp.int32) % 10)
    # missing labels is a hard error
    with pytest.raises(ValueError):
        trainer.train_step(state, images)
    new_state, metrics = trainer.train_step(state, images, labels=labels)
    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    y1 = y_embed(jax.device_get(new_state.d_params))
    assert any(not np.allclose(y0[k], y1[k]) for k in y0), \
        "y-embedding must receive gradients"


def test_multi_step_block_conditional_matches_sequential(devices):
    """The conditional scan-block path (labels_block threaded through the
    lax.scan xs alongside the index vectors) must match K sequential
    conditional train_step_indexed calls — the multi-step dispatch fast path
    for --conditional runs."""
    from contrad_tpu.data.core import ArrayDataset, DeviceBatchIterator

    def make():
        g = GSndcgan(image_size=IMG, ngf=8, nz=16)
        d = DSndcgan(image_size=IMG, ndf=8, mlp_linear=True, d_hidden=32,
                     n_classes=10)
        g_opt = make_optimizer(2e-4, (0.5, 0.999))
        d_opt = make_optimizer(2e-4, (0.5, 0.999))
        trainer = GANTrainer(
            generator=g, discriminator=d, mode="contrad",
            augment_fn=get_augment("hflip"), g_optimizer=g_opt,
            d_optimizer=d_opt, loss_type="nonsat", mesh=get_mesh(devices))
        state = trainer.place_state(create_train_state(
            jax.random.PRNGKey(0), g, d, IMG, g_opt, d_opt))
        return trainer, state

    n, k = 64, 3
    rng = np.random.default_rng(11)
    ds = ArrayDataset(rng.integers(0, 256, size=(n,) + IMG, dtype=np.uint8),
                      rng.integers(0, 10, size=n))
    it = DeviceBatchIterator(ds, batch_size=BATCH, mesh=get_mesh(devices),
                             seed=3)
    pairs = [it.next_indices() for _ in range(k)]
    idx_block = np.stack([p[0] for p in pairs])
    labels_block = np.stack([np.asarray(p[1]) for p in pairs])

    tr_a, st_a = make()
    for i in range(k):
        st_a, m_a = tr_a.train_step_indexed(
            st_a, it.images, idx_block[i], local=it.local_indexing,
            labels=tr_a.place_batch(labels_block[i]))

    tr_b, st_b = make()
    st_b, m_b = tr_b.train_steps_indexed(
        st_b, it.images, idx_block, local=it.local_indexing,
        labels_block=labels_block)

    assert int(st_b.step) == k
    for key in m_a:
        np.testing.assert_allclose(float(m_a[key]), float(m_b[key]),
                                   rtol=1e-5, atol=1e-6, err_msg=key)
    for la, lb in zip(jax.tree.leaves(st_a.d_params),
                      jax.tree.leaves(st_b.d_params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-6)
