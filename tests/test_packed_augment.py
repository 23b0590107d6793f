"""Packed-augmentation equivalence.

The 512^2 StyleGAN2 train path keeps images space-to-depth packed end to end
(G top -> augment chain -> D stem; ops/packed.py layout). Every augmentation
built with ``get_augment(..., pack=f)`` must be sample-for-sample equivalent
to pack -> unpacked augmentation -> unpack under the SAME rng (the packed
factories draw with identical shapes/streams), and the packed trainer must
match the unpacked trainer step for step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrad_tpu.augment import get_augment
from contrad_tpu.augment.color import gaussian_blur, grayscale
from contrad_tpu.augment.spatial import (
    cutout,
    hflip_random_crop,
    horizontal_flip,
    random_crop,
    random_resize_crop,
)
from contrad_tpu.ops.packed import depth_to_space, space_to_depth

F = 2


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)


def _x(np_rng, n=3, h=32, w=32, c=3):
    return jnp.asarray(np_rng.uniform(size=(n, h, w, c)), jnp.float32)


def _check(aug, aug_p, x, seed=3, atol=1e-5):
    rng = jax.random.PRNGKey(seed)
    want = aug(rng, x)
    got = depth_to_space(aug_p(rng, space_to_depth(x, F)), F)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=atol)


@pytest.mark.parametrize("factory,kwargs", [
    (horizontal_flip, {}),
    (hflip_random_crop, {"max_pixels": 4}),
    (random_crop, {"max_pixels": 4}),
    (random_resize_crop, {}),
    (cutout, {"length": 9}),
    (grayscale, {}),
    (gaussian_blur, {}),
])
def test_primitive_packed_equivalence(np_rng, factory, kwargs):
    _check(factory(**kwargs), factory(**kwargs, pack=F), _x(np_rng))


@pytest.mark.parametrize("mode", [
    "hflip", "hfrt", "color_jitter", "cutout",
    "simclr", "simclr_hq", "simclr_hq_cutout",
])
def test_registry_packed_equivalence(np_rng, mode):
    # Several seeds so the per-sample RandomApply masks take both branches.
    for seed in (0, 1, 7):
        _check(get_augment(mode), get_augment(mode, pack=F), _x(np_rng),
               seed=seed)


def test_unsupported_modes_raise():
    with pytest.raises(NotImplementedError):
        get_augment("gaussian", pack=F)
    with pytest.raises(NotImplementedError):
        get_augment("diffaug", pack=F)


def test_packed_trainer_matches_unpacked(np_rng, monkeypatch):
    """Full StyleGAN2+ContraD lazy-R1 step with the packed-image path ON vs
    OFF: same state, same batch, same rng -> same metrics and D params (up to
    matmul reassociation in the packed augment contractions)."""
    import contrad_tpu.models.stylegan2.discriminator as dmod
    import contrad_tpu.models.stylegan2.generator as gmod
    from contrad_tpu.models.stylegan2 import DStylegan2, GStylegan2
    from contrad_tpu.training.state import create_train_state, make_optimizer
    from contrad_tpu.training.step import StyleGAN2Trainer

    tiny = {4: 16, 8: 16, 16: 16, 32: 16}
    monkeypatch.setattr(gmod, "stylegan2_channels", lambda *a, **k: dict(tiny))
    monkeypatch.setattr(dmod, "stylegan2_channels", lambda *a, **k: dict(tiny))

    size = 16
    images = jax.random.uniform(jax.random.PRNGKey(1), (8, size, size, 3))
    results = {}
    for packed in (1, 2):
        g = GStylegan2(size=size, n_mlp=2)
        d = DStylegan2(size=size, mlp_linear=True, d_hidden=32)
        assert g.packed_io == 2 and d.packed_io == 2
        g_opt = make_optimizer(2e-3, (0.0, 0.99))
        d_opt = make_optimizer(2e-3, (0.0, 0.99))
        trainer = StyleGAN2Trainer(
            g, d, mode="contrad",
            augment_fn=get_augment("simclr_hq", pack=packed),
            g_optimizer=g_opt, d_optimizer=d_opt, loss_type="nonsat",
            temp=0.1, lbd_a=1.0, lbd_r1=0.1, d_reg_every=4, style_mix=0.9,
            packed_images=packed)
        state = create_train_state(jax.random.PRNGKey(0), g, d,
                                   (size, size, 3), g_opt, d_opt, ema=True)
        state = trainer.place_state(state)
        state, metrics = trainer.train_step(
            state, trainer.place_batch(images), ema_decay=0.99, do_r1=True)
        results[packed] = ({k: float(v) for k, v in metrics.items()},
                           jax.device_get(state.d_params),
                           jax.device_get(state.g_params))

    m1, d1, g1 = results[1]
    m2, d2, g2 = results[2]
    assert float(m1["D_r1"]) > 0.0
    for k in m1:
        np.testing.assert_allclose(
            m1[k], m2[k], rtol=5e-4, atol=1e-5,
            err_msg=f"metric {k}: packed vs unpacked step")
    for a, b in zip(jax.tree.leaves(d1), jax.tree.leaves(d2)):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-5)


def test_packed_trainer_eval_sample_is_image(np_rng, monkeypatch):
    """The packed trainer's eval surfaces (_sample / sample_from_z) still
    emit image-layout tensors (FID/GIF consumers are layout-blind)."""
    import contrad_tpu.models.stylegan2.discriminator as dmod
    import contrad_tpu.models.stylegan2.generator as gmod
    from contrad_tpu.models.stylegan2 import DStylegan2, GStylegan2
    from contrad_tpu.training.state import create_train_state, make_optimizer
    from contrad_tpu.training.step import StyleGAN2Trainer

    tiny = {4: 16, 8: 16, 16: 16, 32: 16}
    monkeypatch.setattr(gmod, "stylegan2_channels", lambda *a, **k: dict(tiny))
    monkeypatch.setattr(dmod, "stylegan2_channels", lambda *a, **k: dict(tiny))

    size = 16
    g = GStylegan2(size=size, n_mlp=2)
    d = DStylegan2(size=size, mlp_linear=True, d_hidden=32)
    g_opt = make_optimizer(2e-3, (0.0, 0.99))
    trainer = StyleGAN2Trainer(
        g, d, mode="contrad", augment_fn=get_augment("none", pack=2),
        g_optimizer=g_opt, d_optimizer=g_opt, loss_type="nonsat",
        packed_images=2)
    state = create_train_state(jax.random.PRNGKey(0), g, d, (size, size, 3),
                               g_opt, g_opt, ema=True)
    state = trainer.place_state(state)
    out = trainer.sample_fn(state, 2)
    assert out.shape == (2, size, size, 3)
