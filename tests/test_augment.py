"""Augmentation semantics tests: per-sample randomness, fixed shapes,
value ranges, and behavioral parity checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrad_tpu.augment import (
    color_jitter,
    compose,
    cutout,
    diff_augment,
    gaussian_blur,
    gaussian_noise,
    get_augment,
    grayscale,
    hflip_random_crop,
    horizontal_flip,
    hsv2rgb,
    random_apply,
    random_resize_crop,
    rgb2hsv,
)


def _imgs(n=16, h=16, w=16, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(size=(n, h, w, 3)).astype(np.float32))


def test_hflip_per_sample(rng):
    x = _imgs()
    y = np.asarray(horizontal_flip()(rng, x))
    xn = np.asarray(x)
    flipped = 0
    for i in range(len(xn)):
        if np.allclose(y[i], xn[i]):
            pass
        elif np.allclose(y[i], xn[i, :, ::-1, :]):
            flipped += 1
        else:
            raise AssertionError(f"sample {i} neither original nor mirrored")
    assert 0 < flipped < len(xn), "expected a mix of flipped/unflipped"


def test_cutout_masks_square(rng):
    x = jnp.ones((4, 16, 16, 3))
    y = np.asarray(cutout(5)(rng, x))
    for i in range(4):
        zeros = (y[i, :, :, 0] == 0)
        n_zero = zeros.sum()
        assert 1 <= n_zero <= 25  # clipped at borders
        ys, xs = np.where(zeros)
        assert ys.max() - ys.min() <= 4 and xs.max() - xs.min() <= 4


def test_cutout_rejects_even_length():
    with pytest.raises(ValueError):
        cutout(4)


def test_color_jitter_range_and_per_sample(rng):
    x = _imgs()
    y = color_jitter(0.4, 0.4, 0.4, 0.1)(rng, x)
    yn = np.asarray(y)
    assert yn.min() >= 0.0 and yn.max() <= 1.0
    assert not np.allclose(yn, np.asarray(x))
    # different samples get different factors
    d0 = np.abs(yn[0] - np.asarray(x)[0]).mean()
    d1 = np.abs(yn[1] - np.asarray(x)[1]).mean()
    assert abs(d0 - d1) > 1e-6


def test_color_jitter_straight_through_grad(rng):
    x = _imgs(4)
    fn = color_jitter(0.4, 0.4, 0.4, 0.1)
    g = jax.grad(lambda im: jnp.sum(fn(rng, im)))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_hsv_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.05, 0.95, size=(2, 8, 8, 3)).astype(np.float32))
    hsv = rgb2hsv(x)
    back = hsv2rgb(hsv)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=2e-2)


def test_grayscale_luminance(rng):
    x = _imgs(2)
    y = np.asarray(grayscale()(rng, x))
    xn = np.asarray(x)
    lum = 0.299 * xn[..., 0] + 0.587 * xn[..., 1] + 0.114 * xn[..., 2]
    for c in range(3):
        np.testing.assert_allclose(y[..., c], lum, rtol=1e-5)


def test_rrc_identity_when_full_scale(rng):
    x = _imgs()
    y = random_resize_crop(scale=(1.0, 1.0), ratio=(1.0, 1.0))(rng, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def test_rrc_changes_images(rng):
    x = _imgs()
    y = random_resize_crop(scale=(0.2, 0.5))(rng, x)
    assert y.shape == x.shape
    assert not np.allclose(np.asarray(y), np.asarray(x))


def test_gaussian_blur_smooths(rng):
    x = _imgs(4, 32, 32)
    y = gaussian_blur((1.5, 1.5))(rng, x)
    assert y.shape == x.shape
    assert float(jnp.var(y)) < float(jnp.var(x))
    # constant image is unchanged (reflect padding preserves constants)
    const = jnp.full((2, 32, 32, 3), 0.37)
    yc = gaussian_blur((1.0, 1.0))(rng, const)
    np.testing.assert_allclose(np.asarray(yc), 0.37, atol=1e-5)


def test_gaussian_blur_matmul_matches_depthwise_conv(rng):
    """The banded-Toeplitz matmul blur must equal the from-definition
    separable depthwise conv with reflect padding (reference GaussianBlur,
    augment/__init__.py:53-78)."""
    for h, w in ((32, 32), (64, 48)):
        x = jax.random.uniform(jax.random.fold_in(rng, h), (3, h, w, 3))
        y = gaussian_blur((1.3, 1.3))(rng, x)

        radius = (h // 10) // 2
        ksize = radius * 2 + 1
        # same sigma draw as inside gaussian_blur
        sigma = jax.random.uniform(rng, (), minval=1.3, maxval=1.3)
        coords = jnp.arange(ksize, dtype=jnp.float32) - radius
        kern = jnp.exp(-(coords ** 2) / (2.0 * sigma ** 2))
        kern = kern / jnp.sum(kern)
        xp = jnp.pad(x, ((0, 0), (radius, radius), (radius, radius), (0, 0)),
                     mode="reflect")
        kh = jnp.tile(kern.reshape(ksize, 1, 1, 1), (1, 1, 1, 3))
        kw = jnp.tile(kern.reshape(1, ksize, 1, 1), (1, 1, 1, 3))
        ref = jax.lax.conv_general_dilated(
            xp, kh, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=3)
        ref = jax.lax.conv_general_dilated(
            ref, kw, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=3)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)


def test_gaussian_noise_clips(rng):
    x = jnp.zeros((4, 8, 8, 3))
    y = gaussian_noise(0.5)(rng, x)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_random_apply_extremes(rng):
    x = _imgs()
    inv = lambda r, im: 1.0 - im
    np.testing.assert_allclose(
        np.asarray(random_apply(inv, 0.0)(rng, x)), np.asarray(x))
    np.testing.assert_allclose(
        np.asarray(random_apply(inv, 1.0)(rng, x)), 1.0 - np.asarray(x))


def test_diffaug_policies(rng):
    x = _imgs()
    for policy in ("color", "translation", "cutout", "color,cutout"):
        y = diff_augment(policy)(rng, x)
        assert y.shape == x.shape
        assert not np.allclose(np.asarray(y), np.asarray(x))
    # empty policy = identity
    np.testing.assert_allclose(
        np.asarray(diff_augment("")(rng, x)), np.asarray(x))


def test_diffaug_cutout_zero_region(rng):
    # cutout zeroes in [-1,1] space, so cut pixels land at 0.5 after rescale
    x = jnp.ones((4, 16, 16, 3))
    y = np.asarray(diff_augment("cutout")(rng, x))
    for i in range(4):
        assert np.isclose(y[i], 0.5).any(), "cutout must gray out a region"
        assert np.isclose(y[i], 1.0).any(), "non-cut pixels stay white"


def test_registry_all_modes_run(rng):
    x = _imgs(8)
    for mode in ("none", "gaussian", "hflip", "hfrt", "color_jitter", "cutout",
                 "simclr", "simclr_hq", "simclr_hq_cutout", "diffaug"):
        fn = get_augment(mode)
        y = fn(rng, x)
        assert y.shape == x.shape, mode
        assert np.isfinite(np.asarray(y)).all(), mode


def test_augments_jit_into_one_program(rng):
    """The whole simclr pipeline must trace into a single jitted program."""
    x = _imgs(8)
    fn = jax.jit(get_augment("simclr_hq_cutout"))
    y = fn(rng, x)
    assert y.shape == x.shape


def test_params_override(rng):
    x = _imgs(8)
    fn = get_augment("cutout", {"cutout": {"length": 7}})
    y = np.asarray(fn(rng, jnp.ones_like(x)))
    assert (y == 0).sum() > 0


def test_two_views_are_independent(rng):
    """Concat [x, x] then augment => the two halves differ per-sample (the
    ContraD two-view mechanism, reference contrad.py:41)."""
    x = _imgs(8)
    both = jnp.concatenate([x, x], axis=0)
    y = np.asarray(get_augment("simclr")(rng, both))
    assert not np.allclose(y[:8], y[8:])


def test_augments_preserve_bf16_dtype(rng):
    """Under a bf16 compute dtype the train step feeds the augment chain bf16
    images (step.py _to_float); every registry mode must keep them bf16 —
    a silent f32 promotion doubles the chain's HBM traffic (the 32^2 flagship
    step is bandwidth-bound, BASELINE.md round-3 roofline)."""
    x = _imgs(8).astype(jnp.bfloat16)
    for mode in ("none", "gaussian", "hflip", "hfrt", "color_jitter", "cutout",
                 "simclr", "simclr_hq", "simclr_hq_cutout", "diffaug"):
        y = get_augment(mode)(rng, x)
        assert y.dtype == jnp.bfloat16, mode
        assert np.isfinite(np.asarray(y, dtype=np.float32)).all(), mode


def test_augment_bf16_close_to_f32(rng):
    """Same keys, same images: the bf16 pipeline tracks the f32 one to bf16
    resolution (it is the same math at lower precision, not a different
    augmentation)."""
    x32 = _imgs(8)
    for mode in ("simclr", "diffaug"):
        fn = get_augment(mode)
        y32 = np.asarray(fn(rng, x32), dtype=np.float32)
        y16 = np.asarray(fn(rng, x32.astype(jnp.bfloat16)), dtype=np.float32)
        # bf16 has ~2-3 decimal digits; augmented values live in [0,1].
        assert np.abs(y32 - y16).mean() < 0.02, mode
        assert np.abs(y32 - y16).max() < 0.25, mode


def test_augment_bf16_differentiable(rng):
    """G-phase grads flow through the augment chain in bf16 mode (the G loss
    augments fakes, modes.py _augmented_loss_G)."""
    x = _imgs(4).astype(jnp.bfloat16)
    fn = get_augment("simclr")

    def loss(im):
        return jnp.sum(fn(rng, im).astype(jnp.float32) ** 2)

    g = jax.grad(loss)(x)
    assert g.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(g, dtype=np.float32)).all()
