"""Spatial augmentations (reference: ``augment/spatial.py``).

Each augmentation is a pure function ``fn(rng, images) -> images`` over NHWC
float batches in [0, 1], with *per-sample* randomness, fixed shapes, and no
host round-trips — they trace into the jitted train step. The reference
implements these as per-sample affine theta -> affine_grid/grid_sample torch
modules, with numpy host-side rejection sampling for RandomResizedCrop
(``spatial.py:97-148``); here the candidate sampling is fixed-shape
first-valid selection on device.

``pack=f``: the batch is the space-to-depth f-packing of the logical images
(ops/packed.py channel layout) and every augmentation operates on the packed
tensor directly — the random draws use the FINE sizes and the SAME shapes as
the unpacked path, so a packed chain is sample-for-sample equivalent to
pack -> unpacked chain -> unpack (tested in tests/test_packed_augment.py).
This keeps the 512^2 StyleGAN2 train step packed end to end (G top ->
augment -> D stem) instead of paying pack/unpack layout copies per phase.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from contrad_tpu.ops.resample import (
    affine_transform,
    axis_aligned_transform,
    identity_theta,
)

Augment = Callable[[jax.Array, jax.Array], jax.Array]


def horizontal_flip(pack: int = 1) -> Augment:
    """Per-sample 50% mirror (reference HorizontalFlipLayer, spatial.py:71-93).
    The reference routes this through grid_sample; an exact-mirror affine with
    align_corners=False reduces to index reversal, so we use the cheap form.
    Packed: fine-W reversal = coarse-W reversal + x-phase swap."""

    def fn(rng, x):
        n = x.shape[0]
        flip = jax.random.bernoulli(rng, 0.5, (n, 1, 1, 1))
        if pack == 1:
            flipped = x[:, :, ::-1, :]
        else:
            f = pack
            nb, hc, wc, cc = x.shape
            xv = x.reshape(nb, hc, wc, f, f, cc // (f * f))
            flipped = xv[:, :, ::-1, :, ::-1, :].reshape(x.shape)
        return jnp.where(flip, flipped, x)

    return fn


def hflip_random_crop(max_pixels: int, padding_mode: str = "reflection",
                      pack: int = 1) -> Augment:
    """Random mirror + integer translation of up to ``max_pixels``
    (reference HorizontalFlipRandomCrop, spatial.py:15-40; nearest sampling)."""

    def fn(rng, x):
        n = x.shape[0]
        w = x.shape[2] * pack
        r_flip, r_bias = jax.random.split(rng)
        sign = jax.random.bernoulli(r_flip, 0.5, (n,)).astype(jnp.float32) * 2.0 - 1.0
        bias = jax.random.randint(
            r_bias, (n, 2), -max_pixels, max_pixels + 1
        ).astype(jnp.float32) / (w / 2.0)
        return axis_aligned_transform(
            x, sign, jnp.ones((n,)), bias[:, 0], bias[:, 1],
            mode="nearest", padding_mode=padding_mode, pack=pack)

    return fn


def random_crop(max_pixels: int, padding_mode: str = "reflection",
                pack: int = 1) -> Augment:
    """Integer translation only (reference RandomCrop, spatial.py:44-67)."""

    def fn(rng, x):
        n = x.shape[0]
        w = x.shape[2] * pack
        bias = jax.random.randint(
            rng, (n, 2), -max_pixels, max_pixels + 1
        ).astype(jnp.float32) / (w / 2.0)
        ones = jnp.ones((n,))
        return axis_aligned_transform(
            x, ones, ones, bias[:, 0], bias[:, 1],
            mode="nearest", padding_mode=padding_mode, pack=pack)

    return fn


def random_resize_crop(
    scale: Tuple[float, float] = (0.2, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    n_trials: int = 10,
    pack: int = 1,
) -> Augment:
    """Inception-style random resized crop (reference RandomResizeCropLayer,
    spatial.py:97-148).

    The reference rejection-samples (area, aspect) candidates host-side with
    numpy and leaves unsatisfied batch slots at identity. Here each sample
    draws ``n_trials`` candidates on device and takes its first valid one
    (identity if none) — fixed-shape, jit-able, same candidate distribution.
    """

    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))

    def fn(rng, x):
        n = x.shape[0]
        h, w = x.shape[1] * pack, x.shape[2] * pack
        r_area, r_aspect, r_bw, r_bh = jax.random.split(rng, 4)
        area = float(h * w)

        target_area = jax.random.uniform(
            r_area, (n, n_trials), minval=scale[0], maxval=scale[1]) * area
        aspect = jnp.exp(jax.random.uniform(
            r_aspect, (n, n_trials), minval=log_ratio[0], maxval=log_ratio[1]))
        ww = jnp.round(jnp.sqrt(target_area * aspect))
        hh = jnp.round(jnp.sqrt(target_area / aspect))
        valid = (ww > 0) & (ww <= w) & (hh > 0) & (hh <= h)

        first = jnp.argmax(valid, axis=1)  # first valid trial per sample
        any_valid = jnp.any(valid, axis=1)
        ww_s = jnp.take_along_axis(ww, first[:, None], axis=1)[:, 0]
        hh_s = jnp.take_along_axis(hh, first[:, None], axis=1)[:, 0]

        # Translation: integer pixels in [ww-W, W-ww], normalized by W
        # (reference spatial.py:135-138).
        span_w = w - ww_s
        span_h = h - hh_s
        u_w = jax.random.uniform(r_bw, (n,))
        u_h = jax.random.uniform(r_bh, (n,))
        bias_w = (jnp.floor(u_w * (2.0 * span_w + 1.0)) - span_w) / w
        bias_h = (jnp.floor(u_h * (2.0 * span_h + 1.0)) - span_h) / h

        sx = jnp.where(any_valid, ww_s / w, 1.0)
        sy = jnp.where(any_valid, hh_s / h, 1.0)
        bx = jnp.where(any_valid, bias_w, 0.0)
        by = jnp.where(any_valid, bias_h, 0.0)

        return axis_aligned_transform(
            x, sx, sy, bx, by, mode="bilinear", padding_mode="reflection",
            pack=pack)

    return fn


def cutout(length: int, pack: int = 1) -> Augment:
    """Zero a length x length square at a random center, clipped at borders
    (reference CutOut, spatial.py:152-181; the conv-of-delta trick there is
    exactly an |i - center| <= radius band)."""
    if length % 2 == 0:
        raise ValueError("CutOut only accepts odd lengths (reference spatial.py:156)")
    radius = (length - 1) // 2

    def fn(rng, x):
        n = x.shape[0]
        h, w = x.shape[1] * pack, x.shape[2] * pack
        r_h, r_w = jax.random.split(rng)
        hc = jax.random.randint(r_h, (n, 1, 1), 0, h)
        wc = jax.random.randint(r_w, (n, 1, 1), 0, w)
        if pack == 1:
            ii = jnp.arange(h).reshape(1, h, 1)
            jj = jnp.arange(w).reshape(1, 1, w)
            in_h = jnp.abs(ii - hc) <= radius  # (N, H, 1)
            in_w = jnp.abs(jj - wc) <= radius  # (N, 1, W)
            mask = 1.0 - (in_h & in_w).astype(x.dtype)
            return x * mask[..., None]
        f = pack
        hcs, wcs, cc = x.shape[1], x.shape[2], x.shape[3]
        # fine index i = f*I + A: arange(h).reshape(hc, f)[I, A]
        ii = jnp.arange(h).reshape(1, hcs, f)
        jj = jnp.arange(w).reshape(1, wcs, f)
        in_h = jnp.abs(ii - hc) <= radius  # (N, Hc, f)
        in_w = jnp.abs(jj - wc) <= radius  # (N, Wc, f)
        band = in_h[:, :, None, :, None] & in_w[:, None, :, None, :]
        mask = 1.0 - band.astype(x.dtype)  # (N, Hc, Wc, f, f)
        xv = x.reshape(n, hcs, wcs, f, f, cc // (f * f))
        return (xv * mask[..., None]).reshape(x.shape)

    return fn
