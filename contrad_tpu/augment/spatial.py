"""Spatial augmentations (reference: ``augment/spatial.py``).

Each augmentation is a pure function ``fn(rng, images) -> images`` over NHWC
float batches in [0, 1], with *per-sample* randomness, fixed shapes, and no
host round-trips — they trace into the jitted train step. The reference
implements these as per-sample affine theta -> affine_grid/grid_sample torch
modules, with numpy host-side rejection sampling for RandomResizedCrop
(``spatial.py:97-148``); here the candidate sampling is fixed-shape
first-valid selection on device.
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


def horizontal_flip() -> Augment:
    """Per-sample 50% mirror (reference HorizontalFlipLayer, spatial.py:71-93).
    The reference routes this through grid_sample; an exact-mirror affine with
    align_corners=False reduces to index reversal, so we use the cheap form."""

    def fn(rng, x):
        n = x.shape[0]
        flip = jax.random.bernoulli(rng, 0.5, (n, 1, 1, 1))
        return jnp.where(flip, x[:, :, ::-1, :], x)

    return fn


def hflip_random_crop(max_pixels: int, padding_mode: str = "reflection") -> Augment:
    """Random mirror + integer translation of up to ``max_pixels``
    (reference HorizontalFlipRandomCrop, spatial.py:15-40; nearest sampling)."""

    def fn(rng, x):
        n, h, w, _ = x.shape
        r_flip, r_bias = jax.random.split(rng)
        sign = jax.random.bernoulli(r_flip, 0.5, (n,)).astype(jnp.float32) * 2.0 - 1.0
        bias = jax.random.randint(
            r_bias, (n, 2), -max_pixels, max_pixels + 1
        ).astype(jnp.float32) / (w / 2.0)
        return axis_aligned_transform(
            x, sign, jnp.ones((n,)), bias[:, 0], bias[:, 1],
            mode="nearest", padding_mode=padding_mode)

    return fn


def random_crop(max_pixels: int, padding_mode: str = "reflection") -> Augment:
    """Integer translation only (reference RandomCrop, spatial.py:44-67)."""

    def fn(rng, x):
        n, h, w, _ = x.shape
        bias = jax.random.randint(
            rng, (n, 2), -max_pixels, max_pixels + 1
        ).astype(jnp.float32) / (w / 2.0)
        ones = jnp.ones((n,))
        return axis_aligned_transform(
            x, ones, ones, bias[:, 0], bias[:, 1],
            mode="nearest", padding_mode=padding_mode)

    return fn


def random_resize_crop(
    scale: Tuple[float, float] = (0.2, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    n_trials: int = 10,
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
        n, h, w, _ = x.shape
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
            x, sx, sy, bx, by, mode="bilinear", padding_mode="reflection")

    return fn


def cutout(length: int) -> Augment:
    """Zero a length x length square at a random center, clipped at borders
    (reference CutOut, spatial.py:152-181; the conv-of-delta trick there is
    exactly an |i - center| <= radius band)."""
    if length % 2 == 0:
        raise ValueError("CutOut only accepts odd lengths (reference spatial.py:156)")
    radius = (length - 1) // 2

    def fn(rng, x):
        n, h, w, _ = x.shape
        r_h, r_w = jax.random.split(rng)
        hc = jax.random.randint(r_h, (n, 1, 1), 0, h)
        wc = jax.random.randint(r_w, (n, 1, 1), 0, w)
        ii = jnp.arange(h).reshape(1, h, 1)
        jj = jnp.arange(w).reshape(1, 1, w)
        in_h = jnp.abs(ii - hc) <= radius  # (N, H, 1)
        in_w = jnp.abs(jj - wc) <= radius  # (N, 1, W)
        mask = 1.0 - (in_h & in_w).astype(x.dtype)
        return x * mask[..., None]

    return fn
