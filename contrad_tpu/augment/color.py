"""Color augmentations (reference: ``augment/color_jitter.py``,
``augment/utils.py``, and the Gaussian/blur/grayscale layers in
``augment/__init__.py``).

All are pure per-sample-random NHWC functions. The HSV adjustment keeps the
reference's straight-through gradient (RandomHSVFunction,
``color_jitter.py:81-104``: backward passes grad_output through unchanged).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Augment = Callable[[jax.Array, jax.Array], jax.Array]

_GRAY_WEIGHTS = (0.299, 0.587, 0.114)


# --------------------------------------------------------------- HSV math

def rgb2hsv(rgb: jax.Array) -> jax.Array:
    """Branchless RGB->HSV with atan2 hue (reference augment/utils.py:6-38).
    NHWC in, NHWC out (channels = H, S, V)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    cmax = jnp.max(rgb, axis=-1)
    cmin = jnp.min(rgb, axis=-1)

    hue = jnp.arctan2(math.sqrt(3.0) * (g - b), 2.0 * r - g - b)
    hue = jnp.mod(hue, 2.0 * math.pi) / (2.0 * math.pi)
    saturate = 1.0 - cmin / (cmax + 1e-8)
    value = cmax
    hsv = jnp.stack([hue, saturate, value], axis=-1)
    return jnp.where(jnp.isfinite(hsv), hsv, 0.0)


def hsv2rgb(hsv: jax.Array) -> jax.Array:
    """Branchless HSV->RGB (reference augment/utils.py:41-62)."""
    h = hsv[..., 0:1]
    s = hsv[..., 1:2]
    v = hsv[..., 2:3]
    c = v * s
    n = jnp.array([5.0, 3.0, 1.0],
                  dtype=hsv.dtype).reshape((1,) * (hsv.ndim - 1) + (3,))
    k = jnp.mod(n + h * 6.0, 6.0)
    t = jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)
    return v - c * t


@jax.custom_vjp
def _hsv_adjust(x, f_h, f_s, f_v):
    hsv = rgb2hsv(x)
    h = jnp.mod(hsv[..., 0] + f_h * (255.0 / 360.0), 1.0)
    s = hsv[..., 1] * f_s
    v = hsv[..., 2] * f_v
    hsv = jnp.clip(jnp.stack([h, s, v], axis=-1), 0.0, 1.0)
    return hsv2rgb(hsv)


def _hsv_adjust_fwd(x, f_h, f_s, f_v):
    return _hsv_adjust(x, f_h, f_s, f_v), (f_h, f_s, f_v)


def _hsv_adjust_bwd(res, g):
    f_h, f_s, f_v = res
    # Straight-through: the reference's RandomHSVFunction.backward returns
    # grad_output unchanged for x and no grads for the factors.
    return g, jnp.zeros_like(f_h), jnp.zeros_like(f_s), jnp.zeros_like(f_v)


_hsv_adjust.defvjp(_hsv_adjust_fwd, _hsv_adjust_bwd)


# --------------------------------------------------------------- layers

def _check_range(value, name, center=1.0, bound=(0.0, float("inf")),
                 clip_first_on_zero=True) -> Optional[Tuple[float, float]]:
    """torchvision-style jitter range handling (color_jitter.py:25-42)."""
    if isinstance(value, (int, float)):
        if value < 0:
            raise ValueError(f"If {name} is a single number, it must be non negative.")
        lo, hi = center - value, center + value
        if clip_first_on_zero:
            lo = max(lo, 0.0)
    elif isinstance(value, Sequence) and len(value) == 2:
        lo, hi = float(value[0]), float(value[1])
        if not bound[0] <= lo <= hi <= bound[1]:
            raise ValueError(f"{name} values should be between {bound}")
    else:
        raise TypeError(f"{name} should be a number or a pair.")
    if lo == hi == center:
        return None
    return (lo, hi)


def color_jitter(brightness=0.4, contrast=0.4, saturation=0.4, hue=0.1,
                 pack: int = 1) -> Augment:
    """Per-sample brightness/contrast/saturation/hue jitter
    (reference ColorJitterLayer): contrast in RGB space, B/S/H jointly in HSV
    space, the two sub-transforms applied in random order per batch.

    ``pack=f``: the batch is space-to-depth packed; all the math is per fine
    pixel, so a free reshape to (..., f*f, C) recovers the RGB axis (the
    packed channel index is (slot)*C + c) and the random draws keep the
    unpacked shapes — identical streams, identical values."""
    b_range = _check_range(brightness, "brightness")
    c_range = _check_range(contrast, "contrast")
    s_range = _check_range(saturation, "saturation")
    h_range = _check_range(hue, "hue", center=0.0, bound=(-0.5, 0.5),
                           clip_first_on_zero=False)
    ff = pack * pack

    def _view(x):
        """(N, H, W, ff*C) -> (N, H, W, ff, C) for pack>1 (free reshape)."""
        if pack == 1:
            return x
        return x.reshape(x.shape[:3] + (ff, x.shape[3] // ff))

    def adjust_contrast(rng, x):
        if c_range is None:
            return jnp.clip(x, 0.0, 1.0)
        n = x.shape[0]
        factor = jax.random.uniform(rng, (n, 1, 1, 1), minval=c_range[0],
                                    maxval=c_range[1]).astype(x.dtype)
        if pack == 1:
            means = jnp.mean(x, axis=(1, 2), keepdims=True)  # per-channel mean
            return jnp.clip((x - means) * factor + means, 0.0, 1.0)
        xv = _view(x)
        # per-channel mean over ALL fine pixels = over (H, W, slot)
        means = jnp.mean(xv, axis=(1, 2, 3), keepdims=True)
        out = jnp.clip((xv - means) * factor[..., None] + means, 0.0, 1.0)
        return out.reshape(x.shape)

    def adjust_hsv(rng, x):
        n = x.shape[0]
        r_h, r_s, r_v = jax.random.split(rng, 3)
        shape = (n, 1, 1)
        f_h = (jax.random.uniform(r_h, shape, minval=h_range[0], maxval=h_range[1])
               if h_range else jnp.zeros(shape))
        f_s = (jax.random.uniform(r_s, shape, minval=s_range[0], maxval=s_range[1])
               if s_range else jnp.ones(shape))
        f_v = (jax.random.uniform(r_v, shape, minval=b_range[0], maxval=b_range[1])
               if b_range else jnp.ones(shape))
        if pack > 1:  # broadcast over (H, W, slot)
            f_h, f_s, f_v = (f[..., None] for f in (f_h, f_s, f_v))
        # dtype-preserving: a bf16 batch must not be silently promoted to f32
        # by f32 jitter factors (the augment chain is HBM-bound in the step).
        out = _hsv_adjust(_view(x), f_h.astype(x.dtype), f_s.astype(x.dtype),
                          f_v.astype(x.dtype))
        return out.reshape(x.shape) if pack > 1 else out

    def fn(rng, x):
        r_order, r_c, r_hsv = jax.random.split(rng, 3)
        contrast_first = jax.random.bernoulli(r_order, 0.5)
        # lax.cond: evaluate only one transform order (batch-level randomness,
        # reference color_jitter.py:66-70)
        return jax.lax.cond(
            contrast_first,
            lambda im: adjust_hsv(r_hsv, adjust_contrast(r_c, im)),
            lambda im: adjust_contrast(r_c, adjust_hsv(r_hsv, im)),
            x)

    return fn


def grayscale(pack: int = 1) -> Augment:
    """Luminance-weighted grayscale (reference RandomColorGrayLayer)."""
    ff = pack * pack

    def fn(rng, x):
        w = jnp.asarray(_GRAY_WEIGHTS, dtype=x.dtype)
        if pack == 1:
            l = jnp.sum(x * w, axis=-1, keepdims=True)
            return jnp.broadcast_to(l, x.shape)
        xv = x.reshape(x.shape[:3] + (ff, x.shape[3] // ff))
        l = jnp.sum(xv * w, axis=-1, keepdims=True)
        return jnp.broadcast_to(l, xv.shape).reshape(x.shape)

    return fn


def gaussian_noise(sigma: float = 0.12, pack: int = 1) -> Augment:
    """Additive Gaussian noise, clamped (reference Gaussian layer)."""
    if pack != 1:
        # Not in any packed (512^2) recipe; drawing fine-shaped noise and
        # packing it would reintroduce the transpose this path exists to
        # avoid. Wire it up if a packed recipe ever needs it.
        raise NotImplementedError("gaussian_noise has no packed variant")

    def fn(rng, x):
        noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
        return jnp.clip(x + noise * sigma, 0.0, 1.0)

    return fn


def gaussian_blur(sigma_range: Tuple[float, float] = (0.1, 2.0),
                  pack: int = 1) -> Augment:
    """Gaussian blur with kernel_size = H // 10 (odd) and one sigma per batch,
    reflect padding (reference GaussianBlur layer in augment/__init__.py:53-78).

    TPU-native formulation: the separable FIR is applied as two banded-Toeplitz
    matmuls ``T_h @ X @ T_w^T`` (reflect padding folded into T), riding the MXU
    instead of a depthwise conv over a 3-channel tensor — XLA lays out small-
    channel NHWC convs with the batch dim in the 128-wide lane axis, wasting
    ~5/6 of the bandwidth, and a 51-tap depthwise pass at 512^2 measured
    ~32 ms/step in the simclr_hq ContraD profile. The matmul form is
    mathematically the same sum, reordered.

    ``pack=f``: the Toeplitz matrices reshape into (coarse, slot) phase
    blocks and contract against the packed operand directly (same taps, same
    FLOPs, no unpack).
    """

    def fn(rng, x):
        n = x.shape[0]
        h, w = x.shape[1] * pack, x.shape[2] * pack
        radius = (h // 10) // 2
        ksize = radius * 2 + 1
        sigma = jax.random.uniform(rng, (), minval=sigma_range[0],
                                   maxval=sigma_range[1])
        coords = jnp.arange(ksize, dtype=jnp.float32) - radius
        kern = jnp.exp(-(coords**2) / (2.0 * sigma**2))
        kern = kern / jnp.sum(kern)

        def toeplitz(dim: int) -> jax.Array:
            # T[i, reflect(i - radius + k)] += kern[k]; indices are static,
            # only the tap weights are traced (sigma-dependent).
            rows = np.arange(dim)[:, None] + np.zeros((1, ksize), np.int64)
            cols = np.arange(dim)[:, None] + np.arange(-radius, radius + 1)
            cols = np.abs(cols)  # reflect at 0 (no edge repeat, as jnp.pad)
            cols = np.where(cols >= dim, 2 * dim - 2 - cols, cols)
            taps = jnp.broadcast_to(kern, (dim, ksize))
            return jnp.zeros((dim, dim), jnp.float32).at[
                rows.ravel(), cols.ravel()].add(taps.ravel())

        th = toeplitz(h).astype(x.dtype)
        tw = th if w == h else toeplitz(w).astype(x.dtype)
        if pack == 1:
            y = jnp.einsum("Hh,nhwc->nHwc", th, x)
            return jnp.einsum("Ww,nhwc->nhWc", tw, y)
        f = pack
        hc, wc, cc = x.shape[1], x.shape[2], x.shape[3]
        xv = x.reshape(n, hc, wc, f, f, cc // (f * f))
        thr = th.reshape(hc, f, hc, f)  # [I, A, i, a]
        twr = tw.reshape(wc, f, wc, f)  # [J, B, j, b]
        y = jnp.einsum("IAia,nijabc->nIjAbc", thr, xv)
        o = jnp.einsum("JBjb,nIjAbc->nIJABc", twr, y)
        return o.reshape(x.shape)

    return fn
