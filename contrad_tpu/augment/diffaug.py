"""DiffAugment policies (reference: ``third_party/diffaug.py``, Zhao et al. 2020).

Operates on [-1, 1]-rescaled images internally (reference ``diffaug.py:13-19``),
NHWC, per-sample randomness, fixed shapes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Augment = Callable[[jax.Array, jax.Array], jax.Array]


def _rand_brightness(rng, x):
    n = x.shape[0]
    u = jax.random.uniform(rng, (n, 1, 1, 1)).astype(x.dtype)
    return x + (u - 0.5)


def _rand_saturation(rng, x):
    n = x.shape[0]
    u = jax.random.uniform(rng, (n, 1, 1, 1)).astype(x.dtype)
    x_mean = jnp.mean(x, axis=-1, keepdims=True)
    return (x - x_mean) * (u * 2.0) + x_mean


def _rand_contrast(rng, x):
    n = x.shape[0]
    u = jax.random.uniform(rng, (n, 1, 1, 1)).astype(x.dtype)
    x_mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    return (x - x_mean) * (u + 0.5) + x_mean


def _rand_translation(rng, x, ratio=0.125):
    """Per-sample integer shift with zero padding (reference diffaug.py:41-54)."""
    n, h, w, c = x.shape
    shift_h = int(h * ratio + 0.5)
    shift_w = int(w * ratio + 0.5)
    r_h, r_w = jax.random.split(rng)
    th = jax.random.randint(r_h, (n, 1, 1), -shift_h, shift_h + 1)
    tw = jax.random.randint(r_w, (n, 1, 1), -shift_w, shift_w + 1)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ii = jnp.clip(jnp.arange(h).reshape(1, h, 1) + th + 1, 0, h + 1)  # (N, H, 1)
    jj = jnp.clip(jnp.arange(w).reshape(1, 1, w) + tw + 1, 0, w + 1)  # (N, 1, W)

    def gather_one(img, iy, ix):
        return img[iy[:, 0], :][:, ix[0, :]]

    return jax.vmap(gather_one)(xp, jnp.broadcast_to(ii, (n, h, 1)),
                                jnp.broadcast_to(jj, (n, 1, w)))


def _rand_cutout(rng, x, ratio=0.5):
    """Random zero rectangle of fixed size (reference diffaug.py:57-71):
    offsets drawn over the full image, indices clamped — so the cut shrinks at
    borders."""
    n, h, w, _ = x.shape
    ch = int(h * ratio + 0.5)
    cw = int(w * ratio + 0.5)
    r_h, r_w = jax.random.split(rng)
    off_h = jax.random.randint(r_h, (n, 1, 1), 0, h + (1 - ch % 2))
    off_w = jax.random.randint(r_w, (n, 1, 1), 0, w + (1 - cw % 2))

    lo_h = jnp.clip(off_h - ch // 2, 0, h - 1)
    hi_h = jnp.clip(off_h - ch // 2 + ch - 1, 0, h - 1)
    lo_w = jnp.clip(off_w - cw // 2, 0, w - 1)
    hi_w = jnp.clip(off_w - cw // 2 + cw - 1, 0, w - 1)

    ii = jnp.arange(h).reshape(1, h, 1)
    jj = jnp.arange(w).reshape(1, 1, w)
    cut = ((ii >= lo_h) & (ii <= hi_h)) & ((jj >= lo_w) & (jj <= hi_w))
    return x * (1.0 - cut.astype(x.dtype))[..., None]


_AUGMENT_FNS = {
    "color": [_rand_brightness, _rand_saturation, _rand_contrast],
    "translation": [_rand_translation],
    "cutout": [_rand_cutout],
}


def diff_augment(policy: str = "color,cutout") -> Augment:
    """Returns fn(rng, x[0,1]) applying the DiffAugment policy chain."""
    chains = []
    for p in policy.split(","):
        if p:
            chains.extend(_AUGMENT_FNS[p])

    def fn(rng, x):
        if not chains:
            return x
        x = 2.0 * x - 1.0
        for i, f in enumerate(chains):
            x = f(jax.random.fold_in(rng, i), x)
        return 0.5 * x + 0.5

    return fn
