"""Augmentation registry and compositions (reference: ``augment/__init__.py``).

``get_augment(mode, params)`` returns a pure ``fn(rng, images) -> images``
(NHWC float [0,1]) that traces into the jitted train step. Modes mirror the
reference registry (``augment/__init__.py:13-28``):

  none, gaussian, hflip, hfrt, color_jitter, cutout,
  simclr, simclr_hq, simclr_hq_cutout, diffaug

Compositions (reference ``augment/__init__.py:106-133``):
  simclr            = RRC -> HFlip -> RandomApply(Jitter, .8) -> RandomApply(Gray, .2)
  simclr_hq         = simclr + RandomApply(Blur, .5)
  simclr_hq_cutout  = simclr_hq + RandomApply(CutOut, .5)
"""

from __future__ import annotations

from typing import Callable, Mapping, Optional

import jax

from contrad_tpu.augment.color import (
    color_jitter,
    gaussian_blur,
    gaussian_noise,
    grayscale,
    hsv2rgb,
    rgb2hsv,
)
from contrad_tpu.augment.diffaug import diff_augment
from contrad_tpu.augment.spatial import (
    cutout,
    hflip_random_crop,
    horizontal_flip,
    random_crop,
    random_resize_crop,
)

Augment = Callable[[jax.Array, jax.Array], jax.Array]


def no_augment() -> Augment:
    return lambda rng, x: x


def random_apply(fn: Augment, p: float) -> Augment:
    """Per-sample Bernoulli blend (reference RandomApply,
    augment/__init__.py:94-103): keeps fixed shapes and differentiability."""

    def wrapped(rng, x):
        r_mask, r_fn = jax.random.split(rng)
        mask = jax.random.bernoulli(r_mask, p, (x.shape[0], 1, 1, 1)).astype(x.dtype)
        return x * (1.0 - mask) + fn(r_fn, x) * mask

    return wrapped


def compose(*fns: Augment) -> Augment:
    def composed(rng, x):
        for i, f in enumerate(fns):
            x = f(jax.random.fold_in(rng, i), x)
        return x

    return composed


# Default hyperparameters: reference configs/defaults/augment.gin.
_DEFAULTS = {
    "gaussian": {"sigma": 0.12},
    "random_crop": {"max_pixels": 4, "padding_mode": "reflection"},
    "hfrt": {"max_pixels": 4, "padding_mode": "reflection"},
    "color_jitter": {"brightness": 0.4, "contrast": 0.4, "saturation": 0.4, "hue": 0.1},
    "cutout": {"length": 15},
    "rrc": {"scale": (0.2, 1.0), "ratio": (0.75, 4.0 / 3.0)},
    "blur": {"sigma_range": (0.1, 2.0)},
    "diffaug": {"policy": "color,cutout"},
}


def _hyper(params: Optional[Mapping], key: str) -> dict:
    out = dict(_DEFAULTS.get(key, {}))
    if params and key in params:
        out.update({k: tuple(v) if isinstance(v, list) else v
                    for k, v in dict(params[key]).items()})
    return out


def get_augment(mode: str = "none", params: Optional[Mapping] = None,
                pack: int = 1) -> Augment:
    """Build an augmentation pipeline. ``params`` is the config's [augment]
    table (per-augmentation hyperparameter sub-tables).

    ``pack=f``: the returned pipeline operates on space-to-depth f-packed
    batches (ops/packed.py layout) with random streams identical to the
    unpacked pipeline — used by the 512^2 StyleGAN2 train path to keep
    G -> augment -> D packed end to end. Not every mode has a packed form
    (gaussian/diffaug raise)."""
    if mode == "none":
        return no_augment()
    if mode == "gaussian":
        return gaussian_noise(**_hyper(params, "gaussian"), pack=pack)
    if mode == "hflip":
        return horizontal_flip(pack=pack)
    if mode == "hfrt":
        return hflip_random_crop(**_hyper(params, "hfrt"), pack=pack)
    if mode == "color_jitter":
        return color_jitter(**_hyper(params, "color_jitter"), pack=pack)
    if mode == "cutout":
        return cutout(**_hyper(params, "cutout"), pack=pack)
    if mode == "diffaug":
        if pack != 1:
            raise NotImplementedError("diffaug has no packed variant")
        return diff_augment(**_hyper(params, "diffaug"))

    if mode in ("simclr", "simclr_hq", "simclr_hq_cutout"):
        stages = [
            random_resize_crop(**_hyper(params, "rrc"), pack=pack),
            horizontal_flip(pack=pack),
            random_apply(color_jitter(**_hyper(params, "color_jitter"),
                                      pack=pack), 0.8),
            random_apply(grayscale(pack=pack), 0.2),
        ]
        if mode in ("simclr_hq", "simclr_hq_cutout"):
            stages.append(random_apply(
                gaussian_blur(**_hyper(params, "blur"), pack=pack), 0.5))
        if mode == "simclr_hq_cutout":
            stages.append(random_apply(
                cutout(**_hyper(params, "cutout"), pack=pack), 0.5))
        return compose(*stages)

    raise NotImplementedError(f"unknown augmentation mode: {mode}")


__all__ = [
    "get_augment",
    "no_augment",
    "random_apply",
    "compose",
    "horizontal_flip",
    "hflip_random_crop",
    "random_crop",
    "random_resize_crop",
    "cutout",
    "color_jitter",
    "grayscale",
    "gaussian_noise",
    "gaussian_blur",
    "diff_augment",
    "rgb2hsv",
    "hsv2rgb",
]
