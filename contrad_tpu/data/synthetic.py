"""Procedural synthetic dataset for smoke tests and benches (no real data in
the build environment — zero egress)."""

from __future__ import annotations

from typing import Tuple

import numpy as np

from contrad_tpu.data.core import ArrayDataset


def synthetic_dataset(image_size: Tuple[int, int, int], n: int = 2048,
                      seed: int = 0, n_classes: int = 10) -> ArrayDataset:
    """Structured blobs + noise: enough signal for losses to move."""
    h, w, c = image_size
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_classes, size=(n,))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    images = np.empty((n, h, w, c), dtype=np.uint8)
    for i in range(n):
        cy, cx = rng.uniform(0.25, 0.75, 2) * (h, w)
        sigma = rng.uniform(0.1, 0.3) * h
        blob = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2)))
        base = rng.uniform(0.1, 0.4, size=(1, 1, c)).astype(np.float32)
        img = base + blob[..., None] * rng.uniform(0.3, 0.6, size=(1, 1, c))
        img += rng.normal(0, 0.03, size=(h, w, c))
        images[i] = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    return ArrayDataset(images, labels, n_classes=n_classes)
