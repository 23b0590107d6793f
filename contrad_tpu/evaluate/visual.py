"""Visual training diagnostics (reference: ``evaluate/gan.py:15-82``):
fixed-latent sample grids accumulated into a training-progress GIF, and an
augmented-real preview grid."""

from __future__ import annotations

from typing import List, Optional

import jax
import numpy as np


def to_uint8(images) -> np.ndarray:
    """float [0,1] NHWC -> uint8."""
    x = np.asarray(jax.device_get(images))
    return (np.clip(x, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def make_grid(images: np.ndarray, nrow: int = 8, pad: int = 2) -> np.ndarray:
    """Tile NHWC uint8 images into one HWC image."""
    n, h, w, c = images.shape
    ncol = nrow
    nr = (n + ncol - 1) // ncol
    grid = np.zeros((nr * (h + pad) + pad, ncol * (w + pad) + pad, c),
                    dtype=images.dtype)
    for i in range(n):
        r, col = divmod(i, ncol)
        y0 = pad + r * (h + pad)
        x0 = pad + col * (w + pad)
        grid[y0 : y0 + h, x0 : x0 + w] = images[i]
    return grid


class FixedSampleGeneration:
    """Fixed 16-latent grid per eval -> GIF frames (reference
    evaluate/gan.py:48-82)."""

    def __init__(self, generator, rng, n: int = 16, volatile: bool = False):
        self.volatile = volatile
        self.n = n
        self.z = None if volatile else generator.sample_latent(rng, n)
        self.frames: List[np.ndarray] = []

    def update(self, sample_from_z) -> Optional[np.ndarray]:
        if self.volatile:
            return None
        images = to_uint8(sample_from_z(self.z))
        frame = make_grid(images, nrow=4)
        self.frames.append(frame)
        return frame

    def summary(self) -> List[np.ndarray]:
        return self.frames

    # Resume support: keep the SAME fixed latents (and the frames so far)
    # across a restart so the progress GIF stays one continuous trajectory
    # (the reference redraws latents on --resume, evaluate/gan.py:48-58).
    def state_dict(self) -> dict:
        if self.volatile:
            return {}
        return {
            "z": np.asarray(jax.device_get(self.z)),
            "frames": (np.stack(self.frames) if self.frames
                       else np.zeros((0,), dtype=np.uint8)),
        }

    def load_state_dict(self, state: dict) -> None:
        if self.volatile or "z" not in state:
            return
        import jax.numpy as jnp

        self.z = jnp.asarray(state["z"])
        frames = np.asarray(state["frames"])
        self.frames = [] if frames.size == 0 else list(frames)


class ImageGrid:
    """64-image preview grid of (augmented) reals (reference
    evaluate/gan.py:15-45)."""

    def __init__(self, n: int = 64, volatile: bool = False):
        self.n = n
        self.volatile = volatile

    def update(self, images) -> Optional[np.ndarray]:
        if self.volatile:
            return None
        images = to_uint8(images[: self.n])
        return make_grid(images, nrow=8)
