"""Architecture registry (reference: ``models/gan/__init__.py:2-31``).

``get_architecture(name, image_size)`` returns ``(G, D)`` linen modules:
  * ``sndcgan``      — G_SNDCGAN + D_SNDCGAN(mlp_linear, d_hidden=512)
  * ``snresnet18``   — G_SNDCGAN + D_SNResNet18(mlp_linear, d_hidden=1024)
  * ``stylegan2``    — small32 StyleGAN2 G + ResidualDiscriminatorP(d_hidden=512)
  * ``stylegan2_512``— full StyleGAN2 G/D with channel_multiplier=1.0
  * ``stylegan2_tiny``— CI/smoke width (0.25x channels, n_mlp=2)
"""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from contrad_tpu.models.base import (
    Discriminator,
    LinearClassifier,
    l2_normalize_rows,
)
from contrad_tpu.models.sndcgan import DSndcgan, GSndcgan


def get_architecture(
    architecture: str, image_size: Tuple[int, int, int], dtype=None,
    n_classes: int = 1,
) -> Tuple[nn.Module, Discriminator]:
    """dtype: compute dtype for the conv stacks (e.g. jnp.bfloat16); params,
    heads and losses always stay float32. ``n_classes > 1`` adds the
    projection-discrimination y-head (SNEmbed; reference base.py:107-130)."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    if isinstance(dtype, str):
        dtype = jnp.dtype(dtype)
    if architecture == "sndcgan":
        generator = GSndcgan(image_size=image_size, dtype=dtype)
        discriminator = DSndcgan(image_size=image_size, mlp_linear=True,
                                 d_hidden=512, dtype=dtype, n_classes=n_classes)
    elif architecture == "snresnet18":
        from contrad_tpu.models.snresnet import DSnresnet18

        generator = GSndcgan(image_size=image_size, dtype=dtype)
        discriminator = DSnresnet18(mlp_linear=True, d_hidden=1024, dtype=dtype,
                                    n_classes=n_classes)
    elif architecture == "stylegan2":
        from contrad_tpu.models.stylegan2 import GStylegan2, DStylegan2

        resolution = image_size[0]
        generator = GStylegan2(size=resolution, n_mlp=8, small32=True,
                               dtype=dtype)
        discriminator = DStylegan2(
            size=resolution, small32=True, mlp_linear=True, d_hidden=512,
            dtype=dtype, n_classes=n_classes
        )
    elif architecture == "stylegan2_tiny":
        from contrad_tpu.models.stylegan2 import GStylegan2, DStylegan2

        # CI/smoke variant: the full StyleGAN2 code paths (modulated conv,
        # noise, style mixing, ToRGB skips, ResidualDiscriminatorP, lazy R1,
        # EMA) at throwaway width — drives the train_stylegan2* CLIs as
        # subprocesses on the virtual CPU mesh (tests/test_cli.py).
        resolution = image_size[0]
        generator = GStylegan2(size=resolution, n_mlp=2,
                               channel_multiplier=0.25, dtype=dtype)
        discriminator = DStylegan2(
            size=resolution, channel_multiplier=0.25, mlp_linear=True,
            d_hidden=32, dtype=dtype, n_classes=n_classes
        )
    elif architecture == "stylegan2_512":
        from contrad_tpu.models.stylegan2 import GStylegan2, DStylegan2

        resolution = image_size[0]
        generator = GStylegan2(size=resolution, n_mlp=8, channel_multiplier=1.0,
                               dtype=dtype)
        discriminator = DStylegan2(
            size=resolution, channel_multiplier=1.0, mlp_linear=True,
            d_hidden=512, dtype=dtype, n_classes=n_classes
        )
    else:
        raise NotImplementedError(f"unknown architecture: {architecture}")

    return generator, discriminator


__all__ = [
    "get_architecture",
    "Discriminator",
    "LinearClassifier",
    "l2_normalize_rows",
    "GSndcgan",
    "DSndcgan",
]
