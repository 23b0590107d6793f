"""TPU-native compute primitives (XLA-fused ops, spectral norm, resampling,
Pallas kernels)."""

from contrad_tpu.ops.fused_act import FusedLeakyReLU, fused_leaky_relu
from contrad_tpu.ops.resample import (
    affine_grid,
    affine_transform,
    grid_sample,
    identity_theta,
)
from contrad_tpu.ops.spectral_norm import SNConv, SNDense, SNEmbed, spectral_normalize

__all__ = [
    "FusedLeakyReLU",
    "fused_leaky_relu",
    "affine_grid",
    "affine_transform",
    "grid_sample",
    "identity_theta",
    "SNConv",
    "SNDense",
    "SNEmbed",
    "spectral_normalize",
]
