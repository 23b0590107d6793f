"""Fused bias + LeakyReLU.

TPU-native equivalent of the reference CUDA kernel
(``models/gan/stylegan2/op/fused_bias_act_kernel.cu`` + ``op/fused_act.py:74-94``):
``out = leaky_relu(x + bias) * scale``. On TPU this is a single fused XLA
elementwise expression (the VPU fuses it into neighbouring ops for free), so no
hand-written kernel is needed — a custom kernel here would only *prevent*
fusion into the surrounding matmul/conv.

Keeps the reference's per-channel learnable bias semantics
(``FusedLeakyReLU`` module, reference ``op/fused_act.py:74-83``).
"""

from __future__ import annotations

import math

import jax
from flax import linen as nn


def fused_leaky_relu(
    x: jax.Array,
    bias: jax.Array | None = None,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
) -> jax.Array:
    """out = leaky_relu(x + bias[channel]) * scale. Channels are the last axis
    (NHWC; reference is NCHW)."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,)).astype(x.dtype)
    return jax.nn.leaky_relu(x, negative_slope) * scale


class FusedLeakyReLU(nn.Module):
    """Per-channel-bias leaky ReLU with sqrt(2) gain (StyleGAN2 convention).

    ``pack``: the activation is the space-to-depth f-packing of the logical
    tensor (see ``ops/packed.py``); the (channels,) bias parameter is tiled
    over the f^2 slots so the math (and the checkpoint) are unchanged.
    """

    channels: int
    negative_slope: float = 0.2
    scale: float = math.sqrt(2.0)
    pack: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import jax.numpy as jnp

        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        if self.pack > 1:
            bias = jnp.tile(bias, self.pack * self.pack)
        return fused_leaky_relu(x, bias, self.negative_slope, self.scale)
