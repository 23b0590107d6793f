"""StyleGAN2 building-block layers (reference: ``models/gan/stylegan2/layers.py``).

Equalized-learning-rate layers: parameters are init N(0,1) (divided by lr_mul)
and rescaled at runtime by 1/sqrt(fan_in) * lr_mul. Layout NHWC, weights HWIO.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from contrad_tpu.ops.fused_act import FusedLeakyReLU, fused_leaky_relu
from contrad_tpu.ops.upfirdn2d import (
    blur2d, compose_blur_kernel, downsample2d, make_kernel, upsample2d)


class PixelNorm(nn.Module):
    """x / sqrt(mean(x^2) + 1e-8) over features (reference layers.py:15-20)."""

    @nn.compact
    def __call__(self, x):
        return x * jax.lax.rsqrt(jnp.mean(x**2, axis=-1, keepdims=True) + 1e-8)


class EqualDense(nn.Module):
    """EqualLinear (reference layers.py:132-159): weight ~ N(0, 1/lr_mul),
    runtime scale (1/sqrt(in))*lr_mul, bias*lr_mul + bias_init, optional fused
    leaky-relu activation."""

    features: int
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: bool = False

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        weight = self.param(
            "weight", nn.initializers.normal(stddev=1.0 / self.lr_mul),
            (in_dim, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        b = (bias * self.lr_mul + self.bias_init).astype(x.dtype)
        y = jnp.matmul(x, (weight * scale).astype(x.dtype))
        if self.activation:
            return fused_leaky_relu(y, b)
        return y + b


class EqualConv(nn.Module):
    """EqualConv2d (reference layers.py:95-129): weight ~ N(0,1), runtime
    scale 1/sqrt(fan_in).

    ``pre_blur``: fold a preceding Blur (ConvLayer's downsample pattern,
    reference layers.py:174-193) into this conv via kernel composition — same
    math, one dense MXU conv instead of depthwise-blur + conv. Padding then
    follows the Blur's arithmetic: p = (kb - 2) + (k - 1), pad (ceil, floor).

    ``pack = (f_in, f_out)``: input/output are space-to-depth packings of the
    logical tensors (``ops/packed.py``) — exact same function on lane-dense
    shapes; the (k, k, in, out) parameter is unchanged.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    pre_blur: Tuple[float, ...] = ()
    pack: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        from contrad_tpu.ops.packed import packed_conv

        k = self.kernel_size
        f_in, f_out = self.pack
        in_ch = x.shape[-1] // (f_in * f_in)
        weight = self.param("weight", nn.initializers.normal(stddev=1.0),
                            (k, k, in_ch, self.features))
        scale = 1.0 / math.sqrt(in_ch * k * k)
        w = (weight * scale).astype(x.dtype)
        if self.pre_blur:
            blur = make_kernel(self.pre_blur)
            p = (blur.shape[0] - 2) + (k - 1)
            pad = ((p + 1) // 2, p // 2)
            w = compose_blur_kernel(blur, w)
        else:
            pad = (self.padding, self.padding)
        if self.pack != (1, 1):
            y = packed_conv(x, w, f_in, f_out, self.stride, pad)
        else:
            y = jax.lax.conv_general_dilated(
                x, w,
                window_strides=(self.stride, self.stride),
                padding=(pad, pad),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            if f_out > 1:
                bias = jnp.tile(bias, f_out * f_out)
            y = y + bias.astype(x.dtype)
        return y


def scaled_leaky_relu(x, negative_slope: float = 0.2):
    """LeakyReLU * sqrt(2) (reference layers.py:162-171)."""
    return jax.nn.leaky_relu(x, negative_slope) * math.sqrt(2.0)


class Upsample(nn.Module):
    kernel: Sequence[int] = (1, 3, 3, 1)
    factor: int = 2

    @nn.compact
    def __call__(self, x):
        return upsample2d(x, make_kernel(self.kernel), self.factor)


class Downsample(nn.Module):
    kernel: Sequence[int] = (1, 3, 3, 1)
    factor: int = 2

    @nn.compact
    def __call__(self, x):
        return downsample2d(x, make_kernel(self.kernel), self.factor)


class Blur(nn.Module):
    kernel: Sequence[int] = (1, 3, 3, 1)
    pad: Tuple[int, int] = (0, 0)
    upsample_factor: int = 1

    @nn.compact
    def __call__(self, x):
        return blur2d(x, make_kernel(self.kernel), self.pad, self.upsample_factor)


class ConvLayer(nn.Module):
    """[Blur +] EqualConv [+ FusedLeakyReLU]; downsample via blur + stride-2
    conv (reference layers.py:174-199)."""

    features: int
    kernel_size: int
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    downsample: bool = False
    activate: bool = True
    fuse_blur: bool = True  # fold the anti-alias blur into the strided conv
    pack: Tuple[int, int] = (1, 1)  # space-to-depth packing (ops/packed.py)

    @nn.compact
    def __call__(self, x):
        if self.downsample and (self.fuse_blur or self.pack != (1, 1)):
            x = EqualConv(self.features, self.kernel_size, stride=2,
                          pre_blur=tuple(self.blur_kernel), use_bias=False,
                          pack=self.pack, name="conv")(x)
        else:
            if self.downsample:
                factor = 2
                p = (len(self.blur_kernel) - factor) + (self.kernel_size - 1)
                x = Blur(self.blur_kernel, pad=((p + 1) // 2, p // 2),
                         name="blur")(x)
                stride, padding = 2, 0
            else:
                stride, padding = 1, self.kernel_size // 2
            x = EqualConv(self.features, self.kernel_size, stride=stride,
                          padding=padding, use_bias=False, pack=self.pack,
                          name="conv")(x)
        if self.activate:
            x = FusedLeakyReLU(self.features, pack=self.pack[1],
                               name="act")(x)
        return x


class FromRGB(nn.Module):
    """1x1 ConvLayer from RGB (reference discriminator.py:17-19)."""

    features: int
    pack: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        return ConvLayer(self.features, 1, activate=True, pack=self.pack,
                         name="conv")(x)
