"""StyleGAN2 discriminators (reference: ``models/gan/stylegan2/discriminator.py``).

``DStylegan2`` is the registry-reachable ResidualDiscriminatorP: FromRGB ->
residual downsample blocks (/sqrt(2)) -> minibatch-stddev -> 3x3 conv ->
flatten 512*4*4 penultimate, wrapped with the multi-head protocol (no spectral
norm anywhere — the reference applies SN only in the SNDCGAN/SNResNet family).
Plain ``ResidualDiscriminator`` and ``SkipDiscriminator`` (reference
``discriminator.py:79-188``, not registry-reachable) are provided for parity.

Minibatch stddev note: the reference groups strided batch slices
(``view(group, -1, ...)``, discriminator.py:22-33) which under SPMD would
couple samples living on different devices. We group *contiguous* 4-sample
blocks instead — identical statistics for a shuffled batch, and each group
stays on one device, so the op stays collective-free.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from contrad_tpu.models.base import Discriminator
from contrad_tpu.models.stylegan2.generator import stylegan2_channels
from contrad_tpu.models.stylegan2.layers import (
    ConvLayer,
    Downsample,
    EqualDense,
    FromRGB,
)


def minibatch_stddev(x: jax.Array, stddev_group: int = 4,
                     stddev_feat: int = 1) -> jax.Array:
    """Append a per-group feature-stddev channel (reference
    discriminator.py:22-33), with contiguous grouping (see module docstring)."""
    n, h, w, c = x.shape
    group = min(n, stddev_group)
    g = x.astype(jnp.float32).reshape(
        n // group, group, h, w, stddev_feat, c // stddev_feat)
    std = jnp.sqrt(jnp.var(g, axis=1) + 1e-8)  # biased var over the group, f32
    std = jnp.mean(std, axis=(1, 2, 3, 4), keepdims=True)  # (n//group,1,1,1,1)
    std = std[..., 0].astype(x.dtype)  # (n//group, 1, 1, 1)
    std = jnp.tile(std, (1, group, h, w)).reshape(n, h, w, 1)
    return jnp.concatenate([x, std], axis=-1)


class ResBlock(nn.Module):
    """conv3x3 + blur-downsample conv3x3, 1x1 downsample skip, /sqrt(2)
    (reference discriminator.py:60-76).

    ``pack_in`` / ``pack_out``: input arrives space-to-depth f=pack_in packed
    (ops/packed.py); conv1 runs packed-to-packed and the two downsample convs
    emit f=pack_out packed output (1 = ordinary (H/2, W/2, features) tensor —
    strided convs repack/unpack for free). Exact same math, lane-dense
    layouts (the shallow-channel 512^2/256^2 levels otherwise pad
    C=32/64 -> 128 lanes: 4x/2x HBM traffic, ~8 TF/s convs)."""

    features: int
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    pack_in: int = 1
    pack_out: int = 1

    @nn.compact
    def __call__(self, x):
        f, fo = self.pack_in, self.pack_out
        in_ch = x.shape[-1] // (f * f)
        out = ConvLayer(in_ch, 3, activate=True, pack=(f, f),
                        name="conv1")(x)
        out = ConvLayer(self.features, 3, blur_kernel=self.blur_kernel,
                        downsample=True, activate=True, pack=(f, fo),
                        name="conv2")(out)
        skip = ConvLayer(self.features, 1, blur_kernel=self.blur_kernel,
                         downsample=True, activate=False, pack=(f, fo),
                         name="skip")(x)
        return (out + skip) / math.sqrt(2.0)


class ResidualBackbone(nn.Module):
    """FromRGB -> ResBlocks -> minibatch stddev -> 3x3 conv -> flatten.
    The penultimate feature extractor of ResidualDiscriminatorP
    (reference discriminator.py:191-235)."""

    size: int
    channel_multiplier: float = 2.0
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    small32: bool = False
    dtype: Any = jnp.float32
    # Space-to-depth packed stem (ops/packed.py): when the top level has
    # <= 32 channels (512^2 with channel_multiplier 1.0), run FromRGB and the
    # shallow ResBlocks on f=2 packed tensors, staying packed down the
    # downsample chain until a level reaches 128 channels (strided convs
    # repack for free) — identical function, ~2x faster levels (measured,
    # tools/packed_micro.py). Param tree is unchanged.
    pack_stem: bool = True

    @property
    def packed_io(self) -> int:
        """2 when this D can consume packed images (``packed_in=True``),
        else 1 (static mirror of the stem-packing condition below)."""
        ch = stylegan2_channels(self.channel_multiplier, self.small32)
        return 2 if (self.pack_stem and ch[self.size] <= 32) else 1

    @nn.compact
    def __call__(self, x, train: bool = True, packed_in: bool = False):
        from contrad_tpu.ops.packed import space_to_depth

        channels = stylegan2_channels(self.channel_multiplier, self.small32)
        packed = self.pack_stem and channels[self.size] <= 32
        if packed_in and not packed:
            raise ValueError("packed_in requires a packed stem")
        x = (x * 2.0 - 1.0).astype(self.dtype)
        if packed and not packed_in:
            x = space_to_depth(x, 2)
        x = FromRGB(channels[self.size], pack=(2, 2) if packed else (1, 1),
                    name="from_rgb")(x)
        log_size = int(math.log2(self.size))
        f_in = 2 if packed else 1
        for i in range(log_size, 2, -1):
            # stay packed while the next level is still lane-shallow
            f_out = 2 if (f_in == 2 and channels[2 ** (i - 1)] < 128
                          and i > 3) else 1
            x = ResBlock(channels[2 ** (i - 1)], self.blur_kernel,
                         pack_in=f_in, pack_out=f_out,
                         name=f"block_{2**i}")(x)
            f_in = f_out
        x = minibatch_stddev(x)
        x = ConvLayer(channels[4], 3, activate=True, name="last_conv")(x)
        # heads/losses run in f32
        return x.reshape(x.shape[0], -1).astype(jnp.float32)


def DStylegan2(
    size: int,
    channel_multiplier: float = 2.0,
    blur_kernel: Sequence[int] = (1, 3, 3, 1),
    small32: bool = False,
    mlp_linear: bool = False,
    d_hidden: int = 128,
    n_classes: int = 1,
    dtype: Any = jnp.float32,
    pack_stem: bool = True,
) -> Discriminator:
    channels = stylegan2_channels(channel_multiplier, small32)
    return Discriminator(
        backbone=ResidualBackbone(
            size=size, channel_multiplier=channel_multiplier,
            blur_kernel=tuple(blur_kernel), small32=small32, dtype=dtype,
            pack_stem=pack_stem),
        d_penul=channels[4] * 4 * 4,
        n_classes=n_classes,
        d_hidden=d_hidden,
        mlp_linear=mlp_linear,
        use_sn=False,  # StyleGAN2 D has no spectral norm in the reference
    )


class ResidualDiscriminator(nn.Module):
    """Plain (non-protocol) residual D with the EqualLinear head
    (reference discriminator.py:79-128)."""

    size: int
    channel_multiplier: float = 2.0
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    small32: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        channels = stylegan2_channels(self.channel_multiplier, self.small32)
        feats = ResidualBackbone(
            self.size, self.channel_multiplier, tuple(self.blur_kernel),
            self.small32, name="backbone")(x, train)
        h = EqualDense(channels[4], activation=True, name="fc1")(feats)
        return EqualDense(1, name="fc2")(h)


class SkipBlock(nn.Module):
    """FromRGB + conv pair + input downsample (reference discriminator.py:36-57)."""

    in_features: int
    features: int
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, features=None):
        out = FromRGB(self.in_features, name="from_rgb")(x)
        features = out if features is None else out + features
        features = ConvLayer(self.in_features, 3, activate=True,
                             name="conv1")(features)
        features = ConvLayer(self.features, 3, blur_kernel=self.blur_kernel,
                             downsample=True, activate=True, name="conv2")(features)
        x = Downsample(self.blur_kernel, name="downsample")(x)
        return x, features


class SkipDiscriminator(nn.Module):
    """Skip-connection D (reference discriminator.py:131-188)."""

    size: int
    channel_multiplier: float = 2.0
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    small32: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        channels = stylegan2_channels(self.channel_multiplier, self.small32)
        x = x * 2.0 - 1.0
        log_size = int(math.log2(self.size))
        features = None
        for i in range(log_size, 2, -1):
            x, features = SkipBlock(
                channels[2**i], channels[2 ** (i - 1)], self.blur_kernel,
                name=f"block_{2**i}")(x, features)
        out = FromRGB(channels[4], name="last_rgb")(x)
        features = out + features
        features = minibatch_stddev(features)
        features = ConvLayer(channels[4], 3, activate=True,
                             name="last_conv")(features)
        features = features.reshape(features.shape[0], -1)
        h = EqualDense(channels[4], activation=True, name="fc1")(features)
        return EqualDense(1, name="fc2")(h)
