"""Norm-free spectral-norm ResNet discriminators
(reference: ``models/gan/snresnet.py``).

ResNet-18/34 feature stacks with LeakyReLU(0.1), no normalization layers,
spectral norm on every conv/linear, 4x4 average-pool head -> 512-d penultimate
(reference ``snresnet.py:73-86``). Init uses flax's default (lecun-normal) —
the reference keeps torch's default kaiming-uniform; both are fan-in-scaled
and the spectral norm renormalizes the scale anyway.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from contrad_tpu.models.base import Discriminator
from contrad_tpu.ops.spectral_norm import SNConv


class BasicBlock(nn.Module):
    """conv3x3 -> lrelu -> conv3x3 (+ 1x1 shortcut on shape change) -> lrelu
    (reference snresnet.py:22-40)."""

    planes: int
    stride: int = 1
    use_sn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_planes = x.shape[-1]
        out = SNConv(self.planes, (3, 3), strides=(self.stride, self.stride),
                     padding=1, use_sn=self.use_sn, dtype=self.dtype,
                     name="conv1")(x, train)
        out = jax.nn.leaky_relu(out, 0.1)
        out = SNConv(self.planes, (3, 3), padding=1, use_sn=self.use_sn,
                     dtype=self.dtype, name="conv2")(out, train)
        if self.stride != 1 or in_planes != self.planes:
            x = SNConv(self.planes, (1, 1), strides=(self.stride, self.stride),
                       padding=0, use_sn=self.use_sn, dtype=self.dtype,
                       name="shortcut")(x, train)
        return jax.nn.leaky_relu(out + x, 0.1)


class SnresnetBackbone(nn.Module):
    """ResNet feature stack -> avg_pool(4) -> (N, 512) penultimate."""

    num_blocks: Sequence[int] = (2, 2, 2, 2)
    use_sn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = (x * 2.0 - 1.0).astype(self.dtype)
        x = SNConv(64, (3, 3), padding=1, use_sn=self.use_sn, dtype=self.dtype,
                   name="conv1")(x, train)
        x = jax.nn.leaky_relu(x, 0.1)
        for stage, (planes, n_blocks, stride) in enumerate(
            zip((64, 128, 256, 512), self.num_blocks, (1, 2, 2, 2))
        ):
            for b in range(n_blocks):
                x = BasicBlock(planes, stride if b == 0 else 1,
                               use_sn=self.use_sn, dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(x, train)
        # avg_pool2d(4) then flatten (reference snresnet.py:84-86)
        x = nn.avg_pool(x, (4, 4), strides=(4, 4))
        return x.reshape(x.shape[0], -1).astype(jnp.float32)


def _make(num_blocks, n_classes=1, disable_sn=False, mlp_linear=False,
          d_hidden=128, dtype=jnp.float32):
    backbone = SnresnetBackbone(num_blocks=tuple(num_blocks),
                                use_sn=not disable_sn, dtype=dtype)
    return Discriminator(
        backbone=backbone,
        d_penul=512,  # 512 channels x 1x1 after avg_pool(4) on /8 features
        n_classes=n_classes,
        d_hidden=d_hidden,
        mlp_linear=mlp_linear,
        use_sn=not disable_sn,
    )


def DSnresnet18(**kwargs) -> Discriminator:
    return _make((2, 2, 2, 2), **kwargs)


def DSnresnet34(**kwargs) -> Discriminator:
    return _make((3, 4, 6, 3), **kwargs)
