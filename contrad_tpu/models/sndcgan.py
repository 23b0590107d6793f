"""SNDCGAN generator and discriminator (reference: ``models/gan/sndcgan.py``).

Layout is NHWC (TPU-native). Weight-compat with the reference is a non-goal;
architecture, activation placement, init distribution (N(0, 0.02), DCGAN
convention, reference ``sndcgan.py:54-66,126-147``) and input/output ranges
([0,1] images; D internally rescales to [-1,1], ``sndcgan.py:123``) are
preserved.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from contrad_tpu.models.base import Discriminator, l2_normalize_rows
from contrad_tpu.ops.spectral_norm import SNConv

dcgan_init = nn.initializers.normal(stddev=0.02)


class GSndcgan(nn.Module):
    """z in U(-1,1)^nz -> image in [0,1]^(H,W,C).

    Dense -> BN -> ReLU -> 3x(ConvT 4x4 s2 + BN + ReLU) -> 3x3 conv -> tanh,
    rescaled to [0,1] (reference ``sndcgan.py:13-52``). The initial BatchNorm
    is applied over the full flattened vector as channels, matching the
    reference's BatchNorm2d on (N, C, 1, 1) (``sndcgan.py:26,45``).
    """

    image_size: Tuple[int, int, int]  # (H, W, C)
    ngf: int = 64
    nz: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = True) -> jax.Array:
        s_h, s_w, nc = self.image_size
        s_hb, s_wb = s_h // 8, s_w // 8
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name
        )

        x = nn.Dense(self.ngf * 8 * s_hb * s_wb, kernel_init=dcgan_init,
                     dtype=self.dtype, name="linear")(z.astype(self.dtype))
        x = norm("norm_init")(x)
        x = jax.nn.relu(x)
        # Reference reshapes channel-major (N, ngf*8, s_hb, s_wb); transpose
        # to NHWC to keep the same channel/spatial assignment.
        x = x.reshape(-1, self.ngf * 8, s_hb, s_wb).transpose(0, 2, 3, 1)

        for i, ch in enumerate((self.ngf * 4, self.ngf * 2, self.ngf)):
            x = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding="SAME",
                                 kernel_init=dcgan_init, dtype=self.dtype,
                                 name=f"up{i}")(x)
            x = norm(f"norm{i}")(x)
            x = jax.nn.relu(x)

        x = nn.Conv(nc, (3, 3), padding="SAME", kernel_init=dcgan_init,
                    dtype=self.dtype, name="to_rgb")(x)
        x = jnp.tanh(x.astype(jnp.float32))
        x = 0.5 * x + 0.5
        # Training emits the compute dtype: an f32 image here would promote
        # the whole downstream augment chain (concat([real, real, fake]) in
        # modes.py follows numpy promotion) back to f32, doubling the
        # image-path HBM bytes of a bf16 model. Eval stays f32 for metric
        # fidelity (FID stats, PNG/GIF writers).
        return x.astype(self.dtype) if train else x

    def sample_latent(self, rng: jax.Array, n: int) -> jax.Array:
        return jax.random.uniform(rng, (n, self.nz), minval=-1.0, maxval=1.0)


class SndcganBackbone(nn.Module):
    """7-conv LeakyReLU(0.1) feature stack with spectral norm
    (reference ``sndcgan.py:92-125``)."""

    image_size: Tuple[int, int, int]
    ndf: int = 64
    normalize: bool = False
    use_sn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        conv = lambda ch, k, s, name: SNConv(
            ch, (k, k), strides=(s, s), padding=(k - 1) // 2 if k == 3 else 1,
            use_sn=self.use_sn, kernel_init=dcgan_init, dtype=self.dtype,
            name=name)
        x = (x * 2.0 - 1.0).astype(self.dtype)
        x = jax.nn.leaky_relu(conv(self.ndf, 3, 1, "c0")(x, train), 0.1)
        x = jax.nn.leaky_relu(conv(self.ndf * 2, 4, 2, "c1")(x, train), 0.1)
        x = jax.nn.leaky_relu(conv(self.ndf * 2, 3, 1, "c2")(x, train), 0.1)
        x = jax.nn.leaky_relu(conv(self.ndf * 4, 4, 2, "c3")(x, train), 0.1)
        x = jax.nn.leaky_relu(conv(self.ndf * 4, 3, 1, "c4")(x, train), 0.1)
        x = jax.nn.leaky_relu(conv(self.ndf * 8, 4, 2, "c5")(x, train), 0.1)
        x = jax.nn.leaky_relu(conv(self.ndf * 8, 3, 1, "c6")(x, train), 0.1)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)  # heads in f32
        if self.normalize:
            x = l2_normalize_rows(x)
        return x


def sndcgan_n_features(image_size: Tuple[int, int, int], ndf: int = 64) -> int:
    s_h, s_w, _ = image_size
    return ndf * 8 * (s_h // 8) * (s_w // 8)


def DSndcgan(
    image_size: Tuple[int, int, int],
    ndf: int = 64,
    n_classes: int = 1,
    normalize: bool = False,
    disable_sn: bool = False,
    mlp_linear: bool = False,
    d_hidden: int = 128,
    dtype: Any = jnp.float32,
) -> Discriminator:
    backbone = SndcganBackbone(
        image_size=image_size, ndf=ndf, normalize=normalize,
        use_sn=not disable_sn, dtype=dtype
    )
    return Discriminator(
        backbone=backbone,
        d_penul=sndcgan_n_features(image_size, ndf),
        n_classes=n_classes,
        d_hidden=d_hidden,
        mlp_linear=mlp_linear,
        use_sn=not disable_sn,
        head_kernel_init=dcgan_init,  # reference re-inits heads to N(0,0.02)
    )
