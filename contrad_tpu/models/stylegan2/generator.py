"""StyleGAN2 generator (reference: ``models/gan/stylegan2/generator.py``).

TPU-native modulated convolution: the reference materializes a per-sample
weight tensor (B, out, in, k, k) and runs a grouped conv with groups=B
(``generator.py:56-82``) — a CUDA-friendly trick that would defeat the MXU.
Because the conv is linear in both the input channels and the weight, the
*exact same computation* factorizes as

    y[b] = demod[b,:] * conv(x[b] * style[b,:], scale*W)

i.e. modulate inputs -> ONE shared batched conv (dense MXU matmuls) ->
demodulate outputs, with ``demod[b,o] = rsqrt(sum_hw(scale*W)^2[i,o] @
style^2[b,i] + eps)`` computed by a single small matmul. Same math, no 5-D
weights, no grouped conv.

Per-layer noise injection and train-time style mixing draw from the linen
'noise' RNG stream (pass ``rngs={'noise': key}`` to apply).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from contrad_tpu.models.stylegan2.layers import (
    Blur,
    EqualDense,
    PixelNorm,
)
from contrad_tpu.ops.fused_act import FusedLeakyReLU
from contrad_tpu.ops.upfirdn2d import blur2d, make_kernel, upsample2d


def stylegan2_channels(channel_multiplier: float = 2.0, small32: bool = False):
    """Resolution -> channel map (reference generator.py:161-179)."""
    if small32:
        return {4: 512, 8: 512, 16: 256, 32: 128}
    return {
        4: 512, 8: 512, 16: 512, 32: 512,
        64: int(256 * channel_multiplier),
        128: int(128 * channel_multiplier),
        256: int(64 * channel_multiplier),
        512: int(32 * channel_multiplier),
        1024: int(16 * channel_multiplier),
    }


class ModulatedConv(nn.Module):
    """Style-modulated, optionally demodulated conv (reference
    generator.py:17-82), reformulated for the MXU (see module docstring)."""

    features: int
    kernel_size: int
    demodulate: bool = True
    upsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    eps: float = 1e-8
    fuse_blur: bool = True  # fold the post-upsample blur into the conv
    # Space-to-depth packing (ops/packed.py): input is f_in-packed, output is
    # left f_out-packed. Per-sample modulation/demodulation vectors tile over
    # the slots; the conv kernel is transformed exactly. Used on the shallow
    # top level of the 512 generator (C=32 would pad 4x into the 128 lanes).
    pack: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, style):
        from contrad_tpu.ops.packed import packed_conv

        k = self.kernel_size
        f_in, f_out = self.pack
        in_ch = x.shape[-1] // (f_in * f_in)
        weight = self.param("weight", nn.initializers.normal(stddev=1.0),
                            (k, k, in_ch, self.features))
        scale = 1.0 / math.sqrt(in_ch * k * k)
        w = (weight * scale).astype(x.dtype)

        # modulation + demodulation stats in f32 for stability
        s = EqualDense(in_ch, bias_init=1.0, name="modulation")(
            style.astype(jnp.float32))  # (N, in)
        s_in = jnp.tile(s, (1, f_in * f_in)) if f_in > 1 else s
        xm = x * s_in[:, None, None, :].astype(x.dtype)

        if self.demodulate:
            w_sq = jnp.sum((weight * scale) ** 2, axis=(0, 1))  # (in, out) f32
            demod = jax.lax.rsqrt(jnp.matmul(s**2, w_sq) + self.eps)  # (N, out)
            if f_out > 1:
                demod = jnp.tile(demod, (1, f_out * f_out))
            demod = demod.astype(x.dtype)

        if self.pack != (1, 1):
            if self.upsample:
                # fused transpose-conv + blur, dilation-free in the packed
                # domain (sub-pixel identity; ops/packed.py)
                from contrad_tpu.ops.upfirdn2d import compose_blur_kernel

                factor = 2
                p = (len(self.blur_kernel) - factor) - (k - 1)
                pb = ((p + 1) // 2 + factor - 1, p // 2 + 1)
                kc = compose_blur_kernel(
                    make_kernel(self.blur_kernel) * factor**2, w)
                y = packed_conv(xm, kc, f_in, f_out, 1,
                                (k - 1 + pb[0], k - 1 + pb[1]),
                                lhs_dilation=factor)
            else:
                y = packed_conv(xm, w, f_in, f_out, 1, (k // 2, k // 2))
            if self.demodulate:
                y = y * demod[:, None, None, :]
        elif self.upsample and self.fuse_blur:
            # conv_transpose(VALID, s=2) + blur(pad) == ONE lhs-dilated conv
            # with the blur folded into the kernel (see compose_blur_kernel):
            # composed padding = (k-1) + blur_pad per side. Removes the
            # bandwidth-bound depthwise blur over the 2x-res activation.
            from contrad_tpu.ops.upfirdn2d import compose_blur_kernel

            factor = 2
            p = (len(self.blur_kernel) - factor) - (k - 1)
            pb = ((p + 1) // 2 + factor - 1, p // 2 + 1)
            kc = compose_blur_kernel(
                make_kernel(self.blur_kernel) * factor**2, w)
            y = jax.lax.conv_general_dilated(
                xm, kc, (1, 1),
                padding=((k - 1 + pb[0], k - 1 + pb[1]),
                         (k - 1 + pb[0], k - 1 + pb[1])),
                lhs_dilation=(factor, factor),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if self.demodulate:
                y = y * demod[:, None, None, :]
        elif self.upsample:
            y = jax.lax.conv_transpose(
                xm, w, strides=(2, 2), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if self.demodulate:
                y = y * demod[:, None, None, :]
            factor = 2
            p = (len(self.blur_kernel) - factor) - (k - 1)
            pad = ((p + 1) // 2 + factor - 1, p // 2 + 1)
            y = blur2d(y, make_kernel(self.blur_kernel) * factor**2, pad)
        else:
            y = jax.lax.conv_general_dilated(
                xm, w, (1, 1),
                padding=((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if self.demodulate:
                y = y * demod[:, None, None, :]
        return y


class NoiseInjection(nn.Module):
    """x + weight * N(0,1) per-pixel noise (reference generator.py:85-94).

    ``pack``: x is the f-packed layout of the logical tensor; the per-fine-
    pixel noise is drawn at fine resolution (same RNG stream as unpacked)
    and space-to-depth'd, broadcasting over each slot's channel group."""

    pack: int = 1

    @nn.compact
    def __call__(self, x, noise=None):
        weight = self.param("weight", nn.initializers.zeros, ())
        f = self.pack
        if f > 1:
            from contrad_tpu.ops.packed import space_to_depth

            n, h, w, cc = x.shape
            if noise is None:
                noise = jax.random.normal(self.make_rng("noise"),
                                          (n, h * f, w * f, 1), dtype=x.dtype)
            noise_p = space_to_depth(noise.astype(x.dtype), f)  # (n,h,w,f^2)
            c = cc // (f * f)
            y = x.reshape(n, h, w, f * f, c)
            y = y + weight.astype(x.dtype) * noise_p[..., None]
            return y.reshape(n, h, w, cc)
        if noise is None:
            n, h, w, _ = x.shape
            noise = jax.random.normal(self.make_rng("noise"), (n, h, w, 1),
                                      dtype=x.dtype)
        return x + weight.astype(x.dtype) * noise.astype(x.dtype)


class ConstantInput(nn.Module):
    """Learned 4x4 constant (reference generator.py:97-105)."""

    channels: int
    size: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, batch: int, dtype=None):
        const = self.param("const", nn.initializers.normal(stddev=1.0),
                           (1, self.size, self.size, self.channels))
        if dtype is not None:
            const = const.astype(dtype)
        return jnp.tile(const, (batch, 1, 1, 1))


class StyleLayer(nn.Module):
    """ModulatedConv -> noise -> fused leaky-relu (reference generator.py:108-124)."""

    features: int
    kernel_size: int = 3
    upsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    demodulate: bool = True
    pack: Tuple[int, int] = (1, 1)  # space-to-depth packing (ops/packed.py)

    @nn.compact
    def __call__(self, x, style, noise=None):
        x = ModulatedConv(self.features, self.kernel_size,
                          demodulate=self.demodulate, upsample=self.upsample,
                          blur_kernel=self.blur_kernel, pack=self.pack,
                          name="conv")(x, style)
        x = NoiseInjection(pack=self.pack[1], name="noise")(x, noise)
        return FusedLeakyReLU(self.features, pack=self.pack[1],
                              name="activate")(x)


class ToRGB(nn.Module):
    """1x1 modulated (non-demodulated) conv to RGB + skip upsample
    (reference generator.py:127-146)."""

    upsample: bool = True
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    pack: int = 1  # input/output f-packed; skip-upsample stays packed too

    @nn.compact
    def __call__(self, x, style, skip=None):
        f = self.pack
        out = ModulatedConv(3, 1, demodulate=False, pack=(f, f),
                            name="conv")(x, style)
        bias = self.param("bias", nn.initializers.zeros, (1, 1, 1, 3))
        if f > 1:
            bias = jnp.tile(bias, (1, 1, 1, f * f))
        out = out + bias.astype(out.dtype)
        if skip is not None:
            if f > 1:
                from contrad_tpu.ops.packed import upsample2d_packed

                skip = upsample2d_packed(skip, make_kernel(self.blur_kernel), f)
            else:
                skip = upsample2d(skip, make_kernel(self.blur_kernel))
            out = out + skip.astype(out.dtype)
        return out


class GStylegan2(nn.Module):
    """Style MLP + progressive synthesis with skip ToRGB chain
    (reference generator.py:149-290). Output in [0,1], clamped in eval."""

    size: int
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: float = 2.0
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    small32: bool = False
    dtype: Any = jnp.float32  # synthesis compute dtype (style MLP stays f32)
    # Space-to-depth packed shallow levels (ops/packed.py): every synthesis
    # level with <= 64 channels (256+ with channel_multiplier 1.0) runs its
    # two StyleLayers, ToRGB and skip-upsample f=2 packed. Non-top packed
    # levels unpack at their end (an upsample into a finer packed grid is
    # not conv-expressible); the top level stays packed until the final
    # image depth_to_space. Identical function and param tree; lane-dense
    # layouts on the shallowest (largest) tensors.
    pack_top: bool = True

    @property
    def packed_io(self) -> int:
        """2 when this G can emit packed images (``packed_out=True``), else 1.
        Static (field-only) mirror of the setup-time ``_packed_top`` flag so
        trainers/CLIs can decide the packed-image path before init."""
        ch = stylegan2_channels(self.channel_multiplier, self.small32)
        return 2 if (self.pack_top and ch[self.size] <= 64) else 1

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1

    def setup(self):
        channels = stylegan2_channels(self.channel_multiplier, self.small32)
        self.channels = channels

        self.style = [PixelNorm(name="pixel_norm")] + [
            EqualDense(self.style_dim, lr_mul=self.lr_mlp, activation=True,
                       name=f"style_{i}")
            for i in range(self.n_mlp)
        ]

        self.input = ConstantInput(channels[4])
        self.conv1 = StyleLayer(channels[4], 3, blur_kernel=self.blur_kernel)
        self.to_rgb1 = ToRGB(upsample=False)

        self._packed_levels = frozenset(
            i for i in range(3, self.log_size + 1)
            if self.pack_top and channels[2**i] <= 64)
        self._packed_top = self.log_size in self._packed_levels
        layers = []
        to_rgbs = []
        in_ch = channels[4]
        for i in range(3, self.log_size + 1):
            out_ch = channels[2**i]
            packed = i in self._packed_levels
            layers.append(StyleLayer(out_ch, 3, upsample=True,
                                     blur_kernel=self.blur_kernel,
                                     pack=(1, 2) if packed else (1, 1)))
            layers.append(StyleLayer(out_ch, 3, blur_kernel=self.blur_kernel,
                                     pack=(2, 2) if packed else (1, 1)))
            to_rgbs.append(ToRGB(blur_kernel=self.blur_kernel,
                                 pack=2 if packed else 1))
            in_ch = out_ch
        self.layers = layers
        self.to_rgbs = to_rgbs

    # ------------------------------------------------------------- helpers

    def style_forward(self, z):
        """z -> w (the style MLP; reference get_latent, generator.py:236)."""
        x = z
        for layer in self.style:
            x = layer(x)
        return x

    def mean_latent(self, rng, n_latent: int):
        z = jax.random.normal(rng, (n_latent, self.style_dim))
        return jnp.mean(self.style_forward(z), axis=0, keepdims=True)

    def sample_latent(self, rng, n: int):
        return jax.random.normal(rng, (n, self.style_dim))

    # ------------------------------------------------------------- forward

    def __call__(self, z, train: bool = True, style_mix: float = 0.9,
                 input_is_latent: bool = False, noise: Optional[Any] = None,
                 return_latents: bool = False, packed_out: bool = False):
        latent = z if input_is_latent else self.style_forward(z)

        if noise is None:
            noise = [None] * self.num_layers

        if latent.ndim < 3:
            latents = jnp.repeat(latent[:, None, :], self.n_latent, axis=1)
        else:
            latents = latent

        if train and style_mix > 0:
            # Per-sample style mixing (reference generator.py:252-266): with
            # prob style_mix pick a crossover layer; layers >= crossover use a
            # second style.
            n = latents.shape[0]
            r_mix, r_layer, r_z = jax.random.split(self.make_rng("noise"), 3)
            latent_mix = self.style_forward(
                jax.random.normal(r_z, (n, self.style_dim)))[:, None, :]
            nomix = jax.random.uniform(r_mix, (n,)) >= style_mix
            mix_layer = jax.random.randint(r_layer, (n,), 0, self.n_latent)
            mix_layer = jnp.where(nomix, self.n_latent, mix_layer)
            layer_idx = jnp.arange(self.n_latent)[None, :]
            mask = (layer_idx < mix_layer[:, None]).astype(latents.dtype)[..., None]
            latents = latents * mask + latent_mix * (1.0 - mask)

        out = self.input(latents.shape[0], dtype=self.dtype)
        out = self.conv1(out, latents[:, 0], noise=noise[0])
        skip = self.to_rgb1(out, latents[:, 1])

        from contrad_tpu.ops.packed import depth_to_space

        idx = 1
        for i, to_rgb in enumerate(self.to_rgbs):
            out = self.layers[2 * i](out, latents[:, idx], noise=noise[1 + 2 * i])
            out = self.layers[2 * i + 1](out, latents[:, idx + 1],
                                         noise=noise[2 + 2 * i])
            skip = to_rgb(out, latents[:, idx + 2], skip)
            idx += 2
            # non-top packed levels unpack at the boundary: the next level's
            # upsample into a finer packed grid is not conv-expressible
            if i + 3 in self._packed_levels and i + 3 != self.log_size:
                out = depth_to_space(out, 2)
                skip = depth_to_space(skip, 2)

        if packed_out and not self._packed_top:
            raise ValueError("packed_out requires a packed top level "
                             "(pack_top and a lane-shallow top channel map)")
        if self._packed_top and not packed_out:
            skip = depth_to_space(skip, 2)
        # Training emits the compute dtype: an f32 image here would promote
        # the whole downstream augment chain (and, via the [real, real, fake]
        # concat in modes.py, the REAL images too) back to f32 — measured
        # 2x image-path bytes on the 512^2 bf16 step (round-4 trace). Eval
        # stays f32 for metric fidelity (FID stats, PNG/GIF writers).
        image = 0.5 * skip.astype(self.dtype if train else jnp.float32) + 0.5
        if not train:
            image = jnp.clip(image, 0.0, 1.0)
        if return_latents:
            return image, latents
        return image
