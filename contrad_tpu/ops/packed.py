"""Space-to-depth packed convolutions for shallow-channel high-res levels.

TPU motivation: XLA tiles the two minormost dims of an NHWC activation as
(8 sublane, 128 lane) = (N, C). At the StyleGAN2-512 stem the channel counts
are 3/32/64, so every 512^2 tensor is padded 4x (C=32 -> 128 lanes) in HBM —
4x the bandwidth on the hottest tensors of the model — and the 32-wide
matmuls underfill the MXU (measured 8.5 TF/s for the 3x3 32->32 conv vs 62
TF/s for its packed equivalent; tools/packed_micro.py).

The fix is a *layout* change, not a model change: represent a (B, H, W, C)
activation as its space-to-depth packing (B, H/f, W/f, f^2*C) and transform
each conv kernel so the packed conv computes the exact same function
(`pack_conv_kernel`). Parameters keep their reference shapes — packing is
invisible to checkpoints, init, and the optimizer.

Kernel math: for output fine pixel o = f_out*O + a and tap d of a stride-s
conv with low padding p, the input fine index is i = s*o + d - p. Writing
i = f_in*I + c splits into a coarse tap t = floor((s*a + d - p)/f_in) and an
input slot c = (s*a + d - p) mod f_in, so the packed conv has stride
S = s*f_out/f_in (must be integral), coarse kernel size K = t_max - t_min + 1,
low padding P = -t_min, and block-structured weights
W'[t, (c, ci), (a, co)] = w[d, ci, co]. Zero padding commutes with packing
(a zero coarse cell is f_in zero fine pixels), so equality is exact.

This is the TPU-native answer to the problem the reference solves with a
hand-tiled CUDA kernel pipeline at high resolution
(``/root/reference/models/gan/stylegan2/op/upfirdn2d_kernel.cu``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jax.Array, f: int) -> jax.Array:
    """(B, H, W, C) -> (B, H/f, W/f, f*f*C); channel index (a_y*f + a_x)*C + c."""
    if f == 1:
        return x
    b, h, w, c = x.shape
    assert h % f == 0 and w % f == 0, (x.shape, f)
    x = x.reshape(b, h // f, f, w // f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // f, w // f, f * f * c)


def depth_to_space(x: jax.Array, f: int) -> jax.Array:
    """Inverse of :func:`space_to_depth`."""
    if f == 1:
        return x
    b, hh, ww, cc = x.shape
    c = cc // (f * f)
    x = x.reshape(b, hh, ww, f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hh * f, ww * f, c)


def _axis_geometry(k: int, f_in: int, f_out: int, stride: int,
                   p_lo: int, l: int = 1) -> Tuple[int, int, int]:
    """(S, K, P_lo) of the packed conv along one spatial axis.

    ``l`` is the lhs_dilation of the original conv (transpose-conv
    upsampling): only taps with (stride*a + d - p_lo) % l == 0 touch a real
    input pixel; their fine input index is (stride*a + d - p_lo) / l.
    """
    assert (stride * f_out) % (l * f_in) == 0, (stride, f_in, f_out, l)
    S = stride * f_out // (l * f_in)
    pos = np.add.outer(stride * np.arange(f_out), np.arange(k)) - p_lo
    pos = pos[pos % l == 0] // l
    t = pos // f_in
    K = int(t.max() - t.min() + 1)
    return S, K, int(-t.min())


def pack_conv_kernel(
    w: jax.Array,
    f_in: int,
    f_out: int,
    stride: int,
    pad: Tuple[int, int],
    lhs_dilation: int = 1,
) -> Tuple[jax.Array, int, Tuple[int, int]]:
    """Transform an HWIO kernel so that

        conv(x, w, stride, pad, lhs_dilation) == depth_to_space(
            conv(space_to_depth(x, f_in), w', S, (P_lo, P_hi)), f_out)

    exactly (square kernels, zero padding). Returns ``(w', S, (P_lo, P_hi))``.
    With ``lhs_dilation`` (transpose-conv upsampling) the packed conv is
    dilation-free: the classic sub-pixel-convolution identity, generalized.
    The high pad ``P_hi = K - S - P_lo`` is valid whenever the original conv
    maps H -> H*l/stride (all StyleGAN2 resampling convs do); output-shape
    equality is asserted by the parity tests.
    """
    k_h, k_w, ci, co = w.shape
    assert k_h == k_w, "square kernels only"
    k = k_h
    l = lhs_dilation
    p_lo, _ = pad
    S, K, P_lo = _axis_geometry(k, f_in, f_out, stride, p_lo, l)
    P_hi = K - S - P_lo

    # One einsum against a CONSTANT 0/1 selection tensor. (An earlier
    # pad/stack/transpose formulation spent ~12 ms/step in the 512^2 train
    # step on relayouts of the tiny intermediates; a single contraction
    # against a static tensor compiles to one cheap fused op, and its VJP is
    # the transposed einsum.) Per axis: tap d of output slot a touches a real
    # input pixel iff (stride*a + d - p_lo) % l == 0, at fine index
    # i = (stride*a + d - p_lo)/l, i.e. coarse tap t = floor(i/f_in) + P_lo
    # and input slot c = i mod f_in.
    T1 = np.zeros((K, f_in, f_out, k), np.float32)  # [t, c, a, d]
    for a in range(f_out):
        for d in range(k):
            pos = stride * a + d - p_lo
            if pos % l:
                continue
            i = pos // l
            T1[i // f_in + P_lo, i % f_in, a, d] = 1.0
    # Outer product of the two axes: T[ty,tx, cy,cx, ay,ax, dy,dx]
    T = np.einsum("tcad,TCAD->tTcCaAdD", T1, T1)
    wp = jnp.einsum("tTcCaAdD,dDio->tTcCiaAo",
                    jnp.asarray(T, w.dtype), w)
    wp = wp.reshape(K, K, f_in * f_in * ci, f_out * f_out * co)
    return wp, S, (P_lo, P_hi)


def _upsample_matrix(h: int, k1: np.ndarray, factor: int) -> np.ndarray:
    """Static (factor*h, h) matrix of the 1-D FIR upsample: zero-stuff by
    ``factor``, pad per ops/upfirdn2d.upsample2d arithmetic, correlate with
    ``k1`` (already x ``factor``-scaled). U[i, j] = k1[factor*j - i + pad0]."""
    kb = k1.shape[0]
    p = kb - factor
    pad0 = (p + 1) // 2 + factor - 1
    u = np.zeros((factor * h, h), np.float32)
    i = np.arange(factor * h)[:, None]
    j = np.arange(h)[None, :]
    t = factor * j - i + pad0
    ok = (t >= 0) & (t < kb)
    u[ok] = k1[t[ok]]
    return u


def upsample2d_packed(x: jax.Array, kernel: np.ndarray,
                      factor: int = 2) -> jax.Array:
    """``upsample2d(x, kernel, factor)`` with the output left f=factor packed.

    Only used on C=3 RGB skips. For separable kernels (all StyleGAN2 blurs)
    this is two einsums against static (H, f, H) Toeplitz slices — the fine
    output index splits as (coarse, slot), so the packed result falls out of
    the contraction with the slot dims contiguous and the final merge is a
    pure reshape. The earlier formulation — a dense-diagonal (k, k, C, f^2*C)
    conv on the coarse grid — ran at ~3% of both rooflines on the 12-lane
    tensors (1.3 ms/step fwd+bwd in the 512^2 step, round-4 trace); the
    Toeplitz contraction is h-contracted MXU work instead."""
    from contrad_tpu.ops.upfirdn2d import _is_separable, _separate

    k = np.asarray(kernel, np.float32) * (factor**2)
    kb = k.shape[0]
    if _is_separable(k):
        b, h, w, c = x.shape
        kh, kw = _separate(k)
        uh = _upsample_matrix(h, kh, factor).reshape(h, factor, h)
        uw = _upsample_matrix(w, kw, factor).reshape(w, factor, w)
        z = jnp.einsum("HAk,bkwc->bHwAc", jnp.asarray(uh, x.dtype), x)
        z = jnp.einsum("WBk,bHkAc->bHWABc", jnp.asarray(uw, x.dtype), z)
        return z.reshape(b, h, w, factor * factor * c)
    p = kb - factor
    pad = ((p + 1) // 2 + factor - 1, p // 2 + factor - 1)
    c = x.shape[-1]
    wd = np.zeros((kb, kb, c, c), np.float32)
    wd[:, :, np.arange(c), np.arange(c)] = k[:, :, None]
    return packed_conv(x, jnp.asarray(wd), 1, factor, 1, pad,
                       lhs_dilation=factor)


def packed_conv(
    x: jax.Array,
    w: jax.Array,
    f_in: int,
    f_out: int,
    stride: int,
    pad: Tuple[int, int],
    lhs_dilation: int = 1,
) -> jax.Array:
    """conv(unpack(x), w)[packed]: x is the f_in-packed input, result is the
    f_out-packed output of the original (stride, pad, lhs_dilation) conv."""
    wp, S, P = pack_conv_kernel(w.astype(x.dtype), f_in, f_out, stride, pad,
                                lhs_dilation)
    # NOTE: a dot_general fast path for the 1x1/stride-1 case (FromRGB stem)
    # was tried on trace reasoning ("2.4% MXU + layout copies as a conv")
    # and MEASURED SLOWER in the full 512^2 step: 115.3 ms with it vs
    # 102.9 ms as a conv (bf16 b8 packed, tools/ablate_512.py) — XLA's
    # layout/fusion choices around conv_general_dilated beat the hand-picked
    # contraction once the backward pass is included. Keep 1x1 packed convs
    # on conv_general_dilated.
    return jax.lax.conv_general_dilated(
        x, wp, (S, S), (P, P),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
