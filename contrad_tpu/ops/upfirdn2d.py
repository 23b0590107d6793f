"""upfirdn2d — fused upsample / FIR filter / downsample.

TPU-native equivalent of the reference CUDA kernel
(``models/gan/stylegan2/op/upfirdn2d_kernel.cu`` + ``op/upfirdn2d.py``), the
StyleGAN2 resampling primitive: zero-insert upsample by ``up``, pad by
``(pad0, pad1)`` per spatial dim (negative = crop), correlate with a separable
FIR kernel, then keep every ``down``-th sample.

Design: this is *exactly* one ``lax.conv_general_dilated`` with
``lhs_dilation=up``, ``window_strides=down`` and explicit padding, as a
depthwise (feature_group_count=C) conv — a single fused XLA op that the TPU
backend lowers natively, with autodiff for free (XLA's conv transpose rule
reproduces the reference's hand-written double-backward g_pad math,
``op/upfirdn2d.py:111-116``). A hand-written Pallas kernel was benchmarked
against this and the XLA conv path was kept (see ops/pallas/README if
present); the separable path below splits the 2-D FIR into two rank-1 passes,
which halves the multiply count for k x k kernels.

Note: the FIR kernels used by StyleGAN2 ([1,3,3,1] outer product) are
symmetric, so correlation == convolution; we correlate with the given kernel.
Input layout NHWC (reference is NCHW).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_kernel(k: Sequence[float]) -> np.ndarray:
    """1-D -> outer product; normalized to sum 1 (reference layers.py:23-31).

    Returns NUMPY (static): FIR kernels are compile-time constants; keeping
    them out of jnp means they stay concrete under jit (JAX hoists closure
    arrays as tracers, which would silently disable the separable fast path
    and the Pallas kernel's tap extraction)."""
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    return k / k.sum()


def _depthwise(x, w_hw, strides, padding, lhs_dilation):
    c = x.shape[-1]
    w = jnp.tile(jnp.asarray(w_hw)[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def upfirdn2d(
    x: jax.Array,
    kernel: jax.Array,
    up: int = 1,
    down: int = 1,
    pad: Tuple[int, int] = (0, 0),
) -> jax.Array:
    """x: (N, H, W, C); kernel: (kh, kw) FIR filter; pad applied to both dims.

    Output size per dim: (size*up + pad0 + pad1 - k) // down + 1.
    """
    pad0, pad1 = pad
    # lhs_dilation inserts zeros only BETWEEN samples ((in-1)*up+1); upfirdn's
    # zero-insertion also appends up-1 trailing zeros (in*up). Fold them into
    # the high padding — identical values, correct output size.
    p1 = pad1 + (up - 1)
    if getattr(kernel, "ndim", 2) == 2 and _is_separable(kernel):
        # Two rank-1 passes: ~k/2x fewer MACs for the 4x4 blur.
        kh, kw = _separate(kernel)
        y = _depthwise(x, kh[:, None], (down, 1), ((pad0, p1), (0, 0)), (up, 1))
        return _depthwise(y, kw[None, :], (1, down), ((0, 0), (pad0, p1)), (1, up))
    return _depthwise(x, kernel, (down, down), ((pad0, p1), (pad0, p1)),
                      (up, up))


def _is_separable(kernel) -> bool:
    if isinstance(kernel, jax.core.Tracer):
        return False
    k = np.asarray(kernel)
    if k.ndim != 2:
        return False
    u, s, vt = np.linalg.svd(k)
    return bool(s[1:].max(initial=0.0) < 1e-6 * max(s[0], 1e-30))


def _separate(kernel):
    k = np.asarray(kernel)
    u, s, vt = np.linalg.svd(k)
    col = u[:, 0] * np.sqrt(s[0])
    row = vt[0] * np.sqrt(s[0])
    # keep positive orientation for the (all-positive) blur kernels
    if col.sum() < 0:
        col, row = -col, -row
    return col.astype(np.float32), row.astype(np.float32)


def compose_blur_kernel(blur: np.ndarray, w: jax.Array) -> jax.Array:
    """Fold a FIR blur into an adjacent conv: K[u,v,i,o] = sum_{s,t}
    blur[s,t] * w[u-s,v-t,i,o] (full 2-D convolution along the spatial dims).

    conv_s(blur(x), W) == conv_s(x, K) and blur(conv_transpose(x, W)) ==
    lhs-dilated-conv(x, K) with adjusted padding — exact, since the blur is a
    per-channel spatial LTI filter. On TPU this removes the bandwidth-bound
    depthwise blur pass (a full HBM roundtrip of the high-res activation) and
    moves its taps into the MXU conv. The reference instead runs a dedicated
    CUDA upfirdn2d kernel back-to-back with cuDNN convs
    (models/gan/stylegan2/op/upfirdn2d_kernel.cu).

    ``blur``: (kb, kb) static numpy; ``w``: (k, k, in, out). Returns
    (k+kb-1, k+kb-1, in, out).

    Implemented as ONE matmul against a static (kk^2, k^2) tap matrix. The
    obvious alternative — a conv over the weights reshaped to
    (in*out, k, k, 1) — costs ~4 ms/step in the 512^2 train step (six
    batch-262144 C=1 convs at 0.1% MXU plus their f32 grad reduces and
    relayouts, measured round-4 roofline); the static contraction compiles to
    a trivially fused op and its VJP is the transposed matmul."""
    kb = blur.shape[0]
    k = w.shape[0]
    in_ch, out_ch = w.shape[2], w.shape[3]
    kk = k + kb - 1
    # K[u,v] = sum_{s,t} blur[s,t] * w[u-s, v-t]: tap (d,e) contributes
    # blur[u-d, v-e] to output position (u, v).
    m = np.zeros((kk * kk, k * k), np.float32)
    for u in range(kk):
        for v in range(kk):
            for d in range(max(0, u - kb + 1), min(k, u + 1)):
                for e in range(max(0, v - kb + 1), min(k, v + 1)):
                    m[u * kk + v, d * k + e] = blur[u - d, v - e]
    out = jnp.asarray(m, w.dtype) @ w.reshape(k * k, in_ch * out_ch)
    return out.reshape(kk, kk, in_ch, out_ch)


# ---------------------------------------------------------------- wrappers
# Padding arithmetic from the reference (layers.py:34-92).

def upsample2d(x: jax.Array, kernel: jax.Array, factor: int = 2) -> jax.Array:
    k = kernel * (factor**2)
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, k, up=factor, down=1, pad=(pad0, pad1))


def downsample2d(x: jax.Array, kernel: jax.Array, factor: int = 2) -> jax.Array:
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=1, down=factor, pad=(pad0, pad1))


def blur2d(x: jax.Array, kernel: jax.Array, pad: Tuple[int, int],
           upsample_factor: int = 1) -> jax.Array:
    k = kernel * (upsample_factor**2) if upsample_factor > 1 else kernel
    return upfirdn2d(x, k, up=1, down=1, pad=pad)
