"""Pallas TPU kernel: fused separable 2-D FIR blur (the upfirdn2d up=down=1
case — StyleGAN2's hottest resampling pattern at high resolution).

The XLA composite in ``ops/upfirdn2d.py`` lowers the separable blur to two
depthwise convolutions, each reading and writing the full activation in HBM.
This kernel fuses both passes: the input stays in HBM; each grid step DMAs one
*overlapping* padded row-window into VMEM scratch (overlap = kernel support,
which BlockSpec tiling cannot express), applies the vertical then horizontal
taps on the VPU, and writes only the final tile — one HBM read + one write
for the whole op instead of two of each.

Whether this beats XLA depends on resolution/channels;
``tools/pallas_blur_bench.py`` measures both on the target chip and
``blur2d_best`` dispatches on that evidence (the XLA path stays the default).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from contrad_tpu.ops.upfirdn2d import _separate, blur2d as xla_blur2d


def _blur_kernel_body(kh, kw, tile_h, hp, x_hbm, o_ref):
    """x_hbm: (N*Hp, Wp, C) in ANY/HBM (batch folded into rows so the DMA
    slices only the leading dim — Mosaic rejects 4-D hbm slices);
    o_ref: (1, tile_h, Wo, C) VMEM."""
    i = pl.program_id(0)  # batch index
    j = pl.program_id(1)  # row-tile index
    n_kh, n_kw = len(kh), len(kw)
    win_h = tile_h + n_kh - 1
    wp = x_hbm.shape[1]
    c = x_hbm.shape[2]

    def body(scratch, sem):
        # DMA the overlapping row window for this tile into VMEM.
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * hp + j * tile_h, win_h)], scratch, sem)
        dma.start()
        dma.wait()

        x = scratch[...].astype(jnp.float32)  # (win_h, Wp, C)
        acc = None
        for a in range(n_kh):  # vertical taps (static unroll, k=4)
            term = x[a : a + tile_h, :, :] * kh[a]
            acc = term if acc is None else acc + term
        # Horizontal taps via cyclic rolls along the (sublane) W dim —
        # Mosaic requires 8-aligned sublane slices, so shifted *slices* are
        # not expressible; rolls are. Wrapped columns are garbage and are
        # cropped by the caller (output keeps width Wp).
        out = None
        for b in range(n_kw):
            # roll requires non-negative shift: shift by (rows - b) == -b cyclically
            rows = acc.shape[1]
            term = (pltpu.roll(acc, shift=rows - b, axis=1) if b else acc) * kw[b]
            out = term if out is None else out + term
        o_ref[0] = out.astype(o_ref.dtype)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((win_h, wp, c), x_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def pallas_blur2d(
    x: jax.Array,
    kernel: jax.Array,
    pad: Tuple[int, int],
    tile_h: int = 64,
) -> jax.Array:
    """Separable fused blur. x: (N, H, W, C); kernel: (k, k) separable;
    output per dim: size + pad0 + pad1 - k + 1 (upfirdn2d semantics).

    Requires C % 128 == 0 (Mosaic HBM slices need the lane dim aligned to the
    128-lane tiling); smaller channel counts take the XLA composite."""
    if x.shape[-1] % 128 != 0:
        raise ValueError(
            f"pallas_blur2d needs channels % 128 == 0, got {x.shape[-1]}")
    col, row = _separate(kernel)
    kh = tuple(float(v) for v in np.asarray(col))
    kw = tuple(float(v) for v in np.asarray(row))
    n_k = len(kh)
    pad0, pad1 = pad

    n, h, w, c = x.shape
    ho = h + pad0 + pad1 - (n_k - 1)
    wo = w + pad0 + pad1 - (n_k - 1)
    # Zero-pad in XLA (fuses with the producer); the kernel does VALID corr.
    xp = jnp.pad(x, ((0, 0), (pad0, pad1), (pad0, pad1), (0, 0)))

    # Size the row tile to a ~1.5 MB scratch budget (VMEM is 16 MB and the
    # pipeline also holds double-buffered output blocks + f32 temporaries).
    row_bytes = (w + pad0 + pad1) * c * max(x.dtype.itemsize, 4)
    tile_h = max(8, min(tile_h, (3 << 19) // row_bytes))
    tile_h = min(tile_h, ho)
    n_tiles = -(-ho // tile_h)
    ho_pad = n_tiles * tile_h
    # Pad rows so every tile's DMA window is in bounds; crop after.
    extra_rows = (ho_pad - ho) + 0
    # Sublane (width) dim of VMEM buffers must be 8-aligned.
    extra_cols = (-xp.shape[2]) % 8
    if extra_rows or extra_cols:
        xp = jnp.pad(xp, ((0, 0), (0, extra_rows), (0, extra_cols), (0, 0)))
    hp, wp = xp.shape[1], xp.shape[2]
    xp = xp.reshape(n * hp, wp, c)  # fold batch into rows (3-D hbm slices)

    body = functools.partial(_blur_kernel_body, kh, kw, tile_h, hp)
    out = pl.pallas_call(
        body,
        grid=(n, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, tile_h, wp, c),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, ho_pad, wp, c), x.dtype),
    )(xp)
    return out[:, :ho, :wo]


def blur2d_best(x, kernel, pad, use_pallas: bool = False):
    """Dispatch between the Pallas fused kernel and the XLA composite.
    XLA is the measured default on v5e (see tools/pallas_blur_bench.py)."""
    if use_pallas and x.shape[-1] % 128 == 0:
        return pallas_blur2d(x, kernel, pad)
    return xla_blur2d(x, kernel, pad)
