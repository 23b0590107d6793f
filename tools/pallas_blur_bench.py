#!/usr/bin/env python
"""Benchmark: Pallas fused separable blur vs the XLA depthwise-conv composite.

Run on the target chip to decide the ``blur2d_best`` dispatch.

Measured on TPU v5e (2026-08-16):
    (8,128,128,128):  xla 0.019 ms | pallas 0.021 ms | ratio 0.92x
    (8,64,64,256):    xla 0.877 ms | pallas 0.954 ms | ratio 0.92x
    (24,32,32,512):   xla 0.810 ms | pallas 1.073 ms | ratio 0.75x
    (64,16,16,512):   xla 0.761 ms | pallas 0.829 ms | ratio 0.92x

=> the XLA composite (one lax.conv_general_dilated per rank-1 pass) wins at
every StyleGAN2 layer shape — XLA already pipelines the two depthwise passes,
and the hand-written kernel pays DMA orchestration without using the MXU.
``blur2d_best`` therefore defaults to XLA; the Pallas kernel stays as the
measured alternative (and the scaffold for future fused blur+bias+act work).
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from contrad_tpu.ops.pallas_blur import pallas_blur2d
from contrad_tpu.ops.upfirdn2d import blur2d, make_kernel


def bench(fn, x, k, pad, n=50):
    f = jax.jit(lambda a: fn(a, k, pad))
    y = f(x)
    jax.block_until_ready(y)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            y = f(x)
        jax.block_until_ready(y)
        best = min(best, (time.perf_counter() - t0) / n)
    return best, y


def main():
    k = make_kernel([1, 3, 3, 1])
    # C must be a multiple of 128 for the Pallas path (Mosaic lane tiling);
    # these are the deep StyleGAN2 layer shapes.
    for (b, s, c) in [(8, 128, 128), (8, 64, 256), (24, 32, 512), (64, 16, 512)]:
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(b, s, s, c)).astype(np.float32))
        pad = (2, 2)
        t_xla, y_xla = bench(blur2d, x, k, pad)
        t_pl, y_pl = bench(pallas_blur2d, x, k, pad)
        err = float(jnp.max(jnp.abs(y_xla - y_pl)))
        print(f"({b},{s},{s},{c}): xla {t_xla*1e3:7.3f} ms | pallas "
              f"{t_pl*1e3:7.3f} ms | ratio {t_xla/t_pl:5.2f}x | max_err {err:.2e}")


if __name__ == "__main__":
    main()
