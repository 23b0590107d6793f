"""Microbench: current shallow-channel 512-level convs vs space-to-depth
packed equivalents (same logical math, channels x4 / grid /2), fwd and
weight-grad, honest chained timing. Decides whether to build the packed trunk.

Run alone on the TPU: python tools/packed_micro.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_timing import time_chained


def conv(x, w, stride=1, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def bench_fwd(name, xshape, wshape, stride=1, flops=None):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=xshape) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=wshape) * 0.05, jnp.bfloat16)
    f = jax.jit(lambda a: conv(a, w, stride))

    def chain(a):
        y = f(a)
        return a + jnp.mean(y).astype(a.dtype) * 1e-9

    dt = time_chained(chain, x)
    k, _, ci, co = wshape
    h = xshape[1] // stride
    fl = flops or 2 * xshape[0] * h * h * k * k * ci * co
    print(f"  fwd  {name:42s} {dt*1e3:8.3f} ms  {fl/dt/1e12:6.1f} TF/s")
    return dt


def bench_dw(name, xshape, wshape, stride=1):
    """Weight-grad: d/dw sum(conv(x, w)) — the poorly-shaped op in the trace."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=xshape) * 0.1, jnp.bfloat16)
    w0 = jnp.asarray(rng.normal(size=wshape) * 0.05, jnp.bfloat16)
    g = jax.jit(jax.grad(lambda w, a: jnp.sum(conv(a, w, stride)
                                              .astype(jnp.float32)), argnums=0))

    def chain(w, a):
        dw = g(w, a)
        return w + dw * 1e-9

    dt = time_chained(chain, w0, x)
    k, _, ci, co = wshape
    h = xshape[1] // stride
    fl = 2 * xshape[0] * h * h * k * k * ci * co
    print(f"  dW   {name:42s} {dt*1e3:8.3f} ms  {fl/dt/1e12:6.1f} TF/s")
    return dt


def main():
    print(f"devices: {jax.devices()}  bf16")
    B = 24
    print("— b512.conv1: 3x3 s1, same logical op —")
    a = bench_fwd("current  (24,512,512,32) w3x3 32->32",
                  (B, 512, 512, 32), (3, 3, 32, 32))
    b = bench_fwd("packed   (24,256,256,128) w3x3 128->128",
                  (B, 256, 256, 128), (3, 3, 128, 128))
    print(f"    packed/current fwd: {b/a:.2f}x time (4x FLOPs)")
    a = bench_dw("current  (24,512,512,32) w3x3 32->32",
                 (B, 512, 512, 32), (3, 3, 32, 32))
    b = bench_dw("packed   (24,256,256,128) w3x3 128->128",
                 (B, 256, 256, 128), (3, 3, 128, 128))
    print(f"    packed/current dW: {b/a:.2f}x time (4x FLOPs)")

    print("— b512.conv2: blur-fused 6x6 s2 32->64 —")
    a = bench_fwd("current  (24,512,512,32) w6x6s2 32->64",
                  (B, 512, 512, 32), (6, 6, 32, 64), stride=2)
    b = bench_fwd("packed   (24,256,256,128) w4x4s2 128->256",
                  (B, 256, 256, 128), (4, 4, 128, 256), stride=2)
    print(f"    packed/current fwd: {b/a:.2f}x time (1.8x FLOPs)")

    print("— b256.conv1: 3x3 s1 64->64 —")
    a = bench_fwd("current  (24,256,256,64) w3x3 64->64",
                  (B, 256, 256, 64), (3, 3, 64, 64))
    b = bench_fwd("packed   (24,128,128,256) w3x3 256->256",
                  (B, 128, 128, 256), (3, 3, 256, 256))
    print(f"    packed/current fwd: {b/a:.2f}x time (4x FLOPs)")
    a = bench_dw("current  (24,256,256,64) w3x3 64->64",
                 (B, 256, 256, 64), (3, 3, 64, 64))
    b = bench_dw("packed   (24,128,128,256) w3x3 256->256",
                 (B, 128, 128, 256), (3, 3, 256, 256))
    print(f"    packed/current dW: {b/a:.2f}x time (4x FLOPs)")

    print("— FromRGB 1x1 —")
    a = bench_fwd("current  (24,512,512,3) w1x1 3->32",
                  (B, 512, 512, 3), (1, 1, 3, 32))
    b = bench_fwd("packed   (24,256,256,12) w1x1 12->128",
                  (B, 256, 256, 12), (1, 1, 12, 128))
    print(f"    packed/current fwd: {b/a:.2f}x time (4x FLOPs)")


if __name__ == "__main__":
    main()
