"""Microbench the individual conv shapes of the 512 StyleGAN2 D (b24 = the
contrad 3B batch) against roofline, to find which op underperforms."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def t(name, fn, *args, steps=30, flops=0, bytes_=0):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / steps)
    pk = flops / best / 1e12 if flops else 0
    bw = bytes_ / best / 1e9 if bytes_ else 0
    print(f"  {name:36s} {best*1000:8.3f} ms  {pk:6.1f} TF/s  {bw:6.0f} GB/s")
    return best


def conv(x, w, stride=1, pad="SAME", lhs_dil=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        lhs_dilation=(lhs_dil, lhs_dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    B = 24
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    shapes = [
        # (H, Cin, Cout, k, stride, tag)
        (512, 3, 32, 1, 1, "from_rgb 1x1"),
        (512, 32, 32, 3, 1, "b512 conv1 3x3"),
        (512, 32, 64, 6, 2, "b512 conv2 6x6s2 (fused)"),
        (512, 32, 64, 4, 2, "b512 skip 4x4s2 (fused)"),
        (256, 64, 64, 3, 1, "b256 conv1"),
        (256, 64, 128, 6, 2, "b256 conv2 (fused)"),
        (128, 128, 128, 3, 1, "b128 conv1"),
        (128, 128, 256, 6, 2, "b128 conv2 (fused)"),
        (64, 256, 256, 3, 1, "b64 conv1"),
        (64, 256, 512, 6, 2, "b64 conv2 (fused)"),
        (32, 512, 512, 3, 1, "b32 conv1"),
        (32, 512, 512, 6, 2, "b32 conv2 (fused)"),
    ]
    print(f"b{B} {dt.__name__}")
    total = 0.0
    for h, ci, co, k, s, tag in shapes:
        x = jnp.asarray(rng.normal(size=(B, h, h, ci)), dt)
        w = jnp.asarray(rng.normal(size=(k, k, ci, co)) * 0.05, dt)
        ho = h // s
        flops = 2 * B * ho * ho * k * k * ci * co
        bytes_ = 2 * B * (h * h * ci + ho * ho * co)
        f = jax.jit(lambda a, b, s=s: conv(a, b, s))
        total += t(tag, f, x, w, flops=flops, bytes_=bytes_)
    print(f"  {'SUM fwd convs':36s} {total*1000:8.3f} ms")

    # G-side: lhs-dilated fused upsample conv at top resolution
    x = jnp.asarray(rng.normal(size=(B // 3, 256, 256, 64)), dt)
    w = jnp.asarray(rng.normal(size=(6, 6, 64, 32)) * 0.05, dt)
    f = jax.jit(lambda a, b: conv(a, b, 1, ((3, 3), (3, 3)), lhs_dil=2))
    flops = 2 * (B // 3) * 512 * 512 * 6 * 6 * 64 * 32 / 4  # zeros skipped? no
    t("G up 6x6 lhsdil2 64->32 @256", f, x, w, flops=flops,
      bytes_=2 * (B // 3) * (256 * 256 * 64 + 512 * 512 * 32))

    # depthwise blur for comparison (the thing fusion removed)
    x = jnp.asarray(rng.normal(size=(B, 512, 512, 32)), dt)
    wdw = jnp.asarray(rng.normal(size=(4, 4, 1, 32)) * 0.1, dt)
    f = jax.jit(lambda a, b: jax.lax.conv_general_dilated(
        a, b, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=32))
    t("depthwise blur 4x4 @512x32", f, x, wdw,
      bytes_=2 * B * 512 * 512 * 32 * 2)


if __name__ == "__main__":
    main()
