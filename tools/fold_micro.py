"""Micro-bench: folding pack/unpack image reshapes into the boundary convs.

The round-3 512^2 trace shows ~10.8 ms/step of pure layout copies, several of
which are the space_to_depth / depth_to_space reshapes at the image<->packed
boundaries (the augment chain runs on the real (B,512,512,3) pixel grid; the
packed G top / D stem run on (B,256,256,4C) tensors).  Candidate fix — fold
the reshape into the boundary conv itself:

  * D stem:  FromRGB(space_to_depth(x,2))  ==  conv2x2_stride2(x, w')
    (pack_conv_kernel with f_in=1, f_out=2: the image is read in place,
    no packed copy of the 3N batch is materialized)
  * G top :  depth_to_space(ToRGB_packed(x))  ==  lhs-dilated conv (l=2)
    producing the fine grid directly (the classic sub-pixel identity, run
    in reverse)

This script measures whether XLA actually saves the copy, fwd and fwd+bwd,
on the real chip. Run: python tools/fold_micro.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from contrad_tpu.ops.packed import pack_conv_kernel, space_to_depth
from tools.tpu_timing import time_chained

B, H, C_IN, C_OUT = 24, 512, 3, 32
DT = jnp.bfloat16


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, H, C_IN)), DT)
    w = jnp.asarray(rng.normal(size=(1, 1, C_IN, C_OUT)), DT) * 0.1

    # current: explicit space_to_depth, then the f_in=2,f_out=2 packed 1x1
    wp22, S22, P22 = pack_conv_kernel(w, 2, 2, 1, (0, 0))

    def current(carry):
        xp = space_to_depth(carry, 2)
        y = jax.lax.conv_general_dilated(
            xp, wp22, (S22, S22), (P22, P22),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # feed a same-shaped carry back (keeps the chain honest)
        return carry + jnp.mean(y).astype(DT)

    # folded: f_in=1 -> f_out=2 packed conv reads the image in place
    wp12, S12, P12 = pack_conv_kernel(w, 1, 2, 1, (0, 0))

    def folded(carry):
        y = jax.lax.conv_general_dilated(
            carry, wp12, (S12, S12), (P12, P12),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return carry + jnp.mean(y).astype(DT)

    # numerical equality first
    xp = space_to_depth(x, 2)
    y_cur = jax.lax.conv_general_dilated(
        xp, wp22, (S22, S22), (P22, P22),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_fold = jax.lax.conv_general_dilated(
        x, wp12, (S12, S12), (P12, P12),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y_cur, np.float32),
                               np.asarray(y_fold, np.float32),
                               rtol=5e-2, atol=5e-2)
    print("parity ok", y_cur.shape, y_fold.shape)

    for name, fn in (("stem  current", current), ("stem  folded ", folded)):
        f = jax.jit(fn)
        dt = time_chained(f, x, n_short=10, n_long=50, trials=3)
        print(f"{name}: {dt*1e3:7.3f} ms")

    # fwd+bwd (grads wrt input, as in the D stem during training)
    for name, fn in (("stem+bwd current", current), ("stem+bwd folded ", folded)):
        def loss(z, _fn=fn):
            return jnp.sum(_fn(z).astype(jnp.float32))

        g = jax.jit(jax.grad(loss))
        dt = time_chained(lambda c: c + 0.0 * g(c).astype(DT), x,
                          n_short=5, n_long=25, trials=3)
        print(f"{name}: {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
