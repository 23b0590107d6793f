"""32^2 flagship byte-cut A/B: optimizer-moment and dW gradient dtypes.

The round-3 roofline (BASELINE.md) showed the 32^2 flagship step is
HBM-BANDWIDTH-bound at 82% of its bytes floor; with bf16 activations the
remaining f32 bytes are params / Adam moments / dW traffic. This measures the
two supported byte-cut levers on the real chip (chained-readback protocol):

  * ``mu_dtype=bf16``   — Adam first moment stored bf16 (optax upcasts math)
  * ``grads_dtype=bf16``— gradients cast bf16 entering Adam (XLA sinks the
                          convert into the dW conv fusions' outputs)

against the f32 primary and the bf16-activation production config.
Reference being beaten: the flagship recipe ``EXPERIMENTS.md:15`` /
``train_gan.py:124-227`` on a V100 (~500 img/s est., bench.py derivation).

Usage: python tools/ablate_32.py [--quick]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contrad_tpu.utils import enable_compile_cache

enable_compile_cache()  # dedup the big-step compiles across profiling runs

import jax
import jax.numpy as jnp
import numpy as np

from contrad_tpu.augment import get_augment
from contrad_tpu.models import get_architecture
from contrad_tpu.parallel import get_mesh
from contrad_tpu.training import (
    GANTrainer, create_train_state, make_optimizer)
from tools.tpu_timing import time_step

IMG = (32, 32, 3)
BATCH = 512


def measure(dtype, mu_dtype, grads_dtype, nu_dtype=None, quick=False):
    g, d = get_architecture("sndcgan", IMG, dtype=dtype)
    go = make_optimizer(2e-4, (0.5, 0.999), mu_dtype=mu_dtype,
                        nu_dtype=nu_dtype, grads_dtype=grads_dtype)
    do = make_optimizer(2e-4, (0.5, 0.999), mu_dtype=mu_dtype,
                        nu_dtype=nu_dtype, grads_dtype=grads_dtype)
    tr = GANTrainer(g, d, mode="contrad", augment_fn=get_augment("simclr"),
                    g_optimizer=go, d_optimizer=do, loss_type="nonsat",
                    mesh=get_mesh())
    st = tr.place_state(create_train_state(
        jax.random.PRNGKey(0), g, d, IMG, go, do))
    data = np.random.default_rng(0).integers(
        0, 256, size=(BATCH,) + IMG, dtype=np.uint8)
    b = tr.place_batch(data)
    kw = dict(n_short=3, n_long=10, trials=2) if quick else \
        dict(n_short=5, n_long=25, trials=3)
    sec = time_step(tr.train_step, st, b, **kw)
    return sec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    variants = [
        ("f32 (bench primary)", jnp.float32, None, None, None),
        ("bf16 act (production)", jnp.bfloat16, None, None, None),
        ("bf16 + mu bf16", jnp.bfloat16, jnp.bfloat16, None, None),
        ("bf16 + dW bf16", jnp.bfloat16, None, jnp.bfloat16, None),
        ("bf16 + mu + dW bf16", jnp.bfloat16, jnp.bfloat16, jnp.bfloat16,
         None),
        ("bf16 + nu bf16", jnp.bfloat16, None, None, jnp.bfloat16),
        ("bf16 + mu + nu + dW bf16", jnp.bfloat16, jnp.bfloat16,
         jnp.bfloat16, jnp.bfloat16),
    ]
    print(f"devices: {jax.devices()}  batch={BATCH}  img={IMG}")
    for name, dt, mu, gr, nu in variants:
        sec = measure(dt, mu, gr, nu_dtype=nu, quick=args.quick)
        print(f"{name:24s} {sec * 1e3:7.2f} ms/step  "
              f"{BATCH / sec:8.0f} img/s/chip")


if __name__ == "__main__":
    main()
