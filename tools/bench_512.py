"""512x512 StyleGAN2+ContraD step-time bench (BASELINE.md high-res rows).

Run from /root/repo on the real TPU:  python tools/bench_512.py [--dtype bf16]
Compares the training recipe of train_stylegan2_contraD.py (EXPERIMENTS.md:79-81):
stylegan2_512, contrad, simclr_hq, R1 every d_reg_every steps.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from contrad_tpu.augment import get_augment
from contrad_tpu.models import get_architecture
from contrad_tpu.parallel import get_mesh
from contrad_tpu.training import create_train_state, make_optimizer
from contrad_tpu.training.step import StyleGAN2Trainer


def bench(dtype, batch, steps, trials, do_r1=False):
    IMG = (512, 512, 3)
    g, d = get_architecture("stylegan2_512", IMG, dtype=dtype)
    go = make_optimizer(2e-3, (0.0, 0.99))
    do = make_optimizer(2e-3, (0.0, 0.99))
    tr = StyleGAN2Trainer(
        g, d, mode="contrad", augment_fn=get_augment("simclr_hq"),
        g_optimizer=go, d_optimizer=do, loss_type="nonsat",
        lbd_r1=0.5, d_reg_every=16, mesh=get_mesh())
    st = tr.place_state(create_train_state(
        jax.random.PRNGKey(0), g, d, IMG, go, do, ema=True))
    data = np.random.default_rng(0).integers(
        0, 256, size=(batch,) + IMG, dtype=np.uint8)
    b = tr.place_batch(data)

    # chained-readback protocol (tools/tpu_timing.py): block_until_ready does
    # not synchronize reliably through the axon tunnel
    from tools.tpu_timing import time_step

    dt = time_step(
        lambda s, batch_: tr.train_step(s, batch_, ema_decay=0.99,
                                        do_r1=do_r1),
        st, b, n_short=max(1, steps // 5), n_long=steps, trials=trials)
    print(f"  {dt*1000:7.1f} ms/step  {batch/dt:6.1f} img/s  (do_r1={do_r1})")
    return dt


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    p.add_argument("--batch", default=8, type=int)
    p.add_argument("--steps", default=20, type=int)
    p.add_argument("--trials", default=3, type=int)
    p.add_argument("--r1", action="store_true")
    args = p.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    print(f"devices: {jax.devices()}")
    best = bench(dt, args.batch, args.steps, args.trials, args.r1)
    print(f"BEST {args.dtype} b{args.batch}: {best*1000:.1f} ms/step "
          f"= {args.batch/best:.1f} img/s/chip")
