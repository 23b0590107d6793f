"""Profile the 512x512 StyleGAN2+ContraD step and print the op-level rollup.

Run alone on the TPU:  python tools/trace_512.py [--dtype bf16] [--r1] [--top 40]
Captures a jax.profiler trace of a few steady-state steps and aggregates
device-side op durations via tools/parse_xplane.py.
"""

import argparse
import glob
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
from contrad_tpu.training import create_train_state, make_optimizer
from contrad_tpu.training.step import StyleGAN2Trainer
from tools.parse_xplane import aggregate


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    p.add_argument("--batch", default=8, type=int)
    p.add_argument("--r1", action="store_true")
    p.add_argument("--steps", default=5, type=int)
    p.add_argument("--top", default=40, type=int)
    p.add_argument("--out", default="/tmp/trace512")
    args = p.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    IMG = (512, 512, 3)
    g, d = get_architecture("stylegan2_512", IMG, dtype=dtype)
    go = make_optimizer(2e-3, (0.0, 0.99))
    do = make_optimizer(2e-3, (0.0, 0.99))
    pack = min(g.packed_io, d.packed_io)  # packed-image path (as the CLI)
    tr = StyleGAN2Trainer(
        g, d, mode="contrad", augment_fn=get_augment("simclr_hq", pack=pack),
        g_optimizer=go, d_optimizer=do, loss_type="nonsat",
        lbd_r1=0.5, d_reg_every=16, mesh=get_mesh(), packed_images=pack)
    st = tr.place_state(create_train_state(
        jax.random.PRNGKey(0), g, d, IMG, go, do, ema=True))
    data = np.random.default_rng(0).integers(
        0, 256, size=(args.batch,) + IMG, dtype=np.uint8)
    b = tr.place_batch(data)

    step = lambda s: tr.train_step(s, b, ema_decay=0.99, do_r1=args.r1)
    for _ in range(3):  # compile + warm
        st, m = step(st)
    print("warm:", float(jax.device_get(m["G_loss"])))

    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            st, m = step(st)
        print("traced:", float(jax.device_get(m["G_loss"])))

    paths = sorted(glob.glob(os.path.join(args.out, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane.pb captured under", args.out)
        return
    print("trace:", paths[-1])
    aggregate(paths[-1], args.top)


if __name__ == "__main__":
    main()
