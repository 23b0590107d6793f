"""Profile the flagship SNDCGAN+ContraD 32x32 b512 step (bench.py recipe) and
print the op-level rollup. Run alone on the TPU: python tools/trace_32.py"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contrad_tpu.utils import enable_compile_cache

enable_compile_cache()  # dedup the big-step compiles across profiling runs

import jax
import numpy as np

from contrad_tpu.augment import get_augment
from contrad_tpu.models import get_architecture
from contrad_tpu.parallel import get_mesh
from contrad_tpu.training import GANTrainer, create_train_state, make_optimizer
from tools.parse_xplane import aggregate
from tools.tpu_timing import time_step


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", default=5, type=int)
    p.add_argument("--top", default=40, type=int)
    p.add_argument("--out", default="/tmp/trace32")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    args = p.parse_args()

    IMG = (32, 32, 3)
    B = 512
    import jax.numpy as jnp
    g, d = get_architecture("sndcgan", IMG, dtype=getattr(jnp, args.dtype))
    go = make_optimizer(2e-4, (0.5, 0.999), warmup=3000, use_warmup=True)
    do = make_optimizer(2e-4, (0.5, 0.999), warmup=3000, use_warmup=True)
    tr = GANTrainer(g, d, mode="contrad", augment_fn=get_augment("simclr"),
                    g_optimizer=go, d_optimizer=do, loss_type="nonsat",
                    temp=0.1, lbd_a=1.0, mesh=get_mesh())
    st = tr.place_state(create_train_state(
        jax.random.PRNGKey(0), g, d, IMG, go, do))
    data = np.random.default_rng(0).integers(0, 256, size=(B,) + IMG,
                                             dtype=np.uint8)
    b = tr.place_batch(data)

    for _ in range(3):
        st, m = tr.train_step(st, b)
    print("warm G_loss:", float(jax.device_get(m["G_loss"])))

    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            st, m = tr.train_step(st, b)
        print("traced:", float(jax.device_get(m["G_loss"])))

    # last: time_step donates the state buffers
    dt = time_step(tr.train_step, st, b)
    print(f"honest step time: {dt*1000:.2f} ms  ({B/dt:.0f} img/s)")

    paths = sorted(glob.glob(os.path.join(args.out, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane.pb captured under", args.out)
        return
    print("trace:", paths[-1])
    aggregate(paths[-1], args.top)


if __name__ == "__main__":
    main()
