"""Component ablation for the 512x512 StyleGAN2+ContraD step: where does the
time go? Times G fwd, G fwd+bwd, D fwd, D fwd+bwd, augment, and the full step.

Run alone on the TPU (no concurrent CPU-heavy jobs — they skew the tunnel
timings): python tools/ablate_512.py [--dtype bf16]
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


def timeit(name, fn, *args, steps=20, trials=2):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / steps)
    print(f"  {name:28s} {best*1000:8.2f} ms")
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    p.add_argument("--batch", default=8, type=int)
    args = p.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    IMG = (512, 512, 3)
    B = args.batch
    g, d = get_architecture("stylegan2_512", IMG, dtype=dtype)
    go = make_optimizer(2e-3, (0.0, 0.99))
    do = make_optimizer(2e-3, (0.0, 0.99))
    tr = StyleGAN2Trainer(
        g, d, mode="contrad", augment_fn=get_augment("simclr_hq"),
        g_optimizer=go, d_optimizer=do, loss_type="nonsat",
        lbd_r1=0.5, d_reg_every=16, mesh=get_mesh())
    st = tr.place_state(create_train_state(
        jax.random.PRNGKey(0), g, d, IMG, go, do, ema=True))
    data = np.random.default_rng(0).integers(0, 256, size=(B,) + IMG,
                                             dtype=np.uint8)
    batch = tr.place_batch(data)
    x = jnp.asarray(data, jnp.float32) / 255.0
    z = g.sample_latent(jax.random.PRNGKey(1), B)
    rng = jax.random.PRNGKey(2)

    print(f"devices: {jax.devices()}  dtype={args.dtype}  b{B}")

    g_fwd = jax.jit(lambda p, s, z: tr.g_apply(p, s, z, train=True,
                                               update_state=False,
                                               rng=rng, style_mix=0.9)[0])
    timeit("G forward", g_fwd, st.g_params, st.g_state, z)

    def g_loss(p, s, z):
        img = tr.g_apply(p, s, z, train=True, update_state=False,
                         rng=rng, style_mix=0.9)[0]
        return jnp.sum(img.astype(jnp.float32))

    g_bwd = jax.jit(jax.grad(g_loss))
    timeit("G fwd+bwd", g_bwd, st.g_params, st.g_state, z)

    d_fwd = jax.jit(lambda p, s, x: tr.d_apply(p, s, x, train=True,
                                               update_state=False)[0][0])
    timeit("D forward (B)", d_fwd, st.d_params, st.d_state, x)
    x3 = jnp.concatenate([x, x, x], axis=0)
    timeit("D forward (3B contrad)", d_fwd, st.d_params, st.d_state, x3)

    def d_loss(p, s, xx):
        return jnp.sum(tr.d_apply(p, s, xx, train=True,
                                  update_state=False)[0][0])

    d_bwd = jax.jit(jax.grad(d_loss))
    timeit("D fwd+bwd (3B)", d_bwd, st.d_params, st.d_state, x3)

    aug = jax.jit(lambda r, xx: tr.ctx.augment_fn(r, xx))
    timeit("augment simclr_hq (3B)", aug, rng, x3)

    step = lambda s, b: tr.train_step(s, b, ema_decay=0.99, do_r1=False)
    st2, m = step(st, batch)
    jax.block_until_ready(st2.g_params)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(15):
            st2, m = step(st2, batch)
        jax.block_until_ready(st2.g_params)
        best = min(best, (time.perf_counter() - t0) / 15)
    print(f"  {'FULL STEP':28s} {best*1000:8.2f} ms   ({B/best:.1f} img/s)")


if __name__ == "__main__":
    main()
