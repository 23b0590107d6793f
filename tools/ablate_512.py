"""Component ablation for the 512x512 StyleGAN2+ContraD step: where does the
time go? Times G fwd, G fwd+bwd, D fwd, D fwd+bwd, augment, and the full step
using the readback-difference protocol from tools/tpu_timing.py (plain
block_until_ready does not synchronize reliably through the axon tunnel).

Run alone on the TPU: python tools/ablate_512.py [--dtype bf16]
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
from contrad_tpu.training import create_train_state, make_optimizer
from contrad_tpu.training.step import StyleGAN2Trainer
from tools.tpu_timing import time_chained, time_step


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    p.add_argument("--batch", default=8, type=int)
    p.add_argument("--flat_opt", action="store_true",
                   help="Adam over one raveled buffer (optax.flatten)")
    p.add_argument("--mu", default="f32", choices=["f32", "bf16"],
                   help="Adam first-moment storage dtype")
    p.add_argument("--grads", default="f32", choices=["f32", "bf16"],
                   help="gradient dtype entering Adam (dW byte-cut)")
    p.add_argument("--full_only", action="store_true",
                   help="skip component timings, report FULL STEP only")
    p.add_argument("--no_pack", action="store_true",
                   help="disable the packed-image augment path "
                        "(= train_stylegan2.py --no_packed_aug)")
    args = p.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    mu_dtype = jnp.bfloat16 if args.mu == "bf16" else None
    grads_dtype = jnp.bfloat16 if args.grads == "bf16" else None

    IMG = (512, 512, 3)
    B = args.batch
    g, d = get_architecture("stylegan2_512", IMG, dtype=dtype)
    go = make_optimizer(2e-3, (0.0, 0.99), flat=args.flat_opt,
                        mu_dtype=mu_dtype, grads_dtype=grads_dtype)
    do = make_optimizer(2e-3, (0.0, 0.99), flat=args.flat_opt,
                        mu_dtype=mu_dtype, grads_dtype=grads_dtype)
    # packed-image path (as the CLI); --no_pack reverts for A/B
    pack = 1 if args.no_pack else min(g.packed_io, d.packed_io)
    tr = StyleGAN2Trainer(
        g, d, mode="contrad", augment_fn=get_augment("simclr_hq", pack=pack),
        g_optimizer=go, d_optimizer=do, loss_type="nonsat",
        lbd_r1=0.5, d_reg_every=16, mesh=get_mesh(), packed_images=pack)
    st = tr.place_state(create_train_state(
        jax.random.PRNGKey(0), g, d, IMG, go, do, ema=True))
    data = np.random.default_rng(0).integers(0, 256, size=(B,) + IMG,
                                             dtype=np.uint8)
    batch = tr.place_batch(data)
    x = jnp.asarray(data, jnp.float32) / 255.0
    x3 = jnp.concatenate([x, x, x], axis=0)
    z = g.sample_latent(jax.random.PRNGKey(1), B)
    rng = jax.random.PRNGKey(2)

    print(f"devices: {jax.devices()}  dtype={args.dtype}  b{B}"
          f"  flat_opt={args.flat_opt}  mu={args.mu}  grads={args.grads}")

    def report(name, dt):
        print(f"  {name:28s} {dt*1000:8.2f} ms")

    if args.full_only:
        st_r1 = jax.tree.map(jnp.copy, st)
        dt = time_step(lambda s, b: tr.train_step(s, b, ema_decay=0.99,
                                                  do_r1=False), st, batch)
        print(f"  {'FULL STEP':28s} {dt*1000:8.2f} ms   ({B/dt:.1f} img/s)")
        dt_r1 = time_step(lambda s, b: tr.train_step(s, b, ema_decay=0.99,
                                                     do_r1=True), st_r1, batch)
        print(f"  {'FULL STEP +R1':28s} {dt_r1*1000:8.2f} ms")
        return

    # G forward, chained through z-reuse (image -> reduce to fake z? shapes
    # differ); instead chain through a scalar perturbation of z.
    g_fwd = jax.jit(
        lambda zz: tr.g_apply(st.g_params, st.g_state, zz, train=True,
                              update_state=False, rng=rng, style_mix=0.9)[0])

    def g_chain(zz):
        img = g_fwd(zz)
        return zz + jnp.mean(img).astype(zz.dtype) * 1e-9

    report("G forward", time_chained(g_chain, z))

    g_bwd = jax.jit(jax.grad(
        lambda zz: jnp.sum(
            tr.g_apply(st.g_params, st.g_state, zz, train=True,
                       update_state=False, rng=rng,
                       style_mix=0.9)[0].astype(jnp.float32))))

    def gb_chain(zz):
        return zz + g_bwd(zz) * 1e-9

    report("G fwd + bwd-through-G", time_chained(gb_chain, z))

    d_fwd = jax.jit(
        lambda xx: tr.d_apply(st.d_params, st.d_state, xx, train=True,
                              update_state=False)[0][0])

    def d_chain(xx):
        return xx + jnp.mean(d_fwd(xx)).astype(xx.dtype) * 1e-9

    report("D forward (B)", time_chained(d_chain, x))
    report("D forward (3B contrad)", time_chained(d_chain, x3))

    d_bwd = jax.jit(jax.grad(
        lambda xx: jnp.sum(tr.d_apply(st.d_params, st.d_state, xx, train=True,
                                      update_state=False)[0][0])))

    def db_chain(xx):
        return xx + d_bwd(xx) * 1e-9

    report("D fwd+bwd-to-input (3B)", time_chained(db_chain, x3))

    aug = jax.jit(lambda r, xx: tr.ctx.augment_fn(r, xx))

    def aug_chain(xx):
        return 0.5 * xx + 0.5 * aug(rng, xx)

    report("augment simclr_hq (3B)", time_chained(aug_chain, x3))

    # step_fn donates the state buffers — keep an undonated copy for the
    # second timing.
    st_r1 = jax.tree.map(jnp.copy, st)
    dt = time_step(lambda s, b: tr.train_step(s, b, ema_decay=0.99,
                                              do_r1=False), st, batch)
    print(f"  {'FULL STEP':28s} {dt*1000:8.2f} ms   ({B/dt:.1f} img/s)")
    dt_r1 = time_step(lambda s, b: tr.train_step(s, b, ema_decay=0.99,
                                                 do_r1=True), st_r1, batch)
    print(f"  {'FULL STEP +R1':28s} {dt_r1*1000:8.2f} ms")


if __name__ == "__main__":
    main()
