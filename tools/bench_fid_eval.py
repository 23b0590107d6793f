#!/usr/bin/env python
"""Benchmark the FID eval loop: reference-style batch-50 host loop vs the
mesh-sharded fused sampler+embedder (evaluate/sharded.py).

Reference hot loop being beaten: /root/reference/third_party/fid/fid_score.py:
115-158 (size/50 G forwards, device->host image readback, separate embedder
forward per batch). Run on the TPU:

    python tools/bench_fid_eval.py [--size 10000] [--embed moments]

With --embed inception it needs the FID weights (tools/fetch_assets.py);
moments exercises the identical loop/transfer structure with a cheap
embedder, so the delta isolates dispatch + transfer overhead.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=10000)
    p.add_argument("--embed", default="moments",
                   choices=["moments", "inception"])
    p.add_argument("--batch_per_call", type=int, default=512)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from contrad_tpu.augment import get_augment
    from contrad_tpu.evaluate.fid import compute_stats_from_sampler, get_embed_fn
    from contrad_tpu.evaluate.sharded import make_feature_sampler
    from contrad_tpu.models import get_architecture
    from contrad_tpu.parallel import get_mesh
    from contrad_tpu.training import (
        GANTrainer, create_train_state, make_optimizer)

    IMG = (32, 32, 3)
    generator, discriminator = get_architecture("sndcgan", IMG)
    opt = make_optimizer(2e-4, (0.5, 0.999))
    mesh = get_mesh()
    trainer = GANTrainer(generator, discriminator, mode="std",
                         augment_fn=get_augment("none"), g_optimizer=opt,
                         d_optimizer=opt, loss_type="nonsat", mesh=mesh)
    state = trainer.place_state(create_train_state(
        jax.random.PRNGKey(0), generator, discriminator, IMG, opt, opt))

    # --- reference-style path: batch-50 sampler loop + host embedder
    embed_fn = get_embed_fn(args.embed)
    sampler = lambda n, r: np.asarray(jax.device_get(
        trainer.sample_fn(state, n, False, False, jnp.asarray(r))))
    compute_stats_from_sampler(sampler, embed_fn, 200, 50)  # warm/compile
    t0 = time.perf_counter()
    mu_a, sig_a = compute_stats_from_sampler(sampler, embed_fn, args.size, 50)
    t_host = time.perf_counter() - t0

    # --- sharded fused path
    feature_fn = make_feature_sampler(trainer, embedder=args.embed,
                                      batch_per_call=args.batch_per_call)
    feature_fn(state, args.batch_per_call)  # warm/compile
    t0 = time.perf_counter()
    feats = feature_fn(state, args.size, 0)
    t_sharded = time.perf_counter() - t0
    mu_b, sig_b = feats.mean(0), np.cov(feats, rowvar=False)

    drift = float(np.linalg.norm(mu_a - mu_b))
    print(f"FID@{args.size} feature extraction ({args.embed} embedder, "
          f"{len(mesh.devices.ravel())} chip(s)):")
    print(f"  batch-50 host loop : {t_host:8.2f} s")
    print(f"  sharded fused      : {t_sharded:8.2f} s   "
          f"({t_host / t_sharded:.1f}x)")
    print(f"  stat sanity: |mu_host - mu_sharded| = {drift:.4f} "
          f"(different RNG streams; should be small, not zero)")


if __name__ == "__main__":
    main()
