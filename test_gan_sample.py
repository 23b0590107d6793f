#!/usr/bin/env python
"""Random sampling CLI (reference: ``test_gan_sample.py``): load a trained G
from a logdir and write ``n_samples`` PNGs into ``samples_<rand>_n<N>/``."""

from __future__ import annotations

import argparse
import math
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Random sampling from a trained G")
    p.add_argument("logdir", type=str, help="Run logdir (contains ckpt/ + config)")
    p.add_argument("architecture", type=str)
    p.add_argument("--n_samples", default=10000, type=int)
    p.add_argument("--batch_size", default=500, type=int)
    p.add_argument("--ckpt", default="latest", type=str, help="latest|best|step_N")
    p.add_argument("--use_ema", action="store_true",
                   help="Sample from the EMA generator (StyleGAN2 runs)")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--platform", default="auto", choices=["auto", "cpu"])
    return p.parse_args()


def main():
    P = parse_args()
    import imageio
    import jax

    if P.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from contrad_tpu.utils import enable_compile_cache

    enable_compile_cache()  # dedup programs across runs

    from contrad_tpu.evaluate import to_uint8
    from contrad_tpu.training.step import make_g_apply
    from contrad_tpu.utils.run_loading import load_run

    _, generator, _, state, image_size = load_run(P.logdir, P.architecture,
                                                  ckpt=P.ckpt)
    g_apply = make_g_apply(generator)

    # Batch-sharded sampling over the data mesh (params replicated): each
    # chip generates batch/n_dev samples. The reference samples on one GPU.
    from functools import partial

    from contrad_tpu.parallel import get_mesh
    from contrad_tpu.parallel.mesh import (batch_sharding, replicate,
                                        round_up_batch)

    mesh = get_mesh()
    P.batch_size = round_up_batch(P.batch_size, mesh)
    b_shard = batch_sharding(mesh)
    params, g_state = replicate(
        (state.g_ema_params if P.use_ema else state.g_params,
         state.g_ema_state if P.use_ema else state.g_state), mesh)

    @partial(jax.jit, out_shardings=b_shard)
    def sample(z, noise_rng):
        out, _ = g_apply(params, g_state, z, train=False, update_state=False,
                         rng=noise_rng)
        return out

    subdir = os.path.join(P.logdir,
                          f"samples_{np.random.randint(10000)}_n{P.n_samples}")
    os.makedirs(subdir, exist_ok=True)
    print(f"Sampling in {subdir}")

    rng = jax.random.PRNGKey(P.seed)
    n_batches = math.ceil(P.n_samples / P.batch_size)
    index = 0
    for i in range(n_batches):
        rng, z_rng, noise_rng = jax.random.split(rng, 3)
        z = jax.device_put(
            generator.sample_latent(z_rng, P.batch_size), b_shard)
        images = to_uint8(sample(z, noise_rng))
        for j in range(len(images)):
            if index >= P.n_samples:
                break
            imageio.imsave(os.path.join(subdir, f"{index}.png"), images[j])
            index += 1
    print(f"Wrote {index} samples.")


if __name__ == "__main__":
    main()
