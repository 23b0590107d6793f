#!/usr/bin/env python
"""Class-conditional Discriminator-Driven Langevin Sampling
(reference: ``test_gan_sample_cddls.py``).

Energy E(z, z2) = -(D(G(z) + eps*z2) + lbd * classifier_logit_y) +
0.5*||z2||^2; n_steps Langevin updates on (z, z2) with step eps and noise
sigma_n*sqrt(eps); z clamped to [-1, 1] (SNDCGAN latent support). The whole
Langevin chain runs as ONE jitted ``lax.fori_loop`` program, batch-sharded
over the data mesh — params replicated, each chain independent, so every
chip integrates batch/n_dev chains with zero collectives (the reference
dispatches 1000 separate autograd graphs on one GPU).

The classifier head comes from a linear-eval probe (``lin_eval_*.npz`` from
test_lineval.py).
"""

from __future__ import annotations

import argparse
import math
import os
from functools import partial

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="cDDLS sampling")
    p.add_argument("logdir", type=str, help="Run logdir with G/D checkpoints")
    p.add_argument("linear_path", type=str,
                   help="Path to the linear-eval probe (lin_eval_*.npz)")
    p.add_argument("architecture", type=str)
    p.add_argument("--lbd", default=1.0, type=float)
    p.add_argument("--n_steps", default=1000, type=int)
    p.add_argument("--eps", default=0.01, type=float)
    p.add_argument("--sigma_n", default=0.1, type=float)
    p.add_argument("--n_samples", default=10000, type=int)
    p.add_argument("--n_classes", default=10, type=int)
    p.add_argument("--batch_size", default=500, type=int)
    p.add_argument("--ckpt", default="best", type=str)
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
    import jax.numpy as jnp

    from contrad_tpu.evaluate import to_uint8
    from contrad_tpu.parallel import get_mesh
    from contrad_tpu.parallel.mesh import (batch_sharding, replicate,
                                        round_up_batch)
    from contrad_tpu.training.step import make_d_apply, make_g_apply
    from contrad_tpu.utils.run_loading import load_run

    _, generator, discriminator, state, _ = load_run(
        P.logdir, P.architecture, ckpt=P.ckpt)
    probe = np.load(P.linear_path)

    mesh = get_mesh()
    P.batch_size = round_up_batch(P.batch_size, mesh)
    b_shard = batch_sharding(mesh)

    g_apply = make_g_apply(generator)
    d_apply = make_d_apply(discriminator)
    # Params/probe replicated over the mesh; the Langevin chains are
    # independent per sample, so the whole fori_loop shards along the batch.
    (g_params, g_state, d_params, d_state, w, b) = replicate(
        (state.g_params, state.g_state, state.d_params, state.d_state,
         jnp.asarray(probe["w"]), jnp.asarray(probe["b"])), mesh)

    def gen(z, rng):
        out, _ = g_apply(g_params, g_state, z, train=False, update_state=False,
                         rng=rng)
        return out

    def energy(z, z2, y, rng):
        images = gen(z, rng) + P.eps * z2
        (d_out, aux), _ = d_apply(d_params, d_state, images, train=False)
        logits = aux["penultimate"] @ w + b
        l_out = jnp.take(logits, y, axis=1)[:, None]  # y is traced under jit
        reg = 0.5 * jnp.sum(z2.reshape(z2.shape[0], -1) ** 2, axis=1,
                            keepdims=True)
        return jnp.sum(-(d_out + P.lbd * l_out) + reg)

    @partial(jax.jit, out_shardings=b_shard)
    def sample_class(z, rng, y):
        rng, z2_rng, noise_rng = jax.random.split(rng, 3)
        z2 = jax.random.normal(z2_rng, gen(z, noise_rng).shape)

        def body(i, carry):
            z, z2, rng = carry
            rng, r_g, r_nz, r_nz2 = jax.random.split(rng, 4)
            g_z, g_z2 = jax.grad(energy, argnums=(0, 1))(z, z2, y, r_g)
            z = z - 0.5 * P.eps * g_z + P.sigma_n * math.sqrt(P.eps) * \
                jax.random.normal(r_nz, z.shape)
            z2 = z2 - 0.5 * P.eps * g_z2 + P.sigma_n * math.sqrt(P.eps) * \
                jax.random.normal(r_nz2, z2.shape)
            z = jnp.clip(z, -1.0, 1.0)
            return z, z2, rng

        z, z2, rng = jax.lax.fori_loop(0, P.n_steps, body, (z, z2, rng))
        rng, r_final = jax.random.split(rng)
        return jnp.clip(gen(z, r_final) + P.eps * z2, 0.0, 1.0)

    subdir = os.path.join(P.logdir, f"samples_cDDLS_{np.random.randint(10000)}")
    os.makedirs(subdir, exist_ok=True)
    print(f"Sampling in {subdir}")

    rng = jax.random.PRNGKey(P.seed)
    class_samples = P.n_samples // P.n_classes
    n_batches = math.ceil(class_samples / P.batch_size)
    for y in range(P.n_classes):
        class_dir = os.path.join(subdir, str(y))
        os.makedirs(class_dir, exist_ok=True)
        for i in range(n_batches):
            rng, z_rng, sub = jax.random.split(rng, 3)
            z = jax.device_put(
                generator.sample_latent(z_rng, P.batch_size), b_shard)
            samples = to_uint8(sample_class(z, sub, y))
            offset = y * class_samples + i * P.batch_size
            for j in range(len(samples)):
                index = offset + j
                if index >= (y + 1) * class_samples or index >= P.n_samples:
                    break
                imageio.imsave(os.path.join(class_dir, f"{index}.png"),
                               samples[j])
    print("Done.")


if __name__ == "__main__":
    main()
