"""Discriminator penalties (reference: ``penalty.py``).

``compute_penalty(mode, ...)`` dispatches:
  * ``none`` — zero (reference ``penalty.py:12``)
  * ``gp``   — WGAN-GP interpolated gradient penalty (``penalty.py:16-42``):
               grad-of-D w.r.t. the interpolated input, a nested ``jax.grad``
               inside the parameter grad (grad-of-grad compiles fine on TPU).
  * ``cr``   — consistency: lbd * E[(D(x) - D(aug(x)))^2] (``penalty.py:45-47``)
  * ``bcr``  — balanced CR on reals and fakes with lbd/lbd2 (``penalty.py:50-58``)

Penalty-internal D calls do not persist spectral-norm/BN state updates (the
main D pass owns the one-power-iteration-per-step semantics).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

DApply = Callable  # (params, state, x, *, train, sg_linear, update_state) -> ((d, aux), new_state)


def gradient_penalty(d_apply, d_params, d_state, images, gen_images, rng, lbd,
                     y=None):
    n = images.shape[0]
    alpha = jax.random.uniform(rng, (n,) + (1,) * (images.ndim - 1))
    interp = alpha * jax.lax.stop_gradient(images) + (1.0 - alpha) * jax.lax.stop_gradient(
        gen_images
    )

    def d_sum(x):
        # conditional: score the interpolation under the REAL sample's label
        # (the usual cWGAN-GP convention)
        (d, _), _ = d_apply(d_params, d_state, x, y=y, train=True,
                            update_state=False)
        return jnp.sum(d)

    grads = jax.grad(d_sum)(interp)  # per-sample grads since D outputs are per-sample
    grads = grads.reshape(n, -1).astype(jnp.float32)  # f32 norm under bf16
    norms = jnp.linalg.norm(grads, axis=1)
    return lbd * jnp.mean((norms - 1.0) ** 2)


def consistency(d_apply, d_params, d_state, images, d_real, augment_fn, rng,
                lbd, y=None):
    (d_aug, _), _ = d_apply(
        d_params, d_state, augment_fn(rng, images), y=y, train=True,
        update_state=False
    )
    d_real = d_real.astype(jnp.float32)
    d_aug = d_aug.astype(jnp.float32)
    return lbd * jnp.mean((d_real - d_aug) ** 2)


def balanced_consistency(
    d_apply, d_params, d_state, all_images, d_real, d_gen, augment_fn, rng,
    lbd, lbd2, y_all=None
):
    (d_aug_all, _), _ = d_apply(
        d_params, d_state, augment_fn(rng, all_images), y=y_all, train=True,
        update_state=False
    )
    n = all_images.shape[0] // 2
    d_aug_all = d_aug_all.astype(jnp.float32)
    d_real = d_real.astype(jnp.float32)
    d_gen = d_gen.astype(jnp.float32)
    d_aug_real, d_aug_gen = d_aug_all[:n], d_aug_all[n:]
    reg_real = jnp.mean((d_real - d_aug_real) ** 2)
    reg_gen = jnp.mean((d_gen - d_aug_gen) ** 2)
    return lbd * reg_real + lbd2 * reg_gen


def compute_penalty(
    mode: str,
    *,
    d_apply: DApply,
    d_params,
    d_state,
    images,
    gen_images,
    all_images,
    d_real,
    d_gen,
    augment_fn,
    rng,
    lbd: float,
    lbd2: float,
    y_real=None,
    y_gen=None,
):
    """Conditional D: the penalty's extra D passes must score under the same
    labels as the main pass, otherwise cr/bcr penalize the label-projection
    term itself and gp regularizes the wrong scoring function."""
    if mode == "none":
        return jnp.zeros(())
    if mode == "gp":
        return gradient_penalty(d_apply, d_params, d_state, images, gen_images,
                                rng, lbd, y=y_real)
    if mode == "cr":
        return consistency(d_apply, d_params, d_state, images, d_real,
                           augment_fn, rng, lbd, y=y_real)
    if mode == "bcr":
        # Labels are all-or-nothing: a mixed call (exactly one of y_real /
        # y_gen None) has no sensible conditional-scoring semantics.
        if y_real is None or y_gen is None:
            assert y_real is None and y_gen is None, (
                "bcr penalty needs both y_real and y_gen, or neither")
            y_all = None
        else:
            y_all = jnp.concatenate([y_real, y_gen], axis=0)
        return balanced_consistency(
            d_apply, d_params, d_state, all_images, d_real, d_gen, augment_fn,
            rng, lbd, lbd2, y_all=y_all
        )
    raise NotImplementedError(f"unknown penalty: {mode}")
