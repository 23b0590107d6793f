"""Training modes (reference: ``training/gan/{std,aug,aug_both,simclr_only,contrad}.py``).

Each mode defines a pair of loss functions used by the jitted SPMD train step:

  * ``loss_D(ctx, d_params, d_state, images, gen_images, rng)``
      -> (total_d_loss, (metrics, new_d_state))
    where ``total_d_loss = d_loss + penalty`` exactly as the trainer combines
    them in the reference (``train_gan.py:159``). Metrics carry the split
    (D_loss / D_penalty / D_real / D_gen) for logging parity.
  * ``loss_G(ctx, d_params, d_state, gen_images, rng)`` -> (g_loss, new_d_state)
    The D state advances during the G phase too (spectral-norm power iteration
    runs whenever D is applied in train mode — reference train_gan.py keeps D
    in train() during the G step).

``ctx`` (ModeCtx) bundles the discriminator apply function, the augmentation,
and the hyperparameters; modes themselves are pure and jit-traceable.

Mode semantics (all from the reference):
  * ``std``         — plain GAN loss on [real, fake]; penalty configurable.
  * ``aug``         — augment *reals only* in the D loss; G loss unaugmented.
  * ``aug_both``    — DiffAugment-style: augment [real, fake] in D and fakes in G.
  * ``simclr_only`` — D trained purely by NT-Xent on two real views; G trains
                      against the (untrained-by-GAN) head with augmented fakes.
  * ``contrad``     — THE method: one D pass over augmented [real, real, fake]
                      with sg_linear; backbone loss = NT-Xent + lbd_a * supcon;
                      GAN head loss routed through the "penalty" slot.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from contrad_tpu.models.base import l2_normalize_rows
from contrad_tpu.training.losses import gan_d_loss, gan_g_loss, nt_xent, supcon_fake
from contrad_tpu.training.penalty import compute_penalty

Metrics = Dict[str, jax.Array]
AugmentFn = Callable[[jax.Array, jax.Array], jax.Array]


@dataclasses.dataclass(frozen=True)
class ModeCtx:
    """Static context threaded through the loss functions."""

    d_apply: Callable  # (params, state, x, *, train, sg_linear, update_state) -> ((d, aux), new_state)
    augment_fn: AugmentFn
    loss_type: str
    penalty: str = "none"
    temp: float = 0.1
    lbd_a: float = 1.0
    lbd: float = 10.0
    lbd2: float = 10.0


def _metrics(d_loss, penalty, d_real, d_gen) -> Metrics:
    return {
        "D_loss": d_loss,
        "D_penalty": penalty,
        "D_real": jnp.mean(d_real),
        "D_gen": jnp.mean(d_gen),
    }


def _g_loss_on(ctx: ModeCtx, d_params, d_state, x, lsgan_ok: bool = True,
               y=None):
    (d_gen, _), new_state = ctx.d_apply(d_params, d_state, x, y=y, train=True)
    loss_type = ctx.loss_type
    if not lsgan_ok and loss_type == "lsgan":
        loss_type = "wgan"  # reference aug_both G loss has no lsgan branch
    return gan_g_loss(d_gen, loss_type), new_state


# ----------------------------------------------------------------- std

def _cat_y(y_real, y_gen, *parts):
    """Concatenate label vectors for a multi-part D batch; None when
    unconditional (each part is 'real'/'gen')."""
    if y_real is None and y_gen is None:
        return None
    vecs = {"real": y_real, "gen": y_gen}
    return jnp.concatenate([vecs[p] for p in parts], axis=0)


def _std_loss_D(ctx, d_params, d_state, images, gen_images, rng,
                y_real=None, y_gen=None):
    gen_images = jax.lax.stop_gradient(gen_images)
    n = images.shape[0]
    all_images = jnp.concatenate([images, gen_images], axis=0)
    (d_all, _), new_state = ctx.d_apply(
        d_params, d_state, all_images, y=_cat_y(y_real, y_gen, "real", "gen"),
        train=True)
    d_real, d_gen = d_all[:n], d_all[n:]
    d_loss = gan_d_loss(d_real, d_gen, ctx.loss_type)
    penalty = compute_penalty(
        ctx.penalty, d_apply=ctx.d_apply, d_params=d_params, d_state=d_state,
        images=images, gen_images=gen_images, all_images=all_images,
        d_real=d_real, d_gen=d_gen, augment_fn=ctx.augment_fn, rng=rng,
        lbd=ctx.lbd, lbd2=ctx.lbd2, y_real=y_real, y_gen=y_gen)
    return d_loss + penalty, (_metrics(d_loss, penalty, d_real, d_gen), new_state)


def _std_loss_G(ctx, d_params, d_state, gen_images, rng, y_gen=None):
    return _g_loss_on(ctx, d_params, d_state, gen_images, y=y_gen)


# ----------------------------------------------------------------- aug

def _aug_loss_D(ctx, d_params, d_state, images, gen_images, rng,
                y_real=None, y_gen=None):
    gen_images = jax.lax.stop_gradient(gen_images)
    n = images.shape[0]
    rng_aug, rng_pen = jax.random.split(rng)
    all_images = jnp.concatenate([ctx.augment_fn(rng_aug, images), gen_images], axis=0)
    (d_all, _), new_state = ctx.d_apply(
        d_params, d_state, all_images, y=_cat_y(y_real, y_gen, "real", "gen"),
        train=True)
    d_real, d_gen = d_all[:n], d_all[n:]
    d_loss = gan_d_loss(d_real, d_gen, ctx.loss_type)
    penalty = compute_penalty(
        ctx.penalty, d_apply=ctx.d_apply, d_params=d_params, d_state=d_state,
        images=images, gen_images=gen_images, all_images=all_images,
        d_real=d_real, d_gen=d_gen, augment_fn=ctx.augment_fn, rng=rng_pen,
        lbd=ctx.lbd, lbd2=ctx.lbd2, y_real=y_real, y_gen=y_gen)
    return d_loss + penalty, (_metrics(d_loss, penalty, d_real, d_gen), new_state)


# ----------------------------------------------------------------- aug_both

def _aug_both_loss_D(ctx, d_params, d_state, images, gen_images, rng,
                     y_real=None, y_gen=None):
    if ctx.loss_type == "lsgan":
        raise NotImplementedError("aug_both has no lsgan branch (reference aug_both.py)")
    gen_images = jax.lax.stop_gradient(gen_images)
    n = images.shape[0]
    rng_aug, rng_pen = jax.random.split(rng)
    all_images = jnp.concatenate([images, gen_images], axis=0)
    (d_all, _), new_state = ctx.d_apply(
        d_params, d_state, ctx.augment_fn(rng_aug, all_images),
        y=_cat_y(y_real, y_gen, "real", "gen"), train=True)
    d_real, d_gen = d_all[:n], d_all[n:]
    d_loss = gan_d_loss(d_real, d_gen, ctx.loss_type)
    penalty = compute_penalty(
        ctx.penalty, d_apply=ctx.d_apply, d_params=d_params, d_state=d_state,
        images=images, gen_images=gen_images, all_images=all_images,
        d_real=d_real, d_gen=d_gen, augment_fn=ctx.augment_fn, rng=rng_pen,
        lbd=ctx.lbd, lbd2=ctx.lbd2, y_real=y_real, y_gen=y_gen)
    return d_loss + penalty, (_metrics(d_loss, penalty, d_real, d_gen), new_state)


def _augmented_loss_G(ctx, d_params, d_state, gen_images, rng, y_gen=None):
    return _g_loss_on(ctx, d_params, d_state, ctx.augment_fn(rng, gen_images),
                      lsgan_ok=False, y=y_gen)


def _augmented_loss_G_lsgan_ok(ctx, d_params, d_state, gen_images, rng,
                               y_gen=None):
    return _g_loss_on(ctx, d_params, d_state, ctx.augment_fn(rng, gen_images),
                      y=y_gen)


# ----------------------------------------------------------------- simclr_only

def _simclr_only_loss_D(ctx, d_params, d_state, images, gen_images, rng,
                        y_real=None, y_gen=None):
    real_images = jnp.concatenate([images, images], axis=0)
    (_, aux), new_state = ctx.d_apply(
        d_params, d_state, ctx.augment_fn(rng, real_images), train=True)
    views = l2_normalize_rows(aux["projection"].astype(jnp.float32))
    n = images.shape[0]
    view1, view2 = views[:n], views[n:]
    simclr_loss = nt_xent(view1, view2, temperature=ctx.temp)
    zero = 0.0 * simclr_loss
    return simclr_loss, (_metrics(simclr_loss, zero, zero, zero), new_state)


# ----------------------------------------------------------------- contrad

def _contrad_loss_D(ctx, d_params, d_state, images, gen_images, rng,
                    y_real=None, y_gen=None):
    """Reference ``contrad.py:35-70``. One D pass over augmented
    [real, real, fake] (per-sample aug randomness => two independent real
    views); the GAN head loss rides the penalty slot so the backbone gradient
    is purely contrastive."""
    gen_images = jax.lax.stop_gradient(gen_images)
    n = images.shape[0]
    cat_images = jnp.concatenate([images, images, gen_images], axis=0)
    (d_all, aux), new_state = ctx.d_apply(
        d_params, d_state, ctx.augment_fn(rng, cat_images),
        y=_cat_y(y_real, y_gen, "real", "real", "gen"), train=True,
        sg_linear=True)

    # Projections normalize and contrast in f32 (they may arrive bf16 under
    # a bf16 compute dtype; the loss matrices are tiny).
    views = l2_normalize_rows(aux["projection"].astype(jnp.float32))
    view1, view2 = views[:n], views[n : 2 * n]
    simclr_loss = nt_xent(view1, view2, temperature=ctx.temp)

    reals = l2_normalize_rows(aux["projection2"].astype(jnp.float32))
    real1, real2, fakes = reals[:n], reals[n : 2 * n], reals[2 * n :]
    sup_loss = supcon_fake(real1, real2, fakes, temperature=ctx.temp)

    d_real, d_gen = d_all[:n], d_all[2 * n : 3 * n]
    head_loss = gan_d_loss(d_real, d_gen, ctx.loss_type)

    contrastive = simclr_loss + ctx.lbd_a * sup_loss
    return contrastive + head_loss, (
        _metrics(contrastive, head_loss, d_real, d_gen), new_state)


_MODES: Dict[str, Tuple[Callable, Callable]] = {
    "std": (_std_loss_D, _std_loss_G),
    "aug": (_aug_loss_D, _std_loss_G),
    "aug_both": (_aug_both_loss_D, _augmented_loss_G),
    "simclr_only": (_simclr_only_loss_D, _augmented_loss_G_lsgan_ok),
    "contrad": (_contrad_loss_D, _augmented_loss_G_lsgan_ok),
}


def get_mode(mode: str) -> Tuple[Callable, Callable]:
    """Returns (loss_D, loss_G) for a training mode."""
    if mode not in _MODES:
        raise NotImplementedError(f"unknown training mode: {mode}")
    return _MODES[mode]


def run_filename(mode: str, penalty: str, aug: str, temp: float, lbd_a: float) -> str:
    """Run-name encoding (reference ``training/gan/__init__.py:9-24``)."""
    if mode == "std":
        filename = f"{mode}_{penalty}"
        if "cr" in penalty:
            filename += f"_{aug}"
    elif mode in ("aug", "aug_both"):
        filename = f"{mode}_{aug}_{penalty}"
    elif mode == "simclr_only":
        filename = f"{mode}_{aug}_T{temp}"
    elif mode == "contrad":
        filename = f"{mode}_{aug}_L{lbd_a}_T{temp}"
    else:
        raise NotImplementedError(f"unknown training mode: {mode}")
    return filename
