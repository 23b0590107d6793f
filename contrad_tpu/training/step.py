"""The jitted SPMD GAN train step.

Reference hot loop (``train_gan.py:124-227``): per step, n_critic D updates
(each with a fresh real batch and fresh fakes) followed by one G update on
fresh fakes against the just-updated D. Here the whole step — latent sampling,
G forward, on-device augmentation, D forward, both losses (including the
cross-replica contrastive negatives), both Adam updates, spectral-norm power
iterations and BN stat updates — is ONE compiled XLA program over the device
mesh. The n_critic inner loop is a ``lax.scan``.

What the reference does between devices (NCCL all-reduce in backward, GatherLayer
all-gathers, SyncBN, per-step barriers) is all implicit: the step is written on
global arrays; XLA partitions it over the 'data' mesh axis and inserts ICI
collectives.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from contrad_tpu.parallel.mesh import batch_sharding, get_mesh, replicate
from contrad_tpu.training.modes import ModeCtx, get_mode
from contrad_tpu.training.state import GANTrainState, ema_update


def make_d_apply(discriminator) -> Callable:
    """Functional apply for the discriminator, returning ((d, aux), new_state).

    ``update_state=False`` runs in train mode without persisting mutable
    collections (used by penalty-internal D calls)."""

    def d_apply(params, state, x, y=None, train=True, sg_linear=False,
                finetuning=False, update_state=True):
        variables = {"params": params, **state}
        if train and update_state and state:
            out, mutated = discriminator.apply(
                variables, x, y=y, train=train, sg_linear=sg_linear,
                finetuning=finetuning, mutable=list(state.keys()))
            return out, mutated
        out = discriminator.apply(
            variables, x, y=y, train=train, sg_linear=sg_linear,
            finetuning=finetuning)
        return out, state

    return d_apply


def make_g_apply(generator) -> Callable:
    def g_apply(params, state, z, train=True, update_state=True):
        variables = {"params": params, **state}
        if train and update_state and state:
            out, mutated = generator.apply(
                variables, z, train=train, mutable=list(state.keys()))
            return out, mutated
        out = generator.apply(variables, z, train=train)
        return out, state

    return g_apply


def _to_float(images: jax.Array) -> jax.Array:
    """uint8 [0,255] or float [0,1] -> float32 [0,1]. Keeping batches uint8
    until inside the step quarters host->HBM traffic."""
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) / 255.0
    return images.astype(jnp.float32)


class GANTrainer:
    """Builds and owns the jitted train/eval steps for one run."""

    def __init__(
        self,
        generator,
        discriminator,
        mode: str,
        augment_fn: Callable,
        g_optimizer: optax.GradientTransformation,
        d_optimizer: optax.GradientTransformation,
        loss_type: str,
        penalty: str = "none",
        temp: float = 0.1,
        lbd_a: float = 1.0,
        lbd: float = 10.0,
        lbd2: float = 10.0,
        n_critic: int = 1,
        ema: bool = False,
        mesh=None,
    ):
        self.generator = generator
        self.discriminator = discriminator
        self.g_tx = g_optimizer
        self.d_tx = d_optimizer
        self.n_critic = n_critic
        self.ema = ema
        self.mesh = mesh if mesh is not None else get_mesh()

        self.g_apply = make_g_apply(generator)
        self.d_apply = make_d_apply(discriminator)
        self.ctx = ModeCtx(
            d_apply=self.d_apply,
            augment_fn=augment_fn,
            loss_type=loss_type,
            penalty=penalty,
            temp=temp,
            lbd_a=lbd_a,
            lbd=lbd, lbd2=lbd2,
        )
        self.loss_D, self.loss_G = get_mode(mode)

        self.step_fn = jax.jit(self._step, donate_argnums=(0,))
        self.sample_fn = jax.jit(self._sample, static_argnums=(1, 2, 3))

    # ------------------------------------------------------------- train

    def _d_substep(self, g_params, carry, images):
        d_params, d_state, d_opt_state, g_state, rng = carry
        rng, z_rng, loss_rng = jax.random.split(rng, 3)
        n = images.shape[0]

        z = self.generator.sample_latent(z_rng, n)
        gen_images, g_state = self.g_apply(g_params, g_state, z, train=True)
        gen_images = jax.lax.stop_gradient(gen_images)

        def d_loss_fn(p):
            return self.loss_D(self.ctx, p, d_state, images, gen_images, loss_rng)

        (_, (metrics, d_state)), grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_params)
        updates, d_opt_state = self.d_tx.update(grads, d_opt_state, d_params)
        d_params = optax.apply_updates(d_params, updates)
        return (d_params, d_state, d_opt_state, g_state, rng), metrics

    def _step(self, state: GANTrainState, images: jax.Array, ema_decay=0.0):
        """images: (n_critic * B, H, W, C), uint8 or float in [0,1]."""
        images = _to_float(images)
        nb = images.shape[0] // self.n_critic
        images = images.reshape((self.n_critic, nb) + images.shape[1:])

        rng = state.rng
        carry = (state.d_params, state.d_state, state.d_opt_state, state.g_state, rng)
        d_substep = functools.partial(self._d_substep, state.g_params)
        (d_params, d_state, d_opt_state, g_state, rng), metrics_seq = jax.lax.scan(
            d_substep, carry, images)
        # Reference logs the last critic iteration's losses (train_gan.py:184-190).
        metrics = jax.tree.map(lambda m: m[-1], metrics_seq)

        rng, z_rng, g_loss_rng, next_rng = jax.random.split(rng, 4)
        z = self.generator.sample_latent(z_rng, nb)

        def g_loss_fn(g_params):
            gen_images, new_g_state = self.g_apply(g_params, g_state, z, train=True)
            g_loss, new_d_state = self.loss_G(
                self.ctx, d_params, d_state, gen_images, g_loss_rng)
            return g_loss, (new_g_state, new_d_state)

        (g_loss, (g_state, d_state)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
        g_updates, g_opt_state = self.g_tx.update(
            g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        metrics["G_loss"] = g_loss

        if self.ema and state.g_ema_params is not None:
            g_ema_params = ema_update(state.g_ema_params, g_params, ema_decay)
            g_ema_state = jax.tree.map(lambda x: x, g_state)  # buffers copied
        else:
            g_ema_params = state.g_ema_params
            g_ema_state = state.g_ema_state

        new_state = state.replace(
            step=state.step + 1,
            rng=next_rng,
            g_params=g_params, g_state=g_state,
            d_params=d_params, d_state=d_state,
            g_opt_state=g_opt_state, d_opt_state=d_opt_state,
            g_ema_params=g_ema_params, g_ema_state=g_ema_state,
        )
        return new_state, metrics

    def train_step(self, state: GANTrainState, images, ema_decay: float = 0.0):
        return self.step_fn(state, images, ema_decay)

    # ------------------------------------------------------------- eval

    def _sample(self, state: GANTrainState, n: int, use_ema: bool = False,
                train: bool = False):
        rng = jax.random.fold_in(state.rng, 7)
        z = self.generator.sample_latent(rng, n)
        params = state.g_ema_params if use_ema else state.g_params
        g_state = state.g_ema_state if use_ema else state.g_state
        out, _ = self.g_apply(params, g_state, z, train=train, update_state=False)
        return out

    def sample_from_z(self, state: GANTrainState, z, use_ema: bool = False):
        params = state.g_ema_params if use_ema else state.g_params
        g_state = state.g_ema_state if use_ema else state.g_state
        out, _ = self.g_apply(params, g_state, z, train=False, update_state=False)
        return out

    # ------------------------------------------------------------- placement

    def place_state(self, state: GANTrainState) -> GANTrainState:
        """Replicate the train state over the mesh."""
        return replicate(state, self.mesh)

    def place_batch(self, images):
        return jax.device_put(images, batch_sharding(self.mesh))
