"""Train state: a single pytree carrying everything the jitted step mutates.

Replaces the reference's scattered mutable objects (module buffers, optimizer
objects, DDP wrappers, `set_grad` toggling — ``train_gan.py:143-180``) with one
functional state, which also makes checkpoint/resume exact: G, D, both Adam
states, EMA, step counter and PRNG key are saved/restored together (the
reference forgets RNG state and FID history on resume — SURVEY §5).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class GANTrainState:
    step: jax.Array  # int32 scalar, number of completed steps
    rng: jax.Array  # PRNG key threaded through training
    g_params: Any
    g_state: Any  # mutable collections of G (e.g. {'batch_stats': ...})
    d_params: Any
    d_state: Any  # mutable collections of D (e.g. {'spectral': ...})
    g_opt_state: Any
    d_opt_state: Any
    g_ema_params: Optional[Any] = None  # EMA of G params (StyleGAN2 trainers)
    g_ema_state: Optional[Any] = None


def make_optimizer(
    lr: float,
    beta: Tuple[float, float],
    warmup: int = 0,
    use_warmup: bool = False,
    lr_decay_fn=None,
    flat: bool = False,
    mu_dtype=None,
    nu_dtype=None,
    grads_dtype=None,
) -> optax.GradientTransformation:
    """Adam with the reference's linear LR warmup
    (``train_gan.py:88-93``: lr * min(1, (step+1)/warmup)) and an optional
    multiplicative decay schedule (StyleGAN2 half-life decay).

    ``flat=True`` runs the Adam math over ONE raveled parameter vector
    (``optax.flatten``): instead of ~8 small XLA ops per pytree leaf —
    hundreds of lane-underfilled (8,128)-tile kernels for the bias/style
    leaves of a big model — the update is a handful of full-bandwidth
    elementwise ops over a single contiguous buffer. Numerics are identical
    (Adam is elementwise); only the opt-state layout changes, so flip it per
    run, not mid-run (checkpointed opt states are layout-specific).

    ``mu_dtype`` stores Adam's first moment in that dtype (optax upcasts it
    for the update math, params stay f32 masters): ``jnp.bfloat16`` halves
    the mu read+write traffic — a byte-cut lever for the HBM-bound 32^2
    flagship step (BASELINE.md round-3 roofline: 82% of the bytes floor,
    with params/optimizer/dW reductions the residual f32 bytes).

    ``nu_dtype`` stores Adam's second moment in that dtype (mirror of the mu
    lever: the state leaf is downcast after each update, the update math
    upcasts to f32 first). CAUTION — unlike mu (b1 ∈ {0, 0.5} here, so each
    step replaces 50-100% of the buffer), nu accumulates with b2 = 0.99-0.999:
    the per-step increment (1-b2)·g² is 0.1-1% of the running value, at or
    below bf16's ~0.4% epsilon, so a warm bf16 nu can stop absorbing gradient
    -scale changes (round-to-nearest swallows the increment). Opt-in lever
    for A/B measurement only; see BASELINE.md round 5 for the verdict.

    ``grads_dtype`` casts incoming gradients to that dtype before the Adam
    math (mu/nu accumulation and the update stay f32 via optax's promotion,
    params stay f32 masters — but note optax squares the gradient for the
    second moment IN the cast dtype before promoting, so nu's g^2 term
    carries one extra bf16 rounding; A/B-validated at 3k steps,
    BASELINE.md round 4). Inside the jitted step XLA sinks the convert into the dW conv
    fusions' outputs, so ``jnp.bfloat16`` halves the dW write+read traffic.
    Implemented as an update-fn wrapper, NOT ``optax.chain``, so the opt-state
    pytree structure (and thus checkpoints) is identical to the default."""

    def schedule(count):
        lr_t = jnp.asarray(lr, dtype=jnp.float32)
        if use_warmup and warmup > 0:
            lr_t = lr_t * jnp.minimum(1.0, (count + 1.0) / warmup)
        if lr_decay_fn is not None:
            lr_t = lr_t * lr_decay_fn(count)
        return lr_t

    tx = optax.adam(schedule, b1=beta[0], b2=beta[1], mu_dtype=mu_dtype)
    if nu_dtype is not None:
        adam_tx = tx

        def _is_adam(s):
            return isinstance(s, optax.ScaleByAdamState)

        def _map_nu(opt_state, f):
            return jax.tree_util.tree_map(
                lambda s: s._replace(nu=jax.tree.map(f, s.nu))
                if _is_adam(s) else s,
                opt_state, is_leaf=_is_adam)

        def _nu_init(params):
            return _map_nu(adam_tx.init(params),
                           lambda x: x.astype(nu_dtype))

        def _nu_update(updates, state, params=None):
            state = _map_nu(state, lambda x: x.astype(jnp.float32))
            updates, new_state = adam_tx.update(updates, state, params)
            return updates, _map_nu(new_state,
                                    lambda x: x.astype(nu_dtype))

        tx = optax.GradientTransformation(_nu_init, _nu_update)
    if grads_dtype is not None:
        inner = tx

        def _cast_update(updates, state, params=None):
            updates = jax.tree.map(
                lambda g: g.astype(grads_dtype), updates)
            return inner.update(updates, state, params)

        tx = optax.GradientTransformation(inner.init, _cast_update)
    return optax.flatten(tx) if flat else tx


def split_variables(variables: dict) -> Tuple[Any, dict]:
    """Split linen init() output into (params, mutable_state_collections)."""
    params = variables.get("params", {})
    state = {k: v for k, v in variables.items() if k != "params"}
    return params, state


def create_train_state(
    rng: jax.Array,
    generator,
    discriminator,
    image_size: Tuple[int, int, int],
    g_optimizer: optax.GradientTransformation,
    d_optimizer: optax.GradientTransformation,
    ema: bool = False,
    init_batch: int = 2,
) -> GANTrainState:
    """Initialize all model/optimizer state with tiny dummy batches."""
    h, w, c = image_size
    rng, g_rng, d_rng, z_rng, next_rng = jax.random.split(rng, 5)
    z = generator.sample_latent(z_rng, init_batch)
    g_vars = generator.init(g_rng, z, train=True)
    g_params, g_state = split_variables(g_vars)

    dummy = jnp.zeros((init_batch, h, w, c), dtype=jnp.float32)
    # Conditional D: init WITH labels so the y-head (linear_y SNEmbed,
    # reference base.py:107-130) parameters exist in the tree.
    n_classes = int(getattr(discriminator, "n_classes", 1) or 1)
    dummy_y = (jnp.zeros((init_batch,), dtype=jnp.int32)
               if n_classes > 1 else None)
    d_vars = discriminator.init(d_rng, dummy, y=dummy_y, train=True)
    d_params, d_state = split_variables(d_vars)

    return GANTrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        rng=next_rng,
        g_params=g_params,
        g_state=g_state,
        d_params=d_params,
        d_state=d_state,
        g_opt_state=g_optimizer.init(g_params),
        d_opt_state=d_optimizer.init(d_params),
        g_ema_params=jax.tree.map(jnp.copy, g_params) if ema else None,
        g_ema_state=jax.tree.map(jnp.copy, g_state) if ema else None,
    )


def ema_update(ema_params, params, decay):
    """Pure-pytree EMA lerp (reference ``utils.py:130-143`` accumulate)."""
    return jax.tree.map(lambda e, p: e * decay + p * (1.0 - decay), ema_params, params)


def count_parameters(params) -> int:
    return sum(int(jnp.size(x)) for x in jax.tree.leaves(params))
