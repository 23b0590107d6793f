"""GAN and contrastive losses (reference: ``training/criterion.py``,
``training/gan/contrad.py:8-32``, ``training/gan/std.py:14-25``).

All losses are written on the *global* batch: under jit-over-mesh SPMD the
arrays seen here are globally-sharded, so the contrastive similarity matrices
automatically span the cross-replica negative pool — XLA inserts the
all-gathers over ICI. This replaces the reference's differentiable
``GatherLayer`` (``third_party/gather_layer.py``) and its ``distributed``
flags entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from contrad_tpu.models.base import l2_normalize_rows

NEG_INF_DIAG = -5e4  # reference masks self-similarity with -5e4


def nt_xent(
    out1: jax.Array,
    out2: jax.Array,
    temperature: float = 0.1,
    normalize: bool = False,
) -> jax.Array:
    """SimCLR NT-Xent over two views (reference ``criterion.py:24-45``).

    Loss math is always f32: under a bf16 compute dtype the projections
    arrive bf16, and log-softmax over a 2Nx2N similarity matrix with a -5e4
    diagonal is not bf16-safe. The cast is a no-op in f32 mode and the
    matrices are tiny (2N x d)."""
    assert out1.shape[0] == out2.shape[0]
    out1 = out1.astype(jnp.float32)
    out2 = out2.astype(jnp.float32)
    if normalize:
        out1 = l2_normalize_rows(out1)
        out2 = l2_normalize_rows(out2)
    n = out1.shape[0]
    outputs = jnp.concatenate([out1, out2], axis=0)  # (2N, d)

    sim = jnp.matmul(outputs, outputs.T) / temperature  # (2N, 2N)
    eye = jnp.eye(2 * n, dtype=bool)
    sim = jnp.where(eye, NEG_INF_DIAG, sim)
    log_sm = jax.nn.log_softmax(sim, axis=1)

    pos12 = jnp.diagonal(log_sm[:n, n:])
    pos21 = jnp.diagonal(log_sm[n:, :n])
    return -(jnp.sum(pos12) + jnp.sum(pos21)) / (2 * n)


def supcon_fake(
    out1: jax.Array,
    out2: jax.Array,
    others: jax.Array,
    temperature: float,
) -> jax.Array:
    """Supervised-contrastive loss treating fakes as one class
    (reference ``contrad.py:8-32``): rows restricted to the fakes, positives =
    the other fakes, negatives = both real views + fakes. f32 loss math
    (see nt_xent)."""
    out1 = out1.astype(jnp.float32)
    out2 = out2.astype(jnp.float32)
    others = others.astype(jnp.float32)
    n = out1.shape[0]
    m = others.shape[0]
    outputs = jnp.concatenate([out1, out2, others], axis=0)  # (2N+M, d)

    sim = jnp.matmul(outputs, outputs.T) / temperature
    total = 2 * n + m
    eye = jnp.eye(total, dtype=bool)
    sim = jnp.where(eye, NEG_INF_DIAG, sim)

    sim_fakes = sim[2 * n :]  # (M, 2N+M)
    # Positive mask: other fakes only, excluding self.
    col_is_fake = jnp.arange(total) >= 2 * n  # (2N+M,)
    row_idx = jnp.arange(m) + 2 * n  # global index of each fake row
    mask = col_is_fake[None, :] & (jnp.arange(total)[None, :] != row_idx[:, None])
    mask = mask.astype(sim.dtype)
    mask = mask / jnp.sum(mask, axis=1, keepdims=True)

    log_sm = jax.nn.log_softmax(sim_fakes, axis=1)
    return -jnp.mean(jnp.sum(log_sm * mask, axis=1))


def gan_d_loss(d_real: jax.Array, d_gen: jax.Array, loss_type: str) -> jax.Array:
    """Discriminator GAN loss (reference ``std.py:14-25``). f32 loss math
    (see nt_xent)."""
    d_real = d_real.astype(jnp.float32)
    d_gen = d_gen.astype(jnp.float32)
    if loss_type == "nonsat":
        return jnp.mean(jax.nn.softplus(d_gen)) + jnp.mean(jax.nn.softplus(-d_real))
    if loss_type == "wgan":
        return jnp.mean(d_gen) - jnp.mean(d_real)
    if loss_type == "hinge":
        return jnp.mean(jax.nn.relu(1.0 + d_gen)) + jnp.mean(jax.nn.relu(1.0 - d_real))
    if loss_type == "lsgan":
        return 0.5 * (jnp.mean((d_real - 1.0) ** 2) + jnp.mean(d_gen**2))
    raise NotImplementedError(f"unknown GAN loss: {loss_type}")


def gan_g_loss(d_gen: jax.Array, loss_type: str) -> jax.Array:
    """Generator GAN loss (reference ``std.py:40-48``): nonsat and lsgan have
    dedicated forms, everything else uses -E[d_gen]. f32 loss math."""
    d_gen = d_gen.astype(jnp.float32)
    if loss_type == "nonsat":
        return jnp.mean(jax.nn.softplus(-d_gen))
    if loss_type == "lsgan":
        return 0.5 * jnp.mean((d_gen - 1.0) ** 2)
    return -jnp.mean(d_gen)


def target_nll_loss(log_probs: jax.Array, targets: jax.Array,
                    reduction: str = "none") -> jax.Array:
    """Margin helper (reference ``criterion.py:8-21``, kept for parity; unused
    by the training modes): max over non-target classes of
    (log_prob - target_log_prob)."""
    n = log_probs.shape[0]
    target_lp = jnp.take_along_axis(log_probs, targets[:, None], axis=1)
    diff = log_probs - target_lp
    diff = jnp.where(
        jax.nn.one_hot(targets, log_probs.shape[1], dtype=bool), -1e8, diff)
    diff_max = jnp.max(diff, axis=1)
    if reduction == "sum":
        return jnp.sum(diff_max)
    if reduction == "mean":
        return jnp.mean(diff_max)
    if reduction == "none":
        return diff_max
    raise NotImplementedError(f"unknown reduction: {reduction}")
