"""Golden-value tests for the contrastive and GAN losses.

Oracles are written independently from the loss *definitions* (NT-Xent /
SupCon papers), in numpy — they are not ports of anyone's code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrad_tpu.training.losses import gan_d_loss, gan_g_loss, nt_xent, supcon_fake


def _np_log_softmax(x):
    x = x - x.max(axis=1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=1, keepdims=True))


def _np_nt_xent(a, b, temp):
    n = a.shape[0]
    out = np.concatenate([a, b], 0)
    sim = out @ out.T / temp
    np.fill_diagonal(sim, -5e4)
    lsm = _np_log_softmax(sim)
    pos = np.array([lsm[i, i + n] for i in range(n)] + [lsm[i + n, i] for i in range(n)])
    return -pos.sum() / (2 * n)


def _np_supcon_fake(a, b, others, temp):
    n, m = a.shape[0], others.shape[0]
    out = np.concatenate([a, b, others], 0)
    sim = out @ out.T / temp
    np.fill_diagonal(sim, -5e4)
    lsm = _np_log_softmax(sim[2 * n:])
    total = 0.0
    for i in range(m):
        pos_cols = [2 * n + j for j in range(m) if j != i]
        total += lsm[i, pos_cols].mean()
    return -total / m


@pytest.mark.parametrize("n,d,temp", [(4, 8, 0.1), (7, 16, 0.5)])
def test_nt_xent_matches_numpy(n, d, temp, np_rng):
    a = np_rng.normal(size=(n, d)).astype(np.float32)
    b = np_rng.normal(size=(n, d)).astype(np.float32)
    got = nt_xent(jnp.asarray(a), jnp.asarray(b), temperature=temp)
    want = _np_nt_xent(a, b, temp)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_nt_xent_normalize_flag(np_rng):
    a = np_rng.normal(size=(5, 8)).astype(np.float32) * 3
    b = np_rng.normal(size=(5, 8)).astype(np.float32) * 3
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    got = nt_xent(jnp.asarray(a), jnp.asarray(b), temperature=0.2, normalize=True)
    want = _np_nt_xent(an, bn, 0.2)
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_nt_xent_perfect_alignment_low_loss(np_rng):
    """Identical, well-separated views => near-minimal loss."""
    a = np.eye(8, dtype=np.float32) * 10
    loss_aligned = float(nt_xent(jnp.asarray(a), jnp.asarray(a), temperature=0.1))
    b = np.roll(a, 1, axis=0)
    loss_misaligned = float(nt_xent(jnp.asarray(a), jnp.asarray(b), temperature=0.1))
    assert loss_aligned < loss_misaligned


@pytest.mark.parametrize("n,m", [(4, 4), (3, 5)])
def test_supcon_fake_matches_numpy(n, m, np_rng):
    d = 8
    a = np_rng.normal(size=(n, d)).astype(np.float32)
    b = np_rng.normal(size=(n, d)).astype(np.float32)
    o = np_rng.normal(size=(m, d)).astype(np.float32)
    got = supcon_fake(jnp.asarray(a), jnp.asarray(b), jnp.asarray(o), temperature=0.1)
    want = _np_supcon_fake(a, b, o, 0.1)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_gan_losses(np_rng):
    d_real = jnp.asarray(np_rng.normal(size=(6, 1)).astype(np.float32))
    d_gen = jnp.asarray(np_rng.normal(size=(6, 1)).astype(np.float32))
    r, g = np.asarray(d_real), np.asarray(d_gen)

    np.testing.assert_allclose(
        float(gan_d_loss(d_real, d_gen, "nonsat")),
        (np.logaddexp(0, g).mean() + np.logaddexp(0, -r).mean()), rtol=1e-5)
    np.testing.assert_allclose(
        float(gan_d_loss(d_real, d_gen, "wgan")), g.mean() - r.mean(), rtol=1e-5)
    np.testing.assert_allclose(
        float(gan_d_loss(d_real, d_gen, "hinge")),
        (np.maximum(0, 1 + g).mean() + np.maximum(0, 1 - r).mean()), rtol=1e-5)
    np.testing.assert_allclose(
        float(gan_d_loss(d_real, d_gen, "lsgan")),
        0.5 * (((r - 1) ** 2).mean() + (g**2).mean()), rtol=1e-5)

    np.testing.assert_allclose(
        float(gan_g_loss(d_gen, "nonsat")), np.logaddexp(0, -g).mean(), rtol=1e-5)
    np.testing.assert_allclose(
        float(gan_g_loss(d_gen, "lsgan")), 0.5 * ((g - 1) ** 2).mean(), rtol=1e-5)
    np.testing.assert_allclose(
        float(gan_g_loss(d_gen, "hinge")), -g.mean(), rtol=1e-5)


def test_nt_xent_gradient_flows(np_rng):
    a = jnp.asarray(np_rng.normal(size=(4, 8)).astype(np.float32))
    b = jnp.asarray(np_rng.normal(size=(4, 8)).astype(np.float32))
    g = jax.grad(lambda x: nt_xent(x, b, temperature=0.1))(a)
    assert float(jnp.abs(g).sum()) > 0


def test_conditional_penalties_score_under_labels(np_rng, rng):
    """cr/bcr/gp penalties must call D with the same labels as the main pass
    (regression: labels were dropped, so cr penalized the label-projection
    term itself — nonzero even for an identity augmentation)."""
    from contrad_tpu.training.penalty import compute_penalty

    def d_apply(params, state, x, y=None, train=True, update_state=False):
        d = x.reshape(x.shape[0], -1).sum(axis=1)
        if y is not None:
            d = d + 10.0 * y.astype(d.dtype)  # label-projection stand-in
        return (d, None), state

    n = 4
    images = jnp.asarray(np_rng.uniform(size=(n, 2, 2, 1)), jnp.float32)
    gen = jnp.asarray(np_rng.uniform(size=(n, 2, 2, 1)), jnp.float32)
    y_real = jnp.arange(n)
    y_gen = jnp.arange(n)[::-1]
    (d_real, _), _ = d_apply(None, None, images, y=y_real)
    (d_gen, _), _ = d_apply(None, None, gen, y=y_gen)
    identity = lambda r, x: x

    common = dict(d_apply=d_apply, d_params=None, d_state=None, images=images,
                  gen_images=gen,
                  all_images=jnp.concatenate([images, gen], axis=0),
                  d_real=d_real, d_gen=d_gen, augment_fn=identity, rng=rng,
                  lbd=10.0, lbd2=10.0, y_real=y_real, y_gen=y_gen)

    # identity augmentation + matching labels => exact consistency
    assert float(compute_penalty("cr", **common)) == 0.0
    assert float(compute_penalty("bcr", **common)) == 0.0
    # gp runs with labels threaded (additive label term has zero input-grad,
    # so the value matches the unconditional one)
    gp_cond = float(compute_penalty("gp", **common))
    gp_uncond = float(compute_penalty(
        "gp", **{**common, "y_real": None, "y_gen": None}))
    np.testing.assert_allclose(gp_cond, gp_uncond, rtol=1e-6)
