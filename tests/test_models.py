"""Model tests: shapes, value ranges, mutable collections, and the ContraD
gradient-routing contract (sg_linear)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrad_tpu.models import get_architecture
from contrad_tpu.models.sndcgan import DSndcgan, GSndcgan

IMG = (16, 16, 3)  # small but valid (H, W divisible by 8)


@pytest.fixture(scope="module")
def sndcgan_pair():
    g = GSndcgan(image_size=IMG, ngf=8, nz=16)
    d = DSndcgan(image_size=IMG, ndf=8, mlp_linear=True, d_hidden=32)
    return g, d


def test_generator_shapes_and_range(sndcgan_pair, rng):
    g, _ = sndcgan_pair
    z = g.sample_latent(rng, 4)
    assert z.shape == (4, 16)
    assert float(z.min()) >= -1.0 and float(z.max()) <= 1.0
    variables = g.init(rng, z, train=True)
    out, mutated = g.apply(variables, z, train=True, mutable=["batch_stats"])
    assert out.shape == (4,) + IMG
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    assert "batch_stats" in variables
    # BN stats actually move
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_discriminator_heads(sndcgan_pair, rng):
    _, d = sndcgan_pair
    x = jax.random.uniform(rng, (4,) + IMG)
    variables = d.init(rng, x, train=True)
    (score, aux), _ = d.apply(variables, x, train=True, mutable=["spectral"])
    assert score.shape == (4, 1)
    assert aux["projection"].shape == (4, 128)
    assert aux["projection2"].shape == (4, 128)
    n_feat = 8 * 8 * (16 // 8) * (16 // 8)
    assert aux["penultimate"].shape == (4, n_feat)
    assert "spectral" in variables  # SN power-iteration state exists


def test_sg_linear_blocks_backbone_grads(sndcgan_pair, rng):
    """THE ContraD contract (reference base.py:123-126): with sg_linear, the
    GAN-head loss must produce zero gradient on the backbone."""
    _, d = sndcgan_pair
    x = jax.random.uniform(rng, (4,) + IMG)
    variables = jax.jit(lambda r, xx: d.init(r, xx, train=True))(rng, x)
    params = variables["params"]
    state = {"spectral": variables["spectral"]}

    def head_loss(p, sg):
        (score, _), _ = d.apply({"params": p, **state}, x, train=False,
                                sg_linear=sg, mutable=[])
        return jnp.sum(score)

    # jit: eager per-primitive dispatch of grad-of-D is ~17 s on this box
    g_sg = jax.jit(jax.grad(lambda p: head_loss(p, True)))(params)
    backbone_norm = sum(
        float(jnp.abs(v).sum()) for v in jax.tree.leaves(g_sg["backbone"]))
    head_norm = sum(
        float(jnp.abs(v).sum()) for v in jax.tree.leaves(g_sg["linear"]))
    assert backbone_norm == 0.0, "sg_linear must stop grads into the backbone"
    assert head_norm > 0.0, "the GAN head itself must still receive grads"

    g_nosg = jax.jit(jax.grad(lambda p: head_loss(p, False)))(params)
    backbone_norm2 = sum(
        float(jnp.abs(v).sum()) for v in jax.tree.leaves(g_nosg["backbone"]))
    assert backbone_norm2 > 0.0


def test_projection_grads_reach_backbone(sndcgan_pair, rng):
    _, d = sndcgan_pair
    x = jax.random.uniform(rng, (4,) + IMG)
    variables = jax.jit(lambda r, xx: d.init(r, xx, train=True))(rng, x)
    params = variables["params"]
    state = {"spectral": variables["spectral"]}

    def proj_loss(p):
        (_, aux), _ = d.apply({"params": p, **state}, x, train=False,
                              sg_linear=True, mutable=[])
        return jnp.sum(aux["projection"] ** 2) + jnp.sum(aux["projection2"] ** 2)

    g = jax.jit(jax.grad(proj_loss))(params)
    backbone_norm = sum(
        float(jnp.abs(v).sum()) for v in jax.tree.leaves(g["backbone"]))
    assert backbone_norm > 0.0


def test_finetuning_stops_grads_and_uses_eval_mode(sndcgan_pair, rng):
    _, d = sndcgan_pair
    x = jax.random.uniform(rng, (4,) + IMG)
    variables = d.init(rng, x, train=True)
    params = variables["params"]
    state = {"spectral": variables["spectral"]}

    def loss(p):
        (score, _), _ = d.apply({"params": p, **state}, x, train=True,
                                finetuning=True, mutable=[])
        return jnp.sum(score)

    g = jax.grad(loss)(params)
    backbone_norm = sum(
        float(jnp.abs(v).sum()) for v in jax.tree.leaves(g["backbone"]))
    assert backbone_norm == 0.0


def test_registry_sndcgan():
    g, d = get_architecture("sndcgan", (32, 32, 3))
    assert g.image_size == (32, 32, 3)
    assert d.mlp_linear and d.d_hidden == 512


def test_registry_unknown():
    with pytest.raises(NotImplementedError):
        get_architecture("nope", (32, 32, 3))


def test_snresnet18(rng):
    from contrad_tpu.models.snresnet import DSnresnet18

    d = DSnresnet18(mlp_linear=True, d_hidden=64)
    x = jax.random.uniform(rng, (2, 32, 32, 3))
    variables = jax.jit(lambda r, xx: d.init(r, xx, train=True))(rng, x)
    (score, aux), _ = jax.jit(lambda v, xx: d.apply(
        v, xx, train=True, mutable=["spectral"]))(variables, x)
    assert score.shape == (2, 1)
    assert aux["penultimate"].shape == (2, 512)
    assert aux["projection"].shape == (2, 128)


def test_registry_snresnet18():
    g, d = get_architecture("snresnet18", (32, 32, 3))
    assert d.d_hidden == 1024 and d.mlp_linear


def test_conditional_heads(rng):
    """n_classes > 1: label-conditional GAN score via the embedding inner
    product (reference base.py:30-35,48-53)."""
    d = DSndcgan(IMG, ndf=8, n_classes=5, mlp_linear=True, d_hidden=32)
    x = jax.random.uniform(rng, (4,) + IMG)
    y = jnp.asarray([0, 1, 2, 3])
    variables = d.init(rng, x, y=y, train=True)
    (score_y, _), _ = d.apply(variables, x, y=y, train=True, mutable=["spectral"])
    (score_none, _), _ = d.apply(variables, x, train=True, mutable=["spectral"])
    assert score_y.shape == (4, 1)
    assert not np.allclose(np.asarray(score_y), np.asarray(score_none))
