"""StyleGAN2 stack tests: upfirdn2d vs a naive oracle, the MXU-reformulated
modulated conv vs a naive per-sample implementation, minibatch-stddev, model
shapes, and the StyleGAN2 trainer (EMA + lazy R1) on the 8-device mesh."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrad_tpu.ops.upfirdn2d import (
    blur2d,
    downsample2d,
    make_kernel,
    upfirdn2d,
    upsample2d,
)


# ------------------------------------------------------------ upfirdn2d

def _naive_upfirdn2d(x, kernel, up, down, pad):
    """Straight-from-definition numpy oracle: zero-insert, pad, correlate,
    downsample. x: (N, H, W, C)."""
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad
    # upsample by zero insertion
    up_x = np.zeros((n, h * up, w * up, c), dtype=x.dtype)
    up_x[:, ::up, ::up, :] = x
    # pad (negative pad crops)
    ph, pw = h * up + pad0 + pad1, w * up + pad0 + pad1
    padded = np.zeros((n, ph, pw, c), dtype=x.dtype)
    src = up_x[:, max(-pad0, 0): up_x.shape[1] - max(-pad1, 0),
               max(-pad0, 0): up_x.shape[2] - max(-pad1, 0), :]
    padded[:, max(pad0, 0): max(pad0, 0) + src.shape[1],
           max(pad0, 0): max(pad0, 0) + src.shape[2], :] = src
    # correlate
    oh = (ph - kh) + 1
    ow = (pw - kw) + 1
    out = np.zeros((n, oh, ow, c), dtype=np.float64)
    for i in range(kh):
        for j in range(kw):
            out += kernel[i, j] * padded[:, i:i + oh, j:j + ow, :]
    return out[:, ::down, ::down, :].astype(np.float32)


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (1, 2)), (2, 1, (2, 1)), (1, 2, (1, 1)), (2, 2, (3, 2)),
])
def test_upfirdn2d_matches_naive(up, down, pad, np_rng):
    x = np_rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    kernel = np.asarray(make_kernel([1, 3, 3, 1]))
    got = upfirdn2d(jnp.asarray(x), jnp.asarray(kernel), up=up, down=down, pad=pad)
    want = _naive_upfirdn2d(x, kernel, up, down, pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_upfirdn2d_nonseparable_kernel(np_rng):
    x = np_rng.normal(size=(1, 6, 6, 2)).astype(np.float32)
    kernel = np_rng.normal(size=(3, 3)).astype(np.float32)  # full-rank
    got = upfirdn2d(jnp.asarray(x), jnp.asarray(kernel), up=1, down=1, pad=(1, 1))
    want = _naive_upfirdn2d(x, kernel, 1, 1, (1, 1))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_up_down_sample_shapes(np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    k = make_kernel([1, 3, 3, 1])
    assert upsample2d(x, k).shape == (2, 16, 16, 4)
    assert downsample2d(x, k).shape == (2, 4, 4, 4)


def test_upfirdn2d_double_backward(np_rng):
    """R1 exercises grad-of-grad through the blur chain (SURVEY hard-part #2)."""
    x = jnp.asarray(np_rng.normal(size=(2, 8, 8, 2)).astype(np.float32))
    k = make_kernel([1, 3, 3, 1])

    def inner(xx):
        y = blur2d(xx, k, (2, 1))
        g = jax.grad(lambda a: jnp.sum(jnp.tanh(blur2d(a, k, (2, 1))) ** 2))(xx)
        return jnp.sum(g**2) + jnp.sum(y)

    gg = jax.grad(inner)(x)
    assert np.isfinite(np.asarray(gg)).all()


# ------------------------------------------------------------ modulated conv

def _naive_modulated_conv(x, weight, style_out, demodulate, upsample, scale):
    """Per-sample grouped-conv oracle mirroring the reference formulation
    (generator.py:56-82): materialize w[b] = scale*W*style[b] (+demod), run
    one conv per sample."""
    n = x.shape[0]
    outs = []
    for b in range(n):
        w = scale * np.asarray(weight) * np.asarray(style_out)[b][None, None, :, None]
        if demodulate:
            demod = 1.0 / np.sqrt((w**2).sum(axis=(0, 1, 2)) + 1e-8)
            w = w * demod[None, None, None, :]
        xb = jnp.asarray(x[b:b + 1])
        if upsample:
            y = jax.lax.conv_transpose(
                xb, jnp.asarray(w), strides=(2, 2), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            k = w.shape[0]
            y = jax.lax.conv_general_dilated(
                xb, jnp.asarray(w), (1, 1),
                padding=((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        outs.append(np.asarray(y[0]))
    return np.stack(outs)


@pytest.mark.parametrize("demodulate,upsample", [
    (True, False), (False, False), (True, True),
])
def test_modulated_conv_matches_per_sample(demodulate, upsample, rng, np_rng):
    """The modulate-in/demodulate-out reformulation must equal the reference's
    per-sample grouped conv exactly."""
    from contrad_tpu.models.stylegan2.generator import ModulatedConv

    n, h, w, cin, cout, k = 3, 8, 8, 4, 6, 3
    x = np_rng.normal(size=(n, h, w, cin)).astype(np.float32)
    style = np_rng.normal(size=(n, 16)).astype(np.float32)

    conv = ModulatedConv(cout, k, demodulate=demodulate, upsample=upsample)
    variables = conv.init(rng, jnp.asarray(x), jnp.asarray(style))
    got = conv.apply(variables, jnp.asarray(x), jnp.asarray(style))

    # recover the modulation output style_out = EqualDense(style)
    mod_w = np.asarray(variables["params"]["modulation"]["weight"])
    mod_b = np.asarray(variables["params"]["modulation"]["bias"])
    style_out = style @ (mod_w / math.sqrt(mod_w.shape[0])) + (mod_b + 1.0)
    weight = variables["params"]["weight"]
    scale = 1.0 / math.sqrt(cin * k * k)

    if upsample:
        # compare pre-blur: rerun the naive path + the same blur
        from contrad_tpu.ops.upfirdn2d import blur2d, make_kernel

        naive = _naive_modulated_conv(x, weight, style_out, demodulate, True, scale)
        p = (4 - 2) - (k - 1)
        pad = ((p + 1) // 2 + 1, p // 2 + 1)
        naive = np.asarray(blur2d(jnp.asarray(naive), make_kernel((1, 3, 3, 1)) * 4, pad))
    else:
        naive = _naive_modulated_conv(x, weight, style_out, demodulate, False, scale)

    np.testing.assert_allclose(np.asarray(got), naive, rtol=2e-3, atol=2e-4)


# ------------------------------------------------------------ discriminator

def test_minibatch_stddev(np_rng):
    from contrad_tpu.models.stylegan2.discriminator import minibatch_stddev

    x = jnp.asarray(np_rng.normal(size=(8, 4, 4, 6)).astype(np.float32))
    y = minibatch_stddev(x)
    assert y.shape == (8, 4, 4, 7)
    yn = np.asarray(y)
    # first 4 samples share one stddev value, last 4 another
    assert np.allclose(yn[0, ..., -1], yn[3, ..., -1])
    assert np.allclose(yn[4, ..., -1], yn[7, ..., -1])
    assert not np.allclose(yn[0, ..., -1], yn[4, ..., -1])
    # hand-check the value for the first contiguous group
    xa = np.asarray(x[:4])
    want = np.sqrt(xa.var(axis=0) + 1e-8).mean()
    np.testing.assert_allclose(yn[0, 0, 0, -1], want, rtol=1e-5)


def test_generator_shapes(rng):
    from contrad_tpu.models.stylegan2 import GStylegan2

    # real small32 widths on purpose: certifies the registry model's shapes
    g = GStylegan2(size=32, n_mlp=2, small32=True)
    z = g.sample_latent(rng, 1)
    assert z.shape == (1, 512)
    variables = jax.jit(lambda r, zz: g.init({"params": r, "noise": r}, zz,
                                             train=True))(rng, z)
    apply_t = jax.jit(lambda v, zz, r: g.apply(v, zz, train=True,
                                               rngs={"noise": r}))
    out = apply_t(variables, z, rng)
    assert out.shape == (1, 32, 32, 3)
    out_eval = jax.jit(lambda v, zz, r: g.apply(v, zz, train=False,
                                                rngs={"noise": r}))(
        variables, z, rng)
    assert float(out_eval.min()) >= 0.0 and float(out_eval.max()) <= 1.0


def test_generator_style_mixing_changes_output(rng, monkeypatch):
    import contrad_tpu.models.stylegan2.generator as gmod
    from contrad_tpu.models.stylegan2 import GStylegan2

    # width-independent property; tiny channels (the full map is 512-wide at
    # low res regardless of channel_multiplier, ~13 s of CPU execution)
    monkeypatch.setattr(gmod, "stylegan2_channels",
                        lambda *a, **k: {4: 16, 8: 16, 16: 16, 32: 16})
    g = GStylegan2(size=16, n_mlp=2, small32=False, channel_multiplier=0.25)
    z = g.sample_latent(rng, 4)
    variables = g.init({"params": rng, "noise": rng}, z, train=True)
    noise = [jnp.zeros((4, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2), 1))
             for i in range(g.num_layers)]
    out_nomix = g.apply(variables, z, train=True, style_mix=0.0, noise=noise,
                        rngs={"noise": rng})
    out_mix = g.apply(variables, z, train=True, style_mix=1.0, noise=noise,
                      rngs={"noise": rng})
    assert not np.allclose(np.asarray(out_nomix), np.asarray(out_mix))


def test_discriminator_protocol(rng):
    from contrad_tpu.models.stylegan2 import DStylegan2

    # real small32 widths on purpose: certifies the registry penultimate dim
    d = DStylegan2(size=32, small32=True, mlp_linear=True, d_hidden=64)
    x = jax.random.uniform(rng, (4, 32, 32, 3))
    variables = jax.jit(lambda r, xx: d.init(r, xx, train=True))(rng, x)
    score, aux = jax.jit(lambda v, xx: d.apply(v, xx, train=True))(variables, x)
    assert score.shape == (4, 1)
    assert aux["penultimate"].shape == (4, 512 * 4 * 4)
    assert "spectral" not in variables  # no SN in StyleGAN2 D


def test_plain_and_skip_discriminators(rng, monkeypatch):
    import contrad_tpu.models.stylegan2.discriminator as dmod
    from contrad_tpu.models.stylegan2 import ResidualDiscriminator, SkipDiscriminator

    # shape-only coverage of the two non-registry variants; width-independent
    monkeypatch.setattr(dmod, "stylegan2_channels",
                        lambda *a, **k: {4: 16, 8: 16, 16: 16, 32: 16})
    x = jax.random.uniform(rng, (4, 32, 32, 3))
    for cls in (ResidualDiscriminator, SkipDiscriminator):
        d = cls(size=32, small32=True)
        variables = jax.jit(lambda r, xx: d.init(r, xx, train=True))(rng, x)
        out = jax.jit(lambda v, xx: d.apply(v, xx, train=True))(variables, x)
        assert out.shape == (4, 1), cls.__name__


def test_registry_stylegan2():
    from contrad_tpu.models import get_architecture

    g, d = get_architecture("stylegan2", (32, 32, 3))
    assert g.small32 and d.d_hidden == 512
    g512, d512 = get_architecture("stylegan2_512", (64, 64, 3))
    assert g512.channel_multiplier == 1.0


# ------------------------------------------------------------ trainer

def test_stylegan2_trainer_step_with_r1(devices, monkeypatch):
    import contrad_tpu.models.stylegan2.discriminator as dmod
    import contrad_tpu.models.stylegan2.generator as gmod
    from contrad_tpu.augment import get_augment
    from contrad_tpu.models.stylegan2 import DStylegan2, GStylegan2
    from contrad_tpu.training.state import create_train_state, make_optimizer
    from contrad_tpu.training.step import StyleGAN2Trainer
    from contrad_tpu.parallel.mesh import get_mesh

    # channel_multiplier only shrinks the high-res levels; the <=32px levels
    # of the full map are 512-wide regardless, which makes this step ~2 min
    # of pure CPU execution. Shrink the whole map — the R1/lazy-reg/EMA/style
    # -mix control flow being certified is width-independent.
    tiny = {4: 16, 8: 16, 16: 16, 32: 16}
    monkeypatch.setattr(gmod, "stylegan2_channels", lambda *a, **k: dict(tiny))
    monkeypatch.setattr(dmod, "stylegan2_channels", lambda *a, **k: dict(tiny))

    size = 16
    g = GStylegan2(size=size, n_mlp=2, small32=False, channel_multiplier=0.25)
    d = DStylegan2(size=size, small32=False, channel_multiplier=0.25,
                   mlp_linear=True, d_hidden=32)
    g_opt = make_optimizer(2e-3, (0.0, 0.99))
    d_opt = make_optimizer(2e-3, (0.0, 0.99))
    trainer = StyleGAN2Trainer(
        g, d, mode="std", augment_fn=get_augment("hflip"),
        g_optimizer=g_opt, d_optimizer=d_opt, loss_type="nonsat",
        lbd_r1=0.1, d_reg_every=4, style_mix=0.9, mesh=get_mesh())
    state = create_train_state(jax.random.PRNGKey(0), g, d, (size, size, 3),
                               g_opt, d_opt, ema=True)
    state = trainer.place_state(state)
    images = trainer.place_batch(
        jax.random.uniform(jax.random.PRNGKey(1), (8, size, size, 3)))

    # step 1: no R1; step 2: with R1 (the lazy-reg variant)
    state, m1 = trainer.train_step(state, images, ema_decay=0.0, do_r1=False)
    assert float(m1["D_r1"]) == 0.0
    state, m2 = trainer.train_step(state, images, ema_decay=0.999, do_r1=True)
    assert float(m2["D_r1"]) > 0.0
    assert int(state.step) == 2
    for k, v in m2.items():
        assert np.isfinite(float(v)), k


def test_stylegan2_multi_step_block_matches_sequential(devices, monkeypatch):
    """StyleGAN2Trainer.train_steps_indexed (K steps in one jitted scan, with
    the lazy-R1 cadence as a traced lax.cond INSIDE the program) must match K
    sequential train_step_indexed calls with the same indices, EMA decays,
    and R1 flags."""
    import contrad_tpu.models.stylegan2.discriminator as dmod
    import contrad_tpu.models.stylegan2.generator as gmod
    from contrad_tpu.augment import get_augment
    from contrad_tpu.data.core import ArrayDataset, DeviceBatchIterator
    from contrad_tpu.models.stylegan2 import DStylegan2, GStylegan2
    from contrad_tpu.parallel.mesh import get_mesh
    from contrad_tpu.training.state import create_train_state, make_optimizer
    from contrad_tpu.training.step import StyleGAN2Trainer

    tiny = {4: 16, 8: 16, 16: 16, 32: 16}
    monkeypatch.setattr(gmod, "stylegan2_channels", lambda *a, **k: dict(tiny))
    monkeypatch.setattr(dmod, "stylegan2_channels", lambda *a, **k: dict(tiny))

    size, k = 16, 3
    rng = np.random.default_rng(9)
    ds = ArrayDataset(rng.integers(0, 256, size=(64, size, size, 3),
                                   dtype=np.uint8), np.arange(64))
    it = DeviceBatchIterator(ds, batch_size=8, mesh=get_mesh(devices), seed=4)
    idx_block = np.stack([it.next_indices()[0] for _ in range(k)])
    ema = np.array([0.0, 0.99, 0.99], np.float32)
    r1 = np.array([False, True, False])  # mid-block R1: the cond must fire

    def make():
        g = GStylegan2(size=size, n_mlp=2, small32=False,
                       channel_multiplier=0.25)
        d = DStylegan2(size=size, small32=False, channel_multiplier=0.25,
                       mlp_linear=True, d_hidden=32)
        g_opt = make_optimizer(2e-3, (0.0, 0.99))
        d_opt = make_optimizer(2e-3, (0.0, 0.99))
        tr = StyleGAN2Trainer(
            g, d, mode="std", augment_fn=get_augment("hflip"),
            g_optimizer=g_opt, d_optimizer=d_opt, loss_type="nonsat",
            lbd_r1=0.1, d_reg_every=4, style_mix=0.9, mesh=get_mesh(devices))
        st = tr.place_state(create_train_state(
            jax.random.PRNGKey(0), g, d, (size, size, 3), g_opt, d_opt,
            ema=True))
        return tr, st

    tr_a, st_a = make()
    for i in range(k):
        st_a, m_a = tr_a.train_step_indexed(
            st_a, it.images, idx_block[i], ema_decay=float(ema[i]),
            do_r1=bool(r1[i]))

    tr_b, st_b = make()
    st_b, m_b = tr_b.train_steps_indexed(
        st_b, it.images, idx_block, ema_decay=ema, do_r1=r1)

    assert int(st_b.step) == k
    for key in m_a:
        np.testing.assert_allclose(float(m_a[key]), float(m_b[key]),
                                   rtol=1e-5, atol=1e-6, err_msg=key)
    for leaf_a, leaf_b in zip(jax.tree.leaves(st_a.g_ema_params),
                              jax.tree.leaves(st_b.g_ema_params)):
        np.testing.assert_allclose(np.asarray(leaf_a), np.asarray(leaf_b),
                                   rtol=1e-5, atol=1e-6)


def test_stylegan2_sharded_matches_single_device(devices, monkeypatch):
    """StyleGAN2Trainer 1-vs-8-device equivalence oracle (the SNDCGAN twin is
    tests/test_step.py::test_sharded_matches_single_device): the FULL lazy-R1
    step — grad-of-grad R1 on augmented reals, EMA accumulate, style mixing,
    minibatch-stddev over the global batch — with the space-to-depth packed
    G-top and D-stem FORCED ON (channel map shrunk so the <=64/<=32 lane
    gates fire at 16^2), must produce identical metrics and D params on 1 and
    8 devices. Certifies the packed paths' collective behavior, not just
    shapes. Reference step semantics: train_stylegan2.py:147-229."""
    import contrad_tpu.models.stylegan2.discriminator as dmod
    import contrad_tpu.models.stylegan2.generator as gmod
    from contrad_tpu.augment import get_augment
    from contrad_tpu.models.stylegan2 import DStylegan2, GStylegan2
    from contrad_tpu.parallel.mesh import get_mesh
    from contrad_tpu.training.state import create_train_state, make_optimizer
    from contrad_tpu.training.step import StyleGAN2Trainer

    tiny = {4: 16, 8: 16, 16: 16, 32: 16}
    monkeypatch.setattr(gmod, "stylegan2_channels", lambda *a, **k: dict(tiny))
    monkeypatch.setattr(dmod, "stylegan2_channels", lambda *a, **k: dict(tiny))

    size = 16
    # the lane gates the monkeypatch is meant to fire (generator.py:296-298,
    # discriminator.py:104-105); packing leaves the param tree unchanged, so
    # certify engagement through the gate conditions themselves
    assert dmod.stylegan2_channels(2.0, False)[size] <= 32
    assert gmod.stylegan2_channels(2.0, False)[size] <= 64
    metrics_by_n = {}
    d_params_by_n = {}
    for n_dev in (1, 8):
        g = GStylegan2(size=size, n_mlp=2)
        d = DStylegan2(size=size, mlp_linear=True, d_hidden=32)
        g_opt = make_optimizer(2e-3, (0.0, 0.99))
        d_opt = make_optimizer(2e-3, (0.0, 0.99))
        trainer = StyleGAN2Trainer(
            g, d, mode="contrad", augment_fn=get_augment("none"),
            g_optimizer=g_opt, d_optimizer=d_opt, loss_type="nonsat",
            temp=0.1, lbd_a=1.0, lbd_r1=0.1, d_reg_every=4, style_mix=0.9,
            mesh=get_mesh(devices[:n_dev]))
        state = create_train_state(jax.random.PRNGKey(0), g, d,
                                   (size, size, 3), g_opt, d_opt, ema=True)
        state = trainer.place_state(state)
        images = trainer.place_batch(
            jax.random.uniform(jax.random.PRNGKey(1), (8, size, size, 3)))
        state, metrics = trainer.train_step(state, images, ema_decay=0.999,
                                            do_r1=True)
        assert float(metrics["D_r1"]) > 0.0  # the R1 branch actually ran
        metrics_by_n[n_dev] = {k: float(v) for k, v in metrics.items()}
        d_params_by_n[n_dev] = jax.device_get(state.d_params)

    for k in metrics_by_n[1]:
        np.testing.assert_allclose(
            metrics_by_n[1][k], metrics_by_n[8][k], rtol=2e-4, atol=1e-5,
            err_msg=f"metric {k} diverges between 1 and 8 devices")
    for a, b in zip(jax.tree.leaves(d_params_by_n[1]),
                    jax.tree.leaves(d_params_by_n[8])):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


def test_pallas_blur_matches_xla(np_rng):
    """The Pallas fused blur (interpreter mode on CPU) must match the XLA
    composite (tools/pallas_blur_bench.py measures the on-chip choice)."""
    from jax.experimental.pallas import tpu as pltpu

    from contrad_tpu.ops.pallas_blur import pallas_blur2d

    x = jnp.asarray(np_rng.normal(size=(2, 19, 13, 128)).astype(np.float32))
    k = make_kernel([1, 3, 3, 1])
    with pltpu.force_tpu_interpret_mode():
        got = pallas_blur2d(x, k, (2, 2), tile_h=8)
    want = blur2d(x, k, (2, 2))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_blur_rejects_unaligned_channels(np_rng):
    from contrad_tpu.ops.pallas_blur import pallas_blur2d

    x = jnp.zeros((2, 8, 8, 32))
    with pytest.raises(ValueError):
        pallas_blur2d(x, make_kernel([1, 3, 3, 1]), (2, 2))


def test_convlayer_fused_blur_matches_unfused(rng, np_rng):
    """Folding the anti-alias blur into the strided conv (compose_blur_kernel)
    must be numerically identical to Blur -> EqualConv."""
    from contrad_tpu.models.stylegan2.layers import ConvLayer

    x = jnp.asarray(np_rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    fused = ConvLayer(12, 3, downsample=True, activate=False, fuse_blur=True)
    plain = ConvLayer(12, 3, downsample=True, activate=False, fuse_blur=False)
    variables = fused.init(rng, x)
    y_f = fused.apply(variables, x)
    y_p = plain.apply(variables, x)
    assert y_f.shape == (2, 8, 8, 12)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_p),
                               rtol=1e-5, atol=1e-5)
    # 1x1 skip-path kernel too
    fused1 = ConvLayer(12, 1, downsample=True, activate=False, fuse_blur=True)
    plain1 = ConvLayer(12, 1, downsample=True, activate=False, fuse_blur=False)
    v1 = fused1.init(rng, x)
    np.testing.assert_allclose(np.asarray(fused1.apply(v1, x)),
                               np.asarray(plain1.apply(v1, x)),
                               rtol=1e-5, atol=1e-5)


def test_modulated_conv_fused_blur_matches_unfused(rng, np_rng):
    """Upsample path: lhs-dilated conv with composed kernel must equal
    conv_transpose -> blur (demodulated)."""
    from contrad_tpu.models.stylegan2.generator import ModulatedConv

    x = jnp.asarray(np_rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    style = jnp.asarray(np_rng.normal(size=(2, 32)).astype(np.float32))
    fused = ModulatedConv(12, 3, upsample=True, fuse_blur=True)
    plain = ModulatedConv(12, 3, upsample=True, fuse_blur=False)
    variables = fused.init(rng, x, style)
    y_f = fused.apply(variables, x, style)
    y_p = plain.apply(variables, x, style)
    assert y_f.shape == (2, 16, 16, 12)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_p),
                               rtol=1e-4, atol=1e-5)
