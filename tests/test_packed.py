"""Parity tests for space-to-depth packed convolutions (ops/packed.py):
the packed conv must equal the plain conv exactly (same math, different
layout) for every kernel geometry the StyleGAN2-512 stem uses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrad_tpu.ops.packed import (
    depth_to_space,
    pack_conv_kernel,
    packed_conv,
    space_to_depth,
)


def _conv(x, w, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_s2d_roundtrip(np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    np.testing.assert_array_equal(depth_to_space(space_to_depth(x, 2), 2), x)
    np.testing.assert_array_equal(depth_to_space(space_to_depth(x, 4), 4), x)


def test_s2d_channel_convention(np_rng):
    """slot index (a_y*f + a_x)*C + c."""
    x = jnp.asarray(np_rng.normal(size=(1, 4, 4, 3)), jnp.float32)
    xp = space_to_depth(x, 2)
    for ay in range(2):
        for ax in range(2):
            slot = ay * 2 + ax
            np.testing.assert_array_equal(
                xp[0, :, :, slot * 3 : (slot + 1) * 3], x[0, ay::2, ax::2, :])


CASES = [
    # (k, stride, pad, f_in, f_out, ci, co)  — the stem geometries
    (1, 1, (0, 0), 2, 2, 3, 32),    # FromRGB
    (3, 1, (1, 1), 2, 2, 32, 32),   # block conv1
    (6, 2, (2, 2), 2, 1, 32, 64),   # blur-fused downsample conv2, unpack out
    (4, 2, (1, 1), 2, 1, 32, 64),   # blur-fused skip, unpack out
    (6, 2, (2, 2), 2, 2, 32, 64),   # conv2 packed-to-packed
    (4, 2, (1, 1), 2, 2, 32, 64),   # skip packed-to-packed
    (3, 1, (1, 1), 4, 4, 3, 16),    # f=4 packing
    (2, 2, (0, 0), 2, 1, 8, 8),     # 2x2 s2 unpack boundary
]


@pytest.mark.parametrize("k,stride,pad,f_in,f_out,ci,co", CASES)
def test_packed_conv_parity(np_rng, k, stride, pad, f_in, f_out, ci, co):
    H = 16
    x = jnp.asarray(np_rng.normal(size=(2, H, H, ci)), jnp.float32)
    w = jnp.asarray(np_rng.normal(size=(k, k, ci, co)) * 0.1, jnp.float32)

    ref = jax.lax.conv_general_dilated(
        x, w, (stride, stride), (pad, pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    out = packed_conv(space_to_depth(x, f_in), w, f_in, f_out, stride, pad)
    out = depth_to_space(out, f_out)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_conv_asymmetric_pad(np_rng):
    """The blur-composed convs use (ceil, floor) pads; exercise (2, 1)."""
    x = jnp.asarray(np_rng.normal(size=(1, 12, 12, 4)), jnp.float32)
    w = jnp.asarray(np_rng.normal(size=(5, 5, 4, 8)) * 0.1, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = depth_to_space(
        packed_conv(space_to_depth(x, 2), w, 2, 2, 2, (2, 1)), 2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pack_kernel_geometry():
    """Spot-check the derived (S, K, P) for the stem cases."""
    w = jnp.zeros((3, 3, 2, 2))
    _, S, (plo, phi) = pack_conv_kernel(w, 2, 2, 1, (1, 1))
    assert (S, plo, phi) == (1, 1, 1)  # K=3
    w = jnp.zeros((6, 6, 2, 2))
    _, S, (plo, phi) = pack_conv_kernel(w, 2, 1, 2, (2, 2))
    assert (S, plo) == (1, 1)
    w = jnp.zeros((1, 1, 2, 2))
    wp, S, (plo, phi) = pack_conv_kernel(w, 2, 2, 1, (0, 0))
    assert wp.shape == (1, 1, 8, 8) and S == 1 and plo == 0 and phi == 0


def test_packed_conv_gradients(np_rng):
    """Weight gradients agree between packed and plain formulations."""
    x = jnp.asarray(np_rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    w = jnp.asarray(np_rng.normal(size=(3, 3, 3, 4)) * 0.1, jnp.float32)

    def loss_plain(w):
        return jnp.sum(jnp.sin(_conv(x, w, 1, 1)))

    def loss_packed(w):
        y = packed_conv(space_to_depth(x, 2), w, 2, 2, 1, (1, 1))
        return jnp.sum(jnp.sin(depth_to_space(y, 2)))

    g1 = jax.grad(loss_plain)(w)
    g2 = jax.grad(loss_packed)(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_resblock_packed_parity(np_rng, rng):
    """Packed ResBlock == unpacked ResBlock with the SAME params (packing is
    a layout choice, invisible to the checkpoint)."""
    from contrad_tpu.models.stylegan2.discriminator import ResBlock

    x = jnp.asarray(np_rng.normal(size=(2, 16, 16, 8)), jnp.float32)
    block_u = ResBlock(16)
    block_p = ResBlock(16, pack_in=2, pack_out=1)
    params = block_u.init(rng, x)
    # identical param trees
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(block_p.init(rng,
                                                         space_to_depth(x, 2))))
    out_u = block_u.apply(params, x)
    out_p = block_p.apply(params, space_to_depth(x, 2))
    assert out_p.shape == out_u.shape  # both unpack at the downsample convs
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_u),
                               rtol=2e-4, atol=2e-5)


def test_backbone_pack_stem_parity(np_rng, rng, monkeypatch):
    """Full ResidualBackbone with pack_stem on vs off: same params, same
    features. Channel map patched so the packing condition (top level
    <= 32 ch) triggers at a test-sized resolution."""
    from contrad_tpu.models.stylegan2 import discriminator as D

    monkeypatch.setattr(D, "stylegan2_channels",
                        lambda cm, small32=False: {4: 64, 8: 48, 16: 32,
                                                   32: 32})
    x = jnp.asarray(np_rng.uniform(size=(2, 32, 32, 3)), jnp.float32)
    bb_off = D.ResidualBackbone(size=32, pack_stem=False)
    bb_on = D.ResidualBackbone(size=32, pack_stem=True)
    params = bb_off.init(rng, x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(bb_on.init(rng, x)))
    f_off = bb_off.apply(params, x)
    f_on = bb_on.apply(params, x)
    np.testing.assert_allclose(np.asarray(f_on), np.asarray(f_off),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("k,pad,l,f_out,ci,co", [
    (6, (3, 3), 2, 2, 8, 4),   # G fused upsample conv (blur-composed 6x6)
    (4, (3, 1), 2, 2, 3, 3),   # upfirdn-style asymmetric (even output)
    (3, (1, 1), 1, 1, 4, 4),   # degenerate: l=1 f=1 reduces to plain conv
])
def test_packed_lhs_dilated_parity(np_rng, k, pad, l, f_out, ci, co):
    """lhs-dilated (transpose-conv upsample) convs become dilation-free convs
    in the packed domain — the sub-pixel-convolution identity, generalized."""
    x = jnp.asarray(np_rng.normal(size=(2, 8, 8, ci)), jnp.float32)
    w = jnp.asarray(np_rng.normal(size=(k, k, ci, co)) * 0.1, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), (pad, pad), lhs_dilation=(l, l),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = depth_to_space(
        packed_conv(x, w, 1, f_out, 1, pad, lhs_dilation=l), f_out)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("h,c,f,k1", [
    (16, 3, 2, (1, 3, 3, 1)),   # the RGB skip upsample (Toeplitz path)
    (8, 5, 2, (1, 2, 1)),       # odd kernel
    (8, 3, 4, (1, 3, 3, 1)),    # f=4
])
def test_upsample2d_packed_matches_unpacked(np_rng, h, c, f, k1):
    """upsample2d_packed == space_to_depth(upsample2d(...)): the separable
    kernels take the static-Toeplitz einsum path; gradients flow through the
    same contraction."""
    from contrad_tpu.ops.packed import upsample2d_packed
    from contrad_tpu.ops.upfirdn2d import make_kernel, upsample2d

    kern = make_kernel(list(k1))
    x = jnp.asarray(np_rng.normal(size=(2, h, h, c)), jnp.float32)
    ref = space_to_depth(upsample2d(x, kern, f), f)
    got = upsample2d_packed(x, kern, f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    g_ref = jax.grad(
        lambda x: jnp.sum(jnp.sin(space_to_depth(upsample2d(x, kern, f), f))))(x)
    g_got = jax.grad(
        lambda x: jnp.sum(jnp.sin(upsample2d_packed(x, kern, f))))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_upsample2d_packed_nonseparable_fallback(np_rng):
    """Non-separable kernels fall back to the packed dense-diagonal conv."""
    from contrad_tpu.ops.packed import upsample2d_packed
    from contrad_tpu.ops.upfirdn2d import upsample2d

    kern = np.asarray(np_rng.uniform(0.1, 1.0, size=(4, 4)), np.float32)
    kern = kern / kern.sum()
    x = jnp.asarray(np_rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    ref = space_to_depth(upsample2d(x, jnp.asarray(kern), 2), 2)
    got = upsample2d_packed(x, kern, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_generator_pack_top_parity(np_rng, rng, monkeypatch):
    """GStylegan2 with pack_top on vs off: same params + same noise RNG ->
    identical images (packing is layout-only, sub-pixel conv identity on the
    upsample layer, packed noise drawn from the identical fine-res stream)."""
    from contrad_tpu.models.stylegan2 import generator as G

    monkeypatch.setattr(G, "stylegan2_channels",
                        lambda cm, small32=False: {4: 32, 8: 32, 16: 32})
    g_off = G.GStylegan2(size=16, style_dim=32, n_mlp=2, pack_top=False)
    g_on = G.GStylegan2(size=16, style_dim=32, n_mlp=2, pack_top=True)
    z = jnp.asarray(np_rng.normal(size=(2, 32)), jnp.float32)
    k1, k2 = jax.random.split(rng)
    params = g_off.init({"params": k1, "noise": k2}, z)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(
                g_on.init({"params": k1, "noise": k2}, z)))
    img_off = g_off.apply(params, z, train=True, style_mix=0.9,
                          rngs={"noise": k2})
    img_on = g_on.apply(params, z, train=True, style_mix=0.9,
                        rngs={"noise": k2})
    assert img_on.shape == img_off.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(img_on), np.asarray(img_off),
                               rtol=2e-4, atol=2e-5)
