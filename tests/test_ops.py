"""Ops tests: spectral norm (vs exact SVD + torch semantics), grid_sample /
affine_grid (vs torch.nn.functional as an independent oracle), fused act."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from contrad_tpu.ops.fused_act import fused_leaky_relu
from contrad_tpu.ops.resample import affine_grid, affine_transform, grid_sample
from contrad_tpu.ops.spectral_norm import SNConv, SNDense


# ---------------------------------------------------------------- spectral norm

def test_sn_dense_converges_to_unit_sigma(rng, np_rng):
    """After many power iterations, the effective weight has sigma ~= 1."""
    layer = SNDense(16, use_bias=False)
    x = jnp.asarray(np_rng.normal(size=(4, 32)).astype(np.float32))
    variables = layer.init(rng, x, train=True)
    params, spectral = variables["params"], variables["spectral"]

    state = {"spectral": spectral}
    for _ in range(50):
        _, mut = layer.apply({"params": params, **state}, x, train=True,
                             mutable=["spectral"])
        state = mut

    y, _ = layer.apply({"params": params, **state}, x, train=True,
                       mutable=["spectral"])
    w = np.asarray(params["kernel"])  # (in, out)
    sigma = np.linalg.svd(w.T, compute_uv=False)[0]
    # y should equal x @ (w / sigma)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ (w / sigma),
                               rtol=1e-4, atol=1e-5)


def test_sn_state_updates_only_when_mutable(rng, np_rng):
    layer = SNDense(8, use_bias=False)
    x = jnp.asarray(np_rng.normal(size=(2, 8)).astype(np.float32))
    variables = layer.init(rng, x, train=True)
    u0 = np.asarray(variables["spectral"]["u"])

    # train=True with mutable -> u changes
    _, mut = layer.apply(variables, x, train=True, mutable=["spectral"])
    u1 = np.asarray(mut["spectral"]["u"])
    assert not np.allclose(u0, u1)

    # train=False -> u unchanged even if mutable
    _, mut2 = layer.apply(variables, x, train=False, mutable=["spectral"])
    u2 = np.asarray(mut2["spectral"]["u"])
    np.testing.assert_allclose(u0, u2)


def test_sn_conv_spectral_norm_bounded(rng, np_rng):
    """The 2-D reshaped conv kernel must have top singular value 1 after
    normalization (checked by power-iterating to convergence)."""
    layer = SNConv(8, (3, 3), kernel_init=jax.nn.initializers.normal(2.0))
    x = jnp.asarray(np_rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    variables = layer.init(rng, x, train=True)
    state = {"spectral": variables["spectral"]}
    for _ in range(100):
        _, state = layer.apply({"params": variables["params"], **state}, x,
                               train=True, mutable=["spectral"])
    w = np.asarray(variables["params"]["kernel"])  # HWIO
    w2d = np.moveaxis(w, -1, 0).reshape(w.shape[-1], -1)
    sigma = np.linalg.svd(w2d, compute_uv=False)[0]
    u = np.asarray(state["spectral"]["u"])
    # power iteration found the top singular direction
    est = np.linalg.norm(w2d.T @ u)
    np.testing.assert_allclose(est, sigma, rtol=1e-3)


# ---------------------------------------------------------------- resampling

def _torch_affine(images_nhwc, theta, mode, padding_mode):
    x = torch.from_numpy(np.transpose(images_nhwc, (0, 3, 1, 2)))
    t = torch.from_numpy(theta)
    grid = TF.affine_grid(t, x.shape, align_corners=False)
    y = TF.grid_sample(x, grid, mode=mode, padding_mode=padding_mode,
                       align_corners=False)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("padding", ["zeros", "border", "reflection"])
def test_affine_transform_matches_torch(mode, padding, np_rng):
    images = np_rng.uniform(size=(3, 16, 16, 2)).astype(np.float32)
    theta = np.stack([
        np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),   # identity
        np.array([[-1.0, 0.0, 0.25], [0.0, 1.0, -0.3]]),  # flip + shift
        np.array([[0.5, 0.1, 0.2], [-0.1, 0.7, 0.0]]),  # scale + shear
    ]).astype(np.float32)

    got = affine_transform(jnp.asarray(images), jnp.asarray(theta),
                           mode=mode, padding_mode=padding)
    want = _torch_affine(images, theta, mode, padding)
    if mode == "nearest":
        # Ties at exact half-pixels may round differently; compare off-tie pixels.
        agree = np.isclose(np.asarray(got), want, atol=1e-5).mean()
        assert agree > 0.97, f"nearest agreement too low: {agree}"
    else:
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_affine_grid_matches_torch(np_rng):
    theta = np_rng.normal(size=(2, 2, 3)).astype(np.float32)
    got = affine_grid(jnp.asarray(theta), 7, 5)
    want = TF.affine_grid(torch.from_numpy(theta), (2, 3, 7, 5),
                          align_corners=False).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_grid_sample_gradients(np_rng):
    images = jnp.asarray(np_rng.uniform(size=(2, 8, 8, 3)).astype(np.float32))
    theta = jnp.asarray(np.tile(np.array([[0.8, 0.0, 0.1], [0.0, 0.8, 0.0]],
                                         dtype=np.float32), (2, 1, 1)))
    g = jax.grad(lambda im: jnp.sum(affine_transform(im, theta) ** 2))(images)
    assert float(jnp.abs(g).sum()) > 0


# ---------------------------------------------------------------- fused act

def test_fused_leaky_relu(np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
    b = jnp.asarray(np_rng.normal(size=(8,)).astype(np.float32))
    got = fused_leaky_relu(x, b)
    ref = np.asarray(x) + np.asarray(b).reshape(1, 1, 1, 8)
    ref = np.where(ref >= 0, ref, 0.2 * ref) * np.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("padding", ["zeros", "border", "reflection"])
def test_axis_aligned_matches_general(mode, padding, np_rng):
    """The matmul-based axis-aligned warp must equal the (torch-verified)
    gather-based grid_sample for diagonal thetas."""
    from contrad_tpu.ops.resample import axis_aligned_transform

    n = 4
    images = jnp.asarray(np_rng.uniform(size=(n, 12, 16, 3)).astype(np.float32))
    sx = jnp.asarray(np_rng.uniform(0.4, 1.4, n).astype(np.float32))
    sy = jnp.asarray(np_rng.uniform(0.4, 1.4, n).astype(np.float32))
    bx = jnp.asarray(np_rng.uniform(-0.4, 0.4, n).astype(np.float32))
    by = jnp.asarray(np_rng.uniform(-0.4, 0.4, n).astype(np.float32))
    sx = sx.at[0].set(-1.0)  # include a mirror

    theta = jnp.zeros((n, 2, 3))
    theta = theta.at[:, 0, 0].set(sx).at[:, 1, 1].set(sy)
    theta = theta.at[:, 0, 2].set(bx).at[:, 1, 2].set(by)

    from contrad_tpu.ops.resample import affine_transform

    want = affine_transform(images, theta, mode=mode, padding_mode=padding)
    got = axis_aligned_transform(images, sx, sy, bx, by, mode=mode,
                                 padding_mode=padding)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_sn_matches_torch_semantics(np_rng):
    """Step-by-step parity with torch.nn.utils.spectral_norm: same W and u,
    same per-forward power-iteration update and normalized weight."""
    import torch.nn as tnn
    from torch.nn.utils import spectral_norm as torch_sn

    in_dim, out_dim = 12, 8
    w = np_rng.normal(size=(out_dim, in_dim)).astype(np.float32)

    lin = tnn.Linear(in_dim, out_dim, bias=False)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w))
    lin = torch_sn(lin)
    # align the initial u. NOTE .copy(): jnp.asarray zero-copies aligned numpy
    # on CPU, and torch updates weight_u IN PLACE each forward — without the
    # copy our u would silently alias torch's.
    u0 = np.asarray(lin.weight_u.detach()).copy()

    layer = SNDense(out_dim, use_bias=False)
    x = jnp.asarray(np_rng.normal(size=(3, in_dim)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x, train=True)
    variables = {
        "params": {"kernel": jnp.asarray(w.T)},
        "spectral": {"u": jnp.asarray(u0)},
    }

    state = {"spectral": variables["spectral"]}
    lin.train()
    for step in range(4):
        with torch.no_grad():
            y_t = lin(torch.from_numpy(np.asarray(x)))
        y_j, mut = layer.apply({"params": variables["params"], **state}, x,
                               train=True, mutable=["spectral"])
        np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(),
                                   rtol=2e-4, atol=1e-5,
                                   err_msg=f"mismatch at power-iter step {step}")
        state = mut
        np.testing.assert_allclose(np.asarray(state["spectral"]["u"]),
                                   np.asarray(lin.weight_u.detach()),
                                   rtol=2e-4, atol=1e-5)


def test_sn_u_init_distinct_across_layers(rng, np_rng):
    """Same-shaped SN layers must start power iteration from distinct u0
    (module-path-folded rng, not a shared PRNGKey(0))."""
    import flax.linen as nn

    class TwoDense(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            a = SNDense(8, use_bias=False)(x, train=train)
            b = SNDense(8, use_bias=False)(x, train=train)
            return a + b

    m = TwoDense()
    x = jnp.asarray(np_rng.normal(size=(2, 16)).astype(np.float32))
    variables = m.init(rng, x, train=True)
    us = [np.asarray(v["u"]) for v in variables["spectral"].values()]
    assert len(us) == 2
    assert not np.allclose(us[0], us[1])
