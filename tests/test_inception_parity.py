"""Output-parity oracle for the flax FID InceptionV3.

The oracle is the from-scratch torch reimplementation of the pt-FID network
in ``third_party/torch_fid`` — the rebuild's runtime second FID
implementation (spec: /root/reference/third_party/fid/inception.py:131-157,
199-314 — the torchvision InceptionV3 topology with the FIDInceptionA/C/E
pooling quirks). Both sides get the same random weights through
``convert_torch_checkpoint``; pool3 features and logits must match at
299x299 and through the 32->299 bilinear resize. A bug in any pooling
variant, padding, BN eps, fc transpose, or the resize semantics breaks this
test. End-to-end engine agreement (loaders, batching, FID/IS numbers) is
covered separately in ``tests/test_torch_engine.py``.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as TF

import jax.numpy as jnp

from contrad_tpu.evaluate.inception import InceptionV3FID, convert_torch_checkpoint


# The torch oracle lives in third_party/torch_fid (the runtime second FID
# implementation); these parity tests certify the flax side against it.
from third_party.torch_fid.inception import InceptionV3FID as TInceptionV3FID


@pytest.fixture(scope="module")
def models():
    """Torch oracle with random (but BN-realistic) weights + the converted
    flax variables."""
    torch.manual_seed(0)
    tmodel = TInceptionV3FID().eval()
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for mod in tmodel.modules():
            if isinstance(mod, tnn.Conv2d):
                mod.weight.normal_(0.0, 0.05, generator=g)
            elif isinstance(mod, tnn.BatchNorm2d):
                mod.weight.uniform_(0.5, 1.5, generator=g)
                mod.bias.normal_(0.0, 0.1, generator=g)
                mod.running_mean.normal_(0.0, 0.1, generator=g)
                mod.running_var.uniform_(0.5, 1.5, generator=g)
            elif isinstance(mod, tnn.Linear):
                mod.weight.normal_(0.0, 0.02, generator=g)
                mod.bias.normal_(0.0, 0.1, generator=g)

    variables = convert_torch_checkpoint(tmodel.state_dict())
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    return tmodel, variables


def _both(models, x_np, resize):
    tmodel, variables = models
    with torch.no_grad():
        pool_t, logits_t = tmodel(
            torch.from_numpy(x_np.transpose(0, 3, 1, 2).copy()), resize=resize)
    pool_j, logits_j = InceptionV3FID().apply(
        variables, jnp.asarray(x_np), resize=resize)
    return (np.asarray(pool_j), pool_t.numpy(),
            np.asarray(logits_j), logits_t.numpy())


def test_pool3_and_logits_parity_299(models, np_rng):
    """Native 299x299 input: every pooling quirk/padding/BN-eps must match."""
    x = np_rng.uniform(0, 1, size=(2, 299, 299, 3)).astype(np.float32)
    pool_j, pool_t, logits_j, logits_t = _both(models, x, resize=False)
    np.testing.assert_allclose(pool_j, pool_t, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(logits_j, logits_t, rtol=1e-3, atol=1e-4)


def test_pool3_parity_through_resize(models, np_rng):
    """32->299 path: jax.image.resize(bilinear) must match torch
    F.interpolate(mode='bilinear', align_corners=False) — the FID input
    semantics (reference inception.py:131-157)."""
    x = np_rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32)
    pool_j, pool_t, _, _ = _both(models, x, resize=True)
    np.testing.assert_allclose(pool_j, pool_t, rtol=1e-3, atol=1e-4)


def test_resize_matches_torch_interpolate(np_rng):
    """The resize alone, at strict tolerance (isolates interpolation from
    network depth)."""
    import jax

    x = np_rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32)
    y_j = np.asarray(jax.image.resize(
        jnp.asarray(x), (2, 299, 299, 3), method="bilinear"))
    y_t = TF.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()),
                         size=(299, 299), mode="bilinear", align_corners=False)
    np.testing.assert_allclose(y_j, y_t.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-5, atol=1e-6)


# ------------------------------------------------ gated real-weights anchors

def _weights_path():
    import os

    from contrad_tpu.evaluate.inception import DEFAULT_WEIGHTS

    return os.environ.get("INCEPTION_WEIGHTS", DEFAULT_WEIGHTS)


def _have_cifar10():
    try:
        from contrad_tpu.data import get_dataset

        get_dataset("cifar10")
        return True
    except Exception:
        return False


@pytest.mark.skipif(not __import__("os").path.exists(_weights_path()),
                    reason="pt_inception weights not present (no egress)")
def test_real_weights_cifar10_train_vs_test_fid():
    """External-truth anchor: with the real pt_inception weights, FID between
    the CIFAR-10 train and test splits is a published constant (~3.15 for the
    pytorch-fid implementation; reference scores finals the same way via
    third_party/fid). Arms automatically the moment weights + data land."""
    if not _have_cifar10():
        pytest.skip("CIFAR-10 data not present")

    from contrad_tpu.data import get_dataset
    from contrad_tpu.evaluate.fid import (
        calculate_frechet_distance, compute_stats_from_images)
    from contrad_tpu.evaluate.inception import get_inception_embed_fn

    train, test, _ = get_dataset("cifar10")
    embed = get_inception_embed_fn()
    mu_tr, s_tr = compute_stats_from_images(train.images, embed, batch_size=100)
    mu_te, s_te = compute_stats_from_images(test.images, embed, batch_size=100)
    fid = calculate_frechet_distance(mu_tr, s_tr, mu_te, s_te)
    assert 2.5 < fid < 4.0, f"CIFAR-10 train-vs-test FID {fid} off the ~3.15 anchor"
