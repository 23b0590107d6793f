"""Output-parity oracle for the flax FID InceptionV3.

The environment has no torchvision and no pretrained weights, so the oracle is
a from-scratch torch reimplementation of the pt-FID network *inside this test*
(spec: /root/reference/third_party/fid/inception.py:131-157,199-314 — the
torchvision InceptionV3 topology with the FIDInceptionA/C/E pooling quirks).
Both sides get the same random weights through ``convert_torch_checkpoint``;
pool3 features and logits must match at 299x299 and through the 32->299
bilinear resize. A bug in any pooling variant, padding, BN eps, fc transpose,
or the resize semantics breaks this test.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as TF

import jax.numpy as jnp

from contrad_tpu.evaluate.inception import InceptionV3FID, convert_torch_checkpoint


# ---------------------------------------------------------------- torch oracle

class TBasicConv2d(tnn.Module):
    """torchvision BasicConv2d: conv(bias=False) + BN(eps=1e-3) + relu."""

    def __init__(self, in_ch, out_ch, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(in_ch, out_ch, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(out_ch, eps=0.001)

    def forward(self, x):
        return TF.relu(self.bn(self.conv(x)))


class TInceptionA(tnn.Module):
    """FIDInceptionA (reference inception.py:199-231): avg pool branch uses
    count_include_pad=False."""

    def __init__(self, in_ch, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv2d(in_ch, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv2d(in_ch, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = TF.avg_pool2d(x, kernel_size=3, stride=1, padding=1,
                           count_include_pad=False)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b5, bd, bp], 1)


class TInceptionB(tnn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3 = TBasicConv2d(in_ch, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = TF.max_pool2d(x, kernel_size=3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class TInceptionC(tnn.Module):
    """FIDInceptionC (reference inception.py:234-267)."""

    def __init__(self, in_ch, c7):
        super().__init__()
        self.branch1x1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TBasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TBasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = TF.avg_pool2d(x, kernel_size=3, stride=1, padding=1,
                           count_include_pad=False)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b7, bd, bp], 1)


class TInceptionD(tnn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3_1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        bp = TF.max_pool2d(x, kernel_size=3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class TInceptionE(tnn.Module):
    """FIDInceptionE_1 (avg, count_include_pad=False — inception.py:270-306) /
    FIDInceptionE_2 (MAX pool — inception.py:309-314, 'the pool branch uses
    max pooling' quirk of the TF graph)."""

    def __init__(self, in_ch, pool):
        super().__init__()
        self.pool = pool
        self.branch1x1 = TBasicConv2d(in_ch, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv2d(in_ch, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TBasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TBasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool == "avg":
            bp = TF.avg_pool2d(x, kernel_size=3, stride=1, padding=1,
                               count_include_pad=False)
        else:
            bp = TF.max_pool2d(x, kernel_size=3, stride=1, padding=1)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b3, bd, bp], 1)


class TInceptionV3FID(tnn.Module):
    """Full pt-FID InceptionV3 with checkpoint-compatible attribute names."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, "avg")
        self.Mixed_7c = TInceptionE(2048, "max")
        self.fc = tnn.Linear(2048, 1008)

    def forward(self, x, resize=False):
        # x: (N, 3, H, W) in [0, 1]
        if resize:
            x = TF.interpolate(x, size=(299, 299), mode="bilinear",
                               align_corners=False)
        x = 2 * x - 1
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = TF.max_pool2d(x, kernel_size=3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = TF.max_pool2d(x, kernel_size=3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        pool3 = TF.adaptive_avg_pool2d(x, (1, 1)).flatten(1)
        return pool3, self.fc(pool3)


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
