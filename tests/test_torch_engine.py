"""End-to-end agreement between the two FID/IS engines.

The reference certifies its final numbers with an independent second
implementation (TF-1.x TTUR FID, ``/root/reference/third_party/tf/fid.py``)
next to its pytorch-fid port. The rebuild's pair is the flax InceptionV3
(``contrad_tpu/evaluate/inception.py``) and the torch engine
(``third_party/torch_fid``). These tests exercise the FULL engine paths —
torch.save checkpoint -> each engine's own loader -> preprocessing ->
batched embedding -> FID / IS numbers — with shared random weights, so any
divergence in load paths, resize semantics, batching, or score math shows up
as a number mismatch, not just a tensor mismatch.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

from contrad_tpu.evaluate.fid import (
    calculate_frechet_distance,
    compute_stats_from_images,
    get_embed_fn,
)
from contrad_tpu.evaluate.inception_score import inception_score
from third_party.torch_fid import get_probs_fn
from third_party.torch_fid.inception import InceptionV3FID, load_model


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    """A random (BN-realistic) pt_inception-format checkpoint on disk."""
    torch.manual_seed(0)
    model = InceptionV3FID()
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for mod in model.modules():
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
    path = tmp_path_factory.mktemp("weights") / "pt_inception_random.pth"
    torch.save(model.state_dict(), str(path))
    return str(path)


@pytest.fixture(scope="module")
def engines(ckpt_path, monkeypatch_module):
    monkeypatch_module.setenv("INCEPTION_WEIGHTS", ckpt_path)
    return get_embed_fn("inception"), get_embed_fn("torch_inception")


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    yield mp
    mp.undo()


def _images(seed, n=12, size=32):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, size, size, 3), dtype=np.uint8)


def test_engines_agree_on_fid(engines):
    """Same images, same weights, both loaders: the two engines' FID numbers
    must agree. Features travel the full path (uint8 -> resize -> net ->
    pool3 -> stats -> sqrtm)."""
    flax_embed, torch_embed = engines
    set_a, set_b = _images(1), _images(2)

    fids = []
    for embed in (flax_embed, torch_embed):
        mu_a, s_a = compute_stats_from_images(set_a, embed, batch_size=6)
        mu_b, s_b = compute_stats_from_images(set_b, embed, batch_size=6)
        fids.append(float(calculate_frechet_distance(mu_a, s_a, mu_b, s_b)))
    # feature parity is ~1e-3 rel; sqrtm on 12-sample covariances amplifies,
    # so the engine-level tolerance is loose but still damning for any real
    # implementation divergence (pooling/resize bugs shift FID by >> 5%).
    assert fids[0] == pytest.approx(fids[1], rel=0.05), fids


def test_engines_agree_on_is(ckpt_path, monkeypatch):
    """Inception Score through each engine's own classifier path."""
    monkeypatch.setenv("INCEPTION_WEIGHTS", ckpt_path)
    from contrad_tpu.evaluate.inception import get_inception_logits_fn

    images = _images(3, n=12)
    is_flax = inception_score(images, probs_fn=get_inception_logits_fn(),
                              splits=3, batch_size=6)
    is_torch = inception_score(images, probs_fn=get_probs_fn(),
                               splits=3, batch_size=6)
    assert is_flax[0] == pytest.approx(is_torch[0], rel=1e-3)


def test_torch_loader_roundtrip(ckpt_path):
    """load_model goes through torch.load(weights_only=True) and strict
    load_state_dict: every checkpoint key must map onto the model 1:1."""
    model = load_model(ckpt_path)
    assert not model.training  # eval mode: BN uses running stats
    n_params = sum(p.numel() for p in model.parameters())
    assert n_params > 20_000_000  # the real InceptionV3 scale


def test_missing_weights_error_is_actionable():
    with pytest.raises(FileNotFoundError, match="INCEPTION_WEIGHTS"):
        load_model("/nonexistent/pt_inception.pth")
