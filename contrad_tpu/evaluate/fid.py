"""FID: Frechet Inception Distance (reference: ``third_party/fid/fid_score.py``,
``evaluate/gan.py:85-159``).

Structure kept from the reference protocol:
  * per-dataset reference stats precomputed once and cached to
    ``third_party/fid/<dataset>_stats.npz`` (``evaluate/gan.py:93-103``);
  * each update generates ``size`` samples in batches, embeds them with
    InceptionV3 pool3 (2048-d), and averages ``n_avg`` FID trials
    (``fid_score.py:115-158``, ``evaluate/gan.py:105-123``);
  * stable sqrtm with eps jitter on the covariance product
    (``fid_score.py:58-112``).

TPU design: the embedder is a jitted flax InceptionV3 forward (bilinear resize
to 299 + [-1,1] rescale fused in); only the 2048-d features come back to the
host, and the O(d^3) sqrtm runs in scipy (eval path, off the step). The
embedding function is injectable so tests (and weightless environments) can
use a cheap deterministic embedder.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np
from scipy import linalg

from contrad_tpu.utils.logger import append_csv

# Sampler: (n, rng_seed) -> float images (n, H, W, C) in [0, 1]
SamplerFn = Callable[[int, int], np.ndarray]
# Embedder: uint8/float images (n, H, W, C) -> features (n, d)
EmbedFn = Callable[[np.ndarray], np.ndarray]

STATS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "third_party", "fid")


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6):
    """|mu1-mu2|^2 + tr(S1 + S2 - 2 sqrt(S1 S2)) with the standard numerical
    guards (reference fid_score.py:58-112)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if isinstance(covmean, tuple):  # older scipy returned (sqrtm, errest)
        covmean = covmean[0]
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                f"sqrtm has large imaginary component: "
                f"{np.max(np.abs(covmean.imag))}")
        covmean = covmean.real

    return (diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
            - 2.0 * np.trace(covmean))


def compute_stats(features: np.ndarray):
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def compute_stats_from_sampler(sampler: SamplerFn, embed_fn: EmbedFn,
                               size: int, batch_size: int = 50, seed: int = 0):
    """Reference compute_stats_from_G (fid_score.py:115-158): sample in
    batches of 50 and embed."""
    feats = []
    remaining, i = size, 0
    while remaining > 0:
        n = min(batch_size, remaining)
        images = sampler(n, seed * 100003 + i)
        feats.append(np.asarray(embed_fn(images)))
        remaining -= n
        i += 1
    return compute_stats(np.concatenate(feats, axis=0)[:size])


def compute_stats_from_images(images: np.ndarray, embed_fn: EmbedFn,
                              batch_size: int = 50):
    feats = []
    for i in range(0, len(images), batch_size):
        feats.append(np.asarray(embed_fn(images[i : i + batch_size])))
    return compute_stats(np.concatenate(feats, axis=0))


def stats_path(dataset: str, stats_dir: Optional[str] = None) -> str:
    return os.path.join(stats_dir or STATS_DIR, f"{dataset}_stats.npz")


def precompute_stats(dataset: str, embed_fn: EmbedFn,
                     stats_dir: Optional[str] = None,
                     batch_size: int = 50) -> str:
    """Compute + cache the FID reference stats for a dataset's reference split
    (reference fid_score.py:207-217; split choice from datasets.py:129-164)."""
    from contrad_tpu.data import get_dataset_ref

    path = stats_path(dataset, stats_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    ref = get_dataset_ref(dataset)
    mu, sigma = compute_stats_from_images(ref.images, embed_fn, batch_size)
    np.savez(path, mu=mu, sigma=sigma)
    return path


def fid_score(sampler: SamplerFn, embed_fn: EmbedFn, ref_mu, ref_sigma,
              size: int, batch_size: int = 50, seed: int = 0) -> float:
    mu, sigma = compute_stats_from_sampler(sampler, embed_fn, size,
                                           batch_size, seed)
    return float(calculate_frechet_distance(mu, sigma, ref_mu, ref_sigma))


def moments_embed_fn(images: np.ndarray) -> np.ndarray:
    """Weights-free debug embedder (channel/spatial moment features).

    NOT a real FID metric — exists so the full in-training FID loop (stats
    caching, n_avg trials, best tracking, CSV, best-checkpoint gating) can run
    end-to-end in environments without the inception weights
    (``--fid_embed moments``). Scores are only comparable to themselves."""
    x = np.asarray(images, dtype=np.float64)
    if images.dtype == np.uint8:
        x = x / 255.0
    h = x.shape[1]
    q = max(h // 4, 1)
    feats = [x.mean(axis=(1, 2)), x.std(axis=(1, 2))]  # per-channel
    for i in range(0, h - q + 1, q):  # coarse 4x4 spatial grid means
        for j in range(0, x.shape[2] - q + 1, q):
            feats.append(x[:, i : i + q, j : j + q].mean(axis=(1, 2, 3))[:, None])
    return np.concatenate([f.reshape(len(x), -1) for f in feats], axis=1)


def get_embed_fn(name: str = "inception", mesh=None):
    """``mesh`` (inception only) shards the embedder forward over the data
    axis — n_dev× offline-scoring throughput; moments/torch are host-side."""
    if name == "inception":
        from contrad_tpu.evaluate.inception import get_inception_embed_fn

        return get_inception_embed_fn(mesh=mesh)
    if name == "torch_inception":
        # Independent second implementation (reference keeps a TF-1.x FID for
        # this role, third_party/tf/fid.py): torch net, torch loader, torch
        # preprocessing, CPU. Lives next to the stats in third_party/.
        from third_party.torch_fid import get_embed_fn as torch_embed

        return torch_embed()
    if name == "moments":
        return moments_embed_fn
    raise ValueError(f"unknown fid embedder: {name}")


class FIDScore:
    """In-training FID tracker (reference evaluate/gan.py:85-159): lazily
    precomputes reference stats, averages n_avg trials per update, tracks the
    best score, dumps a CSV with per-trial columns."""

    def __init__(self, dataset: str, size: int = 10000, n_avg: int = 3,
                 embed_fn: Optional[EmbedFn] = None,
                 stats_dir: Optional[str] = None, batch_size: int = 50,
                 embedder: str = "inception", precompute_ok: bool = True,
                 mesh=None):
        if embedder != "inception" and stats_dir is None:
            # never mix debug-embedder stats with real inception stats
            stats_dir = os.path.join(STATS_DIR, embedder)
        self.dataset = dataset
        self.size = size
        self.n_avg = n_avg
        self._embed_fn = embed_fn  # lazy: see the embed_fn property
        self.embedder = embedder
        self.batch_size = batch_size
        self._mesh = mesh  # shards the inception embedder when resolved

        path = stats_path(dataset, stats_dir)
        if not os.path.exists(path):
            if not precompute_ok:
                # Multi-host callers must not race the stats write (every
                # process would precompute + savez the same file).
                raise RuntimeError(
                    f"FID reference stats missing at {path}; precompute "
                    f"them once first: python tools/precalc_stats.py "
                    f"--dataset {dataset} --embed {embedder}")
            path = precompute_stats(dataset, self.embed_fn, stats_dir,
                                    batch_size)
        stats = np.load(path)
        self.ref_mu, self.ref_sigma = stats["mu"], stats["sigma"]

        self.history: list = []  # rows: [step, trial_0..trial_{n-1}, mean]
        self.best = float("inf")
        self.is_best = False

    @property
    def embed_fn(self) -> EmbedFn:
        """Host-side embedder, resolved on first use. The training CLIs drive
        :meth:`update` with the mesh-sharded ``feature_fn`` instead, so with
        cached reference stats the (second) ~100 MB inception load/convert
        this implies never happens."""
        if self._embed_fn is None:
            self._embed_fn = get_embed_fn(self.embedder, mesh=self._mesh)
        return self._embed_fn

    def update(self, step: int, sampler: Optional[SamplerFn] = None,
               feature_fn: Optional[Callable] = None) -> float:
        """One eval: ``n_avg`` FID trials. Provide EITHER ``sampler`` (host
        image path, batch-50 loop — reference protocol) or ``feature_fn``
        (``(n, seed) -> (n, d)`` features, e.g. the mesh-sharded fused
        sampler+embedder from evaluate/sharded.py)."""
        if (sampler is None) == (feature_fn is None):
            raise ValueError("pass exactly one of sampler / feature_fn")
        scores, diversity, meanshift = [], [], []
        for trial in range(self.n_avg):
            if feature_fn is not None:
                mu, sigma = compute_stats(
                    np.asarray(feature_fn(self.size, trial)))
            else:
                mu, sigma = compute_stats_from_sampler(
                    sampler, self.embed_fn, self.size, self.batch_size,
                    seed=trial)
            scores.append(float(calculate_frechet_distance(
                mu, sigma, self.ref_mu, self.ref_sigma)))
            # Learning-dynamics proxies (embedder-agnostic, so they work with
            # the weights-free 'moments' embedder too): feature-space
            # diversity ratio (mode collapse shows as << 1) and the mean
            # embedding drift — the two additive components of FID.
            diversity.append(
                float(np.trace(np.atleast_2d(sigma))
                      / max(np.trace(np.atleast_2d(self.ref_sigma)), 1e-12)))
            meanshift.append(float(np.linalg.norm(mu - self.ref_mu)))
        avg = float(np.mean(scores))
        self.last_diversity = float(np.mean(diversity))
        self.last_meanshift = float(np.mean(meanshift))
        self.history.append([step] + [float(s) for s in scores] + [avg])
        self.is_best = avg < self.best
        if self.is_best:
            self.best = avg
        return avg

    def save(self, path: str):
        header = (["step"] + [f"fid_{i}" for i in range(self.n_avg)] + ["mean"])
        if self.history:
            append_csv(path, header, self.history[-1])

    # Resume support: the reference loses FID history/best on --resume
    # (evaluate/gan.py:147-159 rebuilds fresh, so a post-restart eval can
    # overwrite ckpt/best with a worse score); this closes that gap.
    def state_dict(self) -> dict:
        hist = (np.asarray(self.history, dtype=np.float64)
                if self.history else np.zeros((0, self.n_avg + 2)))
        return {"history": hist, "best": np.float64(self.best),
                "embedder": np.str_(self.embedder), "size": np.int64(self.size)}

    def load_state_dict(self, state: dict) -> None:
        # A `best` is only meaningful under the embedder/fid_size that
        # produced it: resuming with a different --fid_embed (e.g. moments →
        # inception once real weights exist) or fid_size must NOT freeze the
        # ckpt/best gate at an incomparable number — start the gate fresh.
        # Sidecars predating the provenance fields are trusted as-is.
        emb = str(state.get("embedder", self.embedder))
        size = int(state.get("size", self.size))
        if emb != self.embedder or size != self.size:
            self.history, self.best, self.is_best = [], float("inf"), False
            return
        hist = np.asarray(state["history"], dtype=np.float64)
        # History rows are [step, fid_0..fid_{n_avg-1}, mean]; a resume with a
        # different --n_eval_avg would make the restored rows ragged against
        # new appends (and crash state_dict's asarray). Keep `best` — the
        # ckpt/best gate — and drop only the incompatible trajectory rows.
        if hist.ndim == 2 and hist.shape[1] == self.n_avg + 2:
            self.history = [list(map(float, row)) for row in hist]
        else:
            self.history = []
        self.best = float(state["best"])
        self.is_best = False
