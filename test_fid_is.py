#!/usr/bin/env python
"""Standalone FID / Inception Score over an image directory
(reference: ``test_tf_inception.py`` — the "official-fidelity" eval that
scores sampled images against precomputed dataset stats and writes a CSV).

The reference drives a frozen TF-1.x Inception graph; here the same
inception-2015-12-05 network runs as a jitted flax model on the TPU
(see ``contrad_tpu/evaluate/inception.py``; requires the pt_inception
weights file — no egress in the build environment).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="FID/IS over an image directory")
    p.add_argument("sample_dir", type=str, help="Directory of sampled PNGs")
    p.add_argument("--stats", type=str, default=None,
                   help="Path to reference stats .npz (mu, sigma)")
    p.add_argument("--dataset", type=str, default=None,
                   help="Dataset name to (pre)compute reference stats for")
    p.add_argument("--size", type=int, default=None,
                   help="Max images to score (default: all)")
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--splits", type=int, default=10)
    p.add_argument("--no_is", action="store_true", help="Skip Inception Score")
    p.add_argument("--out", type=str, default=None, help="CSV output path")
    p.add_argument("--embed", default="inception",
                   choices=["inception", "torch_inception", "moments"],
                   help="embedder; 'torch_inception' is the independent "
                        "second implementation (third_party/torch_fid), "
                        "'moments' the weights-free debug option")
    p.add_argument("--platform", default="auto", choices=["auto", "cpu"])
    return p.parse_args()


def main():
    P = parse_args()
    import jax

    if P.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from contrad_tpu.utils import enable_compile_cache

    enable_compile_cache()  # dedup programs across runs
    from contrad_tpu.data.folder import _list_images
    from contrad_tpu.evaluate.fid import (
        calculate_frechet_distance,
        compute_stats_from_images,
        precompute_stats,
        stats_path,
    )
    from contrad_tpu.evaluate.inception_score import inception_score
    from contrad_tpu.utils.logger import append_csv
    from PIL import Image

    files = _list_images(P.sample_dir)
    if P.size:
        files = files[: P.size]
    if not files:
        raise FileNotFoundError(f"no images under {P.sample_dir}")
    print(f"Scoring {len(files)} images from {P.sample_dir}")

    first = np.asarray(Image.open(files[0]).convert("RGB"))
    images = np.zeros((len(files),) + first.shape, dtype=np.uint8)
    for i, f in enumerate(files):
        images[i] = np.asarray(Image.open(f).convert("RGB"), dtype=np.uint8)

    from contrad_tpu.evaluate.fid import get_embed_fn
    from contrad_tpu.parallel import get_mesh

    # The inception networks shard over the data mesh (n_dev x throughput);
    # moments/torch embedders are host-side and ignore it. IS always uses
    # the flax inception classifier, so it needs the mesh even when the FID
    # embedder does not.
    mesh = get_mesh() if (P.embed == "inception" or not P.no_is) else None
    embed_fn = get_embed_fn(
        P.embed, mesh=mesh if P.embed == "inception" else None)

    if P.stats:
        stats = np.load(P.stats)
        ref_mu, ref_sigma = stats["mu"], stats["sigma"]
    elif P.dataset:
        path = stats_path(P.dataset)
        if not os.path.exists(path):
            path = precompute_stats(P.dataset, embed_fn,
                                    batch_size=P.batch_size)
        stats = np.load(path)
        ref_mu, ref_sigma = stats["mu"], stats["sigma"]
    else:
        raise ValueError("provide --stats or --dataset for the FID reference")

    mu, sigma = compute_stats_from_images(images, embed_fn, P.batch_size)
    fid = float(calculate_frechet_distance(mu, sigma, ref_mu, ref_sigma))
    print(f"FID: {fid:.4f}")

    is_mean = is_std = float("nan")
    if not P.no_is:
        is_mean, is_std = inception_score(images, splits=P.splits,
                                          batch_size=P.batch_size, mesh=mesh)
        print(f"IS: {is_mean:.4f} +- {is_std:.4f}")

    out = P.out or os.path.join(P.sample_dir, "fid_is.csv")
    append_csv(out, ["n_images", "fid", "is_mean", "is_std"],
               [len(files), fid, is_mean, is_std])
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
