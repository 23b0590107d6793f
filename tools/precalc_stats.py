#!/usr/bin/env python
"""Precompute FID reference statistics to a .npz file.

Counterpart of the reference's stat-precompute example scripts
(``/root/reference/third_party/tf/examples/precalc_stats_cifar10.py`` and
``precalc_stats_images.py``): either a registered dataset's reference split
or an arbitrary image directory -> ``{mu, sigma}`` .npz usable by
``test_fid_is.py`` / ``test_tf_inception.py`` / in-training FID.

Usage:
    python tools/precalc_stats.py --dataset cifar10 [--out PATH]
    python tools/precalc_stats.py --images <dir> --out stats.npz
    [--embed moments]   # weights-free debug embedder
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--dataset", help="registered dataset name (uses its FID "
                                     "reference split, e.g. cifar10 -> test)")
    g.add_argument("--images", help="directory of PNG/JPG images")
    p.add_argument("--out", default=None, help=".npz output path")
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--size", type=int, default=None,
                   help="cap the number of images")
    p.add_argument("--embed", default="inception",
                   choices=["inception", "moments"])
    args = p.parse_args()

    from contrad_tpu.evaluate.fid import (
        compute_stats_from_images,
        get_embed_fn,
        precompute_stats,
        stats_path,
    )

    from contrad_tpu.parallel import get_mesh

    mesh = get_mesh() if args.embed == "inception" else None
    embed_fn = get_embed_fn(args.embed, mesh=mesh)
    # Same segregation rule as FIDScore (fid.py:159-161): non-inception
    # embedders cache under <STATS_DIR>/<embed>/ so debug stats can never be
    # mistaken for real inception stats.
    stats_dir = None
    if args.embed != "inception":
        from contrad_tpu.evaluate.fid import STATS_DIR

        stats_dir = os.path.join(STATS_DIR, args.embed)

    if args.dataset:
        if args.out:
            from contrad_tpu.data import get_dataset_ref

            ref = get_dataset_ref(args.dataset)
            images = ref.images[: args.size] if args.size else ref.images
            mu, sigma = compute_stats_from_images(images, embed_fn,
                                                  args.batch_size)
            np.savez(args.out, mu=mu, sigma=sigma)
            path = args.out
        else:
            path = precompute_stats(args.dataset, embed_fn,
                                    stats_dir=stats_dir,
                                    batch_size=args.batch_size)
    else:
        from PIL import Image

        from contrad_tpu.data.folder import _list_images

        files = _list_images(args.images)
        if args.size:
            files = files[: args.size]
        if not files:
            raise FileNotFoundError(f"no images under {args.images}")
        first = np.asarray(Image.open(files[0]).convert("RGB"))
        images = np.zeros((len(files),) + first.shape, dtype=np.uint8)
        for i, f in enumerate(files):
            images[i] = np.asarray(Image.open(f).convert("RGB"),
                                   dtype=np.uint8)
        print(f"{len(files)} images from {args.images}")
        mu, sigma = compute_stats_from_images(images, embed_fn,
                                              args.batch_size)
        path = args.out or os.path.join(args.images.rstrip("/") + "_stats.npz")
        np.savez(path, mu=mu, sigma=sigma)

    print(f"Wrote {path}")


if __name__ == "__main__":
    main()
