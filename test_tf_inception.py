#!/usr/bin/env python
"""Drop-in CLI alias for the reference's ``test_tf_inception.py``
(reference: ``/root/reference/test_tf_inception.py:13-27`` — "official
fidelity" FID/IS over an image directory against precomputed .npz stats).

The reference keeps a second, TF-1.x frozen-graph Inception implementation
purely as a fidelity oracle for final numbers. The rebuild's counterpart is
the torch engine in ``third_party/torch_fid`` — its own loader,
preprocessing, and CPU forward, independent of the flax InceptionV3
(``contrad_tpu/evaluate/inception.py``) — selected here with
``--embed torch_inception``. Cross-engine FID/IS agreement is tested
(``tests/test_torch_engine.py``), block-level output parity too
(``tests/test_inception_parity.py``), and a real-weights CIFAR-10
train-vs-test anchor (~3.15) arms automatically when weights are present.
This alias preserves the reference's exact CLI surface (positional
``images stats``, ``--n_imgs``, ``--batch_size``) and its CSV-style log
output, delegating to the same scoring stack as ``test_fid_is.py``.
"""

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(
        description="Testing script: FID / IS (reference test_tf_inception.py CLI)")
    p.add_argument("images", type=str,
                   help="Path to the directory of generated images")
    p.add_argument("stats", type=str,
                   help="Path to precomputed .npz statistics")
    p.add_argument("--n_imgs", type=int, default=10000,
                   help="Number of images used to calculate the distances")
    p.add_argument("--batch_size", type=int, default=500)
    p.add_argument("--gpu", type=str, default="",
                   help="Accepted for CLI parity; device selection is "
                        "automatic under JAX")
    p.add_argument("--inception_dir", type=str, default=None,
                   help="Directory containing the inception weights "
                        "(pt_inception-2015-12-05-*.pth); default: "
                        "$INCEPTION_WEIGHTS")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--embed", default="inception",
                   choices=["inception", "torch_inception", "moments"],
                   help="Embedder: 'inception' = the flax InceptionV3, "
                        "'torch_inception' = the independent torch second "
                        "implementation (third_party/torch_fid — the "
                        "reference's TF-1.x fidelity-oracle role), "
                        "'moments' = weights-free debug path")
    return p.parse_args()


def main():
    P = parse_args()
    from contrad_tpu.data.folder import _list_images
    from contrad_tpu.evaluate.fid import (
        calculate_frechet_distance,
        compute_stats_from_images,
        get_embed_fn,
    )
    from contrad_tpu.evaluate.inception_score import inception_score
    from PIL import Image

    if P.inception_dir:
        for f in sorted(os.listdir(P.inception_dir)):
            if f.endswith(".pth"):
                os.environ["INCEPTION_WEIGHTS"] = os.path.join(P.inception_dir, f)
                break

    files = _list_images(P.images)[: P.n_imgs]
    if not files:
        raise RuntimeError(f"Invalid path: {P.images}")
    if P.verbose:
        print(f"# DEBUG:::PATH_DATA = {P.images} ({len(files)} images)")

    first = np.asarray(Image.open(files[0]).convert("RGB"))
    images = np.zeros((len(files),) + first.shape, dtype=np.uint8)
    for i, f in enumerate(files):
        images[i] = np.asarray(Image.open(f).convert("RGB"), dtype=np.uint8)

    ref = np.load(P.stats)
    ref_mu, ref_sigma = ref["mu"], ref["sigma"]

    from contrad_tpu.parallel import get_mesh

    mesh = get_mesh() if P.embed == "inception" else None
    embed_fn = get_embed_fn(P.embed, mesh=mesh)
    mu, sigma = compute_stats_from_images(images, embed_fn, P.batch_size)
    fid = float(calculate_frechet_distance(mu, sigma, ref_mu, ref_sigma))
    if P.embed == "moments":
        # weights-free debug path: IS needs the inception classifier
        print("IS skipped (--embed moments has no classifier)")
        is_mean, is_std = float("nan"), float("nan")
    elif P.embed == "torch_inception":
        from third_party.torch_fid import get_probs_fn

        is_mean, is_std = inception_score(images, probs_fn=get_probs_fn(),
                                          batch_size=P.batch_size)
    else:
        is_mean, is_std = inception_score(images, batch_size=P.batch_size,
                                          mesh=mesh)

    # Reference writes fid.log / inception.log next to the image dir
    # (test_tf_inception.py:31-41,99-115); keep that behavior.
    logdir = os.path.dirname(os.path.abspath(P.images.rstrip("/")))
    with open(os.path.join(logdir, "fid.log"), "a") as f:
        f.write(f"{os.path.basename(P.images)}, {fid}\n")
    with open(os.path.join(logdir, "inception.log"), "a") as f:
        f.write(f"{os.path.basename(P.images)}, {is_mean}, {is_std}\n")
    print(f"FID: {fid}")
    print(f"IS: {is_mean} +- {is_std}")


if __name__ == "__main__":
    main()
