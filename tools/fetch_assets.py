#!/usr/bin/env python
"""Fetch the external assets the framework needs (run once, needs network).

The reference relies on torchvision auto-download for CIFAR
(``/root/reference/datasets.py:18-19``) and pytorch-fid's URL for the FID
InceptionV3 weights (``/root/reference/third_party/fid/inception.py:15-16``).
This repo's loaders read the same standard files from ``$DATA_DIR`` /
``$INCEPTION_WEIGHTS`` instead; this script downloads and verifies them.

Usage:
    python tools/fetch_assets.py [--data_dir data/] [--cifar100] [--afhq]

Downloads (with MD5/size verification where published):
  - cifar-10-python.tar.gz          -> $DATA_DIR   (163 MB)
  - cifar-100-python.tar.gz         -> $DATA_DIR   (161 MB, with --cifar100)
  - pt_inception-2015-12-05-*.pth   -> third_party/fid/  (91 MB)
AFHQ / CelebA-HQ have gated or release-based hosting; the script prints the
official instructions instead of downloading.
"""

import argparse
import hashlib
import os
import sys
import urllib.request

CIFAR10_URL = "https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz"
CIFAR10_MD5 = "c58f30108f718f92721af3b95e74349a"
CIFAR100_URL = "https://www.cs.toronto.edu/~kriz/cifar-100-python.tar.gz"
CIFAR100_MD5 = "eb9058c3a382ffc7106e4002c42a8d85"
INCEPTION_URL = ("https://github.com/mseitzer/pytorch-fid/releases/download/"
                 "fid_weights/pt_inception-2015-12-05-6726825d.pth")
INCEPTION_NAME = "pt_inception-2015-12-05-6726825d.pth"
# pytorch-fid names its release file with the leading 8 hex chars of the
# file's sha256 (the "-6726825d" fragment); verify against that prefix.
INCEPTION_SHA256_PREFIX = "6726825d"


def _digest(path: str, algo: str) -> str:
    h = hashlib.new(algo)
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _md5(path: str) -> str:
    return _digest(path, "md5")


def _checks_out(path: str, md5: str, sha256_prefix: str) -> bool:
    if md5 is not None:
        return _digest(path, "md5") == md5
    if sha256_prefix is not None:
        return _digest(path, "sha256").startswith(sha256_prefix)
    return True


def fetch(url: str, dest: str, md5: str = None,
          sha256_prefix: str = None) -> None:
    if os.path.exists(dest):
        if _checks_out(dest, md5, sha256_prefix):
            print(f"  ok (cached): {dest}")
            return
        print(f"  checksum mismatch, re-downloading: {dest}")
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    print(f"  downloading {url}")

    def hook(n, bs, total):
        if total > 0 and n % 64 == 0:
            sys.stdout.write(f"\r  {n * bs / 1e6:7.1f} / {total / 1e6:.1f} MB")
            sys.stdout.flush()

    urllib.request.urlretrieve(url, dest + ".part", reporthook=hook)
    print()
    if not _checks_out(dest + ".part", md5, sha256_prefix):
        raise RuntimeError(f"checksum mismatch for {url}")
    os.replace(dest + ".part", dest)
    print(f"  ok: {dest}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default=os.environ.get("DATA_DIR", "data/"))
    p.add_argument("--cifar100", action="store_true")
    p.add_argument("--afhq", action="store_true",
                   help="print AFHQ / CelebA-HQ acquisition instructions")
    args = p.parse_args()

    print("CIFAR-10:")
    fetch(CIFAR10_URL, os.path.join(args.data_dir, "cifar-10-python.tar.gz"),
          CIFAR10_MD5)
    if args.cifar100:
        print("CIFAR-100:")
        fetch(CIFAR100_URL,
              os.path.join(args.data_dir, "cifar-100-python.tar.gz"),
              CIFAR100_MD5)

    print("FID InceptionV3 weights (pytorch-fid, TF-fidelity port):")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    default_weights = os.path.join(repo_root, "third_party", "fid",
                                   INCEPTION_NAME)
    fetch(INCEPTION_URL,
          os.environ.get("INCEPTION_WEIGHTS", default_weights),
          sha256_prefix=INCEPTION_SHA256_PREFIX)

    if args.afhq:
        print("""
AFHQ (512x512): released with StarGAN v2 —
  bash: wget https://www.dropbox.com/s/t9l9o3vsx2jai3z/afhq.zip
  unzip into $DATA_DIR/afhq/{train,val}/{cat,dog,wild}/
CelebA-HQ: download CelebAMask-HQ (github.com/switchablenorms/CelebAMask-HQ),
  then: python tools/preprocess_celeba_hq.py --src <CelebA-HQ-img> --out $DATA_DIR
""")
    print("Done. Set DATA_DIR=%s for training runs." % args.data_dir)


if __name__ == "__main__":
    main()
