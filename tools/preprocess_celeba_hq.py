#!/usr/bin/env python
"""Resize CelebA-HQ 1024^2 images to 128^2 and split train/test per the
CelebA partition file (reference: third_party/preprocess_celeba_hq.py).

Usage:
    python tools/preprocess_celeba_hq.py <celeba_hq_dir> <mapping_txt> \
        <partition_txt> <out_dir>

Produces <out_dir>/train/images/*.jpg and <out_dir>/test/images/*.jpg in the
layout datasets.py expects for 'celeba128'.
"""

import os
import sys


def main():
    if len(sys.argv) != 5:
        print(__doc__)
        sys.exit(1)
    src_dir, mapping_txt, partition_txt, out_dir = sys.argv[1:5]

    from PIL import Image

    # CelebA eval partition: 0 train / 1 val / 2 test per original filename.
    partition = {}
    with open(partition_txt) as f:
        for line in f:
            name, split = line.split()
            partition[name] = int(split)

    # CelebA-HQ mapping: hq index -> original filename (column 'orig_file').
    with open(mapping_txt) as f:
        header = f.readline().split()
        orig_col = header.index("orig_file")
        rows = [line.split() for line in f if line.strip()]

    for split_name in ("train", "test"):
        os.makedirs(os.path.join(out_dir, split_name, "images"), exist_ok=True)

    n = 0
    for row in rows:
        idx, orig = row[0], row[orig_col]
        split = partition.get(orig, 0)
        split_name = "test" if split == 2 else "train"
        src = os.path.join(src_dir, f"{idx}.jpg")
        if not os.path.exists(src):
            src = os.path.join(src_dir, f"{int(idx):05d}.jpg")
        if not os.path.exists(src):
            continue
        img = Image.open(src).convert("RGB").resize((128, 128), Image.BILINEAR)
        img.save(os.path.join(out_dir, split_name, "images", f"{idx}.jpg"),
                 quality=95)
        n += 1
    print(f"Wrote {n} images to {out_dir}")


if __name__ == "__main__":
    main()
