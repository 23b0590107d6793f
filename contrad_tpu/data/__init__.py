"""Dataset registry (reference: ``datasets.py``).

``get_dataset(name)`` -> ``(train, test, image_size)`` where train/test are
:class:`ArrayDataset` (uint8 NHWC in RAM or memmap). TPU-native redesign: the
reference's per-dataset CPU torchvision transforms (hflip for the DiffAug
variants, RRC+hflip for the linear-eval variants — ``datasets.py:23-69``)
become *on-device* augmentations declared by ``train_aug`` on the dataset; the
input pipeline only moves raw uint8 batches (4x less host->HBM traffic than
float32).

``get_dataset_ref(name)`` picks the FID reference split exactly as the
reference does (``datasets.py:129-164``): CIFAR -> test, celeba128 -> test,
AFHQ -> train.

``$DATA_DIR`` points at the data root (default ``data/``). CIFAR is read from
the standard python pickle batches; image folders are decoded once into a
uint8 memmap cache next to the folder.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

from contrad_tpu.data.core import (
    ArrayDataset,
    BatchIterator,
    DeviceBatchIterator,
    PrefetchIterator,
    ShardedDeviceBatchIterator,
    make_train_loader,
)
from contrad_tpu.data.cifar import load_cifar10, load_cifar100
from contrad_tpu.data.folder import load_image_folder
from contrad_tpu.data.synthetic import synthetic_dataset

DATA_PATH = os.environ.get("DATA_DIR", "data/")

Entry = Tuple[ArrayDataset, Optional[ArrayDataset], Tuple[int, int, int]]


def get_image_size(dataset: str) -> Tuple[int, int, int]:
    """Image shape of a dataset WITHOUT loading it. Eval CLIs that only need
    the architecture's resolution (sampling, cDDLS, lineval with an explicit
    --dataset) must not require the training dataset's files to be present
    (reference eval scripts rebuild the model from the gin config alone)."""
    if dataset.startswith("cifar"):
        return (32, 32, 3)
    if dataset == "celeba128":
        return (128, 128, 3)
    if dataset.startswith("afhq_"):
        return (512, 512, 3)
    if dataset.startswith("synthetic"):
        parts = dataset.split("_")
        size = int(parts[1]) if len(parts) > 1 else 32
        return (size, size, 3)
    raise NotImplementedError(f"unknown dataset: {dataset}")


def get_dataset(dataset: str, data_path: Optional[str] = None) -> Entry:
    root = data_path or DATA_PATH

    if dataset in ("cifar10", "cifar100", "cifar10_lin", "cifar100_lin",
                   "cifar10_hflip", "cifar100_hflip"):
        base = "cifar10" if dataset.startswith("cifar10") else "cifar100"
        loader = load_cifar10 if base == "cifar10" else load_cifar100
        train, test = loader(root)
        if dataset.endswith("_hflip"):
            train.train_aug = "hflip"  # DiffAug recipe (datasets.py:49-69)
        elif dataset.endswith("_lin"):
            train.train_aug = "lin"  # RRC(0.2,1)+HFlip for linear eval (datasets.py:23-47)
        return train, test, (32, 32, 3)

    if dataset == "celeba128":
        image_size = (128, 128, 3)
        train = load_image_folder(
            os.path.join(root, "CelebAMask-HQ", "CelebA-128-split", "train"),
            image_size)
        test = load_image_folder(
            os.path.join(root, "CelebAMask-HQ", "CelebA-128-split", "test"),
            image_size)
        return train, test, image_size

    if dataset.startswith("afhq_"):
        kind = dataset.split("_", 1)[1]
        if kind not in ("cat", "dog", "wild"):
            raise NotImplementedError(f"unknown dataset: {dataset}")
        image_size = (512, 512, 3)
        train = load_image_folder(os.path.join(root, "afhq", kind, "train"),
                                  image_size)
        train.train_aug = "hflip"  # reference datasets.py:83-126
        val = load_image_folder(os.path.join(root, "afhq", kind, "val"),
                                image_size)
        return train, val, image_size

    if dataset.startswith("synthetic"):
        # synthetic[_<size>[_<ntrain>]]: procedural data for smoke tests,
        # benches, and CIFAR-scale eval drills. The 3-part form (e.g.
        # synthetic_32_50000) sizes the test split like CIFAR (<=10k) and
        # turns on class-anchored blobs so linear probes have real signal.
        parts = dataset.split("_")
        size = int(parts[1]) if len(parts) > 1 else 32
        n_train = int(parts[2]) if len(parts) > 2 else 2048
        n_test = max(512, min(n_train // 5, 10000))
        class_signal = len(parts) > 2
        image_size = (size, size, 3)
        train = synthetic_dataset(image_size, n=n_train, seed=0,
                                  class_signal=class_signal)
        test = synthetic_dataset(image_size, n=n_test, seed=1,
                                 class_signal=class_signal)
        return train, test, image_size

    raise NotImplementedError(f"unknown dataset: {dataset}")


def get_dataset_ref(dataset: str, data_path: Optional[str] = None) -> ArrayDataset:
    """FID reference split (reference ``datasets.py:129-164``)."""
    root = data_path or DATA_PATH
    if dataset.startswith("cifar"):
        _, test, _ = get_dataset(dataset, root)
        return test
    if dataset == "celeba128":
        _, test, _ = get_dataset(dataset, root)
        return test
    if dataset.startswith("afhq_"):
        train, _, _ = get_dataset(dataset, root)
        return train
    if dataset.startswith("synthetic"):
        _, test, _ = get_dataset(dataset, root)
        return test
    raise NotImplementedError(f"unknown dataset: {dataset}")


__all__ = [
    "ArrayDataset",
    "BatchIterator",
    "DeviceBatchIterator",
    "PrefetchIterator",
    "ShardedDeviceBatchIterator",
    "make_train_loader",
    "get_dataset",
    "get_image_size",
    "get_dataset_ref",
    "synthetic_dataset",
    "DATA_PATH",
]
