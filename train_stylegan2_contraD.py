#!/usr/bin/env python
"""High-resolution StyleGAN2 + ContraD trainer
(reference: ``train_stylegan2_contraD.py``).

The reference needed this separate script because its ``nn.DataParallel``
gathered full-resolution generator outputs to GPU-0 every step; the fix was a
fused ``G_D`` module (reference ``train_stylegan2_contraD.py:117-164``) so
latent sampling, G forward, augmentation and D forward stayed per-GPU and only
128-d projections were gathered.

Under SPMD that optimization is inherent: the whole train step is one compiled
program partitioned over the mesh — generator outputs never leave their shard,
and only the contrastive-loss all-gathers (128-d projections) and the gradient
all-reduce cross ICI. So this script is the same trainer as
``train_stylegan2.py`` with the reference's recipe defaults
(``EXPERIMENTS.md:79-81``: contrad + simclr_hq, R1=0.5, eval cadence 5000,
n_eval_avg=1, no GIF).

    python train_stylegan2_contraD.py configs/gan/stylegan2/afhq_dog_style64.toml \
        stylegan2_512 --mode contrad --aug simclr_hq --lbd_r1 0.5 --halflife_k 20 \
        --use_warmup --evaluate_every 5000 --n_eval_avg 1 --no_gif
"""

import sys

from train_stylegan2 import main

if __name__ == "__main__":
    # Recipe defaults matching the reference CLI surface; explicit flags win.
    defaults = {
        "--mode": "contrad",
        "--aug": "simclr_hq",
        "--lbd_r1": "0.5",
        "--evaluate_every": "5000",
        "--n_eval_avg": "1",
    }
    for flag, value in defaults.items():
        if flag not in sys.argv:
            sys.argv.extend([flag, value])
    main()
