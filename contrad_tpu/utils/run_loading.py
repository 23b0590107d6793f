"""Load a training run back from its logdir (config auto-discovery + orbax
restore) — the equivalent of the reference eval scripts' pattern of globbing
the run's gin file and torch.load-ing checkpoints (``test_lineval.py:117-144``,
``test_gan_sample_cddls.py:292-305``)."""

from __future__ import annotations

import glob
import os
from typing import Tuple

import jax

from contrad_tpu.config import Config, default_config_files, finalize_options, load_config
from contrad_tpu.data import get_image_size
from contrad_tpu.models import get_architecture
from contrad_tpu.training.state import GANTrainState, create_train_state, make_optimizer
from contrad_tpu.utils.checkpoint import has_checkpoint, restore_checkpoint


def discover_config(logdir: str) -> str:
    candidates = sorted(glob.glob(os.path.join(logdir, "*.toml")))
    if not candidates:
        raise FileNotFoundError(f"no config.toml found in {logdir}")
    return candidates[0]


def load_run(
    logdir: str,
    architecture: str,
    ckpt: str = "latest",
    seed: int = 0,
) -> Tuple[Config, object, object, GANTrainState, tuple]:
    """Returns (cfg, generator, discriminator, restored_state, image_size)."""
    cfg = load_config(default_config_files(discover_config(logdir)))
    finalize_options(cfg)
    opt = cfg.options

    # Size only — the run's dataset files need not be present for eval CLIs
    # (sampling/cDDLS never read them; lineval loads its own probe dataset).
    image_size = get_image_size(opt.dataset)
    generator, discriminator = get_architecture(architecture, image_size)

    ema = architecture.startswith("stylegan2")
    g_opt = make_optimizer(opt.lr, tuple(opt.beta))
    d_opt = make_optimizer(opt.lr_d, tuple(opt.beta))
    template = create_train_state(jax.random.PRNGKey(seed), generator,
                                  discriminator, image_size, g_opt, d_opt,
                                  ema=ema)
    if not has_checkpoint(logdir, ckpt):
        raise FileNotFoundError(f"no '{ckpt}' checkpoint under {logdir}/ckpt")
    state = restore_checkpoint(logdir, template, ckpt)
    return cfg, generator, discriminator, state, image_size
