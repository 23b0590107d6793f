"""Training: losses, modes, penalties, train state, and the SPMD step."""

from contrad_tpu.training.losses import gan_d_loss, gan_g_loss, nt_xent, supcon_fake
from contrad_tpu.training.modes import ModeCtx, get_mode, run_filename
from contrad_tpu.training.penalty import compute_penalty
from contrad_tpu.training.state import (
    GANTrainState,
    count_parameters,
    create_train_state,
    ema_update,
    make_optimizer,
)
from contrad_tpu.training.step import GANTrainer, make_d_apply, make_g_apply

__all__ = [
    "gan_d_loss",
    "gan_g_loss",
    "nt_xent",
    "supcon_fake",
    "ModeCtx",
    "get_mode",
    "run_filename",
    "compute_penalty",
    "GANTrainState",
    "count_parameters",
    "create_train_state",
    "ema_update",
    "make_optimizer",
    "GANTrainer",
    "make_d_apply",
    "make_g_apply",
]
