"""Utilities: logging, checkpointing, image grids."""

from contrad_tpu.utils.logger import Logger, append_csv
from contrad_tpu.utils.checkpoint import (
    has_checkpoint,
    restore_checkpoint,
    save_checkpoint,
    wait_for_checkpoints,
)

__all__ = [
    "Logger",
    "append_csv",
    "save_checkpoint",
    "restore_checkpoint",
    "has_checkpoint",
    "wait_for_checkpoints",
]
