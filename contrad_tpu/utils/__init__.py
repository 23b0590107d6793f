"""Utilities: logging, checkpointing, image grids."""

import os

from contrad_tpu.utils.logger import Logger, append_csv
from contrad_tpu.utils.checkpoint import (
    find_restorable,
    has_checkpoint,
    restore_checkpoint,
    save_checkpoint,
    wait_for_checkpoints,
)

__all__ = [
    "Logger",
    "append_csv",
    "enable_compile_cache",
    "save_checkpoint",
    "restore_checkpoint",
    "has_checkpoint",
    "find_restorable",
    "wait_for_checkpoints",
]


def enable_compile_cache(cache_dir: str = None) -> str:
    """Point jax at the repo-local persistent XLA compilation cache (same
    store the test suite and bench.py use, ``.jax_cache/``). Identical
    programs — the train step, the scan block, the fused FID sampler — are
    deduped ACROSS runs: a restarted/resumed CLI skips minutes of
    recompiles. Call before the first jit dispatch; respects an externally
    set ``JAX_COMPILATION_CACHE_DIR``."""
    import jax

    cache_dir = (cache_dir
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.abspath(os.path.join(
                     os.path.dirname(os.path.dirname(
                         os.path.dirname(os.path.abspath(__file__)))),
                     ".jax_cache")))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
