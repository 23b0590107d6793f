"""Durable eval-side state for resume.

The train state (params, opt, RNG, EMA) lives in the orbax checkpoint
(``utils/checkpoint.py``); this sidecar carries the EVAL trackers the
reference silently loses on ``--resume`` (``evaluate/gan.py:48-58,147-159``):
the FID history and best-so-far (so ``ckpt/best`` gating survives a restart
instead of being overwritten by the first post-resume score), the fixed GIF
latents + accumulated frames (one continuous progress GIF), and the
``eval_seed`` filename suffix (so CSV/GIF files keep appending instead of
forking per restart).

One ``eval_state.npz`` next to ``ckpt/``, written atomically each eval.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

FILENAME = "eval_state.npz"


def _path(logdir: str) -> str:
    return os.path.join(logdir, FILENAME)


def save_eval_state(logdir: str, eval_seed: int, fid=None,
                    fixed_gen=None) -> str:
    payload = {"eval_seed": np.int64(eval_seed)}
    if fid is not None:
        for k, v in fid.state_dict().items():
            payload[f"fid_{k}"] = v
    if fixed_gen is not None:
        for k, v in fixed_gen.state_dict().items():
            payload[f"gif_{k}"] = v
    path = _path(logdir)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)  # atomic: a crash mid-write never corrupts resume
    return path


def restore_eval_state(logdir: str, fid=None, fixed_gen=None) -> Optional[int]:
    """Load the sidecar into the given trackers (each optional). Returns the
    persisted eval_seed, or None when no sidecar exists (fresh run / resume
    of a pre-sidecar logdir — trackers stay fresh, matching the reference)."""
    path = _path(logdir)
    if not os.path.exists(path):
        return None
    with np.load(path) as d:
        if fid is not None and "fid_history" in d:
            fid.load_state_dict(
                {"history": d["fid_history"], "best": d["fid_best"]})
        if fixed_gen is not None and "gif_z" in d:
            fixed_gen.load_state_dict(
                {"z": d["gif_z"], "frames": d["gif_frames"]})
        return int(d["eval_seed"])
