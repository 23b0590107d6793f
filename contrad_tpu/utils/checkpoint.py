"""Checkpoint / resume via orbax.

One durable artifact: the whole :class:`GANTrainState` pytree (G, D, EMA, both
Adam states, step counter, PRNG key). This closes the reference's resume gaps
(SURVEY §5: torch checkpoints omit RNG state and store EMA/opt separately —
``train_gan.py:211-225``). Layout under the logdir:

  ckpt/latest    — overwritten each eval (reference gen.pt/dis.pt/optim.pt)
  ckpt/best      — best-FID copy (reference gen_best.pt/dis_best.pt)
  ckpt/step_N    — step-stamped copies every save_every (reference gen_N.pt)
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from contrad_tpu.training.state import GANTrainState

_ckptr: Optional[ocp.StandardCheckpointer] = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _ckptr
    if _ckptr is None:
        _ckptr = ocp.StandardCheckpointer()
    return _ckptr


def _ckpt_dir(logdir: str) -> str:
    return os.path.join(os.path.abspath(logdir), "ckpt")


def save_checkpoint(logdir: str, state: GANTrainState, name: str = "latest",
                    blocking: bool = False):
    """Async by default: orbax snapshots the arrays and writes in the
    background so the train loop keeps stepping (the reference's torch.save
    blocks the loop for the full serialization). The previous async save is
    awaited first, so at most one write is in flight."""
    path = os.path.join(_ckpt_dir(logdir), name)
    ckptr = _checkpointer()
    ckptr.wait_until_finished()  # at most one in-flight write
    ckptr.save(path, state, force=True)
    if blocking:
        ckptr.wait_until_finished()


def wait_for_checkpoints():
    """Block until any in-flight async save completes (call before reading a
    just-written checkpoint or at shutdown)."""
    _checkpointer().wait_until_finished()


def restore_checkpoint(
    logdir: str, template: GANTrainState, name: str = "latest"
) -> GANTrainState:
    """Restore into the sharding/structure of ``template`` (a freshly
    initialized state)."""
    path = os.path.join(_ckpt_dir(logdir), name)
    ckptr = _checkpointer()
    ckptr.wait_until_finished()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    return ckptr.restore(path, abstract)


def has_checkpoint(logdir: str, name: str = "latest") -> bool:
    wait_for_checkpoints()  # async saves finalize by renaming into place
    return os.path.isdir(os.path.join(_ckpt_dir(logdir), name))


def find_restorable(logdir: str) -> Optional[str]:
    """Name of the newest COMPLETED checkpoint under ``logdir`` to resume
    from, or None if there is none.

    A hard kill can land mid-write, leaving ``latest`` as a dangling
    ``*.orbax-checkpoint-tmp`` dir (orbax finalizes by renaming); resuming
    must then fall back to the newest completed artifact (``step_N`` /
    ``best``) instead of silently restarting from scratch. ``latest`` wins
    mtime ties. (The reference has no such fallback — a crash during its
    torch.save leaves a truncated gen.pt that fails to load,
    ``/root/reference/train_gan.py:211-225,255-260``.)"""
    d = _ckpt_dir(logdir)
    if not os.path.isdir(d):
        return None
    wait_for_checkpoints()
    cands = []
    for n in os.listdir(d):
        if n.endswith(".orbax-checkpoint-tmp"):
            continue  # crash mid-write: incomplete, not loadable
        if os.path.isdir(os.path.join(d, n)):
            cands.append((os.path.getmtime(os.path.join(d, n)),
                          n == "latest", n))
    return max(cands)[2] if cands else None


def latest_step(logdir: str, template: GANTrainState) -> Optional[int]:
    if not has_checkpoint(logdir):
        return None
    state = restore_checkpoint(logdir, template)
    return int(state.step)
