"""Multi-step dispatch sizing for the training CLIs.

K train steps per XLA dispatch (``GANTrainer.train_steps_indexed`` — one
jitted ``lax.scan`` program) amortizes the per-dispatch host RPC, measured
~8 ms/step through a tunneled device and ~50 us locally. The CLIs keep their
event semantics (print/eval/save fire at exact step numbers) by choosing K
that divides every cadence and only launching blocks at aligned steps; the
single-step program handles tails, misalignment after epoch boundaries, and
trace capture.
"""

from __future__ import annotations

import math


def resolve_steps_per_dispatch(requested: int, fuse_gather: bool,
                               trace_steps: int, *cadences: int,
                               cap: int = 16) -> int:
    """Largest safe K: divides every event cadence, <= cap (or <= the user's
    explicit request). 1 whenever blocks can't apply (no fused-gather loader,
    or a profiler trace needs per-step dispatch boundaries)."""
    if not fuse_gather or trace_steps > 0 or requested == 1:
        return 1
    g = 0
    for c in cadences:
        g = math.gcd(g, max(int(c), 0))
    if g <= 1:
        return 1
    if requested > 0:
        return math.gcd(g, requested)
    limit = min(g, cap)
    return max(d for d in range(1, limit + 1) if g % d == 0)


def block_size(step: int, k: int, max_steps: int, loader) -> int:
    """Size of the dispatch block starting at ``step``: K when aligned, fits
    before max_steps, and (sharded loaders) doesn't straddle an epoch-boundary
    ring rotation; else 1."""
    if k <= 1 or (step - 1) % k:
        return 1
    if step + k - 1 > max_steps:
        return 1
    until_rot = getattr(loader, "steps_until_rotation", None)
    if until_rot is not None:
        left = until_rot()
        if left is not None and left < k:
            return 1
    return k
