"""Process/host environment helpers that must run BEFORE jax initializes.

Deliberately jax-free: every consumer (the training CLIs, tests/conftest.py,
``__graft_entry__``, the multi-host spawn harness) imports this while shaping
``XLA_FLAGS`` / rendezvous variables for a jax backend that does not exist
yet — in this process or in one about to be spawned.  The reference's
counterpart is the env wrangling around its NCCL worker spawn
(``/root/reference/train_gan.py:38,230-242,328-332``).
"""

from __future__ import annotations

import os
import socket
import subprocess
import threading
import time
from typing import Dict, List, Optional, Sequence, Tuple

# Rendezvous env consumed by contrad_tpu.parallel.mesh.init_distributed; a
# spawned worker must never inherit these from an outer multihost run.
RENDEZVOUS_VARS = ("CONTRAD_COORDINATOR", "CONTRAD_NUM_PROCESSES",
                   "CONTRAD_PROCESS_ID")


def force_host_device_count(n: int, env: Optional[Dict[str, str]] = None) -> None:
    """Append ``--xla_force_host_platform_device_count=n`` to ``XLA_FLAGS``
    (in ``env``, or ``os.environ`` by default) unless a count is already
    forced.  Must happen before the target process's jax backend initializes —
    this is how an N-chip mesh is simulated on CPU (SURVEY §4)."""
    target = os.environ if env is None else env
    flags = target.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        target["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()


def free_port() -> int:
    """An OS-assigned free localhost port (for the jax.distributed
    coordinator)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def worker_env(devices_per_proc: int, repo: str) -> Dict[str, str]:
    """Environment for a spawned multihost worker process: exactly
    ``devices_per_proc`` virtual CPU devices, the repo importable, and any
    outer rendezvous state scrubbed."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}")
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    for k in RENDEZVOUS_VARS:
        env.pop(k, None)
    return env


# XLA's CPU gloo collectives create rendezvous contexts lazily DURING program
# execution, each with a hardcoded 30 s key-value-store deadline (no Python
# knob: jaxlib's make_gloo_tcp_collectives takes no timeout).  On an
# oversubscribed host (one core, concurrent compiles in other processes) a
# rank can be starved off-CPU for >30 s between two context creations, which
# kills the whole world with this signature.  That is an environment-induced
# rendezvous timeout, not a code bug — worlds that hit it are retried once.
GLOO_FLAKE_SIGNATURE = "Gloo context initialization failed"


def spawn_world(cmds_envs: Sequence[Tuple[List[str], Dict[str, str]]],
                cwd: str, timeout: float = 900,
                retries: int = 2) -> List[str]:
    """Launch one process per ``(cmd, env)``, wait for all, kill stragglers.

    All processes are launched before any is waited on (they must rendezvous
    with each other), and all pipes are drained CONCURRENTLY — a rank that
    emits more than the 64 KB pipe capacity before its last collective must
    not block writing while an earlier rank is being waited on, or the whole
    world deadlocks into the timeout.  ``timeout`` is one shared deadline for
    the world, not per process.  Raises ``RuntimeError`` with the failing
    process's output tail if any exits non-zero; returns the per-process
    outputs (stdout+stderr combined) otherwise.  A world that dies with the
    gloo starvation signature (see ``GLOO_FLAKE_SIGNATURE``) is relaunched up
    to ``retries`` times before the failure propagates."""
    for attempt in range(retries + 1):
        procs = [subprocess.Popen(cmd, env=env, cwd=cwd,
                                  stdout=subprocess.PIPE,
                                  stderr=subprocess.STDOUT, text=True)
                 for cmd, env in cmds_envs]
        outs: List[str] = [""] * len(procs)

        def _drain(i: int, p: subprocess.Popen) -> None:
            outs[i] = p.stdout.read()

        readers = [threading.Thread(target=_drain, args=(i, p), daemon=True)
                   for i, p in enumerate(procs)]
        for t in readers:
            t.start()
        deadline = time.monotonic() + timeout
        try:
            for p in procs:
                p.wait(timeout=max(deadline - time.monotonic(), 0.001))
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
            for t in readers:  # EOF arrives once the process is dead
                t.join(timeout=30)
        failed = [(p, out) for p, out in zip(procs, outs) if p.returncode != 0]
        if not failed:
            return outs
        if (attempt < retries
                and any(GLOO_FLAKE_SIGNATURE in out for _, out in failed)):
            print(f"spawn_world: gloo rendezvous starved (attempt "
                  f"{attempt + 1}/{retries + 1}); relaunching the world",
                  flush=True)
            continue
        p, out = failed[0]
        raise RuntimeError(
            f"worker rc={p.returncode}\n--- output tail ---\n{out[-4000:]}")
    raise AssertionError("unreachable")
