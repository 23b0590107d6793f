"""Device mesh and sharding helpers.

TPU-native replacement for the reference's parallelism stack
(``train_gan.py:239-242,311-313``: NCCL process group + DDP + SyncBatchNorm +
DistributedSampler + per-step barriers): a single 'data' mesh axis, batch
arrays sharded on it, parameters replicated, and ONE jitted step compiled over
the mesh. All communication (grad all-reduce, contrastive-negative all-gather,
BN stat reduction) is inserted by XLA over ICI; no barriers, no gather layers.

Multi-host extension: call ``jax.distributed.initialize()`` first and the same
mesh code covers DCN-connected slices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    """Place a host array as a batch-sharded global device array."""
    return jax.device_put(x, batch_sharding(mesh))


def replicate(tree, mesh: Mesh):
    """Replicate a (host or single-device) pytree over the whole mesh.

    Multi-process: leaves restored/created on this process's default device
    are pulled to host first — ``device_put`` of a process-local device
    array onto a GLOBAL sharding would be a cross-host transfer, which the
    CPU (and some TPU) backends refuse; every process holds the identical
    value (same init seed / same collectively-saved checkpoint), so the
    host round-trip is semantics-free. Startup-only path."""
    if jax.process_count() > 1:
        tree = jax.tree.map(
            lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree)
    return jax.device_put(tree, replicated(mesh))


def data_shard() -> tuple:
    """(rank, world) for host-side data sharding — the TPU-native equivalent
    of the reference's DistributedSampler(rank, world_size)
    (``train_gan.py:245-251``). (0, 1) in single-process runs."""
    return jax.process_index(), jax.process_count()


def init_distributed() -> None:
    """``jax.distributed.initialize`` with explicit env-var overrides.

    TPU pods / SLURM / k8s are auto-detected by jax's cluster environments;
    plain CPU hosts (and the 2-process CPU certification test,
    ``tests/test_multihost_spawn.py``) are not, so the rendezvous can be
    given explicitly via::

        CONTRAD_COORDINATOR=host:port  CONTRAD_NUM_PROCESSES=N
        CONTRAD_PROCESS_ID=i

    Replaces the reference's NCCL TCP rendezvous
    (``/root/reference/train_gan.py:239-242``: ``dist.init_process_group(
    'nccl', init_method='tcp://127.0.0.1:<port>', rank, world_size)``).
    """
    import os

    kwargs = {}
    coordinator = os.environ.get("CONTRAD_COORDINATOR")
    if coordinator:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=int(os.environ["CONTRAD_NUM_PROCESSES"]),
            process_id=int(os.environ["CONTRAD_PROCESS_ID"]),
        )
    jax.distributed.initialize(**kwargs)


def place_global_batch(local, mesh: Mesh):
    """Assemble the global batch-sharded array from this process's local rows.

    Each process feeds the rows for its own addressable devices (a contiguous
    1/process_count slice of the global batch on the 1-D data mesh);
    ``jax.make_array_from_process_local_data`` stitches them into one global
    jax.Array without any cross-host transfer. With a single process this is
    equivalent to ``shard_batch``."""
    return jax.make_array_from_process_local_data(
        batch_sharding(mesh), np.asarray(local))
