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


def round_up_batch(batch_size: int, mesh: Mesh) -> int:
    """Smallest device-count multiple >= batch_size (batch-sharded programs
    need equal per-device rows); prints when it changes."""
    n_dev = int(mesh.devices.size)
    rounded = batch_size + (-batch_size) % n_dev
    if rounded != batch_size:
        print(f"batch_size rounded up to {rounded} "
              f"(device-count {n_dev} multiple)")
    return rounded


def world_all(flag: bool) -> bool:
    """True iff ``flag`` is true on EVERY process. COLLECTIVE — all
    processes must call it. Use to agree on whether an optional collective
    program (e.g. in-loop FID) will run: a per-rank decision would leave
    some ranks dispatching programs others never join, hanging the world."""
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.asarray(bool(flag)))
    return bool(np.all(flags))


def broadcast_floats(*vals: float) -> tuple:
    """Rank 0's values on every process (identity single-process).
    COLLECTIVE. Use for decisions derived from host-side float math (scipy
    sqrtm, np.cov) that gate collective dispatches — different BLAS builds
    can disagree in the last ulps, and a diverged boolean (e.g. FID
    is_best) desynchronizes the collective best-checkpoint write."""
    if jax.process_count() == 1:
        return vals
    from jax.experimental import multihost_utils

    out = multihost_utils.broadcast_one_to_all(
        np.asarray(vals, dtype=np.float64))
    return tuple(float(v) for v in out)


def host_batched(forward, mesh: Optional[Mesh] = None,
                 chunk: Optional[int] = None):
    """Wrap a jitted images->features ``forward`` into a host fn accepting
    any batch size. With a mesh the batch shards over the data axis (ragged
    tails pad to a device-count multiple and slice back); without, it runs
    on the default device. uint8 inputs are scaled to [0, 1] floats.

    ``chunk`` bounds the PER-DEVICE batch each forward call sees — the
    memory cap for big embedders. A 299^2 InceptionV3 forward materializes
    ~5.6 MB of activations per image, so an unchunked FID@10k stats
    precompute is a >50 GB allocation (observed: the production-scale eval
    drill OOM'd the 16 GB chip exactly there). Calls larger than one chunk
    pad up to a whole number of fixed-size chunks (one compiled program,
    no tail recompile) and slice back; calls that fit stay single-dispatch."""
    n_dev = int(mesh.devices.size) if mesh is not None else 1
    b_shard = batch_sharding(mesh) if mesh is not None else None
    per_call = chunk * n_dev if chunk else None

    def one_call(x, n_keep, pad_to=None):
        # f32 conversion and padding happen HERE, per dispatch, so the
        # chunked path's peak host RAM is input + ONE chunk's f32 copy
        # (padding/converting the whole array up front doubled it for the
        # 10k-image stats precompute).
        if x.dtype == np.uint8:
            x = x.astype(np.float32) / 255.0
        pad = (pad_to - len(x)) if pad_to is not None else (-len(x)) % n_dev
        if pad:
            x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
        placed = jax.device_put(x, b_shard) if b_shard is not None else x
        return np.asarray(jax.device_get(forward(placed)))[:n_keep]

    def call(images):
        x = np.asarray(images)
        n = len(x)
        if per_call is None or n <= per_call:
            return one_call(x, n)
        # Ragged tail pads up to one fixed-size chunk (same compiled
        # program as the full chunks — no tail recompile).
        outs = [one_call(x[i:i + per_call], min(per_call, n - i),
                         pad_to=per_call)
                for i in range(0, n, per_call)]
        return np.concatenate(outs)[:n]

    return call


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
