"""Dataset containers and the infinite shuffled batch iterator.

Replaces the reference's DataLoader + DistributedSampler + ``cycle``
(``train_gan.py:245-251``, ``utils.py:89-96``): there is one logical global
batch per step (the mesh shards it), epochs reshuffle deterministically from a
seed, and batches stay uint8 until inside the jitted step.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class ArrayDataset:
    """uint8 NHWC images (+ int labels) in RAM or memmap."""

    images: np.ndarray  # (N, H, W, C) uint8
    labels: Optional[np.ndarray] = None  # (N,) int64
    train_aug: str = "none"  # on-device aug the reference baked into transforms
    n_classes: int = 1

    def __post_init__(self):
        assert self.images.dtype == np.uint8, "datasets carry uint8 images"
        if self.labels is None:
            self.labels = np.zeros((len(self.images),), dtype=np.int64)

    def __len__(self) -> int:
        return len(self.images)

    @property
    def image_size(self) -> Tuple[int, int, int]:
        return tuple(self.images.shape[1:])


class BatchIterator:
    """Infinite iterator of shuffled (images, labels) uint8 batches.

    Deterministic given (seed, epoch) — the equivalent of the reference's
    ``DistributedSampler.set_epoch`` reshuffle (``utils.py:89-96``), but
    producing the *global* batch; sharding over devices happens at
    ``device_put``. Epoch remainders are dropped (steady shapes keep XLA from
    recompiling)."""

    def __init__(self, dataset: ArrayDataset, batch_size: int, seed: int = 0,
                 start_epoch: int = 0,
                 shard: Optional[Tuple[int, int]] = None):
        if batch_size > len(dataset):
            raise ValueError(
                f"batch_size {batch_size} exceeds dataset size {len(dataset)}")
        self.dataset = dataset
        self.batch_size = batch_size  # the GLOBAL batch size
        self.seed = seed
        self.epoch = start_epoch
        self._order = None
        self._pos = 0
        # (rank, world): every process draws the identical global permutation
        # (same seed) and keeps only its contiguous slice of each global batch
        # — the multi-host equivalent of DistributedSampler(rank, world_size)
        # (reference train_gan.py:245-251). The slice is contiguous because on
        # the 1-D data mesh process p's devices own global rows
        # [p*B/world, (p+1)*B/world).
        self.shard = shard
        if shard is not None:
            rank, world = shard
            if batch_size % world:
                raise ValueError(
                    f"global batch {batch_size} must be divisible by the "
                    f"process count {world}")
            if not 0 <= rank < world:
                raise ValueError(f"bad shard {shard}")

    def _reshuffle(self):
        rng = np.random.default_rng((self.seed, self.epoch))
        self._order = rng.permutation(len(self.dataset))
        self._pos = 0

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        return self

    def next_indices(self) -> np.ndarray:
        """Advance the stream by one batch and return its (shard-sliced)
        dataset rows. The ONE place epoch/reshuffle bookkeeping lives — the
        host-gather path (``__next__``) and the device-resident index stream
        (``DeviceBatchIterator``) both consume it, so they cannot diverge."""
        if self._order is None or self._pos + self.batch_size > len(self._order):
            if self._order is not None:
                self.epoch += 1
            self._reshuffle()
        idx = self._order[self._pos : self._pos + self.batch_size]
        self._pos += self.batch_size
        if self.shard is not None:
            rank, world = self.shard
            per = self.batch_size // world
            idx = idx[rank * per : (rank + 1) * per]
        return idx

    def __next__(self) -> Tuple[np.ndarray, np.ndarray]:
        idx = self.next_indices()
        # Native multithreaded gather (contrad_tpu/data/native): matters for
        # memmapped high-res folders (~50 MB/batch at 512^2).
        from contrad_tpu.data import native

        return native.gather_batch(self.dataset.images, idx), self.dataset.labels[idx]


class PrefetchIterator:
    """Wraps a batch iterator with a background thread that assembles (and
    optionally device_puts) the next batch while the current step runs —
    the reference's DataLoader worker/pin_memory overlap, without processes."""

    def __init__(self, it, place_fn=None, depth: int = 2):
        import queue
        import threading

        self._it = it
        self._place = place_fn or (lambda x: x)
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = False

        def worker():
            while not self._stop:
                images, labels = next(self._it)
                payload = (self._place(images), labels)
                # Timed put so a worker blocked on a full queue re-checks
                # _stop and can actually exit on close().
                while not self._stop:
                    try:
                        self._q.put(payload, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        return self._q.get()

    def close(self, timeout: float = 2.0):
        """Stop the worker thread (releases its hold on the wrapped iterator)."""
        self._stop = True
        # Drain so a put-blocked worker wakes up and observes _stop.
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
        self._thread.join(timeout=timeout)


class ShardedDeviceBatchIterator:
    """Device-resident dataset SHARDED across the mesh: each device holds 1/N
    of the (pre-shuffled) dataset in HBM, extending device residency N-fold
    beyond ``DeviceBatchIterator`` (AFHQ-512, ~3.7 GB uint8, fits an 8-chip
    v5e mesh at ~470 MB/chip). Replaces the reference's DataLoader worker pool
    for large folders (``/root/reference/train_gan.py:245-251``).

    Per step, every device gathers ``B/N`` rows from its *local* shard (one
    jitted shard_map take; only a ~4 KB index vector crosses the host link).
    Sampling semantics = DistributedSampler with a frozen staging permutation:
    a global batch is B/N uniform draws from each of N random disjoint chunks.
    Cross-epoch mixing: at every epoch boundary the shards ring-rotate one hop
    over ICI (``lax.ppermute``) and each device reshuffles locally, so over N
    epochs every device cycles through the whole dataset.
    """

    def __init__(self, dataset: ArrayDataset, batch_size: int, mesh,
                 seed: int = 0, start_epoch: int = 0):
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as Pspec

        from contrad_tpu.data import native
        from contrad_tpu.parallel.mesh import DATA_AXIS, batch_sharding

        self.n_dev = int(mesh.devices.size)
        if batch_size % self.n_dev:
            raise ValueError(f"global batch {batch_size} must be divisible "
                             f"by the device count {self.n_dev}")
        self.batch_size = batch_size
        self.local_batch = batch_size // self.n_dev
        n = len(dataset) - len(dataset) % self.n_dev
        self.shard_len = n // self.n_dev
        if self.local_batch > self.shard_len:
            raise ValueError(
                f"per-device batch {self.local_batch} exceeds per-device "
                f"shard {self.shard_len}")
        self.seed = seed
        self.epoch = start_epoch

        # One-time global staging permutation: chunks are random disjoint
        # subsets, so static chunk membership carries no content bias.
        stage_rng = np.random.default_rng((seed, 0xD5))
        perm = stage_rng.permutation(len(dataset))[:n]
        self._images = jax.device_put(
            native.gather_batch(dataset.images, perm), batch_sharding(mesh))
        # labels stay host-side, pre-split into the same chunks
        self._label_chunks = dataset.labels[perm].reshape(
            self.n_dev, self.shard_len)

        spec = Pspec(DATA_AXIS)
        ring = [(i, (i + 1) % self.n_dev) for i in range(self.n_dev)]

        def _local_take(data, idx):
            return jnp.take(data, idx, axis=0)

        self._gather = jax.jit(jax.shard_map(
            _local_take, mesh=mesh, in_specs=(spec, spec), out_specs=spec))

        def _shift(data):
            return jax.lax.ppermute(data, DATA_AXIS, ring)

        self._rotate = jax.jit(
            jax.shard_map(_shift, mesh=mesh, in_specs=spec, out_specs=spec),
            donate_argnums=0)

        self._local_orders = None
        self._pos = 0
        # Replay ring rotations for resume parity.  The rotation permutation
        # has period n_dev, so start_epoch % n_dev rotations reach the
        # identical placement at O(n_dev) cost instead of O(start_epoch).
        for _ in range(start_epoch % self.n_dev):
            self._images = self._rotate(self._images)

    def _chunk_of(self, device: int) -> int:
        """Original chunk held by ``device`` after ``epoch`` ring rotations."""
        return (device - self.epoch) % self.n_dev

    def _reshuffle(self):
        self._local_orders = np.stack([
            np.random.default_rng((self.seed, self.epoch, d)).permutation(
                self.shard_len)
            for d in range(self.n_dev)
        ])  # (n_dev, shard_len)
        self._pos = 0

    # Trainers can fuse the batch gather INTO the jitted train step
    # (GANTrainer.train_step_indexed): indices are shard-local here.
    supports_indexed = True
    local_indexing = True

    @property
    def images(self):
        """The staged device-resident dataset (1/N per device). Read AFTER
        next_indices() — epoch boundaries ring-rotate the array."""
        return self._images

    def steps_until_rotation(self) -> int:
        """Batches left before the next epoch-boundary ring rotation (which
        replaces ``images``). Multi-step dispatch blocks
        (GANTrainer.train_steps_indexed) must not straddle a rotation: all K
        index vectors of a block are gathered against ONE images array."""
        if self._local_orders is None:
            return 0
        return (self.shard_len - self._pos) // self.local_batch

    def __iter__(self):
        return self

    def next_indices(self):
        """Advance the stream by one batch but return only the (shard-local)
        index vector + host labels; callers gather on device — either via
        materialize() or fused into the train step."""
        if (self._local_orders is None
                or self._pos + self.local_batch > self.shard_len):
            if self._local_orders is not None:
                self.epoch += 1
                self._images = self._rotate(self._images)
            self._reshuffle()
        idx = self._local_orders[:, self._pos : self._pos + self.local_batch]
        self._pos += self.local_batch
        labels = np.concatenate([
            self._label_chunks[self._chunk_of(d)][idx[d]]
            for d in range(self.n_dev)
        ])
        return idx.reshape(-1).astype(np.int32), labels

    def materialize(self, idx):
        return self._gather(self._images, idx)

    def __next__(self):
        idx, labels = self.next_indices()
        return self.materialize(idx), labels


class DeviceBatchIterator:
    """Device-resident dataset: the whole uint8 array is staged to HBM once;
    each step gathers the batch ON DEVICE from a host-sent index vector
    (~4 KB/step instead of megabytes of pixels). Eliminates the host->device
    image stream entirely — the TPU-native answer to DataLoader workers for
    datasets that fit in HBM (CIFAR: 150 MB).

    Epoch semantics identical to BatchIterator (seeded reshuffle, drop-last).
    """

    # Stage datasets up to this size; larger ones go sharded (1/N per chip,
    # ShardedDeviceBatchIterator) or stream via BatchIterator. 2 GB leaves
    # >= 13 GB of a v5e's HBM for params/optimizer/activations — validated
    # by the 512^2 b8 ContraD demo (peak live activations ~4 GB).
    MAX_BYTES = 2 * 1024 * 1024 * 1024

    def __init__(self, dataset: ArrayDataset, batch_size: int, mesh,
                 seed: int = 0, start_epoch: int = 0):
        import jax
        import jax.numpy as jnp

        from contrad_tpu.parallel.mesh import batch_sharding, replicated

        if dataset.images.nbytes > self.MAX_BYTES:
            raise ValueError(
                f"dataset too large for device residency "
                f"({dataset.images.nbytes >> 20} MB); use BatchIterator")
        self._indices = BatchIterator(dataset, batch_size, seed, start_epoch)
        self._labels = dataset.labels
        self._images = jax.device_put(np.asarray(dataset.images),
                                      replicated(mesh))
        self._gather = jax.jit(
            lambda data, idx: jnp.take(data, idx, axis=0),
            out_shardings=batch_sharding(mesh))

    # Trainers can fuse the batch gather INTO the jitted train step
    # (GANTrainer.train_step_indexed): indices are global rows here.
    supports_indexed = True
    local_indexing = False

    @property
    def images(self):
        return self._images

    def __iter__(self):
        return self

    def next_indices(self):
        """Advance the stream by one batch but return only the (global) index
        vector + host labels; callers gather on device — either via
        materialize() or fused into the train step. Epoch bookkeeping is
        BatchIterator.next_indices — one source of truth with the host path."""
        idx = self._indices.next_indices()
        return np.asarray(idx, dtype=np.int32), self._labels[idx]

    def materialize(self, idx):
        return self._gather(self._images, idx)

    def __next__(self):
        idx, labels = self.next_indices()
        return self.materialize(idx), labels


def make_train_loader(dataset: ArrayDataset, global_batch: int, mesh,
                      place_fn, seed: int = 0, starting_step: int = 1,
                      shard: Optional[Tuple[int, int]] = None):
    """Pick the fastest data path for a training run (shared by both train
    CLIs; replaces the reference's DataLoader + DistributedSampler wiring,
    ``/root/reference/train_gan.py:245-251``):

      * multi-host (``shard=(rank, world)``): per-process host feeding of the
        identically-seeded global permutation, prefetched;
      * fits one chip's budget: replicated device-resident dataset with
        on-device gathers (:class:`DeviceBatchIterator`);
      * fits the mesh sharded: 1/N per device + epoch ring rotation
        (:class:`ShardedDeviceBatchIterator`);
      * else: prefetched host streaming.

    On resume the stream restarts at the epoch training left off
    (drop-last aware: steps_per_epoch = len(dataset) // global_batch;
    deterministic seeded reshuffles make this reproducible — the reference
    relies on DistributedSampler.set_epoch the same way, utils.py:89-96).
    """
    steps_per_epoch = max(1, len(dataset) // global_batch)
    start_epoch = (starting_step - 1) // steps_per_epoch
    n_dev = int(mesh.devices.size)
    if shard is not None and shard[1] > 1:
        return PrefetchIterator(
            BatchIterator(dataset, global_batch, seed=seed, shard=shard,
                          start_epoch=start_epoch),
            place_fn=place_fn)
    if dataset.images.nbytes <= DeviceBatchIterator.MAX_BYTES:
        return DeviceBatchIterator(dataset, global_batch, mesh, seed=seed,
                                   start_epoch=start_epoch)
    if n_dev > 1 and (dataset.images.nbytes
                      <= DeviceBatchIterator.MAX_BYTES * n_dev):
        return ShardedDeviceBatchIterator(dataset, global_batch, mesh,
                                          seed=seed, start_epoch=start_epoch)
    return PrefetchIterator(
        BatchIterator(dataset, global_batch, seed=seed,
                      start_epoch=start_epoch),
        place_fn=place_fn)
