"""Device mesh + sharding (the TPU-native replacement for DDP/NCCL)."""

from contrad_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    get_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "get_mesh",
    "replicate",
    "replicated",
    "shard_batch",
]
