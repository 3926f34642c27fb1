from .mesh import (DATA_AXIS, EpochDeviceStream, batch_sharding, make_mesh,
                   pad_to_multiple, replicate, replicated, shard_batch,
                   stack_batches, superbatch_sharding)

__all__ = [
    "DATA_AXIS", "EpochDeviceStream", "batch_sharding", "make_mesh",
    "pad_to_multiple", "replicate", "replicated", "shard_batch",
    "stack_batches", "superbatch_sharding",
]
