"""Parallelism: device mesh, shardings, distributed helpers."""

from .distributed import initialize_multihost, process_batch_slice
from .mesh import (DATA_AXIS, batch_sharded, create_mesh, replicate,
                   replicated, shard_batch)

__all__ = [
    'DATA_AXIS', 'batch_sharded', 'create_mesh', 'initialize_multihost',
    'process_batch_slice', 'replicate', 'replicated', 'shard_batch',
]
