"""Parallelism: device mesh, shardings, distributed helpers."""

from .mesh import (DATA_AXIS, batch_sharded, create_mesh, replicate,
                   replicated, shard_batch)

__all__ = [
    'DATA_AXIS', 'batch_sharded', 'create_mesh', 'replicate', 'replicated',
    'shard_batch',
]
