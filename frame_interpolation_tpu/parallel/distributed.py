"""Multi-host (multi-process) initialization for distributed training.

A capability EXTENSION over the reference, which is single-host only
(tf.distribute.MirroredStrategy — training/train_lib.py:334-343 in
google-research/frame-interpolation). With JAX, the same data-parallel
train step scales to multi-host TPU slices: each host calls
`initialize_multihost`, after which `jax.devices()` is global and the
1-D data mesh from parallel.mesh spans every chip; gradient all-reduces
ride ICI within a slice and DCN across slices, inserted by XLA.

Host-local input pipelines should feed each process its own shard of the
global batch (`process_batch_slice` computes the per-process slice).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
  """Initializes jax.distributed; no-op when unconfigured single-host.

  On TPU pods the arguments are auto-detected from the environment; on
  CPU/GPU clusters pass them explicitly.
  """
  if coordinator_address is None and num_processes is None:
    # Single-host (or TPU metadata auto-detection handles everything).
    return
  jax.distributed.initialize(coordinator_address=coordinator_address,
                             num_processes=num_processes,
                             process_id=process_id)


def process_batch_slice(global_batch: int) -> Tuple[int, int]:
  """(start, size) of this process's slice of a globally-sharded batch."""
  count = jax.process_count()
  if global_batch % count != 0:
    raise ValueError(
        f'global batch {global_batch} must divide process count {count}')
  per = global_batch // count
  return jax.process_index() * per, per
