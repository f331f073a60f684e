"""Work fan-out: deterministic sharding + local process pools.

The reference structures multi-directory inference and dataset builds as
Beam pipelines (eval/interpolator_cli.py:180-187,
datasets/create_middlebury_tfrecord.py:149-158 in
google-research/frame-interpolation) but always runs them on the
in-process DirectRunner, so its actual capability is single-machine
fan-out. This module provides the TPU-native equivalent, designed for how
TPU fleets are actually operated:

  * `shard(items, shard_index, num_shards)` — deterministic round-robin
    sharding. A fleet of N single-chip hosts runs the same CLI with
    `--shard_index=$i --num_shards=$N` (e.g. one invocation per GKE
    indexed-job replica) and partitions the work with no coordinator —
    the Beam-runner story without Beam. Used by cli/interpolate_dir.
  * `process_map(fn, items, num_workers)` — a local process pool for
    CPU-bound work (dataset builders: decode/resize/encode). Device-bound
    work must NOT use this on a single-chip host (processes would fight
    over the one TPU); shard across hosts instead.
"""
from __future__ import annotations

import multiprocessing
from typing import Callable, Iterable, List, Sequence, TypeVar

T = TypeVar('T')
R = TypeVar('R')


def shard(items: Sequence[T], shard_index: int, num_shards: int) -> List[T]:
  """Deterministic round-robin shard: items[shard_index::num_shards].

  Every shard_index in [0, num_shards) covers the sequence exactly once
  across the fleet, preserving relative order within a shard.
  """
  if num_shards < 1:
    raise ValueError(f'num_shards must be >= 1, got {num_shards}')
  if not 0 <= shard_index < num_shards:
    raise ValueError(
        f'shard_index {shard_index} outside [0, {num_shards})')
  return list(items[shard_index::num_shards])


def process_map(fn: Callable[[T], R], items: Iterable[T],
                num_workers: int) -> List[R]:
  """Maps `fn` over `items` with a process pool (order-preserving).

  num_workers <= 1 runs inline (no fork) — the default for tests and for
  device-bound callers.
  """
  items = list(items)
  if num_workers <= 1 or len(items) <= 1:
    return [fn(item) for item in items]
  context = multiprocessing.get_context('spawn')
  with context.Pool(min(num_workers, len(items))) as pool:
    return pool.map(fn, items)
