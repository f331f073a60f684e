"""Device mesh and sharding helpers for data-parallel training/inference.

TPU-native replacement for the reference's tf.distribute strategies
(training/train_lib.py:334-343 in google-research/frame-interpolation:
OneDeviceStrategy for CPU debug, MirroredStrategy for single-host GPUs).
Here the same two capabilities — and the multi-host extension the reference
lacks — fall out of one mechanism: a 1-D `jax.sharding.Mesh` over all
devices with the batch sharded along it.

  * params / optimizer state: replicated (NamedSharding(P()))
  * batch: sharded on axis 0  (NamedSharding(P('data')))
  * gradients: XLA inserts the all-reduce (psum over ICI) automatically
    when jit is given these output shardings — no NCCL-style code.

Works identically on 1 device (degenerates to plain jit), N TPU chips, or
a virtual CPU mesh (`XLA_FLAGS=--xla_force_host_platform_device_count=8`)
for tests.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def create_mesh(devices: Optional[Sequence] = None,
                axis_name: str = DATA_AXIS) -> Mesh:
  """1-D data-parallel mesh over the given (default: all) devices."""
  if devices is None:
    devices = jax.devices()
  return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
  return NamedSharding(mesh, P(axis_name))


def shard_batch(batch: Any, mesh: Mesh,
                axis_name: str = DATA_AXIS) -> Any:
  """Device-puts a pytree of host arrays with axis 0 sharded over the mesh.

  The global batch size must divide the mesh size (the per-replica split
  MirroredStrategy does implicitly, train_lib.py:184).
  """
  sharding = batch_sharded(mesh, axis_name)

  def put(x):
    x = np.asarray(x)
    if x.ndim == 0:
      return jax.device_put(x, replicated(mesh))
    if x.shape[0] % mesh.devices.size != 0:
      raise ValueError(
          f'global batch {x.shape[0]} must divide mesh size '
          f'{mesh.devices.size}')
    return jax.device_put(x, sharding)

  return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
  """Device-puts a pytree fully replicated over the mesh."""
  sharding = replicated(mesh)
  return jax.tree_util.tree_map(
      lambda x: jax.device_put(x, sharding), tree)
