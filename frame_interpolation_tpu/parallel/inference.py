"""Multi-chip inference: patch tiling sharded over the device mesh.

The reference handles >=4K inputs by folding frames into non-overlapping
patches and interpolating them sequentially at batch 1 on one device
(eval/interpolator.py:192-206 in google-research/frame-interpolation). The
single-chip TPU path here already batches all patches into one device call
(inference/interpolator.py); this module adds the multi-chip extension:
the patch batch is sharded across a 1-D device mesh, so an 8-chip v5e
slice interpolates 8 patches concurrently with zero cross-chip
communication (patches are independent by construction — same output
semantics as the reference).
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.film_net import FilmNet
from ..ops import tiling
from ..options import Options
from . import mesh as mesh_lib


def _shard_mapped(fn, mesh, n_array_args: int):
  """Runs `fn` per-device on the local batch shard via jax.shard_map.

  `fn`'s first `n_array_args` arguments are batch-major arrays sharded on
  axis 0 over the mesh's data axis; anything else (params) rides in via
  closure, which shard_map treats as replicated. Because each device
  traces a plain unsharded forward, Pallas kernels (the window warp)
  work as-is — no SPMD partitioning rules needed; `check_vma=False`
  because pallas_call outputs carry no varying-mesh-axes annotation.
  """
  import jax.sharding as shd
  spec = shd.PartitionSpec(mesh_lib.DATA_AXIS)
  return jax.shard_map(
      fn, mesh=mesh,
      in_specs=(spec,) * n_array_args,
      out_specs=spec, check_vma=False)


class ShardedInterpolator:
  """Patch-tiled interpolation with patches sharded over a mesh.

  Usage:
    mesh = parallel.create_mesh()
    interp = ShardedInterpolator(params, options, mesh, block_shape=(4, 4))
    mid = interp(x0, x1, dt)      # (1, H, W, 3) numpy in / numpy out
  """

  def __init__(self, params: Any, options: Options, mesh,
               block_shape: Sequence[int],
               align: Optional[int] = 64):
    self._options = options
    self._mesh = mesh
    self._block_shape = tuple(block_shape)
    self._align = align
    self._params = mesh_lib.replicate(params, mesh)
    model = FilmNet(options)

    replicated = mesh_lib.replicated(mesh)
    sharded = mesh_lib.batch_sharded(mesh)

    # The per-shard forward runs under shard_map: each device sees its
    # local patch sub-batch as a plain unsharded array, so the Pallas
    # window warp (options.warp_impl 'auto'/'window') runs per-device —
    # no gather fallback, no GSPMD partitioning of the custom call.
    @functools.partial(
        jax.jit,
        static_argnums=(4,),
        in_shardings=(replicated, sharded, sharded, sharded),
        out_shardings=sharded)
    def _forward(params, x0, x1, time, align):
      def per_shard(x0, x1, time):
        if align is not None:
          x0p, bbox = tiling.pad_to_align(x0, align)
          x1p, _ = tiling.pad_to_align(x1, align)
        else:
          x0p, x1p, bbox = x0, x1, None
        image = model.apply({'params': params}, x0p, x1p, time)['image']
        if bbox is not None:
          image = tiling.crop_to_bounding_box(image, **bbox)
        return image

      return _shard_mapped(per_shard, mesh, 3)(x0, x1, time)

    self._forward = _forward

  @property
  def num_devices(self) -> int:
    return self._mesh.devices.size

  def __call__(self, x0: np.ndarray, x1: np.ndarray,
               dt: np.ndarray) -> np.ndarray:
    """Interpolates one (1, H, W, 3) pair via mesh-sharded patches."""
    x0 = jnp.asarray(x0, jnp.float32)
    x1 = jnp.asarray(x1, jnp.float32)
    num_patches = int(np.prod(self._block_shape))
    p0 = tiling.image_to_patches(x0, self._block_shape)
    p1 = tiling.image_to_patches(x1, self._block_shape)

    # Pad the patch batch to a multiple of the mesh size; padded entries
    # are dropped after the call.
    n = self.num_devices
    padded = -(-num_patches // n) * n
    if padded != num_patches:
      pad = padded - num_patches
      p0 = jnp.concatenate([p0, jnp.repeat(p0[-1:], pad, 0)], 0)
      p1 = jnp.concatenate([p1, jnp.repeat(p1[-1:], pad, 0)], 0)

    time = jnp.full((padded, 1), np.float32(dt.reshape(-1)[0]))
    p0 = jax.device_put(p0, mesh_lib.batch_sharded(self._mesh))
    p1 = jax.device_put(p1, mesh_lib.batch_sharded(self._mesh))
    time = jax.device_put(time, mesh_lib.batch_sharded(self._mesh))

    out = self._forward(self._params, p0, p1, time, self._align)
    out = out[:num_patches]
    return np.asarray(tiling.patches_to_image(out, self._block_shape))


class ShardedVideoInterpolator:
  """Recursion-tree video expansion with forward batches mesh-sharded.

  The recursion tree's per-depth pairs are independent, so each depth's
  fixed-size forward chunk shards across the data axis of the mesh with
  zero cross-chip communication — an 8-chip slice interpolates 8 tree
  nodes concurrently. Drop-in for Interpolator in the frontier video
  drivers (inference/recursion.py): exposes the same
  `expand_tree_device` contract, with identical outputs (pinned in
  tests/test_parallel_inference.py). Extends the reference's strictly
  sequential batch-1 recursion (eval/util.py:62-91,
  eval/interpolator.py:199-202).
  """

  def __init__(self, params: Any, options: Options, mesh,
               align: Optional[int] = 64,
               max_batch_per_device: int = 1):
    from ..inference import interpolator as interp_lib

    self._mesh = mesh
    self._align = align
    self._options = options
    self._params = mesh_lib.replicate(params, mesh)
    ndev = mesh.devices.size
    self._max_batch = max_batch_per_device * ndev
    model = FilmNet(options)

    replicated = mesh_lib.replicated(mesh)

    # Each depth's forward chunk runs under shard_map: every device
    # traces a plain unsharded forward over its local tree nodes, so the
    # Pallas window warp stays available (no gather fallback); the
    # replicated tree is split on entry and all-gathered on exit by XLA.
    def wrap_forward(forward):
      return lambda x0, x1: _shard_mapped(forward, mesh, 2)(x0, x1)

    # Pin the TREE state (growing sequence, per-depth midpoints) to one
    # consistent replicated sharding. Without this GSPMD chooses per-op
    # shardings for the depth merges and hits an involuntary full
    # rematerialization on each depth's concatenate — a replicate +
    # re-partition of the whole tree per depth on a real mesh.
    def tree_shard(x):
      return jax.lax.with_sharding_constraint(x, replicated)

    @functools.partial(
        jax.jit, static_argnums=(2, 3, 4, 5),
        in_shardings=(replicated, replicated),
        out_shardings=replicated)
    def _expand_tree(params, frames, times, max_batch, align, as_uint8):
      return interp_lib.expand_tree_program(
          model, params, frames, times, max_batch, align, as_uint8,
          batch_quantum=ndev, wrap_forward=wrap_forward,
          tree_shard=tree_shard)

    self._expand_tree = _expand_tree
    self._block_shape = None  # frontier-driver compatibility

  @property
  def num_devices(self) -> int:
    return self._mesh.devices.size

  def expand_tree_device(self, frames: jnp.ndarray,
                         times_to_interpolate: int,
                         max_batch: Optional[int] = None,
                         as_uint8: bool = False) -> jnp.ndarray:
    from ..inference import interpolator as interp_lib

    frames = jnp.asarray(frames)
    if frames.dtype == jnp.uint8:
      frames = interp_lib._u8_to_unit_f32(frames)
    else:
      frames = frames.astype(jnp.float32)
    frames = jax.device_put(frames, mesh_lib.replicated(self._mesh))
    max_batch = max_batch or self._max_batch
    ndev = self.num_devices
    max_batch = -(-max_batch // ndev) * ndev
    return self._expand_tree(self._params, frames, times_to_interpolate,
                             max_batch, self._align, as_uint8)


class SpatialShardedInterpolator:
  """One full frame interpolated across the mesh: H-dim (row) sharding.

  Patch tiling (ShardedInterpolator) changes semantics at patch borders
  exactly like the reference's block mode (eval/interpolator.py:192-206);
  this class instead shards the ROWS of a single full-frame forward over
  the mesh and lets XLA GSPMD insert the halo exchanges for convs, pools,
  and resizes — the output is the full-frame result, bit-comparable to
  one big chip.

  Warps keep the Pallas window kernel (warp_impl='window_rows',
  ops/warp_window.backward_warp_window_rows): each warp site drops into a
  shard_map where every device all-gathers the source rows and warps its
  LOCAL slab of output rows — full-frame clamping semantics, 1/n of the
  warp compute per device. (GSPMD cannot partition the Pallas custom
  call itself, which previously forced the ~4.5x slower XLA gather at
  every site.) Small planes still route to the gather, which GSPMD
  partitions cleanly. `warp_impl='gather'` remains available via the
  options for comparison.

  This is the multi-chip latency play: throughput scales with chips via
  batch/patch/video sharding; spatial sharding is how a SINGLE frame's
  latency drops on a v5e slice, with collectives riding ICI.
  """

  def __init__(self, params: Any, options: Options, mesh,
               align: Optional[int] = 64):
    import dataclasses
    if options.warp_impl != 'window_rows':
      # All warp impls are numerically equivalent; 'window_rows' keeps
      # the Pallas kernel wherever it applies and IS the gather for
      # small planes, so it supersedes any single-chip choice here.
      options = dataclasses.replace(options, warp_impl='window_rows')
    # The fused extractor stacks stay ENGAGED here: like the warp, each
    # stack site drops into shard_map under the rows-SPMD context
    # (conv_stack.stack_rows) — a static 2-row halo exchange per device,
    # full-frame semantics, 1/n of the stack compute per device. Sites
    # whose per-device slab fails the kernel gates route to the plain
    # folded convs, which GSPMD partitions itself.
    self._options = options
    self._mesh = mesh
    self._align = align
    self._params = mesh_lib.replicate(params, mesh)
    model = FilmNet(options)

    replicated = mesh_lib.replicated(mesh)
    import jax.sharding as shd
    rows = shd.NamedSharding(mesh, shd.PartitionSpec(None, mesh_lib.DATA_AXIS))

    @functools.partial(
        jax.jit, static_argnums=(4,),
        in_shardings=(replicated, rows, rows, replicated),
        out_shardings=rows)
    def _forward(params, x0, x1, time, align):
      if align is not None:
        x0, bbox = tiling.pad_to_align(x0, align)
        x1, _ = tiling.pad_to_align(x1, align)
      image = model.apply({'params': params}, x0, x1, time)['image']
      if align is not None:
        image = tiling.crop_to_bounding_box(image, **bbox)
      return image

    self._forward = _forward

  @property
  def num_devices(self) -> int:
    return self._mesh.devices.size

  def __call__(self, x0: np.ndarray, x1: np.ndarray,
               dt: np.ndarray) -> np.ndarray:
    """Interpolates one (1, H, W, 3) pair with rows sharded over the mesh."""
    from ..ops import warp as warp_lib
    x0 = jnp.asarray(x0, jnp.float32)
    x1 = jnp.asarray(x1, jnp.float32)
    time = jnp.asarray(dt, jnp.float32).reshape(1, 1)
    # The mesh context feeds the 'window_rows' warp sites at TRACE time
    # (the compiled executable bakes it in; re-entry is a cache hit).
    with warp_lib.spmd_rows_mesh(self._mesh, mesh_lib.DATA_AXIS):
      out = self._forward(self._params, x0, x1, time, self._align)
    return np.asarray(out)
