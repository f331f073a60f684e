"""High-level frame interpolation inference API.

TPU-native replacement for the reference's SavedModel wrapper
(eval/interpolator.py:129-209 in google-research/frame-interpolation).
Capabilities match the reference — alignment padding, optional patch
tiling for high resolution — with three TPU-first design changes:

  * The forward pass is a jitted pure function of (params, x0, x1, time),
    cached per padded input shape. Shape bucketing (pad to the alignment
    grid) keeps recursive invocation from triggering recompiles.
  * Patch tiling runs ALL patches as one device batch instead of the
    reference's sequential batch-1 loop (eval/interpolator.py:199-202):
    the fold/unfold is a pure layout transform and the patch batch keeps
    the MXU fed.
  * Inputs are transferred once; recursion-produced frames can stay
    device-resident (`interpolate_device` returns jax arrays).

The model ignores the `time` value and always predicts the midpoint
(reference models/film_net/interpolator.py:157-165); other timestamps come
from recursive invocation, exactly as in the reference.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.film_net import FilmNet
from ..ops import tiling
from ..options import Options
from ..utils import xla_options


# Split-constant reciprocal: XLA rewrites `x / 255.0` into multiplication
# by fl(1/255), which differs from the correctly-rounded division (what
# io.images.read_image computes on the host) in the last ulp for 126 of
# the 256 byte values. x*c_hi + x*c_lo restores exact agreement for all
# 256 values (pinned in tests/test_inference.py).
_U8_C_HI = np.float32(1.0 / 255.0)
_U8_C_LO = np.float32(1.0 / 255.0 - float(np.float32(1.0 / 255.0)))


@jax.jit
def _u8_to_unit_f32(frames: jnp.ndarray) -> jnp.ndarray:
  """uint8 -> [0,1] f32 on device, bit-identical to images.read_image."""
  x = frames.astype(jnp.float32)
  return x * _U8_C_HI + x * _U8_C_LO


def expand_tree_program(model, params, frames, times, max_batch, align,
                        as_uint8, shard=None, batch_quantum=1,
                        wrap_forward=None, tree_shard=None):
  """The whole-recursion-tree expansion, as a traceable program body.

  Expands (N, H, W, 3) f32 `frames` to ((N-1)*2^T + 1, ...) midpoints in
  time order: every depth's pairs run as fixed-size lax.map forward
  chunks, so one jit of this body is one device dispatch for the whole
  tree (see Interpolator.expand_tree_device).

  shard/batch_quantum/wrap_forward/tree_shard: multi-chip hooks
  (parallel/inference.py). `shard` is applied to each per-chunk batch
  (inputs and midpoints) — e.g. a jax.lax.with_sharding_constraint over
  the mesh's batch axis; `wrap_forward` instead wraps the whole
  per-chunk forward (e.g. in jax.shard_map, so Pallas kernels run
  per-device on the local sub-batch); chunk sizes are rounded up to
  `batch_quantum` (the device count) so every forward batch divides
  evenly across the mesh. `tree_shard` pins the sharding of the TREE
  state (the growing frame sequence and each depth's midpoints) to ONE
  consistent PartitionSpec — without it GSPMD picks per-op shardings for
  the depth merges and falls into an involuntary full rematerialization
  on the concats (one full replicate + re-partition per depth).
  """
  shard = shard if shard is not None else (lambda x: x)
  tree_shard = tree_shard if tree_shard is not None else (lambda x: x)

  def forward(x0, x1):
    x0, x1 = shard(x0), shard(x1)
    time = jnp.full((x0.shape[0], 1), 0.5, jnp.float32)
    if align is not None:
      x0p, bbox = tiling.pad_to_align(x0, align)
      x1p, _ = tiling.pad_to_align(x1, align)
    else:
      x0p, x1p, bbox = x0, x1, None
    image = model.apply({'params': params}, x0p, x1p, time)['image']
    if bbox is not None:
      image = tiling.crop_to_bounding_box(image, **bbox)
    return shard(image.astype(frames.dtype))

  if wrap_forward is not None:
    forward = wrap_forward(forward)

  q = batch_quantum
  seq = tree_shard(frames)
  for _ in range(times):
    n = seq.shape[0] - 1
    chunk = min(max(max_batch, q), -(-n // q) * q)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    x0 = seq[:-1]
    x1 = seq[1:]
    if pad:
      filler = jnp.broadcast_to(seq[:1], (pad,) + seq.shape[1:])
      x0 = tree_shard(jnp.concatenate([x0, filler]))
      x1 = tree_shard(jnp.concatenate([x1, filler]))
    shape = (n_chunks, chunk) + seq.shape[1:]
    mids = jax.lax.map(lambda ab: forward(ab[0], ab[1]),
                       (x0.reshape(shape), x1.reshape(shape)))
    mids = tree_shard(mids.reshape((n_chunks * chunk,) + seq.shape[1:])[:n])
    merged = jnp.stack([seq[:-1], mids], axis=1)
    merged = merged.reshape((2 * n,) + seq.shape[1:])
    seq = tree_shard(jnp.concatenate([merged, seq[-1:]]))
  if as_uint8:
    # The io.images.to_uint8 rule (clip, *255, round half up), applied
    # in-jit: the PNG/mp4 writers consume uint8, and fetching uint8
    # quarters the D2H volume — material on tunneled TPU hosts where
    # the fetch, not the compute, bounds video throughput.
    seq = (jnp.clip(seq.astype(jnp.float32) * 255.0, 0.0, 255.0)
           + 0.5).astype(jnp.uint8)
  return seq


class Interpolator:
  """Generates the frame between two frames with the film_net model.

  Usage:
    interp = Interpolator(params, options, align=64)
    mid = interp(x0_batch, x1_batch, dt_batch)   # numpy in, numpy out

  Matches the reference API (eval/interpolator.py): `interpolate` applies
  alignment padding only; `__call__` additionally applies patch tiling when
  `block_shape` spans more than one block.
  """

  def __init__(self,
               params: Any,
               options: Options,
               align: Optional[int] = 64,
               block_shape: Optional[Sequence[int]] = None) -> None:
    self._options = options
    self._params = params
    self._align = align or None
    self._block_shape = tuple(block_shape) if block_shape else None
    model = FilmNet(options)

    # Pad -> model -> crop runs as ONE jitted program: pad amounts are
    # static per input shape (jit specializes on shapes), so nothing
    # dispatches eagerly — important on remote-tunneled TPU devices.
    @functools.partial(jax.jit, static_argnums=(4,))
    def _forward(params, x0, x1, time, align):
      if align is not None:
        x0, bbox = tiling.pad_to_align(x0, align)
        x1, _ = tiling.pad_to_align(x1, align)
      out = model.apply({'params': params}, x0, x1, time)
      image = out['image']
      if align is not None:
        image = tiling.crop_to_bounding_box(image, **bbox)
      return image

    self._forward = xla_options.aot_jit(_forward, static_argnums=(4,))

    @functools.partial(jax.jit, static_argnums=(4,))
    def _forward_all(params, x0, x1, time, align):
      if align is not None:
        x0p, bbox = tiling.pad_to_align(x0, align)
        x1p, _ = tiling.pad_to_align(x1, align)
      else:
        x0p, x1p, bbox = x0, x1, None
      outputs = dict(model.apply({'params': params}, x0p, x1p, time))
      if bbox is not None:
        outputs['image'] = tiling.crop_to_bounding_box(
            outputs['image'], **bbox)
      return outputs

    self._forward_all = xla_options.aot_jit(_forward_all, static_argnums=(4,))

    # Feature-caching split (PERF.md item 5): the midpoint-recursion tree
    # evaluates each frame in up to three pairs; these entry points let the
    # recursion drivers compute feat_net once per frame. Zero-padding after
    # cropping reproduces the uncached path bit-for-bit, so cached and
    # uncached recursion agree (pinned in tests/test_inference.py).
    @functools.partial(jax.jit, static_argnums=(2,))
    def _features(params, x, align):
      if align is not None:
        x, _ = tiling.pad_to_align(x, align)
      return model.apply({'params': params}, x,
                         method=model.extract_features)

    self._features = xla_options.aot_jit(_features, static_argnums=(2,))

    @functools.partial(jax.jit, static_argnums=(4, 5, 6))
    def _mid_and_features(params, f0, f1, time, orig_hw, align, as_uint8):
      out = model.apply({'params': params}, f0, f1, time,
                        method=model.interpolate_from_features)
      image = out['image']
      if align is not None:
        height, width = orig_hw
        padded_h, padded_w = image.shape[1], image.shape[2]
        top = (padded_h - height) // 2
        left = (padded_w - width) // 2
        image = tiling.crop_to_bounding_box(
            image, offset_height=top, offset_width=left,
            target_height=height, target_width=width)
        repadded, _ = tiling.pad_to_align(image, align)
      else:
        repadded = image
      features = model.apply({'params': params}, repadded,
                             method=model.extract_features)
      if as_uint8:
        # The writers' exact quantization rule, applied in-jit: a quarter
        # of the per-frame fetch (the recursion keeps feeding the f32
        # `repadded` path, so outputs are unchanged).
        image = (jnp.clip(image.astype(jnp.float32) * 255.0, 0.0, 255.0)
                 + 0.5).astype(jnp.uint8)
      return image, features

    self._mid_and_features = xla_options.aot_jit(_mid_and_features, static_argnums=(4, 5, 6))

    # Whole-recursion-tree expansion as ONE jitted program: the frontier
    # driver's per-depth device calls each pay a dispatch round-trip (severe
    # on remote-tunneled TPUs); here every depth, its fixed-size forward
    # chunks (lax.map), and the time-order interleave run device-side, so a
    # chunk of the video costs one dispatch and one fetch.
    @functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
    def _expand_tree(params, frames, times, max_batch, align, as_uint8):
      return expand_tree_program(model, params, frames, times, max_batch,
                                 align, as_uint8)

    self._expand_tree = xla_options.aot_jit(_expand_tree, static_argnums=(2, 3, 4, 5))

    # Feature-cached variant (inference/cached_tree.py): same semantics,
    # ~19% less compute — each frame's feature pyramids are extracted once
    # and threaded through the DFS instead of re-derived per pair.
    @functools.partial(jax.jit, static_argnums=(2, 3, 4))
    def _expand_tree_cached(params, frames, times, align, as_uint8):
      from .cached_tree import expand_tree_cached_program
      return expand_tree_cached_program(model, params, frames, times, align,
                                        as_uint8)

    self._expand_tree_cached = xla_options.aot_jit(
        _expand_tree_cached, static_argnums=(2, 3, 4))

    # Tiled variant: the recursion tree commutes with patch tiling, so the
    # whole 4K tree runs as lax.map over per-patch cached trees — one
    # dispatch instead of one per pair per depth (inference/cached_tree.py).
    @functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
    def _expand_tree_tiled(params, frames, times, align, as_uint8,
                           block_shape):
      from .cached_tree import expand_tree_cached_tiled_program
      return expand_tree_cached_tiled_program(model, params, frames, times,
                                              align, as_uint8, block_shape)

    self._expand_tree_tiled = xla_options.aot_jit(
        _expand_tree_tiled, static_argnums=(2, 3, 4, 5))

  def expand_tree_device(self, frames: jnp.ndarray, times_to_interpolate: int,
                         max_batch: int = 8,
                         as_uint8: bool = False,
                         cached: Optional[bool] = None) -> jnp.ndarray:
    """Expands (N, H, W, 3) frames to ((N-1)*2^T + 1, H, W, 3) on device.

    With `as_uint8` the returned frames are quantized on device with the
    exact io.images.to_uint8 rule (what write_image/write_video apply
    anyway), quartering the device->host fetch. uint8 INPUT frames (e.g.
    raw PNG bytes from io.images.read_image_uint8) are accepted directly:
    they transfer at a quarter of the f32 volume and are converted on
    device in a SEPARATE tiny jit, so the tree program is the identical
    f32 executable and the outputs are bit-identical to the f32-input
    path (IEEE u8->f32 /255 matches the host conversion exactly; fusing
    the convert INTO the tree program would let XLA reassociate it with
    the model's bf16 casts and flip rare quantization-boundary pixels —
    caught by the verify drive on the reference photos).

    `cached` selects the feature-cached DFS program (same semantics,
    agreement to float noise, ~19% less compute —
    inference/cached_tree.py); default is on, overridable per call or via
    FI_TREE_CACHED=0. With patch tiling active (block_shape > 1) the
    cached path expands every patch's tree in one program and reassembles
    at the end (the tree commutes with tiling); the chunked path does not
    support tiling.
    """
    import os
    frames = jnp.asarray(frames)
    if frames.dtype == jnp.uint8:
      frames = _u8_to_unit_f32(frames)
    else:
      frames = frames.astype(jnp.float32)
    if cached is None:
      cached = os.environ.get('FI_TREE_CACHED', '1') != '0'
    tiled = (self._block_shape is not None
             and int(np.prod(self._block_shape)) > 1)
    if tiled:
      return self._expand_tree_tiled(self._params, frames,
                                     times_to_interpolate, self._align,
                                     as_uint8, self._block_shape)
    if cached:
      return self._expand_tree_cached(self._params, frames,
                                      times_to_interpolate, self._align,
                                      as_uint8)
    return self._expand_tree(self._params, frames,
                             times_to_interpolate, max_batch, self._align,
                             as_uint8)

  def features_device(self, x: jnp.ndarray):
    """Reusable (image_pyramid, feature_pyramid) for frames (B, H, W, 3)."""
    return self._features(self._params, jnp.asarray(x, jnp.float32),
                          self._align)

  def midpoint_from_features_device(self, f0, f1, orig_hw,
                                    as_uint8: bool = False):
    """Midpoint frame (cropped to `orig_hw`) plus ITS features.

    The returned features equal features_device(midpoint) exactly, so
    cached recursion reproduces the uncached one. `as_uint8` quantizes
    the returned frame on device with the writers' exact rule (the
    recursion itself keeps consuming the full-precision features).
    """
    batch = f0[0][0].shape[0]
    time = jnp.full((batch, 1), 0.5, jnp.float32)
    return self._mid_and_features(self._params, f0, f1, time,
                                  tuple(orig_hw), self._align, as_uint8)

  @property
  def options(self) -> Options:
    return self._options

  @property
  def params(self) -> Any:
    return self._params

  # ---- device-resident path -------------------------------------------------

  def interpolate_device(self, x0: jnp.ndarray, x1: jnp.ndarray,
                         dt: jnp.ndarray) -> jnp.ndarray:
    """Pads to alignment, runs the model, crops back. Stays on device.

    Args:
      x0, x1: (B, H, W, 3) float32 arrays in [0, 1].
      dt: (B,) sub-frame times (the model fixes t=0.5 internally).

    Returns:
      (B, H, W, 3) interpolated frames as a device array.
    """
    time = dt[..., None].astype(jnp.float32)
    return self._forward(self._params, x0, x1, time, self._align)

  def interpolate_all_outputs(self, x0, x1, dt) -> Dict[str, Any]:
    """Full forward returning aux outputs (flows, warps); pads/crops image."""
    time = jnp.asarray(dt)[..., None].astype(jnp.float32)
    return dict(self._forward_all(self._params, jnp.asarray(x0),
                                  jnp.asarray(x1), time, self._align))

  def call_device(self, x0: jnp.ndarray, x1: jnp.ndarray,
                  dt: jnp.ndarray) -> jnp.ndarray:
    """`interpolate_device` with optional patch tiling (batched, one call)."""
    if self._block_shape is not None and int(np.prod(self._block_shape)) > 1:
      x0_patches = tiling.image_to_patches(x0, self._block_shape)
      x1_patches = tiling.image_to_patches(x1, self._block_shape)
      num_patches = x0_patches.shape[0]
      dt_patches = jnp.broadcast_to(dt[:1], (num_patches,))
      # One batched device call over all patches — the reference loops
      # sequentially at batch 1 here (eval/interpolator.py:199-202).
      out = self.interpolate_device(x0_patches, x1_patches, dt_patches)
      return tiling.patches_to_image(out, self._block_shape)
    return self.interpolate_device(x0, x1, dt)

  # ---- reference-compatible numpy API ---------------------------------------

  def interpolate(self, x0: np.ndarray, x1: np.ndarray,
                  dt: np.ndarray) -> np.ndarray:
    """Reference-parity interpolate: numpy in, numpy out."""
    out = self.interpolate_device(
        jnp.asarray(x0, jnp.float32), jnp.asarray(x1, jnp.float32),
        jnp.asarray(dt, jnp.float32))
    return np.asarray(out)

  def __call__(self, x0: np.ndarray, x1: np.ndarray,
               dt: np.ndarray) -> np.ndarray:
    out = self.call_device(
        jnp.asarray(x0, jnp.float32), jnp.asarray(x1, jnp.float32),
        jnp.asarray(dt, jnp.float32))
    return np.asarray(out)


def load_interpolator(model_path: str,
                      align: Optional[int] = 64,
                      block_shape: Optional[Sequence[int]] = None,
                      dtype_policy: Optional[str] = None) -> Interpolator:
  """Loads an Interpolator from a saved parameter bundle.

  Accepts either this framework's native orbax/msgpack bundles
  (io/params_io.py) or a TF2 SavedModel / checkpoint directory from the
  reference release (io/tf_import.py).
  """
  from ..io import params_io  # local import: keeps inference import-light
  params, options = params_io.load_params(model_path)
  if dtype_policy is not None and dtype_policy != options.dtype_policy:
    import dataclasses
    options = dataclasses.replace(options, dtype_policy=dtype_policy)
  return Interpolator(params, options, align=align, block_shape=block_shape)
