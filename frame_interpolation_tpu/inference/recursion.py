"""Recursive midpoint interpolation drivers.

Reference semantics (eval/util.py:62-153 in google-research/frame-interpolation):
given frames [f_0 .. f_{n-1}] and `times_to_interpolate` = T, emit, in time
order, every input frame plus 2^T - 1 interpolated midpoints between each
consecutive pair — (n-1) * 2^T + 1 frames total, streamed as a generator.

Two drivers are provided:

  * `interpolate_recursively` — a faithful in-order DFS generator, matching
    the reference's evaluation order exactly (useful for verification and
    for streaming minimal-latency output of the earliest frames).
  * `interpolate_frontier` — the TPU-native driver: nodes at the same depth
    of the recursion tree are independent, so each depth is interpolated as
    ONE batched device call (breadth-first over the whole frame sequence).
    Identical outputs, but the device sees batch sizes that double per depth
    instead of a stream of batch-1 calls; batches are chunked to
    `max_batch` to bound HBM. This is the semantics-preserving
    batched-recursion optimization anticipated in SURVEY.md §7.
"""
from __future__ import annotations

import os
from typing import Callable, Generator, Iterable, List, Optional, Sequence

import numpy as np

from .interpolator import Interpolator

ProgressFn = Callable[[int], None]


def _host_f32(f) -> np.ndarray:
  """Host-side image normalization: uint8 -> f32/255, floats unchanged."""
  f = np.asarray(f)
  return f.astype(np.float32) / 255.0 if f.dtype == np.uint8 else f


def _recursive_generator(
    frame1: np.ndarray, frame2: np.ndarray, num_recursions: int,
    interpolator: Interpolator,
    progress: Optional[ProgressFn] = None
) -> Generator[np.ndarray, None, None]:
  """In-order DFS: yields frame1 and all midpoints, excluding frame2."""
  if num_recursions == 0:
    yield frame1
    return
  time = np.full((1,), 0.5, dtype=np.float32)
  mid_frame = interpolator(frame1[np.newaxis, ...], frame2[np.newaxis, ...],
                           time)[0]
  if progress is not None:
    progress(1)
  yield from _recursive_generator(frame1, mid_frame, num_recursions - 1,
                                  interpolator, progress)
  yield from _recursive_generator(mid_frame, frame2, num_recursions - 1,
                                  interpolator, progress)


def interpolate_recursively(
    frames: Sequence[np.ndarray], times_to_interpolate: int,
    interpolator: Interpolator,
    progress: Optional[ProgressFn] = None) -> Iterable[np.ndarray]:
  """Reference-parity streaming driver (eval/util.py:125-153 semantics)."""
  n = len(frames)
  for i in range(1, n):
    yield from _recursive_generator(frames[i - 1], frames[i],
                                    times_to_interpolate, interpolator,
                                    progress)
  yield frames[-1]


def interpolate_recursively_from_files(
    frame_paths: Sequence[str], times_to_interpolate: int,
    interpolator: Interpolator,
    progress: Optional[ProgressFn] = None) -> Iterable[np.ndarray]:
  """Streaming driver that loads frames on demand (eval/util.py:94-123).

  Keeps at most one input pair in host memory at a time, for arbitrarily
  long videos.
  """
  from ..io import images
  n = len(frame_paths)
  for i in range(1, n):
    yield from _recursive_generator(images.read_image(frame_paths[i - 1]),
                                    images.read_image(frame_paths[i]),
                                    times_to_interpolate, interpolator,
                                    progress)
  yield images.read_image(frame_paths[-1])


def interpolate_recursively_cached(
    frames: Sequence[np.ndarray], times_to_interpolate: int,
    interpolator: Interpolator,
    progress: Optional[ProgressFn] = None,
    as_uint8: bool = False) -> Generator[np.ndarray, None,
                                         None]:
  """In-order DFS with per-frame FEATURE CACHING (PERF.md item 5).

  `frames` may be arrays or file paths (loaded lazily, one pair at a
  time). Identical outputs and evaluation order as
  `interpolate_recursively`, but
  each frame's feature pyramid is computed once and reused by every pair it
  appears in (~13% fewer FLOPs at depth >= 1; the naive driver recomputes
  features twice per midpoint). Features stay device-resident along the
  DFS path only — peak feature memory is (T + 1) frames, independent of
  sequence length. Reference semantics: eval/util.py:62-153.
  """
  import jax

  def load(frame):
    if isinstance(frame, (str, os.PathLike)):
      from ..io import images
      return images.read_image(os.fspath(frame))
    return np.asarray(frame, np.float32)

  def emit_host(frame):
    # Input frames stay on the host; quantize with the same writers' rule
    # the device applies to midpoints (io.images.to_uint8).
    if as_uint8:
      from ..io import images
      return images.to_uint8(frame)
    return frame

  if len(frames) < 2 or times_to_interpolate <= 0:
    for frame in frames:
      yield emit_host(load(frame))
    return
  first = load(frames[0])
  orig_hw = first.shape[0], first.shape[1]

  def features(frame):
    return interpolator.features_device(frame[np.newaxis])

  def recurse(frame1, feat1, frame2, feat2, depth):
    if depth == 0:
      yield frame1
      return
    mid_dev, mid_feat = interpolator.midpoint_from_features_device(
        feat1, feat2, orig_hw, as_uint8=as_uint8)
    mid = np.asarray(jax.device_get(mid_dev))[0]
    if progress is not None:
      progress(1)
    yield from recurse(frame1, feat1, mid, mid_feat, depth - 1)
    yield from recurse(mid, mid_feat, frame2, feat2, depth - 1)

  # Frames are only ever YIELDED (the compute path runs on features), so
  # input frames can be pre-quantized; device midpoints arrive quantized.
  right = first
  right_feat = features(first)
  for i in range(1, len(frames)):
    left, left_feat = emit_host(right), right_feat
    right = load(frames[i])
    right_feat = features(right)
    yield from recurse(left, left_feat, right, right_feat,
                       times_to_interpolate)
  yield emit_host(right)


def num_output_frames(num_inputs: int, times_to_interpolate: int) -> int:
  """(n-1) * 2^T + 1 — total frames emitted, inputs included."""
  return (num_inputs - 1) * 2**times_to_interpolate + 1


def num_interpolated_frames(num_inputs: int, times_to_interpolate: int) -> int:
  """(n-1) * (2^T - 1) — midpoints only, as the reference's tqdm total."""
  return (num_inputs - 1) * (2**times_to_interpolate - 1)


def frontier_pairs_per_chunk(frame_nbytes: int, times_to_interpolate: int,
                             memory_budget_bytes: int) -> int:
  """Input pairs whose expanded recursion trees fit the device budget.

  The frontier driver holds pairs * 2^T + 1 frames device-resident; the
  reference instead streams with O(1) frames (eval/util.py:62-123), so
  bounding the chunk keeps peak HBM independent of sequence length while
  preserving the batched-tree speedup within a chunk.

  The per-pair estimate carries a x3 expansion-overhead factor: inside
  _expand_tree the final depth transiently holds seq, mids, and the merged
  stack in f32 before any uint8 cast (~3x the finished tree), and the
  streaming driver keeps two chunks resident during fetch/compute overlap
  (that part is budgeted by interpolate_frontier_streaming's halving).
  """
  expansion_overhead = 3
  tree = max(1, frame_nbytes) * 2**times_to_interpolate * expansion_overhead
  return max(1, (memory_budget_bytes - frame_nbytes) // tree)


def interpolate_frontier_streaming(
    frames: Sequence, times_to_interpolate: int,
    interpolator: Interpolator,
    max_batch: int = 8,
    pairs_per_chunk: Optional[int] = None,
    memory_budget_bytes: int = 4 << 30,
    progress: Optional[ProgressFn] = None,
    as_uint8: bool = False,
    pipeline_depth: int = 2
) -> Generator[np.ndarray, None, None]:
  """Batched frontier recursion with bounded device memory.

  Splits the input sequence into chunks of consecutive pairs, expands each
  chunk's recursion trees with `interpolate_frontier`, and streams frames in
  time order. Outputs are identical to `interpolate_frontier` on the full
  sequence (and so to the reference's streaming DFS, eval/util.py:94-123),
  but peak device memory is (pairs_per_chunk * 2^T + 1) frames regardless of
  sequence length.

  Args:
    frames: input frames — (H, W, 3) float32 arrays or file paths (loaded
      lazily, one chunk at a time).
    times_to_interpolate: recursion depth T.
    interpolator: the model wrapper.
    max_batch: device batch cap for each frontier call.
    pairs_per_chunk: input pairs expanded per device chunk; default sizes
      it from `memory_budget_bytes`.
    memory_budget_bytes: device-memory budget used to derive the default
      `pairs_per_chunk` (model activations live outside this budget).
    progress: optional callback receiving the number of frames just produced.
    as_uint8: quantize frames to uint8 on device (the writers' exact rule)
      before fetching — a quarter of the device->host volume.
    pipeline_depth: chunks kept in flight ahead of the fetch (>= 1). Depth
      2 lets the fetch of chunk k overlap the compute of chunks k+1 AND
      k+2, hiding fetches that outlast one chunk's compute (the round-2
      residual video/pair gap); the memory budget is split depth+1 ways.

  Yields:
    (n-1) * 2^T + 1 frames in time order, inputs included. The fetch of
    each chunk overlaps the compute of the next (dispatch is async), so
    sustained throughput approaches max(compute, fetch) instead of their
    sum.
  """

  def load(frame):
    if isinstance(frame, (str, os.PathLike)):
      # Raw uint8: expand_tree_device converts in-jit (bit-identical to
      # read_image) at a quarter of the H2D volume.
      from ..io import images
      return images.read_image_uint8(os.fspath(frame))
    return frame

  def emit(frame):
    from ..io import images
    if as_uint8:
      return images.to_uint8(frame)
    if frame.dtype == np.uint8:
      # Keep the f32 output contract when inputs rode the uint8 path.
      return frame.astype(np.float32) / 255.0
    return frame

  n = len(frames)
  if n == 0:
    return
  first = load(frames[0])
  if n < 2 or times_to_interpolate <= 0:
    yield emit(first)
    for frame in frames[1:]:
      yield emit(load(frame))
    return
  tiled = (interpolator._block_shape is not None and
           int(np.prod(interpolator._block_shape)) > 1)
  # Tiled expansion runs as one program too (the tree commutes with patch
  # tiling — inference/cached_tree.py); only the legacy per-pair fallback
  # (FI_TREE_CACHED=0) loops midpoints host-side without overlap.
  tiled_legacy = tiled and os.environ.get('FI_TREE_CACHED', '1') == '0'
  pipeline_depth = max(1, int(pipeline_depth))
  if pairs_per_chunk is None:
    # depth+1 chunks are resident while the fetch of one overlaps the
    # compute of the in-flight ones, so each gets a budget share. The
    # device tree is f32 regardless of the input frames' dtype.
    frame_f32_nbytes = int(first.size) * 4
    pairs_per_chunk = frontier_pairs_per_chunk(
        frame_f32_nbytes, times_to_interpolate,
        memory_budget_bytes if tiled_legacy
        else memory_budget_bytes // (pipeline_depth + 1))

  def chunks():
    boundary = first
    for start in range(0, n - 1, pairs_per_chunk):
      stop = min(start + pairs_per_chunk, n - 1)
      chunk = [boundary] + [load(f) for f in frames[start + 1:stop + 1]]
      yield chunk, stop == n - 1
      boundary = chunk[-1]

  if tiled_legacy:
    # Patch tiling is per-pair; no single-program expansion to overlap.
    for chunk, last in chunks():
      expanded = interpolate_frontier(chunk, times_to_interpolate,
                                      interpolator, max_batch=max_batch,
                                      progress=progress, as_uint8=as_uint8)
      for frame in expanded[:len(expanded) if last else -1]:
        yield frame
    return

  # Chunks are independent (each consumes only INPUT frames), so the
  # device->host fetch of chunk k runs while chunks k+1..k+depth compute:
  # dispatch is async, only jax.device_get blocks. On tunneled TPU hosts
  # the fetch is comparable to the compute, so this overlap nearly doubles
  # sustained video throughput; depth 2 additionally hides fetches that
  # outlast a single chunk's compute.
  def dispatch(chunk):
    # All-uint8 chunks ride the uint8 H2D path (expand_tree_device
    # converts in-jit); MIXED dtypes must normalize on host first —
    # np.stack would silently promote uint8 frames at 0-255 scale into
    # the f32 tree.
    arrays = [np.asarray(f) for f in chunk]
    if all(a.dtype == np.uint8 for a in arrays):
      stacked = np.stack(arrays)
    else:
      stacked = np.stack([_host_f32(a) for a in arrays])
    return interpolator.expand_tree_device(
        stacked, times_to_interpolate, max_batch=max_batch,
        as_uint8=as_uint8)

  import collections
  pending = collections.deque()  # (device_array, is_last, n_chunk_inputs)
  for chunk, last in chunks():
    pending.append((dispatch(chunk), last, len(chunk)))
    if len(pending) > pipeline_depth:
      yield from _fetch_expanded(*pending.popleft(), progress)
  while pending:
    yield from _fetch_expanded(*pending.popleft(), progress)


def _fetch_expanded(out_dev, last: bool, n_chunk_inputs: int,
                    progress: Optional[ProgressFn]
                    ) -> Generator[np.ndarray, None, None]:
  """Fetches one expanded chunk and yields its frames in time order.

  Drops the final frame unless `last`: it is the next chunk's first input
  frame, which that chunk re-emits.
  """
  import jax
  stacked = np.asarray(jax.device_get(out_dev))
  if progress is not None:
    progress(stacked.shape[0] - n_chunk_inputs)
  stop = stacked.shape[0] if last else stacked.shape[0] - 1
  for i in range(stop):
    yield stacked[i]


def interpolate_frontier(
    frames: Sequence[np.ndarray], times_to_interpolate: int,
    interpolator: Interpolator,
    max_batch: int = 8,
    progress: Optional[ProgressFn] = None,
    as_uint8: bool = False) -> List[np.ndarray]:
  """Breadth-first batched recursion: one device batch per tree depth.

  Args:
    frames: input frames, each (H, W, 3) float32 in [0, 1].
    times_to_interpolate: recursion depth T; 2^T - 1 midpoints per pair.
    interpolator: the model wrapper.
    max_batch: chunk size cap for each batched device call.
    progress: optional callback receiving the number of frames just produced.
    as_uint8: quantize frames to uint8 ON DEVICE with the exact
      io.images.to_uint8 rule before fetching — identical written
      PNG/mp4 bytes at a quarter of the device->host volume (the fetch,
      not the compute, bounds video throughput on tunneled TPU hosts).

  Returns:
    The full time-ordered frame list, (n-1) * 2^T + 1 frames.
  """
  host_f32 = _host_f32

  if len(frames) < 2 or times_to_interpolate <= 0:
    from ..io import images
    return ([images.to_uint8(f) for f in frames] if as_uint8
            else [host_f32(f) for f in frames])
  import jax
  import jax.numpy as jnp

  # Patch tiling rides the single-program expansion too (the tree commutes
  # with tiling — inference/cached_tree.py handles the fold/unfold
  # in-program); FI_TREE_CACHED=0 restores the legacy per-pair loop.
  tiled = (interpolator._block_shape is not None and
           int(np.prod(interpolator._block_shape)) > 1)
  tiled_legacy = tiled and os.environ.get('FI_TREE_CACHED', '1') == '0'
  if not tiled_legacy:
    # The ENTIRE expansion — every depth, its forward chunks, and the
    # time-order interleave — is one jitted device program: one dispatch,
    # one batched fetch. Per-midpoint device calls pay a dispatch
    # round-trip each, which dominates on remote-tunneled TPU hosts.
    # uint8 inputs stay uint8 through the H2D transfer (expand_tree_device
    # converts in-jit, bit-identically to io.images.read_image).
    arrays = [np.asarray(f) for f in frames]
    if all(a.dtype == np.uint8 for a in arrays):
      stacked_in = np.stack(arrays)
    else:
      stacked_in = np.stack([host_f32(a) for a in arrays])
    out = interpolator.expand_tree_device(stacked_in, times_to_interpolate,
                                          max_batch=max_batch,
                                          as_uint8=as_uint8)
    stacked = np.asarray(jax.device_get(out))
    if progress is not None:
      progress(stacked.shape[0] - len(frames))
    return [stacked[i] for i in range(stacked.shape[0])]

  sequence = [jnp.asarray(host_f32(f)) for f in frames]
  for _ in range(times_to_interpolate):
    pairs0 = sequence[:-1]
    pairs1 = sequence[1:]
    mids = []
    for start in range(0, len(pairs0)):
      x0 = pairs0[start][None]
      x1 = pairs1[start][None]
      dt = jnp.full((1,), 0.5, jnp.float32)
      out = interpolator.call_device(x0, x1, dt)
      mids.append(out[0])
      if progress is not None:
        progress(1)
    merged = []
    for i, mid in enumerate(mids):
      merged.append(sequence[i])
      merged.append(mid)
    merged.append(sequence[-1])
    sequence = merged
  # One batched fetch of the final sequence.
  final = jnp.stack(sequence)
  if as_uint8:
    final = (jnp.clip(final.astype(jnp.float32) * 255.0, 0.0, 255.0)
             + 0.5).astype(jnp.uint8)
  stacked = np.asarray(jax.device_get(final))
  return [stacked[i] for i in range(stacked.shape[0])]
