"""Feature-cached whole-tree expansion: one jitted program, zero re-extraction.

The chunked tree program (interpolator.expand_tree_program) re-runs the
feature extractor on BOTH endpoints of every pair at every depth — the
reference's recursion does the same (eval/util.py:62-91 calls the full
model per midpoint), wasting ~26% of pair FLOPs. The host-side cached DFS
driver (recursion.interpolate_recursively_cached) removes the waste but
pays one device dispatch per midpoint, which dominates on remote-tunneled
TPU hosts.

This module combines both: the ENTIRE recursion tree of a pair runs as one
`lax.scan` over a static DFS schedule, carrying a bounded feature stack —
each frame's (image pyramid, cascaded feature pyramid) is computed exactly
once and reused by every pair that consumes it, and midpoints at the final
depth skip extraction entirely (their features feed nothing).

Memory: the stack holds `times + 2` frames of features (the DFS path bound
— ~0.7 GB/frame at 1080p bf16), independent of the 2^T tree size; the
chunked program instead re-derives features inside every forward, so its
peak is the forward workspace times the chunk batch. At the default video
configuration (pairs_per_chunk=1, batch<=4) the two peaks are comparable
and the cached program does ~19% less compute.

Semantics are identical to `expand_tree_program`: cropping a padded
midpoint and re-padding with zeros reproduces the uncached path's pad
exactly (the same property the host-side cached driver relies on).
Numerically the agreement is to float noise (~1e-7 observed, pinned in
tests/test_inference.py) — this is a different XLA program, so fusion
choices may reassociate float math; semantics-level equality (which
frames come from which parents, every crop/repad seam) is exact.

Reference semantics: eval/util.py:62-91 (in-order midpoint DFS) in
google-research/frame-interpolation.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import tiling


def dfs_schedule(times: int) -> Dict[str, np.ndarray]:
  """Static midpoint-DFS schedule for one pair at recursion depth `times`.

  Returns arrays of length 2^times - 1 (one entry per midpoint, in
  pre-order: parents strictly before children, so a sequential scan can
  consume them):

    a_slot, b_slot: stack slots holding the parent frames' features.
    m_slot: stack slot that receives the midpoint's features.
    out_pos: the midpoint's position in the pair's 2^times-frame output
      block (frame A sits at position 0; frame B belongs to the next pair).
    extract: whether the midpoint's features are needed (False exactly for
      final-depth leaves, whose features feed nothing).

  Slots are reused once a subtree completes; the peak is `times + 2`
  (endpoints + one midpoint per live recursion level).
  """
  a_slots: List[int] = []
  b_slots: List[int] = []
  m_slots: List[int] = []
  out_pos: List[int] = []
  extract: List[bool] = []
  free = list(range(2, times + 2))

  def rec(a: int, b: int, depth: int, lo: int, hi: int) -> None:
    mid = (lo + hi) // 2
    m = free.pop(0)
    a_slots.append(a)
    b_slots.append(b)
    m_slots.append(m)
    out_pos.append(mid)
    extract.append(depth > 1)
    if depth > 1:
      rec(a, m, depth - 1, lo, mid)
      rec(m, b, depth - 1, mid, hi)
    free.insert(0, m)

  if times > 0:
    rec(0, 1, times, 0, 2**times)
  return {
      'a_slot': np.asarray(a_slots, np.int32),
      'b_slot': np.asarray(b_slots, np.int32),
      'm_slot': np.asarray(m_slots, np.int32),
      'out_pos': np.asarray(out_pos, np.int32),
      'extract': np.asarray(extract, np.bool_),
  }


def _quantize_u8(x: jnp.ndarray) -> jnp.ndarray:
  """The io.images.to_uint8 rule (clip, *255, round half up), in-jit."""
  return (jnp.clip(x.astype(jnp.float32) * 255.0, 0.0, 255.0)
          + 0.5).astype(jnp.uint8)


def expand_tree_cached_program(model, params, frames: jnp.ndarray, times: int,
                               align, as_uint8: bool) -> jnp.ndarray:
  """Expands (N, H, W, 3) f32 `frames` to ((N-1)*2^T + 1, ...) in time order.

  Semantics and output bytes match interpolator.expand_tree_program; the
  difference is purely computational — features are extracted once per
  frame and threaded through the DFS instead of re-derived per pair.
  """
  n = int(frames.shape[0])
  frame_shape = tuple(frames.shape[1:])

  def quantize(x):
    return _quantize_u8(x) if as_uint8 else x.astype(frames.dtype)

  if times <= 0 or n < 2:
    return quantize(frames)

  if align is not None:
    padded, bbox = tiling.pad_to_align(frames, align)
  else:
    padded, bbox = frames, None

  def crop(image):
    if bbox is None:
      return image
    return tiling.crop_to_bounding_box(image, **bbox)

  def extract(x):
    return model.apply({'params': params}, x, method=model.extract_features)

  # Features of every input frame, one extraction at a time (bounds the
  # workspace to a single batch-1 extraction; leaves get an (N, ...) prefix).
  feats_all = jax.lax.map(lambda f: extract(f[None]), padded)

  sched = dfs_schedule(times)
  xs = tuple(jnp.asarray(sched[k])
             for k in ('a_slot', 'b_slot', 'm_slot', 'out_pos', 'extract'))
  time = jnp.full((1, 1), 0.5, jnp.float32)
  per_pair = 2**times
  out_dtype = jnp.uint8 if as_uint8 else frames.dtype

  def read_slot(tree, idx):
    return jax.tree_util.tree_map(
        lambda s: jax.lax.dynamic_index_in_dim(s, idx, 0, keepdims=False),
        tree)

  def write_slot(tree, value, idx):
    return jax.tree_util.tree_map(
        lambda s, v: jax.lax.dynamic_update_index_in_dim(s, v, idx, 0),
        tree, value)

  def pair_body(_, i):
    fa = read_slot(feats_all, i)
    fb = read_slot(feats_all, i + 1)
    stack = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate(
            [a[None], b[None],
             jnp.zeros((times,) + a.shape, a.dtype)]), fa, fb)
    out = jnp.zeros((per_pair,) + frame_shape, out_dtype)
    out = jax.lax.dynamic_update_index_in_dim(
        out, quantize(jax.lax.dynamic_index_in_dim(frames, i, 0,
                                                   keepdims=False)), 0, 0)

    def step(carry, x):
      stack, out = carry
      a_slot, b_slot, m_slot, pos, needs_feat = x
      f0 = read_slot(stack, a_slot)
      f1 = read_slot(stack, b_slot)
      result = model.apply({'params': params}, f0, f1, time,
                           method=model.interpolate_from_features)
      cropped = crop(result['image'])  # (1, H, W, 3) f32
      out = jax.lax.dynamic_update_index_in_dim(out, quantize(cropped[0]),
                                                pos, 0)
      if times > 1:
        # The cond selects only the feature VALUE; the stack update runs
        # unconditionally. Putting the cond around the stack itself (a
        # carry passthrough in the false branch) risks XLA copying the
        # multi-GB carry every step instead of aliasing it in place.
        def extract_mid():
          if align is not None:
            repadded, _ = tiling.pad_to_align(cropped, align)
          else:
            repadded = cropped
          return extract(repadded)

        feats = jax.lax.cond(needs_feat, extract_mid, lambda: f0)
        stack = write_slot(stack, feats, m_slot)
      return (stack, out), None

    (_, out), _ = jax.lax.scan(step, (stack, out), xs)
    return None, out

  _, blocks = jax.lax.scan(pair_body, None, jnp.arange(n - 1))
  flat = blocks.reshape(((n - 1) * per_pair,) + frame_shape)
  return jnp.concatenate([flat, quantize(frames[-1:])])


def expand_tree_cached_tiled_program(model, params, frames: jnp.ndarray,
                                     times: int, align, as_uint8: bool,
                                     block_shape: Tuple[int, int]
                                     ) -> jnp.ndarray:
  """Whole-tree expansion under patch tiling, as one device program.

  The reference tiles high-resolution frames into non-overlapping
  block_height x block_width patches and interpolates each patch pair
  independently (eval/interpolator.py:192-206); under recursion the
  reassemble/re-split between depths is an exact inverse pair, so the
  whole tree COMMUTES with tiling: expanding each patch's tree
  independently and reassembling once at the end yields identical frames.

  That observation turns the previous per-midpoint Python loop (one
  device dispatch per pair per depth — the dispatch-bound pattern round 2
  eliminated everywhere else) into one jitted program: `lax.map` over
  patches of the feature-cached tree, so peak memory stays at a single
  patch's tree (stack of times+2 patch-sized feature pyramids) rather
  than the whole frame's.
  """
  n, height, width = int(frames.shape[0]), frames.shape[1], frames.shape[2]
  channels = frames.shape[3]
  bh, bw = block_shape
  ph, pw = height // bh, width // bw
  assert height == ph * bh and width == pw * bw, (
      f'block_shape {block_shape} must evenly divide {(height, width)}')
  # (N, H, W, C) -> (P, N, ph, pw, C), raster patch order.
  patches = frames.reshape(n, bh, ph, bw, pw, channels)
  patches = patches.transpose(1, 3, 0, 2, 4, 5)
  patches = patches.reshape(bh * bw, n, ph, pw, channels)
  out = jax.lax.map(
      lambda seq: expand_tree_cached_program(model, params, seq, times,
                                             align, as_uint8), patches)
  # (P, M, ph, pw, C) -> (M, H, W, C).
  m = out.shape[1]
  out = out.reshape(bh, bw, m, ph, pw, channels)
  out = out.transpose(2, 0, 3, 1, 4, 5)
  return out.reshape(m, height, width, channels)
