"""Pallas TPU kernel for backward bilinear warping.

XLA lowers per-pixel gathers to an index-count-bound scalar loop on TPU
(~70-110 ms for a 1080p x 67-channel warp — measured), which made warping
~80% of film_net's forward time. This kernel restructures the warp to use
only vectorizable primitives:

  * the source image is kept as per-channel (H, W) planes, VMEM-resident
    across all output tiles of that channel block;
  * each output (8, 128) tile loops over the rectangle of source tiles its
    (clamped) query indices touch — bounds are data-dependent scalars, so
    smooth flows (the only kind a trained flow network emits) visit ~2x2
    source tiles while the worst case remains correct;
  * within a source tile, the 2-D per-pixel gather decomposes into 8
    sublane rounds of lane-wise `take_along_axis` (Mosaic dynamic_gather)
    plus masked accumulation of the bilinear tap weights.

Semantics are identical to ops.warp.backward_warp (tfa dense_image_warp
boundary rule); parity is pinned in tests.

STATUS / measured trade-off (v5e, 1088x1920x67 bf16): the kernel is exact
and compiles, but its cost scales with the per-tile index SPREAD (source
tiles visited x 8 sublane rounds): ~250 ms at +/-30 px synthetic-smooth
flow vs ~70 ms for the 2-slice XLA gather formulation in ops.warp — so the
XLA gather remains the production default. The kernel wins only when flows
are near-uniform per tile; future work: per-sublane-round dead-tile
skipping (@pl.when on a wy!=0 reduction) and fusing both warp directions
over one resident plane.

Layout notes: NHWC input is transposed to planar (C, H, W) around the
kernel (XLA transposes are cheap and fuse with neighbors); H/W are padded
to the (8, 128) tile grid with edge-replication handled by index clamping.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .warp import _query_coords

_TH = 8    # output tile rows (sublanes)
_TW = 128  # output tile cols (lanes)


def _warp_kernel(iy_ref, ix_ref, ay_ref, ax_ref, plane_ref, out_ref,
                       *, cb: int, h: int, w: int):
  """One (cb, _TH, _TW) output tile; plane_ref stays VMEM-resident."""
  iy = iy_ref[:]
  ix = ix_ref[:]
  ay = ay_ref[:]
  ax = ax_ref[:]

  ty0 = jnp.min(iy) // _TH
  ty1 = (jnp.max(iy) + 1) // _TH
  tx0 = jnp.min(ix) // _TW
  tx1 = (jnp.max(ix) + 1) // _TW

  def channel_body(c, _):
    def ty_body(ty, acc):
      def tx_body(tx, acc):
        lx = ix - tx * _TW
        taps = []
        for t in (0, 1):
          lxt = lx + t
          in_x = (lxt >= 0) & (lxt < _TW)
          wx = jnp.where(in_x, (1.0 - ax) if t == 0 else ax, 0.0)
          taps.append((jnp.clip(lxt, 0, _TW - 1), wx))

        # One tile-aligned dynamic load per source tile (Mosaic requires
        # dynamic loads at sublane-tile granularity); the 8 sublane rounds
        # are unrolled so row extraction is a static slice.
        src = plane_ref[c,
                        pl.ds(pl.multiple_of(ty * _TH, _TH), _TH),
                        pl.ds(pl.multiple_of(tx * _TW, _TW), _TW)]
        src = src.astype(jnp.float32)
        for s in range(_TH):
          row = jax.lax.broadcast_in_dim(src[s, :], (_TH, _TW), (1,))
          sy = ty * _TH + s
          wy = (jnp.where(iy == sy, 1.0 - ay, 0.0) +
                jnp.where(iy + 1 == sy, ay, 0.0))
          xval = jnp.zeros((_TH, _TW), jnp.float32)
          for lxc, wx in taps:
            xval += wx * jnp.take_along_axis(row, lxc, axis=1)
          acc = acc + wy * xval
        return acc

      return jax.lax.fori_loop(tx0, tx1 + 1, tx_body, acc)

    acc = jax.lax.fori_loop(ty0, ty1 + 1, ty_body,
                            jnp.zeros((_TH, _TW), jnp.float32))
    out_ref[c, :, :] = acc.astype(out_ref.dtype)
    return _

  jax.lax.fori_loop(0, cb, channel_body, 0)


def _round_up(x: int, m: int) -> int:
  return -(-x // m) * m


# VMEM budget for ONE copy of the resident source plane block; Pallas
# double-buffers grid blocks, so ~2x this plus index/output tiles must fit
# in the ~16 MB of VMEM.
_PLANE_VMEM_BUDGET = 5 * 1024 * 1024


def max_channel_block(h: int, w: int, itemsize: int) -> int:
  """Largest channel block whose (cb, Hp, Wp) plane fits the VMEM budget."""
  hp = _round_up(h, _TH)
  wp = _round_up(w, _TW)
  return _PLANE_VMEM_BUDGET // (hp * wp * itemsize)


def backward_warp_pallas(image: jnp.ndarray, flow: jnp.ndarray,
                         channel_block: int | None = None,
                         interpret: bool = False) -> jnp.ndarray:
  """Pallas warp; same semantics as ops.warp.backward_warp.

  Args:
    image: (B, H, W, C).
    flow: (B, H, W, 2), channels (dx, dy).
    channel_block: channels processed per grid step (plane residency is
      channel_block * Hp * Wp * sizeof(dtype) of VMEM); default picks the
      largest block that fits the VMEM budget.
    interpret: run in the Pallas interpreter (for CPU tests).
  """
  b, h, w, c = image.shape
  out_dtype = image.dtype
  if channel_block is None:
    channel_block = min(max(1, max_channel_block(h, w, image.dtype.itemsize)),
                        8, c)
  iy, ix, ay, ax = _query_coords(h, w, flow)

  hp = _round_up(h, _TH)
  wp = _round_up(w, _TW)
  cp = _round_up(c, channel_block)

  # Planar layout; pad H/W (indices are already clamped into the real
  # range, padded output rows are cropped after) and C to the block size.
  planes = jnp.transpose(image, (0, 3, 1, 2))
  planes = jnp.pad(planes, ((0, 0), (0, cp - c), (0, hp - h), (0, wp - w)))
  iy = jnp.pad(iy, ((0, 0), (0, hp - h), (0, wp - w)))
  ix = jnp.pad(ix, ((0, 0), (0, hp - h), (0, wp - w)))
  ay = jnp.pad(ay, ((0, 0), (0, hp - h), (0, wp - w)))
  ax = jnp.pad(ax, ((0, 0), (0, hp - h), (0, wp - w)))

  n_ty = hp // _TH
  n_tx = wp // _TW
  kernel = functools.partial(_warp_kernel, cb=channel_block, h=hp,
                             w=wp)

  grid = (cp // channel_block, n_ty, n_tx)
  out_spec = pl.BlockSpec((channel_block, _TH, _TW),
                          lambda cb_i, ty, tx: (cb_i, ty, tx))
  idx_spec = pl.BlockSpec((_TH, _TW), lambda cb_i, ty, tx: (ty, tx))
  plane_spec = pl.BlockSpec((channel_block, hp, wp),
                            lambda cb_i, ty, tx: (cb_i, 0, 0))

  def run_one(planes_b, iy_b, ix_b, ay_b, ax_b):
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[idx_spec, idx_spec, idx_spec, idx_spec, plane_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((cp, hp, wp), out_dtype),
        interpret=interpret,
    )(iy_b, ix_b, ay_b, ax_b, planes_b)

  out = jax.vmap(run_one)(planes, iy, ix, ay, ax)
  out = out[:, :c, :h, :w]
  return jnp.transpose(out, (0, 2, 3, 1))


def backward_warp_auto(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
  """Experimental dispatcher: kernel on TPU when the plane fits VMEM.

  The production path (models/*) uses ops.warp.backward_warp directly — see
  the module docstring for the measured trade-off.
  """
  from . import warp as warp_xla
  try:
    platform = jax.devices()[0].platform
  except Exception:  # pragma: no cover - no devices configured
    platform = 'cpu'
  h, w = image.shape[1], image.shape[2]
  if platform in ('tpu',) and max_channel_block(
      h, w, image.dtype.itemsize) >= 1:
    return backward_warp_pallas(image, flow)
  return warp_xla.backward_warp(image, flow)
