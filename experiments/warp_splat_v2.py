"""EXPERIMENT: d-outer register-accumulate variant of ops/warp_splat.py.

All column shifts of one row shift write the same 8 window rows, so the
window slice is loaded ONCE per row shift, the e-rounds accumulate into a
loop-carried register block, and the slice is stored once - cutting the
dynamic-start VMEM traffic by the column-shift count. (Round-1 found
loop-carried accumulators slower when carried across the WHOLE window
loop; here the carry spans only ~3 rounds.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from frame_interpolation_tpu.ops.warp import _query_coords
from frame_interpolation_tpu.ops.warp_window import _TH, _TW, _round_up
from frame_interpolation_tpu.ops.warp_splat import (
    _MAX_CHANNEL_BLOCK, _WIN_H, _WIN_W, _channel_block, _tile_window_bases)


def _splat_kernel(by_ref, bx_ref, iy_ref, ix_ref, ay_ref, ax_ref, gout_ref,
                  zeros_ref, planes, win, sem, wsem,
                  *, cb: int, cp: int, n_sp: int, n_tx: int):
  """Splat one output tile's cotangent into the shared accumulator planes.

  Args:
    by_ref/bx_ref: scalar-prefetch (B * n_sp,) int32 window bases — the
      regions the FORWARD kernel reads for this tile, which are exactly
      the regions this adjoint writes.
    iy/ix/ay/ax_ref: (1, 8, 128) blocks of clamped corners / alphas.
    gout_ref: (1, cb, 8, 128) block of the output cotangent (planar).
    zeros_ref: alias source for `planes` (provides the zero init); unused.
    planes: (B * Cp, Hpad, Wp) f32 accumulation buffer in HBM/ANY,
      aliased to the kernel output.
    win: (cb, 24, 128) f32 VMEM window scratch (read-modify-write).
    sem/wsem: DMA semaphores for the window reads / writebacks.
  """
  del zeros_ref
  b = pl.program_id(0)
  ci = pl.program_id(1)
  ty = pl.program_id(2)
  tx = pl.program_id(3)
  n_cb = pl.num_programs(1)
  t = ty * n_tx + tx
  pos = (b * n_cb + ci) * n_sp + t
  c0 = b * cp + ci * cb
  bt = b * n_sp + t

  iy = iy_ref[0]
  ix = ix_ref[0]
  ay = ay_ref[0]
  ax = ax_ref[0]
  gout = gout_ref[0].astype(jnp.float32)

  ty8 = ty * _TH
  rows = jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 0)
  lanes = jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 1)
  dy = iy - (ty8 + rows)
  d_min = jnp.min(dy)
  d_end = jnp.max(dy) + 2          # row taps iy, iy+1 -> shifts [d, d+1]
  dxl = ix - (tx * _TW + lanes)
  e_min = jnp.min(dxl)
  e_end = jnp.max(dxl) + 2         # col taps ix, ix+1 -> shifts [e, e+1]
  n_wy = pl.cdiv(d_end - (by_ref[bt] - ty8), 16)
  n_wx = (jnp.max(ix) + 1) // _TW + 1 - bx_ref[bt] // _TW
  n_w = n_wy * n_wx

  wy_tap0 = 1.0 - ay
  wx_tap0 = 1.0 - ax

  def win_origin(k):
    ky = jax.lax.div(k, n_wx)
    kx = jax.lax.rem(k, n_wx)
    return by_ref[bt] + 16 * ky, bx_ref[bt] + _WIN_W * kx

  def window_region(row0, col0):
    return planes.at[pl.ds(c0, cb),
                     pl.ds(pl.multiple_of(row0 + 8, _TH), _WIN_H),
                     pl.ds(pl.multiple_of(col0, _TW), _WIN_W)]

  def wait_writeback(wy0, wx0):
    # Waits the PREVIOUS writeback. DMA waits are bookkept by shape, and
    # every writeback moves an identical (cb, 24, 128) window, so a
    # descriptor built from the current origins stands in for it.
    pltpu.make_async_copy(win, window_region(wy0, wx0), wsem).wait()

  def window_body(k, _):
    wy0, wx0 = win_origin(k)
    # Strict read-after-write: every window read waits for the previous
    # window's writeback (the global first window has none pending), so
    # overlapping regions of consecutive windows/tiles chain correctly.
    @pl.when((pos > 0) | (k > 0))
    def _():
      wait_writeback(wy0, wx0)
    read = pltpu.make_async_copy(window_region(wy0, wx0), win, sem)
    read.start()
    read.wait()

    d_lo = jnp.maximum(d_min, wy0 - ty8)
    d_hi = jnp.minimum(d_end, wy0 - ty8 + 16)
    off_base = tx * _TW - wx0

    def d_body(d, _):
      wy = (jnp.where(dy == d, wy_tap0, 0.0) +
            jnp.where(dy == d - 1, ay, 0.0))
      rr = ty8 + d - wy0

      def e_body(e, acc):
        wx = (jnp.where(dxl == e, wx_tap0, 0.0) +
              jnp.where(dxl == e - 1, ax, 0.0))
        off = off_base + e           # target lane = lane + off
        in_window = (lanes + off >= 0) & (lanes + off < _TW)
        weight = jnp.where(in_window, wy * wx, 0.0)

        def add(acc):
          val = (weight[None] * gout).reshape(cb * _TH, _TW)
          shift = jax.lax.rem(jax.lax.rem(off, _TW) + _TW, _TW)
          rolled = pltpu.roll(val, shift=shift, axis=1).reshape(
              cb, _TH, _TW)
          return acc + rolled

        return jax.lax.cond(jnp.any(weight > 0.0), add, lambda a: a, acc)

      @pl.when(jnp.any((dy == d) | (dy == d - 1)))
      def _():
        acc = win[:, pl.ds(rr, _TH), :]
        acc = jax.lax.fori_loop(e_min, e_end, e_body, acc)
        win[:, pl.ds(rr, _TH), :] = acc

      return 0

    jax.lax.fori_loop(d_lo, d_hi, d_body, 0)
    pltpu.make_async_copy(win, window_region(wy0, wx0), wsem).start()
    return 0

  jax.lax.fori_loop(0, n_w, window_body, 0)

  # The last grid step's writeback must complete before the kernel ends.
  n_pos = pl.num_programs(0) * n_cb * n_sp
  @pl.when(pos == n_pos - 1)
  def _():
    wy0, wx0 = win_origin(n_w - 1)
    wait_writeback(wy0, wx0)


@functools.partial(jax.jit, static_argnames=('interpret',))
def backward_warp_splat_v2(g_out: jnp.ndarray, flow: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
  """Image-cotangent of backward_warp: splats `g_out` along `flow`.

  Args:
    g_out: (B, H, W, C) cotangent of the warped output.
    flow: (B, H, W, 2) flow that produced it; channel 0 is dx, 1 is dy.
    interpret: run in the Pallas interpreter (CPU tests).

  Returns:
    (B, H, W, C) f32 gradient w.r.t. the warped image — numerically the
    transpose of the forward's bilinear gather.
  """
  bsz, h, w, c = g_out.shape
  iy, ix, ay, ax = _query_coords(h, w, flow)

  hp = _round_up(h, _TH)
  wp = _round_up(w, _TW)
  n_ty = hp // _TH
  n_tx = wp // _TW
  # Edge-pad index maps (keeps windows tight); ZERO-pad the cotangent so
  # padded output pixels contribute nothing.
  pads = ((0, 0), (0, hp - h), (0, wp - w))
  iy = jnp.pad(iy, pads, mode='edge')
  ix = jnp.pad(ix, pads, mode='edge')
  ay = jnp.pad(ay, pads, mode='edge')
  ax = jnp.pad(ax, pads, mode='edge')
  by, bx = jax.vmap(functools.partial(_tile_window_bases, n_ty=n_ty,
                                      n_tx=n_tx))(iy, ix)
  by = by.reshape(-1)
  bx = bx.reshape(-1)

  cb = _channel_block(c)
  cp = _round_up(c, cb)
  gout = jnp.transpose(g_out.astype(jnp.float32), (0, 3, 1, 2))
  gout = jnp.pad(gout, ((0, 0), (0, cp - c), (0, hp - h), (0, wp - w)))

  # The accumulator mirrors the forward's padded plane geometry: 8 guard
  # rows on top, round8(h) + 32 below, lanes padded to round128(w).
  zeros = jnp.zeros((bsz * cp, hp + 40, wp), jnp.float32)

  n_sp = n_ty * n_tx
  kernel = functools.partial(_splat_kernel, cb=cb, cp=cp, n_sp=n_sp,
                             n_tx=n_tx)
  idx_spec = pl.BlockSpec((1, _TH, _TW),
                          lambda b, ci, ty, tx, *refs: (b, ty, tx))
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=2,
      grid=(bsz, cp // cb, n_ty, n_tx),
      in_specs=[idx_spec, idx_spec, idx_spec, idx_spec,
                pl.BlockSpec((1, cb, _TH, _TW),
                             lambda b, ci, ty, tx, *refs: (b, ci, ty, tx)),
                pl.BlockSpec(memory_space=pl.ANY)],
      out_specs=pl.BlockSpec(memory_space=pl.ANY),
      scratch_shapes=[
          pltpu.VMEM((cb, _WIN_H, _WIN_W), jnp.float32),
          pltpu.SemaphoreType.DMA,
          pltpu.SemaphoreType.DMA,
      ])
  planes = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((bsz * cp, hp + 40, wp), jnp.float32),
      input_output_aliases={7: 0},
      interpret=interpret,
  )(by, bx, iy, ix, ay, ax, gout, zeros)
  planes = planes.reshape(bsz, cp, hp + 40, wp)
  return jnp.transpose(planes[:, :c, 8:8 + h, :w], (0, 2, 3, 1))
