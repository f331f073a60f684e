"""Window-splat Pallas TPU kernel: the image-gradient of backward warping.

The VJP of `ops.warp.backward_warp` w.r.t. the IMAGE is a bilinear splat:
every output pixel scatter-adds its weighted cotangent into the 4 source
corners it sampled (the transpose of the forward's gather). XLA lowers
that scatter to a serialized per-index loop on TPU — measured 4.2 s for a
single (8, 256, 256, 64) warp gradient vs 39 ms for its forward, which
put the reference-regime train step (training/config/film_net-L1.gin:
25-34) at 22 s. This kernel replaces the scatter with the same two-level
smooth-flow structure as the forward window kernel (ops/warp_window.py):

  1. COARSE: per output tile, the (C, 24, 128) source-region windows the
     forward READ are exactly the regions the adjoint WRITES, so the same
     scalar-prefetched window bases drive read-modify-write DMAs on an
     f32 accumulation buffer (the kernel's aliased output).
  2. FINE: loop over the tile's integer ROW displacement range (as the
     forward does) and additionally its integer COLUMN displacement
     range; for a shift pair (d, e) the contribution of every output
     pixel with that displacement is ONE masked multiply + dynamic lane
     roll + windowed add — no gathers, no scatters. The row/column tap
     pairs fold into each shift via the same dual-weight trick as the
     forward (shift d serves row-tap0 of dy==d and row-tap1 of dy==d-1).

Tiles are processed in grid order with strict read-after-write DMA
ordering (one semaphore chain), so overlapping windows of neighbouring
tiles accumulate correctly.

Used by ops.warp_window.backward_warp_window's custom VJP for the image
cotangent; the flow cotangent flows through the bilinear WEIGHTS only
(gathers of the image — no scatter) and stays on the XLA path.

Reference semantics: the transpose of tfa.dense_image_warp as used at
models/film_net/util.py:48-82 (clamped corners iy<=h-2, ix<=w-2; alphas
clamped to [0, 1]); parity with jax.vjp of ops.warp.backward_warp is
pinned in tests/test_warp_splat.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .warp import _query_coords
from .warp_window import _TH, _TW, _group_window_bases, _round_up

# This kernel keeps the original per-tile window geometry (the splat
# destination windows are read-modify-write; taller shared windows do not
# apply — each tile's RMW must stay serialized per window).
_WIN_H = 24    # window rows: 16-row d-coverage + 8 slack
_WIN_W = _TW   # one 128-col source tile per window step
_MAX_CHANNEL_BLOCK = 144


def _tile_window_bases(iy, ix, n_ty, n_tx):
  """Per-(8, 128)-tile window origins — the g=1 group bases."""
  return _group_window_bases(iy, ix, n_tg=n_ty, n_tx=n_tx, g=1)


def _channel_block(c: int) -> int:
  n_blocks = -(-c // _MAX_CHANNEL_BLOCK)
  return -(-c // n_blocks)


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

      def e_body(e, _):
        wx = (jnp.where(dxl == e, wx_tap0, 0.0) +
              jnp.where(dxl == e - 1, ax, 0.0))
        off = off_base + e           # target lane = lane + off
        in_window = (lanes + off >= 0) & (lanes + off < _TW)
        weight = jnp.where(in_window, wy * wx, 0.0)

        @pl.when(jnp.any(weight > 0.0))
        def _():
          val = (weight[None] * gout).reshape(cb * _TH, _TW)
          # A RIGHT roll by `off` lands val[l] at lane l + off; the
          # out-of-window lanes were zeroed above, so the circular wrap
          # adds nothing. pltpu.roll == np.roll(+shift) on BOTH Mosaic
          # and the interpret fallback (verified on-device; note the
          # probe_mosaic lane_roll test can't tell directions apart —
          # its shift is congruent to the negative shift mod width).
          shift = jax.lax.rem(jax.lax.rem(off, _TW) + _TW, _TW)
          rolled = pltpu.roll(val, shift=shift, axis=1).reshape(
              cb, _TH, _TW)
          rr = ty8 + d - wy0
          win[:, pl.ds(rr, _TH), :] += rolled

        return 0

      return jax.lax.fori_loop(e_min, e_end, e_body, 0)

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


# Largest H*W routed to the dense matmul splat below. At N=1024 the
# one-hot weight matrix is (B, 1024, 1024) f32 (33 MB at B=8) and the
# contraction is MXU-sized; at N=4096 the matrix alone is 537 MB and the
# window kernel wins again (measured: experiments/probe_splat_levels.py).
_MATMUL_SPLAT_MAX_PIXELS = 1024

# VMEM budget for one resident accumulator plane block (kernel below).
_RESIDENT_VMEM_BYTES = 10 * 1024 * 1024


def _resident_cb(c: int, hp40: int, wp: int):
  """Channel block so one (cb, hp40, 128) f32 plane fits the VMEM budget.

  The resident block is always 128 lanes wide (one column tile — a grid
  dimension; see the kernel). Returns None when even an 8-channel block
  would not fit, or when the plane has so many column tiles that the
  per-jx shift-loop replays would dominate (large planes fall back to
  the RMW window kernel).
  """
  if wp // _TW > 4:
    return None
  per_ch = hp40 * _TW * 4
  max_cb = _RESIDENT_VMEM_BYTES // max(per_ch, 1)
  if max_cb < 8:
    return None
  cb = min(_MAX_CHANNEL_BLOCK, max_cb, c)
  n_blocks = -(-c // cb)
  return -(-c // n_blocks)


def _splat_resident_kernel(iy_ref, ix_ref, ay_ref, ax_ref, gout_ref,
                           out_ref, *, cb: int, n_ty: int, n_tx: int):
  """Splat one output tile's cotangent into a VMEM-resident plane block.

  The output BlockSpec maps every (ty, tx) of a (b, ci, jx) plane column
  to the SAME (1, cb, hp+40, 128) block, so Pallas keeps the accumulator
  resident in VMEM across all spatial tiles and writes it back to HBM
  exactly once — no read-modify-write window DMAs, no serializing
  semaphore chain, no zeros input (the block is zeroed in-kernel at the
  first tile). The target COLUMN tile jx is a grid dimension (not an
  in-kernel loop over a wider block) because Mosaic only allows dynamic
  sublane-start stores that span the block's full minor dimension, so
  the resident block must be exactly 128 lanes wide; the shift loops
  rerun per jx, but each (d, e) pair lands in at most two column tiles
  and the rest are skipped by the weight masks. Only legal when the
  plane block fits VMEM (train-crop shapes; see _resident_cb).
  """
  jx = pl.program_id(2)
  ty = pl.program_id(3)
  tx = pl.program_id(4)

  @pl.when((ty == 0) & (tx == 0))
  def _():
    out_ref[...] = jnp.zeros_like(out_ref)

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
  # Column shifts that can land in THIS jx tile: target lane
  # lane + tx*128 + e - jx*128 must fall in [0, 128).
  dxl = ix - (tx * _TW + lanes)
  lo = (jx - tx) * _TW - (_TW - 1)
  e_min = jnp.maximum(jnp.min(dxl), lo)
  e_end = jnp.minimum(jnp.max(dxl) + 2, lo + 2 * _TW)
  wy_tap0 = 1.0 - ay
  wx_tap0 = 1.0 - ax
  off_base = (tx - jx) * _TW

  def d_body(d, _):
    wy = (jnp.where(dy == d, wy_tap0, 0.0) +
          jnp.where(dy == d - 1, ay, 0.0))
    r0 = ty8 + d + 8               # plane row of this shift's 8-row block

    @pl.when(jnp.any(wy > 0.0))
    def _():

      def e_body(e, _):
        wx = (jnp.where(dxl == e, wx_tap0, 0.0) +
              jnp.where(dxl == e - 1, ax, 0.0))
        off = off_base + e           # target lane within this jx tile
        in_tile = (lanes + off >= 0) & (lanes + off < _TW)
        weight = jnp.where(in_tile, wy * wx, 0.0)

        @pl.when(jnp.any(weight > 0.0))
        def _():
          val = (weight[None] * gout).reshape(cb * _TH, _TW)
          # Right roll by `off` lands val[l] at lane l + off; the
          # out-of-tile lanes were zeroed, so the wrap adds nothing.
          shift = jax.lax.rem(jax.lax.rem(off, _TW) + _TW, _TW)
          rolled = pltpu.roll(val, shift=shift, axis=1).reshape(
              cb, _TH, _TW)
          out_ref[0, :, pl.ds(r0, _TH), :] += rolled

        return 0

      jax.lax.fori_loop(e_min, e_end, e_body, 0)

    return 0

  @pl.when(e_end > e_min)
  def _():
    jax.lax.fori_loop(d_min, d_end, d_body, 0)


@functools.partial(jax.jit, static_argnames=('interpret',))
def backward_warp_splat_resident(g_out: jnp.ndarray, flow: jnp.ndarray,
                                 interpret: bool = False) -> jnp.ndarray:
  """Image-cotangent of backward_warp with a VMEM-resident accumulator.

  Same math as backward_warp_splat, for shapes whose padded plane block
  fits VMEM (train crops). Traffic drops from ~6x-overfetched f32 RMW
  windows plus a materialized zeros buffer to: one planar read of the
  cotangent and one write of the accumulator planes.
  """
  bsz, h, w, c = g_out.shape
  iy, ix, ay, ax = _query_coords(h, w, flow)

  hp = _round_up(h, _TH)
  wp = _round_up(w, _TW)
  n_ty = hp // _TH
  n_tx = wp // _TW
  cb = _resident_cb(c, hp + 40, wp)
  assert cb is not None, (g_out.shape, 'plane too large for resident splat')
  cp = _round_up(c, cb)

  pads = ((0, 0), (0, hp - h), (0, wp - w))
  iy = jnp.pad(iy, pads, mode='edge')
  ix = jnp.pad(ix, pads, mode='edge')
  ay = jnp.pad(ay, pads, mode='edge')
  ax = jnp.pad(ax, pads, mode='edge')

  gout_dtype = (g_out.dtype if jnp.issubdtype(g_out.dtype, jnp.floating)
                else jnp.float32)
  gout = jnp.transpose(g_out.astype(gout_dtype), (0, 3, 1, 2))
  gout = jnp.pad(gout, ((0, 0), (0, cp - c), (0, hp - h), (0, wp - w)))

  kernel = functools.partial(_splat_resident_kernel, cb=cb, n_ty=n_ty,
                             n_tx=n_tx)
  idx_spec = pl.BlockSpec((1, _TH, _TW),
                          lambda b, ci, jx, ty, tx: (b, ty, tx))
  planes = pl.pallas_call(
      kernel,
      grid=(bsz, cp // cb, n_tx, n_ty, n_tx),
      in_specs=[idx_spec, idx_spec, idx_spec, idx_spec,
                pl.BlockSpec((1, cb, _TH, _TW),
                             lambda b, ci, jx, ty, tx: (b, ci, ty, tx))],
      out_specs=pl.BlockSpec((1, cb, hp + 40, _TW),
                             lambda b, ci, jx, ty, tx: (b, ci, 0, jx)),
      out_shape=jax.ShapeDtypeStruct((bsz, cp, hp + 40, wp), jnp.float32),
      # Mosaic double-buffers the accumulator block (its index map changes
      # with jx), so the kernel needs 2x the block beyond the default 16 MB
      # scoped-vmem limit. 42 MB stays under the 48 MB global sweet spot
      # measured in PERF.md.
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=42 * 1024 * 1024),
      interpret=interpret,
  )(iy, ix, ay, ax, gout)
  return jnp.transpose(planes[:, :c, 8:8 + h, :w], (0, 2, 3, 1))


def backward_warp_splat_small(g_out: jnp.ndarray,
                              flow: jnp.ndarray) -> jnp.ndarray:
  """Image-cotangent of backward_warp as ONE dense matmul (small planes).

  The splat is linear in the cotangent: out[s] = sum_o W[o, s] * g[o]
  with W the bilinear tap weights. For small spatial dims (coarse pyramid
  levels — 32x32 and below at train crops) the dense (N_out, N_src)
  weight matrix is tiny, so building it as a fused one-hot sum and
  contracting on the MXU beats both XLA's serialized scatter (~100x) and
  the window-splat kernel, whose (8, 128)-tile planar geometry overfetches
  ~10-30x at these shapes (128-lane padding + 40 guard rows on an f32
  read-modify-write accumulator; see PERF.md round 3).

  Exact: weights are f32 and the contraction accumulates in f32, matching
  jax.vjp of the XLA gather formulation to ~1 ulp (summation order).
  """
  b, h, w, c = g_out.shape
  n = h * w
  iy, ix, ay, ax = _query_coords(h, w, flow)
  # Top-left corner; the clamps (iy <= h-2, ix <= w-2) guarantee all four
  # taps idx, idx+1, idx+w, idx+w+1 are in range.
  idx = (iy * w + ix).reshape(b, n)
  ay = ay.reshape(b, n)
  ax = ax.reshape(b, n)
  src = jnp.arange(n, dtype=jnp.int32)

  def tap(i, wt):
    return jnp.where(i[:, :, None] == src[None, None, :],
                     wt[:, :, None], 0.0)

  weights = (tap(idx, (1.0 - ay) * (1.0 - ax)) +
             tap(idx + 1, (1.0 - ay) * ax) +
             tap(idx + w, ay * (1.0 - ax)) +
             tap(idx + w + 1, ay * ax))          # (B, N_out, N_src) f32
  g = g_out.reshape(b, n, c).astype(jnp.float32)
  out = jnp.einsum('bos,boc->bsc', weights, g,
                   preferred_element_type=jnp.float32)
  return out.reshape(b, h, w, c)


@functools.partial(jax.jit, static_argnames=('interpret',))
def backward_warp_splat(g_out: jnp.ndarray, flow: jnp.ndarray,
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
  # The cotangent stays in its native dtype (bf16 under the serving
  # policy) through the planar transpose and the per-tile block reads —
  # the kernel casts each block to f32 on load, so the f32 accumulation
  # is unchanged while the transpose+read HBM traffic halves (this chip
  # streams at ~139 GB/s; PERF.md round 3).
  gout_dtype = (g_out.dtype if jnp.issubdtype(g_out.dtype, jnp.floating)
                else jnp.float32)
  gout = jnp.transpose(g_out.astype(gout_dtype), (0, 3, 1, 2))
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
