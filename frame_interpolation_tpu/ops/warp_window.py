"""Two-level (window-DMA) Pallas TPU kernel for backward bilinear warping.

Semantics are identical to `ops.warp.backward_warp` (the JAX equivalent of
`tensorflow_addons.image.dense_image_warp` as used by the reference's
models/film_net/util.py:48-82): per output pixel, a bilinear lookup at the
flow-displaced coordinate with the tfa edge-clamp rule.

Why another kernel. XLA lowers the warp to per-pixel gathers whose cost is
bound by GATHERED-SLICE COUNT (~10 ns/slice, PERF.md), putting a hard floor
of ~70 ms on a 1080p x 67-channel warp. The displaced coordinate is
`x + flow`, and real flow fields are locally smooth, so the INTEGER
DISPLACEMENT `floor(x + flow) - x` has a tiny value range within any
(8, 128) output tile. This kernel exploits that in two levels:

  1. COARSE: per GROUP of `g` vertically adjacent (8, 128) output tiles,
     DMA one (C, 8g+16, 128) source window from the HBM-resident planar
     image, positioned by the group's minimum integer displacement
     (precomputed on the XLA side, scalar-prefetched so the next group's
     window streams in while the current group computes).
  2. FINE: per tile of the group, loop over the tile's integer-
     displacement range with dynamic `fori_loop` bounds (2-4 row shifts
     for smooth flow); per shift, the bilinear tap weights are computed
     ONCE and reused across every channel; the two x-taps are lane-gathers
     (`take_along_axis`) from an unaligned 8-row slice of the VMEM window.

The group height g trades window overfetch against VMEM: this kernel is
HBM-bound on this chip (PERF.md: ~139 GB/s stream rate; windows are its
dominant traffic), and one 8g+16-row window per 8g output rows fetches
(8g+16)/8g of the rows a g=1 kernel fetches 24/8 = 3x of — g=4 roughly
halves window traffic for smooth flow. FI_WARP_GROUP selects g (default
4, measured on the real chip; see PERF.md round 3).

Arbitrarily large displacement spreads (motion boundaries) stay exact: the
kernel walks as many (8g+8)-row/128-col window steps as the group needs,
paying extra DMAs only for those groups. There is no fallback path and no
approximation; parity with ops.warp.backward_warp is pinned in
tests/test_warp_window.py for g=1 and g=4.

Gradients: wrapped in jax.custom_vjp, with the backward pass delegated to
the XLA-gather formulation's VJP (identical math), so the kernel is safe to
use under training as well.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .warp import _query_coords, _query_coords_full, backward_warp
from .warp import flow_cotangent_from_planes, image_cotangent

_TH = 8     # output tile rows (sublanes)
_TW = 128   # output tile cols (lanes); window cols too (Mosaic supports
            # unaligned dynamic sublane starts only for loads that span the
            # full minor dimension — see experiments/probe_mosaic)


def _win_h(g: int) -> int:
  """Window rows: 8g-row load-start coverage + 8 shift + 8 slack rows."""
  return 8 * g + 16


def _win_step(g: int) -> int:
  """Walk stride between windows: each covers 8g+8 load-start rows."""
  return 8 * g + 8


def _scratch_bytes_per_channel(plane_dtype, g: int,
                               emit_planes: bool = False) -> int:
  """Kernel-scratch VMEM bytes per channel of the block, at group height g.

  Counts the triple-buffered (cb, 8g+16, 128) windows in the plane dtype,
  the f32 expansion scratch (bf16 planes only), the (cb, 8g, 128) f32
  accumulator(s), and the output block(s) — the planes mode (du/dv
  emission for the VJP) carries two of each instead of one.
  """
  s = 2 if plane_dtype == jnp.bfloat16 else 4
  wh = _win_h(g)
  expand = wh * 4 if s == 2 else 0
  n_out = 2 if emit_planes else 1
  return 128 * (wh * 3 * s + expand + n_out * (8 * g * 4 + 8 * g * s))


def _max_channel_block(plane_dtype, g: int, emit_planes: bool = False) -> int:
  # Bounds the triple-buffered (C, 8g+16, 128) window VMEM plus the f32
  # expansion scratch and (C, 8g, 128) accumulator under the 16 MB default
  # limit. On-chip-exercised points (PERF.md round 3): g=1 cb=144 either
  # dtype (3 * 144 * 12 KB = 5.2 MB f32 windows); g=4 cb=144 bf16
  # (~13.7 MB total) / cb=96 f32 (~12 MB total). Taller groups shrink the
  # block so scratch stays within the g=4 budget (window rows and
  # accumulator scale ~linearly with g).
  if emit_planes:
    # Same byte budget as the primal-mode cap at this g; the extra
    # accumulator/output pair shrinks the channel block instead of
    # overflowing VMEM.
    budget = (_max_channel_block(plane_dtype, g) *
              _scratch_bytes_per_channel(plane_dtype, g))
    return max(8, budget // _scratch_bytes_per_channel(plane_dtype, g, True))
  if g <= 2:
    return 144
  base = 144 if plane_dtype == jnp.bfloat16 else 96
  if g <= 4:
    return base
  budget = base * _scratch_bytes_per_channel(plane_dtype, 4)
  return max(8, budget // _scratch_bytes_per_channel(plane_dtype, g))


def _group_from_env() -> int:
  # Default g=4, from the on-chip A/B (PERF.md round 3): kernel-level
  # slow/smooth/boundary/random = 12.5/31.0/31.9/161 ms vs g=1's
  # 15.6/32.6/34.1/162, in-model 1080p pair 2.841 -> 2.973 fps. g=1
  # remains available (FI_WARP_GROUP=1) and is pinned by the same
  # parity tests.
  raw = os.environ.get('FI_WARP_GROUP', '4')
  try:
    g = int(raw)
  except ValueError:
    raise ValueError(f'FI_WARP_GROUP must be a positive integer; got {raw!r}')
  if g < 1:
    raise ValueError(f'FI_WARP_GROUP must be >= 1; got {g}. Parity-tested '
                     'heights are 1 and 4 (the default); taller groups are '
                     'supported with an automatically shrunk channel block.')
  return g


def _round_up(x: int, m: int) -> int:
  return -(-x // m) * m


def _warp_window_kernel(by_ref, bx_ref, iy_ref, ix_ref, ay_ref, ax_ref,
                        planes, out_ref, win, winf_ref, acc_ref, sem,
                        *, cb: int, cp: int, n_sp: int, n_tx: int, g: int,
                        cgx_ref=None, cgy_ref=None, du_ref=None, dv_ref=None,
                        du_acc=None, dv_acc=None):
  """One (cb, 8g, 128) output group against windowed source.

  PLANES MODE (du_ref is not None — the VJP's forward): instead of the
  primal output, the kernel emits the two flow-derivative planes du =
  d out/d flow_x and dv = d out/d flow_y, accumulated from the SAME
  window taps with the derivative weights (x-tap difference for du, row
  tap sign for dv) and scaled by the per-pixel clip gradients cgx/cgy
  (computed on the XLA side from the raw fractional offsets — 1 inside
  (0, 1), 0.5 at the clip boundary, 0 outside, JAX's min/max tie rule,
  exactly ops.warp._raw_and_planes). This lets the window warp's
  backward avoid re-running the gather formulation (two serialized XLA
  gathers per site, ~55 ms of a 305 ms train step in the round-5
  profile) — the planes come from the same window-DMA machinery at the
  kernel's streaming rate.

  Args:
    by_ref/bx_ref: scalar-prefetch (B * n_sp,) int32 — per (sample,
      spatial group), the 8-aligned row / 128-aligned col start of its
      first source window (row origin is logical; +8 guard rows are added
      at DMA time).
    iy/ix/ay/ax_ref: (1, 8g, 128) VMEM blocks of clamped integer corners
      and fractional weights for this sample and group.
    planes: (B * Cp, Hpad, Wp) source in HBM/ANY — the batch is collapsed
      into the plane (channel) axis, so one kernel instance serves every
      sample (a Python loop over batch would instantiate B copies of the
      kernel per warp site, multiplying XLA program size and compile
      time).
    out_ref: (1, cb, 8g, 128) VMEM output block.
    win: (3, cb, 8g+16, 128) VMEM window scratch in the PLANES dtype —
      slots 0/1 rotate per group for cross-group streaming; slot 2
      alternates with the group slot for intra-group multi-window
      pipelining. Keeping the planes/windows in the image dtype (bf16
      under the serving policy) halves the dominant HBM traffic of this
      kernel (PERF.md round 3: the chip streams at ~139 GB/s, and g=1
      windows overfetch ~6x the output bytes).
    winf_ref: (cb, 8g+16, 128) f32 scratch (None for f32 planes, which
      read straight from the window slot) — the current window expanded
      once after its DMA lands. Mosaic rejects DYNAMIC sublane-start
      loads on sublane-packed bf16 VMEM (probe_mosaic), so the per-shift
      unaligned 8-row loads read this f32 copy; bf16->f32 is exact, so
      outputs are bit-identical to the all-f32 kernel.
    acc_ref: (cb, 8g, 128) f32 VMEM accumulator (measured faster than a
      loop-carried register accumulator at this block size).
    sem: (3,) DMA semaphores, one per window slot.
  """
  planes_mode = du_ref is not None
  b = pl.program_id(0)
  ci = pl.program_id(1)
  tg = pl.program_id(2)
  tx = pl.program_id(3)
  n_cb = pl.num_programs(1)
  t = tg * n_tx + tx
  pos = (b * n_cb + ci) * n_sp + t
  n_pos = pl.num_programs(0) * n_cb * n_sp
  slot = jax.lax.rem(pos, 2)
  c0 = b * cp + ci * cb
  bt = b * n_sp + t
  win_h = _win_h(g)
  step = _win_step(g)

  def window_dma(c_start, row0, col0, slot_index):
    # row0 is 8-aligned and col0 128-aligned by construction
    # (_group_window_bases); the hints let Mosaic slice the tiled HBM
    # memref.
    return pltpu.make_async_copy(
        planes.at[pl.ds(c_start, cb),
                  pl.ds(pl.multiple_of(row0 + 8, _TH), win_h),
                  pl.ds(pl.multiple_of(col0, _TW), _TW)],
        win.at[slot_index], sem.at[slot_index])

  def first_window_dma(position, slot_index):
    bb = jax.lax.div(position, n_cb * n_sp)
    rem = jax.lax.rem(position, n_cb * n_sp)
    tsp = bb * n_sp + jax.lax.rem(rem, n_sp)
    return window_dma(bb * cp + jax.lax.div(rem, n_sp) * cb,
                      by_ref[tsp], bx_ref[tsp], slot_index)

  @pl.when(pos == 0)
  def _():
    first_window_dma(pos, slot).start()

  # Stream the NEXT group's first window while this group computes.
  @pl.when(pos + 1 < n_pos)
  def _():
    first_window_dma(pos + 1, 1 - slot).start()

  iy = iy_ref[0]
  ix = ix_ref[0]
  ay = ay_ref[0]
  ax = ax_ref[0]
  tg_row = tg * g * _TH

  # Per-tile displacement ranges (static 8-row slices of the group).
  subs = []
  r_hi = None
  for s in range(g):
    dy_s = iy[s * _TH:(s + 1) * _TH] - (
        tg_row + s * _TH +
        jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 0))
    d_lo_s = jnp.min(dy_s)
    d_hi_s = jnp.max(dy_s) + 2    # tap rows iy and iy+1 -> shifts [d, d+1]
    subs.append((dy_s, d_lo_s, d_hi_s))
    hi = s * _TH + d_hi_s
    r_hi = hi if r_hi is None else jnp.maximum(r_hi, hi)

  cw_lo = bx_ref[bt] // _TW
  cw_hi = (jnp.max(ix) + 1) // _TW
  n_wy = pl.cdiv(tg_row + r_hi - by_ref[bt], step)
  n_wx = cw_hi + 1 - cw_lo
  n_w = n_wy * n_wx

  def win_origin(k):
    # Row-major over (ky, kx): column windows of one row band are adjacent.
    ky = jax.lax.div(k, n_wx)
    kx = jax.lax.rem(k, n_wx)
    return by_ref[bt] + step * ky, bx_ref[bt] + _TW * kx

  def win_slot(k):
    # Window 0 sits in the cross-group slot; further windows alternate
    # between slot 2 and the group slot (free once window 0 is consumed).
    return jnp.where(jax.lax.rem(k, 2) == 0, slot, 2)

  needs_expand = win.dtype != jnp.float32

  def window_body(k, _):
    wy0, wx0 = win_origin(k)
    my_slot = win_slot(k)
    window_dma(c0, wy0, wx0, my_slot).wait()

    # Pipeline: start the group's next window before computing this one.
    @pl.when(k + 1 < n_w)
    def _():
      ny0, nx0 = win_origin(k + 1)
      window_dma(c0, ny0, nx0, win_slot(k + 1)).start()

    if needs_expand:
      # One f32 expansion per window: the per-shift unaligned 8-row loads
      # below are illegal on packed bf16 VMEM; exact, so outputs match
      # the all-f32 kernel bit for bit.
      winf_ref[...] = win[my_slot].astype(jnp.float32)

    for s in range(g):
      dy_s, d_lo_s, d_hi_s = subs[s]
      ax_s = ax[s * _TH:(s + 1) * _TH]
      ay_s = ay[s * _TH:(s + 1) * _TH]
      wy_tap0 = 1.0 - ay_s
      # Shifts whose 8-row load-start falls inside this window.
      d_lo = jnp.maximum(d_lo_s, wy0 - tg_row - s * _TH)
      d_hi = jnp.minimum(d_hi_s, wy0 + step - tg_row - s * _TH)
      lx = ix[s * _TH:(s + 1) * _TH] - wx0
      lx0 = jnp.clip(lx, 0, _TW - 1)
      lx1 = jnp.clip(lx + 1, 0, _TW - 1)
      m0 = (lx >= 0) & (lx < _TW)
      m1 = (lx + 1 >= 0) & (lx + 1 < _TW)
      w0m = jnp.where(m0, 1.0 - ax_s, 0.0)
      w1m = jnp.where(m1, ax_s, 0.0)
      m0f = m0.astype(jnp.float32)
      m1f = m1.astype(jnp.float32)

      # Channels collapse into the sublane axis so each shift is ONE 2-D
      # lane-gather over all channels (Mosaic supports only 2-D gathers,
      # and a per-channel scalar loop costs ~10x in loop overhead).
      # Weights are applied AFTER reshaping back to (cb, 8, 128), where
      # broadcasting along the channel axis is free.
      def tile_channels(x):
        return jnp.broadcast_to(x[None], (cb, _TH, _TW)).reshape(
            cb * _TH, _TW)

      lx0b = tile_channels(lx0)
      lx1b = tile_channels(lx1)

      def d_body(d, _, s=s, dy_s=dy_s, wy_tap0=wy_tap0, ay_s=ay_s,
                 w0m=w0m, w1m=w1m, m0f=m0f, m1f=m1f, lx0b=lx0b, lx1b=lx1b,
                 wy0=wy0, my_slot=my_slot):
        # Row-tap weight for this shift, shared by every channel: source
        # row tg_row + 8s + i + d serves output row i via tap0 (dy == d)
        # or tap1 (dy == d - 1).
        wy = (jnp.where(dy_s == d, wy_tap0, 0.0) +
              jnp.where(dy_s == d - 1, ay_s, 0.0))
        if planes_mode:
          # Derivative weights from the SAME taps: du sums the x-tap
          # DIFFERENCE (d/d ax of the x-lerp) under the primal row
          # weight; dv sums the x-blended taps under the row SIGN
          # (-tap0 +tap1, the d/d ay of the row lerp). Tap-existence
          # masks are the window's own; the skip predicate must not use
          # the primal weights (ax == 0 or ay == 0 zero w0/w1 but not
          # the derivative contributions).
          sgn = (jnp.where(dy_s == d, -1.0, 0.0) +
                 jnp.where(dy_s == d - 1, 1.0, 0.0))
          cond = jnp.any(((dy_s == d) | (dy_s == d - 1)) &
                         ((m0f + m1f) > 0.0))
        else:
          w0 = w0m * wy
          w1 = w1m * wy
          cond = jnp.any((w0 > 0.0) | (w1 > 0.0))

        # Motion boundaries make dy bimodal: most shifts in [d_lo, d_hi)
        # contribute nothing; skip their loads and gathers entirely.
        @pl.when(cond)
        def _():
          row = tg_row + s * _TH + d - wy0
          if needs_expand:
            src = winf_ref[:, pl.ds(row, _TH), :]
          else:
            src = win[my_slot, :, pl.ds(row, _TH), :]
          src = src.reshape(cb * _TH, _TW)
          g0 = jnp.take_along_axis(src, lx0b, axis=1).reshape(
              cb, _TH, _TW)
          g1 = jnp.take_along_axis(src, lx1b, axis=1).reshape(
              cb, _TH, _TW)
          if planes_mode:
            du_acc[:, s * _TH:(s + 1) * _TH, :] += (
                (m1f * wy)[None] * g1 - (m0f * wy)[None] * g0)
            dv_acc[:, s * _TH:(s + 1) * _TH, :] += (
                (w0m * sgn)[None] * g0 + (w1m * sgn)[None] * g1)
          else:
            acc_ref[:, s * _TH:(s + 1) * _TH, :] += (
                w0[None] * g0 + w1[None] * g1)

        return 0

      jax.lax.fori_loop(d_lo, d_hi, d_body, 0)
    return 0

  if planes_mode:
    du_acc[...] = jnp.zeros(du_acc.shape, du_acc.dtype)
    dv_acc[...] = jnp.zeros(dv_acc.shape, dv_acc.dtype)
  else:
    acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
  jax.lax.fori_loop(0, n_w, window_body, 0)
  if planes_mode:
    du_ref[0] = (du_acc[...] * cgx_ref[0][None]).astype(du_ref.dtype)
    dv_ref[0] = (dv_acc[...] * cgy_ref[0][None]).astype(dv_ref.dtype)
  else:
    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _group_window_bases(iy: jnp.ndarray, ix: jnp.ndarray,
                        n_tg: int, n_tx: int, g: int):
  """Per-group aligned window origins, flattened to (n_tg * n_tx,) int32.

  The row origin is derived from the group's minimum integer DISPLACEMENT
  (iy - y), not its minimum absolute row: the 8-row block for shift d of
  tile ty spans rows [ty*8 + d, ty*8 + d + 8), whose start ty*8 + min(dy)
  can sit up to 7 rows below min(iy) (when the minimum displacement occurs
  on a lower sublane) and as low as -7 (handled by 8 guard rows at the top
  of the padded planes). Columns need no such treatment: the lane gathers
  only read columns in [min(ix), max(ix) + 1], all inside the aligned
  window.
  """
  n_ty = n_tg * g
  rows = jnp.arange(n_ty * _TH, dtype=jnp.int32)[:, None]
  d_lo = jnp.min((iy - rows).reshape(n_ty, _TH, n_tx, _TW), axis=(1, 3))
  ty8 = jnp.arange(n_ty, dtype=jnp.int32)[:, None] * _TH
  by = jnp.min((((ty8 + d_lo) // _TH) * _TH).reshape(n_tg, g, n_tx), axis=1)
  c_lo = jnp.min(ix.reshape(n_ty, _TH, n_tx, _TW), axis=(1, 3))
  bx = jnp.min(((c_lo // _TW) * _TW).reshape(n_tg, g, n_tx), axis=1)
  return by.reshape(-1).astype(jnp.int32), bx.reshape(-1).astype(jnp.int32)


def _channel_block(c: int, plane_dtype, g: int,
                   emit_planes: bool = False) -> int:
  cap = _max_channel_block(plane_dtype, g, emit_planes)
  n_blocks = -(-c // cap)
  return -(-c // n_blocks)


@functools.partial(jax.jit, static_argnames=('interpret', 'g', 'clamp_h',
                                             'emit_planes'))
def _forward(image: jnp.ndarray, flow: jnp.ndarray,
             interpret: bool = False, g: int = 1,
             row_offset=0, src_row0=0, clamp_h=None,
             emit_planes: bool = False) -> jnp.ndarray:
  """Warp for a batch: image (B, H, W, C), flow (B, Hout, W, 2).

  The whole batch runs as ONE pallas_call: the grid gains a leading batch
  dimension and the HBM planes collapse batch into the channel axis, so a
  batched forward contains one kernel instantiation per warp site instead
  of B (material for XLA program size / compile time of batched serving
  and training programs, and for dispatch overhead).

  The output grid is `flow`'s grid; normally Hout == H. The row-sharded
  variant (backward_warp_window_rows) passes a SLAB of output rows
  against the full-height source: `row_offset` (a traced scalar) is the
  slab's global first row, added to the query rows so taps index — and
  clamp against — the full source. The kernel body is row-origin-
  agnostic (window origins and displacement ranges are all computed from
  the query maps), so only the plane guard padding changes.
  """
  bsz, h, w, c = image.shape
  h_out = flow.shape[1]
  assert flow.shape[2] == w, (flow.shape, image.shape)
  out_dtype = image.dtype
  # Halo-bounded row sharding passes `image` as an EXTENSION of source
  # rows starting at global row `src_row0` (traced), with `clamp_h` the
  # GLOBAL height: queries are computed — and tfa-clamped — in global
  # coordinates (bit-identical maps to the full-frame path), then only
  # the integer row corners shift into extension space. The caller
  # guarantees every shifted corner (and its +1 tap) is materialized.
  iy, ix, ay, ax, ty, tx_raw = _query_coords_full(
      h if clamp_h is None else clamp_h, w, flow, row_offset)
  if clamp_h is not None:
    iy = iy - src_row0
  if emit_planes:
    # Per-pixel clip gradients of the raw fractional offsets (ops.warp.
    # _raw_and_planes's clip_grad): 1 strictly inside (0, 1), 0.5 at the
    # boundary (JAX's min/max tie rule), 0 outside. Applied by the kernel
    # when the derivative planes are emitted.
    def _clip_grad(t):
      inner = ((t > 0.0) & (t < 1.0)).astype(jnp.float32)
      edge = ((t == 0.0) | (t == 1.0)).astype(jnp.float32)
      return inner + 0.5 * edge
    cgx = _clip_grad(tx_raw)
    cgy = _clip_grad(ty)

  gh = g * _TH
  hp = _round_up(h_out, gh)
  wp = _round_up(w, _TW)
  n_tg = hp // gh
  n_tx = wp // _TW
  # Edge-pad the index maps so padded lanes never inflate a group's window.
  pads = ((0, 0), (0, hp - h_out), (0, wp - w))
  iy = jnp.pad(iy, pads, mode='edge')
  ix = jnp.pad(ix, pads, mode='edge')
  ay = jnp.pad(ay, pads, mode='edge')
  ax = jnp.pad(ax, pads, mode='edge')
  if emit_planes:
    cgx = jnp.pad(cgx, pads, mode='edge')
    cgy = jnp.pad(cgy, pads, mode='edge')
  by, bx = jax.vmap(functools.partial(_group_window_bases, n_tg=n_tg,
                                      n_tx=n_tx, g=g))(iy, ix)
  by = by.reshape(-1)
  bx = bx.reshape(-1)

  plane_dtype = (image.dtype if jnp.issubdtype(image.dtype, jnp.floating)
                 else jnp.float32)
  cb = _channel_block(c, plane_dtype, g, emit_planes)
  cp = _round_up(c, cb)
  # Planar source in the IMAGE dtype (bf16 halves the dominant window/
  # transpose HBM traffic on this ~139 GB/s chip; f32 images behave as
  # before), padded so every window DMA stays in bounds: 8 guard rows on
  # top (negative-displacement blocks can start at row -8) and guards
  # below sized from the SOURCE height (the last walked window origin is
  # at most align(max clamped tap row) <= round_up(h, gh) and extends
  # 8g + 16 rows); 128-col windows never cross round128(w). Non-float
  # images warp in f32.
  planes = jnp.transpose(image.astype(plane_dtype), (0, 3, 1, 2))
  hp_src = _round_up(h, gh)
  pad_bot = hp_src + 8 * g + 24 - h
  planes = jnp.pad(planes, ((0, 0), (0, cp - c), (8, pad_bot), (0, wp - w)))
  planes = planes.reshape(bsz * cp, hp_src + 8 * g + 32, wp)

  n_sp = n_tg * n_tx
  needs_expand = plane_dtype != jnp.float32
  base = functools.partial(_warp_window_kernel, cb=cb, cp=cp,
                           n_sp=n_sp, n_tx=n_tx, g=g)
  # f32 planes read straight from the window slot; don't reserve the
  # (cb, 8g+16, 128) f32 expansion scratch the kernel would never
  # touch (it costs VMEM headroom the triple-buffered windows rely on).
  if emit_planes:
    if needs_expand:
      def kernel(by, bx, iy, ix, ay, ax, cgx, cgy, planes, du, dv,
                 win, winf, dua, dva, sem):
        base(by, bx, iy, ix, ay, ax, planes, None, win, winf, None, sem,
             cgx_ref=cgx, cgy_ref=cgy, du_ref=du, dv_ref=dv,
             du_acc=dua, dv_acc=dva)
    else:
      def kernel(by, bx, iy, ix, ay, ax, cgx, cgy, planes, du, dv,
                 win, dua, dva, sem):
        base(by, bx, iy, ix, ay, ax, planes, None, win, None, None, sem,
             cgx_ref=cgx, cgy_ref=cgy, du_ref=du, dv_ref=dv,
             du_acc=dua, dv_acc=dva)
  elif needs_expand:
    kernel = base
  else:
    def kernel(by, bx, iy, ix, ay, ax, planes, out, win, acc, sem):
      base(by, bx, iy, ix, ay, ax, planes, out, win, None, acc, sem)
  idx_spec = pl.BlockSpec((1, gh, _TW),
                          lambda b, ci, tg, tx, *refs: (b, tg, tx))
  out_spec = pl.BlockSpec((1, cb, gh, _TW),
                          lambda b, ci, tg, tx, *refs: (b, ci, tg, tx))
  out_struct = jax.ShapeDtypeStruct((bsz, cp, hp, wp), out_dtype)
  n_idx = 6 if emit_planes else 4
  acc_structs = [pltpu.VMEM((cb, gh, _TW), jnp.float32)] * (
      2 if emit_planes else 1)
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=2,
      grid=(bsz, cp // cb, n_tg, n_tx),
      in_specs=[idx_spec] * n_idx + [pl.BlockSpec(memory_space=pl.ANY)],
      out_specs=[out_spec, out_spec] if emit_planes else out_spec,
      scratch_shapes=(
          [pltpu.VMEM((3, cb, _win_h(g), _TW), plane_dtype)] +
          ([pltpu.VMEM((cb, _win_h(g), _TW), jnp.float32)]
           if needs_expand else []) +
          acc_structs +
          [pltpu.SemaphoreType.DMA((3,))]))
  if emit_planes:
    # The VJP's forward: emit the flow-derivative planes (in the float
    # compute dtype — grads only flow through float trees) instead of
    # the primal, from the same windows/taps.
    plane_struct = jax.ShapeDtypeStruct((bsz, cp, hp, wp), plane_dtype)
    du, dv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[plane_struct, plane_struct],
        interpret=interpret,
    )(by, bx, iy, ix, ay, ax, cgx, cgy, planes)
    return (jnp.transpose(du[:, :c, :h_out, :w], (0, 2, 3, 1)),
            jnp.transpose(dv[:, :c, :h_out, :w], (0, 2, 3, 1)))
  out = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=out_struct,
      interpret=interpret,
  )(by, bx, iy, ix, ay, ax, planes)
  return jnp.transpose(out[:, :c, :h_out, :w], (0, 2, 3, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def backward_warp_window(image: jnp.ndarray, flow: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
  """Backward-warps `image` with `flow` via the window-DMA Pallas kernel.

  Args:
    image: (B, H, W, C) array.
    flow: (B, H, W, 2) array; channel 0 is dx, channel 1 is dy.
    interpret: run in the Pallas interpreter (CPU tests).

  Returns:
    Warped image, same shape/dtype as `image`; numerically identical to
    ops.warp.backward_warp.
  """
  return _forward(image, flow, interpret, g=_group_from_env())


def _fwd(image, flow, interpret):
  return (_forward(image, flow, interpret, g=_group_from_env()),
          (image, flow))


# Window-warp backward formulation (A/B knob, read once at import):
#   'planes' (default): the backward computes the flow-derivative planes
#     with the window kernel itself (emit_planes mode — same windows,
#     derivative weights) and reduces them against the cotangent; the
#     image cotangent goes to the splat kernels as before. No gathers.
#   'regather': round-4 behavior — delegate to backward_warp's VJP, which
#     re-runs the gather formulation's forward to rebuild the planes
#     (2 serialized XLA gathers per site; ~55 ms of a 305 ms bs8/256px
#     train step in the round-5 profile).
_WINBWD_MODE = os.environ.get('FI_WARP_WINBWD', 'planes')


def _bwd(interpret, residuals, g):
  image, flow = residuals
  if _WINBWD_MODE != 'planes':
    # Identical math via backward_warp's own custom VJP (which routes
    # the image cotangent to the window-splat kernel on TPU and keeps
    # the plain scatter elsewhere).
    _, vjp = jax.vjp(backward_warp, image, flow)
    return vjp(g)
  du, dv = _forward(image, flow, interpret, g=_group_from_env(),
                    emit_planes=True)
  g_flow = flow_cotangent_from_planes(g, du, dv, flow.dtype)
  g_image = image_cotangent(g, flow, image)
  return g_image, g_flow


backward_warp_window.defvjp(_fwd, _bwd)


def _halo_slab_count(slab: int, n: int) -> int:
  """Halo half-width in SLABS for the row-sharded warp, or 0 (full gather).

  The architecture's resolvable motion is bounded (~192 px: 7 pyramid
  levels x up-to-64 px per level, reference models/film_net/options.py:
  30-34), so a +-k-slab halo with k*slab > 192 covers every realistic
  flow; exactness for arbitrary flow is preserved at runtime by the
  pmax predicate in backward_warp_window_rows. Returns 0 when the halo
  would not actually move fewer bytes than the all-gather (2k sends per
  device vs n-1), or when FI_WARP_ROWS_HALO=0 pins the all-gather.
  """
  if os.environ.get('FI_WARP_ROWS_HALO', '1') == '0':
    return 0
  env = os.environ.get('FI_WARP_ROWS_HALO_SLABS')
  k = int(env) if env else -(-192 // slab)
  if 2 * k >= n - 1 or k < 1:
    return 0
  return k


def backward_warp_window_rows(image: jnp.ndarray,
                              flow: jnp.ndarray) -> jnp.ndarray:
  """Row-sharded window warp for spatially-sharded (GSPMD) forwards.

  The Pallas window kernel carries no SPMD partitioning rules, so a
  GSPMD-partitioned forward previously had to fall back to the ~4.5x
  slower XLA gather at every warp site (parallel/inference.py round 3).
  This wrapper keeps the kernel: inside `jax.shard_map` over the mesh
  declared by ops.warp.spmd_rows_mesh, each device assembles the source
  rows its taps can reach and runs the kernel on its LOCAL slab of output
  rows via the `row_offset` query shift — compute stays 1/n per device,
  clamping semantics stay exactly the full-frame ones.

  Source assembly is HALO-BOUNDED when that moves fewer bytes: each
  device exchanges k slabs per side over ICI (2k ppermute sends vs the
  all-gather's n-1), sized so k*slab exceeds the architecture's ~192 px
  motion ceiling (reference models/film_net/options.py:30-34). Flow is
  data-dependent, so exactness is enforced at RUNTIME: the devices agree
  on pmax(|flow_y|) and lax.cond-switch to the full all-gather whenever
  any query could leave the halo — every device takes the same branch,
  so the collectives inside the branches stay matched. Within the halo
  the result is BIT-exact with the full-frame path: queries are computed
  and tfa-clamped in GLOBAL coordinates (same float maps as the
  all-gather branch), and only the clamped integer row corners shift
  (exactly, in int32) into extension space — the clamp keeps them on
  materialized rows, so edge-of-frame semantics are the global ones by
  construction.

  Falls back to the plain gather warp (which GSPMD partitions cleanly)
  when no mesh context is installed, when the rows do not divide evenly,
  or when the plane is too small for the kernel to win (mirrors the
  'auto' routing thresholds).

  Inference-only: no custom VJP (the spatially-sharded path is a serving
  latency play; training shards the batch, not rows).
  """
  from . import warp as warp_lib

  ctx = warp_lib._SPMD_ROWS
  h, w = image.shape[1], image.shape[2]
  if ctx is None:
    return warp_lib.backward_warp(image, flow)
  mesh, axis = ctx
  n = int(mesh.shape[axis])
  if h % n != 0 or h < 64 or w < 256:
    return warp_lib.backward_warp(image, flow)
  try:
    platform = jax.devices()[0].platform
  except Exception:  # pragma: no cover - no backend configured
    platform = 'cpu'
  interpret = platform != 'tpu'
  g = _group_from_env()
  slab = h // n
  k = _halo_slab_count(slab, n)
  import jax.sharding as shd
  spec = shd.PartitionSpec(None, axis)

  def per_shard(img, flo):
    row0 = jax.lax.axis_index(axis) * slab

    def full_gather(_):
      full = jax.lax.all_gather(img, axis, axis=1, tiled=True)
      return _forward(full, flo, interpret, g=g, row_offset=row0)

    if k == 0:
      return full_gather(None)

    def halo(_):
      # ext = global rows [(d-k)*slab, (d+k+1)*slab): k slabs from each
      # side via ppermute (zero-filled at the mesh edges — never read:
      # the global tfa clamp keeps every tap inside the image rows).
      parts = []
      for j in range(k, 0, -1):
        parts.append(jax.lax.ppermute(
            img, axis, [(i, i + j) for i in range(n - j)]))
      parts.append(img)
      for j in range(1, k + 1):
        parts.append(jax.lax.ppermute(
            img, axis, [(i + j, i) for i in range(n - j)]))
      ext = jnp.concatenate(parts, axis=1)
      # Queries stay in GLOBAL coordinates (clamp_h=h) so the maps are
      # bit-identical to the all-gather branch; only the integer row
      # corners shift by the extension's global start row.
      return _forward(ext, flo, interpret, g=g, row_offset=row0,
                      src_row0=row0 - k * slab, clamp_h=h)

    # All devices agree on the predicate (pmax), so both collective
    # branches stay matched; bound k*slab - 1 keeps floor(q)+1 inside
    # the materialized extension rows.
    vmax = jax.lax.pmax(jnp.max(jnp.abs(flo[..., 1])), axis)
    return jax.lax.cond(vmax <= float(k * slab - 1), halo, full_gather,
                        None)

  return jax.shard_map(per_shard, mesh=mesh, in_specs=(spec, spec),
                       out_specs=spec, check_vma=False)(image, flow)
