#!/usr/bin/env python
"""Tall-window variant of the window-DMA warp kernel (ops/warp_window.py).

Hypothesis (PERF.md round 3): the window kernel is HBM-bound on this
~139 GB/s chip and its windows overfetch ~6x the output bytes — each
(8, 128) output tile DMAs its own (24, 128) window (3x rows) from 1-2
column positions (2x cols). Serving a GROUP of 4 vertically adjacent
output tiles (32 rows) from ONE (48, 128) window cuts the row overfetch
from 24/8 = 3x to 48/32 = 1.5x, i.e. ~2x less window traffic for smooth
flow, with the multi-window walk machinery intact for motion boundaries.

Run on CPU (interpret-mode correctness) then TPU (parity + bench):
  python experiments/warp_window_tall.py            # TPU bench
  WWT_CPU=1 python experiments/warp_window_tall.py  # interpret correctness
"""
from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from frame_interpolation_tpu.ops.warp import _query_coords, backward_warp

_TH = 8
_TW = 128
_G = 4                 # output tiles per group
_GH = _G * _TH         # 32 output rows per kernel instance
_WIN_H = 48            # 40-row load-start coverage + 8 slack
_WIN_STEP = 40


def _round_up(x, m):
  return -(-x // m) * m


def _kernel(by_ref, bx_ref, iy_ref, ix_ref, ay_ref, ax_ref, planes,
            out_ref, win, winf_ref, acc_ref, sem,
            *, cb, cp, n_sp, n_tx):
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

  def window_dma(c_start, row0, col0, slot_index):
    return pltpu.make_async_copy(
        planes.at[pl.ds(c_start, cb),
                  pl.ds(pl.multiple_of(row0 + 8, _TH), _WIN_H),
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

  @pl.when(pos + 1 < n_pos)
  def _():
    first_window_dma(pos + 1, 1 - slot).start()

  iy = iy_ref[0]
  ix = ix_ref[0]
  ay = ay_ref[0]
  ax = ax_ref[0]
  tg32 = tg * _GH

  # Per-subtile displacement ranges (static 8-row slices of the group).
  subs = []
  r_hi = None
  for s in range(_G):
    iy_s = iy[s * _TH:(s + 1) * _TH]
    dy_s = iy_s - (tg32 + s * _TH +
                   jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 0))
    d_lo_s = jnp.min(dy_s)
    d_hi_s = jnp.max(dy_s) + 2
    subs.append((dy_s, d_lo_s, d_hi_s))
    hi = s * _TH + d_hi_s
    r_hi = hi if r_hi is None else jnp.maximum(r_hi, hi)

  cw_lo = bx_ref[bt] // _TW
  cw_hi = (jnp.max(ix) + 1) // _TW
  n_wy = pl.cdiv(tg32 + r_hi - by_ref[bt], _WIN_STEP)
  n_wx = cw_hi + 1 - cw_lo
  n_w = n_wy * n_wx

  def win_origin(k):
    ky = jax.lax.div(k, n_wx)
    kx = jax.lax.rem(k, n_wx)
    return by_ref[bt] + _WIN_STEP * ky, bx_ref[bt] + _TW * kx

  def win_slot(k):
    return jnp.where(jax.lax.rem(k, 2) == 0, slot, 2)

  needs_expand = win.dtype != jnp.float32

  def window_body(k, _):
    wy0, wx0 = win_origin(k)
    my_slot = win_slot(k)
    window_dma(c0, wy0, wx0, my_slot).wait()

    @pl.when(k + 1 < n_w)
    def _():
      ny0, nx0 = win_origin(k + 1)
      window_dma(c0, ny0, nx0, win_slot(k + 1)).start()

    if needs_expand:
      winf_ref[...] = win[my_slot].astype(jnp.float32)

    for s in range(_G):
      dy_s, d_lo_s, d_hi_s = subs[s]
      ix_s = ix[s * _TH:(s + 1) * _TH]
      ax_s = ax[s * _TH:(s + 1) * _TH]
      ay_s = ay[s * _TH:(s + 1) * _TH]
      wy_tap0 = 1.0 - ay_s
      # Shifts whose 8-row load-start falls inside this window.
      d_lo = jnp.maximum(d_lo_s, wy0 - tg32 - s * _TH)
      d_hi = jnp.minimum(d_hi_s, wy0 + _WIN_STEP - tg32 - s * _TH)
      lx = ix_s - wx0
      lx0 = jnp.clip(lx, 0, _TW - 1)
      lx1 = jnp.clip(lx + 1, 0, _TW - 1)
      w0m = jnp.where((lx >= 0) & (lx < _TW), 1.0 - ax_s, 0.0)
      w1m = jnp.where((lx + 1 >= 0) & (lx + 1 < _TW), ax_s, 0.0)

      def tile_channels(x):
        return jnp.broadcast_to(x[None], (cb, _TH, _TW)).reshape(
            cb * _TH, _TW)

      lx0b = tile_channels(lx0)
      lx1b = tile_channels(lx1)

      def d_body(d, _, s=s, dy_s=dy_s, wy_tap0=wy_tap0, ay_s=ay_s,
                 w0m=w0m, w1m=w1m, lx0b=lx0b, lx1b=lx1b, wy0=wy0,
                 my_slot=my_slot):
        wy = (jnp.where(dy_s == d, wy_tap0, 0.0) +
              jnp.where(dy_s == d - 1, ay_s, 0.0))
        w0 = w0m * wy
        w1 = w1m * wy

        @pl.when(jnp.any((w0 > 0.0) | (w1 > 0.0)))
        def _():
          row = tg32 + s * _TH + d - wy0
          if needs_expand:
            src = winf_ref[:, pl.ds(row, _TH), :]
          else:
            src = win[my_slot, :, pl.ds(row, _TH), :]
          src = src.reshape(cb * _TH, _TW)
          g0 = jnp.take_along_axis(src, lx0b, axis=1).reshape(
              cb, _TH, _TW)
          g1 = jnp.take_along_axis(src, lx1b, axis=1).reshape(
              cb, _TH, _TW)
          acc_ref[:, s * _TH:(s + 1) * _TH, :] += (
              w0[None] * g0 + w1[None] * g1)

        return 0

      jax.lax.fori_loop(d_lo, d_hi, d_body, 0)
    return 0

  acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
  jax.lax.fori_loop(0, n_w, window_body, 0)
  out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _group_window_bases(iy, ix, n_tg, n_tx):
  n_ty = n_tg * _G
  rows = jnp.arange(n_ty * _TH, dtype=jnp.int32)[:, None]
  d_lo = jnp.min((iy - rows).reshape(n_ty, _TH, n_tx, _TW), axis=(1, 3))
  ty8 = jnp.arange(n_ty, dtype=jnp.int32)[:, None] * _TH
  by_t = ((ty8 + d_lo) // _TH) * _TH
  by = jnp.min(by_t.reshape(n_tg, _G, n_tx), axis=1)
  c_lo = jnp.min(ix.reshape(n_ty, _TH, n_tx, _TW), axis=(1, 3))
  bx_t = (c_lo // _TW) * _TW
  bx = jnp.min(bx_t.reshape(n_tg, _G, n_tx), axis=1)
  return by.reshape(-1).astype(jnp.int32), bx.reshape(-1).astype(jnp.int32)


def _channel_block(c, plane_dtype):
  cap = 144 if plane_dtype == jnp.bfloat16 else 96
  n_blocks = -(-c // cap)
  return -(-c // n_blocks)


@functools.partial(jax.jit, static_argnames=('interpret',))
def forward_tall(image, flow, interpret=False):
  bsz, h, w, c = image.shape
  out_dtype = image.dtype
  iy, ix, ay, ax = _query_coords(h, w, flow)

  hp = _round_up(h, _GH)
  wp = _round_up(w, _TW)
  n_ty = hp // _TH
  n_tg = hp // _GH
  n_tx = wp // _TW
  pads = ((0, 0), (0, hp - h), (0, wp - w))
  iy = jnp.pad(iy, pads, mode='edge')
  ix = jnp.pad(ix, pads, mode='edge')
  ay = jnp.pad(ay, pads, mode='edge')
  ax = jnp.pad(ax, pads, mode='edge')
  by, bx = jax.vmap(functools.partial(_group_window_bases, n_tg=n_tg,
                                      n_tx=n_tx))(iy, ix)
  by = by.reshape(-1)
  bx = bx.reshape(-1)

  plane_dtype = (image.dtype if jnp.issubdtype(image.dtype, jnp.floating)
                 else jnp.float32)
  cb = _channel_block(c, plane_dtype)
  cp = _round_up(c, cb)
  planes = jnp.transpose(image.astype(plane_dtype), (0, 3, 1, 2))
  planes = jnp.pad(planes, ((0, 0), (0, cp - c), (8, hp + 80 - h),
                            (0, wp - w)))
  planes = planes.reshape(bsz * cp, hp + 88, wp)

  n_sp = n_tg * n_tx
  needs_expand = plane_dtype != jnp.float32
  if needs_expand:
    kernel = functools.partial(_kernel, cb=cb, cp=cp, n_sp=n_sp, n_tx=n_tx)
  else:
    def kernel(by, bx, iy, ix, ay, ax, planes, out, win, acc, sem):
      _kernel(by, bx, iy, ix, ay, ax, planes, out, win, None, acc, sem,
              cb=cb, cp=cp, n_sp=n_sp, n_tx=n_tx)
  idx_spec = pl.BlockSpec((1, _GH, _TW),
                          lambda b, ci, tg, tx, *refs: (b, tg, tx))
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=2,
      grid=(bsz, cp // cb, n_tg, n_tx),
      in_specs=[idx_spec, idx_spec, idx_spec, idx_spec,
                pl.BlockSpec(memory_space=pl.ANY)],
      out_specs=pl.BlockSpec((1, cb, _GH, _TW),
                             lambda b, ci, tg, tx, *refs: (b, ci, tg, tx)),
      scratch_shapes=(
          [pltpu.VMEM((3, cb, _WIN_H, _TW), plane_dtype)] +
          ([pltpu.VMEM((cb, _WIN_H, _TW), jnp.float32)]
           if needs_expand else []) +
          [pltpu.VMEM((cb, _GH, _TW), jnp.float32),
           pltpu.SemaphoreType.DMA((3,))]))
  out = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((bsz, cp, hp, wp), out_dtype),
      interpret=interpret,
  )(by, bx, iy, ix, ay, ax, planes)
  return jnp.transpose(out[:, :c, :h, :w], (0, 2, 3, 1))


def make_flow(h, w, kind):
  yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
  f = np.stack([30 * np.sin(yy / 97.0) * np.cos(xx / 131.0),
                30 * np.cos(yy / 113.0) * np.sin(xx / 89.0)],
               axis=-1).astype(np.float32)
  if kind == 'boundary':
    seam = (yy + 2 * xx) % 613 < 240
    f[seam] += np.array([40.0, -37.0], np.float32)
  elif kind == 'random':
    f = np.random.RandomState(3).uniform(-30, 30, (h, w, 2)).astype(
        np.float32)
  return f[None]


def check_cpu():
  jax.config.update('jax_platforms', 'cpu')
  rng = np.random.RandomState(0)
  for (h, w, c) in [(64, 128, 5), (70, 200, 3), (96, 256, 67)]:
    img = rng.rand(2, h, w, c).astype(np.float32)
    for kind in ['smooth', 'boundary', 'random']:
      flow = np.concatenate([make_flow(h, w, kind)] * 2).astype(np.float32)
      got = forward_tall(jnp.asarray(img), jnp.asarray(flow),
                         interpret=True)
      want = backward_warp(jnp.asarray(img), jnp.asarray(flow))
      err = float(jnp.max(jnp.abs(got - want)))
      print(f'{h}x{w}x{c} {kind}: max err {err:.2e}')
      assert err < 1e-5, (h, w, c, kind, err)
  print('CPU interpret parity OK')


def bench_tpu():
  from frame_interpolation_tpu.ops import warp_window
  H, W, C = 1088, 1920, 67
  rng = np.random.RandomState(1)
  image = jnp.asarray(rng.rand(1, H, W, C).astype(np.float32),
                      dtype=jnp.bfloat16)
  for kind in ['smooth', 'boundary']:
    flow = jnp.asarray(make_flow(H, W, kind))

    for name, fn in [('tall', forward_tall),
                     ('base', warp_window.backward_warp_window)]:
      @jax.jit
      def run(image, flow, fn=fn):
        def body(_, carry):
          return fn(carry, flow)
        return jnp.mean(jax.lax.fori_loop(0, 8, body, image).astype(
            jnp.float32))

      v = float(run(image, flow))  # compile + run
      ts = []
      for _ in range(3):
        t0 = time.perf_counter()
        float(run(image, flow))
        ts.append(time.perf_counter() - t0)
      print(f'{kind} {name}: {min(ts) / 8 * 1e3:.2f} ms/warp '
            f'(value {v:.4f})')

    # parity on device
    got = forward_tall(image, flow)
    want = warp_window.backward_warp_window(image, flow)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                want.astype(jnp.float32))))
    print(f'{kind}: tall vs base max abs err {err:.2e}')


if __name__ == '__main__':
  if os.environ.get('WWT_CPU'):
    check_cpu()
  else:
    bench_tpu()
