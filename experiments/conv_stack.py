#!/usr/bin/env python
"""Fused conv3x3(+leaky)+2x2-avg-pool pair-flat kernel, + side-matmul combine.

Two measured hypotheses from the round-3 close-out (VERDICT item 1):

  1. SIDE-MATMUL COMBINE. The pair-flat conv's 3 matmuls per ky include
     two side matmuls that are 3/4 zeros (conv_pairflat.py pack_weights).
     The side taps only need
       even_out += xl[:, 64:] @ W0      (left pair's odd pixel)
       odd_out  += xr[:, :64] @ W2      (right pair's even pixel)
     so S = [xl lanes 64: | xr lanes :64] (one lane-roll + select) turns
     both into ONE half-dense matmul S @ blockdiag(W0, W2): 2 matmuls
     per ky instead of 3 -> 1/3 less MXU time. CONV_SIDE=separate keeps
     the 3-matmul formulation for the A/B.

  2. POOL FUSION. The extractor pools each sub-level's features before
     the next (reference feature_extractor.py:119-123). A 2x2 avg-pool
     in the pair layout is lane-half sums + adjacent-y-row sums of the
     conv's OWN output block, so emitting the pooled plane as a second
     kernel output saves the separate XLA pool pass (a full re-read of
     the 267 MB feature plane at 1080p).

Geometry: like conv_pairflat2 but with body_start = (tm+2)*pw (one extra
zero row above the top halo) so every block starts at an EVEN image row —
each block then holds tm/2 complete y-pairs and pools independently.
Pooled output: per block (tm/2 * pw, 128) rows; row (ypair, p) lanes 0:64
hold pooled pixel (py, px=p-1) (lanes 64:128 are don't-care).

Run:  python experiments/conv_stack.py            (real TPU)
      CONV_INTERPRET=1 python experiments/conv_stack.py  (CPU parity)
Knobs: CONV_TM, CONV_CHUNK, CONV_SIDE=combined|separate, CONV_POOL=0|1.
"""
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

from conv_pairflat2 import C, pair_width


def _round_up(x, m):
  return -(-x // m) * m


def buffer_geometry(h: int, w: int, tm: int):
  """(pw, r_total, n_blocks, body_start); body_start = (tm+2)*pw."""
  assert tm % 2 == 0, tm
  pw = pair_width(w)
  body_start = (tm + 2) * pw
  m = tm * pw
  n_blocks = -(-(body_start + (h + 1) * pw + 16) // m) + 1
  return pw, n_blocks * m, n_blocks, body_start


def to_pairflat(x: jnp.ndarray, tm: int) -> jnp.ndarray:
  _, h, w, c = x.shape
  assert c == C and w % 2 == 0
  pw, r_total, _, body_start = buffer_geometry(h, w, tm)
  xp = jnp.pad(x[0], ((1, 1), (2, 2 * pw - 2 - w), (0, 0)))
  flat = xp.reshape((h + 2) * pw, 2 * C)
  top = body_start - pw
  return jnp.pad(flat, ((top, r_total - top - (h + 2) * pw), (0, 0)))


def from_pairflat(y: jnp.ndarray, h: int, w: int, tm: int) -> jnp.ndarray:
  pw, _, _, body_start = buffer_geometry(h, w, tm)
  body = y[body_start - pw:body_start + (h + 1) * pw].reshape(h + 2, pw * 2,
                                                              C)
  return body[1:h + 1, 2:2 + w][None]


def pack_weights_combined(w: jnp.ndarray):
  """(3, 3, 64, 64) HWIO -> (wc, ws), each (3, 128, 128)."""
  zeros = jnp.zeros((C, C), w.dtype)
  wc, ws = [], []
  for ky in range(3):
    w0, w1, w2 = w[ky, 0], w[ky, 1], w[ky, 2]
    wc.append(jnp.concatenate([
        jnp.concatenate([w1, w0], axis=1),
        jnp.concatenate([w2, w1], axis=1)], axis=0))
    ws.append(jnp.concatenate([
        jnp.concatenate([w0, zeros], axis=1),
        jnp.concatenate([zeros, w2], axis=1)], axis=0))
  return jnp.stack(wc), jnp.stack(ws)


def _stack_kernel(xflat, wc_ref, ws_ref, b_ref, out_ref, pool_ref, buf, sem,
                  *, pw: int, tm: int, n_blocks: int, win_h: int,
                  r_in: int, body_start: int, body_rows: int,
                  valid_pairs: int, negative_slope: float, chunk: int,
                  side: str, emit_pool: bool):
  j = pl.program_id(0)
  slot = jax.lax.rem(j, 2)
  m = tm * pw

  def start_row(jj):
    raw = jj * m - pw - 16
    return jnp.clip(raw, 0, r_in - win_h)

  def window_dma(jj, slot_index):
    return pltpu.make_async_copy(
        xflat.at[pl.ds(pl.multiple_of(start_row(jj), 16), win_h)],
        buf.at[slot_index], sem.at[slot_index])

  @pl.when(j == 0)
  def _():
    window_dma(0, 0).start()

  @pl.when(j + 1 < n_blocks)
  def _():
    window_dma(j + 1, 1 - slot).start()

  window_dma(j, slot).wait()

  block_start = j * m
  n_sub = -(-m // chunk)
  for s in range(n_sub):
    row0 = s * chunk
    cm = min(chunk, m - row0)
    acc = jnp.zeros((cm, 128), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (cm, 128), 1)
    for ky in range(3):
      base = 16 + ky * pw + row0
      xc = buf[slot, pl.ds(base, cm), :]
      acc += jnp.dot(xc, wc_ref[ky], preferred_element_type=jnp.float32)
      xl = buf[slot, pl.ds(base - 1, cm), :]
      xr = buf[slot, pl.ds(base + 1, cm), :]
      # Mosaic's lane rotate is 32-bit-only ("Rotate with non-32-bit
      # data"), so the 64-lane shuffle runs on an f32 copy; bf16->f32->
      # bf16 is exact.
      if side == 'combined':
        # S[i<64] = xl[i+64], S[i>=64] = xr[i-64]: select THEN one roll.
        sel = jnp.where(lane < 64, xr, xl).astype(jnp.float32)
        s_val = pltpu.roll(sel, 64, 1).astype(xc.dtype)
        acc += jnp.dot(s_val, ws_ref[ky],
                       preferred_element_type=jnp.float32)
      else:
        xl32 = pltpu.roll(xl.astype(jnp.float32), 64, 1).astype(xc.dtype)
        xr32 = pltpu.roll(xr.astype(jnp.float32), 64, 1).astype(xc.dtype)
        sl = jnp.where(lane < 64, xl32, jnp.zeros_like(xl))
        sr = jnp.where(lane >= 64, xr32, jnp.zeros_like(xr))
        acc += jnp.dot(sl, ws_ref[ky], preferred_element_type=jnp.float32)
        acc += jnp.dot(sr, ws_ref[ky], preferred_element_type=jnp.float32)
    value = acc + b_ref[:]
    value = jnp.where(value >= 0, value, value * negative_slope)
    r = (block_start + row0 +
         jax.lax.broadcasted_iota(jnp.int32, (cm, 128), 0))
    q = r - body_start
    pair = jax.lax.rem(q, pw)
    ok = ((q >= 0) & (q < body_rows) & (pair >= 1) & (pair < valid_pairs))
    masked = jnp.where(ok, value, 0.0)
    out_ref[pl.ds(row0, cm), :] = masked.astype(out_ref.dtype)
    if emit_pool:
      # chunk % (2*pw) == 0 and blocks start on even image rows, so each
      # chunk holds complete y-pairs: sum adjacent y rows, then lane
      # halves; pooled row (ypair, p) keeps the sum in lanes 0:64.
      v2 = masked.reshape(cm // (2 * pw), 2, pw, 128)
      ysum = (v2[:, 0] + v2[:, 1]).reshape(cm // 2, 128)
      hsum = ysum + pltpu.roll(ysum, 64, 1)
      pool_ref[pl.ds(row0 // 2, cm // 2), :] = (
          hsum * 0.25).astype(pool_ref.dtype)


def conv_stack_flat(xflat, wc, ws, b2, h: int, w: int, tm: int = 8,
                    negative_slope: float = 0.2,
                    side: str = 'combined', emit_pool: bool = True,
                    interpret: bool = False):
  pw, r_total, n_blocks, body_start = buffer_geometry(h, w, tm)
  assert xflat.shape[0] == r_total, (xflat.shape, r_total)
  win_h = (tm + 2) * pw + 32
  chunk = int(os.environ.get('CONV_CHUNK', '0')) or 2 * pw
  assert chunk % (2 * pw) == 0, (chunk, pw)
  m = tm * pw
  kernel = functools.partial(
      _stack_kernel, pw=pw, tm=tm, n_blocks=n_blocks, win_h=win_h,
      r_in=r_total, body_start=body_start, body_rows=h * pw,
      valid_pairs=1 + w // 2, negative_slope=negative_slope, chunk=chunk,
      side=side, emit_pool=emit_pool)
  return pl.pallas_call(
      kernel,
      grid=(n_blocks,),
      in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [
          pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
      out_specs=(pl.BlockSpec((m, 128), lambda j: (j, 0)),
                 pl.BlockSpec((m // 2, 128), lambda j: (j, 0))),
      out_shape=(jax.ShapeDtypeStruct((r_total, 128), xflat.dtype),
                 jax.ShapeDtypeStruct((r_total // 2, 128), xflat.dtype)),
      scratch_shapes=[
          pltpu.VMEM((2, win_h, 128), xflat.dtype),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      interpret=interpret,
  )(xflat, wc, ws, b2)


def pooled_from_flat(p: np.ndarray, h: int, w: int, tm: int) -> np.ndarray:
  """Pooled kernel output -> (1, h/2, w/2, 64)."""
  pw, r_total, n_blocks, body_start = buffer_geometry(h, w, tm)
  m = tm * pw
  out = np.zeros((h // 2, w // 2, C), np.float32)
  for j in range(n_blocks):
    block = p[j * (m // 2):(j + 1) * (m // 2)]
    y0 = (j * m - body_start) // pw          # first image row (even)
    for ypair in range(tm // 2):
      py = (y0 + 2 * ypair) // 2
      if not 0 <= py < h // 2:
        continue
      rows = block[ypair * pw:(ypair + 1) * pw]
      out[py] = rows[1:1 + w // 2, :C]
  return out[None]


def reference(x, w, b, negative_slope=0.2):
  y = jax.lax.conv_general_dilated(
      x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), 'SAME',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  y = y + b[None, None, None]
  return jnp.where(y >= 0, y, y * negative_slope)


def reference_pool(y):
  return jax.lax.reduce_window(
      y.astype(jnp.float32), 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
      'VALID') * 0.25


def main():
  interpret = os.environ.get('CONV_INTERPRET', '0') == '1'
  if interpret:
    jax.config.update('jax_platforms', 'cpu')
  print('platform:', jax.devices()[0].platform, flush=True)
  rng = np.random.RandomState(0)
  h, width = (16, 48) if interpret else (1088, 1920)
  tm = int(os.environ.get('CONV_TM', '8'))
  side = os.environ.get('CONV_SIDE', 'combined')
  emit_pool = os.environ.get('CONV_POOL', '1') == '1'
  x = jnp.asarray(rng.rand(1, h, width, C) - 0.5, jnp.bfloat16)
  w_ = jnp.asarray((rng.rand(3, 3, C, C) - 0.5) * 0.2, jnp.bfloat16)
  b_ = jnp.asarray((rng.rand(C) - 0.5), np.float32)
  wc, ws = pack_weights_combined(w_)
  b2 = jnp.concatenate([b_, b_])[None, :]

  run = jax.jit(functools.partial(conv_stack_flat, h=h, w=width, tm=tm,
                                  side=side, emit_pool=emit_pool,
                                  interpret=interpret))
  xflat = to_pairflat(x, tm)
  feat_flat, pool_flat = run(xflat, wc, ws, b2)
  got = np.asarray(from_pairflat(feat_flat, h, width, tm), np.float32)
  want = np.asarray(reference(x, w_, b_), np.float32)
  err = np.abs(got - want).max()
  print(f'features max abs err (side={side}):', err, flush=True)
  assert err < 0.05, err
  if emit_pool:
    got_pool = pooled_from_flat(np.asarray(pool_flat, np.float32), h, width,
                                tm)
    want_pool = np.asarray(reference_pool(jnp.asarray(want)), np.float32)
    perr = np.abs(got_pool - want_pool).max()
    print('pooled max abs err:', perr, flush=True)
    assert perr < 0.05, perr
  if interpret:
    print('interpret parity OK')
    return

  n_iter = 8

  @jax.jit
  def loop_pallas(xflat, wc, ws, b2):
    def body(_, carry):
      xf, acc = carry
      f, p = conv_stack_flat(xf, wc, ws, b2, h=h, w=width, tm=tm,
                             side=side, emit_pool=emit_pool)
      if emit_pool:
        acc = acc + jnp.sum(p[:8].astype(jnp.float32))
      return f, acc

    yf, acc = jax.lax.fori_loop(0, n_iter, body, (xflat, 0.0))
    return jnp.sum(yf.astype(jnp.float32)) + acc

  @jax.jit
  def loop_xla(x, w_, b_):
    def body(_, carry):
      xx, acc = carry
      y = reference(xx, w_, b_).astype(jnp.bfloat16)
      p = reference_pool(y)
      return y, acc + jnp.sum(p[:, :4, :4].astype(jnp.float32))

    y, acc = jax.lax.fori_loop(0, n_iter, body, (x, 0.0))
    return jnp.sum(y.astype(jnp.float32)) + acc

  for name, fn, args in ((f'pallas conv+pool x{n_iter}', loop_pallas,
                          (xflat, wc, ws, b2)),
                         ('xla conv+pool', loop_xla, (x, w_, b_))):
    float(fn(*args))
    best = float('inf')
    for _ in range(3):
      t0 = time.perf_counter()
      v = float(fn(*args))
      best = min(best, time.perf_counter() - t0)
      assert np.isfinite(v)
    ms = best * 1e3 / n_iter
    tflops = 2 * h * width * C * C * 9 / (ms / 1e3) / 1e12
    print(f'{name}: {ms:.3f} ms/stack  {tflops:.1f} TFLOPS', flush=True)


if __name__ == '__main__':
  main()
