#!/usr/bin/env python
"""Pallas conv3x3 v2: flat pixel-pair layout, M along buffer rows.

The round-2 conv kernel (experiments/conv_pallas.py) beat XLA in isolation
but lost in-model to its (16, 8192)->(1024, 128) row-regroup relayout
feeding each matmul. This kernel removes that relayout entirely by keeping
the image in a FLAT PIXEL-PAIR layout in HBM:

    x_flat[(py * PW + p), :] = concat(x_pad[py, 2p, :], x_pad[py, 2p+1, :])

(PW pair-columns per padded row; 128 lanes = 2 adjacent pixels x 64
channels; a 2-column left halo keeps pair alignment; py = y + 1 with one
halo row top/bottom). In this layout every matmul lhs is a CONTIGUOUS ROW
SLICE of the DMA'd window:

  * ky taps are row shifts by +-PW,
  * horizontal pair taps are row shifts by +-1,
  * M (output pairs) lies along sublanes, K=128 along lanes — the exact
    MXU-native lhs, no reshapes, no regroups.

Even and odd output columns pack into one (M, 128) accumulator via
column-blocked weights (out lanes 0:64 = even pixel of the pair, 64:128 =
odd). For output pair p (covering padded cols 2p, 2p+1, i.e. real cols
2p-2, 2p-1), per ky:

  acc += X[row p]     @ Wc   with Wc = [[W1, W0], [W2, W1]]  (K=128 full)
  acc += X[row p - 1] @ Wl   with Wl = [[0,  0 ], [W0, 0 ]]  (even kx=0)
  acc += X[row p + 1] @ Wr   with Wr = [[0,  W2], [0,  0 ]]  (odd  kx=2)

9 matmuls of (PW, 128) @ (128, 128) per output row. The side matmuls are
3/4 zeros (2x FLOPs vs the ideal 9 K=64 taps), which K=N=128 MXU shape
efficiency buys back against XLA's ~44 TFLOPS in-model small-C rate.

Chained-conv correctness: halo pairs are zero on input; the kernel
re-zeroes its output halo pairs and halo rows, so the flat layout feeds
the next conv directly — a conv stack pays the entry/exit relayout ONCE.
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

C = 64          # channels per pixel (one lane half)
GUARD = 16      # zero guard rows at BOTH ends: the window DMA starts one
                # 16-row block before padded row y (so the ky=0 left tap's
                # base-1 row is in-window) and the last window reads 16
                # rows past the body


def _round_up(x, m):
  return -(-x // m) * m


def _conv_kernel(xflat, wc_ref, wl_ref, wr_ref, b_ref, out_ref, buf,
                      sem, *, pw: int, tm: int, n_y: int, win_h: int,
                      valid_pairs: int, negative_slope: float,
                      zero_halo: bool):
  y = pl.program_id(0)
  slot = jax.lax.rem(y, 2)

  def window_dma(yy, slot_index):
    return pltpu.make_async_copy(
        xflat.at[pl.ds(pl.multiple_of(yy * (tm * pw), 16), win_h)],
        buf.at[slot_index], sem.at[slot_index])

  @pl.when(y == 0)
  def _():
    window_dma(0, 0).start()

  @pl.when(y + 1 < n_y)
  def _():
    window_dma(y + 1, 1 - slot).start()

  window_dma(y, slot).wait()

  # The window starts at guarded row y*pw = flat row y*pw - GUARD, so
  # window row k = flat row y*pw + k - GUARD = (padded row y + (k - GUARD)
  # // pw, pair (k - GUARD) % pw). Tap (row ky, pair p) => window row
  # GUARD + ky*pw + p; the +-1 pair shifts at the edges read the zero
  # right-halo pair of the previous padded row / left-halo pair of the
  # next — correct values by construction, never out of the window.
  # TM output rows per grid step share one lhs per (ky, dx): output flat
  # row (y*tm + i, p) takes tap (ky, dx) from window row GUARD + (i +
  # ky)*pw + p + dx — contiguous across the whole block, with the
  # between-row halo pairs correctly supplying zeros at the seams.
  # CONV_PROBE isolates cost components (wrong math, perf-only):
  #   aligned — side-tap slices at the aligned base (no sublane shifts)
  #   center  — center matmuls only (no side taps at all)
  probe = os.environ.get('CONV_PROBE', 'full')
  m = tm * pw
  if probe == 'copy':
    # Pure-traffic probe: window DMA in, block out, no compute.
    out_ref[...] = buf[slot, pl.ds(GUARD + pw, m), :]
    return
  acc = jnp.zeros((m, 128), jnp.float32)
  for ky in range(3):
    base = GUARD + ky * pw
    xc = buf[slot, pl.ds(base, m), :]
    acc += jnp.dot(xc, wc_ref[ky], preferred_element_type=jnp.float32)
    if probe == 'center':
      continue
    off = 0 if probe == 'aligned' else 1
    xl = buf[slot, pl.ds(base - off, m), :]
    xr = buf[slot, pl.ds(base + off, m), :]
    acc += jnp.dot(xl, wl_ref[ky], preferred_element_type=jnp.float32)
    acc += jnp.dot(xr, wr_ref[ky], preferred_element_type=jnp.float32)
  value = acc + b_ref[:]
  value = jnp.where(value >= 0, value, value * negative_slope)
  if zero_halo:
    pair = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (m, 128), 0), pw)
    value = jnp.where((pair == 0) | (pair >= valid_pairs), 0.0, value)
  out_ref[...] = value.astype(out_ref.dtype)


def pack_weights(w: jnp.ndarray):
  """(3, 3, 64, 64) HWIO -> (wc, wl, wr), each (3, 128, 128)."""
  zeros = jnp.zeros((C, C), w.dtype)
  wc, wl, wr = [], [], []
  for ky in range(3):
    w0, w1, w2 = w[ky, 0], w[ky, 1], w[ky, 2]
    wc.append(jnp.concatenate([
        jnp.concatenate([w1, w0], axis=1),
        jnp.concatenate([w2, w1], axis=1)], axis=0))
    wl.append(jnp.concatenate([
        jnp.concatenate([zeros, zeros], axis=1),
        jnp.concatenate([w0, zeros], axis=1)], axis=0))
    wr.append(jnp.concatenate([
        jnp.concatenate([zeros, w2], axis=1),
        jnp.concatenate([zeros, zeros], axis=1)], axis=0))
  return jnp.stack(wc), jnp.stack(wl), jnp.stack(wr)


def pair_width(w: int) -> int:
  """PW: pairs per padded row — 16-aligned for bf16 HBM slicing."""
  return _round_up(w + 4, 32) // 2


def to_pairflat(x: jnp.ndarray, pw: int) -> jnp.ndarray:
  """(1, H, W, 64) -> (GUARD + (H+2)*pw + GUARD, 128) flat pair layout."""
  _, h, w, c = x.shape
  assert c == C and w % 2 == 0
  xp = jnp.pad(x[0], ((1, 1), (2, 2 * pw - 2 - w), (0, 0)))
  flat = xp.reshape((h + 2) * pw, 2 * C)
  return jnp.pad(flat, ((GUARD, GUARD), (0, 0)))


def from_pairflat(y: jnp.ndarray, h: int, w: int, pw: int) -> jnp.ndarray:
  """Inverse of to_pairflat (drops halos and guards)."""
  body = y[GUARD:GUARD + (h + 2) * pw].reshape(h + 2, pw * 2, C)
  return body[1:h + 1, 2:2 + w][None]


def conv3x3_flat(xflat: jnp.ndarray, wc, wl, wr, b2: jnp.ndarray,
                 h: int, w: int, pw: int,
                 tm: int = 8,
                 negative_slope: float = 0.2,
                 zero_halo: bool = True,
                 interpret: bool = False) -> jnp.ndarray:
  """One conv entirely in the flat pair layout (chains without leaving it).

  xflat: (GUARD + (H+2)*pw + GUARD, 128); returns the same shape with
  the output image body in place and zeros in the halo rows/pairs/guards.
  """
  assert h % tm == 0, (h, tm)
  win_h = GUARD + (tm + 2) * pw + GUARD
  valid_pairs = 1 + w // 2
  kernel = functools.partial(_conv_kernel, pw=pw, tm=tm, n_y=h // tm,
                             win_h=win_h, valid_pairs=valid_pairs,
                             negative_slope=negative_slope,
                             zero_halo=zero_halo)
  out_rows = pl.pallas_call(
      kernel,
      grid=(h // tm,),
      in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec((tm * pw, 128), lambda y: (y, 0)),
      out_shape=jax.ShapeDtypeStruct((h * pw, 128), xflat.dtype),
      scratch_shapes=[
          pltpu.VMEM((2, win_h, 128), xflat.dtype),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      interpret=interpret,
  )(xflat, wc, wl, wr, b2)
  pre = jnp.zeros((GUARD + pw, 128), xflat.dtype)   # guard + top halo row
  post = jnp.zeros((pw + GUARD, 128), xflat.dtype)  # bottom halo + guard
  return jnp.concatenate([pre, out_rows, post], axis=0)


def reference(x, w, b, negative_slope=0.2):
  y = jax.lax.conv_general_dilated(
      x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), 'SAME',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  y = y + b[None, None, None]
  return jnp.where(y >= 0, y, y * negative_slope)


def main():
  interpret = os.environ.get('CONV_INTERPRET', '0') == '1'
  if interpret:
    jax.config.update('jax_platforms', 'cpu')
  print('platform:', jax.devices()[0].platform, flush=True)
  rng = np.random.RandomState(0)
  h, width = (16, 48) if interpret else (1088, 1920)
  tm = int(os.environ.get('CONV_TM', '8'))
  pw = pair_width(width)
  x = jnp.asarray(rng.rand(1, h, width, C) - 0.5, jnp.bfloat16)
  w = jnp.asarray((rng.rand(3, 3, C, C) - 0.5) * 0.2, jnp.bfloat16)
  b = jnp.asarray((rng.rand(C) - 0.5), np.float32)
  wc, wl, wr = pack_weights(w)
  b2 = jnp.concatenate([b, b])[None, :]

  xflat = to_pairflat(x, pw)
  got_flat = conv3x3_flat(xflat, wc, wl, wr, b2, h, width, pw, tm=tm,
                          interpret=interpret)
  got = np.asarray(from_pairflat(got_flat, h, width, pw), np.float32)
  want = np.asarray(reference(x, w, b), np.float32)
  err = np.abs(got - want).max()
  print('max abs err vs lax.conv:', err, flush=True)
  if os.environ.get('CONV_PROBE', 'full') == 'full':
    assert err < 0.05, err

  # Chain parity: two convs without leaving the layout.
  got2_flat = conv3x3_flat(got_flat, wc, wl, wr, b2, h, width, pw, tm=tm,
                           interpret=interpret)
  got2 = np.asarray(from_pairflat(got2_flat, h, width, pw), np.float32)
  want2 = np.asarray(
      reference(reference(x, w, b).astype(jnp.bfloat16), w, b), np.float32)
  err2 = np.abs(got2 - want2).max()
  print('chain-of-2 max abs err:', err2, flush=True)
  if os.environ.get('CONV_PROBE', 'full') == 'full':
    assert err2 < 0.1, err2
  if interpret:
    print('interpret parity OK')
    return

  n_chain = 8

  @jax.jit
  def loop_pallas(x, wc, wl, wr, b2):
    xf = to_pairflat(x, pw)

    def body(_, xf):
      return conv3x3_flat(xf, wc, wl, wr, b2, h, width, pw, tm=tm)

    yf = jax.lax.fori_loop(0, n_chain, body, xf)
    return jnp.sum(from_pairflat(yf, h, width, pw).astype(jnp.float32))

  @jax.jit
  def loop_xla(x, w, b):
    def body(_, x):
      y = jax.lax.conv_general_dilated(
          x, w, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
          preferred_element_type=jnp.float32)
      y = y + b[None, None, None]
      return jnp.where(y >= 0, y, y * 0.2).astype(jnp.bfloat16)

    return jnp.sum(jax.lax.fori_loop(0, n_chain, body, x).astype(
        jnp.float32))

  for name, fn, args in (('pallas', loop_pallas, (x, wc, wl, wr, b2)),
                         ('xla', loop_xla, (x, w, b))):
    float(fn(*args))
    best = float('inf')
    for _ in range(3):
      t0 = time.perf_counter()
      v = float(fn(*args))
      best = min(best, time.perf_counter() - t0)
      assert np.isfinite(v)
    ms = best * 1e3 / n_chain
    tflops = 2 * h * width * C * C * 9 / (ms / 1e3) / 1e12
    print(f'{name}: {ms:.3f} ms/conv  {tflops:.1f} TFLOPS', flush=True)


if __name__ == '__main__':
  main()
