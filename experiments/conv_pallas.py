#!/usr/bin/env python
"""Prototype Pallas TPU kernel: 3x3 SAME conv + bias + leaky-relu, NHWC.

Targets the model's 64->64-class convs, which XLA runs at ~35 TFLOPS
(PERF.md): with Cin=64, lane pairs of horizontally adjacent pixels form a
FULL K=128 contraction for two kernel taps at once, as pure reshape views
of the halo'd input buffer — no im2col copies, no tap relayouts:

  out(y, x) = sum_ky sum_kx  X[y+ky-1, x+kx-1, :] @ W[ky, kx]
            = sum_ky ( [X(u=x-1); X(u=x)] @ W[ky, 0:2]   # K=128 pair
                      + X(u=x+1) @ W[ky, 2] )            # K=64 tap

Even/odd output columns use the same views at lane offsets 0 / 64, so the
kernel runs 2 parity passes; their accumulators interleave into the output
tile with one strided store. The input stays NHWC in HBM reshaped to
(H, W*C); tiles DMA a (TH+2, (TW+2)*C) halo window (double-buffered across
tiles).

Correctness is pinned against lax.conv_general_dilated; the benchmark
compares both at 1080p.
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

TH = 16    # output tile rows
TW = 128   # output tile cols
C = 64     # input channels (one lane half)
LANES = (TW + 4) * C  # 8448, a multiple of 128 (the odd-parity
                      # tap-2 view reads one pixel past TW+2)


def _conv_kernel(x2d, w01_ref, w2_ref, b_ref, out_ref, buf, sem,
                 *, n_h: int, n_w: int, negative_slope: float):
  i = pl.program_id(0)
  j = pl.program_id(1)
  pos = i * n_w + j
  n_pos = n_h * n_w
  slot = jax.lax.rem(pos, 2)

  def tile_dma(position, slot_index):
    # bf16 HBM memrefs tile rows in 16s: both the start and the height of
    # the sliced window must be multiples of 16 (height 32 covers the
    # TH + 2 = 18 rows the taps read).
    ti = jax.lax.div(position, n_w)
    tj = jax.lax.rem(position, n_w)
    return pltpu.make_async_copy(
        x2d.at[pl.ds(pl.multiple_of(ti * TH, 16), 2 * TH),
               pl.ds(pl.multiple_of(tj * (TW * C), 128), LANES)],
        buf.at[slot_index], sem.at[slot_index])

  @pl.when(pos == 0)
  def _():
    tile_dma(pos, slot).start()

  @pl.when(pos + 1 < n_pos)
  def _():
    tile_dma(pos + 1, 1 - slot).start()

  tile_dma(pos, slot).wait()

  m_half = TH * TW // 2
  values = []
  for parity in (0, 1):
    off = parity * C
    acc_p = jnp.zeros((m_half, C), jnp.float32)
    for ky in range(3):
      pair = buf[slot, ky:ky + TH, off:off + TW * C].reshape(m_half, 2 * C)
      acc_p += jnp.dot(pair, w01_ref[ky],
                       preferred_element_type=jnp.float32)
      tap2 = buf[slot, ky:ky + TH,
                 off + 2 * C:off + 2 * C + TW * C].reshape(
                     TH, TW // 2, 2 * C)[:, :, :C].reshape(m_half, C)
      acc_p += jnp.dot(tap2, w2_ref[ky],
                       preferred_element_type=jnp.float32)
    value = acc_p.reshape(TH, TW // 2, C) + b_ref[:][None]
    values.append(jnp.where(value >= 0, value, value * negative_slope))
  # Interleave even/odd output columns: (TH, TW/2, 2, C) -> (TH, TW, C).
  inter = jnp.stack(values, axis=2).reshape(TH, TW, C)
  out_ref[...] = inter.astype(out_ref.dtype)


def conv3x3_pallas(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                   negative_slope: float = 0.2,
                   interpret: bool = False) -> jnp.ndarray:
  """x: (1, H, W, 64) bf16; w: (3, 3, 64, 64) HWIO; b: (64,)."""
  _, h, width, c = x.shape
  assert c == C and w.shape == (3, 3, C, C)
  hp = -(-h // TH) * TH
  wp = -(-width // TW) * TW
  n_h, n_w = hp // TH, wp // TW
  # (H, W*C) layout with a 1-pixel halo left/top and pad to the tile grid
  # (+1 right halo pixel inside the padded width).
  x2d = jnp.pad(x[0], ((1, hp + 15 - h), (1, wp + 3 - width), (0, 0)))
  x2d = x2d.reshape(hp + 16, (wp + 4) * C)
  w01 = w[:, 0:2].reshape(3, 2 * C, C)
  w2 = w[:, 2]

  kernel = functools.partial(_conv_kernel, n_h=n_h, n_w=n_w,
                             negative_slope=negative_slope)
  out = pl.pallas_call(
      kernel,
      grid=(n_h, n_w),
      in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec((TH, TW, C), lambda i, j: (i, j, 0)),
      out_shape=jax.ShapeDtypeStruct((hp, wp, C), x.dtype),
      scratch_shapes=[
          pltpu.VMEM((2, 2 * TH, LANES), x.dtype),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      interpret=interpret,
  )(x2d, w01, w2, b.reshape(1, C))
  return out[None, :h, :width, :]


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
  h, width = (64, 256) if interpret else (1088, 1920)
  x = jnp.asarray(rng.rand(1, h, width, C) - 0.5, jnp.bfloat16)
  w = jnp.asarray((rng.rand(3, 3, C, C) - 0.5) * 0.2, jnp.bfloat16)
  b = jnp.asarray((rng.rand(C) - 0.5), jnp.float32)

  got = np.asarray(conv3x3_pallas(x, w, b, interpret=interpret),
                   np.float32)
  want = np.asarray(reference(x, w, b), np.float32)
  err = np.abs(got - want).max()
  print('max abs err vs lax.conv:', err, flush=True)
  assert err < 0.05, err
  if interpret:
    return

  @jax.jit
  def loop_pallas(x, w, b):
    def body(_, x):
      return conv3x3_pallas(x, w, b)
    return jnp.sum(jax.lax.fori_loop(0, 8, body, x).astype(jnp.float32))

  @jax.jit
  def loop_xla(x, w, b):
    def body(_, x):
      y = jax.lax.conv_general_dilated(
          x, w, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
          preferred_element_type=jnp.float32)
      y = y + b[None, None, None]
      return jnp.where(y >= 0, y, y * 0.2).astype(jnp.bfloat16)
    return jnp.sum(jax.lax.fori_loop(0, 8, body, x).astype(jnp.float32))

  for name, fn in (('pallas', loop_pallas), ('xla', loop_xla)):
    float(fn(x, w, b))
    best = float('inf')
    for _ in range(3):
      t0 = time.perf_counter()
      v = float(fn(x, w, b))
      best = min(best, time.perf_counter() - t0)
      assert np.isfinite(v)
    ms = best * 1e3 / 8
    tflops = 2 * h * width * C * C * 9 / (ms / 1e3) / 1e12
    print(f'{name}: {ms:.3f} ms  {tflops:.1f} TFLOPS', flush=True)


if __name__ == '__main__':
  main()
