#!/usr/bin/env python
"""Fused conv3x3->leaky->conv3x3->leaky pair-flat kernel (in-VMEM chain).

conv_pairflat2 proved a single pair-flat conv is write-bound (~7.3 ms at
1088x1920x64: window reads 340 MB + output 272 MB at ~84 GB/s). Chaining
two convs through HBM doubles that. This experiment fuses BOTH convs in
one kernel: per block, conv0 is computed for the block's rows plus a
(pw+16)-row halo into a VMEM scratch, then conv1 consumes the scratch and
writes the only HBM output. Traffic for the PAIR of convs drops from
~1.2 GB to ~0.68 GB (1.5x-overlap window reads + one output).

Key identity (from conv_pairflat2): flat output row r takes tap (ky, dx)
from flat input row r + (ky-1)*pw + dx, and the relation is
shift-invariant — with the window starting at block - 2e (e = pw + 16)
and conv0 computed for rows [block - e, block + m + e), BOTH convs read
their operands at the same static window-relative offset
16 + ky*pw + dx + chunk_row.

Run: python experiments/conv_chain.py  (real TPU; CONV_TM=8 CONV_VMEM=...)
     CONV_INTERPRET=1 python experiments/conv_chain.py  (CPU parity)
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

from conv_pairflat2 import (C, buffer_geometry, from_pairflat, pack_weights,
                            reference, to_pairflat)


def _chain_kernel(xflat, w0c_ref, w0l_ref, w0r_ref, b0_ref,
                  w1c_ref, w1l_ref, w1r_ref, b1_ref, out_ref,
                  buf, mid, sem,
                  *, pw: int, tm: int, n_blocks: int, win_h: int,
                  r_in: int, body_start: int, body_rows: int,
                  valid_pairs: int, negative_slope: float, chunk: int):
  j = pl.program_id(0)
  slot = jax.lax.rem(j, 2)
  m = tm * pw
  e = pw + 16                     # per-conv halo extension (flat rows)

  def start_row(jj):
    raw = jj * m - 2 * e
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

  def mask_rows(value, abs_row0, cm):
    # Flat row r is a real output iff it lies in the body and its pair
    # index is in [1, valid_pairs) — guards/halos are zeroed so the next
    # conv's taps read zeros (SAME padding semantics).
    r = abs_row0 + jax.lax.broadcasted_iota(jnp.int32, (cm, 128), 0)
    q = r - body_start
    pair = jax.lax.rem(q, pw)
    ok = ((q >= 0) & (q < body_rows) & (pair >= 1) & (pair < valid_pairs))
    return jnp.where(ok, value, 0.0)

  # Stage 0: conv0 over [block - e, block + m + e) -> mid scratch.
  mid_rows = m + 2 * e
  n_sub0 = -(-mid_rows // chunk)
  for s in range(n_sub0):
    row0 = s * chunk
    cm = min(chunk, mid_rows - row0)
    acc = jnp.zeros((cm, 128), jnp.float32)
    for ky in range(3):
      for dx, w_ref in ((0, w0c_ref), (-1, w0l_ref), (1, w0r_ref)):
        lhs = buf[slot, pl.ds(16 + ky * pw + dx + row0, cm), :]
        acc += jnp.dot(lhs, w_ref[ky], preferred_element_type=jnp.float32)
    value = acc + b0_ref[:]
    value = jnp.where(value >= 0, value, value * negative_slope)
    abs_row0 = block_start - e + row0
    mid[pl.ds(row0, cm), :] = mask_rows(value, abs_row0, cm).astype(
        mid.dtype)

  # Stage 1: conv1 over the block -> output. mid holds rows
  # [block - e, block + m + e); out row (block + i) taps mid absolute row
  # (block + i) + (ky-1)*pw + dx = mid-relative e + i + (ky-1)*pw + dx =
  # 16 + ky*pw + dx + i (the same static constant).
  n_sub1 = -(-m // chunk)
  for s in range(n_sub1):
    row0 = s * chunk
    cm = min(chunk, m - row0)
    acc = jnp.zeros((cm, 128), jnp.float32)
    for ky in range(3):
      for dx, w_ref in ((0, w1c_ref), (-1, w1l_ref), (1, w1r_ref)):
        lhs = mid[pl.ds(16 + ky * pw + dx + row0, cm), :]
        acc += jnp.dot(lhs, w_ref[ky], preferred_element_type=jnp.float32)
    value = acc + b1_ref[:]
    value = jnp.where(value >= 0, value, value * negative_slope)
    masked = mask_rows(value, block_start + row0, cm)
    out_ref[pl.ds(row0, cm), :] = masked.astype(out_ref.dtype)


def conv_chain_flat(xflat, w0c, w0l, w0r, b0, w1c, w1l, w1r, b1,
                    h: int, w: int, tm: int = 8,
                    negative_slope: float = 0.2,
                    interpret: bool = False) -> jnp.ndarray:
  pw, tg, r_total, n_blocks, body_start = buffer_geometry(h, w, tm)
  assert xflat.shape[0] == r_total, (xflat.shape, r_total)
  e = pw + 16
  win_h = tm * pw + 4 * e
  chunk = int(os.environ.get('CONV_CHUNK', '256'))
  kernel = functools.partial(
      _chain_kernel, pw=pw, tm=tm, n_blocks=n_blocks, win_h=win_h,
      r_in=r_total, body_start=body_start, body_rows=h * pw,
      valid_pairs=1 + w // 2, negative_slope=negative_slope, chunk=chunk)
  return pl.pallas_call(
      kernel,
      grid=(n_blocks,),
      in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [
          pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
      out_specs=pl.BlockSpec((tm * pw, 128), lambda j: (j, 0)),
      out_shape=jax.ShapeDtypeStruct((r_total, 128), xflat.dtype),
      scratch_shapes=[
          pltpu.VMEM((2, win_h, 128), xflat.dtype),
          pltpu.VMEM((tm * pw + 2 * e, 128), xflat.dtype),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      interpret=interpret,
  )(xflat, w0c, w0l, w0r, b0, w1c, w1l, w1r, b1)


def main():
  interpret = os.environ.get('CONV_INTERPRET', '0') == '1'
  if interpret:
    jax.config.update('jax_platforms', 'cpu')
  print('platform:', jax.devices()[0].platform, flush=True)
  rng = np.random.RandomState(0)
  h, width = (16, 48) if interpret else (1088, 1920)
  tm = int(os.environ.get('CONV_TM', '8'))
  x = jnp.asarray(rng.rand(1, h, width, C) - 0.5, jnp.bfloat16)
  w0 = jnp.asarray((rng.rand(3, 3, C, C) - 0.5) * 0.2, jnp.bfloat16)
  b0 = jnp.asarray((rng.rand(C) - 0.5), np.float32)
  w1 = jnp.asarray((rng.rand(3, 3, C, C) - 0.5) * 0.2, jnp.bfloat16)
  b1 = jnp.asarray((rng.rand(C) - 0.5), np.float32)
  w0c, w0l, w0r = pack_weights(w0)
  w1c, w1l, w1r = pack_weights(w1)
  b02 = jnp.concatenate([b0, b0])[None, :]
  b12 = jnp.concatenate([b1, b1])[None, :]

  chain = functools.partial(conv_chain_flat, h=h, w=width, tm=tm,
                            interpret=interpret)
  xflat = to_pairflat(x, tm)
  got_flat = jax.jit(chain)(xflat, w0c, w0l, w0r, b02, w1c, w1l, w1r, b12)
  got = np.asarray(from_pairflat(got_flat, h, width, tm), np.float32)
  want = np.asarray(
      reference(reference(x, w0, b0).astype(jnp.bfloat16), w1, b1),
      np.float32)
  err = np.abs(got - want).max()
  print('fused chain max abs err vs lax.conv x2:', err, flush=True)
  assert err < 0.1, err
  if interpret:
    print('interpret parity OK')
    return

  n_chain = 4                      # 4 fused calls = 8 convs

  @jax.jit
  def loop_pallas(xflat, *ws):
    def body(_, xf):
      return chain(xf, *ws)

    yf = jax.lax.fori_loop(0, n_chain, body, xflat)
    return jnp.sum(from_pairflat(yf, h, width, tm).astype(jnp.float32))

  @jax.jit
  def loop_xla(x, w0, b0, w1, b1):
    def one(x, w, b):
      y = jax.lax.conv_general_dilated(
          x, w, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
          preferred_element_type=jnp.float32)
      y = y + b[None, None, None]
      return jnp.where(y >= 0, y, y * 0.2).astype(jnp.bfloat16)

    def body(_, x):
      return one(one(x, w0, b0), w1, b1)

    return jnp.sum(jax.lax.fori_loop(0, n_chain, body, x).astype(
        jnp.float32))

  args_pallas = (xflat, w0c, w0l, w0r, b02, w1c, w1l, w1r, b12)
  copts = os.environ.get('CONV_VMEM', '')
  lp = loop_pallas
  if copts:
    lp = loop_pallas.lower(*args_pallas).compile(
        compiler_options={'xla_tpu_scoped_vmem_limit_kib': copts})

  for name, fn, args in ((f'pallas fused x{n_chain}', lp, args_pallas),
                         ('xla', loop_xla, (x, w0, b0, w1, b1))):
    float(fn(*args))
    best = float('inf')
    for _ in range(3):
      t0 = time.perf_counter()
      v = float(fn(*args))
      best = min(best, time.perf_counter() - t0)
      assert np.isfinite(v)
    ms = best * 1e3 / (2 * n_chain)
    tflops = 2 * h * width * C * C * 9 / (ms / 1e3) / 1e12
    print(f'{name}: {ms:.3f} ms/conv  {tflops:.1f} TFLOPS', flush=True)


if __name__ == '__main__':
  main()
