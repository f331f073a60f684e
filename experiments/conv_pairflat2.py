#!/usr/bin/env python
"""Pair-flat conv v2: traffic-minimal (no halo concat, low-overlap windows).

v1 (conv_pairflat.py) proved the layout (1.9x over XLA) but measured
DMA-bound: the CONV_PROBE=copy variant — zero compute — ran in 6.57 of
the full kernel's 7.29 ms (250 GB/s effective on 1.64 GB of traffic per
conv: 3x-overlap windows 817 MB + output 272 MB + XLA halo concat
556 MB). v2 eliminates the avoidable traffic:

  * FULL-PADDED OUTPUT: the kernel writes the complete guarded flat
    buffer (guards + halo rows masked to zero in-kernel), so convs chain
    with NO XLA concat pass. Key identity: output flat row r takes tap
    (ky, dx) from input flat row r + (ky-1)*pw + dx — independent of the
    (row, pair) decomposition — so any block size uses the same 9
    contiguous lhs slices, and guard/halo rows are just masked lanes.
  * TM-row blocks: window overlap is (tm+2)/tm (1.25x at tm=8 vs 3x at
    tm=1), and per-step DMAs grow to ~2.5 MB (better DMA efficiency).

Geometry. TG = pw + 16 top guard rows (so every real output row's
shallowest tap, r - pw - 1, stays in-buffer); buffer rows:
[TG zeros][halo row pw][body h*pw][halo row pw][>=16 zeros], rounded up
to a multiple of tm*pw (trailing rows zero-masked). The window for block
j covers input rows [j*tm*pw - pw - 16, + (tm+2)*pw + 32), clamped into
the buffer; clamping only distorts rows whose outputs are masked anyway.
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

C = 64


def _round_up(x, m):
  return -(-x // m) * m


def pair_width(w: int) -> int:
  return _round_up(w + 4, 32) // 2


def buffer_geometry(h: int, w: int, tm: int):
  """Returns (pw, tg, r_total, n_blocks, body_start).

  Top guard = one full block (tm*pw rows) and one extra all-guard block at
  the bottom: every block that contains a real output row then has an
  EXACT, unclamped window with STATIC in-window tap offsets (16 + ky*pw +
  dx); the two edge blocks are clamped but fully masked to zero.
  """
  pw = pair_width(w)
  tg = tm * pw
  body_start = tg + pw          # first real output row (after top halo row)
  m = tm * pw
  n_blocks = -(-(body_start + h * pw) // m) + 1
  return pw, tg, n_blocks * m, n_blocks, body_start


def to_pairflat(x: jnp.ndarray, tm: int) -> jnp.ndarray:
  """(1, H, W, 64) -> (r_total, 128) guarded flat pair layout."""
  _, h, w, c = x.shape
  assert c == C and w % 2 == 0
  pw, tg, r_total, _, _ = buffer_geometry(h, w, tm)
  xp = jnp.pad(x[0], ((1, 1), (2, 2 * pw - 2 - w), (0, 0)))
  flat = xp.reshape((h + 2) * pw, 2 * C)
  return jnp.pad(flat, ((tg, r_total - tg - (h + 2) * pw), (0, 0)))


def from_pairflat(y: jnp.ndarray, h: int, w: int, tm: int) -> jnp.ndarray:
  pw, tg, _, _, _ = buffer_geometry(h, w, tm)
  body = y[tg:tg + (h + 2) * pw].reshape(h + 2, pw * 2, C)
  return body[1:h + 1, 2:2 + w][None]


def _conv_kernel(xflat, wc_ref, wl_ref, wr_ref, b_ref, out_ref, buf, sem,
                 *, pw: int, tm: int, n_blocks: int, win_h: int,
                 r_in: int, body_start: int, body_rows: int,
                 valid_pairs: int, negative_slope: float):
  j = pl.program_id(0)
  slot = jax.lax.rem(j, 2)
  m = tm * pw

  def start_row(jj):
    # Window covers [block_start - pw - 16, + win_h). Exact for every
    # block with real output rows (j in [1, n_blocks-1) by construction);
    # the clamp only engages on the first/last blocks, which are fully
    # masked to zero.
    raw = jj * m - pw - 16
    return jnp.clip(raw, 0, r_in - win_h)

  def window_dma(jj, slot_index):
    return pltpu.make_async_copy(
        xflat.at[pl.ds(pl.multiple_of(start_row(jj), 16), win_h)],
        buf.at[slot_index], sem.at[slot_index])

  if os.environ.get('CONV_PROBE', 'full') != 'noread':
    @pl.when(j == 0)
    def _():
      window_dma(0, 0).start()

    @pl.when(j + 1 < n_blocks)
    def _():
      window_dma(j + 1, 1 - slot).start()

  probe = os.environ.get('CONV_PROBE', 'full')
  if probe != 'noread':
    window_dma(j, slot).wait()

  block_start = j * m
  # For every unclamped block, window-relative tap offsets are STATIC:
  # out row r reads input row r + (ky-1)*pw + dx, and the window starts
  # at block_start - pw - 16, so the slice start is 16 + ky*pw + dx.
  #
  # CONV_CHUNK > 0 processes the block in register-sized sub-chunks: a
  # full (m, 128) f32 accumulator is ~m/8 vregs (hundreds), so the 9
  # chained dots spill/fill it through VMEM between matmuls; chunks of
  # <= 256 rows keep the accumulator resident.
  chunk = int(os.environ.get('CONV_CHUNK', '0')) or m
  probe = os.environ.get('CONV_PROBE', 'full')
  n_sub = -(-m // chunk)
  for s in range(n_sub):
    row0 = s * chunk
    cm = min(chunk, m - row0)
    acc = jnp.zeros((cm, 128), jnp.float32)
    for ky in range(3):
      for dx, w_ref in ((0, wc_ref), (-1, wl_ref), (1, wr_ref)):
        lhs = buf[slot, pl.ds(16 + ky * pw + dx + row0, cm), :]
        acc += jnp.dot(lhs, w_ref[ky], preferred_element_type=jnp.float32)
    value = acc + b_ref[:]
    value = jnp.where(value >= 0, value, value * negative_slope)

    # Zero guards, halo rows, and halo pairs: flat row r is a real output
    # iff body_start <= r < body_start + body_rows AND its pair index
    # (r - body_start) % pw is in [1, valid_pairs).
    r = (block_start + row0 +
         jax.lax.broadcasted_iota(jnp.int32, (cm, 128), 0))
    q = r - body_start
    pair = jax.lax.rem(q, pw)
    ok = ((q >= 0) & (q < body_rows) & (pair >= 1) & (pair < valid_pairs))
    masked = jnp.where(ok, value, 0.0).astype(out_ref.dtype)
    if probe == 'nowrite':
      if s == 0:
        out_ref[...] = masked[:8]  # tiny output: isolates write cost
    else:
      out_ref[pl.ds(row0, cm), :] = masked


def pack_weights(w: jnp.ndarray):
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


def conv3x3_flat(xflat, wc, wl, wr, b2, h: int, w: int, tm: int = 8,
                 negative_slope: float = 0.2,
                 interpret: bool = False) -> jnp.ndarray:
  """One conv: guarded flat buffer -> guarded flat buffer. No XLA passes."""
  pw, tg, r_total, n_blocks, body_start = buffer_geometry(h, w, tm)
  assert xflat.shape[0] == r_total, (xflat.shape, r_total)
  win_h = (tm + 2) * pw + 32
  kernel = functools.partial(
      _conv_kernel, pw=pw, tm=tm, n_blocks=n_blocks, win_h=win_h,
      r_in=r_total, body_start=body_start, body_rows=h * pw,
      valid_pairs=1 + w // 2, negative_slope=negative_slope)
  return pl.pallas_call(
      kernel,
      grid=(n_blocks,),
      in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)],
      out_specs=(pl.BlockSpec((8, 128), lambda j: (j, 0))
                 if os.environ.get('CONV_PROBE', 'full') == 'nowrite' else
                 pl.BlockSpec((tm * pw, 128), lambda j: (j, 0))),
      out_shape=(jax.ShapeDtypeStruct((n_blocks * 8, 128), xflat.dtype)
                 if os.environ.get('CONV_PROBE', 'full') == 'nowrite' else
                 jax.ShapeDtypeStruct((r_total, 128), xflat.dtype)),
      scratch_shapes=[
          pltpu.VMEM((2, win_h, 128), xflat.dtype),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      interpret=interpret,
  )(xflat, wc, wl, wr, b2)


def reference(x, w, b, negative_slope=0.2):
  y = jax.lax.conv_general_dilated(
      x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), 'SAME',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  y = y + b[None, None, None]
  return jnp.where(y >= 0, y, y * negative_slope)


def bench_only(x, wc, wl, wr, b2, w, b, h, width, tm):
  n_chain = 8
  probe = os.environ.get('CONV_PROBE', 'full')
  if probe == 'nowrite':
    @jax.jit
    def loop_pallas(x, wc, wl, wr, b2):
      xf = to_pairflat(x, tm)

      def body(_, acc):
        y = conv3x3_flat(xf, wc, wl, wr, b2, h, width, tm)
        return acc + jnp.sum(y.astype(jnp.float32))

      return jax.lax.fori_loop(0, n_chain, body, jnp.float32(0))
  else:
    @jax.jit
    def loop_pallas(x, wc, wl, wr, b2):
      xf = to_pairflat(x, tm)

      def body(_, xf):
        return conv3x3_flat(xf, wc, wl, wr, b2, h, width, tm)

      yf = jax.lax.fori_loop(0, n_chain, body, xf)
      return jnp.sum(from_pairflat(yf, h, width, tm).astype(jnp.float32))

  float(loop_pallas(x, wc, wl, wr, b2))
  best = float('inf')
  for _ in range(3):
    t0 = time.perf_counter()
    v = float(loop_pallas(x, wc, wl, wr, b2))
    best = min(best, time.perf_counter() - t0)
    assert np.isfinite(v)
  ms = best * 1e3 / n_chain
  print(f'pallas[{probe}]: {ms:.3f} ms/conv', flush=True)


def main():
  interpret = os.environ.get('CONV_INTERPRET', '0') == '1'
  if interpret:
    jax.config.update('jax_platforms', 'cpu')
  print('platform:', jax.devices()[0].platform, flush=True)
  rng = np.random.RandomState(0)
  h, width = (16, 48) if interpret else (1088, 1920)
  tm = int(os.environ.get('CONV_TM', '8'))
  x = jnp.asarray(rng.rand(1, h, width, C) - 0.5, jnp.bfloat16)
  w = jnp.asarray((rng.rand(3, 3, C, C) - 0.5) * 0.2, jnp.bfloat16)
  b = jnp.asarray((rng.rand(C) - 0.5), np.float32)
  wc, wl, wr = pack_weights(w)
  b2 = jnp.concatenate([b, b])[None, :]

  xflat = to_pairflat(x, tm)
  if os.environ.get('CONV_PROBE', 'full') != 'full' and not interpret:
    bench_only(x, wc, wl, wr, b2, w, b, h, width, tm)
    return
  conv_jit = jax.jit(functools.partial(conv3x3_flat, h=h, w=width, tm=tm,
                                       interpret=interpret))
  copts0 = os.environ.get('CONV_VMEM', '')
  if copts0 and not interpret:
    conv_jit = conv_jit.lower(xflat, wc, wl, wr, b2).compile(
        compiler_options={'xla_tpu_scoped_vmem_limit_kib': copts0})
  got_flat = conv_jit(xflat, wc, wl, wr, b2)
  got = np.asarray(from_pairflat(got_flat, h, width, tm), np.float32)
  want = np.asarray(reference(x, w, b), np.float32)
  err = np.abs(got - want).max()
  print('max abs err vs lax.conv:', err, flush=True)
  if os.environ.get('CONV_PROBE', 'full') == 'full':
    assert err < 0.05, err

  got2_flat = conv_jit(got_flat, wc, wl, wr, b2)
  got2 = np.asarray(from_pairflat(got2_flat, h, width, tm), np.float32)
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

  probe = os.environ.get('CONV_PROBE', 'full')
  if probe == 'nowrite':
    @jax.jit
    def loop_pallas(x, wc, wl, wr, b2):
      xf = to_pairflat(x, tm)

      def body(_, acc):
        y = conv3x3_flat(xf, wc, wl, wr, b2, h, width, tm)
        return acc + jnp.sum(y.astype(jnp.float32))

      return jax.lax.fori_loop(0, n_chain, body, jnp.float32(0))
  else:
    @jax.jit
    def loop_pallas(x, wc, wl, wr, b2):
      xf = to_pairflat(x, tm)

      def body(_, xf):
        return conv3x3_flat(xf, wc, wl, wr, b2, h, width, tm)

      yf = jax.lax.fori_loop(0, n_chain, body, xf)
      return jnp.sum(from_pairflat(yf, h, width, tm).astype(jnp.float32))

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

  copts = os.environ.get('CONV_VMEM', '')
  if copts:
    options = {'xla_tpu_scoped_vmem_limit_kib': copts}
    loop_pallas = loop_pallas.lower(x, wc, wl, wr, b2).compile(
        compiler_options=options)

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
