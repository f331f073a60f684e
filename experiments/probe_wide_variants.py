#!/usr/bin/env python
"""Isolate the wide flat-conv kernel's cost terms (timing-only variants).

Variants (results are WRONG for all but 'full'; timing only):
  full        baseline: 9 dots, unaligned +-1 side loads, pool emitted
  nopool      full minus the pool output
  center      3 aligned center loads+dots only
  alignedside 9 dots but side loads at +-16 rows (aligned) — isolates the
              unaligned-sublane-start load cost vs 'full'
  nodots      window DMA + masked copy of xc only — the write/DMA floor
  tm16        full at tm=16 (fewer, larger blocks)
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

from frame_interpolation_tpu.ops import conv_stack_wide as csw

ITERS = int(os.environ.get('ITERS', '8'))
SHAPES = [(544, 960, 128), (136, 240, 512)]


def _kernel(xflat, w_ref, b_ref, out_ref, pool_ref, buf, sem,
            *, gw, tm, n_blocks, win_h, r_in, body_start, body_rows, w_img,
            chunk, variant):
  j = pl.program_id(0)
  slot = jax.lax.rem(j, 2)
  m = tm * gw

  def start_row(jj):
    raw = jj * m - gw - 16
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
  for s in range(-(-m // chunk)):
    row0 = s * chunk
    cm = min(chunk, m - row0)
    c = out_ref.shape[-1]
    if variant == 'nodots':
      value = buf[slot, pl.ds(16 + gw + row0, cm), :].astype(jnp.float32)
    else:
      acc = jnp.zeros((cm, c), jnp.float32)
      for ky in range(3):
        base = 16 + ky * gw + row0
        taps = ((1, 0),) if variant == 'center' else (
            (0, -16), (1, 0), (2, 16)) if variant == 'alignedside' else (
            (0, -1), (1, 0), (2, 1))
        for kx, off in taps:
          x_tap = buf[slot, pl.ds(base + off, cm), :]
          acc += jnp.dot(x_tap, w_ref[ky, kx],
                         preferred_element_type=jnp.float32)
      value = acc + b_ref[:]
    value = jnp.where(value >= 0, value, value * 0.2)
    r = (block_start + row0 +
         jax.lax.broadcasted_iota(jnp.int32, (cm, c), 0))
    q = r - body_start
    col = jax.lax.rem(q, gw)
    ok = ((q >= 0) & (q < body_rows) & (col >= 2) & (col < 2 + w_img))
    masked = jnp.where(ok, value, 0.0)
    out_ref[pl.ds(row0, cm), :] = masked.astype(out_ref.dtype)
    if pool_ref is not None:
      ysum = (masked[:gw] + masked[gw:]) * 0.25
      pool_ref[pl.ds(row0 // 2, gw), :] = ysum.astype(pool_ref.dtype)


def run_variant(g, xflat, w, b, variant):
  emit_pool = variant not in ('nopool',)
  win_h = (g.tm + 2) * g.gw + 32
  chunk = 2 * g.gw
  m = g.tm * g.gw
  kern = functools.partial(
      _kernel, gw=g.gw, tm=g.tm, n_blocks=g.n_blocks, win_h=win_h,
      r_in=g.r_total, body_start=g.body_start, body_rows=g.h * g.gw,
      w_img=g.w, chunk=chunk, variant=variant)
  out_specs = [pl.BlockSpec((m, g.c), lambda j: (j, 0))]
  out_shape = [jax.ShapeDtypeStruct((g.r_total, g.c), xflat.dtype)]
  if emit_pool:
    out_specs.append(pl.BlockSpec((m // 2, g.c), lambda j: (j, 0)))
    out_shape.append(jax.ShapeDtypeStruct((g.r_total // 2, g.c),
                                          xflat.dtype))
    body = kern
  else:
    def body(xflat, w_ref, b_ref, out_ref, buf, sem):
      kern(xflat, w_ref, b_ref, out_ref, None, buf, sem)

  call = pl.pallas_call(
      body, grid=(g.n_blocks,),
      in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [
          pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
      out_specs=tuple(out_specs), out_shape=tuple(out_shape),
      scratch_shapes=[pltpu.VMEM((2, win_h, g.c), xflat.dtype),
                      pltpu.SemaphoreType.DMA((2,))],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024))

  @jax.jit
  def loop(xf, w, b):
    def step(_, t):
      outs = call(t, w, b)
      return outs[0] if isinstance(outs, (tuple, list)) else outs
    return jax.lax.fori_loop(0, ITERS, step, xf)

  loop(xflat, w, b)
  best = float('inf')
  for _ in range(3):
    t0 = time.perf_counter()
    v = float(jnp.sum(loop(xflat, w, b).astype(jnp.float32)[:8, :8]))
    assert v == v
    best = min(best, time.perf_counter() - t0)
  return best / ITERS


def main():
  print('platform:', jax.devices()[0].platform, flush=True)
  for h, w, c in SHAPES:
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(h, w, c) - 0.5, jnp.bfloat16)
    k = jnp.asarray((rng.rand(3, 3, c, c) - 0.5) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.rand(1, c) - 0.5, jnp.float32)
    for tm, variants in ((8, ['full', 'nopool', 'center', 'alignedside',
                              'nodots']), (16, ['full'])):
      g = csw.flat_geometry(h, w, c, tm=tm)
      tall = csw.pad_image_tall_flat(x, g)
      xflat = jax.device_put(
          csw.mask_tall_flat(tall, g).reshape(g.r_total, c))
      for variant in variants:
        t = run_variant(g, xflat, k, b, variant)
        print(f'{h}x{w}x{c} tm={tm} {variant:12s} {t*1e3:7.2f} ms',
              flush=True)


if __name__ == '__main__':
  main()
