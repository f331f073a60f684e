#!/usr/bin/env python
"""HBM bandwidth sanity: XLA elementwise copy vs Pallas block write.

The pair-flat conv probes imply its output-block writes run at ~85 GB/s.
This probe measures (a) XLA's own read+write rate on a big elementwise op
and (b) a minimal Pallas kernel whose only job is writing blocks from
VMEM, to tell hardware limits from kernel pathology.
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

R, L = 1_048_576, 128   # 256 MB bf16


def timed(fn, *args, iters=8):
  float(fn(*args))
  best = float('inf')
  for _ in range(3):
    t0 = time.perf_counter()
    v = float(fn(*args))
    best = min(best, time.perf_counter() - t0)
    assert np.isfinite(v)
  return best / iters


def main():
  print('platform:', jax.devices()[0].platform, flush=True)
  x = jnp.asarray(np.random.RandomState(0).rand(R, L), jnp.bfloat16)
  nbytes = R * L * 2

  @jax.jit
  def xla_copy(x):
    def body(_, x):
      return x + jnp.bfloat16(1.0)
    return jnp.sum(jax.lax.fori_loop(0, 8, body, x).astype(jnp.float32))

  t = timed(xla_copy, x)
  print(f'xla add1 (read+write {2 * nbytes / 1e6:.0f} MB): '
        f'{t * 1e3:.2f} ms -> {2 * nbytes / t / 1e9:.0f} GB/s', flush=True)

  def write_kernel(out_ref, buf):
    out_ref[...] = buf[...]

  for bm in (512, 3904, 15616):
    n_blocks = R // bm

    def one(x, bm=bm, n_blocks=n_blocks):
      return pl.pallas_call(
          functools.partial(write_kernel),
          grid=(n_blocks,),
          in_specs=[],
          out_specs=pl.BlockSpec((bm, L), lambda j: (j, 0)),
          out_shape=jax.ShapeDtypeStruct((n_blocks * bm, L), jnp.bfloat16),
          scratch_shapes=[pltpu.VMEM((bm, L), jnp.bfloat16)],
      )()

    @jax.jit
    def wloop(x, one=one):
      def body(_, acc):
        y = one(x)
        return acc + y[0, 0].astype(jnp.float32)
      return jax.lax.fori_loop(0, 8, body, jnp.float32(0))

    t = timed(wloop, x)
    print(f'pallas block-write bm={bm} ({nbytes / 1e6:.0f} MB out): '
          f'{t * 1e3:.2f} ms -> {nbytes / t / 1e9:.0f} GB/s', flush=True)


if __name__ == '__main__':
  if os.environ.get('BW_EXTRA') != '1':
    main()


def extra():
  """f32 + pure-DMA variants: pin down the device's real streaming rate."""
  print('platform:', jax.devices()[0].platform, flush=True)
  xf = jnp.asarray(np.random.RandomState(0).rand(R // 2, L), jnp.float32)
  nbytes = R // 2 * L * 4

  @jax.jit
  def xla_copy_f32(x):
    def body(_, x):
      return x + jnp.float32(1.0)
    return jnp.sum(jax.lax.fori_loop(0, 8, body, x)[::4096, 0])

  t = timed(xla_copy_f32, xf)
  print(f'xla add1 f32 (rw {2 * nbytes / 1e6:.0f} MB): {t * 1e3:.2f} ms '
        f'-> {2 * nbytes / t / 1e9:.0f} GB/s', flush=True)

  def dma_kernel(src, out_ref, buf, sem_in, sem_out, *, n_blocks, bm):
    j = pl.program_id(0)
    read = pltpu.make_async_copy(src.at[pl.ds(j * bm, bm)], buf, sem_in)
    read.start()
    read.wait()  # waiting an unstarted DMA hard-crashes the TPU worker
    cp = pltpu.make_async_copy(buf, out_ref.at[pl.ds(j * bm, bm)], sem_out)
    cp.start()
    cp.wait()

  bm = 8192
  n_blocks = (R // 2) // bm

  def one(x):
    return pl.pallas_call(
        functools.partial(dma_kernel, n_blocks=n_blocks, bm=bm),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((R // 2, L), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, L), jnp.float32),
                        pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
    )(x)

  @jax.jit
  def dloop(x):
    def body(_, acc):
      y = one(x)
      return acc + y[0, 0]
    return jax.lax.fori_loop(0, 8, body, jnp.float32(0))

  t = timed(dloop, xf)
  print(f'pallas DMA rw ({2 * nbytes / 1e6:.0f} MB): {t * 1e3:.2f} ms '
        f'-> {2 * nbytes / t / 1e9:.0f} GB/s', flush=True)


if os.environ.get('BW_EXTRA') == '1':
  extra()
