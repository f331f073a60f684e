#!/usr/bin/env python
"""Is XLA's T(2,128) feature-minor conv layout 2x-inflated at C=64?

If the minor (channel) dim pads 64 -> 128 lanes, a 64-ch conv moves the
same HBM bytes as a 128-ch conv at the same H x W, and C=64 tensors cost
2x their logical bytes everywhere. Compare:
  convA: 1088x1920x64 -> 64   (logical i/o 534 MB)
  convB: 1088x 960x128 -> 128 (same logical i/o, lane-exact layout)
  convC: 1088x1920x128 -> 128 (2x logical bytes of convA)
If inflation is real: tA ~= tC (same stored bytes), tB ~= tA/2.
If not: tA ~= tB, tC ~= 2 tA.
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, h, w, c, n_chain=8):
  rng = np.random.RandomState(0)
  x = jnp.asarray(rng.rand(1, h, w, c) - 0.5, jnp.bfloat16)
  wt = jnp.asarray((rng.rand(3, 3, c, c) - 0.5) * 0.2, jnp.bfloat16)
  b = jnp.asarray(rng.rand(c) - 0.5, jnp.float32)

  @jax.jit
  def loop(x, wt, b):
    def body(_, x):
      y = jax.lax.conv_general_dilated(
          x, wt, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
          preferred_element_type=jnp.float32)
      y = y + b[None, None, None]
      return jnp.where(y >= 0, y, y * 0.2).astype(jnp.bfloat16)

    return jnp.sum(jax.lax.fori_loop(0, n_chain, body, x).astype(
        jnp.float32))

  float(loop(x, wt, b))
  best = float('inf')
  for _ in range(3):
    t0 = time.perf_counter()
    v = float(loop(x, wt, b))
    best = min(best, time.perf_counter() - t0)
    assert np.isfinite(v)
  ms = best * 1e3 / n_chain
  logical = 2 * h * w * c * 2 / 1e6
  print(f'{name}: {ms:6.2f} ms/conv  (logical i/o {logical:.0f} MB '
        f'-> {logical / ms:.0f} GB/s-equivalent)', flush=True)


def main():
  print('platform:', jax.devices()[0].platform, flush=True)
  bench('A 1088x1920x 64', 1088, 1920, 64)
  bench('B 1088x 960x128', 1088, 960, 128)
  bench('C 1088x1920x128', 1088, 1920, 128)
  bench('D 1088x1920x 32', 1088, 1920, 32)


if __name__ == '__main__':
  main()
