#!/usr/bin/env python
"""Benchmarks splat-kernel variants at the train-regime warp shape."""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from frame_interpolation_tpu.ops import warp_splat
import warp_splat_v2

B, H, W, C = 8, 256, 256, 64
ITERS = 8
TRIALS = 3


def bench(fn, g, flow):
  @jax.jit
  def loop(g, flow):
    def body(_, carry):
      return fn(carry, flow)
    out = jax.lax.fori_loop(0, ITERS, body, g)
    return jnp.mean(out)

  float(loop(g, flow))
  best = float('inf')
  for _ in range(TRIALS):
    t0 = time.perf_counter()
    v = float(loop(g, flow))
    best = min(best, time.perf_counter() - t0)
    assert np.isfinite(v)
  return best / ITERS * 1000.0


def main():
  rng = np.random.RandomState(1)
  g = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
  yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing='ij')
  smooth = np.stack([20 * np.sin(yy / 97.0) * np.cos(xx / 131.0),
                     20 * np.cos(yy / 113.0) * np.sin(xx / 89.0)],
                    axis=-1).astype(np.float32)
  flow = jnp.asarray(np.broadcast_to(smooth[None], (B, H, W, 2)).copy())

  want = warp_splat.backward_warp_splat(g, flow)
  got = warp_splat_v2.backward_warp_splat_v2(g, flow)
  diff = float(jnp.max(jnp.abs(want - got)))
  ms_v1 = bench(warp_splat.backward_warp_splat, g, flow)
  ms_v2 = bench(warp_splat_v2.backward_warp_splat_v2, g, flow)
  print(f'maxdiff={diff:.2e} v1={ms_v1:.1f}ms v2={ms_v2:.1f}ms '
        f'speedup={ms_v1 / ms_v2:.2f}x', flush=True)


if __name__ == '__main__':
  main()
