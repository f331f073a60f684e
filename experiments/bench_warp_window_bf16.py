#!/usr/bin/env python
"""Benchmarks the bf16-window kernel variant vs the production f32-window
kernel (ops/warp_window.py). Same flows/recipe as bench_warp_window.py."""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from frame_interpolation_tpu.ops import warp, warp_window
import warp_window_bf16 as ww16

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

H, W, C = 1088, 1920, 67
ITERS = 8
TRIALS = 3


def make_flows():
  yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing='ij')
  slow = np.stack([30 * np.sin(yy / 397.0) * np.cos(xx / 531.0),
                   30 * np.cos(yy / 453.0) * np.sin(xx / 489.0)],
                  axis=-1).astype(np.float32)
  smooth = np.stack([30 * np.sin(yy / 97.0) * np.cos(xx / 131.0),
                     30 * np.cos(yy / 113.0) * np.sin(xx / 89.0)],
                    axis=-1).astype(np.float32)
  boundary = slow.copy()
  seam = (yy + 2 * xx) % 613 < 240
  boundary[seam] += np.array([40.0, -37.0], np.float32)
  return {'slow': slow, 'smooth': smooth, 'boundary': boundary}


def bench(fn, image, flow):
  @jax.jit
  def loop(image, flow):
    def body(_, carry):
      return fn(carry, flow)
    out = jax.lax.fori_loop(0, ITERS, body, image)
    return jnp.mean(out.astype(jnp.float32))

  float(loop(image, flow))
  best = float('inf')
  for _ in range(TRIALS):
    t0 = time.perf_counter()
    v = float(loop(image, flow))
    best = min(best, time.perf_counter() - t0)
    assert np.isfinite(v)
  return best / ITERS * 1000.0


def main():
  print('platform:', jax.devices()[0].platform, flush=True)
  rng = np.random.RandomState(1)
  image = jnp.asarray(rng.rand(1, H, W, C).astype(np.float32),
                      dtype=jnp.bfloat16)
  for name, flow_np in make_flows().items():
    flow = jnp.asarray(flow_np[None])
    want = warp.backward_warp(image, flow)
    got = ww16.backward_warp_window_bf16(image, flow)
    diff = float(jnp.max(jnp.abs(want.astype(jnp.float32) -
                                 got.astype(jnp.float32))))
    ms_f32win = bench(warp_window.backward_warp_window, image, flow)
    ms_bf16win = bench(ww16.backward_warp_window_bf16, image, flow)
    print(f'{name}: maxdiff={diff:.6f} f32win={ms_f32win:.1f}ms '
          f'bf16win={ms_bf16win:.1f}ms '
          f'speedup={ms_f32win / ms_bf16win:.2f}x', flush=True)


if __name__ == '__main__':
  main()
