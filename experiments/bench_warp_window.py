#!/usr/bin/env python
"""Benchmarks the window-DMA warp kernel vs the XLA 2-slice gather on TPU.

Level-0 scale (1088 x 1920 x 67), bf16 image, f32 flow. Flows:
  * smooth: large sinusoidal field (+-30 px) — the realistic case;
  * boundary: smooth field with a hard moving-object edge (displacement
    jumps 40 px across a diagonal seam) — exercises multi-window tiles;
  * random: +-30 px white noise — adversarial worst case.
Timing uses the bench.py recipe: N chained iterations inside one jit,
fetch one scalar, min over trials.
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from frame_interpolation_tpu.ops import warp, warp_window

H = int(os.environ.get('WARP_BENCH_H', '1088'))
W = int(os.environ.get('WARP_BENCH_W', '1920'))
# C=67 is the level-0 warp plane (RGB + 64 features); C>=128 exercises the
# tall-window cb=144 channel-block configuration (ADVICE round 3 #2).
C = int(os.environ.get('WARP_BENCH_C', '67'))
ITERS = 8
TRIALS = 3


def make_flows():
  yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing='ij')
  # 'slow': realistic trained-network statistics — large motion, near
  # constant within any (8, 128) tile (a few px of variation per tile).
  slow = np.stack([30 * np.sin(yy / 397.0) * np.cos(xx / 531.0),
                   30 * np.cos(yy / 453.0) * np.sin(xx / 489.0)],
                  axis=-1).astype(np.float32)
  # 'smooth': adversarially wiggly — ~25 px of x-displacement spread per
  # 128-lane tile, defeating single-window recentering.
  smooth = np.stack([30 * np.sin(yy / 97.0) * np.cos(xx / 131.0),
                     30 * np.cos(yy / 113.0) * np.sin(xx / 89.0)],
                    axis=-1).astype(np.float32)
  boundary = slow.copy()
  seam = (yy + 2 * xx) % 613 < 240
  boundary[seam] += np.array([40.0, -37.0], np.float32)
  rng = np.random.RandomState(0)
  random = ((rng.rand(H, W, 2) - 0.5) * 60).astype(np.float32)
  return {'slow': slow, 'smooth': smooth, 'boundary': boundary,
          'random': random}


def bench(fn, image, flow):
  @jax.jit
  def loop(image, flow):
    def body(_, carry):
      out = fn(carry, flow)
      return out  # chained: next warp consumes previous output
    out = jax.lax.fori_loop(0, ITERS, body, image)
    return jnp.mean(out.astype(jnp.float32))

  float(loop(image, flow))  # compile + run once
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
    # correctness first (on-device, small fetch of the max-abs-diff)
    want = warp.backward_warp(image, flow)
    got = warp_window.backward_warp_window(image, flow)
    diff = float(jnp.max(jnp.abs(want.astype(jnp.float32) -
                                 got.astype(jnp.float32))))
    ms_xla = bench(warp.backward_warp, image, flow)
    ms_win = bench(warp_window.backward_warp_window, image, flow)
    print(f'{name}: maxdiff={diff:.6f} xla={ms_xla:.1f}ms '
          f'window={ms_win:.1f}ms speedup={ms_xla / ms_win:.2f}x', flush=True)


if __name__ == '__main__':
  main()
