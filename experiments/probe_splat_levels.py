#!/usr/bin/env python
"""Per-pyramid-level cost of the warp VJP at the train regime (bs8, 256px).

The round-2 train trace attributes 298 of 558 ms/step to splat kernels,
summed across every warp site. This probe breaks that down by level shape
(flow-estimator features L0-L5 and fusion concats L0-L4, x2 directions
each) and separately times the image cotangent (the window-splat kernel)
and the flow cotangent (XLA gathers), to find which levels to attack.

Hypothesis being tested: the window-splat's (8, 128)-tile planar geometry
overfetches wildly at coarse levels (e.g. 32x32x960 pads to 128 lanes and
carries a 40-row guard band on an f32 RMW accumulator), so most of the
298 ms is COARSE levels where a dense one-hot matmul splat (MXU) would be
far cheaper.
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from frame_interpolation_tpu.ops import warp, warp_splat

B = 8
ITERS = 8
TRIALS = 3

# (tag, spatial, channels) for every warp site at 256px crops, released
# config: flow-estimator refinement warps features_b[i] (cascaded channels)
# and the fusion path warps [image; features] per fusion level.
SITES = [
    ('flow L0', 256, 64), ('flow L1', 128, 192), ('flow L2', 64, 448),
    ('flow L3', 32, 960), ('flow L4', 16, 960), ('flow L5', 8, 960),
    ('fuse L0', 256, 67), ('fuse L1', 128, 195), ('fuse L2', 64, 451),
    ('fuse L3', 32, 963), ('fuse L4', 16, 963),
]


def bench(fn, img, flow, *rest):
  # The loop body must DEPEND on the carry or XLA hoists the whole
  # loop-invariant computation out of the fori_loop (measured: every
  # shape floored at ~3 ms = one exec / ITERS). Every probed function
  # depends on `flow`, so perturb it by a carry-dependent epsilon.
  @jax.jit
  def loop(img, flow, *rest):
    def body(_, carry):
      s, f = carry
      out = fn(img, f, *rest).astype(jnp.float32)
      s = s + out[(0,) * out.ndim]
      return s, flow + s * 1e-20
    s, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0), flow))
    return s

  float(loop(img, flow, *rest))
  best = float('inf')
  for _ in range(TRIALS):
    t0 = time.perf_counter()
    v = float(loop(img, flow, *rest))
    best = min(best, time.perf_counter() - t0)
    assert np.isfinite(v)
  return best / ITERS * 1000.0


def main():
  print('platform:', jax.devices()[0].platform, flush=True)
  rng = np.random.RandomState(0)
  tot_img = tot_flow = tot_fwd = 0.0
  for tag, hw, c in SITES:
    img = jnp.asarray(rng.rand(B, hw, hw, c), jnp.bfloat16)
    g = jnp.asarray(rng.rand(B, hw, hw, c), jnp.bfloat16)
    scale = max(hw / 12.0, 2.0)
    yy, xx = np.meshgrid(np.arange(hw), np.arange(hw), indexing='ij')
    fl = np.stack([scale * np.sin(yy / 29.0) * np.cos(xx / 37.0),
                   scale * np.cos(yy / 31.0) * np.sin(xx / 23.0)],
                  axis=-1).astype(np.float32)
    flow = jnp.asarray(np.broadcast_to(fl[None], (B, hw, hw, 2)).copy())

    def img_grad(img, flow, g):
      _, vjp = jax.vjp(lambda x: warp.backward_warp(x, flow), img)
      return vjp(g)[0]

    def flow_grad(img, flow, g):
      _, vjp = jax.vjp(lambda f: warp.backward_warp(img, f), flow)
      return vjp(g)[0]

    def rmw_splat(img, flow, g):
      del img
      return warp_splat.backward_warp_splat(g, flow)

    ms_fwd = bench(lambda i, f: warp.backward_warp(i, f), img, flow)
    ms_img = bench(img_grad, img, flow, g)
    ms_flow = bench(flow_grad, img, flow, g)
    ms_rmw = bench(rmw_splat, img, flow, g)
    # x2 directions per site
    tot_img += 2 * ms_img
    tot_flow += 2 * ms_flow
    tot_fwd += 2 * ms_fwd
    print(f'{tag:8s} {hw:4d}x{hw:<4d} c={c:<4d} fwd={ms_fwd:7.2f}  '
          f'img-cot={ms_img:7.2f}  rmw-splat={ms_rmw:7.2f}  '
          f'flow-cot={ms_flow:7.2f} ms', flush=True)
  print(f'TOTALS (x2 dirs): fwd={tot_fwd:.1f}  img-cot={tot_img:.1f}  '
        f'flow-cot={tot_flow:.1f} ms', flush=True)


if __name__ == '__main__':
  main()
