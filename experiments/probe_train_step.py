#!/usr/bin/env python
"""Times train-step pieces on TPU: forward, grad, warp-grad in isolation.

The first BENCH_MODE=train run measured 0.046 steps/sec (22 s/step) at
batch 8, 256x256 — ~150x off the FLOPs estimate. Hypothesis: the warp
VJP's image-gradient term is a per-pixel scatter-add, which XLA TPU
serializes.
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from frame_interpolation_tpu.models.film_net import FilmNet, init_params
from frame_interpolation_tpu.ops import warp
from frame_interpolation_tpu.options import Options

B, H, W, C = 8, 256, 256, 64


def timed(fn, *args):
  fn(*args)  # compile
  best = float('inf')
  for _ in range(3):
    t0 = time.perf_counter()
    v = fn(*args)
    float(jnp.sum(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(b.astype(jnp.float32)), v,
        jnp.zeros((), jnp.float32))) if isinstance(v, (dict, tuple, list))
        else jnp.sum(v).astype(jnp.float32))
    best = min(best, time.perf_counter() - t0)
  return best


def main():
  rng = np.random.RandomState(0)
  img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32), jnp.bfloat16)
  flow = jnp.asarray((rng.rand(B, H, W, 2) - 0.5) * 30, jnp.float32)

  @jax.jit
  def warp_fwd(img, flow):
    return jnp.sum(warp.backward_warp(img, flow).astype(jnp.float32))

  @jax.jit
  def warp_grad(img, flow):
    return jax.grad(lambda i, f: jnp.sum(
        warp.backward_warp(i, f).astype(jnp.float32)), argnums=(0, 1))(
            img, flow)

  print(f'warp fwd  (B{B} {H}x{W}x{C}): {timed(warp_fwd, img, flow)*1e3:.1f} ms',
        flush=True)
  print(f'warp grad (B{B} {H}x{W}x{C}): {timed(warp_grad, img, flow)*1e3:.1f} ms',
        flush=True)

  options = Options.film_net_released(dtype_policy='bfloat16',
                                      use_aux_outputs=False,
                                      warp_impl='gather')
  model = FilmNet(options)
  params = init_params(model, jax.random.PRNGKey(0))
  x0 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
  x1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
  y = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
  tv = jnp.full((B, 1), 0.5, jnp.float32)

  @jax.jit
  def fwd(params):
    out = model.apply({'params': params}, x0, x1, tv)
    return jnp.mean(jnp.abs(out['image'] - y).astype(jnp.float32))

  @jax.jit
  def grad(params):
    return jax.grad(fwd)(params)

  print(f'model fwd  (B{B} {H}x{W}): {timed(fwd, params)*1e3:.1f} ms',
        flush=True)
  print(f'model grad (B{B} {H}x{W}): {timed(grad, params)*1e3:.1f} ms',
        flush=True)


if __name__ == '__main__':
  main()
