#!/usr/bin/env python
"""Phase timing for the T=5 video driver: H2D, compute, D2H, overlap.

The round-2 video bench (1.71 fps) trails the in-jit pair rate (2.44):
PERF.md attributes the residual to shallow-depth small batches plus the
uint8 fetch outlasting its overlap window. This probe times each phase of
one chunk in isolation on the real TPU to find where the ~6 s/chunk of
non-compute time actually goes:

  * h2d: device_put of the 2-frame f32 chunk (and the uint8 variant),
  * compute: expand_tree dispatch -> scalar-probe completion,
  * d2h: fetch of the expanded uint8 tree,
  * overlap: fetch of tree k while tree k+1 computes (the streaming
    driver's pattern), vs the serialized sum.
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from frame_interpolation_tpu.inference import Interpolator
from frame_interpolation_tpu.models.film_net import FilmNet, init_params
from frame_interpolation_tpu.options import Options


def force(x):
  """Completion probe: only a value fetch awaits on the axon platform."""
  return float(jnp.sum(x[..., 0, 0, :].astype(jnp.float32)))


def main():
  times = int(os.environ.get('T', '5'))
  max_batch = int(os.environ.get('MAX_BATCH', '4'))
  h, w = 1080, 1920
  options = Options.film_net_released(dtype_policy='bfloat16',
                                      use_aux_outputs=False,
                                      warp_impl='window')
  model = FilmNet(options)
  params = init_params(model, jax.random.PRNGKey(0))
  interp = Interpolator(params, options, align=64)
  rng = np.random.RandomState(0)
  chunk = rng.rand(2, h, w, 3).astype(np.float32)

  # Warmup/compile.
  out = interp.expand_tree_device(chunk, times, max_batch=max_batch,
                                  as_uint8=True)
  n_out = out.shape[0]
  print(f'tree: {n_out} frames out, {n_out - 2} mids', flush=True)
  _ = np.asarray(jax.device_get(out))

  def timed(label, fn, n=3):
    best = float('inf')
    for _ in range(n):
      t0 = time.perf_counter()
      fn()
      best = min(best, time.perf_counter() - t0)
    print(f'{label}: {best * 1e3:.0f} ms', flush=True)
    return best

  # H2D: f32 vs uint8 payloads.
  chunk_u8 = (chunk * 255).astype(np.uint8)
  timed('h2d f32 2 frames (50 MB)',
        lambda: force(jax.device_put(chunk).astype(jnp.float32)))
  timed('h2d uint8 2 frames (12 MB)',
        lambda: force(jax.device_put(chunk_u8).astype(jnp.float32)))

  # Compute only: dispatch + completion probe (fetches 1 row, not the tree).
  def compute_only():
    res = interp.expand_tree_device(chunk, times, max_batch=max_batch,
                                    as_uint8=True)
    force(res)
    return res

  timed('compute (dispatch->probe)', compute_only)

  # D2H: fetch of an already-computed tree.
  res = compute_only()
  timed(f'd2h uint8 tree ({n_out * h * w * 3 / 1e6:.0f} MB)',
        lambda: np.asarray(jax.device_get(res)))

  # Serialized: compute then fetch.
  def serial():
    r = interp.expand_tree_device(chunk, times, max_batch=max_batch,
                                  as_uint8=True)
    np.asarray(jax.device_get(r))

  timed('serial compute+fetch', serial, n=2)

  # Overlapped: dispatch k+1 before fetching k (the streaming pattern).
  def overlapped():
    r1 = interp.expand_tree_device(chunk, times, max_batch=max_batch,
                                   as_uint8=True)
    r2 = interp.expand_tree_device(chunk, times, max_batch=max_batch,
                                   as_uint8=True)
    np.asarray(jax.device_get(r1))
    np.asarray(jax.device_get(r2))

  t = timed('2-chunk overlapped', overlapped, n=2)
  print(f'-> per chunk {t / 2 * 1e3:.0f} ms', flush=True)


if __name__ == '__main__':
  main()
