#!/usr/bin/env python
"""Small-shape TPU compile/run probe for the cached tree program.

Verifies the scan-DFS structure (nested scan + cond + dynamic slot
indexing + window-warp Pallas kernels inside the cond branches) compiles
and executes on the real chip before the full-size video bench pays a
15-minute remote compile. Run: python experiments/probe_cached_tree.py
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from frame_interpolation_tpu.inference import Interpolator
from frame_interpolation_tpu.models.film_net import FilmNet, init_params
from frame_interpolation_tpu.options import Options


def main():
  print('platform:', jax.devices()[0].platform, flush=True)
  height = int(os.environ.get('PROBE_H', '256'))
  width = int(os.environ.get('PROBE_W', '448'))
  times = int(os.environ.get('PROBE_T', '3'))
  block = os.environ.get('PROBE_BLOCK', '')
  block_shape = tuple(int(v) for v in block.split('x')) if block else None
  options = Options.film_net_released(
      dtype_policy='bfloat16', use_aux_outputs=False, warp_impl='window')
  model = FilmNet(options)
  params = init_params(model, jax.random.PRNGKey(0))
  interp = Interpolator(params, options, align=64, block_shape=block_shape)
  rng = np.random.RandomState(0)
  frames = rng.rand(2, height, width, 3).astype(np.float32)

  t0 = time.perf_counter()
  out = interp.expand_tree_device(frames, times, as_uint8=True, cached=True)
  out = np.asarray(jax.device_get(out))
  print('cached tree: %.1f s (compile+run), out %s %s' %
        (time.perf_counter() - t0, out.shape, out.dtype), flush=True)

  t0 = time.perf_counter()
  out2 = np.asarray(jax.device_get(
      interp.expand_tree_device(frames, times, as_uint8=True, cached=True)))
  print('cached tree warm: %.2f s' % (time.perf_counter() - t0), flush=True)
  np.testing.assert_array_equal(out, out2)

  if os.environ.get('PROBE_CHUNKED', '1') == '1':
    t0 = time.perf_counter()
    ref = np.asarray(jax.device_get(
        interp.expand_tree_device(frames, times, max_batch=4, as_uint8=True,
                                  cached=False)))
    print('chunked tree: %.1f s (compile+run)' % (time.perf_counter() - t0),
          flush=True)
    diff = np.abs(ref.astype(np.int32) - out.astype(np.int32))
    print('uint8 max diff cached vs chunked:', diff.max(), flush=True)
    assert diff.max() <= 1, diff.max()
  print('probe OK', flush=True)


if __name__ == '__main__':
  main()
