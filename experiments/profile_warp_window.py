#!/usr/bin/env python
"""Device-trace the window warp and print top ops by self time."""
import glob
import gzip
import json
import os
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from frame_interpolation_tpu.ops import warp, warp_window

H, W, C = 1088, 1920, 67
IMPL = os.environ.get('PROF_IMPL', 'window')
FLOW = os.environ.get('PROF_FLOW', 'smooth')


def main():
  rng = np.random.RandomState(1)
  image = jnp.asarray(rng.rand(1, H, W, C).astype(np.float32),
                      dtype=jnp.bfloat16)
  yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing='ij')
  smooth = np.stack([30 * np.sin(yy / 97.0) * np.cos(xx / 131.0),
                     30 * np.cos(yy / 113.0) * np.sin(xx / 89.0)],
                    axis=-1).astype(np.float32)
  if FLOW == 'boundary':
    seam = (yy + 2 * xx) % 613 < 240
    smooth[seam] += np.array([40.0, -37.0], np.float32)
  flow = jnp.asarray(smooth[None])
  fn = (warp_window.backward_warp_window if IMPL == 'window'
        else warp.backward_warp)

  @jax.jit
  def run(image, flow):
    def body(_, carry):
      return fn(carry, flow)
    return jnp.mean(jax.lax.fori_loop(0, 4, body, image).astype(jnp.float32))

  float(run(image, flow))  # compile
  trace_dir = '/tmp/warp_trace'
  os.system(f'rm -rf {trace_dir}')
  jax.profiler.start_trace(trace_dir)
  v = float(run(image, flow))
  jax.profiler.stop_trace()
  assert np.isfinite(v)

  paths = glob.glob(os.path.join(trace_dir, '**', '*.trace.json.gz'),
                    recursive=True)
  print('trace files:', paths)
  if not paths:
    return
  with gzip.open(paths[0], 'rt') as f:
    trace = json.load(f)
  total = {}
  for ev in trace.get('traceEvents', []):
    if ev.get('ph') == 'X' and 'dur' in ev:
      name = ev.get('name', '?')
      total[name] = total.get(name, 0) + ev['dur']
  for name, dur in sorted(total.items(), key=lambda kv: -kv[1])[:25]:
    print(f'{dur/1000.0:9.2f} ms  {name[:100]}')


if __name__ == '__main__':
  main()
