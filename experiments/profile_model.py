#!/usr/bin/env python
"""Device-trace the full model forward; aggregate op time by category."""
import glob
import gzip
import json
import os
import re
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from frame_interpolation_tpu.models.film_net import FilmNet, init_params
from frame_interpolation_tpu.ops import tiling
from frame_interpolation_tpu.options import Options

WARP = os.environ.get('PROF_WARP', 'window')


def main():
  options = Options.film_net_released(dtype_policy='bfloat16',
                                      use_aux_outputs=False, warp_impl=WARP)
  model = FilmNet(options)
  params = init_params(model, jax.random.PRNGKey(0))

  @jax.jit
  def run(params, x0, x1, tv):
    def one(a, b):
      ap, bbox = tiling.pad_to_align(a, 64)
      bp, _ = tiling.pad_to_align(b, 64)
      img = model.apply({'params': params}, ap, bp, tv)['image']
      return tiling.crop_to_bounding_box(img, **bbox)

    def body(_, carry):
      a, b = carry
      return (one(a, b), b)

    final, _ = jax.lax.fori_loop(0, 2, body, (x0, x1))
    return jnp.mean(final.astype(jnp.float32))

  rng = np.random.RandomState(0)
  x0 = jax.device_put(rng.rand(1, 1080, 1920, 3).astype(np.float32))
  x1 = jax.device_put(rng.rand(1, 1080, 1920, 3).astype(np.float32))
  tv = jax.device_put(np.full((1, 1), 0.5, np.float32))
  float(run(params, x0, x1, tv))

  trace_dir = '/tmp/model_trace'
  os.system(f'rm -rf {trace_dir}')
  jax.profiler.start_trace(trace_dir)
  float(run(params, x0, x1, tv))
  jax.profiler.stop_trace()

  paths = glob.glob(os.path.join(trace_dir, '**', '*.trace.json.gz'),
                    recursive=True)
  if not paths:
    print('no trace')
    return
  with gzip.open(paths[0], 'rt') as f:
    trace = json.load(f)
  # Keep only device (TensorCore) lanes: find pids whose process name
  # mentions TPU / TensorCore.
  names = {}
  for ev in trace.get('traceEvents', []):
    if ev.get('ph') == 'M' and ev.get('name') == 'process_name':
      names[ev['pid']] = ev['args'].get('name', '')
  device_pids = {pid for pid, name in names.items()
                 if 'TPU' in name or 'Tensor' in name or '/device' in name}
  print('processes:', names)
  total = {}
  raw = {}
  args_of = {}
  for ev in trace.get('traceEvents', []):
    if ev.get('ph') != 'X' or 'dur' not in ev:
      continue
    if device_pids and ev.get('pid') not in device_pids:
      continue
    name = ev.get('name', '?')
    raw[name] = raw.get(name, 0) + ev['dur']
    if name not in args_of and ev.get('args'):
      args_of[name] = ev['args']
    cat = re.sub(r'[.\d]+$', '', name)
    total[cat] = total.get(cat, 0) + ev['dur']
  print('--- by op category (2 frames) ---')
  for name, dur in sorted(total.items(), key=lambda kv: -kv[1])[:30]:
    print(f'{dur/2000.0:9.2f} ms/frame  {name[:90]}')
  if os.environ.get('PROF_RAW'):
    print('--- top raw ops ---')
    for name, dur in sorted(raw.items(), key=lambda kv: -kv[1])[:40]:
      extra = ''
      a = args_of.get(name, {})
      for key in ('long_name', 'shape', 'layout', 'tf_op'):
        if key in a:
          extra += f' | {key}={str(a[key])[:140]}'
      print(f'{dur/2000.0:9.2f} ms/frame  {name[:60]}{extra}')


if __name__ == '__main__':
  main()
