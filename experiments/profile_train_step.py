#!/usr/bin/env python
"""Device-trace the lean train step (bs8, 256px); aggregate by category.

Mirrors bench.py's BENCH_MODE=train setup exactly so the trace explains
the steps/sec number. PROF_LOSSES=l1,vgg,style for the style objective.
"""
import collections
import glob
import gzip
import json
import os
import re
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from frame_interpolation_tpu import losses as losses_lib
from frame_interpolation_tpu.models.film_net import FilmNet, init_params
from frame_interpolation_tpu.options import Options
from frame_interpolation_tpu.training import train_lib


def main():
  batch, crop = 8, 256
  loss_names = os.environ.get('PROF_LOSSES', 'l1').split(',')
  options = Options.film_net_released(dtype_policy='bfloat16',
                                      use_aux_outputs=True,
                                      warp_impl='auto')
  model = FilmNet(options)
  params = init_params(model, jax.random.PRNGKey(0))
  optimizer = train_lib.create_optimizer(train_lib.TrainingOptions())
  losses = losses_lib.training_losses(loss_names,
                                      loss_weights=[1.0] * len(loss_names))
  step_fn = train_lib.make_train_step(
      model, losses, optimizer,
      augmentation_names=('random_flip', 'random_reverse'),
      with_summaries=False)
  state = train_lib.create_train_state(params, optimizer)
  rng = np.random.RandomState(0)
  arrays = {
      'x0': jax.device_put(rng.rand(batch, crop, crop, 3).astype(np.float32)),
      'x1': jax.device_put(rng.rand(batch, crop, crop, 3).astype(np.float32)),
      'y': jax.device_put(rng.rand(batch, crop, crop, 3).astype(np.float32)),
      'time': jax.device_put(np.full((batch, 1), 0.5, np.float32)),
  }
  key = jax.random.PRNGKey(1)

  def run(state, n=2):
    metrics = None
    for i in range(n):
      state, metrics, _ = step_fn(state, arrays, jax.random.fold_in(key, i))
    assert np.isfinite(float(jax.device_get(metrics['training_loss'])))
    return state

  state = run(state)  # compile
  trace_dir = '/tmp/train_trace_r3'
  os.system(f'rm -rf {trace_dir}')
  jax.profiler.start_trace(trace_dir)
  state = run(state)
  jax.profiler.stop_trace()

  paths = glob.glob(os.path.join(trace_dir, '**', '*.trace.json.gz'),
                    recursive=True)
  if not paths:
    print('no trace')
    return
  with gzip.open(paths[0], 'rt') as f:
    trace = json.load(f)
  names = {}
  for ev in trace.get('traceEvents', []):
    if ev.get('ph') == 'M' and ev.get('name') == 'process_name':
      names[ev['pid']] = ev['args'].get('name', '')
  device_pids = {pid for pid, name in names.items()
                 if 'TPU' in name or '/device' in name}
  total = collections.Counter()
  raw = collections.Counter()
  info = {}
  for ev in trace.get('traceEvents', []):
    if ev.get('ph') != 'X' or 'dur' not in ev:
      continue
    if device_pids and ev.get('pid') not in device_pids:
      continue
    name = ev.get('name', '?')
    raw[name] += ev['dur']
    if name not in info and ev.get('args'):
      info[name] = str(ev['args'].get('tf_op', ''))[-80:]
    total[re.sub(r'[.\d]+$', '', name)] += ev['dur']
  print('--- by category (2 steps) ---')
  for name, dur in total.most_common(22):
    print(f'{dur/2000.0:9.2f} ms/step  {name[:80]}')
  print('--- top raw ---')
  for name, dur in raw.most_common(24):
    print(f'{dur/2000.0:9.2f} ms/step  {name[:36]} | {info.get(name,"")}')


if __name__ == '__main__':
  main()
