#!/usr/bin/env python
"""Does the @jit wrapper on jax.nn.leaky_relu force relayout copies?

The 1080p trace shows ~20 ms/frame of T(2,128)<->T(8,128) copies fencing
every extractor conv, with tf_ops like jit(leaky_relu)/jit(_where)/select_n.
jax.nn.leaky_relu is @jit-wrapped, so it lowers as a call boundary.

Compile-only probe: lower the full forward on the TPU with (a) the stock
jax.nn.leaky_relu and (b) an inline jnp.maximum(x, 0.2*x) (bit-identical
for slope<1), then count copy/fusion bytes in the optimized HLO.

Usage: FI_LEAKY=inline|stock python experiments/probe_leaky_layout.py
"""
import os
import re
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

MODE = os.environ.get('FI_LEAKY', 'inline')

if MODE == 'inline':
  import frame_interpolation_tpu.models.feature_extractor as fe
  import frame_interpolation_tpu.models.flow_estimator as fl
  import frame_interpolation_tpu.models.fusion as fu
  def _inline_leaky(x):
    return jnp.maximum(x, jnp.asarray(0.2, x.dtype) * x)
  fe._leaky_relu = _inline_leaky
  fl._leaky_relu = _inline_leaky
  fu._leaky_relu = _inline_leaky

from frame_interpolation_tpu.models.film_net import FilmNet, init_params
from frame_interpolation_tpu.ops import tiling
from frame_interpolation_tpu.options import Options


def main():
  options = Options.film_net_released(dtype_policy='bfloat16',
                                      use_aux_outputs=False,
                                      warp_impl='window')
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

  x0 = jax.ShapeDtypeStruct((1, 1080, 1920, 3), jnp.float32)
  tv = jax.ShapeDtypeStruct((1, 1), jnp.float32)
  print('platform:', jax.devices()[0].platform, flush=True)
  compiled = run.lower(params, x0, x0, tv).compile()
  txt = compiled.as_text()
  print('mode:', MODE, 'hlo chars:', len(txt), flush=True)

  def shape_bytes(s):
    m = re.match(r'(\w+)\[([\d,]*)\]', s)
    if not m:
      return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(','):
      if d:
        n *= int(d)
    width = {'f32': 4, 'bf16': 2, 's32': 4, 'u32': 4, 'pred': 1,
             'u8': 1, 's8': 1, 'f16': 2}.get(dt, 4)
    return n * width

  stats = {}
  for line in txt.splitlines():
    m = re.search(r'%?(copy|copy-start|transpose|pad|bitcast)[.\d]* = (\S+)',
                  line)
    if m and ' = ' in line:
      op, shape = m.groups()
      b = shape_bytes(shape)
      k = op
      cnt, tot = stats.get(k, (0, 0))
      stats[k] = (cnt + 1, tot + b)
  for k, (cnt, tot) in sorted(stats.items()):
    print(f'{k:12s} count={cnt:5d} bytes={tot/1e6:10.1f} MB')

  if os.environ.get('PROF_RUN'):
    import time
    rng = np.random.RandomState(0)
    a = jax.device_put(rng.rand(1, 1080, 1920, 3).astype(np.float32))
    b = jax.device_put(rng.rand(1, 1080, 1920, 3).astype(np.float32))
    t = jax.device_put(np.full((1, 1), 0.5, np.float32))
    float(compiled(params, a, b, t)[0] if isinstance(
        compiled(params, a, b, t), tuple) else compiled(params, a, b, t))
    best = float('inf')
    for _ in range(3):
      t0 = time.perf_counter()
      float(compiled(params, a, b, t))
      best = min(best, time.perf_counter() - t0)
    print(f'run: {best / 2 * 1e3:.1f} ms/frame -> {2 / best:.3f} fps')


if __name__ == '__main__':
  main()
