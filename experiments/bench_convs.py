#!/usr/bin/env python
"""Times every distinct conv shape in the released film_net at 1080p.

Identifies which layers run far below MXU speed-of-light (the round-1
finding: 64->64 3x3 at ~35 TFLOPS) to target a Pallas conv kernel.
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# (label, H, W, Cin, Cout, k) — the hot conv shapes per pyramid level of the
# released config (feature extractor pairs, flow predictors, fusion).
SHAPES = [
    ('feat L0 3->64 k3', 1088, 1920, 3, 64, 3),
    ('feat L0 64->64 k3', 1088, 1920, 64, 64, 3),
    ('feat L1 64->128 k3', 544, 960, 64, 128, 3),
    ('feat L1 128->128 k3', 544, 960, 128, 128, 3),
    ('flow L0 128->32 k3', 1088, 1920, 128, 32, 3),
    ('flow L0 32->32 k3', 1088, 1920, 32, 32, 3),
    ('flow L0 32->16 k1', 1088, 1920, 32, 16, 1),
    ('flow L1 384->64 k3', 544, 960, 384, 64, 3),
    ('fusion L0 up 64->64 k2', 1088, 1920, 64, 64, 2),
    ('fusion L0 202->64 k3', 1088, 1920, 202, 64, 3),
    ('fusion L0 64->64 k3', 1088, 1920, 64, 64, 3),
    ('fusion L1 459->128 k3', 544, 960, 459, 128, 3),
]
ITERS = 8


def bench(label, h, w, cin, cout, k):
  rng = np.random.RandomState(0)
  x = jnp.asarray(rng.rand(1, h, w, cin), jnp.bfloat16)
  kern = jnp.asarray(rng.rand(k, k, cin, cout) * 0.1, jnp.bfloat16)

  @jax.jit
  def run(x, kern):
    def body(carry, _):
      # Chain through a scalar: the conv input tensor is reused verbatim,
      # so no per-iteration copies contaminate the timing.
      xi = x * (1.0 + carry * 1e-12).astype(x.dtype)
      y = jax.lax.conv_general_dilated(
          xi, kern, (1, 1), 'SAME',
          dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
          preferred_element_type=jnp.float32)
      y = jax.nn.leaky_relu(y, 0.2)
      return jnp.max(y).astype(jnp.float32), ()

    out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
    return out

  float(run(x, kern))
  best = float('inf')
  for _ in range(3):
    t0 = time.perf_counter()
    v = float(run(x, kern))
    best = min(best, time.perf_counter() - t0)
    assert np.isfinite(v)
  ms = best * 1e3 / ITERS
  tflops = 2 * h * w * cin * cout * k * k / (ms / 1e3) / 1e12
  print(f'{label:26s} {ms:8.3f} ms  {tflops:6.1f} TFLOPS', flush=True)


if __name__ == '__main__':
  print('platform:', jax.devices()[0].platform, flush=True)
  for shape in SHAPES:
    bench(*shape)
