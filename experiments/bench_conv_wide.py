#!/usr/bin/env python
"""On-chip A/B: fused flat wide-stack kernel vs XLA conv(+pool).

Shapes are the extractor's wide sub-level second convs at 1080p
(cfeat_conv_3/5/7; the round-5 trace shows XLA at 4.4-4.7 ms each).
Also asserts compiled-kernel parity vs the XLA conv on the chip.
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from frame_interpolation_tpu.ops import conv_stack_wide as csw

ITERS = int(os.environ.get('ITERS', '8'))
SHAPES = [(544, 960, 128), (272, 480, 256), (136, 240, 512)]


def timed(fn, *args):
  fn(*args)  # compile+run
  best = float('inf')
  for _ in range(3):
    t0 = time.perf_counter()
    v = fn(*args)
    v = float(jnp.sum(v.astype(jnp.float32)[:8, :8]))
    assert v == v
    best = min(best, time.perf_counter() - t0)
  return best / ITERS


def main():
  print('platform:', jax.devices()[0].platform, flush=True)
  for h, w, c in SHAPES:
    rng = np.random.RandomState(0)
    g = csw.flat_geometry(h, w, c)
    x = jnp.asarray(rng.rand(h, w, c) - 0.5, jnp.bfloat16)
    k = jnp.asarray((rng.rand(3, 3, c, c) - 0.5) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.rand(c) - 0.5, jnp.float32)
    tall = csw.pad_image_tall_flat(x, g)
    xflat = csw.mask_tall_flat(tall, g).reshape(g.r_total, c)
    xflat = jax.device_put(xflat)

    @jax.jit
    def fused_loop(xflat, k, b, g=g):
      def body(_, xf):
        f, _ = csw.conv_flat(xf, k, b, g, emit_pool=True)
        return f
      return jax.lax.fori_loop(0, ITERS, body, xflat)

    @jax.jit
    def xla_loop(x, k, b):
      def body(_, xx):
        y = jax.lax.conv_general_dilated(
            xx[None], k, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))[0] + b.astype(
                xx.dtype)
        y = jnp.where(y >= 0, y, y * 0.2)
        # The pool the fused kernel also emits (reads the plane again);
        # fold it back scaled so it cannot be DCE'd.
        p = jax.lax.reduce_window(
            y.astype(jnp.float32), 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1),
            'VALID') * 0.25
        return y.at[:p.shape[0], :p.shape[1], :].add(
            (p * 1e-12).astype(y.dtype))
      return jax.lax.fori_loop(0, ITERS, body, x)

    # Parity first (one call, compiled kernel vs XLA on-chip).
    @jax.jit
    def parity(xflat, x, k, b, g=g):
      f_flat, p_half = csw.conv_flat(xflat, k, b, g, emit_pool=True)
      feat = csw.features_from_flat(f_flat, g).astype(jnp.float32)
      pool = csw.pooled_from_half(p_half, g).astype(jnp.float32)
      y = jax.lax.conv_general_dilated(
          x[None], k, (1, 1), 'SAME',
          dimension_numbers=('NHWC', 'HWIO', 'NHWC'))[0] + b.astype(x.dtype)
      y = jnp.where(y >= 0, y, y * 0.2)
      y32 = y.astype(jnp.float32)
      pr = jax.lax.reduce_window(
          y32, 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1), 'VALID') * 0.25
      return (jnp.max(jnp.abs(feat - y32)), jnp.max(jnp.abs(pool - pr)),
              jnp.max(jnp.abs(y32)))

    df, dp, scale = (float(v) for v in parity(xflat, x, k, b))
    print(f'{h}x{w}x{c}: parity feat={df:.3e} pool={dp:.3e} '
          f'(scale {scale:.2f})', flush=True)
    assert df < 0.15 and dp < 0.15, (df, dp)

    t_fused = timed(fused_loop, xflat, k, b)
    t_xla = timed(xla_loop, x, k, b)
    print(f'{h}x{w}x{c}: fused {t_fused*1e3:.2f} ms  '
          f'xla conv+pool {t_xla*1e3:.2f} ms  speedup {t_xla/t_fused:.2f}x',
          flush=True)


if __name__ == '__main__':
  main()
