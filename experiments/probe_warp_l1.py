#!/usr/bin/env python
"""On-chip A/B: XLA gather vs window kernel at train L1/L2 warp shapes.

The 'auto' warp routing (ops/warp.py backward_warp_impl) gates the window
kernel at h >= 64 and w >= 256, so the bs8/256px train step's L1 warps
(8, 128, 128, C) run the XLA per-pixel gather. The kernel itself handles
w == 128 (wp = 128, single column window); this probe measures whether it
wins there, to size the gate.
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from frame_interpolation_tpu.ops import warp, warp_window


def timeit(fn, *args, n=20):
  out = fn(*args)
  jax.block_until_ready(out)
  float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # force fetch
  best = float('inf')
  for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(n):
      out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    best = min(best, (time.perf_counter() - t0) / n)
  return best * 1e3


def main():
  rng = np.random.RandomState(0)
  shapes = [(8, 128, 128, 64), (8, 128, 128, 128), (8, 64, 64, 128),
            (8, 64, 64, 256)]
  gather_j = jax.jit(warp.backward_warp)
  window_j = jax.jit(lambda i, f: warp_window._forward(
      i, f, False, g=warp_window._group_from_env()))
  for b, h, w, c in shapes:
    img = jnp.asarray(rng.rand(b, h, w, c), jnp.bfloat16)
    flow = jnp.asarray(rng.randn(b, h, w, 2) * 4.0, jnp.float32)
    # parity first
    want = np.asarray(gather_j(img, flow), np.float32)
    got = np.asarray(window_j(img, flow), np.float32)
    err = float(np.max(np.abs(want - got)))
    tg = timeit(gather_j, img, flow)
    tw = timeit(window_j, img, flow)
    print(f'({b},{h},{w},{c}) bf16: gather {tg:.3f} ms  window {tw:.3f} ms '
          f' x{tg / tw:.2f}  err {err:.2e}')


if __name__ == '__main__':
  main()
