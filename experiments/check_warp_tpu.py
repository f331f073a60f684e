#!/usr/bin/env python
"""ON-DEVICE parity: window kernel (bf16 planes) vs XLA gather warp.

The CPU test suite pins the window kernel in interpret mode; this check
runs BOTH implementations on the real TPU and compares, guarding against
hardware/Mosaic behaviors the interpreter can't see (e.g. alignment rules
for bf16 window DMAs — 8-aligned starts on bf16 HBM memrefs compiled
fine, this verifies they also read the right rows). Also checks the
splat VJP against the XLA scatter VJP at a training shape.
"""
import os
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from frame_interpolation_tpu.ops import warp, warp_window

H, W, C = 384, 640, 67


def main():
  print('platform:', jax.devices()[0].platform, flush=True)
  rng = np.random.RandomState(0)
  image = jnp.asarray(rng.rand(2, H, W, C), jnp.bfloat16)
  yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing='ij')
  smooth = np.stack([30 * np.sin(yy / 97.0) * np.cos(xx / 131.0),
                     30 * np.cos(yy / 89.0) * np.sin(xx / 151.0)], axis=-1)
  hard = smooth.copy()
  hard[:, : W // 2] += 40.0
  flows = np.stack([smooth, hard]).astype(np.float32)
  flow = jnp.asarray(flows)

  @jax.jit
  def both(image, flow):
    a = warp.backward_warp(image, flow)
    b = warp_window.backward_warp_window(image, flow)
    return a, b

  a, b = jax.device_get(both(image, flow))
  a = a.astype(np.float32)
  b = b.astype(np.float32)
  err = np.abs(a - b).max()
  print('forward max abs diff (gather vs window, TPU):', err, flush=True)
  # On bf16 inputs the two paths legitimately differ by ~1 bf16 ulp: the
  # gather path blends in the image dtype (bf16 lerps, rounding each
  # step) while the window kernel computes f32 and rounds once at the
  # end. A wrong-rows/alignment bug would show O(1) errors; the bound
  # here is 2 ulp at magnitude ~1.
  assert err <= 2 * 2.0 ** -8, err

  # Splat VJP vs XLA scatter VJP (image cotangent) at a training shape.
  # f32 inputs: with a bf16 cotangent the XLA scatter accumulates in
  # bf16 and IT is the inaccurate side (measured rel ~9e-3 against the
  # splat's f32 accumulator), so it can't serve as the reference.
  img8 = jnp.asarray(rng.rand(4, 256, 256, 64), jnp.float32)
  flow8 = jnp.asarray((rng.rand(4, 256, 256, 2) - 0.5) * 24, jnp.float32)
  g = jnp.asarray(rng.rand(4, 256, 256, 64), jnp.float32)

  @jax.jit
  def grads(img, fl, g):
    _, vjp_fast = jax.vjp(lambda x: warp.backward_warp(x, fl), img)
    _, vjp_ref = jax.vjp(
        lambda x: warp._backward_warp_raw(x, fl), img)
    return vjp_fast(g)[0].astype(jnp.float32), vjp_ref(
        g)[0].astype(jnp.float32)

  gf, gr = jax.device_get(grads(img8, flow8, g))
  gerr = np.abs(gf - gr).max()
  rel = gerr / max(np.abs(gr).max(), 1e-6)
  print('image-cotangent max abs diff (splat vs scatter, TPU):', gerr,
        f'(rel {rel:.2e})', flush=True)
  assert rel < 1e-5, (gerr, rel)
  print('TPU parity OK', flush=True)


if __name__ == '__main__':
  main()
