#!/usr/bin/env python
"""Does a Pallas int8 matmul engage the v5e's 2x int8 MXU path?

Round-1 finding: XLA int8 convs run at bf16 speed (PERF.md). This checks
whether a hand-written Pallas matmul does better, which gates building an
int8 conv kernel for the 64->64 conv bottleneck.
"""
import functools
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = N = K = 4096
TM = TN = 512
ITERS = 32


def matmul_kernel(a_ref, b_ref, o_ref, acc_ref, *, n_k):
  k = pl.program_id(2)

  @pl.when(k == 0)
  def _():
    acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

  acc_ref[...] += jnp.dot(a_ref[...], b_ref[...],
                          preferred_element_type=acc_ref.dtype)

  @pl.when(k == n_k - 1)
  def _():
    o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def make_matmul(dtype, acc_dtype, tk):
  n_k = K // tk
  kernel = functools.partial(matmul_kernel, n_k=n_k)

  @jax.jit
  def mm(a, b):
    return pl.pallas_call(
        kernel,
        grid=(M // TM, N // TN, n_k),
        in_specs=[pl.BlockSpec((TM, tk), lambda i, j, k: (i, k)),
                  pl.BlockSpec((tk, TN), lambda i, j, k: (k, j))],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), acc_dtype)],
    )(a, b)

  return mm


def bench(name, dtype, acc_dtype, tk=512):
  rng = np.random.RandomState(0)
  if dtype == jnp.int8:
    a = jnp.asarray(rng.randint(-80, 80, (M, K)), jnp.int8)
    b = jnp.asarray(rng.randint(-80, 80, (K, N)), jnp.int8)
  else:
    a = jnp.asarray(rng.rand(M, K), dtype)
    b = jnp.asarray(rng.rand(K, N), dtype)
  mm = make_matmul(dtype, acc_dtype, tk)

  @jax.jit
  def loop(a, b):
    def body(_, a):
      out = mm(a, b)
      return out.astype(a.dtype)
    return jnp.sum(jax.lax.fori_loop(0, ITERS, body, a).astype(jnp.float32))

  try:
    float(loop(a, b))
    best = float('inf')
    for _ in range(3):
      t0 = time.perf_counter()
      v = float(loop(a, b))
      best = min(best, time.perf_counter() - t0)
      assert np.isfinite(v)
    tflops = 2 * M * N * K * ITERS / best / 1e12
    print(f'{name}: {best*1e3/ITERS:.3f} ms/matmul = {tflops:.1f} T(FL)OPS',
          flush=True)
  except Exception as e:
    s = str(e)
    i = s.find('Mosaic')
    print(f'{name}: FAIL {(s[i:i+160] if i >= 0 else s[:160])}', flush=True)


if __name__ == '__main__':
  print('platform:', jax.devices()[0].platform, flush=True)
  bench('bf16xbf16->f32', jnp.bfloat16, jnp.float32)
  bench('int8xint8->int32', jnp.int8, jnp.int32)
  bench('int8xint8->f32acc', jnp.int8, jnp.float32)
