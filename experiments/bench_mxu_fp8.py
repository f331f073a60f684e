#!/usr/bin/env python
"""Does any fp8 matmul path beat bf16 on this chip/toolchain?

Companion to bench_mxu_int8.py (which found the 2x int8 MXU path does NOT
engage: 108 TOPS vs 283 TFLOPS bf16). VERDICT round-4 item 2 asks for a
lower-precision conv path toward the 30 fps north star; this measures
whether fp8 (e4m3/e5m2) is available at all — via XLA dot and via a tuned
Pallas matmul — before any in-model work. v5e has no fp8 MXU mode in
public specs; this pins what the toolchain actually does (cast-up, crash,
or a real fast path).
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


def make_pallas_matmul(dtype, acc_dtype, tk):
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
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((TM, TN), acc_dtype)],
    )(a, b)

  return mm


def make_xla_matmul(dtype):
  @jax.jit
  def mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)

  return mm


def bench(name, make, dtype):
  rng = np.random.RandomState(0)
  try:
    a = jnp.asarray(rng.rand(M, K).astype(np.float32), dtype)
    b = jnp.asarray(rng.rand(K, N).astype(np.float32), dtype)
    mm = make(dtype)

    @jax.jit
    def loop(a, b):
      def body(_, c):
        return mm(a, b).astype(jnp.bfloat16)
      out = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((M, N), jnp.bfloat16))
      return jnp.sum(out.astype(jnp.float32))

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
    s = str(e).replace('\n', ' ')
    i = s.find('Mosaic')
    print(f'{name}: FAIL {(s[i:i+200] if i >= 0 else s[:200])}', flush=True)


if __name__ == '__main__':
  print('platform:', jax.devices()[0].platform, flush=True)
  bench('xla bf16xbf16->f32', make_xla_matmul, jnp.bfloat16)
  bench('xla e4m3xe4m3->f32', make_xla_matmul, jnp.float8_e4m3fn)
  bench('xla e5m2xe5m2->f32', make_xla_matmul, jnp.float8_e5m2)
  bench('pallas e4m3xe4m3->f32acc',
        lambda d: make_pallas_matmul(d, jnp.float32, 512), jnp.float8_e4m3fn)
