#!/usr/bin/env python
"""Probes for the planned Pallas conv kernel (see PERF.md conv campaign).

Checks whether Mosaic supports the static-offset views the tap-pair
matmul formulation needs on bf16 buffers:
  1. static odd-row slice of a bf16 VMEM buffer (ky=1 tap row);
  2. static 64-lane-offset slice (odd-parity tap pair);
  3. reshape (TH, TW/2*128) -> (TH*TW/2, 128) fed to jnp.dot on the MXU;
  4. strided output interleave store out[:, :, 0::2-style].
"""
import os
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
  try:
    ok = fn()
    print(f'PROBE {name}: {"OK" if ok else "WRONG-RESULT"}', flush=True)
  except Exception as e:  # noqa: BLE001
    s = str(e)
    i = s.find('Mosaic')
    msg = (s[i:i + 140] if i >= 0 else s[:140]).replace(chr(10), ' | ')
    print(f'PROBE {name}: FAIL {msg}', flush=True)


def _call(kernel, x, out_shape, extra=()):
  return pl.pallas_call(
      kernel,
      in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(extra)),
      out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
      out_shape=out_shape,
  )(x, *extra)


def probe_bf16_static_odd_row():
  def kernel(x_ref, o_ref):
    o_ref[:] = x_ref[1:17, 0:128]

  x = np.arange(18 * 256, dtype=np.float32).reshape(18, 256)
  xb = jnp.asarray(x, jnp.bfloat16)
  out = _call(kernel, xb, jax.ShapeDtypeStruct((16, 128), jnp.bfloat16))
  return np.array_equal(np.asarray(out, np.float32),
                        np.asarray(xb, np.float32)[1:17, :128])


def probe_bf16_static_64lane_offset():
  def kernel(x_ref, o_ref):
    o_ref[:] = x_ref[0:16, 64:192]

  x = np.arange(18 * 256, dtype=np.float32).reshape(18, 256)
  xb = jnp.asarray(x, jnp.bfloat16)
  out = _call(kernel, xb, jax.ShapeDtypeStruct((16, 128), jnp.bfloat16))
  return np.array_equal(np.asarray(out, np.float32),
                        np.asarray(xb, np.float32)[:16, 64:192])


def probe_view_matmul():
  def kernel(x_ref, w_ref, o_ref):
    lhs = x_ref[0:16, 0:1024].reshape(16 * 8, 128)
    o_ref[:] = jnp.dot(lhs, w_ref[:],
                       preferred_element_type=jnp.float32)

  rng = np.random.RandomState(0)
  x = jnp.asarray(rng.rand(18, 1024), jnp.bfloat16)
  w = jnp.asarray(rng.rand(128, 64), jnp.bfloat16)
  out = _call(kernel, x, jax.ShapeDtypeStruct((128, 64), jnp.float32), (w,))
  lhs = np.asarray(x, np.float32)[0:16, 0:1024].reshape(128, 128)
  want = lhs @ np.asarray(w, np.float32)
  return np.allclose(np.asarray(out), want, rtol=2e-2, atol=2e-2)


def probe_parity_interleave_store():
  def kernel(x_ref, o_ref):
    even = x_ref[:] * 2.0
    odd = x_ref[:] * 3.0
    o4 = o_ref.reshape(8, 4, 2, 64)
    o4[:, :, 0, :] = even.reshape(8, 4, 64)
    o4[:, :, 1, :] = odd.reshape(8, 4, 64)

  x = np.arange(8 * 256, dtype=np.float32).reshape(8, 256)
  out = _call(kernel, jnp.asarray(x),
              jax.ShapeDtypeStruct((8, 512), jnp.float32))
  out = np.asarray(out).reshape(8, 4, 2, 64)
  want_even = (x * 2).reshape(8, 4, 64)
  want_odd = (x * 3).reshape(8, 4, 64)
  return (np.array_equal(out[:, :, 0], want_even) and
          np.array_equal(out[:, :, 1], want_odd))


if __name__ == '__main__':
  print('platform:', jax.devices()[0].platform, flush=True)
  run('bf16_static_odd_row', probe_bf16_static_odd_row)
  run('bf16_static_64lane_offset', probe_bf16_static_64lane_offset)
  run('view_matmul', probe_view_matmul)
  run('parity_interleave_store', probe_parity_interleave_store)
  print('DONE', flush=True)
