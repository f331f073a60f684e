#!/usr/bin/env python
"""Probes Mosaic capabilities needed by the two-level warp kernel redesign.

Each probe compiles a tiny Pallas kernel on the real TPU and checks
correctness against numpy. Results drive the kernel design (PERF.md):
  1. unaligned dynamic sublane-start load from a VMEM ref
  2. pltpu.roll with a dynamic (traced) shift
  3. take_along_axis whose operand spans >1 lane tile (8, 256)
  4. dynamic aligned lane-start load (8, 128) out of (8, 384)

Run on the axon TPU:  python experiments/probe_mosaic.py
"""
import functools
import os
import sys
import traceback

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
  except Exception as e:  # noqa: BLE001 - probe must report, not die
    msg = str(e).replace(chr(10), ' | ')[:300]
    print(f'PROBE {name}: FAIL {type(e).__name__}: {msg}', flush=True)


def _scalar_smem_call(kernel, out_shape, d, x):
  return pl.pallas_call(
      kernel,
      in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
      out_shape=out_shape,
  )(d, x)


def probe_unaligned_sublane_load():
  def kernel(d_ref, x_ref, o_ref):
    o_ref[:] = x_ref[pl.ds(d_ref[0], 8), :]

  x = np.arange(64 * 128, dtype=np.float32).reshape(64, 128)
  d = np.array([5], np.int32)
  out = _scalar_smem_call(
      kernel, jax.ShapeDtypeStruct((8, 128), jnp.float32), d, x)
  return np.array_equal(np.asarray(out), x[5:13])


def probe_dynamic_roll():
  def kernel(d_ref, x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[:], shift=d_ref[0], axis=0)

  x = np.arange(16 * 128, dtype=np.float32).reshape(16, 128)
  d = np.array([5], np.int32)
  out = _scalar_smem_call(
      kernel, jax.ShapeDtypeStruct((16, 128), jnp.float32), d, x)
  # pltpu.roll == np.roll(+shift) on Mosaic AND the interpret fallback.
  # (An earlier revision expected np.roll(-5) and recorded WRONG-RESULT;
  # the lane_roll probe below can't tell directions apart because its
  # shift is congruent to the negative shift mod width.)
  return np.array_equal(np.asarray(out), np.roll(x, 5, axis=0))


def probe_wide_take_along_axis():
  def kernel(i_ref, x_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

  rng = np.random.RandomState(0)
  x = rng.rand(8, 256).astype(np.float32)
  idx = rng.randint(0, 256, size=(8, 128)).astype(np.int32)
  out = jax.jit(lambda i, x: pl.pallas_call(
      kernel,
      in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
  )(i, x))(idx, x)
  want = np.take_along_axis(x, idx, axis=1)
  got = np.asarray(out)
  if not np.array_equal(got, want):
    bad = got != want
    # Diagnose: does it wrap mod 128 (reads from the first lane tile only)?
    wrapped = np.take_along_axis(x[:, :128], idx % 128, axis=1)
    print('  wide_take mismatches:', bad.sum(), 'of', bad.size,
          '| matches idx%%128 read: %s' % np.array_equal(got, wrapped),
          flush=True)
    return False
  return True


def probe_dynamic_lane_start_load():
  def kernel(d_ref, x_ref, o_ref):
    o_ref[:] = x_ref[:, pl.ds(d_ref[0] * 128, 128)]

  x = np.arange(8 * 384, dtype=np.float32).reshape(8, 384)
  d = np.array([2], np.int32)
  out = _scalar_smem_call(
      kernel, jax.ShapeDtypeStruct((8, 128), jnp.float32), d, x)
  return np.array_equal(np.asarray(out), x[:, 256:])


def probe_unaligned_lane_start_load():
  def kernel(d_ref, x_ref, o_ref):
    o_ref[:] = x_ref[:, pl.ds(d_ref[0], 128)]

  x = np.arange(8 * 384, dtype=np.float32).reshape(8, 384)
  d = np.array([37], np.int32)
  out = _scalar_smem_call(
      kernel, jax.ShapeDtypeStruct((8, 128), jnp.float32), d, x)
  return np.array_equal(np.asarray(out), x[:, 37:165])


def probe_lane_roll_dynamic_wide():
  def kernel(d_ref, x_ref, o_ref):
    r = pltpu.roll(x_ref[:], shift=d_ref[0], axis=1)
    o_ref[:] = r[:, 0:128]

  x = np.arange(16 * 256, dtype=np.float32).reshape(16, 256)
  d = np.array([256 - 37], np.int32)  # recenter so col 37 lands at lane 0
  out = _scalar_smem_call(
      kernel, jax.ShapeDtypeStruct((16, 128), jnp.float32), d, x)
  return np.array_equal(np.asarray(out), x[:, 37:165])


def probe_bf16_unaligned_sublane_load():
  def kernel(d_ref, x_ref, o_ref):
    o_ref[:] = x_ref[pl.ds(d_ref[0], 8), :]

  x = np.arange(64 * 128, dtype=np.float32).reshape(64, 128)
  d = np.array([5], np.int32)
  out = _scalar_smem_call(
      kernel, jax.ShapeDtypeStruct((8, 128), jnp.bfloat16), d,
      jnp.asarray(x, jnp.bfloat16))
  return np.array_equal(np.asarray(out, np.float32),
                        np.asarray(jnp.asarray(x, jnp.bfloat16),
                                   np.float32)[5:13])


def probe_bf16_take_along_axis():
  def kernel(i_ref, x_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

  rng = np.random.RandomState(0)
  x = jnp.asarray(rng.rand(16, 128), jnp.bfloat16)
  idx = rng.randint(0, 128, size=(16, 128)).astype(np.int32)
  out = pl.pallas_call(
      kernel,
      in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((16, 128), jnp.bfloat16),
  )(idx, x)
  return np.array_equal(np.asarray(out, np.float32),
                        np.take_along_axis(np.asarray(x, np.float32), idx,
                                           axis=1))


if __name__ == '__main__':
  print('platform:', jax.devices()[0].platform, flush=True)
  run('unaligned_sublane_load', probe_unaligned_sublane_load)
  run('dynamic_roll', probe_dynamic_roll)
  run('wide_take_along_axis', probe_wide_take_along_axis)
  run('dynamic_lane_start_load', probe_dynamic_lane_start_load)
  run('unaligned_lane_start_load', probe_unaligned_lane_start_load)
  run('lane_roll_dynamic_wide', probe_lane_roll_dynamic_wide)
  run('bf16_unaligned_sublane_load', probe_bf16_unaligned_sublane_load)
  run('bf16_take_along_axis', probe_bf16_take_along_axis)
  print('DONE', flush=True)


