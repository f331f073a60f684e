#!/usr/bin/env python
"""Headline benchmark: interpolated 1080p frames/sec on one chip.

Runs the released-size film_net forward (random weights — identical FLOPs
to trained ones) on 1920x1080 inputs, padded to 1920x1088 inside the jitted
program, and reports sustained interpolated frames per second per chip
against the BASELINE.json north star of 30 fps.

Prints exactly one JSON line:
  {"metric": "1080p_frames_per_sec_per_chip", "value": N, "unit": "fps",
   "vs_baseline": N/30}

Measurement notes (important on remote-tunneled TPU devices, where
block_until_ready does not actually await completion and per-call D2H
fetches can stall):
  * ITERS forward passes run INSIDE one jitted lax.fori_loop, each chained
    on the previous output, so the device cannot overlap or elide them;
  * the program returns a single scalar (mean of the final frame), so one
    tiny fetch forces completion of everything;
  * the minimum over TRIALS filters transient tunnel stalls.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 30.0


def main():
  import jax
  import jax.numpy as jnp
  import numpy as np

  from frame_interpolation_tpu.models.film_net import FilmNet, init_params
  from frame_interpolation_tpu.ops import tiling
  from frame_interpolation_tpu.options import Options

  # bf16 conv compute with f32 flow math: the TPU-native serving config.
  dtype_policy = os.environ.get('BENCH_DTYPE', 'bfloat16')
  batch = int(os.environ.get('BENCH_BATCH', '1'))
  iters = int(os.environ.get('BENCH_ITERS', '24'))
  trials = int(os.environ.get('BENCH_TRIALS', '3'))
  height = int(os.environ.get('BENCH_HEIGHT', '1080'))
  width = int(os.environ.get('BENCH_WIDTH', '1920'))

  options = Options.film_net_released(dtype_policy=dtype_policy,
                                      use_aux_outputs=False)
  model = FilmNet(options)
  params = init_params(model, jax.random.PRNGKey(0))
  align = 64

  def one_frame(params, x0, x1, time_value):
    x0p, bbox = tiling.pad_to_align(x0, align)
    x1p, _ = tiling.pad_to_align(x1, align)
    image = model.apply({'params': params}, x0p, x1p, time_value)['image']
    return tiling.crop_to_bounding_box(image, **bbox)

  @jax.jit
  def bench_loop(params, x0, x1, time_value):
    def body(_, carry):
      a, b = carry
      mid = one_frame(params, a, b, time_value)
      # Chain: the next call depends on this output; no overlap/elision.
      return (mid, b)

    final, _ = jax.lax.fori_loop(0, iters, body, (x0, x1))
    return jnp.mean(final.astype(jnp.float32))

  rng = np.random.RandomState(0)
  x0 = jax.device_put(rng.rand(batch, height, width, 3).astype(np.float32))
  x1 = jax.device_put(rng.rand(batch, height, width, 3).astype(np.float32))
  tv = jax.device_put(np.full((batch, 1), 0.5, np.float32))

  # Warmup: compiles and forces one full execution via the scalar fetch.
  float(bench_loop(params, x0, x1, tv))

  best = float('inf')
  for _ in range(trials):
    start = time.perf_counter()
    value = float(bench_loop(params, x0, x1, tv))
    elapsed = time.perf_counter() - start
    assert np.isfinite(value)
    best = min(best, elapsed)

  fps = batch * iters / best
  print(json.dumps({
      'metric': '1080p_frames_per_sec_per_chip',
      'value': round(fps, 3),
      'unit': 'fps',
      'vs_baseline': round(fps / BASELINE_FPS, 3),
  }))


if __name__ == '__main__':
  main()
