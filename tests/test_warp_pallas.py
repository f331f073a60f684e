"""Parity tests for the Pallas warp kernel (interpreter mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from frame_interpolation_tpu.ops.warp import backward_warp
from frame_interpolation_tpu.ops.warp_pallas import (backward_warp_pallas,
                                                     max_channel_block)


pytestmark = pytest.mark.slow  # model compiles dominate runtime

@pytest.mark.parametrize('shape,max_flow', [
    ((1, 16, 128, 3), 6),
    ((2, 24, 256, 5), 30),     # non-multiple H, cross-tile x
    ((1, 64, 128, 8), 100),    # clamping far out of bounds
    ((1, 8, 140, 1), 4),       # W padding
])
def test_matches_xla_gather(shape, max_flow):
  rng = np.random.RandomState(0)
  b, h, w, c = shape
  image = jnp.asarray(rng.rand(*shape).astype(np.float32))
  flow = jnp.asarray(
      (rng.rand(b, h, w, 2).astype(np.float32) * 2 - 1) * max_flow)
  ref = np.asarray(backward_warp(image, flow))
  out = np.asarray(backward_warp_pallas(image, flow, interpret=True))
  np.testing.assert_allclose(out, ref, atol=2e-6)


def test_zero_flow_is_identity():
  rng = np.random.RandomState(1)
  image = jnp.asarray(rng.rand(1, 16, 128, 4).astype(np.float32))
  flow = jnp.zeros((1, 16, 128, 2), jnp.float32)
  out = np.asarray(backward_warp_pallas(image, flow, interpret=True))
  np.testing.assert_allclose(out, np.asarray(image), atol=1e-6)


def test_channel_block_sizing():
  # Full-HD bf16 plane fits (barely); f32 does not at block 2.
  assert max_channel_block(1080, 1920, 2) >= 1
  assert max_channel_block(1080, 1920, 4) < 2
  assert max_channel_block(68, 120, 4) >= 8
