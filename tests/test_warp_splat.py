"""Parity tests for the window-splat warp adjoint (interpret mode on CPU).

Pins ops.warp_splat.backward_warp_splat — the scatter-free image-gradient
of backward warping — to jax.vjp of the XLA-gather formulation
(ops.warp.backward_warp), and the full window-warp VJP to the XLA VJP.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frame_interpolation_tpu.ops import warp, warp_splat, warp_window

pytestmark = pytest.mark.slow  # pallas interpret compiles dominate runtime


def _splat_check(g, flow, img, atol=1e-5):
  _, vjp = jax.vjp(lambda i: warp.backward_warp(i, jnp.asarray(flow)),
                   jnp.asarray(img))
  want, = vjp(jnp.asarray(g))
  got = warp_splat.backward_warp_splat(jnp.asarray(g), jnp.asarray(flow),
                                       interpret=True)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=atol)


class TestWarpSplatParity:

  def test_zero_flow_is_identity(self):
    rng = np.random.RandomState(0)
    g = rng.rand(1, 16, 24, 3).astype(np.float32)
    flow = np.zeros((1, 16, 24, 2), np.float32)
    got = warp_splat.backward_warp_splat(jnp.asarray(g), jnp.asarray(flow),
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), g, atol=1e-6)

  @pytest.mark.parametrize('dx,dy', [(1, 0), (0, 1), (-2, 0), (0, -3),
                                     (0.5, 0.25), (-1.75, 0.5)])
  def test_constant_flow(self, dx, dy):
    rng = np.random.RandomState(1)
    img = rng.rand(1, 16, 24, 3).astype(np.float32)
    g = rng.rand(1, 16, 24, 3).astype(np.float32)
    flow = np.zeros((1, 16, 24, 2), np.float32) + np.array(
        [dx, dy], np.float32)
    _splat_check(g, flow, img)

  @pytest.mark.parametrize('scale', [6.0, 60.0])
  def test_random_flow(self, scale):
    rng = np.random.RandomState(2)
    img = rng.rand(2, 40, 200, 5).astype(np.float32)
    g = rng.rand(2, 40, 200, 5).astype(np.float32)
    flow = ((rng.rand(2, 40, 200, 2) - 0.5) * scale).astype(np.float32)
    _splat_check(g, flow, img, atol=5e-5)

  def test_large_displacement_multi_window(self):
    rng = np.random.RandomState(3)
    img = rng.rand(1, 32, 160, 4).astype(np.float32)
    g = rng.rand(1, 32, 160, 4).astype(np.float32)
    flow = ((rng.rand(1, 32, 160, 2) - 0.5) * 1000).astype(np.float32)
    _splat_check(g, flow, img, atol=5e-4)

  def test_out_of_bounds_clamps(self):
    rng = np.random.RandomState(4)
    img = rng.rand(1, 16, 24, 3).astype(np.float32)
    g = rng.rand(1, 16, 24, 3).astype(np.float32)
    flow = np.zeros((1, 16, 24, 2), np.float32)
    flow[..., 0] = 100.0
    flow[..., 1] = -100.0
    # Every output pixel clamps onto the same corner: hundreds of terms
    # accumulate there, so f32 summation order costs a few ULP more.
    _splat_check(g, flow, img, atol=1e-3)

  def test_non_tile_multiple_shapes(self):
    rng = np.random.RandomState(5)
    img = rng.rand(1, 13, 150, 3).astype(np.float32)
    g = rng.rand(1, 13, 150, 3).astype(np.float32)
    flow = ((rng.rand(1, 13, 150, 2) - 0.5) * 10).astype(np.float32)
    _splat_check(g, flow, img)


class TestMatmulSplatParity:
  """backward_warp_splat_small: the dense-matmul splat for coarse levels."""

  def _check(self, g, flow, img, atol=1e-5):
    _, vjp = jax.vjp(lambda i: warp.backward_warp(i, jnp.asarray(flow)),
                     jnp.asarray(img))
    want, = vjp(jnp.asarray(g))
    got = warp_splat.backward_warp_splat_small(jnp.asarray(g),
                                               jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=atol)

  def test_zero_flow_is_identity(self):
    rng = np.random.RandomState(0)
    g = rng.rand(2, 8, 16, 3).astype(np.float32)
    flow = np.zeros((2, 8, 16, 2), np.float32)
    got = warp_splat.backward_warp_splat_small(jnp.asarray(g),
                                               jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(got), g, atol=1e-6)

  @pytest.mark.parametrize('scale', [3.0, 30.0, 1000.0])
  def test_random_flow(self, scale):
    # 1000.0 clamps everything onto edge corners (the tfa boundary rule).
    rng = np.random.RandomState(2)
    img = rng.rand(2, 16, 24, 5).astype(np.float32)
    g = rng.rand(2, 16, 24, 5).astype(np.float32)
    flow = ((rng.rand(2, 16, 24, 2) - 0.5) * scale).astype(np.float32)
    self._check(g, flow, img, atol=1e-3 if scale > 100 else 1e-5)

  def test_train_coarse_level_shape(self):
    # The shapes this path actually serves: 32x32x960 etc at bs8 crops.
    rng = np.random.RandomState(3)
    img = rng.rand(2, 32, 32, 17).astype(np.float32)
    g = rng.rand(2, 32, 32, 17).astype(np.float32)
    flow = ((rng.rand(2, 32, 32, 2) - 0.5) * 12).astype(np.float32)
    self._check(g, flow, img)

  def test_bf16_cotangent(self):
    rng = np.random.RandomState(4)
    flow = jnp.asarray(((rng.rand(1, 16, 16, 2) - 0.5) * 8).astype(
        np.float32))
    g16 = jnp.asarray(rng.rand(1, 16, 16, 4), jnp.bfloat16)
    got = warp_splat.backward_warp_splat_small(g16, flow)
    want = warp_splat.backward_warp_splat_small(
        g16.astype(jnp.float32), flow)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


class TestResidentSplatParity:
  """backward_warp_splat_resident: VMEM-resident accumulator variant."""

  def _check(self, g, flow, img, atol=1e-5):
    _, vjp = jax.vjp(lambda i: warp.backward_warp(i, jnp.asarray(flow)),
                     jnp.asarray(img))
    want, = vjp(jnp.asarray(g))
    got = warp_splat.backward_warp_splat_resident(
        jnp.asarray(g), jnp.asarray(flow), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=atol)

  def test_zero_flow_is_identity(self):
    rng = np.random.RandomState(0)
    g = rng.rand(1, 16, 24, 3).astype(np.float32)
    flow = np.zeros((1, 16, 24, 2), np.float32)
    got = warp_splat.backward_warp_splat_resident(
        jnp.asarray(g), jnp.asarray(flow), interpret=True)
    np.testing.assert_allclose(np.asarray(got), g, atol=1e-6)

  @pytest.mark.parametrize('scale', [6.0, 60.0])
  def test_random_flow(self, scale):
    rng = np.random.RandomState(2)
    img = rng.rand(2, 40, 200, 5).astype(np.float32)
    g = rng.rand(2, 40, 200, 5).astype(np.float32)
    flow = ((rng.rand(2, 40, 200, 2) - 0.5) * scale).astype(np.float32)
    self._check(g, flow, img, atol=5e-5)

  def test_multi_column_tile_crossing(self):
    # Contributions crossing the 128-lane column-tile boundary exercise
    # the static j-tile distribution.
    rng = np.random.RandomState(3)
    img = rng.rand(1, 16, 260, 4).astype(np.float32)
    g = rng.rand(1, 16, 260, 4).astype(np.float32)
    flow = np.zeros((1, 16, 260, 2), np.float32)
    flow[..., 0] = 64.0  # push every column across a tile boundary
    flow[..., 1] = -3.25
    # ~65 columns clamp onto the right edge: summation order there costs
    # a bit over the usual 1e-5.
    self._check(g, flow, img, atol=1e-4)

  def test_out_of_bounds_clamps(self):
    rng = np.random.RandomState(4)
    img = rng.rand(1, 16, 24, 3).astype(np.float32)
    g = rng.rand(1, 16, 24, 3).astype(np.float32)
    flow = np.zeros((1, 16, 24, 2), np.float32)
    flow[..., 0] = 100.0
    flow[..., 1] = -100.0
    self._check(g, flow, img, atol=1e-3)

  def test_channel_blocking(self):
    # Channels above _MAX_CHANNEL_BLOCK force cp//cb > 1 grid steps.
    rng = np.random.RandomState(5)
    c = warp_splat._MAX_CHANNEL_BLOCK + 5
    img = rng.rand(1, 16, 128, c).astype(np.float32)
    g = rng.rand(1, 16, 128, c).astype(np.float32)
    flow = ((rng.rand(1, 16, 128, 2) - 0.5) * 10).astype(np.float32)
    self._check(g, flow, img)


class TestWindowWarpVjp:

  def test_full_vjp_matches_xla(self):
    # The window kernel's custom VJP = splat kernel (image) + XLA
    # weight-path (flow); both must match the end-to-end XLA autodiff.
    rng = np.random.RandomState(8)
    img = jnp.asarray(rng.rand(1, 16, 24, 2), jnp.float32)
    flow = jnp.asarray((rng.rand(1, 16, 24, 2) - 0.5) * 5, jnp.float32)

    def loss_win(img, flow):
      out = warp_window.backward_warp_window(img, flow, True)
      return jnp.sum(out * out)

    def loss_xla(img, flow):
      out = warp.backward_warp(img, flow)
      return jnp.sum(out * out)

    gi_w, gf_w = jax.grad(loss_win, argnums=(0, 1))(img, flow)
    gi_x, gf_x = jax.grad(loss_xla, argnums=(0, 1))(img, flow)
    np.testing.assert_allclose(np.asarray(gi_w), np.asarray(gi_x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf_w), np.asarray(gf_x),
                               atol=1e-5)


class TestDerivPlaneFlowCotangent:

  def test_custom_vjp_matches_raw_autodiff(self):
    # backward_warp's flow cotangent is a multiply-reduce over derivative
    # planes saved by the forward (jax.linearize residuals); pin both
    # cotangents against XLA's plain autodiff of the un-customized gather
    # formulation, including clamped (out-of-bounds) queries where the
    # derivative is zero.
    rng = np.random.RandomState(11)
    img = jnp.asarray(rng.rand(2, 12, 20, 3), jnp.float32)
    flow = jnp.asarray((rng.rand(2, 12, 20, 2) - 0.5) * 30, jnp.float32)

    def loss_custom(img, flow):
      out = warp.backward_warp(img, flow)
      return jnp.sum(out * jnp.cos(out))

    def loss_raw(img, flow):
      out = warp._backward_warp_raw(img, flow)
      return jnp.sum(out * jnp.cos(out))

    gi_c, gf_c = jax.grad(loss_custom, argnums=(0, 1))(img, flow)
    gi_r, gf_r = jax.grad(loss_raw, argnums=(0, 1))(img, flow)
    np.testing.assert_allclose(np.asarray(gf_c), np.asarray(gf_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gi_c), np.asarray(gi_r),
                               rtol=1e-5, atol=1e-5)
