"""Parity tests for the window-DMA Pallas warp (interpret mode on CPU).

Pins ops.warp_window.backward_warp_window to the XLA-gather formulation
(ops.warp.backward_warp), which is itself pinned to the reference's
tfa.dense_image_warp semantics in tests/test_ops_tf_parity.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frame_interpolation_tpu.ops import warp, warp_window


pytestmark = pytest.mark.slow  # model compiles dominate runtime


@pytest.fixture(autouse=True, params=[1, 4], ids=['g1', 'g4'])
def warp_group(request, monkeypatch):
  # Every parity case runs at both group heights: g=1 (the original
  # per-tile window) and g=4 (the tall 4-tile window, PERF.md round 3).
  monkeypatch.setenv('FI_WARP_GROUP', str(request.param))
  return request.param


def _check(img, flow, atol=1e-6):
  want = np.asarray(warp.backward_warp(jnp.asarray(img), jnp.asarray(flow)),
                    np.float32)
  got = np.asarray(
      warp_window.backward_warp_window(jnp.asarray(img), jnp.asarray(flow),
                                       True), np.float32)
  np.testing.assert_allclose(got, want, atol=atol)


class TestWarpWindowParity:

  def test_zero_flow_identity(self):
    rng = np.random.RandomState(0)
    img = rng.rand(1, 16, 24, 3).astype(np.float32)
    _check(img, np.zeros((1, 16, 24, 2), np.float32))

  @pytest.mark.parametrize('dx,dy', [(1, 0), (0, 1), (0, -3), (-2, 5),
                                     (0.5, 0.0), (0.25, -1.75)])
  def test_constant_flow(self, dx, dy):
    rng = np.random.RandomState(1)
    img = rng.rand(1, 16, 24, 3).astype(np.float32)
    flow = np.zeros((1, 16, 24, 2), np.float32) + np.array(
        [dx, dy], np.float32)
    _check(img, flow)

  @pytest.mark.parametrize('scale', [6.0, 60.0])
  def test_random_flow(self, scale):
    rng = np.random.RandomState(2)
    img = rng.rand(1, 16, 24, 3).astype(np.float32)
    flow = ((rng.rand(1, 16, 24, 2) - 0.5) * scale).astype(np.float32)
    _check(img, flow)

  def test_multi_window_tiles(self):
    # Displacement spread within tiles far beyond one 16-row/256-col window.
    rng = np.random.RandomState(3)
    img = rng.rand(2, 40, 200, 5).astype(np.float32)
    flow = ((rng.rand(2, 40, 200, 2) - 0.5) * 1000).astype(np.float32)
    _check(img, flow)

  def test_motion_boundary(self):
    # Smooth field with a hard seam: adjacent pixels differ by ~40 px.
    rng = np.random.RandomState(4)
    h, w = 32, 160
    img = rng.rand(1, h, w, 4).astype(np.float32)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    flow = np.stack([3 * np.sin(yy / 7.0), 3 * np.cos(xx / 9.0)],
                    axis=-1).astype(np.float32)[None]
    seam = ((yy + 2 * xx) % 61 < 24)[None]
    flow[seam] += np.array([40.0, -37.0], np.float32)
    _check(img, flow)

  def test_out_of_bounds_clamps_to_edges(self):
    rng = np.random.RandomState(5)
    img = rng.rand(1, 16, 24, 3).astype(np.float32)
    flow = np.zeros((1, 16, 24, 2), np.float32)
    flow[..., 0] = 100.0   # everything reads beyond the right edge
    flow[..., 1] = -100.0  # and above the top
    _check(img, flow)

  def test_non_tile_multiple_shapes(self):
    rng = np.random.RandomState(6)
    img = rng.rand(1, 13, 150, 3).astype(np.float32)
    flow = ((rng.rand(1, 13, 150, 2) - 0.5) * 10).astype(np.float32)
    _check(img, flow)

  def test_bfloat16_image(self):
    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.rand(1, 16, 24, 3), jnp.bfloat16)
    flow = jnp.asarray((rng.rand(1, 16, 24, 2) - 0.5) * 8, jnp.float32)
    want = warp.backward_warp(img, flow)
    got = warp_window.backward_warp_window(img, flow, True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=1e-2)

  def test_gradients_match_xla_warp(self):
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
    np.testing.assert_allclose(np.asarray(gi_w), np.asarray(gi_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf_w), np.asarray(gf_x), atol=1e-5)


class TestGroupEnvValidation:

  @pytest.mark.parametrize('bad', ['0', '-1', 'four', ''])
  def test_rejects_invalid_group(self, bad, monkeypatch):
    monkeypatch.setenv('FI_WARP_GROUP', bad)
    with pytest.raises(ValueError, match='FI_WARP_GROUP'):
      warp_window._group_from_env()

  def test_default_and_valid_values(self, monkeypatch):
    monkeypatch.delenv('FI_WARP_GROUP', raising=False)
    assert warp_window._group_from_env() == 4
    monkeypatch.setenv('FI_WARP_GROUP', '1')
    assert warp_window._group_from_env() == 1

  def test_channel_block_scales_down_with_tall_groups(self):
    # The on-chip-exercised points stay pinned...
    assert warp_window._max_channel_block(jnp.float32, 1) == 144
    assert warp_window._max_channel_block(jnp.bfloat16, 4) == 144
    assert warp_window._max_channel_block(jnp.float32, 4) == 96
    # ...and taller groups shrink the block so scratch VMEM never exceeds
    # the g=4 budget (ADVICE round 3: g>=5 bf16 at cb=144 would need
    # ~19+ MB against the 16 MB default limit).
    for dtype in (jnp.float32, jnp.bfloat16):
      budget = (warp_window._max_channel_block(dtype, 4)
                * warp_window._scratch_bytes_per_channel(dtype, 4))
      for g in (5, 6, 8, 16):
        cb = warp_window._max_channel_block(dtype, g)
        assert cb >= 8
        assert (cb * warp_window._scratch_bytes_per_channel(dtype, g)
                <= budget)

  def test_tall_group_parity(self, monkeypatch):
    # A g beyond the hardware-exercised {1, 4} still computes exactly
    # (interpret mode): the walk machinery is g-independent.
    monkeypatch.setenv('FI_WARP_GROUP', '6')
    rng = np.random.RandomState(11)
    img = rng.rand(1, 56, 150, 3).astype(np.float32)
    flow = ((rng.rand(1, 56, 150, 2) - 0.5) * 30).astype(np.float32)
    _check(img, flow)


class TestRowSlabForward:
  """The row_offset slab variant (spatial-sharding support)."""

  @pytest.mark.parametrize('r0', [0, 8, 24])
  def test_slab_matches_full_rows(self, r0):
    # Warping a slab of output rows against the full source must equal
    # the corresponding rows of the full warp bit for bit (same taps,
    # same clamps; only the query grid is offset).
    rng = np.random.RandomState(13)
    img = jnp.asarray(rng.rand(2, 40, 136, 5), jnp.float32)
    flow = jnp.asarray((rng.rand(2, 40, 136, 2) - 0.5) * 25, jnp.float32)
    full = warp_window._forward(img, flow, True, g=1)
    slab = warp_window._forward(img, flow[:, r0:r0 + 8], True, g=1,
                                row_offset=r0)
    np.testing.assert_array_equal(np.asarray(slab),
                                  np.asarray(full[:, r0:r0 + 8]))

  def test_slab_out_of_bounds_clamps_to_full_frame(self):
    # A slab in the middle of the frame with flows pointing far outside
    # it must clamp against the FULL frame edges, not the slab's.
    rng = np.random.RandomState(14)
    img = jnp.asarray(rng.rand(1, 48, 130, 3), jnp.float32)
    flow = jnp.asarray((rng.rand(1, 48, 130, 2) - 0.5) * 300, jnp.float32)
    full = np.asarray(warp.backward_warp(img, flow))
    slab = warp_window._forward(img, flow[:, 16:32], True, g=1,
                                row_offset=16)
    np.testing.assert_allclose(np.asarray(slab), full[:, 16:32], atol=1e-6)

  def test_traced_row_offset(self):
    # row_offset arrives as a traced scalar under shard_map (axis_index).
    rng = np.random.RandomState(15)
    img = jnp.asarray(rng.rand(1, 32, 132, 3), jnp.float32)
    flow = jnp.asarray((rng.rand(1, 32, 132, 2) - 0.5) * 9, jnp.float32)
    full = warp_window._forward(img, flow, True, g=1)

    def slab_at(r0):
      return warp_window._forward(img, flow[:, 8:16], True, g=1,
                                  row_offset=r0)

    got = jax.jit(slab_at)(jnp.int32(8))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(full[:, 8:16]))


def test_pair_impl_matches_separate_calls(monkeypatch):
  # backward_warp_pair_impl's batched window path must reproduce two
  # separate per-direction kernel calls bit for bit (the kernel computes
  # each output tile independently; batch concat only widens the grid).
  rng = np.random.RandomState(9)
  img0 = jnp.asarray(rng.rand(1, 24, 150, 5), jnp.float32)
  img1 = jnp.asarray(rng.rand(1, 24, 150, 5), jnp.float32)
  f0 = jnp.asarray((rng.rand(1, 24, 150, 2) - 0.5) * 9, jnp.float32)
  f1 = jnp.asarray((rng.rand(1, 24, 150, 2) - 0.5) * 9, jnp.float32)

  b = img0.shape[0]
  both = warp_window.backward_warp_window(
      jnp.concatenate([img0, img1]), jnp.concatenate([f0, f1]), True)
  sep0 = warp_window.backward_warp_window(img0, f0, True)
  sep1 = warp_window.backward_warp_window(img1, f1, True)
  np.testing.assert_array_equal(np.asarray(both[:b]), np.asarray(sep0))
  np.testing.assert_array_equal(np.asarray(both[b:]), np.asarray(sep1))


class TestPlanesVjp:
  """The emit_planes kernel mode and the window warp's planes backward.

  The round-5 profile showed the round-4 backward (delegate to the
  gather formulation's VJP) re-paying two serialized XLA gathers per
  site (~55 ms of a 305 ms bs8/256px train step); the backward now
  computes du/dv with the window machinery itself and must match the
  gather formulation's planes and gradients exactly.
  """

  def test_planes_match_raw_and_planes(self):
    rng = np.random.RandomState(3)
    for dtype, atol in [(jnp.float32, 1e-5), (jnp.bfloat16, 1 / 64)]:
      img = jnp.asarray(rng.rand(2, 40, 256, 5), dtype)
      flow = jnp.asarray(rng.randn(2, 40, 256, 2) * 6.0, jnp.float32)
      # Exact-integer offsets (clip-gradient tie rule) and far
      # out-of-bounds queries (zero clip gradient) in the same batch.
      flow = flow.at[:, :4].set(jnp.round(flow[:, :4]))
      flow = flow.at[:, 4:6].set(500.0)
      flow = flow.at[:, 6:8].set(-500.0)
      _, du_ref, dv_ref = warp._raw_and_planes(img, flow)
      du, dv = warp_window._forward(img, flow, True,
                                    g=warp_window._group_from_env(),
                                    emit_planes=True)
      np.testing.assert_allclose(np.asarray(du, np.float32),
                                 np.asarray(du_ref, np.float32), atol=atol)
      np.testing.assert_allclose(np.asarray(dv, np.float32),
                                 np.asarray(dv_ref, np.float32), atol=atol)

  def test_grads_match_gather_vjp(self):
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.rand(2, 32, 256, 4), jnp.float32)
    flow = jnp.asarray(rng.randn(2, 32, 256, 2) * 5.0, jnp.float32)
    ct = jnp.asarray(rng.randn(2, 32, 256, 4), jnp.float32)

    gi_w, gf_w = jax.grad(
        lambda i, f: jnp.sum(warp_window.backward_warp_window(i, f, True)
                             * ct), argnums=(0, 1))(img, flow)
    gi_r, gf_r = jax.grad(
        lambda i, f: jnp.sum(warp.backward_warp(i, f) * ct),
        argnums=(0, 1))(img, flow)
    np.testing.assert_allclose(np.asarray(gi_w), np.asarray(gi_r),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf_w), np.asarray(gf_r),
                               atol=1e-4)

  def test_regather_mode_matches_planes_mode(self, monkeypatch):
    # FI_WARP_WINBWD=regather keeps the round-4 backward as the A/B
    # control; both must produce the same gradients.
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.rand(1, 24, 256, 3), jnp.float32)
    flow = jnp.asarray(rng.randn(1, 24, 256, 2) * 4.0, jnp.float32)
    ct = jnp.asarray(rng.randn(1, 24, 256, 3), jnp.float32)

    def grads():
      return jax.grad(
          lambda i, f: jnp.sum(warp_window.backward_warp_window(i, f, True)
                               * ct), argnums=(0, 1))(img, flow)

    gi_p, gf_p = grads()
    monkeypatch.setattr(warp_window, '_WINBWD_MODE', 'regather')
    gi_r, gf_r = grads()
    np.testing.assert_allclose(np.asarray(gi_p), np.asarray(gi_r),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_r),
                               atol=1e-4)

  def test_planes_channel_blocking(self, monkeypatch):
    # Multiple channel blocks (ci grid dim) in planes mode: same du/dv.
    rng = np.random.RandomState(6)
    img = jnp.asarray(rng.rand(1, 16, 128, 5), jnp.float32)
    flow = jnp.asarray(rng.randn(1, 16, 128, 2) * 3.0, jnp.float32)
    _, du_ref, dv_ref = warp._raw_and_planes(img, flow)
    monkeypatch.setattr(warp_window, '_max_channel_block',
                        lambda *a, **k: 2)
    du, dv = warp_window._forward(img, flow, True,
                                  g=warp_window._group_from_env(),
                                  emit_planes=True)
    np.testing.assert_allclose(np.asarray(du), np.asarray(du_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               atol=1e-5)
