"""Unit tests for core ops (pure JAX/numpy — no TF needed)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frame_interpolation_tpu import ops


def _warp_reference(image, flow):
  """Straightforward numpy model of the documented warp semantics.

  out[b,y,x] = bilinear(image[b], y + flow[b,y,x,1], x + flow[b,y,x,0]) with
  the tfa boundary rule (floor clamped to [0, size-2], alpha to [0, 1]).
  """
  b, h, w, c = image.shape
  out = np.zeros_like(image)
  for bi in range(b):
    for y in range(h):
      for x in range(w):
        qy = y + flow[bi, y, x, 1]
        qx = x + flow[bi, y, x, 0]
        fy = min(max(np.floor(qy), 0), h - 2)
        fx = min(max(np.floor(qx), 0), w - 2)
        ay = min(max(qy - fy, 0.0), 1.0)
        ax = min(max(qx - fx, 0.0), 1.0)
        iy, ix = int(fy), int(fx)
        tl = image[bi, iy, ix]
        tr = image[bi, iy, ix + 1]
        bl = image[bi, iy + 1, ix]
        br = image[bi, iy + 1, ix + 1]
        top = tl + (tr - tl) * ax
        bot = bl + (br - bl) * ax
        out[bi, y, x] = top + (bot - top) * ay
  return out


class TestWarp:

  def test_zero_flow_is_identity(self):
    rng = np.random.RandomState(0)
    img = rng.rand(2, 8, 10, 3).astype(np.float32)
    flow = np.zeros((2, 8, 10, 2), np.float32)
    out = np.asarray(ops.backward_warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out, img, atol=1e-6)

  def test_integer_shift(self):
    rng = np.random.RandomState(1)
    img = rng.rand(1, 6, 7, 2).astype(np.float32)
    flow = np.zeros((1, 6, 7, 2), np.float32)
    flow[..., 0] = 1.0  # dx=1: out[y, x] = img[y, x+1]
    out = np.asarray(ops.backward_warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out[0, :, :-1], img[0, :, 1:], atol=1e-6)

  def test_matches_reference_semantics(self):
    rng = np.random.RandomState(2)
    img = rng.rand(2, 9, 11, 3).astype(np.float32)
    flow = (rng.rand(2, 9, 11, 2).astype(np.float32) - 0.5) * 6.0
    out = np.asarray(ops.backward_warp(jnp.asarray(img), jnp.asarray(flow)))
    ref = _warp_reference(img, flow)
    np.testing.assert_allclose(out, ref, atol=1e-5)

  def test_gradients_exist(self):
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(1, 8, 8, 2).astype(np.float32))
    flow = jnp.asarray((rng.rand(1, 8, 8, 2).astype(np.float32) - 0.5) * 2)

    def loss(im, fl):
      return jnp.sum(ops.backward_warp(im, fl)**2)

    gi, gf = jax.grad(loss, argnums=(0, 1))(img, flow)
    assert np.isfinite(np.asarray(gi)).all()
    assert np.isfinite(np.asarray(gf)).all()
    assert float(jnp.abs(gf).sum()) > 0.0


class TestPyramid:

  def test_build_image_pyramid_shapes(self):
    img = jnp.zeros((2, 64, 128, 3))
    pyr = ops.build_image_pyramid(img, 4)
    assert [p.shape for p in pyr] == [(2, 64, 128, 3), (2, 32, 64, 3),
                                      (2, 16, 32, 3), (2, 8, 16, 3)]

  def test_avg_pool_values(self):
    img = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    out = np.asarray(ops.avg_pool_2x(img))
    expected = np.array([[[2.5], [4.5]], [[10.5], [12.5]]], np.float32)
    np.testing.assert_allclose(out[0], expected)

  def test_flow_pyramid_synthesis(self):
    # Residuals of zeros except DC term: absolute flows are upsampled DC.
    dc = jnp.ones((1, 2, 2, 2))
    residuals = [jnp.zeros((1, 8, 8, 2)), jnp.zeros((1, 4, 4, 2)), dc]
    flows = ops.flow_pyramid_synthesis(residuals)
    assert [f.shape for f in flows] == [(1, 8, 8, 2), (1, 4, 4, 2),
                                        (1, 2, 2, 2)]
    # Constant flow of 1 at the coarsest level -> 2 at mid, 4 at finest.
    np.testing.assert_allclose(np.asarray(flows[1]), 2.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(flows[0]), 4.0, atol=1e-6)

  def test_multiply_pyramid(self):
    pyr = [jnp.ones((2, 4, 4, 3)), jnp.ones((2, 2, 2, 3))]
    scaled = ops.multiply_pyramid(pyr, jnp.asarray([0.5, 2.0]))
    np.testing.assert_allclose(np.asarray(scaled[0][0]), 0.5)
    np.testing.assert_allclose(np.asarray(scaled[1][1]), 2.0)


class TestTilingRoundTrip:

  def test_fold_unfold_roundtrip(self):
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.rand(1, 12, 20, 3).astype(np.float32))
    patches = ops.image_to_patches(img, (3, 4))
    assert patches.shape == (12, 4, 5, 3)
    back = ops.patches_to_image(patches, (3, 4))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(img))

  def test_patch_content_raster_order(self):
    img = jnp.arange(2 * 4 * 6 * 1, dtype=jnp.float32).reshape(1, 8, 6, 1)
    patches = ops.image_to_patches(img, (2, 3))
    # Patch k = row-major block index; patch 1 is block (0, 1).
    np.testing.assert_array_equal(
        np.asarray(patches[1]), np.asarray(img[0, 0:4, 2:4]))

  def test_pad_to_align(self):
    img = jnp.ones((1, 100, 200, 3))
    padded, bbox = ops.pad_to_align(img, 64)
    assert padded.shape == (1, 128, 256, 3)
    assert bbox == {
        'offset_height': 14, 'offset_width': 28,
        'target_height': 100, 'target_width': 200,
    }
    cropped = ops.crop_to_bounding_box(padded, **bbox)
    np.testing.assert_array_equal(np.asarray(cropped), np.asarray(img))

  def test_pad_to_align_noop(self):
    img = jnp.ones((1, 128, 64, 3))
    padded, bbox = ops.pad_to_align(img, 64)
    assert padded.shape == img.shape
    assert bbox['offset_height'] == 0 and bbox['offset_width'] == 0


class TestWarpImplDispatch:

  def test_gather_and_window_unavailable_on_cpu_auto(self):
    # 'auto' must resolve to the portable gather on CPU backends.
    from frame_interpolation_tpu.ops import warp
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 8, 16, 2), jnp.float32)
    flow = jnp.asarray((rng.rand(1, 8, 16, 2) - 0.5) * 4, jnp.float32)
    want = warp.backward_warp(img, flow)
    for impl in ('gather', 'auto'):
      got = warp.backward_warp_impl(img, flow, impl)
      np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                 atol=1e-7, err_msg=impl)

  def test_unknown_impl_raises_via_options(self):
    from frame_interpolation_tpu.options import Options
    with pytest.raises(ValueError, match='warp_impl'):
      Options.tiny(warp_impl='nope')
