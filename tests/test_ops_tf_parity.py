"""Bit-parity tests of core ops against TensorFlow's implementations.

These pin our TPU-native ops to the exact numerical semantics the reference
(google-research/frame-interpolation) gets from TF2 — the SURVEY.md §7 'hard
parts' list ranks these parity landmines first.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from frame_interpolation_tpu import ops

tf = pytest.importorskip('tensorflow')


def _rand(*shape, seed=0):
  return np.random.RandomState(seed).rand(*shape).astype(np.float32)


class TestResize:

  @pytest.mark.parametrize('shape,target', [
      ((2, 8, 12, 3), (16, 24)),   # exact 2x (flow upsampling path)
      ((1, 7, 9, 2), (14, 18)),    # exact 2x, odd input
      ((1, 16, 24, 3), (8, 12)),   # downscale
      ((2, 10, 10, 1), (23, 17)),  # arbitrary
  ])
  def test_bilinear_matches_tf(self, shape, target):
    x = _rand(*shape)
    ours = np.asarray(ops.resize_bilinear(jnp.asarray(x), target))
    theirs = tf.image.resize(x, target).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)

  @pytest.mark.parametrize('shape,target', [
      ((2, 8, 12, 3), (16, 24)),
      ((1, 5, 6, 4), (15, 13)),
      ((1, 16, 24, 3), (7, 9)),
  ])
  def test_nearest_matches_tf(self, shape, target):
    x = _rand(*shape, seed=1)
    ours = np.asarray(ops.resize_nearest(jnp.asarray(x), target))
    theirs = tf.image.resize(
        x, target, method=tf.image.ResizeMethod.NEAREST_NEIGHBOR).numpy()
    np.testing.assert_array_equal(ours, theirs)


class TestAvgPool:

  def test_matches_keras_avg_pool(self):
    x = _rand(2, 9, 13, 5, seed=2)  # odd sizes exercise VALID truncation
    ours = np.asarray(ops.avg_pool_2x(jnp.asarray(x)))
    theirs = tf.keras.layers.AveragePooling2D(
        pool_size=2, strides=2, padding='valid')(x).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


class TestMetrics:

  def test_ssim_matches_tf(self):
    a = _rand(2, 33, 47, 3, seed=3)
    b = np.clip(a + 0.1 * _rand(2, 33, 47, 3, seed=4) - 0.05, 0, 1)
    ours = np.asarray(ops.ssim(jnp.asarray(a), jnp.asarray(b), max_val=1.0))
    theirs = tf.image.ssim(a, b, max_val=1.0).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)

  def test_psnr_matches_tf(self):
    a = _rand(3, 16, 16, 3, seed=5)
    b = _rand(3, 16, 16, 3, seed=6)
    ours = np.asarray(ops.psnr(jnp.asarray(a), jnp.asarray(b), max_val=1.0))
    theirs = tf.image.psnr(a, b, max_val=1.0).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-3)


class TestTiling:

  def _reference_patches(self, image, block_shape):
    """The reference space_to_batch recipe (eval/interpolator.py:66-99)."""
    block_height, block_width = block_shape
    num_blocks = block_height * block_width
    height, width, channel = image.shape[-3:]
    patch_height, patch_width = height // block_height, width // block_width
    patch_size = patch_height * patch_width
    paddings = 2 * [[0, 0]]
    patches = tf.space_to_batch(image, [patch_height, patch_width], paddings)
    patches = tf.split(patches, patch_size, 0)
    patches = tf.stack(patches, axis=3)
    patches = tf.reshape(patches,
                         [num_blocks, patch_height, patch_width, channel])
    return patches.numpy()

  def _reference_unpatch(self, patches, block_shape):
    block_height, block_width = block_shape
    paddings = 2 * [[0, 0]]
    patch_height, patch_width, channel = patches.shape[-3:]
    patch_size = patch_height * patch_width
    patches = tf.reshape(patches,
                         [1, block_height, block_width, patch_size, channel])
    patches = tf.split(patches, patch_size, axis=3)
    patches = tf.stack(patches, axis=0)
    patches = tf.reshape(patches,
                         [patch_size, block_height, block_width, channel])
    image = tf.batch_to_space(patches, [patch_height, patch_width], paddings)
    return image.numpy()

  @pytest.mark.parametrize('block_shape', [(1, 2), (2, 2), (3, 4)])
  def test_image_to_patches_matches_reference(self, block_shape):
    x = _rand(1, 12, 24, 3, seed=7)
    ours = np.asarray(ops.image_to_patches(jnp.asarray(x), block_shape))
    theirs = self._reference_patches(x, block_shape)
    np.testing.assert_array_equal(ours, theirs)

  @pytest.mark.parametrize('block_shape', [(1, 2), (2, 2), (3, 4)])
  def test_patches_to_image_matches_reference(self, block_shape):
    bh, bw = block_shape
    patches = _rand(bh * bw, 4, 6, 3, seed=8)
    ours = np.asarray(ops.patches_to_image(jnp.asarray(patches), block_shape))
    theirs = self._reference_unpatch(patches, block_shape)
    np.testing.assert_array_equal(ours, theirs)


class TestWarpGradients:
  """Warp GRADIENT parity: training flows through the warp's backward.

  Compares JAX autodiff of ops.warp.backward_warp against TF GradientTape
  over the oracle's dense_image_warp implementation (same math, tfa
  boundary semantics) for both the image and the flow inputs.
  """

  def test_grads_match_tf(self):
    import jax
    import jax.numpy as jnp
    import tf_oracle
    from frame_interpolation_tpu.ops import warp as warp_ops

    rng = np.random.RandomState(0)
    image = rng.rand(2, 9, 11, 3).astype(np.float32)
    # Keep queries away from exact integers so clamp kinks don't make the
    # subgradient ambiguous between implementations.
    flow = ((rng.rand(2, 9, 11, 2).astype(np.float32) * 4 - 2) + 0.3)
    cotangent = rng.rand(2, 9, 11, 3).astype(np.float32)

    def jax_loss(img, flw):
      return jnp.sum(warp_ops.backward_warp(img, flw) *
                     jnp.asarray(cotangent))

    jg_img, jg_flow = jax.grad(jax_loss, argnums=(0, 1))(
        jnp.asarray(image), jnp.asarray(flow))

    img_tf = tf.constant(image)
    flow_tf = tf.constant(flow)
    with tf.GradientTape() as tape:
      tape.watch([img_tf, flow_tf])
      warped = tf_oracle.tf_dense_image_warp_backward(img_tf, flow_tf)
      loss = tf.reduce_sum(warped * cotangent)
    tg_img, tg_flow = tape.gradient(loss, [img_tf, flow_tf])

    np.testing.assert_allclose(np.asarray(jg_img), tg_img.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jg_flow), tg_flow.numpy(),
                               atol=1e-4, rtol=1e-4)
