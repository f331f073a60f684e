"""Fused pair-flat extractor-stack kernel parity (ops/conv_stack.py).

The fused conv+bias+leaky(+2x2-avg-pool) kernel must match the unfused
conv stack up to accumulation order — the extractor's sub-level-0 stacks
run through it on TPU (reference models/film_net/feature_extractor.py:
119-123 in google-research/frame-interpolation). Pallas interpret mode
executes the exact kernel program on CPU.
"""
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frame_interpolation_tpu.models.feature_extractor import FeatureExtractor
from frame_interpolation_tpu.ops import conv_stack, pyramid
from frame_interpolation_tpu.options import Options


def _conv(x, w, b):
  y = jax.lax.conv_general_dilated(
      x, w, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  return y + b[None, None, None]


def _leaky(x):
  return jnp.where(x >= 0, x, x * 0.2)


def _reference_stack(image, k0, b0, k1, b1, emit_pool):
  """The unfused stack: conv0+leaky, conv1+leaky, 2x2 avg-pool."""
  h0 = _leaky(_conv(image, k0, b0))
  feat = _leaky(_conv(h0, k1, b1))
  pooled = pyramid.avg_pool_2x(feat) if emit_pool else None
  return feat, pooled


@pytest.mark.parametrize('h,w', [(16, 48), (8, 8), (2, 4), (18, 36)])
@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_conv_stack_flat_matches_conv(h, w, dtype):
  rng = np.random.RandomState(hash((h, w, str(dtype))) % 2**31)
  c = conv_stack.C
  x = jnp.asarray(rng.rand(1, h, w, c) - 0.5, dtype)
  k1 = jnp.asarray((rng.rand(3, 3, c, c) - 0.5) * 0.2, dtype)
  b1 = jnp.asarray(rng.rand(c) - 0.5, jnp.float32)
  g = conv_stack.geometry(h, w, tm=4)
  # Build the guarded plane from the raw features via the tall layout.
  tall = conv_stack.pad_image_tall(x[0], g)
  xflat = conv_stack.mask_tall(
      tall.reshape(g.tall_rows, g.pw, 2 * c), g).reshape(g.r_total, 128)
  wc, ws = conv_stack.pack_weights_combined(k1)
  b2 = jnp.concatenate([b1, b1])[None, :]
  feat_flat, pool_flat = conv_stack.conv_stack_flat(
      xflat, wc, ws, b2, g, interpret=True)
  got = conv_stack.features_from_flat(feat_flat, g)
  want = _leaky(_conv(x.astype(jnp.float32), k1.astype(jnp.float32), b1))[0]
  tol = 5e-2 if dtype == jnp.bfloat16 else 1e-5
  np.testing.assert_allclose(np.asarray(got, np.float32),
                             np.asarray(want, np.float32), atol=tol)
  got_pool = conv_stack.pooled_from_flat(pool_flat, g)
  want_pool = pyramid.avg_pool_2x(want[None])[0]
  np.testing.assert_allclose(np.asarray(got_pool, np.float32),
                             np.asarray(want_pool, np.float32), atol=tol)


@pytest.mark.parametrize('batch', [1, 3])
@pytest.mark.parametrize('emit_pool', [True, False])
def test_extractor_stack_matches_unfused(batch, emit_pool):
  rng = np.random.RandomState(batch * 2 + emit_pool)
  c = conv_stack.C
  h, w, cin = 12, 40, 3
  image = jnp.asarray(rng.rand(batch, h, w, cin), jnp.float32)
  k0 = jnp.asarray((rng.rand(3, 3, cin, c) - 0.5) * 0.4, jnp.float32)
  b0 = jnp.asarray(rng.rand(c) - 0.5, jnp.float32)
  k1 = jnp.asarray((rng.rand(3, 3, c, c) - 0.5) * 0.2, jnp.float32)
  b1 = jnp.asarray(rng.rand(c) - 0.5, jnp.float32)
  feat, pooled = conv_stack.extractor_stack(
      image, k0, b0, k1, b1, emit_pool=emit_pool, interpret=True)
  want_feat, want_pool = _reference_stack(image, k0, b0, k1, b1, emit_pool)
  np.testing.assert_allclose(np.asarray(feat), np.asarray(want_feat),
                             atol=1e-5)
  if emit_pool:
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(want_pool),
                               atol=1e-5)
  else:
    assert pooled is None


@pytest.mark.parametrize('emit_pool', [True, False])
def test_extractor_stack_grads_match_unfused(emit_pool):
  """The custom VJP (training path) equals XLA autodiff of the unfused
  stack — grad through the fused kernel must neither crash nor drift."""
  rng = np.random.RandomState(7 + emit_pool)
  c = conv_stack.C
  x = jnp.asarray(rng.rand(2, 12, 40, 3), jnp.float32)
  k0 = jnp.asarray(rng.randn(3, 3, 3, c) * 0.2, jnp.float32)
  b0 = jnp.asarray(rng.rand(c) - 0.5, jnp.float32)
  k1 = jnp.asarray(rng.randn(3, 3, c, c) * 0.1, jnp.float32)
  b1 = jnp.asarray(rng.rand(c) - 0.5, jnp.float32)

  def loss_fused(x, k0, b0, k1, b1):
    f, p = conv_stack.extractor_stack(x, k0, b0, k1, b1,
                                      emit_pool=emit_pool, interpret=True)
    out = jnp.sum(f ** 2)
    if emit_pool:
      out = out + jnp.sum(jnp.sin(p))
    return out

  def loss_ref(x, k0, b0, k1, b1):
    f, p = _reference_stack(x, k0, b0, k1, b1, emit_pool)
    out = jnp.sum(f ** 2)
    if emit_pool:
      out = out + jnp.sum(jnp.sin(p))
    return out

  args = (x, k0, b0, k1, b1)
  got = jax.grad(loss_fused, argnums=tuple(range(5)))(*args)
  want = jax.grad(loss_ref, argnums=tuple(range(5)))(*args)
  for g, w in zip(got, want):
    np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                               rtol=2e-4, atol=2e-4)


def test_resolve_mode_gates():
  resolve = functools.partial(conv_stack.resolve_mode, features=64)
  assert resolve('off', (1, 64, 256, 3)) is None
  assert resolve('interpret', (1, 64, 256, 3)) == 'interpret'
  # Odd extents and non-64-feature stacks never engage.
  assert resolve('interpret', (1, 63, 256, 3)) is None
  assert resolve('interpret', (1, 64, 255, 3)) is None
  assert conv_stack.resolve_mode('interpret', (1, 64, 256, 3), 128) is None
  # Compiled modes need a TPU; this suite runs on CPU.
  assert resolve('on', (1, 64, 256, 3)) is None
  assert resolve('auto', (1, 64, 256, 3)) is None


def _extract(options, image_pyramid, seed=0):
  model = FeatureExtractor(options)
  params = model.init(jax.random.PRNGKey(seed), image_pyramid)
  return params, model.apply(params, image_pyramid)


def test_feature_extractor_stack_parity():
  """Full cascaded extractor: conv_stack='interpret' == 'off'."""
  rng = np.random.RandomState(0)
  base = Options.tiny(filters=64, sub_levels=2, pyramid_levels=3,
                      fusion_pyramid_levels=3, specialized_levels=1,
                      flow_convs=(1, 1), flow_filters=(8, 8))
  image = jnp.asarray(rng.rand(2, 16, 48, 3), jnp.float32)
  image_pyramid = [image]
  for _ in range(base.pyramid_levels - 1):
    image_pyramid.append(pyramid.avg_pool_2x(image_pyramid[-1]))
  params, want = _extract(dataclasses.replace(base, conv_stack='off'),
                          image_pyramid)
  fused_opts = dataclasses.replace(base, conv_stack='interpret')
  got = FeatureExtractor(fused_opts).apply(params, image_pyramid)
  assert len(got) == len(want)
  for g, w_ in zip(got, want):
    np.testing.assert_allclose(np.asarray(g), np.asarray(w_), atol=1e-5)
