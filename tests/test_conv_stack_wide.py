"""Fused flat-layout wide-stack kernel parity (ops/conv_stack_wide.py).

The C in {128, 256, 512} sub-level kernel must match the unfused conv
stack up to accumulation order — the extractor's sub-levels 1..3 run
through it on TPU (reference models/film_net/feature_extractor.py:119-147
in google-research/frame-interpolation). Pallas interpret mode executes
the exact kernel program on CPU.
"""
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frame_interpolation_tpu.models.feature_extractor import FeatureExtractor
from frame_interpolation_tpu.ops import conv_stack_wide, pyramid
from frame_interpolation_tpu.options import Options


def _conv(x, w, b):
  y = jax.lax.conv_general_dilated(
      x, w, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  return y + b[None, None, None]


def _leaky(x):
  return jnp.where(x >= 0, x, x * 0.2)


def _reference_stack(head, k0, b0, k1, b1, emit_pool):
  h0 = _leaky(_conv(head, k0, b0))
  feat = _leaky(_conv(h0, k1, b1))
  pooled = pyramid.avg_pool_2x(feat) if emit_pool else None
  return feat, pooled


@pytest.mark.parametrize('h,w,c', [(8, 16, 128), (6, 10, 256), (4, 6, 512),
                                   (16, 36, 128)])
@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_conv_flat_matches_conv(h, w, c, dtype):
  rng = np.random.RandomState(hash((h, w, c, str(dtype))) % 2**31)
  x = jnp.asarray(rng.rand(1, h, w, c) - 0.5, dtype)
  k1 = jnp.asarray((rng.rand(3, 3, c, c) - 0.5) * 0.1, dtype)
  b1 = jnp.asarray(rng.rand(c) - 0.5, jnp.float32)
  g = conv_stack_wide.flat_geometry(h, w, c, tm=4)
  tall = conv_stack_wide.pad_image_tall_flat(x[0], g)
  xflat = conv_stack_wide.mask_tall_flat(tall, g).reshape(g.r_total, c)
  feat_flat, pool_half = conv_stack_wide.conv_flat(
      xflat, k1, b1, g, interpret=True)
  got = conv_stack_wide.features_from_flat(feat_flat, g)
  want = _leaky(_conv(x.astype(jnp.float32), k1.astype(jnp.float32), b1))[0]
  tol = 2e-1 if dtype == jnp.bfloat16 else 1e-5
  np.testing.assert_allclose(np.asarray(got, np.float32),
                             np.asarray(want, np.float32), atol=tol)
  got_pool = conv_stack_wide.pooled_from_half(pool_half, g)
  want_pool = pyramid.avg_pool_2x(want[None])[0]
  np.testing.assert_allclose(np.asarray(got_pool, np.float32),
                             np.asarray(want_pool, np.float32), atol=tol)


@pytest.mark.parametrize('batch', [1, 2])
@pytest.mark.parametrize('emit_pool', [True, False])
def test_wide_stack_matches_unfused(batch, emit_pool):
  rng = np.random.RandomState(batch * 2 + emit_pool)
  cin, c = 64, 128
  h, w = 8, 20
  head = jnp.asarray(rng.rand(batch, h, w, cin) - 0.5, jnp.float32)
  k0 = jnp.asarray((rng.rand(3, 3, cin, c) - 0.5) * 0.2, jnp.float32)
  b0 = jnp.asarray(rng.rand(c) - 0.5, jnp.float32)
  k1 = jnp.asarray((rng.rand(3, 3, c, c) - 0.5) * 0.1, jnp.float32)
  b1 = jnp.asarray(rng.rand(c) - 0.5, jnp.float32)
  feat, pooled = conv_stack_wide.wide_extractor_stack(
      head, k0, b0, k1, b1, emit_pool=emit_pool, interpret=True)
  want_feat, want_pool = _reference_stack(head, k0, b0, k1, b1, emit_pool)
  np.testing.assert_allclose(np.asarray(feat), np.asarray(want_feat),
                             atol=1e-4)
  if emit_pool:
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(want_pool),
                               atol=1e-4)
  else:
    assert pooled is None


def test_wide_stack_grads_match_unfused():
  """The custom VJP routes through the unfused composition's autodiff."""
  rng = np.random.RandomState(11)
  cin, c = 32, 128
  x = jnp.asarray(rng.rand(1, 8, 12, cin) - 0.5, jnp.float32)
  k0 = jnp.asarray(rng.randn(3, 3, cin, c) * 0.1, jnp.float32)
  b0 = jnp.asarray(rng.rand(c) - 0.5, jnp.float32)
  k1 = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, jnp.float32)
  b1 = jnp.asarray(rng.rand(c) - 0.5, jnp.float32)

  def loss_fused(x, k0, b0, k1, b1):
    f, p = conv_stack_wide.wide_extractor_stack(
        x, k0, b0, k1, b1, emit_pool=True, interpret=True)
    return jnp.sum(f ** 2) + jnp.sum(jnp.sin(p))

  def loss_ref(x, k0, b0, k1, b1):
    f, p = _reference_stack(x, k0, b0, k1, b1, True)
    return jnp.sum(f ** 2) + jnp.sum(jnp.sin(p))

  args = (x, k0, b0, k1, b1)
  got = jax.grad(loss_fused, argnums=tuple(range(5)))(*args)
  want = jax.grad(loss_ref, argnums=tuple(range(5)))(*args)
  for g, w in zip(got, want):
    np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                               rtol=2e-4, atol=2e-4)


def test_resolve_wide_mode_gates():
  resolve = functools.partial(conv_stack_wide.resolve_wide_mode,
                              features=128)
  assert resolve('off', (1, 64, 256, 64)) is None
  assert resolve('interpret', (1, 64, 256, 64)) == 'interpret'
  assert resolve('interpret', (1, 63, 256, 64)) is None
  assert resolve('interpret', (1, 64, 255, 64)) is None
  # Only the wide channel counts engage this kernel.
  assert conv_stack_wide.resolve_wide_mode(
      'interpret', (1, 64, 256, 3), 64) is None
  assert conv_stack_wide.resolve_wide_mode(
      'interpret', (1, 64, 256, 512), 1024) is None
  # Compiled modes need a TPU; this suite runs on CPU.
  assert resolve('on', (1, 64, 256, 64)) is None
  assert resolve('auto', (1, 64, 256, 64)) is None


def _extract(options, image_pyramid, seed=0):
  model = FeatureExtractor(options)
  params = model.init(jax.random.PRNGKey(seed), image_pyramid)
  return params, model.apply(params, image_pyramid)


def test_feature_extractor_wide_stack_parity():
  """Full cascaded extractor: conv_stack='interpret' == 'off' with wide
  sub-levels engaged (filters=64 -> sub-level 1 at 128 channels)."""
  rng = np.random.RandomState(0)
  base = Options.tiny(filters=64, sub_levels=3, pyramid_levels=3,
                      fusion_pyramid_levels=3, specialized_levels=1,
                      flow_convs=(1, 1), flow_filters=(8, 8))
  image = jnp.asarray(rng.rand(1, 16, 48, 3), jnp.float32)
  image_pyramid = [image]
  for _ in range(base.pyramid_levels - 1):
    image_pyramid.append(pyramid.avg_pool_2x(image_pyramid[-1]))
  params, want = _extract(dataclasses.replace(base, conv_stack='off'),
                          image_pyramid)
  fused_opts = dataclasses.replace(base, conv_stack='interpret')
  got = FeatureExtractor(fused_opts).apply(params, image_pyramid)
  assert len(got) == len(want)
  for g, w_ in zip(got, want):
    np.testing.assert_allclose(np.asarray(g), np.asarray(w_), atol=1e-4)


@pytest.mark.parametrize('h,w,cin,c', [(8, 16, 128, 256), (6, 10, 256, 512),
                                       (10, 20, 256, 128)])
def test_conv_flat_rectangular_matches_conv(h, w, cin, c):
  """Rect (cin, c) taps: the sub-level FIRST convs run in the window
  pipeline too (cfeat_conv_4/6, reference feature_extractor.py:119-147)."""
  rng = np.random.RandomState(hash((h, w, cin, c)) % 2**31)
  x = jnp.asarray(rng.rand(1, h, w, cin) - 0.5, jnp.float32)
  k = jnp.asarray((rng.rand(3, 3, cin, c) - 0.5) * 0.1, jnp.float32)
  b = jnp.asarray(rng.rand(c) - 0.5, jnp.float32)
  g = conv_stack_wide.flat_geometry(h, w, c, tm=4)
  tall = conv_stack_wide.pad_image_tall_flat(x[0], g)
  feat_flat, _ = conv_stack_wide.conv_flat(
      tall.reshape(g.r_total, cin), k, b, g, emit_pool=False,
      interpret=True)
  got = conv_stack_wide.features_from_flat(feat_flat, g)
  want = _leaky(_conv(x, k, b))[0]
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize('emit_pool', [True, False])
def test_wide_stack_flat_conv0_matches_unfused(emit_pool):
  """cin % 128 == 0 routes conv0 through the rect flat kernel; the whole
  sub-level must still match the unfused stack."""
  rng = np.random.RandomState(21 + emit_pool)
  cin, c = 128, 256
  h, w = 8, 20
  head = jnp.asarray(rng.rand(1, h, w, cin) - 0.5, jnp.float32)
  k0 = jnp.asarray((rng.rand(3, 3, cin, c) - 0.5) * 0.1, jnp.float32)
  b0 = jnp.asarray(rng.rand(c) - 0.5, jnp.float32)
  k1 = jnp.asarray((rng.rand(3, 3, c, c) - 0.5) * 0.05, jnp.float32)
  b1 = jnp.asarray(rng.rand(c) - 0.5, jnp.float32)
  feat, pooled = conv_stack_wide.wide_extractor_stack(
      head, k0, b0, k1, b1, emit_pool=emit_pool, interpret=True)
  want_feat, want_pool = _reference_stack(head, k0, b0, k1, b1, emit_pool)
  np.testing.assert_allclose(np.asarray(feat), np.asarray(want_feat),
                             atol=1e-4)
  if emit_pool:
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(want_pool),
                               atol=1e-4)
  else:
    assert pooled is None
