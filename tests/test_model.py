"""Model structure tests: shapes, channel arithmetic, weight sharing."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frame_interpolation_tpu.models import film_net
from frame_interpolation_tpu.options import Options


pytestmark = pytest.mark.slow  # model compiles dominate runtime

@pytest.fixture(scope='module')
def tiny_setup():
  opts = Options.tiny()
  model = film_net.create_model(opts)
  params = film_net.init_params(model, jax.random.PRNGKey(0))
  return opts, model, params


class TestChannelArithmetic:

  def test_released_config_channels(self):
    """SURVEY.md §2a: 64/192/448/960/960/960/960 for the released config."""
    opts = Options.film_net_released()
    got = [opts.feature_channels(i) for i in range(opts.pyramid_levels)]
    assert got == [64, 192, 448, 960, 960, 960, 960]

  def test_align_and_max_motion(self):
    opts = Options.film_net_released()
    assert opts.align == 64
    assert opts.max_motion_px == 192


class TestForward:

  def test_output_shapes(self, tiny_setup):
    opts, model, params = tiny_setup
    h = w = opts.align * 2
    x0 = jnp.zeros((2, h, w, 3))
    x1 = jnp.zeros((2, h, w, 3))
    t = jnp.full((2, 1), 0.5)
    out = model.apply({'params': params}, x0, x1, t)
    assert out['image'].shape == (2, h, w, 3)
    assert out['x0_warped'].shape == (2, h, w, 3)
    assert len(out['forward_flow_pyramid']) == opts.fusion_pyramid_levels
    assert len(out['forward_residual_flow_pyramid']) == opts.pyramid_levels
    assert out['forward_flow_pyramid'][0].shape == (2, h, w, 2)

  def test_feature_channels_match_formula(self, tiny_setup):
    opts, model, params = tiny_setup
    h = w = opts.align * 2
    x = jnp.zeros((1, h, w, 3))

    extractor_params = params['feat_net']
    from frame_interpolation_tpu.models.feature_extractor import (
        FeatureExtractor)
    from frame_interpolation_tpu.ops import build_image_pyramid
    fe = FeatureExtractor(opts)
    feats = fe.apply({'params': extractor_params},
                     build_image_pyramid(x, opts.pyramid_levels))
    got = [f.shape[-1] for f in feats]
    want = [opts.feature_channels(i) for i in range(opts.pyramid_levels)]
    assert got == want

  def test_identical_inputs_give_near_zero_flow_symmetric_output(
      self, tiny_setup):
    opts, model, params = tiny_setup
    h = w = opts.align
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    t = jnp.full((1, 1), 0.5)
    out = model.apply({'params': params}, x, x, t)
    # With identical inputs, forward and backward flows are identical
    # (the two directions run the same weights on the same feature pair).
    f = np.asarray(out['forward_flow_pyramid'][0])
    b = np.asarray(out['backward_flow_pyramid'][0])
    np.testing.assert_allclose(f, b, atol=1e-5)

  def test_shared_flow_predictor_params(self, tiny_setup):
    opts, _, params = tiny_setup
    flow_params = params['predict_flow']
    names = set(flow_params.keys())
    for i in range(opts.specialized_levels):
      assert f'flow_predictor_{i}' in names
    assert 'flow_predictor_shared' in names
    # Shared predictor exists once; coarse levels reuse it.
    assert len(names) == opts.specialized_levels + 1

  def test_subtree_extractor_shared_across_levels(self, tiny_setup):
    _, _, params = tiny_setup
    # A single sub_extractor parameter set serves every pyramid level.
    assert list(params['feat_net'].keys()) == ['sub_extractor']

  def test_time_input_ignored(self, tiny_setup):
    """film_net hardcodes t=0.5 (reference interpolator.py:163-165)."""
    opts, model, params = tiny_setup
    h = w = opts.align
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    x1 = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    out_a = model.apply({'params': params}, x0, x1, jnp.full((1, 1), 0.5))
    out_b = model.apply({'params': params}, x0, x1, jnp.full((1, 1), 0.25))
    np.testing.assert_array_equal(np.asarray(out_a['image']),
                                  np.asarray(out_b['image']))

  def test_jit_and_grad(self, tiny_setup):
    opts, model, params = tiny_setup
    h = w = opts.align
    rng = np.random.RandomState(2)
    x0 = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    x1 = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    t = jnp.full((1, 1), 0.5)

    @jax.jit
    def loss_fn(p):
      out = model.apply({'params': p}, x0, x1, t)
      return jnp.mean(jnp.abs(out['image'] - y))

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0.0


class TestBfloat16Policy:

  def test_bf16_forward_close_to_f32(self):
    opts32 = Options.tiny()
    opts16 = Options.tiny(dtype_policy='bfloat16')
    model32 = film_net.create_model(opts32)
    model16 = film_net.create_model(opts16)
    params = film_net.init_params(model32, jax.random.PRNGKey(0))
    h = w = opts32.align
    rng = np.random.RandomState(3)
    x0 = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    x1 = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    t = jnp.full((1, 1), 0.5)
    out32 = model32.apply({'params': params}, x0, x1, t)['image']
    out16 = model16.apply({'params': params}, x0, x1, t)['image']
    assert out16.dtype == jnp.float32  # final output promoted back
    err = float(jnp.max(jnp.abs(out32 - out16)))
    assert err < 0.1  # bf16 noise on a randomly-initialized net


class TestFeatureSplitForward:

  def test_split_forward_matches_joint(self):
    # extract_features + interpolate_from_features == __call__ — the
    # feature-caching recursion split (PERF.md item 5).
    model = film_net.FilmNet(Options.tiny())
    params = film_net.init_params(model, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(1, 16, 24, 3), jnp.float32)
    x1 = jnp.asarray(rng.rand(1, 16, 24, 3), jnp.float32)
    t = jnp.full((1, 1), 0.5, jnp.float32)
    joint = model.apply({'params': params}, x0, x1, t)

    def split(params, x0, x1, t):
      f0 = model.apply({'params': params}, x0,
                       method=model.extract_features)
      f1 = model.apply({'params': params}, x1,
                       method=model.extract_features)
      return model.apply({'params': params}, f0, f1, t,
                         method=model.interpolate_from_features)

    out = jax.jit(split)(params, x0, x1, t)
    np.testing.assert_allclose(np.asarray(out['image']),
                               np.asarray(joint['image']), atol=2e-7)

