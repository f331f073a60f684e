"""W-folded conv equivalence tests (ops/folded_conv.py).

The folded path must match the plain conv path up to accumulation order:
the released-checkpoint PSNR parity budget rides on it (CLAUDE.md
invariants). Covers the weight transform for 1x1/2x2/3x3 kernels, the
piece-wise concat layout, the folded pool, module/param compatibility
with nn.Conv, and the full model under fold_convs='on' vs 'off'.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frame_interpolation_tpu.models.film_net import FilmNet, init_params
from frame_interpolation_tpu.ops import folded_conv, pyramid
from frame_interpolation_tpu.options import Options


def _conv(x, w, b=None):
  y = jax.lax.conv_general_dilated(
      x, w, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  if b is not None:
    y = y + b[None, None, None]
  return y


@pytest.mark.parametrize('kh,kw', [(3, 3), (2, 2), (1, 1), (3, 1)])
@pytest.mark.parametrize('cin,cout', [(3, 8), (6, 6), (5, 2)])
def test_fold_weights_matches_plain_conv(kh, kw, cin, cout):
  rng = np.random.RandomState(hash((kh, kw, cin, cout)) % 2**31)
  x = jnp.asarray(rng.rand(2, 6, 10, cin).astype(np.float32))
  w = jnp.asarray((rng.rand(kh, kw, cin, cout) - 0.5).astype(np.float32))
  b = jnp.asarray(rng.rand(cout).astype(np.float32))
  want = _conv(x, w, b)
  got = folded_conv.unfold(
      _conv(folded_conv.fold(x), folded_conv.fold_weights(w),
            folded_conv.fold_bias(b)))
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


def test_fold_weights_piece_layout():
  # conv(concat(a, b)) == folded conv over concat(fold(a), fold(b)) with
  # piece-aware weight folding.
  rng = np.random.RandomState(7)
  a = jnp.asarray(rng.rand(1, 4, 8, 5).astype(np.float32))
  b = jnp.asarray(rng.rand(1, 4, 8, 3).astype(np.float32))
  w = jnp.asarray((rng.rand(3, 3, 8, 4) - 0.5).astype(np.float32))
  want = _conv(jnp.concatenate([a, b], axis=-1), w)
  xf = jnp.concatenate([folded_conv.fold(a), folded_conv.fold(b)], axis=-1)
  got = folded_conv.unfold(
      _conv(xf, folded_conv.fold_weights(w, piece_sizes=(5, 3))))
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


def test_avg_pool_2x_folded_matches_plain():
  rng = np.random.RandomState(3)
  x = jnp.asarray(rng.rand(2, 8, 12, 5).astype(np.float32))
  want = pyramid.avg_pool_2x(x)
  got = folded_conv.avg_pool_2x_folded(folded_conv.fold(x))
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-6, atol=1e-6)


def test_foldable_conv_params_match_nn_conv():
  # Same name/shape/init tree as nn.Conv, and identical unfolded forward.
  rng = np.random.RandomState(0)
  x = jnp.asarray(rng.rand(1, 6, 8, 5).astype(np.float32))
  key = jax.random.PRNGKey(42)
  ours = folded_conv.FoldableConv(features=7, kernel_size=(3, 3),
                                  name='conv')
  theirs = nn.Conv(features=7, kernel_size=(3, 3), padding='SAME',
                   name='conv')
  p_ours = ours.init(key, x)
  p_theirs = theirs.init(key, x)
  flat_o = jax.tree_util.tree_leaves_with_path(p_ours)
  flat_t = dict((jax.tree_util.keystr(p), v)
                for p, v in jax.tree_util.tree_leaves_with_path(p_theirs))
  assert len(flat_o) == len(flat_t)
  for path, value in flat_o:
    np.testing.assert_array_equal(np.asarray(value),
                                  np.asarray(flat_t[jax.tree_util.keystr(path)]),
                                  err_msg=str(path))
  np.testing.assert_allclose(
      np.asarray(ours.apply(p_ours, x)),
      np.asarray(theirs.apply(p_theirs, x)), rtol=1e-6, atol=1e-6)
  # Folded forward agrees with the plain one.
  yf = folded_conv.unfold(ours.apply(p_ours, folded_conv.fold(x),
                                     folded=True))
  np.testing.assert_allclose(np.asarray(yf),
                             np.asarray(ours.apply(p_ours, x)),
                             rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('dtype_policy', ['float32', 'bfloat16'])
def test_model_fold_on_matches_off(dtype_policy):
  opts_off = Options.tiny(dtype_policy=dtype_policy, fold_convs='off')
  opts_on = Options.tiny(dtype_policy=dtype_policy, fold_convs='on')
  model_off = FilmNet(opts_off)
  model_on = FilmNet(opts_on)
  params = init_params(model_off, jax.random.PRNGKey(0))
  rng = np.random.RandomState(1)
  align = opts_off.align
  h = w = align * 2
  x0 = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
  x1 = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
  t = jnp.asarray(np.full((1, 1), 0.5, np.float32))
  out_off = model_off.apply({'params': params}, x0, x1, t)['image']
  out_on = model_on.apply({'params': params}, x0, x1, t)['image']
  tol = 5e-2 if dtype_policy == 'bfloat16' else 1e-4
  np.testing.assert_allclose(np.asarray(out_on, np.float32),
                             np.asarray(out_off, np.float32), atol=tol)


def test_released_auto_gate_shapes():
  # 'auto' folds only wide, even layers; odd widths fall back cleanly.
  opts = Options.tiny(fold_convs='auto')
  model = FilmNet(opts)
  params = init_params(model, jax.random.PRNGKey(0))
  rng = np.random.RandomState(2)
  align = opts.align
  x0 = jnp.asarray(rng.rand(1, align * 2, align * 2, 3).astype(np.float32))
  t = jnp.asarray(np.full((1, 1), 0.5, np.float32))
  out = model.apply({'params': params}, x0, x0, t)['image']
  assert np.isfinite(np.asarray(out, np.float32)).all()


def test_model_fold_auto_odd_height():
  # Regression: fold 'auto' (the default) previously gated only on width
  # parity, so an odd-H, W>=256 input folded the finest fusion level and
  # tripped the decoder's exact-2x assert. The gate (should_fold
  # even_height=True at the film_net site) must decline to fold and
  # produce the same output as fold 'off'.
  opts_auto = Options.tiny(fold_convs='auto')
  opts_off = Options.tiny(fold_convs='off')
  model_auto = FilmNet(opts_auto)
  model_off = FilmNet(opts_off)
  params = init_params(model_off, jax.random.PRNGKey(0))
  rng = np.random.RandomState(3)
  x0 = jnp.asarray(rng.rand(1, 65, 256, 3).astype(np.float32))
  x1 = jnp.asarray(rng.rand(1, 65, 256, 3).astype(np.float32))
  t = jnp.asarray(np.full((1, 1), 0.5, np.float32))
  out_auto = model_auto.apply({'params': params}, x0, x1, t)['image']
  out_off = model_off.apply({'params': params}, x0, x1, t)['image']
  np.testing.assert_allclose(np.asarray(out_auto), np.asarray(out_off),
                             rtol=1e-5, atol=1e-5)


def test_split_call_matches_concat_call():
  """FoldableConv list-input mode == conv of the channel concat (split-
  concat execution, options.split_convs)."""
  rng = np.random.RandomState(3)
  a = jnp.asarray(rng.rand(1, 8, 12, 5) - 0.5, jnp.float32)
  b = jnp.asarray(rng.rand(1, 8, 12, 7) - 0.5, jnp.float32)
  conv = folded_conv.FoldableConv(features=6, kernel_size=(3, 3))
  params = conv.init(jax.random.PRNGKey(0), jnp.concatenate([a, b], -1))
  want = conv.apply(params, jnp.concatenate([a, b], axis=-1))
  got = conv.apply(params, [a, b])
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_split_call_matches_concat_call_folded():
  """Folded split mode: per-piece folded inputs with per-piece sub-piece
  layouts must equal the folded conv of the piece concat."""
  rng = np.random.RandomState(4)
  p1 = jnp.asarray(rng.rand(1, 8, 12, 3) - 0.5, jnp.float32)
  p2 = jnp.asarray(rng.rand(1, 8, 12, 5) - 0.5, jnp.float32)
  q = jnp.asarray(rng.rand(1, 8, 12, 4) - 0.5, jnp.float32)
  conv = folded_conv.FoldableConv(features=6, kernel_size=(3, 3))
  params = conv.init(jax.random.PRNGKey(0),
                     jnp.concatenate([p1, p2, q], -1))
  # Reference: one folded conv over concat(fold(p1), fold(p2), folded_conv.fold(q)).
  xs = folded_conv.fold_pieces([p1, p2, q])
  want = conv.apply(params, xs.x, folded=True, piece_sizes=xs.pieces)
  # Split: piece A = concat(fold(p1), fold(p2)) with sub-layout (3, 5),
  # piece B = folded_conv.fold(q).
  xa = folded_conv.fold_pieces([p1, p2])
  got = conv.apply(params, [xa.x, folded_conv.fold(q)], folded=True,
                   piece_sizes=[xa.pieces, (4,)])
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.parametrize('dtype_policy', ['float32', 'bfloat16'])
def test_model_split_on_matches_off(dtype_policy):
  """Full released-config forward: split_convs on == off (accumulation
  order only)."""
  import dataclasses as dc
  rng = np.random.RandomState(7)
  x0 = jnp.asarray(rng.rand(1, 64, 128, 3), jnp.float32)
  x1 = jnp.asarray(rng.rand(1, 64, 128, 3), jnp.float32)
  t = jnp.full((1, 1), 0.5, jnp.float32)
  base = Options.film_net_released(dtype_policy=dtype_policy,
                                   use_aux_outputs=False)
  model_on = FilmNet(dc.replace(base, split_convs='on'))
  model_off = FilmNet(dc.replace(base, split_convs='off'))
  params = init_params(model_on, jax.random.PRNGKey(0))
  y_on = model_on.apply({'params': params}, x0, x1, t)['image']
  y_off = model_off.apply({'params': params}, x0, x1, t)['image']
  tol = 3e-2 if dtype_policy == 'bfloat16' else 2e-6
  np.testing.assert_allclose(np.asarray(y_on, np.float32),
                             np.asarray(y_off, np.float32), atol=tol)


def test_quad_fold_matches_plain_conv():
  """Quad fold (folded=2): fold∘fold with twice-folded weights == plain
  conv, incl. 1x1 kernels and split pieces (the 32-filter flow predictor
  path, reference pyramid_flow_estimator.py:49-98)."""
  rng = np.random.RandomState(12)
  x = jnp.asarray(rng.rand(1, 8, 16, 6) - 0.5, jnp.float32)
  for ks in ((3, 3), (1, 1)):
    conv = folded_conv.FoldableConv(features=5, kernel_size=ks)
    params = conv.init(jax.random.PRNGKey(0), x)
    want = conv.apply(params, x)
    got = folded_conv.unfold_n(
        conv.apply(params, folded_conv.fold_n(x, 2), folded=2), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_quad_fold_split_and_concat_pieces():
  rng = np.random.RandomState(13)
  a = jnp.asarray(rng.rand(1, 8, 16, 3) - 0.5, jnp.float32)
  b = jnp.asarray(rng.rand(1, 8, 16, 5) - 0.5, jnp.float32)
  conv = folded_conv.FoldableConv(features=4, kernel_size=(3, 3))
  params = conv.init(jax.random.PRNGKey(2), jnp.concatenate([a, b], -1))
  want = conv.apply(params, jnp.concatenate([a, b], -1))
  got_split = folded_conv.unfold_n(
      conv.apply(params,
                 [folded_conv.fold_n(a, 2), folded_conv.fold_n(b, 2)],
                 folded=2, piece_sizes=[(3,), (5,)]), 2)
  np.testing.assert_allclose(np.asarray(got_split), np.asarray(want),
                             atol=1e-5)
  xq = jnp.concatenate(
      [folded_conv.fold_n(a, 2), folded_conv.fold_n(b, 2)], -1)
  got_cat = folded_conv.unfold_n(
      conv.apply(params, xq, folded=2, piece_sizes=(3, 5)), 2)
  np.testing.assert_allclose(np.asarray(got_cat), np.asarray(want),
                             atol=1e-5)
