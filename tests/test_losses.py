"""Loss-function tests, including VGG19 parity against a TF oracle.

A synthetic MatConvNet-layout .mat file (small channel counts) exercises the
real loader path; two oracles pin the numerics: a self-written tf.nn oracle
(below) and — the stronger grounding — the reference's OWN executable
losses/vgg19_loss.py, imported from /root/reference and run eagerly under
the installed TF (TestReferenceVggParity).
"""
import importlib.util
import os

import numpy as np
import pytest

import jax.numpy as jnp

from frame_interpolation_tpu import losses as losses_lib
from frame_interpolation_tpu.losses import vgg19

tf = pytest.importorskip('tensorflow')
sio = pytest.importorskip('scipy.io')

_REF_VGG19_LOSS = '/root/reference/losses/vgg19_loss.py'

# Small-channel VGG19: channels per conv layer, tower order.
_CHANNELS = (8, 8, 12, 12, 16, 16, 16, 16, 24, 24, 24, 24, 24, 24)


def _make_fake_vgg_mat(path: str, seed=0):
  rng = np.random.RandomState(seed)
  num_slots = max(vgg19._CONV_INDICES) + 1
  layers = np.empty((1, num_slots), dtype=object)
  cin = 3
  kernels = []
  for index, cout in zip(vgg19._CONV_INDICES, _CHANNELS):
    kernel = rng.randn(3, 3, cin, cout).astype(np.float32) * 0.05
    bias = rng.randn(cout, 1).astype(np.float32) * 0.1
    weights_cell = np.empty((1, 2), dtype=object)
    weights_cell[0, 0] = kernel
    weights_cell[0, 1] = bias
    record = np.zeros((1, 1), dtype=[('name', 'O'), ('type', 'O'),
                                     ('weights', 'O')])
    record[0, 0]['name'] = 'conv'
    record[0, 0]['type'] = 'conv'
    record[0, 0]['weights'] = weights_cell
    layers[0, index] = record
    kernels.append((kernel, bias.reshape(-1)))
    cin = cout
  # Fill non-conv slots with placeholder structs.
  for i in range(num_slots):
    if layers[0, i] is None:
      record = np.zeros((1, 1), dtype=[('name', 'O'), ('type', 'O'),
                                       ('weights', 'O')])
      record[0, 0]['name'] = 'relu_or_pool'
      record[0, 0]['type'] = 'misc'
      record[0, 0]['weights'] = np.empty((0, 0), dtype=object)
      layers[0, i] = record
  sio.savemat(path, {'layers': layers})
  return kernels


def _tf_vgg_features(image_255, kernels):
  mean = tf.constant([123.6800, 116.7790, 103.9390], shape=[1, 1, 1, 3])
  net = tf.cast(image_255, tf.float32) - mean
  feats = {}
  for (kernel, bias), name in zip(kernels, vgg19._CONV_NAMES):
    net = tf.nn.relu(
        tf.nn.conv2d(net, kernel, strides=[1, 1, 1, 1], padding='SAME') +
        bias)
    feats[name] = net
    if name in vgg19._POOL_AFTER:
      net = tf.nn.avg_pool(net, ksize=[1, 2, 2, 1], strides=[1, 2, 2, 1],
                           padding='SAME')
  return feats


def _tf_vgg_loss(image, reference, kernels, weights):
  fr = _tf_vgg_features(reference * 255.0, kernels)
  fi = _tf_vgg_features(image * 255.0, kernels)
  total = 0.0
  for name, w in zip(vgg19._LOSS_LAYERS, weights):
    total += tf.reduce_mean(tf.abs(fr[name] - fi[name])) * w
  return (total / 255.0).numpy()


def _tf_style_loss(image, reference, kernels, weights):
  fr = _tf_vgg_features(reference * 255.0, kernels)
  fi = _tf_vgg_features(image * 255.0, kernels)

  def gram(f):
    shape = f.shape
    h, w, c = shape[1], shape[2], shape[3]
    flat = tf.reshape(f, (-1, h * w, c))
    return tf.matmul(flat, flat, transpose_a=True) / float(h * w)

  total = 0.0
  for name, wgt in zip(vgg19._LOSS_LAYERS, weights):
    total += tf.reduce_mean(
        tf.square(gram(fr[name] / 255.0) - gram(fi[name] / 255.0))) * wgt
  return total.numpy()


@pytest.fixture(scope='module')
def vgg_mat(tmp_path_factory):
  """Synthetic MatConvNet bundle, or the REAL released weights if mounted.

  Set FI_VGG_MAT=/path/to/imagenet-vgg-verydeep-19.mat to run every
  parity test in this file against the real released VGG19 weights
  (reference losses/vgg19_loss.py:100-103) — the day the artifact is
  available, `FI_VGG_MAT=... pytest tests/test_losses.py` closes the
  north-star VGG fidelity gate in one run. `kernels` is None then, so
  the loader-layout test (which needs known values) skips.
  """
  real = os.environ.get('FI_VGG_MAT')
  if real:
    assert os.path.exists(real), real
    return real, None
  path = str(tmp_path_factory.mktemp('vgg') / 'fake_vgg19.mat')
  kernels = _make_fake_vgg_mat(path)
  return path, kernels


class TestVgg19:

  def test_loader_reads_matconvnet_layout(self, vgg_mat):
    path, kernels = vgg_mat
    if kernels is None:
      pytest.skip('FI_VGG_MAT set: no known-value bundle to compare')
    loaded = vgg19._load_vgg_weights(path)
    assert len(loaded) == len(kernels)
    for (lk, lb), (k, b) in zip(loaded, kernels):
      np.testing.assert_array_equal(lk, k)
      np.testing.assert_array_equal(lb, b)

  def test_avg_pool_same_matches_tf_on_odd_sizes(self):
    x = np.random.RandomState(0).rand(2, 7, 9, 4).astype(np.float32)
    ours = np.asarray(vgg19._avg_pool_same(jnp.asarray(x)))
    theirs = tf.nn.avg_pool(x, ksize=[1, 2, 2, 1], strides=[1, 2, 2, 1],
                            padding='SAME').numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)

  def test_vgg_loss_matches_tf_oracle(self, vgg_mat):
    path, kernels = vgg_mat
    if kernels is None:
      # Real released .mat (FI_VGG_MAT): the oracle reuses our loader's
      # values — the conv/pool/gram math check stays independent, and
      # loader correctness is pinned by TestReferenceVggParity below.
      kernels = vgg19._load_vgg_weights(path)
    rng = np.random.RandomState(1)
    img = rng.rand(2, 33, 41, 3).astype(np.float32)
    ref = rng.rand(2, 33, 41, 3).astype(np.float32)
    ours = float(vgg19.vgg_loss(jnp.asarray(img), jnp.asarray(ref), path))
    theirs = _tf_vgg_loss(img, ref, kernels, vgg19._DEFAULT_WEIGHTS)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4)

  def test_style_loss_matches_tf_oracle(self, vgg_mat):
    path, kernels = vgg_mat
    if kernels is None:
      kernels = vgg19._load_vgg_weights(path)
    rng = np.random.RandomState(2)
    img = rng.rand(1, 32, 32, 3).astype(np.float32)
    ref = rng.rand(1, 32, 32, 3).astype(np.float32)
    ours = float(vgg19.style_loss(jnp.asarray(img), jnp.asarray(ref), path))
    theirs = _tf_style_loss(img, ref, kernels, vgg19._DEFAULT_WEIGHTS)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4)


@pytest.mark.skipif(not os.path.exists(_REF_VGG19_LOSS),
                    reason='reference repo not mounted')
class TestReferenceVggParity:
  """Pins vgg/style losses against the reference's OWN executable code.

  Imports /root/reference/losses/vgg19_loss.py (pure TF ops + scipy .mat
  loading, runs eagerly under the installed TF via tf.compat.v1) and
  compares our JAX implementation on the synthetic MatConvNet bundle —
  the same grounding upgrade tests/test_reference_parity.py gives the
  model. The self-written oracle above stays as a second, independent pin.
  """

  @pytest.fixture(scope='class')
  def reference_module(self, vgg_mat):
    path, _ = vgg_mat
    spec = importlib.util.spec_from_file_location('ref_vgg19_loss',
                                                  _REF_VGG19_LOSS)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    # The reference memoizes the .mat on the builder function; make sure
    # this class's synthetic bundle is the one cached.
    if hasattr(module._build_vgg19, 'vgg_rawnet'):
      del module._build_vgg19.vgg_rawnet
    return module

  def test_vgg_loss_matches_reference_code(self, vgg_mat, reference_module):
    path, _ = vgg_mat
    rng = np.random.RandomState(11)
    img = rng.rand(2, 33, 41, 3).astype(np.float32)
    ref = rng.rand(2, 33, 41, 3).astype(np.float32)
    theirs = float(reference_module.vgg_loss(img, ref, path))
    ours = float(vgg19.vgg_loss(jnp.asarray(img), jnp.asarray(ref), path))
    np.testing.assert_allclose(ours, theirs, rtol=2e-5)

  def test_style_loss_matches_reference_code(self, vgg_mat, reference_module):
    path, _ = vgg_mat
    rng = np.random.RandomState(12)
    img = rng.rand(1, 32, 40, 3).astype(np.float32)
    ref = rng.rand(1, 32, 40, 3).astype(np.float32)
    theirs = float(reference_module.style_loss(img, ref, path))
    ours = float(vgg19.style_loss(jnp.asarray(img), jnp.asarray(ref), path))
    np.testing.assert_allclose(ours, theirs, rtol=2e-5)

  def test_custom_weights_match_reference_code(self, vgg_mat,
                                               reference_module):
    path, _ = vgg_mat
    rng = np.random.RandomState(13)
    img = rng.rand(1, 24, 24, 3).astype(np.float32)
    ref = rng.rand(1, 24, 24, 3).astype(np.float32)
    weights = [0.5, 1.5, 0.25, 2.0, 3.0]
    theirs = float(reference_module.vgg_loss(img, ref, path, weights))
    ours = float(vgg19.vgg_loss(jnp.asarray(img), jnp.asarray(ref), path,
                                weights=tuple(weights)))
    np.testing.assert_allclose(ours, theirs, rtol=2e-5)

  def test_masked_losses_match_reference_code(self, vgg_mat,
                                              reference_module):
    path, _ = vgg_mat
    rng = np.random.RandomState(14)
    img = rng.rand(1, 32, 32, 3).astype(np.float32)
    ref = rng.rand(1, 32, 32, 3).astype(np.float32)
    mask = rng.rand(1, 32, 32, 1).astype(np.float32)
    # rtol is looser here: the masked losses sit near 1e-3 where TF's
    # oneDNN conv accumulation order leaves ~3e-7 absolute noise (the
    # mask resize itself matches tf.image.resize to 6e-8 — verified
    # separately); a wrong mask semantic would miss by percents.
    theirs_v = float(reference_module.vgg_loss(img, ref, path, mask=mask))
    ours_v = float(vgg19.vgg_loss(jnp.asarray(img), jnp.asarray(ref), path,
                                  mask=jnp.asarray(mask)))
    np.testing.assert_allclose(ours_v, theirs_v, rtol=1e-3)
    theirs_s = float(reference_module.style_loss(img, ref, path, mask=mask))
    ours_s = float(vgg19.style_loss(jnp.asarray(img), jnp.asarray(ref), path,
                                    mask=jnp.asarray(mask)))
    np.testing.assert_allclose(ours_s, theirs_s, rtol=1e-3)


class TestSimpleLosses:

  def _example_prediction(self, seed=0):
    rng = np.random.RandomState(seed)
    y = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    pred = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    w0 = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    return {'y': y}, {'image': pred, 'x0_warped': w0, 'x1_warped': pred}

  def test_l1_l2(self):
    example, prediction = self._example_prediction()
    np.testing.assert_allclose(
        float(losses_lib.l1_loss(example, prediction)),
        float(jnp.mean(jnp.abs(prediction['image'] - example['y']))))
    np.testing.assert_allclose(
        float(losses_lib.l2_loss(example, prediction)),
        float(jnp.mean(jnp.square(prediction['image'] - example['y']))))

  def test_l1_warped_sums_both_directions(self):
    example, prediction = self._example_prediction()
    expected = (float(jnp.mean(jnp.abs(prediction['x0_warped'] -
                                       example['y']))) +
                float(jnp.mean(jnp.abs(prediction['x1_warped'] -
                                       example['y']))))
    np.testing.assert_allclose(
        float(losses_lib.l1_warped_loss(example, prediction)), expected,
        rtol=1e-6)

  def test_registry_rejects_unknown(self):
    with pytest.raises(ValueError):
      losses_lib.get_loss('nope')

  def test_vgg_requires_model_file(self):
    with pytest.raises(ValueError):
      losses_lib.get_loss('vgg')


class TestSchedules:

  def test_piecewise_constant_matches_keras(self):
    boundaries = [1500000]
    values = [1.0, 0.25]
    ours = losses_lib.PiecewiseConstantSchedule(tuple(boundaries),
                                                tuple(values))
    theirs = tf.keras.optimizers.schedules.PiecewiseConstantDecay(
        boundaries, values)
    for step in [0, 1499999, 1500000, 1500001, 3000000]:
      np.testing.assert_allclose(float(ours(step)),
                                 theirs(step).numpy(), err_msg=str(step))

  def test_weighted_naming_convention(self):
    configs = [
        losses_lib.LossConfig('l1'),
        losses_lib.LossConfig(
            'l2', losses_lib.constant_schedule(2.0)),
    ]
    losses = losses_lib.create_losses(configs)
    assert set(losses) == {'l1', 'k*l2'}

  def test_compute_weighted_loss(self):
    example = {'y': jnp.zeros((1, 8, 8, 3))}
    prediction = {'image': jnp.ones((1, 8, 8, 3))}
    losses = losses_lib.training_losses(['l1', 'l2'], loss_weights=[2.0, 3.0])
    total = losses_lib.compute_weighted_loss(losses, example, prediction, 0)
    np.testing.assert_allclose(float(total), 2.0 * 1.0 + 3.0 * 1.0)

  def test_aggregate_batch_losses(self):
    agg = losses_lib.aggregate_batch_losses(
        [{'l1': 0.2, 'ssim': 0.9}, {'l1': 0.3, 'ssim': 0.8}])
    np.testing.assert_allclose(agg['l1'], 0.25)
    np.testing.assert_allclose(agg['ssim'], 0.85)
