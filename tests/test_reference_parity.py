"""Parity against the reference's OWN model code (not a re-implementation).

Runs `/root/reference/models/film_net/interpolator.py create_model` under
the installed TF2, with shim modules standing in for the two uninstalled
dependencies (`gin`, whose decorator is configuration-only, and
`tensorflow_addons.image.dense_image_warp`, re-implemented here with tfa's
documented convention: query = grid - flow, flow ordered (dy, dx)).
The reference model's random weights are exported as a tf.train.Checkpoint,
imported through io.tf_import, and the flax forward must agree to >= 50 dB.

This catches structural misreads — Keras layer ordering, weight sharing,
fusion conv placement — that a self-built oracle (tests/tf_oracle.py) cannot:
everything here except the warp function is the reference's executable code.
"""
import os
import sys
import types

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.slow  # model compiles dominate runtime

REF = '/root/reference'
needs_reference = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, 'models', 'film_net')),
    reason='reference repo not mounted')

H, W = 16, 24  # divisible by 2^(pyramid_levels-1) = 8 for the tiny config


def _install_shims():
  """Provides minimal gin / tensorflow_addons so the reference imports."""
  import tensorflow as tf
  if 'gin' not in sys.modules:
    gin = types.ModuleType('gin')

    def configurable(name_or_fn=None, *args, **kwargs):
      if callable(name_or_fn):
        return name_or_fn
      return lambda fn: fn

    gin.configurable = configurable
    gin.tf = types.ModuleType('gin.tf')
    sys.modules['gin'] = gin
    sys.modules['gin.tf'] = gin.tf
  if 'tensorflow_addons' not in sys.modules:
    from tf_oracle import tf_dense_image_warp_backward
    tfa = types.ModuleType('tensorflow_addons')
    tfa_image = types.ModuleType('tensorflow_addons.image')

    def dense_image_warp(image, flow):
      # tfa convention: out(y, x) samples image at (y - flow[...,0],
      # x - flow[...,1]); tf_dense_image_warp_backward takes additive
      # (dx, dy) flow, so negate and swap.
      flow_xy = tf.stack([-flow[..., 1], -flow[..., 0]], axis=-1)
      return tf_dense_image_warp_backward(image, flow_xy)

    tfa_image.dense_image_warp = dense_image_warp
    tfa.image = tfa_image
    sys.modules['tensorflow_addons'] = tfa
    sys.modules['tensorflow_addons.image'] = tfa_image


def _load_reference_film_net():
  """Imports the reference film_net as a package (it ships no __init__)."""
  _install_shims()
  import importlib
  if 'ref_models' not in sys.modules:
    pkg = types.ModuleType('ref_models')
    pkg.__path__ = [os.path.join(REF, 'models')]
    sys.modules['ref_models'] = pkg
    sub = types.ModuleType('ref_models.film_net')
    sub.__path__ = [os.path.join(REF, 'models', 'film_net')]
    sys.modules['ref_models.film_net'] = sub
  return importlib.import_module('ref_models.film_net.interpolator')


@needs_reference
class TestAgainstReferenceCode:

  @pytest.fixture(scope='class')
  def reference_bundle(self, tmp_path_factory):
    """Builds the reference Keras model and checkpoints its random init."""
    import tensorflow as tf
    interpolator_lib = _load_reference_film_net()
    ref_options_lib = sys.modules['ref_models.film_net.options']
    config = ref_options_lib.Options(
        pyramid_levels=4,
        fusion_pyramid_levels=3,
        specialized_levels=2,
        flow_convs=[1, 1, 1],
        flow_filters=[8, 8, 8],
        sub_levels=3,
        filters=4,
        use_aux_outputs=True)
    x0 = tf.keras.Input(shape=(None, None, 3), batch_size=None, name='x0')
    x1 = tf.keras.Input(shape=(None, None, 3), batch_size=None, name='x1')
    t = tf.keras.Input(shape=(1,), batch_size=None, name='time')
    model = interpolator_lib.create_model(x0, x1, t, config)
    ckpt_dir = str(tmp_path_factory.mktemp('ref_ckpt'))
    ckpt = tf.train.Checkpoint(model=model)
    ckpt.save(os.path.join(ckpt_dir, 'ckpt'))
    return model, ckpt_dir

  def _inputs(self, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(1, H, W, 3).astype(np.float32),
            rng.rand(1, H, W, 3).astype(np.float32),
            np.full((1, 1), 0.5, np.float32))

  def test_forward_parity_with_reference_model(self, reference_bundle):
    from frame_interpolation_tpu.io import tf_import
    from frame_interpolation_tpu.models.film_net import FilmNet
    from frame_interpolation_tpu.options import Options

    model, ckpt_dir = reference_bundle
    opts = Options.tiny()
    params, _ = tf_import.load_tf_params(ckpt_dir, opts)

    x0, x1, t = self._inputs()
    want = model({'x0': x0, 'x1': x1, 'time': t})['image'].numpy()
    ours = FilmNet(opts)
    got = np.asarray(
        ours.apply({'params': params}, x0, x1, t)['image'], np.float32)

    err = float(np.max(np.abs(want - got)))
    mse = float(np.mean((want - got) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-20))
    assert psnr >= 50.0, f'PSNR {psnr:.1f} dB (max abs err {err:.2e})'

  def test_aux_outputs_match_reference_model(self, reference_bundle):
    from frame_interpolation_tpu.io import tf_import
    from frame_interpolation_tpu.models.film_net import FilmNet
    from frame_interpolation_tpu.options import Options

    model, ckpt_dir = reference_bundle
    opts = Options.tiny()
    params, _ = tf_import.load_tf_params(ckpt_dir, opts)
    x0, x1, t = self._inputs(seed=3)
    theirs = model({'x0': x0, 'x1': x1, 'time': t})
    ours = FilmNet(opts).apply({'params': params}, x0, x1, t)
    for key in ('x0_warped', 'x1_warped'):
      assert key in theirs and key in ours
      np.testing.assert_allclose(np.asarray(ours[key], np.float32),
                                 theirs[key].numpy(), atol=5e-5,
                                 err_msg=key)

  def test_reference_output_keys_covered(self, reference_bundle):
    # Every output the reference model exposes must exist in ours.
    from frame_interpolation_tpu.io import tf_import
    from frame_interpolation_tpu.models.film_net import FilmNet
    from frame_interpolation_tpu.options import Options
    model, ckpt_dir = reference_bundle
    opts = Options.tiny()
    params, _ = tf_import.load_tf_params(ckpt_dir, opts)
    x0, x1, t = self._inputs(seed=5)
    theirs = model({'x0': x0, 'x1': x1, 'time': t})
    ours = FilmNet(opts).apply({'params': params}, x0, x1, t)
    missing = set(theirs.keys()) - set(ours.keys())
    assert not missing, f'missing outputs: {sorted(missing)}'
