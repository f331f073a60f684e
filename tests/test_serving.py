"""Tests for the serving Predictor and aux subsystems."""
import os

import numpy as np
import pytest

import jax

from frame_interpolation_tpu.io import images, params_io
from frame_interpolation_tpu.models.film_net import FilmNet, init_params
from frame_interpolation_tpu.options import Options
from frame_interpolation_tpu.parallel import distributed
from frame_interpolation_tpu.serving import Predictor
from frame_interpolation_tpu.utils import profiling

pytestmark = pytest.mark.slow  # model compiles dominate runtime

OPTS = Options.tiny()


@pytest.fixture(scope='module')
def bundle(tmp_path_factory):
  path = str(tmp_path_factory.mktemp('bundle'))
  params = init_params(FilmNet(OPTS), jax.random.PRNGKey(0))
  params_io.save_params(path, params, OPTS)
  return path


@pytest.fixture()
def frames(tmp_path):
  rng = np.random.RandomState(0)
  paths = []
  for i, shape in enumerate([(24, 32, 3), (26, 34, 3)]):
    p = str(tmp_path / f'f{i}.png')
    images.write_image(p, rng.rand(*shape).astype(np.float32))
    paths.append(p)
  return paths


class TestPredictor:

  def test_single_frame(self, bundle, frames, tmp_path):
    predictor = Predictor(bundle, align=OPTS.align)
    out = predictor.predict(frames[0], frames[1], times_to_interpolate=1,
                            output_dir=str(tmp_path))
    assert out.endswith('.png') and os.path.getsize(out) > 0
    # Size-mismatched inputs are cropped to the common region.
    img = images.read_image(out)
    assert img.shape == (24, 32, 3)

  def test_rejects_bad_extension(self, bundle, tmp_path):
    predictor = Predictor(bundle)
    predictor.interpolator = object()  # avoid load
    bad = str(tmp_path / 'x.bmp')
    with pytest.raises(ValueError):
      predictor.predict(bad, bad)

  def test_rejects_bad_times(self, bundle, frames):
    predictor = Predictor(bundle)
    predictor.interpolator = object()
    with pytest.raises(ValueError):
      predictor.predict(frames[0], frames[1], times_to_interpolate=9)


class TestDistributed:

  def test_single_host_noop(self):
    distributed.initialize_multihost()  # must not raise

  def test_process_batch_slice(self):
    start, size = distributed.process_batch_slice(8)
    per = 8 // jax.process_count()
    assert size == per
    assert start == jax.process_index() * per


class TestProfiling:

  def test_trace_if_none_noop(self):
    with profiling.trace_if(None):
      pass

  def test_step_timer(self):
    timer = profiling.StepTimer(interval=10)
    assert timer.update(5) is None
    rate = timer.update(10)
    assert rate is not None and rate > 0
    assert timer.update(11) is None


class TestCogAdapter:

  def test_cog_adapter_is_valid_python(self):
    """cog isn't installed here; at least pin the adapter's syntax and
    that it only maps IO onto the cog-free Predictor."""
    import ast
    import frame_interpolation_tpu.serving as serving
    path = os.path.join(os.path.dirname(serving.__file__),
                        'cog_predict.py')
    tree = ast.parse(open(path).read())
    classes = [n.name for n in ast.walk(tree)
               if isinstance(n, ast.ClassDef)]
    assert 'CogPredictor' in classes

  def test_cog_yaml_points_at_adapter(self):
    import frame_interpolation_tpu.serving as serving
    text = open(os.path.join(os.path.dirname(serving.__file__),
                             'cog.yaml')).read()
    assert 'cog_predict.py:CogPredictor' in text
