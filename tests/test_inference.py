"""Tests for the inference drivers and host-side I/O."""
import os

import numpy as np
import pytest

import jax

from frame_interpolation_tpu.inference import (Interpolator,
                                               interpolate_frontier,
                                               interpolate_recursively,
                                               num_interpolated_frames,
                                               num_output_frames)
from frame_interpolation_tpu.io import images
from frame_interpolation_tpu.models.film_net import FilmNet, init_params
from frame_interpolation_tpu.options import Options

OPTS = Options.tiny()


@pytest.fixture(scope='module')
def interp():
  model = FilmNet(OPTS)
  params = init_params(model, jax.random.PRNGKey(0))
  return Interpolator(params, OPTS, align=OPTS.align)


def _frames(n, h=16, w=24, seed=0):
  rng = np.random.RandomState(seed)
  return [rng.rand(h, w, 3).astype(np.float32) for _ in range(n)]


class TestRecursion:

  def test_counts(self):
    assert num_output_frames(4, 3) == 3 * 8 + 1
    assert num_interpolated_frames(4, 3) == 3 * 7

  @pytest.mark.parametrize('n_inputs,times', [(2, 1), (2, 2), (3, 2)])
  def test_frontier_matches_recursive(self, interp, n_inputs, times):
    frames = _frames(n_inputs)
    recursive = list(interpolate_recursively(frames, times, interp))
    frontier = interpolate_frontier(frames, times, interp, max_batch=3)
    assert len(recursive) == num_output_frames(n_inputs, times)
    assert len(frontier) == len(recursive)
    for i, (a, b) in enumerate(zip(recursive, frontier)):
      np.testing.assert_allclose(a, b, atol=2e-6, err_msg=f'frame {i}')

  def test_recursive_is_time_ordered_superset(self, interp):
    frames = _frames(2, seed=5)
    out = list(interpolate_recursively(frames, 1, interp))
    assert len(out) == 3
    np.testing.assert_array_equal(out[0], frames[0])
    np.testing.assert_array_equal(out[2], frames[1])

  def test_progress_callback_counts(self, interp):
    frames = _frames(3, seed=2)
    count = [0]
    list(interpolate_recursively(frames, 2, interp,
                                 progress=lambda n: count.__setitem__(
                                     0, count[0] + n)))
    assert count[0] == num_interpolated_frames(3, 2)


class TestImageIO:

  def test_read_write_roundtrip(self, tmp_path):
    rng = np.random.RandomState(1)
    image = rng.rand(20, 30, 3).astype(np.float32)
    path = str(tmp_path / 'img.png')
    images.write_image(path, image)
    back = images.read_image(path)
    assert back.shape == (20, 30, 3)
    # PNG is lossless in uint8; error bounded by quantization.
    np.testing.assert_allclose(back, image, atol=1.0 / 255.0 + 1e-6)

  def test_write_rounds_half_up(self, tmp_path):
    # The reference adds 0.5 before the uint8 cast (eval/util.py:52-54).
    value = 100.4999 / 255.0
    img = np.full((4, 4, 3), value, np.float32)
    path = str(tmp_path / 'r.png')
    images.write_image(path, img)
    assert int(images.read_image(path)[0, 0, 0] * 255 + 0.5) == 100

  def test_jpeg_extension(self, tmp_path):
    image = np.zeros((8, 8, 3), np.float32)
    path = str(tmp_path / 'img.jpg')
    images.write_image(path, image)
    assert os.path.getsize(path) > 0

  def test_natural_sort(self):
    names = ['frame_10.png', 'frame_2.png', 'frame_1.png']
    assert images.natural_sort(names) == [
        'frame_1.png', 'frame_2.png', 'frame_10.png']
