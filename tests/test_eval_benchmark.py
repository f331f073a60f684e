"""Function-level tests of the benchmark evaluation loop (results.csv)."""
import os

import numpy as np
import pytest

import jax

from frame_interpolation_tpu.cli import eval_benchmark
from frame_interpolation_tpu.data import records, tfrecord
from frame_interpolation_tpu.inference import Interpolator
from frame_interpolation_tpu.models.film_net import FilmNet, init_params
from frame_interpolation_tpu.options import Options

pytestmark = pytest.mark.slow  # model compiles dominate runtime

OPTS = Options.tiny()


@pytest.fixture(scope='module')
def eval_tfrecord(tmp_path_factory):
  path = str(tmp_path_factory.mktemp('rec') / 'eval.tfrecord')
  rng = np.random.RandomState(0)
  with tfrecord.TFRecordWriter(
      tfrecord.shard_filename(path, 0, 1)) as writer:
    for i in range(4):
      frames = [rng.randint(0, 256, (24, 40, 3), np.uint8)
                for _ in range(3)]
      writer.write(records.make_triplet_example(
          frames, path=f'clips/example_{i:02d}.png'))
  return f'{path}@1'


@pytest.fixture(scope='module')
def interp():
  params = init_params(FilmNet(OPTS), jax.random.PRNGKey(0))
  return Interpolator(params, OPTS, align=OPTS.align)


class TestRunEvaluation:

  def test_results_csv_format(self, interp, eval_tfrecord, tmp_path):
    out_dir = str(tmp_path / 'out')
    totals = eval_benchmark.run_evaluation(
        interp, eval_tfrecord, out_dir, max_examples=-1,
        metrics=['l1', 'psnr', 'ssim'], model_description='test-model')
    assert set(totals) == {'l1', 'psnr', 'ssim'}
    lines = open(os.path.join(out_dir, 'results.csv')).read().splitlines()
    assert lines[0] == 'key, l1, psnr, ssim'
    assert len(lines) == 1 + 4 + 1  # header + examples + mean
    assert lines[1].startswith('example_00, ')
    assert lines[-1].startswith('mean, ')
    mean_values = [float(v) for v in lines[-1].split(',')[1:]]
    np.testing.assert_allclose(
        mean_values, [totals['l1'], totals['psnr'], totals['ssim']],
        rtol=1e-6)
    readme = open(os.path.join(out_dir, 'readme.txt')).read()
    assert 'test-model' in readme and eval_tfrecord in readme

  def test_batched_eval_rows_match_batch1(self, interp, eval_tfrecord,
                                          tmp_path):
    """batch_size>1 must still write one correctly-keyed row PER example."""
    out1 = str(tmp_path / 'b1')
    out3 = str(tmp_path / 'b3')
    totals1 = eval_benchmark.run_evaluation(
        interp, eval_tfrecord, out1, max_examples=-1, metrics=['l1', 'psnr'])
    totals3 = eval_benchmark.run_evaluation(
        interp, eval_tfrecord, out3, max_examples=-1, metrics=['l1', 'psnr'],
        batch_size=3)  # 4 examples -> batches of 3 + 1
    lines1 = open(os.path.join(out1, 'results.csv')).read().splitlines()
    lines3 = open(os.path.join(out3, 'results.csv')).read().splitlines()
    assert len(lines3) == 1 + 4 + 1  # header + one row per example + mean
    keys3 = [line.split(',')[0] for line in lines3[1:-1]]
    assert keys3 == [f'example_{i:02d}' for i in range(4)]
    for l1, l3 in zip(lines1[1:], lines3[1:]):
      k1, *v1 = l1.split(',')
      k3, *v3 = l3.split(',')
      assert k1 == k3
      np.testing.assert_allclose([float(v) for v in v1],
                                 [float(v) for v in v3], rtol=1e-4)
    for name in totals1:
      np.testing.assert_allclose(totals3[name], totals1[name], rtol=1e-4)

  def test_max_examples_and_frame_dumps(self, interp, eval_tfrecord,
                                        tmp_path):
    out_dir = str(tmp_path / 'dumps')
    eval_benchmark.run_evaluation(
        interp, eval_tfrecord, out_dir, max_examples=2, metrics=['l1'],
        output_frames=True)
    lines = open(os.path.join(out_dir, 'results.csv')).read().splitlines()
    assert len(lines) == 1 + 2 + 1
    pngs = [f for f in os.listdir(out_dir) if f.endswith('.png')]
    # image + warped aux + x0/x1/y per example, at least image & y.
    assert any('image' in f for f in pngs)
    assert any(f.endswith('_y.png') for f in pngs)
