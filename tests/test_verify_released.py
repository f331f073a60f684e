"""Tests for the released-checkpoint parity gate (cli/verify_released.py).

Runs the gate end-to-end against the tf_oracle-generated stand-in
SavedModel (the same artifact shape as the release): import check, forward
agreement vs the TF model's own output, and the benchmark mean-PSNR delta
— all three must pass, and a weight-perturbed model must fail the
agreement check.
"""
import json
import os

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

from frame_interpolation_tpu.cli import verify_released  # noqa: E402
from frame_interpolation_tpu.data import records, tfrecord  # noqa: E402
from frame_interpolation_tpu.io import images  # noqa: E402
from frame_interpolation_tpu.options import Options  # noqa: E402
import tf_oracle  # noqa: E402  (tests dir is on sys.path under pytest)

pytestmark = pytest.mark.slow  # model compiles dominate runtime

OPTS = Options(
    pyramid_levels=4,
    fusion_pyramid_levels=3,
    specialized_levels=2,
    flow_convs=(2, 2, 2),
    flow_filters=(8, 16, 16),
    sub_levels=3,
    filters=4,
    use_aux_outputs=True,
)
H, W = 32, 48


@pytest.fixture(scope='module')
def artifacts(tmp_path_factory):
  root = tmp_path_factory.mktemp('gate')
  oracle = tf_oracle.OracleFilmNet(OPTS, seed=3)
  sm_dir = str(root / 'saved_model')
  tf_oracle.save_oracle_saved_model(oracle, OPTS, sm_dir, H, W)

  rng = np.random.RandomState(0)
  frame1 = str(root / 'one.png')
  frame2 = str(root / 'two.png')
  images.write_image(frame1, rng.rand(H, W, 3).astype(np.float32))
  images.write_image(frame2, rng.rand(H, W, 3).astype(np.float32))

  rec = str(root / 'eval.tfrecord')
  with tfrecord.TFRecordWriter(tfrecord.shard_filename(rec, 0, 1)) as w:
    for i in range(3):
      frames = [rng.randint(0, 256, (H, W, 3), np.uint8) for _ in range(3)]
      w.write(records.make_triplet_example(frames, path=f'ex_{i}.png'))
  return {'saved_model': sm_dir, 'frame1': frame1, 'frame2': frame2,
          'tfrecord': f'{rec}@1'}


class TestGate:

  def test_full_gate_passes(self, artifacts):
    result = verify_released.run_gate(
        artifacts['saved_model'], artifacts['frame1'], artifacts['frame2'],
        artifacts['tfrecord'], options=OPTS)
    assert result['pass'], json.dumps(result)
    assert result['checks_run'] == 4  # nothing skipped: TF is available
    assert result['checks']['forward_smoke']['pass']
    agreement = result['checks']['forward_agreement']
    assert agreement['psnr_db'] >= 50.0
    delta = result['checks']['benchmark_delta']
    assert delta['num_examples'] == 3
    assert delta['delta_db'] < 0.05

  def test_gate_catches_wrong_weights(self, artifacts, tmp_path):
    """A perturbed model must fail forward agreement vs the original TF."""
    perturbed = tf_oracle.OracleFilmNet(OPTS, seed=99)  # different weights
    sm_dir = str(tmp_path / 'wrong_sm')
    tf_oracle.save_oracle_saved_model(perturbed, OPTS, sm_dir, H, W)
    # Gate the WRONG import (perturbed) against the frames, but compare to
    # the wrong model's own TF forward — that still agrees. Instead verify
    # the benchmark delta catches a cross-model mismatch by comparing the
    # perturbed import against the ORIGINAL model's TF forward.
    import dataclasses

    from frame_interpolation_tpu.inference import Interpolator
    from frame_interpolation_tpu.io import tf_import
    params, opts = tf_import.load_tf_params(sm_dir, OPTS)
    interp = Interpolator(params, dataclasses.replace(opts), align=64)
    tf_forward = verify_released._tf_forward_fn(artifacts['saved_model'])
    x0 = images.read_image(artifacts['frame1'])[None]
    x1 = images.read_image(artifacts['frame2'])[None]
    ours = interp.interpolate(x0, x1, np.full((1,), 0.5, np.float32))
    theirs = tf_forward(x0, x1)
    db = verify_released._psnr(np.clip(ours, 0, 1), np.clip(theirs, 0, 1))
    assert db < 50.0  # different weights cannot clear the agreement bar

  def test_skips_reported_without_tf_paths(self, artifacts):
    result = verify_released.run_gate(artifacts['saved_model'],
                                      options=OPTS)
    assert result['pass']  # import-only gate
    assert result['checks_run'] == 1
    assert 'skipped' in result['checks']['forward_smoke']
    assert 'skipped' in result['checks']['forward_agreement']
    assert 'skipped' in result['checks']['benchmark_delta']

  def test_import_failure_reported(self, tmp_path):
    result = verify_released.run_gate(str(tmp_path / 'nope'))
    assert not result['pass']
    assert not result['checks']['import']['pass']
    assert 'error' in result['checks']['import']
