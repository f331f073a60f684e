r"""Released-checkpoint parity gate: one command, one pass/fail JSON line.

The reference's value proposition is running the released L1/VGG/Style
models (google-research/frame-interpolation README.md:228-236); this gate
verifies, given a mounted release artifact, that this framework reproduces
them:

  1. **import** — the TF SavedModel / TF checkpoint maps onto the flax
     model (io/tf_import.py) with every weight consumed and shape-checked;
  2. **forward agreement** — the mid-frame on a photo pair agrees with the
     TF SavedModel's own output at >= --min_agreement_db PSNR (default 50,
     the bar tests/test_reference_parity.py holds against the reference's
     Keras code on random weights);
  3. **benchmark delta** — mean PSNR over an eval TFRecord (e.g. the
     Middlebury one from cli/create_middlebury_tfrecord.py) differs from
     the TF SavedModel's mean by < --max_benchmark_delta_db (default 0.05,
     the BASELINE.json north-star fidelity budget).

Checks 2 and 3 need TensorFlow importable and a SavedModel (not a bare
checkpoint); absent either, they report "skipped" and the gate passes on
the import check alone (stated in the output). Typical invocation once the
release artifacts are mounted:

  python3 -m frame_interpolation_tpu.cli.verify_released \
    --model_path /path/to/saved_model \
    --frame1 photos/one.png --frame2 photos/two.png \
    --tfrecord middlebury.tfrecord@3

Exit status 0 iff every non-skipped check passes.
"""
from __future__ import annotations

import json
import sys
from typing import Dict, Optional

import numpy as np
from absl import app, flags

from ._common import apply_platform_flag, define_flag

# define_flag: co-importable with the other CLIs (shared --model_path/
# --tfrecord/... names live in absl's process-global registry).
_MODEL_PATH = define_flag(
    flags.DEFINE_string, 'model_path', None,
    'Released TF SavedModel dir (or TF checkpoint dir / native bundle; '
    'those support the import check only).')
_FRAME1 = define_flag(flags.DEFINE_string, 'frame1', None,
                      'First photo of the agreement-check pair.')
_FRAME2 = define_flag(flags.DEFINE_string, 'frame2', None,
                      'Second photo of the agreement-check pair.')
_TFRECORD = define_flag(
    flags.DEFINE_string, 'tfrecord', None,
    "Eval TFRecord spec ('file' or 'file@N') for the benchmark-delta check.")
_MAX_EXAMPLES = define_flag(
    flags.DEFINE_integer, 'max_examples', -1,
    'Benchmark-delta example limit; -1 = all.')
_MIN_AGREEMENT_DB = define_flag(
    flags.DEFINE_float, 'min_agreement_db', 50.0,
    'Forward-agreement PSNR bar (dB).')
_MAX_BENCHMARK_DELTA_DB = define_flag(
    flags.DEFINE_float, 'max_benchmark_delta_db', 0.05,
    'Benchmark mean-PSNR delta budget (dB).')
_DTYPE_POLICY = define_flag(
    flags.DEFINE_string, 'dtype_policy', 'float32',
    "Forward precision ('float32' keeps the check strict; 'bfloat16' "
    'verifies the serving policy instead).')
_PLATFORM = define_flag(flags.DEFINE_string, 'platform', None,
                        "Force a JAX platform (e.g. 'cpu').")

_ALIGN = 64


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
  mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
  if mse == 0.0:
    return float('inf')
  return float(10.0 * np.log10(1.0 / mse))


def _tf_forward_fn(model_path: str):
  """The released SavedModel's own forward (pad -> call -> crop), or None.

  Reproduces how the reference drives it (eval/interpolator.py:172-206):
  align-pad both frames, call the model with {'x0','x1','time'}, crop the
  'image' output back.
  """
  try:
    import tensorflow as tf  # noqa: F401
  except ImportError:
    return None
  from ..io import params_io
  if not params_io.is_tf_saved_model(model_path):
    return None
  import tensorflow as tf
  from ..ops import tiling

  model = tf.saved_model.load(model_path)

  def forward(x0: np.ndarray, x1: np.ndarray) -> np.ndarray:
    x0p, bbox = tiling.pad_to_align(x0, _ALIGN)
    x1p, _ = tiling.pad_to_align(x1, _ALIGN)
    inputs = {
        'x0': tf.constant(np.asarray(x0p), tf.float32),
        'x1': tf.constant(np.asarray(x1p), tf.float32),
        'time': tf.constant(np.full((x0.shape[0], 1), 0.5, np.float32)),
    }
    try:
      # How the reference drives Keras SavedModels (eval/interpolator.py:198).
      out = model(inputs, training=False)
    except (TypeError, AttributeError, ValueError):
      out = model.signatures['serving_default'](**inputs)
    image = out['image'].numpy()
    return np.asarray(tiling.crop_to_bounding_box(image, **bbox))

  return forward


def run_gate(model_path: str,
             frame1: Optional[str] = None,
             frame2: Optional[str] = None,
             tfrecord_spec: Optional[str] = None,
             max_examples: int = -1,
             min_agreement_db: float = 50.0,
             max_benchmark_delta_db: float = 0.05,
             dtype_policy: str = 'float32',
             options=None) -> Dict:
  """Runs every available check; returns the result dict (see module doc).

  `options` overrides the model config (default: auto — released config for
  TF artifacts, the stored config for native bundles); tests use it to gate
  against small oracle models.
  """
  checks: Dict[str, Dict] = {}

  # 1. Import: load_params shape-checks and consumes every variable.
  try:
    if options is not None:
      import dataclasses

      from ..inference import Interpolator
      from ..io import tf_import
      params, opts = tf_import.load_tf_params(model_path, options)
      opts = dataclasses.replace(opts, dtype_policy=dtype_policy)
      interp = Interpolator(params, opts, align=_ALIGN)
    else:
      from ..inference import load_interpolator
      interp = load_interpolator(model_path, align=_ALIGN,
                                 dtype_policy=dtype_policy)
    checks['import'] = {'pass': True}
  except Exception as e:
    checks['import'] = {'pass': False,
                        'error': f'{type(e).__name__}: {e}'}
    return {'pass': False, 'checks': checks}

  tf_forward = _tf_forward_fn(model_path)
  skip_reason = ('tensorflow or SavedModel signature unavailable'
                 if tf_forward is None else None)

  # 2. Forward smoke + agreement on a photo pair. The smoke half always
  # runs when frames are given (even for bare-checkpoint artifacts where
  # the TF SavedModel forward is unavailable): the imported weights must
  # produce a finite, correctly-shaped, deterministic mid-frame — so a
  # future round with only a checkpoint mounted still gets an end-to-end
  # exercise of the imported model in one command.
  if frame1 and frame2:
    from ..io import images
    x0 = images.read_image(frame1)[None]
    x1 = images.read_image(frame2)[None]
    ours = interp.interpolate(x0, x1, np.full((1,), 0.5, np.float32))
    ours2 = interp.interpolate(x0, x1, np.full((1,), 0.5, np.float32))
    checks['forward_smoke'] = {
        'finite': bool(np.isfinite(ours).all()),
        'shape_ok': bool(ours.shape == x0.shape),
        'deterministic': bool(np.array_equal(ours, ours2)),
        'pass': bool(np.isfinite(ours).all() and ours.shape == x0.shape
                     and np.array_equal(ours, ours2))}
    if tf_forward is None:
      checks['forward_agreement'] = {'skipped': skip_reason}
    else:
      theirs = tf_forward(x0, x1)
      db = _psnr(np.clip(ours, 0.0, 1.0), np.clip(theirs, 0.0, 1.0))
      checks['forward_agreement'] = {
          'psnr_db': round(db, 2), 'min_db': min_agreement_db,
          'pass': bool(db >= min_agreement_db)}
  else:
    checks['forward_smoke'] = {'skipped': 'no --frame1/--frame2'}
    checks['forward_agreement'] = {'skipped': 'no --frame1/--frame2'}

  # 3. Benchmark mean-PSNR delta over an eval TFRecord.
  if tfrecord_spec:
    if tf_forward is None:
      checks['benchmark_delta'] = {'skipped': skip_reason}
    else:
      from ..data import dataset as dataset_lib
      ours_psnr, tf_psnr = [], []
      for example in dataset_lib.eval_dataset(
          tfrecord_spec, batch_size=1, max_examples=max_examples,
          with_path=False):
        x0, x1, y = example['x0'], example['x1'], example['y']
        ours = interp.interpolate(x0, x1, example['time'][:, 0])
        theirs = tf_forward(x0, x1)
        ours_psnr.append(_psnr(np.clip(ours, 0.0, 1.0), y))
        tf_psnr.append(_psnr(np.clip(theirs, 0.0, 1.0), y))
      delta = abs(float(np.mean(ours_psnr)) - float(np.mean(tf_psnr)))
      checks['benchmark_delta'] = {
          'ours_mean_psnr_db': round(float(np.mean(ours_psnr)), 4),
          'tf_mean_psnr_db': round(float(np.mean(tf_psnr)), 4),
          'delta_db': round(delta, 4),
          'max_delta_db': max_benchmark_delta_db,
          'num_examples': len(ours_psnr),
          'pass': bool(delta < max_benchmark_delta_db)}
  else:
    checks['benchmark_delta'] = {'skipped': 'no --tfrecord'}

  ran = [c for c in checks.values() if 'pass' in c]
  return {'pass': all(c['pass'] for c in ran),
          'checks_run': len(ran), 'checks': checks}


def main(argv):
  del argv
  if not _MODEL_PATH.value:
    raise app.UsageError('--model_path is required.')
  apply_platform_flag(_PLATFORM.value)
  result = run_gate(
      _MODEL_PATH.value, _FRAME1.value, _FRAME2.value, _TFRECORD.value,
      _MAX_EXAMPLES.value, _MIN_AGREEMENT_DB.value,
      _MAX_BENCHMARK_DELTA_DB.value, _DTYPE_POLICY.value)
  print(json.dumps(result))
  sys.exit(0 if result['pass'] else 1)


def cli():
  """Console-script entry point (pyproject.toml)."""
  app.run(main)


if __name__ == '__main__':
  app.run(main)
