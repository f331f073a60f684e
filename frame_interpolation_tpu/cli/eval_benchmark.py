r"""Benchmark evaluation CLI (PSNR/SSIM on triplet TFRecords).

Equivalent of the reference's eval_cli (eval/eval_cli.py in
google-research/frame-interpolation): iterates an eval TFRecord at batch 1,
clips predictions to [0, 1] before metrics, writes per-example rows plus a
mean row into `results.csv`, optional image dumps of every image-shaped
output tensor, and a `readme.txt` provenance file.

  python3 -m frame_interpolation_tpu.cli.eval_benchmark \
    --params <bundle or SavedModel> --tfrecord middlebury.tfrecord@3 \
    --output_dir /tmp/middlebury_eval --metrics l1,l2,ssim,psnr
"""
from __future__ import annotations

import os
from typing import Dict, List

import numpy as np
from absl import app, flags, logging

from ._common import (apply_platform_flag, define_flag,
                      load_interpolator_from_flag)

_PARAMS = define_flag(flags.DEFINE_string,
    'params', None, "Parameter bundle / TF SavedModel path, or 'random'.",
    required=True)
_TFRECORD = define_flag(flags.DEFINE_string, 'tfrecord', None,
                                "Eval TFRecord spec ('file' or 'file@N').")
_GIN_CONFIG = define_flag(flags.DEFINE_string,
    'gin_config', None,
    'Path to a reference-style eval gin file (supplies tfrecord, metrics, '
    'max_examples — compatibility with the reference eval_cli).')
_OUTPUT_DIR = define_flag(flags.DEFINE_string, 'output_dir', None,
                                  'Directory for results.csv and frames.',
                                  required=True)
_MAX_EXAMPLES = define_flag(flags.DEFINE_integer, 'max_examples', -1,
                                     'Limit of examples; -1 = all.')
_METRICS = define_flag(flags.DEFINE_list,
    'metrics', ['l1', 'l2', 'ssim', 'psnr'],
                             'Metric names (losses registry).')
_OUTPUT_FRAMES = define_flag(flags.DEFINE_boolean,
    'output_frames', False,
    'Dump every image-shaped tensor of each example as PNG.')
_BATCH_SIZE = define_flag(flags.DEFINE_integer,
    'batch_size', 1, 'Eval batch size.')
_PLATFORM = define_flag(flags.DEFINE_string,
    'platform', None,
    "Force a JAX platform (e.g. 'cpu'); default uses the best available.")


def run_evaluation(interpolator, tfrecord: str, output_dir: str,
                   max_examples: int, metrics: List[str],
                   output_frames: bool = False,
                   batch_size: int = 1,
                   model_description: str = '') -> Dict[str, float]:
  """Runs the benchmark loop; returns {metric: mean}."""
  import jax.numpy as jnp

  from .. import losses as losses_lib
  from ..data import dataset as dataset_lib
  from ..io import images

  os.makedirs(output_dir, exist_ok=True)
  with open(os.path.join(output_dir, 'readme.txt'), 'w') as f:
    print('Results for:', file=f)
    print(f' model:   {model_description}', file=f)
    print(f' tfrecord: {tfrecord}', file=f)

  test_losses = losses_lib.test_losses(list(metrics),
                                       loss_weights=[1.0] * len(metrics))
  all_losses: Dict[str, List[float]] = {name: [] for name in test_losses}

  with open(os.path.join(output_dir, 'results.csv'), 'w') as csv_file:
    print(', '.join(['key'] + list(test_losses)), file=csv_file)
    for example in dataset_lib.eval_dataset(tfrecord, batch_size=batch_size,
                                            max_examples=max_examples,
                                            with_path=True):
      outputs = interpolator.interpolate_all_outputs(
          example['x0'], example['x1'], example['time'][:, 0])
      # Clip only for metrics, as the reference does (eval_cli.py:160-166).
      prediction = {'image': jnp.clip(jnp.asarray(outputs['image']), 0.0,
                                      1.0)}
      for name in ('x0_warped', 'x1_warped'):
        if name in outputs:
          prediction[name] = jnp.asarray(outputs[name])
      batch_y = jnp.asarray(example['y'])

      # Frame dumps: convert each batch tensor to host numpy ONCE, not
      # once per example inside the row loop.
      dump_tensors = {}
      if output_frames:
        combined = dict(outputs)
        combined.update(
            {k: v for k, v in example.items() if not isinstance(v, list)})
        for name, tensor in combined.items():
          try:
            tensor = np.asarray(tensor)
          except ValueError:  # ragged non-image entries (e.g. path tuples)
            continue
          if tensor.ndim == 4 and tensor.shape[-1] in (1, 3):
            dump_tensors[name] = tensor

      # One csv row PER EXAMPLE regardless of batch size: the device batch
      # only amortizes dispatch; metrics are per-example, matching the
      # reference's row format (eval_cli.py:160-170).
      for i in range(int(batch_y.shape[0])):
        paths = example.get('path') or []
        path = paths[i] if i < len(paths) else ''
        key = path.rsplit('.', 1)[0].rsplit(os.sep)[-1] if path else (
            f'example_{sum(len(v) for v in all_losses.values()):05d}')

        for name, tensor in dump_tensors.items():
          images.write_image(
              os.path.join(output_dir, f'{key}_{name}.png'), tensor[i])

        prediction_i = {k: v[i:i + 1] for k, v in prediction.items()}
        metric_example = {'y': batch_y[i:i + 1]}
        row = []
        for loss_name, (loss_fn, weight_fn) in test_losses.items():
          value = float(loss_fn(metric_example, prediction_i) * weight_fn(0))
          row.append(value)
          all_losses[loss_name].append(value)
        print(f'{key}, ' + ', '.join(str(v) for v in row), file=csv_file)

    totals = {name: float(np.mean(values)) if values else float('nan')
              for name, values in all_losses.items()}
    if any(values for values in all_losses.values()):
      print('mean, ' + ', '.join(str(totals[name]) for name in test_losses),
            file=csv_file)
  logging.info('mean, %s', totals)
  return totals


def main(argv):
  del argv
  apply_platform_flag(_PLATFORM.value)
  tfrecord_spec = _TFRECORD.value
  metrics = list(_METRICS.value)
  max_examples = _MAX_EXAMPLES.value
  if _GIN_CONFIG.value:
    from ..training.configs import gin_compat
    eval_config = gin_compat.load_eval_gin(_GIN_CONFIG.value)
    tfrecord_spec = tfrecord_spec or eval_config.tfrecord
    metrics = list(eval_config.metrics)
    max_examples = eval_config.max_examples
  if not tfrecord_spec:
    raise ValueError('Provide --tfrecord or --gin_config.')
  interpolator = load_interpolator_from_flag(_PARAMS.value, align=64,
                                             block_shape=None)
  totals = run_evaluation(
      interpolator, tfrecord_spec, _OUTPUT_DIR.value,
      max_examples, metrics,
      output_frames=_OUTPUT_FRAMES.value, batch_size=_BATCH_SIZE.value,
      model_description=_PARAMS.value)
  print('mean:', ', '.join(f'{k}={v:.6f}' for k, v in totals.items()))


def cli():
  """Console-script entry point (pyproject.toml)."""
  app.run(main)


if __name__ == '__main__':
  app.run(main)
