"""In-training evaluation loop.

Mirrors training/eval_lib.py of google-research/frame-interpolation: for
each named eval dataset, run the model over every batch, update the metric
set, summarize the first `max_summary_batches` batches as image grids, and
write per-dataset scalar summaries. As in the reference, metrics see the
RAW prediction and images are clipped to [0, 1] only for summaries
(eval_lib.py:108-122).
"""
from __future__ import annotations

from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from .. import losses as losses_lib
from ..data.dataset import EvalDataset
from ..models.film_net import FilmNet
from . import metrics_lib


def eval_loop(model: FilmNet,
              params,
              datasets: Mapping[str, EvalDataset],
              metrics_fns: Mapping[str, metrics_lib.MetricFn],
              step: int,
              writer=None,
              max_summary_batches: int = 10,
              log_fn=print) -> Dict[str, Dict[str, float]]:
  """Evaluates all datasets; returns {dataset: {metric: mean}}."""

  @jax.jit
  def forward(params, x0, x1, time):
    return model.apply({'params': params}, x0, x1, time)

  @jax.jit
  def compute_metrics(example, prediction, step_value):
    return {name: fn(example, prediction, step_value)
            for name, fn in metrics_fns.items()}

  results: Dict[str, Dict[str, float]] = {}
  for dataset_name, dataset in datasets.items():
    batch_values = []
    for index, batch in enumerate(iter(dataset)):
      example = {k: jnp.asarray(v) for k, v in batch.items()
                 if not isinstance(v, list)}
      prediction = forward(params, example['x0'], example['x1'],
                           example['time'])
      values = compute_metrics(example, prediction,
                               jnp.asarray(step, jnp.int32))
      batch_values.append({k: float(v)
                           for k, v in jax.device_get(values).items()})
      if writer is not None and index < max_summary_batches:
        clipped = np.clip(np.asarray(prediction['image'][0]), 0.0, 1.0)
        grid = np.concatenate([
            np.asarray(example['x0'][0]), clipped,
            np.asarray(example['y'][0]),
            np.asarray(example['x1'][0])], axis=1)
        writer.image(f'eval/{dataset_name}/x0_pred_y_x1_{index}', grid, step)
    means = losses_lib.aggregate_batch_losses(batch_values)
    results[dataset_name] = means
    if writer is not None:
      for metric_name, value in means.items():
        writer.scalar(f'eval/{dataset_name}/{metric_name}', value, step)
    log_fn(f'eval[{dataset_name}] step {step}: ' +
           ', '.join(f'{k}={v:.5f}' for k, v in means.items()))
  return results
