"""Training and evaluation losses for the FILM interpolator, in pure JAX.

Mirrors the reference's loss library (losses/losses.py in
google-research/frame-interpolation): every loss takes
(example, prediction) dicts — `example['y']` is the ground-truth middle
frame, `prediction['image']` the model output — and returns a scalar.
Training combines several losses with iteration-dependent weights.

Differences from the reference are TPU/JAX idioms only:
  * weight schedules are plain jit-compatible callables of the step
    (`PiecewiseConstantSchedule` replaces tf.keras PiecewiseConstantDecay);
  * configuration happens through `LossConfig` dataclasses instead of gin
    (the released gin configs map 1:1 — see training/configs).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import image_metrics
from . import vgg19

LossFn = Callable[[Mapping[str, Any], Mapping[str, Any]], jnp.ndarray]
WeightFn = Callable[[Any], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class PiecewiseConstantSchedule:
  """tf.keras PiecewiseConstantDecay parity: values[i] on (b[i-1], b[i]]."""
  boundaries: Tuple[float, ...]
  values: Tuple[float, ...]

  def __post_init__(self):
    if len(self.values) != len(self.boundaries) + 1:
      raise ValueError('need len(values) == len(boundaries) + 1')

  def __call__(self, step) -> jnp.ndarray:
    step = jnp.asarray(step, jnp.float32)
    result = jnp.asarray(self.values[0], jnp.float32)
    for boundary, value in zip(self.boundaries, self.values[1:]):
      result = jnp.where(step > boundary, jnp.asarray(value, jnp.float32),
                         result)
    return result

  @property
  def is_constant_one(self) -> bool:
    unique = set(self.values)
    return unique == {1.0}


def constant_schedule(value: float) -> PiecewiseConstantSchedule:
  return PiecewiseConstantSchedule(boundaries=(0,), values=(value, value))


# ---- individual losses ------------------------------------------------------


def l1_loss(example, prediction) -> jnp.ndarray:
  return jnp.mean(jnp.abs(prediction['image'] - example['y']))


def l2_loss(example, prediction) -> jnp.ndarray:
  return jnp.mean(jnp.square(prediction['image'] - example['y']))


def l1_warped_loss(example, prediction) -> jnp.ndarray:
  """L1 on the aux warped frames against ground truth."""
  loss = jnp.asarray(0.0, jnp.float32)
  if 'x0_warped' in prediction:
    loss += jnp.mean(jnp.abs(prediction['x0_warped'] - example['y']))
  if 'x1_warped' in prediction:
    loss += jnp.mean(jnp.abs(prediction['x1_warped'] - example['y']))
  return loss


def ssim_loss(example, prediction) -> jnp.ndarray:
  return jnp.mean(
      image_metrics.ssim(prediction['image'], example['y'], max_val=1.0))


def psnr_loss(example, prediction) -> jnp.ndarray:
  return jnp.mean(
      image_metrics.psnr(prediction['image'], example['y'], max_val=1.0))


def make_vgg_loss(vgg_model_file: str,
                  weights: Optional[Sequence[float]] = None) -> LossFn:
  def fn(example, prediction):
    return vgg19.vgg_loss(prediction['image'], example['y'], vgg_model_file,
                          weights)
  return fn


def make_style_loss(vgg_model_file: str,
                    weights: Optional[Sequence[float]] = None) -> LossFn:
  def fn(example, prediction):
    return vgg19.style_loss(prediction['image'], example['y'], vgg_model_file,
                            weights)
  return fn


# ---- registry and factories -------------------------------------------------


def get_loss(loss_name: str,
             vgg_model_file: Optional[str] = None) -> LossFn:
  """Name -> loss fn registry (reference losses.py:116-133)."""
  simple = {
      'l1': l1_loss,
      'l2': l2_loss,
      'ssim': ssim_loss,
      'psnr': psnr_loss,
      'l1_warped': l1_warped_loss,
  }
  if loss_name in simple:
    return simple[loss_name]
  if loss_name == 'vgg':
    if not vgg_model_file:
      raise ValueError("loss 'vgg' needs vgg_model_file")
    return make_vgg_loss(vgg_model_file)
  if loss_name == 'style':
    if not vgg_model_file:
      raise ValueError("loss 'style' needs vgg_model_file")
    return make_style_loss(vgg_model_file)
  raise ValueError(f'Invalid loss function {loss_name}')


@dataclasses.dataclass(frozen=True)
class LossConfig:
  """One weighted loss: a name plus an iteration-dependent weight schedule."""
  name: str
  weight_schedule: PiecewiseConstantSchedule = dataclasses.field(
      default_factory=lambda: constant_schedule(1.0))


def create_losses(configs: Sequence[LossConfig],
                  vgg_model_file: Optional[str] = None
                  ) -> Dict[str, Tuple[LossFn, WeightFn]]:
  """Builds {display_name: (loss_fn, weight_fn)}.

  Constant-1.0 weights keep the bare name; scheduled weights get the 'k*'
  prefix, matching the reference's TensorBoard naming convention
  (losses/losses.py:166-176).
  """
  losses = {}
  for config in configs:
    schedule = config.weight_schedule
    display = config.name if schedule.is_constant_one else f'k*{config.name}'
    losses[display] = (get_loss(config.name, vgg_model_file), schedule)
  return losses


def training_losses(loss_names: Sequence[str],
                    loss_weights: Optional[Sequence[float]] = None,
                    loss_weight_schedules: Optional[
                        Sequence[PiecewiseConstantSchedule]] = None,
                    vgg_model_file: Optional[str] = None
                    ) -> Dict[str, Tuple[LossFn, WeightFn]]:
  """Reference training_losses factory (losses/losses.py:181-209)."""
  if loss_weights is not None:
    configs = [LossConfig(n, constant_schedule(w))
               for n, w in zip(loss_names, loss_weights)]
  elif loss_weight_schedules is not None:
    configs = [LossConfig(n, s)
               for n, s in zip(loss_names, loss_weight_schedules)]
  else:
    configs = [LossConfig(n) for n in loss_names]
  return create_losses(configs, vgg_model_file)


# Same semantics; separate name mirrors the reference's gin scoping.
test_losses = training_losses


def aggregate_batch_losses(
    batch_losses: List[Mapping[str, float]]) -> Dict[str, float]:
  """Averages a list of per-batch loss dicts (losses/losses.py:241-266)."""
  transposed: Dict[str, List[float]] = {}
  for batch in batch_losses:
    for name, value in batch.items():
      transposed.setdefault(name, []).append(value)
  return {name: float(np.mean(values))
          for name, values in transposed.items()}


def compute_weighted_loss(losses: Mapping[str, Tuple[LossFn, WeightFn]],
                          example, prediction, step) -> jnp.ndarray:
  """Sum of weight(step) * loss(example, prediction) over all losses."""
  total = jnp.asarray(0.0, jnp.float32)
  for loss_fn, weight_fn in losses.values():
    total += weight_fn(step) * loss_fn(example, prediction)
  return total
