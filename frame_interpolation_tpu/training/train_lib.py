"""Data-parallel training loop for the FILM interpolator (pjit + optax).

TPU-native re-design of the reference's training stack
(training/train.py, training/train_lib.py in
google-research/frame-interpolation). Capability parity:

  * Adam with staircase exponential LR decay (train.py:99-104),
  * weighted multi-loss objective with iteration-dependent weights
    (train_lib.py:46-60),
  * checkpoint save/restore-and-resume every `save_interval` steps with
    max_to_keep=10 (train_lib.py:194-210, 243-244) — via orbax,
  * periodic in-training eval (eval_lib) and TensorBoard scalars/images/
    histograms + steps/sec (train_lib.py:212-214, 254-269),
  * final parameter-bundle export, the SavedModel-export analogue
    (train_lib.py:276-280).

TPU-first differences:
  * distribution is a 1-D `Mesh` with the batch sharded and params
    replicated — jit inserts the gradient all-reduce over ICI; the same
    code runs single-device (CPU debug) and multi-chip, replacing both
    OneDeviceStrategy and MirroredStrategy (train_lib.py:334-343),
  * data augmentations run on device inside the jitted step,
  * the train step donates (params, opt_state) buffers, so the optimizer
    update is in-place in HBM.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Dict, Iterator, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .. import losses as losses_lib
from ..data import augmentations as augmentations_lib
from ..models.film_net import FilmNet
from ..options import Options
from ..parallel import mesh as mesh_lib
from ..utils import tensorboard


@dataclasses.dataclass(frozen=True)
class TrainingOptions:
  """gin `training.*` parity (training/train.py:63-74 + config gin files)."""
  learning_rate: float = 1e-4
  learning_rate_decay_steps: int = 750000
  learning_rate_decay_rate: float = 0.464158
  learning_rate_staircase: bool = True
  num_steps: int = 3000000
  save_interval: int = 3000
  timing_interval: int = 100
  max_to_keep: int = 10


def learning_rate_schedule(opts: TrainingOptions) -> optax.Schedule:
  """tf.keras ExponentialDecay parity (staircase floor-divides the step)."""

  def schedule(step):
    exponent = step / opts.learning_rate_decay_steps
    if opts.learning_rate_staircase:
      exponent = jnp.floor(exponent)
    return opts.learning_rate * opts.learning_rate_decay_rate**exponent

  return schedule


def create_optimizer(
    opts: TrainingOptions) -> optax.GradientTransformation:
  """Adam with the reference's epsilon default (Keras 1e-7)."""
  return optax.adam(learning_rate_schedule(opts), eps=1e-7)


class TrainState(struct.PyTreeNode):
  step: jnp.ndarray
  params: Any
  opt_state: Any


def create_train_state(params: Any,
                       optimizer: optax.GradientTransformation) -> TrainState:
  return TrainState(
      step=jnp.zeros((), jnp.int32),
      params=params,
      opt_state=optimizer.init(params))


# Aux model outputs summarized as images when present — the reference's
# extra_images set (training/train_lib.py:88-93).
_EXTRA_IMAGE_SUMMARIES = (
    'importance0', 'importance1', 'x0_warped', 'x1_warped', 'fg_image',
    'bg_image', 'fg_alpha', 'x1_unfiltered_warped')


def make_train_step(
    model: FilmNet,
    losses: Mapping[str, Tuple[losses_lib.LossFn, losses_lib.WeightFn]],
    optimizer: optax.GradientTransformation,
    augmentation_names: Sequence[str] = (),
    mesh=None,
    with_summaries: bool = True,
) -> Callable:
  """Builds the jitted data-parallel train step.

  Returns step_fn(state, batch, rng) -> (state, metrics_dict). Batch axis 0
  is sharded over the mesh; state is replicated; XLA all-reduces grads.

  `with_summaries=False` compiles a lean variant that returns no image
  summaries: the hot-loop steps then neither materialize the summary
  images in HBM nor keep `predictions` live through value_and_grad.
  train_loop runs this variant except on logging steps.
  """
  augmentation_fns = augmentations_lib.data_augmentations(augmentation_names)

  def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
    batch = augmentations_lib.apply_data_augmentation(
        augmentation_fns, rng, batch)

    def loss_fn(params):
      predictions = model.apply({'params': params}, batch['x0'], batch['x1'],
                                batch['time'])
      per_loss = {}
      total = jnp.asarray(0.0, jnp.float32)
      for name, (loss_value_fn, weight_fn) in losses.items():
        value = loss_value_fn(batch, predictions)
        per_loss[name] = value
        total += weight_fn(state.step) * value
      return total, (per_loss, predictions)

    (total, (per_loss, predictions)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state)
    metrics = dict(per_loss)
    metrics['training_loss'] = total
    if not with_summaries:
      return new_state, metrics, {}
    # Image-shaped step outputs for TensorBoard, matching the reference's
    # image_summaries selection (train_lib.py:72-93): the training triplet,
    # the prediction, and any aux images the model emits.
    summaries = {'x0': batch['x0'], 'x1': batch['x1'], 'y': batch['y'],
                 'pred_y': predictions['image']}
    for key in _EXTRA_IMAGE_SUMMARIES:
      value = predictions.get(key)
      if isinstance(value, jnp.ndarray) and value.ndim == 4:
        summaries[key] = value
    return new_state, metrics, summaries

  if mesh is None:
    return jax.jit(step_fn, donate_argnums=(0,))
  replicated = mesh_lib.replicated(mesh)
  sharded = mesh_lib.batch_sharded(mesh)
  return jax.jit(
      step_fn,
      in_shardings=(replicated, sharded, replicated),
      out_shardings=(replicated, replicated, sharded),
      donate_argnums=(0,))


# ---- checkpointing ----------------------------------------------------------


class CheckpointManager:
  """Orbax-backed save/restore-latest with max_to_keep, reference layout.

  Checkpoints live under `<run>/train` like the reference's
  tf.train.CheckpointManager (train_lib.py:202-206).
  """

  def __init__(self, directory: str, max_to_keep: int = 10,
               keep_period_hours: float = 2.0):
    import datetime

    import orbax.checkpoint as ocp
    self._directory = os.path.abspath(directory)
    os.makedirs(self._directory, exist_ok=True)
    # max_to_keep=10 plus keep-one-every-2h mirrors the reference's
    # tf.train.CheckpointManager settings (train_lib.py:202-206).
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep,
        keep_time_interval=(datetime.timedelta(hours=keep_period_hours)
                            if keep_period_hours else None),
        create=True)
    self._manager = ocp.CheckpointManager(self._directory, options=options)

  def save(self, step: int, state: TrainState) -> None:
    import orbax.checkpoint as ocp
    payload = jax.device_get({'step': state.step, 'params': state.params,
                              'opt_state': state.opt_state})
    self._manager.save(step, args=ocp.args.StandardSave(payload))
    self._manager.wait_until_finished()

  def latest_step(self) -> Optional[int]:
    return self._manager.latest_step()

  def restore(self, template: TrainState) -> Optional[TrainState]:
    import orbax.checkpoint as ocp
    step = self._manager.latest_step()
    if step is None:
      return None
    target = {'step': template.step, 'params': template.params,
              'opt_state': template.opt_state}
    restored = self._manager.restore(
        step, args=ocp.args.StandardRestore(jax.device_get(target)))
    return TrainState(step=jnp.asarray(restored['step']),
                      params=restored['params'],
                      opt_state=restored['opt_state'])


# ---- the loop ---------------------------------------------------------------


def train_loop(
    model: FilmNet,
    state: TrainState,
    losses: Mapping[str, Tuple[losses_lib.LossFn, losses_lib.WeightFn]],
    optimizer: optax.GradientTransformation,
    train_iterator: Iterator[Dict[str, np.ndarray]],
    opts: TrainingOptions,
    run_dir: str,
    mesh=None,
    augmentation_names: Sequence[str] = (),
    eval_fn: Optional[Callable[[TrainState, int], None]] = None,
    seed: int = 0,
    log_fn: Callable[[str], None] = print,
    profile_dir: Optional[str] = None,
    profile_start_step: int = 10,
    profile_num_steps: int = 5,
) -> TrainState:
  """Runs training to `opts.num_steps`, resuming from the run dir if set.

  Layout parity with the reference run dir (README.md:186-195):
  `<run_dir>/{train,eval}` summaries, `<run_dir>/train` checkpoints,
  `<run_dir>/saved_model`-analogue parameter bundle on completion.
  """
  if mesh is None:
    mesh = mesh_lib.create_mesh()
  # Two compiled variants: the lean one for hot-loop steps, the
  # summary-emitting one only on logging steps (so non-logging steps pay
  # neither the summary HBM materialization nor the predictions liveness).
  step_fn = make_train_step(model, losses, optimizer, augmentation_names,
                            mesh, with_summaries=False)
  summary_step_fn = make_train_step(model, losses, optimizer,
                                    augmentation_names, mesh,
                                    with_summaries=True)
  ckpt = CheckpointManager(os.path.join(run_dir, 'train'),
                           max_to_keep=opts.max_to_keep)
  restored = ckpt.restore(state)
  if restored is not None:
    state = restored
    log_fn(f'Restored checkpoint at step {int(state.step)}')
  state = mesh_lib.replicate(state, mesh)

  writer = tensorboard.create_writer(os.path.join(run_dir, 'train'))
  rng = jax.random.PRNGKey(seed)
  start_step = int(jax.device_get(state.step))
  timing_start = time.monotonic()
  timing_step = start_step

  profiling = False
  for step in range(start_step, opts.num_steps):
    if profile_dir and step == profile_start_step and not profiling:
      jax.profiler.start_trace(profile_dir)
      profiling = True
    batch = next(train_iterator)
    device_batch = mesh_lib.shard_batch(
        {k: v for k, v in batch.items() if not isinstance(v, list)}, mesh)
    step_rng = jax.random.fold_in(rng, step)
    next_step = step + 1
    will_log = (next_step % opts.save_interval == 0 or
                next_step == opts.num_steps)
    state, metrics, summaries = (summary_step_fn if will_log else step_fn)(
        state, device_batch, step_rng)
    if profiling and next_step >= profile_start_step + profile_num_steps:
      jax.block_until_ready(metrics)
      jax.profiler.stop_trace()
      profiling = False
      log_fn(f'Wrote profiler trace for steps '
             f'[{profile_start_step}, {next_step}) to {profile_dir}')

    if next_step % opts.timing_interval == 0:
      now = time.monotonic()
      steps_per_sec = (next_step - timing_step) / max(now - timing_start,
                                                      1e-9)
      writer.scalar('steps/sec', steps_per_sec, next_step)
      timing_start, timing_step = now, next_step

    if next_step % opts.save_interval == 0 or next_step == opts.num_steps:
      host_metrics = {k: float(v) for k, v in
                      jax.device_get(metrics).items()}
      for name, value in host_metrics.items():
        writer.scalar(f'losses/{name}', value, next_step)
      writer.scalar('learning_rate',
                    float(learning_rate_schedule(opts)(next_step)),
                    next_step)
      # Clipped image + histogram of every image-shaped step output, the
      # reference's _summary_writer behavior (train_lib.py:103-111).
      for name, value in jax.device_get(summaries).items():
        images = np.asarray(value, np.float32)
        writer.image(f'training/{name}', np.clip(images[0], 0.0, 1.0),
                     next_step)
        writer.histogram(f'training/{name}_h', images, next_step)
      ckpt.save(next_step, jax.device_get(state))
      log_fn(f'step {next_step}: ' + ', '.join(
          f'{k}={v:.5f}' for k, v in host_metrics.items()))
      if eval_fn is not None:
        eval_fn(state, next_step)
      writer.flush()

  if profiling:
    jax.profiler.stop_trace()
  writer.close()
  return state


def train(model: FilmNet,
          model_options: Options,
          losses: Mapping[str, Tuple[losses_lib.LossFn,
                                     losses_lib.WeightFn]],
          train_iterator: Iterator[Dict[str, np.ndarray]],
          opts: TrainingOptions,
          run_dir: str,
          init_rng=None,
          mesh=None,
          augmentation_names: Sequence[str] = (),
          eval_fn=None,
          log_fn: Callable[[str], None] = print,
          profile_dir: Optional[str] = None) -> TrainState:
  """End-to-end entry: init/restore, run the loop, export the bundle."""
  from ..io import params_io
  from ..models.film_net import init_params
  if init_rng is None:
    init_rng = jax.random.PRNGKey(0)
  optimizer = create_optimizer(opts)
  params = init_params(model, init_rng)
  state = create_train_state(params, optimizer)
  state = train_loop(model, state, losses, optimizer, train_iterator, opts,
                     run_dir, mesh=mesh,
                     augmentation_names=augmentation_names, eval_fn=eval_fn,
                     log_fn=log_fn, profile_dir=profile_dir)
  bundle_dir = os.path.join(run_dir, 'saved_model')
  params_io.save_params(bundle_dir, jax.device_get(state.params),
                        model_options)
  log_fn(f'Exported parameter bundle to {bundle_dir}')
  return state
