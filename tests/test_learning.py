"""End-to-end learning test: the full training stack fits a toy task.

Synthetic midpoint-interpolation data (a bright square translating across
a dark background: x0 and x1 are the endpoints, y the midpoint) trained
with the real DP train step on the 8-device mesh must reduce L1
substantially — exercising model, losses, optimizer, augmentation-free
step, and sharding together.
"""
import numpy as np
import pytest

import jax

from frame_interpolation_tpu import losses as losses_lib
from frame_interpolation_tpu import training as training_lib
from frame_interpolation_tpu.models.film_net import FilmNet, init_params
from frame_interpolation_tpu.options import Options
from frame_interpolation_tpu.parallel import mesh as mesh_lib

pytestmark = pytest.mark.slow  # model compiles dominate runtime

OPTS = Options.tiny()
SIZE = 32


def _square_frame(cy, cx, size=SIZE, half=4):
  frame = np.zeros((size, size, 3), np.float32)
  y0, y1 = int(cy - half), int(cy + half)
  x0, x1 = int(cx - half), int(cx + half)
  frame[max(y0, 0):max(y1, 0), max(x0, 0):max(x1, 0)] = 1.0
  return frame


def _batch(rng, n=8):
  x0s, x1s, ys = [], [], []
  for _ in range(n):
    cy = rng.uniform(10, SIZE - 10)
    cx = rng.uniform(10, SIZE - 10)
    dy = rng.uniform(-3, 3)
    dx = rng.uniform(-3, 3)
    x0s.append(_square_frame(cy - dy, cx - dx))
    ys.append(_square_frame(cy, cx))
    x1s.append(_square_frame(cy + dy, cx + dx))
  return {
      'x0': np.stack(x0s),
      'x1': np.stack(x1s),
      'y': np.stack(ys),
      'time': np.full((n, 1), 0.5, np.float32),
  }


def test_training_learns_translation_midpoints():
  mesh = mesh_lib.create_mesh(jax.devices())
  model = FilmNet(OPTS)
  opts = training_lib.TrainingOptions(learning_rate=2e-3)
  optimizer = training_lib.create_optimizer(opts)
  losses = losses_lib.training_losses(['l1'], loss_weights=[1.0])
  step_fn = training_lib.make_train_step(model, losses, optimizer,
                                         mesh=mesh)
  state = mesh_lib.replicate(
      training_lib.create_train_state(
          init_params(model, jax.random.PRNGKey(0)), optimizer), mesh)
  rng = np.random.RandomState(0)
  key = jax.random.PRNGKey(1)
  first = None
  loss = None
  for step in range(60):
    batch = mesh_lib.shard_batch(_batch(rng), mesh)
    state, metrics, _ = step_fn(state, batch, jax.random.fold_in(key, step))
    loss = float(jax.device_get(metrics['training_loss']))
    if first is None:
      first = loss
  assert np.isfinite(loss)
  assert loss < 0.5 * first, f'L1 did not halve: {first:.4f} -> {loss:.4f}'


def test_style_objective_trains_with_finite_gradients(tmp_path):
  """The full Style objective (l1+vgg+style with schedules) through the
  jitted DP step: gradients must be finite and the step must run."""
  import test_losses as loss_fixtures

  vgg_path = str(tmp_path / 'vgg.mat')
  loss_fixtures._make_fake_vgg_mat(vgg_path)

  from frame_interpolation_tpu.losses import PiecewiseConstantSchedule
  losses = losses_lib.training_losses(
      ['l1', 'vgg', 'style'],
      loss_weight_schedules=[
          PiecewiseConstantSchedule((0,), (1.0, 1.0)),
          PiecewiseConstantSchedule((1500000,), (1.0, 0.25)),
          PiecewiseConstantSchedule((1500000,), (0.0, 40.0)),
      ],
      vgg_model_file=vgg_path)
  mesh = mesh_lib.create_mesh(jax.devices())
  model = FilmNet(OPTS)
  opts = training_lib.TrainingOptions(learning_rate=1e-3)
  optimizer = training_lib.create_optimizer(opts)
  step_fn = training_lib.make_train_step(model, losses, optimizer,
                                         mesh=mesh)
  state = mesh_lib.replicate(
      training_lib.create_train_state(
          init_params(model, jax.random.PRNGKey(0)), optimizer), mesh)
  rng = np.random.RandomState(3)
  batch = mesh_lib.shard_batch(_batch(rng), mesh)
  state, metrics, _ = step_fn(state, batch, jax.random.PRNGKey(2))
  values = {k: float(v) for k, v in jax.device_get(metrics).items()}
  assert set(values) >= {'l1', 'k*vgg', 'k*style', 'training_loss'}
  assert all(np.isfinite(v) for v in values.values()), values
  # Style weight is 0 before 1.5M steps: objective equals l1 + 1.0*vgg.
  np.testing.assert_allclose(values['training_loss'],
                             values['l1'] + values['k*vgg'], rtol=1e-5)
  leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
  assert all(np.isfinite(leaf).all() for leaf in leaves)
