"""Training-stack tests on the virtual 8-device CPU mesh.

Covers: LR schedule parity with Keras ExponentialDecay, data-parallel train
step on an 8-device mesh (replicated grads, loss decreases), checkpoint
save/restore-resume, the full train() loop end-to-end at tiny scale, the
eval loop with metrics, and TensorBoard event files readable by TF.
"""
import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frame_interpolation_tpu import losses as losses_lib
from frame_interpolation_tpu import training as training_lib
from frame_interpolation_tpu.models.film_net import FilmNet, init_params
from frame_interpolation_tpu.options import Options
from frame_interpolation_tpu.parallel import mesh as mesh_lib
from frame_interpolation_tpu.training import configs, eval_lib, metrics_lib
from frame_interpolation_tpu.utils import tensorboard

pytestmark = pytest.mark.slow  # model compiles dominate runtime

OPTS = Options.tiny()
H = W = 16


def _batch(n=8, seed=0):
  rng = np.random.RandomState(seed)
  return {
      'x0': rng.rand(n, H, W, 3).astype(np.float32),
      'x1': rng.rand(n, H, W, 3).astype(np.float32),
      'y': rng.rand(n, H, W, 3).astype(np.float32),
      'time': np.full((n, 1), 0.5, np.float32),
  }


def _batch_iterator(n=8):
  seed = [0]
  while True:
    seed[0] += 1
    yield _batch(n, seed[0])


class TestSchedule:

  def test_exponential_decay_staircase_matches_keras(self):
    tf = pytest.importorskip('tensorflow')
    opts = training_lib.TrainingOptions(
        learning_rate=1e-4, learning_rate_decay_steps=750000,
        learning_rate_decay_rate=0.464158, learning_rate_staircase=True)
    ours = training_lib.learning_rate_schedule(opts)
    theirs = tf.keras.optimizers.schedules.ExponentialDecay(
        1e-4, 750000, 0.464158, staircase=True)
    for step in [0, 1, 749999, 750000, 1500000, 2999999]:
      np.testing.assert_allclose(float(ours(step)), theirs(step).numpy(),
                                 rtol=1e-6, err_msg=str(step))


class TestTrainStep:

  def test_multi_device_step_runs_and_learns(self):
    devices = jax.devices()
    assert len(devices) == 8, 'conftest must set up the 8-device CPU mesh'
    mesh = mesh_lib.create_mesh(devices)
    model = FilmNet(OPTS)
    params = init_params(model, jax.random.PRNGKey(0))
    opts = training_lib.TrainingOptions(learning_rate=1e-3)
    optimizer = training_lib.create_optimizer(opts)
    losses = losses_lib.training_losses(['l1'], loss_weights=[1.0])
    step_fn = training_lib.make_train_step(
        model, losses, optimizer,
        augmentation_names=('random_flip', 'random_reverse'), mesh=mesh)
    state = mesh_lib.replicate(
        training_lib.create_train_state(params, optimizer), mesh)
    batch = mesh_lib.shard_batch(_batch(), mesh)
    rng = jax.random.PRNGKey(1)
    first = None
    for i in range(8):
      state, metrics, _ = step_fn(state, batch, jax.random.fold_in(rng, i))
      loss = float(jax.device_get(metrics['training_loss']))
      if first is None:
        first = loss
    assert int(jax.device_get(state.step)) == 8
    assert loss < first, f'loss did not decrease: {first} -> {loss}'

  def test_single_device_equals_mesh(self):
    # The DP mesh must be a pure implementation detail: same batch, same
    # params => same updated loss as plain jit on one device.
    model = FilmNet(OPTS)
    opts = training_lib.TrainingOptions(learning_rate=1e-3)
    optimizer = training_lib.create_optimizer(opts)
    losses = losses_lib.training_losses(['l1'], loss_weights=[1.0])
    batch_np = _batch()
    rng = jax.random.PRNGKey(3)

    mesh = mesh_lib.create_mesh(jax.devices())
    step_mesh = training_lib.make_train_step(model, losses, optimizer,
                                             mesh=mesh)
    # Fresh params per path: the train step donates its input state, so
    # sharing one params pytree across both paths would use deleted buffers.
    state_m = mesh_lib.replicate(
        training_lib.create_train_state(
            init_params(model, jax.random.PRNGKey(0)), optimizer), mesh)
    state_m, metrics_m, _ = step_mesh(
        state_m, mesh_lib.shard_batch(batch_np, mesh), rng)

    step_one = training_lib.make_train_step(model, losses, optimizer,
                                            mesh=None)
    state_1 = training_lib.create_train_state(
        init_params(model, jax.random.PRNGKey(0)), optimizer)
    batch_dev = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state_1, metrics_1, _ = step_one(state_1, batch_dev, rng)

    np.testing.assert_allclose(
        float(metrics_m['training_loss']), float(metrics_1['training_loss']),
        rtol=1e-5)
    leaves_m = jax.tree_util.tree_leaves(jax.device_get(state_m.params))
    leaves_1 = jax.tree_util.tree_leaves(jax.device_get(state_1.params))
    for a, b in zip(leaves_m, leaves_1):
      np.testing.assert_allclose(a, b, atol=2e-6)


class TestCheckpointing:

  def test_save_restore_roundtrip(self, tmp_path):
    model = FilmNet(OPTS)
    params = init_params(model, jax.random.PRNGKey(0))
    optimizer = training_lib.create_optimizer(training_lib.TrainingOptions())
    state = training_lib.create_train_state(params, optimizer)
    state = state.replace(step=jnp.asarray(42, jnp.int32))
    ckpt = training_lib.CheckpointManager(str(tmp_path / 'train'))
    ckpt.save(42, state)
    template = training_lib.create_train_state(
        init_params(model, jax.random.PRNGKey(9)), optimizer)
    restored = ckpt.restore(template)
    assert restored is not None
    assert int(restored.step) == 42
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state.params)),
                    jax.tree_util.tree_leaves(restored.params)):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  def test_restore_empty_returns_none(self, tmp_path):
    model = FilmNet(OPTS)
    optimizer = training_lib.create_optimizer(training_lib.TrainingOptions())
    state = training_lib.create_train_state(
        init_params(model, jax.random.PRNGKey(0)), optimizer)
    ckpt = training_lib.CheckpointManager(str(tmp_path / 'empty'))
    assert ckpt.restore(state) is None


class TestTrainLoop:

  def test_end_to_end_tiny_run_with_resume(self, tmp_path):
    run_dir = str(tmp_path / 'run')
    model = FilmNet(OPTS)
    opts = training_lib.TrainingOptions(
        learning_rate=1e-3, num_steps=4, save_interval=2,
        timing_interval=2)
    losses = losses_lib.training_losses(['l1'], loss_weights=[1.0])
    logs = []
    state = training_lib.train(
        model, OPTS, losses, _batch_iterator(), opts, run_dir,
        augmentation_names=('random_flip',), log_fn=logs.append)
    assert int(jax.device_get(state.step)) == 4
    # Bundle exported.
    from frame_interpolation_tpu.io import params_io
    params, loaded_opts = params_io.load_params(
        os.path.join(run_dir, 'saved_model'))
    assert loaded_opts == OPTS
    del params
    # Summaries written, including the reference's per-step image grids and
    # histograms of image-shaped train outputs (train_lib.py:103-111).
    event_files = glob.glob(
        os.path.join(run_dir, 'train', 'events.out.tfevents.*'))
    assert event_files
    tf = pytest.importorskip('tensorflow')
    tags = {v.tag: v for path in event_files
            for e in tf.compat.v1.train.summary_iterator(path)
            for v in e.summary.value}
    for name in ('x0', 'x1', 'y', 'pred_y'):
      assert tags[f'training/{name}'].image.height == H
      assert tags[f'training/{name}_h'].histo.num > 0
    assert 'losses/training_loss' in tags and 'learning_rate' in tags
    # Resume: raising num_steps continues from the checkpoint.
    opts2 = training_lib.TrainingOptions(
        learning_rate=1e-3, num_steps=6, save_interval=2, timing_interval=2)
    logs2 = []
    state2 = training_lib.train(model, OPTS, losses, _batch_iterator(),
                                opts2, run_dir, log_fn=logs2.append)
    assert int(jax.device_get(state2.step)) == 6
    assert any('Restored checkpoint at step 4' in line for line in logs2)


class TestEvalLoop:

  class _ListDataset:

    def __init__(self, batches):
      self._batches = batches

    def __iter__(self):
      return iter(list(self._batches))

  def test_eval_loop_metrics(self, tmp_path):
    model = FilmNet(OPTS)
    params = init_params(model, jax.random.PRNGKey(0))
    test_losses = losses_lib.test_losses(['l1', 'psnr', 'ssim'],
                                         loss_weights=[1.0, 1.0, 1.0])
    train_losses = losses_lib.training_losses(['l1'], loss_weights=[1.0])
    metrics = metrics_lib.create_metrics_fns(test_losses, train_losses)
    datasets = {'synthetic': self._ListDataset([_batch(2, 5), _batch(2, 6)])}
    writer = tensorboard.SummaryWriter(str(tmp_path / 'eval'))
    results = eval_lib.eval_loop(model, params, datasets, metrics, step=100,
                                 writer=writer, log_fn=lambda s: None)
    writer.close()
    values = results['synthetic']
    assert set(values) >= {'l1', 'training_loss', 'psnr', 'ssim'}
    assert np.isfinite(list(values.values())).all()


class TestTensorboardWriter:

  def test_tf_reads_our_events(self, tmp_path):
    tf = pytest.importorskip('tensorflow')
    logdir = str(tmp_path / 'tb')
    with tensorboard.SummaryWriter(logdir) as writer:
      writer.scalar('loss', 0.5, 10)
      writer.image('img', np.zeros((4, 6, 3), np.float32), 10)
      writer.histogram('h', np.arange(100.0), 10)
    path = glob.glob(os.path.join(logdir, 'events.out.tfevents.*'))[0]
    events = list(tf.compat.v1.train.summary_iterator(path))
    assert events[0].file_version == 'brain.Event:2'
    tags = {}
    for event in events[1:]:
      for value in event.summary.value:
        tags[value.tag] = value
    assert tags['loss'].simple_value == pytest.approx(0.5)
    assert tags['img'].image.height == 4
    assert tags['img'].image.width == 6
    assert tags['h'].histo.num == pytest.approx(100.0)
    assert events[1].step == 10


class TestConfigs:

  def test_presets(self):
    l1 = configs.get_experiment('film_net-L1')
    assert l1.training_losses.names == ('l1',)
    assert l1.model.pyramid_levels == 7
    style = configs.get_experiment('film_net-Style', vgg_model_file='x.mat')
    assert style.training_losses.names == ('l1', 'vgg', 'style')
    schedule = style.training_losses.weight_schedules[2]
    assert float(schedule(0)) == 0.0
    assert float(schedule(1500001)) == 40.0
    with pytest.raises(ValueError):
      configs.get_experiment('film_net-VGG')
    with pytest.raises(ValueError):
      configs.get_experiment('nope')
