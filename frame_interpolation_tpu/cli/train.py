r"""Training CLI.

Equivalent of the reference's trainer (training/train.py in
google-research/frame-interpolation). Experiment content comes from the
dataclass presets in training/configs (the gin files mapped 1:1); run
artifacts land in `<base_folder>/<label>/{config.json,train,eval,
saved_model}` like the reference's run-dir layout (README.md:186-195).

  python3 -m frame_interpolation_tpu.cli.train \
    --experiment film_net-L1 \
    --train_file vimeo_train.tfrecord@200 \
    --base_folder /tmp/runs --label run0

`--mode cpu` forces the host platform for debugging (the reference's
OneDeviceStrategy analogue); default uses every visible accelerator as one
data-parallel mesh.
"""
from __future__ import annotations

import dataclasses
import json
import os

from absl import app, flags, logging

from ._common import define_flag

_EXPERIMENT = define_flag(flags.DEFINE_enum,
    'experiment', 'film_net-L1',
    ['film_net-L1', 'film_net-VGG', 'film_net-Style'],
    'Experiment preset (mirrors the released gin configs).')
_GIN_CONFIG = define_flag(flags.DEFINE_string,
    'gin_config', None,
    'Path to a reference-style training gin file; overrides --experiment '
    '(compatibility with google-research/frame-interpolation configs).')
_BASE_FOLDER = define_flag(flags.DEFINE_string, 'base_folder', None,
                                   'Root folder for training runs.',
                                   required=True)
_LABEL = define_flag(flags.DEFINE_string, 'label', 'run0', 'Run descriptor.')
_MODE = define_flag(flags.DEFINE_enum, 'mode', 'auto', ['auto', 'cpu'],
                          "Device mode: 'cpu' to debug on host.")
_TRAIN_FILE = define_flag(flags.DEFINE_string,
    'train_file', None, "Training TFRecord spec ('file' or 'file@N'). "
    'Deprecated in favor of --train_files, like the reference '
    "(training/data_lib.py:242-247); still honored for single sources.")
_TRAIN_FILES = define_flag(flags.DEFINE_list,
    'train_files', [],
    'Training TFRecord specs for several mixed sources '
    '(training/data_lib.py:242-259 parity).')
_TRAIN_WEIGHTS = define_flag(flags.DEFINE_list,
    'train_weights', [],
    'Per-source sampling weights for --train_files (uniform when empty).')
_CROP_SIZES = define_flag(flags.DEFINE_list,
    'crop_sizes', [],
    'Per-source crop sizes for --train_files; defaults to the experiment '
    'crop size for every source.')
_BATCH_SIZE = define_flag(flags.DEFINE_integer, 'batch_size', None,
                                   'Override global batch size.')
_CROP_SIZE = define_flag(flags.DEFINE_integer, 'crop_size', None,
                                  'Override training crop size.')
_NUM_STEPS = define_flag(flags.DEFINE_integer, 'num_steps', None,
                                  'Override number of training steps.')
_SAVE_INTERVAL = define_flag(flags.DEFINE_integer, 'save_interval', 3000,
                                      'Checkpoint/eval/summary interval.')
_VGG_MODEL_FILE = define_flag(flags.DEFINE_string,
    'vgg_model_file', None,
    'Path to imagenet-vgg-verydeep-19.mat (VGG/Style experiments).')
_EVAL_FILES = define_flag(flags.DEFINE_list, 'eval_files', [],
                                'Eval TFRecord specs.')
_EVAL_NAMES = define_flag(flags.DEFINE_list, 'eval_names', [],
                                'Names of the eval datasets.')
_EVAL_MAX_EXAMPLES = define_flag(flags.DEFINE_integer,
    'eval_max_examples', -1, 'Max examples per eval dataset; -1 = all.')
_PROFILE_DIR = define_flag(flags.DEFINE_string,
    'profile_dir', None,
    'If set, capture a jax.profiler device trace for a few steps here.')
_COORDINATOR_ADDRESS = define_flag(flags.DEFINE_string,
    'coordinator_address', None,
    'host:port of process 0 for multi-host training (TPU pods usually '
    'auto-detect; leave unset on a single host).')
_NUM_PROCESSES = define_flag(flags.DEFINE_integer, 'num_processes', None,
                                      'Total processes (multi-host).')
_PROCESS_ID = define_flag(flags.DEFINE_integer, 'process_id', None,
                                   'This process index (multi-host).')


def main(argv):
  del argv
  if _MODE.value == 'cpu':
    import jax
    jax.config.update('jax_platforms', 'cpu')
  import jax

  from ..parallel import distributed
  distributed.initialize_multihost(_COORDINATOR_ADDRESS.value,
                                   _NUM_PROCESSES.value, _PROCESS_ID.value)

  from .. import losses as losses_lib
  from ..data import dataset as dataset_lib
  from ..models.film_net import FilmNet
  from ..parallel import mesh as mesh_lib
  from ..training import (configs, eval_lib, metrics_lib, train_lib)
  from ..utils import tensorboard

  if _GIN_CONFIG.value:
    from ..training.configs import gin_compat
    config = gin_compat.load_training_gin(
        _GIN_CONFIG.value, vgg_model_file=_VGG_MODEL_FILE.value)
  else:
    config = configs.get_experiment(_EXPERIMENT.value,
                                    vgg_model_file=_VGG_MODEL_FILE.value)
  run_dir = os.path.join(_BASE_FOLDER.value, _LABEL.value)
  os.makedirs(run_dir, exist_ok=True)
  # Persist the effective config for reproducibility (train.py:85-87).
  with open(os.path.join(run_dir, 'config.json'), 'w') as f:
    json.dump(dataclasses.asdict(config), f, indent=2, default=str)

  batch_size = _BATCH_SIZE.value or config.dataset.batch_size
  crop_size = _CROP_SIZE.value if _CROP_SIZE.value is not None else (
      config.dataset.crop_size)
  num_steps = _NUM_STEPS.value or config.num_steps

  opts = train_lib.TrainingOptions(
      learning_rate=config.learning_rate,
      learning_rate_decay_steps=config.learning_rate_decay_steps,
      learning_rate_decay_rate=config.learning_rate_decay_rate,
      learning_rate_staircase=config.learning_rate_staircase,
      num_steps=num_steps,
      save_interval=_SAVE_INTERVAL.value)

  model = FilmNet(config.model)
  train_losses = losses_lib.training_losses(
      list(config.training_losses.names),
      loss_weight_schedules=list(config.training_losses.weight_schedules),
      vgg_model_file=config.vgg_model_file)
  test_losses = losses_lib.test_losses(
      list(config.test_losses.names),
      loss_weight_schedules=list(config.test_losses.weight_schedules),
      vgg_model_file=config.vgg_model_file)

  from ..training import sources as sources_lib
  sources, weights = sources_lib.build_training_sources(
      dataset_lib, config.dataset, _TRAIN_FILE.value, _TRAIN_FILES.value,
      _CROP_SIZES.value, crop_size, _TRAIN_WEIGHTS.value)
  train_iterator = dataset_lib.create_training_iterator(
      sources, batch_size=batch_size, weights=weights)

  mesh = mesh_lib.create_mesh()
  logging.info('Training on %d device(s): %s', mesh.devices.size,
               [str(d) for d in mesh.devices.flat])

  eval_fn = None
  if _EVAL_FILES.value:
    eval_datasets = dataset_lib.create_eval_datasets(
        list(_EVAL_FILES.value), list(_EVAL_NAMES.value),
        batch_size=1, max_examples=_EVAL_MAX_EXAMPLES.value)
    metrics_fns = metrics_lib.create_metrics_fns(test_losses, train_losses)
    eval_writer = tensorboard.create_writer(os.path.join(run_dir, 'eval'))

    def eval_fn(state, step):
      eval_lib.eval_loop(model, state.params, eval_datasets, metrics_fns,
                         step, writer=eval_writer,
                         log_fn=logging.info)

  train_lib.train(model, config.model, train_losses, train_iterator, opts,
                  run_dir, init_rng=jax.random.PRNGKey(0), mesh=mesh,
                  augmentation_names=tuple(config.augmentations),
                  eval_fn=eval_fn, log_fn=logging.info,
                  profile_dir=_PROFILE_DIR.value)


def cli():
  """Console-script entry point (pyproject.toml)."""
  app.run(main)


if __name__ == '__main__':
  app.run(main)
