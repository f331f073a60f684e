r"""Checkpoint -> deployable parameter bundle converter.

Equivalent of the reference's SavedModel builder
(training/build_saved_model_cli.py in google-research/frame-interpolation):
takes a training run directory (orbax checkpoints under `<base>/<label>/
train`) or a released TF2 SavedModel/checkpoint, and writes the native
parameter bundle `<base>/<label>/saved_model` (options.json +
params.msgpack) that the inference CLIs load.

  python3 -m frame_interpolation_tpu.cli.build_params \
    --base_folder /tmp/runs --label run0

  python3 -m frame_interpolation_tpu.cli.build_params \
    --tf_model /path/to/released/Style/saved_model --output /tmp/style_bundle
"""
from __future__ import annotations

import os

from absl import app, flags, logging

from ._common import define_flag

_BASE_FOLDER = define_flag(flags.DEFINE_string, 'base_folder', None,
                                   'Root folder of training runs.')
_LABEL = define_flag(flags.DEFINE_string,
    'label', None, 'Run label under base_folder.')
_TF_MODEL = define_flag(flags.DEFINE_string,
    'tf_model', None, 'A TF2 SavedModel / checkpoint to convert instead.')
_OUTPUT = define_flag(flags.DEFINE_string, 'output', None,
                              'Output bundle dir (default: '
                              '<base>/<label>/saved_model).')
_EXPERIMENT = define_flag(flags.DEFINE_enum,
    'experiment', 'film_net-L1',
    ['film_net-L1', 'film_net-VGG', 'film_net-Style'],
    'Experiment preset that defines the model hyperparameters.')
_PLATFORM = define_flag(flags.DEFINE_string,
    'platform', None,
    "Force a JAX platform (e.g. 'cpu'); default uses the best available.")


def main(argv):
  del argv
  from ._common import apply_platform_flag
  apply_platform_flag(_PLATFORM.value)
  import jax

  from ..io import params_io
  from ..training import configs, train_lib

  if _TF_MODEL.value:
    from ..io import tf_import
    params, options = tf_import.load_tf_params(_TF_MODEL.value)
    output = _OUTPUT.value
    if not output:
      raise ValueError('--output is required with --tf_model')
  else:
    if not (_BASE_FOLDER.value and _LABEL.value):
      raise ValueError('Provide --base_folder and --label, or --tf_model.')
    config = configs.get_experiment(_EXPERIMENT.value, vgg_model_file='')
    options = config.model
    run_dir = os.path.join(_BASE_FOLDER.value, _LABEL.value)
    from ..models.film_net import FilmNet, init_params
    from ..training.train_lib import (CheckpointManager, create_optimizer,
                                      create_train_state)
    optimizer = create_optimizer(train_lib.TrainingOptions())
    template = create_train_state(
        init_params(FilmNet(options), jax.random.PRNGKey(0)), optimizer)
    ckpt = CheckpointManager(os.path.join(run_dir, 'train'))
    state = ckpt.restore(template)
    if state is None:
      raise FileNotFoundError(f'No checkpoint under {run_dir}/train')
    logging.info('Restored checkpoint at step %d', int(state.step))
    params = state.params
    output = _OUTPUT.value or os.path.join(run_dir, 'saved_model')

  params_io.save_params(output, params, options)
  logging.info('Wrote parameter bundle to %s', output)
  print(f'Wrote parameter bundle to {output}')


def cli():
  """Console-script entry point (pyproject.toml)."""
  app.run(main)


if __name__ == '__main__':
  app.run(main)
