r"""UCF101 interpolation-test triplet TFRecord builder.

Equivalent of datasets/create_ucf101_tfrecord.py in
google-research/frame-interpolation: each subdirectory holds
frame_00.png / frame_01_gt.png / frame_02.png (379 triplets, 2 shards —
reference lines 15-22, 103-108).
"""
from __future__ import annotations

import os

from absl import app, flags, logging

from ._common import define_flag

_INPUT_DIR = define_flag(flags.DEFINE_string, 'input_dir', None,
                                 'Root of the UCF101 triplets.',
                                 required=True)
_OUTPUT_TFRECORD_FILEPATH = define_flag(flags.DEFINE_string,
    'output_tfrecord_filepath', None, 'Output TFRecord filepath.',
    required=True)
_NUM_SHARDS = define_flag(flags.DEFINE_integer,
    'num_shards', 2, 'Output shards.')
_NUM_WORKERS = define_flag(flags.DEFINE_integer,
    'num_workers', 8, 'Builder threads.')

_IMAGES_MAP = {'frame_0': 'frame_00.png', 'frame_1': 'frame_01_gt.png',
               'frame_2': 'frame_02.png'}


def main(argv):
  del argv
  from ..data.builders import triplets
  clips = sorted(d for d in os.listdir(_INPUT_DIR.value)
                 if os.path.isdir(os.path.join(_INPUT_DIR.value, d)))
  triplet_dicts = [
      {key: os.path.join(_INPUT_DIR.value, clip, basename)
       for key, basename in _IMAGES_MAP.items()}
      for clip in clips
  ]
  written = triplets.run_pipeline(triplet_dicts,
                                  _OUTPUT_TFRECORD_FILEPATH.value,
                                  _NUM_SHARDS.value,
                                  num_workers=_NUM_WORKERS.value)
  logging.info("Succeeded in creating the output TFRecord file: '%s@%s' "
               '(%d examples).', _OUTPUT_TFRECORD_FILEPATH.value,
               _NUM_SHARDS.value, written)


def cli():
  """Console-script entry point (pyproject.toml)."""
  app.run(main)


if __name__ == '__main__':
  app.run(main)
