r"""Middlebury-Other triplet TFRecord builder.

Equivalent of datasets/create_middlebury_tfrecord.py in
google-research/frame-interpolation: pairs come from `other-data/<clip>/
{frame10,frame11}.png` with golden `other-gt-interp/<clip>/frame10i11.png`
(12 triplets, 3 shards — reference lines 17-28, 122-127).
"""
from __future__ import annotations

import os

from absl import app, flags, logging

from ._common import define_flag

_INPUT_DIR = define_flag(flags.DEFINE_string, 'input_dir', None,
                                 'Root of the Middlebury-Other data.',
                                 required=True)
_INPUT_PAIRS_FOLDERNAME = define_flag(flags.DEFINE_string,
    'input_pairs_foldername', 'other-data',
    'Folder with the input frame pairs.')
_GOLDEN_FOLDERNAME = define_flag(flags.DEFINE_string,
    'golden_foldername', 'other-gt-interp',
    'Folder with the golden middle frames.')
_OUTPUT_TFRECORD_FILEPATH = define_flag(flags.DEFINE_string,
    'output_tfrecord_filepath', None, 'Output TFRecord filepath.',
    required=True)
_NUM_SHARDS = define_flag(flags.DEFINE_integer,
    'num_shards', 3, 'Output shards.')
_NUM_WORKERS = define_flag(flags.DEFINE_integer,
    'num_workers', 8, 'Builder threads.')

_IMAGES_MAP = {'frame_0': 'frame10.png', 'frame_1': 'frame10i11.png',
               'frame_2': 'frame11.png'}


def main(argv):
  del argv
  from ..data.builders import triplets
  pairs_dir = os.path.join(_INPUT_DIR.value, _INPUT_PAIRS_FOLDERNAME.value)
  clips = sorted(d for d in os.listdir(pairs_dir)
                 if os.path.isdir(os.path.join(pairs_dir, d)))
  folder_of = {
      'frame_0': _INPUT_PAIRS_FOLDERNAME.value,
      'frame_1': _GOLDEN_FOLDERNAME.value,
      'frame_2': _INPUT_PAIRS_FOLDERNAME.value,
  }
  triplet_dicts = [
      {key: os.path.join(_INPUT_DIR.value, folder_of[key], clip, basename)
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
