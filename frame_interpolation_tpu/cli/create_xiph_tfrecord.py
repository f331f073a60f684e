r"""Xiph triplet TFRecord builder (Xiph-2K / Xiph-4K).

Equivalent of datasets/create_xiph_tfrecord.py in
google-research/frame-interpolation: 8 clips x 100 frames in one flat
directory; odd frames are interpolated from their even neighbors.
scale_factor=2 produces Xiph-2K, center_crop_factor=2 (with scale 1)
produces Xiph-4K (reference lines 20-29, 105-127).
"""
from __future__ import annotations

import os

from absl import app, flags, logging

from ._common import define_flag

_INPUT_DIR = define_flag(flags.DEFINE_string, 'input_dir', None,
                                 'Directory with the 800 Xiph frames.',
                                 required=True)
_CENTER_CROP_FACTOR = define_flag(flags.DEFINE_integer,
    'center_crop_factor', 1,
    'Center-crop factor; 2 keeps the center half (Xiph-4K).')
_SCALE_FACTOR = define_flag(flags.DEFINE_integer, 'scale_factor', 2,
                                     'Downsample factor (2 for Xiph-2K).')
_NUM_CLIPS = define_flag(flags.DEFINE_integer,
    'num_clips', 8, 'Number of clips.')
_NUM_FRAMES = define_flag(flags.DEFINE_integer, 'num_frames', 100,
                                   'Frames per clip.')
_OUTPUT_TFRECORD_FILEPATH = define_flag(flags.DEFINE_string,
    'output_tfrecord_filepath', None, 'Output TFRecord filepath.',
    required=True)
_NUM_SHARDS = define_flag(flags.DEFINE_integer,
    'num_shards', 2, 'Output shards.')
_NUM_WORKERS = define_flag(flags.DEFINE_integer,
    'num_workers', 8, 'Builder threads.')

_OFFSETS = {'frame_0': -1, 'frame_1': 0, 'frame_2': 1}


def main(argv):
  del argv
  from ..data.builders import triplets
  frames_list = sorted(os.listdir(_INPUT_DIR.value))
  triplet_dicts = []
  for clip_index in range(_NUM_CLIPS.value):
    for frame_index in range(1, _NUM_FRAMES.value - 1, 2):
      index = clip_index * _NUM_FRAMES.value + frame_index
      triplet_dicts.append({
          key: os.path.join(_INPUT_DIR.value, frames_list[index + offset])
          for key, offset in _OFFSETS.items()
      })
  written = triplets.run_pipeline(
      triplet_dicts, _OUTPUT_TFRECORD_FILEPATH.value, _NUM_SHARDS.value,
      scale_factor=_SCALE_FACTOR.value,
      center_crop_factor=_CENTER_CROP_FACTOR.value,
      num_workers=_NUM_WORKERS.value)
  logging.info("Succeeded in creating the output TFRecord file: '%s@%s' "
               '(%d examples).', _OUTPUT_TFRECORD_FILEPATH.value,
               _NUM_SHARDS.value, written)


def cli():
  """Console-script entry point (pyproject.toml)."""
  app.run(main)


if __name__ == '__main__':
  app.run(main)
