r"""Vimeo-90K triplet TFRecord builder.

Equivalent of datasets/create_vimeo90K_tfrecord.py in
google-research/frame-interpolation (Beam replaced by a thread-pool
pipeline): reads `tri_{train,test}list.txt`, each line a `seq/clip` dir
containing im1.png/im2.png/im3.png, and writes sharded triplet TFRecords
(train: 51,313 triplets @200 shards; test: 3,782 @3, reference lines
26-31, 128-137).

  python3 -m frame_interpolation_tpu.cli.create_vimeo90K_tfrecord \
    --input_dir .../vimeo_triplet/sequences \
    --input_triplet_list_filepath .../tri_trainlist.txt \
    --output_tfrecord_filepath vimeo_train.tfrecord --num_shards 200
"""
from __future__ import annotations

import os

from absl import app, flags, logging

from ._common import define_flag

_INPUT_DIR = define_flag(flags.DEFINE_string,
    'input_dir', None, 'Root of the vimeo dataset sequences/ directory.',
    required=True)
_INPUT_TRIPLET_LIST_FILEPATH = define_flag(flags.DEFINE_string,
    'input_triplet_list_filepath', None,
    'tri_{train|test}list.txt of triplet subdirectories.', required=True)
_OUTPUT_TFRECORD_FILEPATH = define_flag(flags.DEFINE_string,
    'output_tfrecord_filepath', None, 'Output TFRecord filepath.',
    required=True)
_NUM_SHARDS = define_flag(flags.DEFINE_integer,
    'num_shards', 200, 'Output shards (3 for vimeo_test, 200 for train).')
_NUM_WORKERS = define_flag(flags.DEFINE_integer,
    'num_workers', 8, 'Builder threads.')

_IMAGES_MAP = {'frame_0': 'im1.png', 'frame_1': 'im2.png',
               'frame_2': 'im3.png'}


def main(argv):
  del argv
  from ..data.builders import triplets
  with open(_INPUT_TRIPLET_LIST_FILEPATH.value) as f:
    triplet_names = [line.strip() for line in f if line.strip()]
  triplet_dicts = [
      {key: os.path.join(_INPUT_DIR.value, name, basename)
       for key, basename in _IMAGES_MAP.items()}
      for name in triplet_names
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
