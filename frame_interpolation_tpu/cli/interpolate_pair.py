r"""One mid-frame interpolation CLI.

Equivalent of the reference's quick-start script
(eval/interpolator_test.py in google-research/frame-interpolation):

  python3 -m frame_interpolation_tpu.cli.interpolate_pair \
    --frame1 photos/one.png --frame2 photos/two.png \
    --params <path to parameter bundle or TF SavedModel> \
    --output_frame photos/middle.png

`--params random` runs with freshly initialized weights (smoke testing on
machines without a checkpoint).
"""
from __future__ import annotations

import numpy as np
from absl import app, flags

from ._common import (apply_platform_flag, define_flag,
                      load_interpolator_from_flag)

_FRAME1 = define_flag(flags.DEFINE_string,
    'frame1', None, 'Filepath of the first frame.',
                              required=True)
_FRAME2 = define_flag(flags.DEFINE_string,
    'frame2', None, 'Filepath of the second frame.',
                              required=True)
_PARAMS = define_flag(flags.DEFINE_string,
    'params', None, "Parameter bundle / TF SavedModel path, or 'random'.",
    required=True)
_OUTPUT_FRAME = define_flag(flags.DEFINE_string, 'output_frame', None,
                                    'Filepath of the output mid-frame.',
                                    required=True)
_ALIGN = define_flag(flags.DEFINE_integer,
    'align', 64, 'If >1, pad the input size so it divides with this before '
    'inference.')
_BLOCK_HEIGHT = define_flag(flags.DEFINE_integer,
    'block_height', 1, 'Number of patches along height, '
    '1 for no tiling along height.')
_BLOCK_WIDTH = define_flag(flags.DEFINE_integer,
    'block_width', 1, 'Number of patches along width, '
    '1 for no tiling along width.')
_TIME = define_flag(flags.DEFINE_float,
    'time', 0.5, 'Sub-frame time in [0, 1] (film_net always predicts the '
    'midpoint; kept for API parity).')
_DTYPE = define_flag(flags.DEFINE_enum,
    'dtype_policy', None, ['float32', 'bfloat16'],
                           'Override the compute dtype policy.')
_PLATFORM = define_flag(flags.DEFINE_string,
    'platform', None,
    "Force a JAX platform (e.g. 'cpu'); default uses the best available.")
_WARP_IMPL = define_flag(flags.DEFINE_enum,
    'warp_impl', 'auto', ['auto', 'gather', 'window'],
    'Backward-warp implementation: the window-DMA Pallas kernel on large '
    'TPU inputs (auto/window) or the portable XLA gather. Numerically '
    'equivalent.')
_FOLD_CONVS = define_flag(flags.DEFINE_enum,
    'fold_convs', None, ['auto', 'on', 'off'],
    'W-folded execution of sub-128-lane conv stacks (ops/folded_conv.py). '
    'Numerically equivalent; default uses the bundle/auto setting.')
_CONV_STACK = define_flag(flags.DEFINE_enum,
    'conv_stack', None, ['auto', 'on', 'off', 'interpret'],
    'Fused conv+pool execution of the extractor sub-level-0 stacks '
    '(ops/conv_stack.py; TPU). Numerically equivalent; default uses the '
    'bundle/auto setting.')
_MESH = define_flag(flags.DEFINE_enum,
    'mesh', 'none', ['none', 'data', 'spatial'],
    'Multi-chip execution over all visible devices (parallel/inference.py): '
    "'data' shards the --block_height x --block_width patch grid over the "
    "mesh; 'spatial' row-shards ONE full-frame forward (GSPMD halo "
    'exchanges) for single-frame latency. Outputs match single-device.')


def main(argv):
  del argv
  apply_platform_flag(_PLATFORM.value)
  from ..io import images
  from ._common import to_mesh_interpolator
  interpolator = load_interpolator_from_flag(
      _PARAMS.value, _ALIGN.value,
      [_BLOCK_HEIGHT.value, _BLOCK_WIDTH.value], _DTYPE.value,
      warp_impl=_WARP_IMPL.value, fold_convs=_FOLD_CONVS.value,
      conv_stack=_CONV_STACK.value)
  interpolator = to_mesh_interpolator(
      interpolator, _MESH.value, _ALIGN.value,
      block_shape=(_BLOCK_HEIGHT.value, _BLOCK_WIDTH.value), kind='pair')
  image_1 = images.read_image(_FRAME1.value)
  image_2 = images.read_image(_FRAME2.value)
  if image_1.shape != image_2.shape:
    raise ValueError(
        f'Frame shapes differ: {image_1.shape} vs {image_2.shape}')
  batch_dt = np.full((1,), _TIME.value, dtype=np.float32)
  mid_frame = interpolator(image_1[np.newaxis], image_2[np.newaxis],
                           batch_dt)[0]
  images.write_image(_OUTPUT_FRAME.value, mid_frame)
  print(f'Wrote {_OUTPUT_FRAME.value}')


def cli():
  """Console-script entry point (pyproject.toml)."""
  app.run(main)


if __name__ == '__main__':
  app.run(main)
