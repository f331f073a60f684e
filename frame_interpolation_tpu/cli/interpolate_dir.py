r"""Directory / video interpolation CLI.

Equivalent of the reference's Beam pipeline CLI
(eval/interpolator_cli.py in google-research/frame-interpolation): for each
directory matching --pattern, interpolate recursively between its
(naturally sorted) frames and write `interpolated_frames/frame_%03d.png`
plus `interpolated.mp4` when --output_video is set.

TPU-native behavior change (output-identical): the recursion tree is
evaluated breadth-first with batched device calls
(inference/recursion.interpolate_frontier) instead of 2^T-1 sequential
batch-1 calls; --streaming restores the reference's in-order generator.

  python3 -m frame_interpolation_tpu.cli.interpolate_dir \
    --pattern "photos/*" --params <bundle> --times_to_interpolate 6 \
    --output_video
"""
from __future__ import annotations

import glob
import os
from typing import List

from absl import app, flags, logging

from ._common import (apply_platform_flag, define_flag,
                      load_interpolator_from_flag)

_PATTERN = define_flag(flags.DEFINE_string,
    'pattern', None, 'Glob pattern of directories with input frames.',
    required=True)
_PARAMS = define_flag(flags.DEFINE_string,
    'params', None, "Parameter bundle / TF SavedModel path, or 'random'.",
    required=True)
_TIMES_TO_INTERPOLATE = define_flag(flags.DEFINE_integer,
    'times_to_interpolate', 5,
    'The number of times to run recursive midpoint interpolation: '
    'output has 2^times_to_interpolate+1 frames per input pair.')
_FPS = define_flag(flags.DEFINE_integer, 'fps', 30,
                            'Frames per second to play interpolated videos.')
_ALIGN = define_flag(flags.DEFINE_integer, 'align', 64,
                              'If >1, pad the input size so it divides with '
                              'this before inference.')
_BLOCK_HEIGHT = define_flag(flags.DEFINE_integer, 'block_height', 1,
                                     'Patches along height; 1 = no tiling.')
_BLOCK_WIDTH = define_flag(flags.DEFINE_integer, 'block_width', 1,
                                    'Patches along width; 1 = no tiling.')
_OUTPUT_VIDEO = define_flag(flags.DEFINE_boolean, 'output_video', False,
                                     'If true, also write interpolated.mp4.')
_STREAMING = define_flag(flags.DEFINE_boolean,
    'streaming', False, 'Use the in-order streaming generator (reference '
    'evaluation order) instead of batched frontier recursion.')
_CACHE_FEATURES = define_flag(flags.DEFINE_boolean,
    'cache_features', True,
    'In --streaming mode, compute each frame\'s feature pyramid once and '
    'reuse it across the recursion pairs (bit-identical outputs).')
_MAX_BATCH = define_flag(flags.DEFINE_integer,
    'max_batch', 8, 'Device batch cap for frontier recursion.')
_PAIRS_PER_CHUNK = define_flag(flags.DEFINE_integer,
    'pairs_per_chunk', 0,
    'Input pairs expanded per device chunk in frontier mode; 0 sizes it '
    'automatically from --device_memory_budget_gb.')
_DEVICE_MEMORY_BUDGET_GB = define_flag(flags.DEFINE_float,
    'device_memory_budget_gb', 4.0,
    'Device-memory budget (GiB) for the frontier recursion frame tree; '
    'bounds peak HBM independent of sequence length.')
_PLATFORM = define_flag(flags.DEFINE_string,
    'platform', None,
    "Force a JAX platform (e.g. 'cpu'); default uses the best available.")
_NUM_SHARDS = define_flag(flags.DEFINE_integer,
    'num_shards', 1,
    'Fleet fan-out: total number of hosts splitting the directory list '
    '(the Beam-runner replacement — run one invocation per host with '
    'distinct --shard_index, e.g. from a GKE indexed job).')
_SHARD_INDEX = define_flag(flags.DEFINE_integer,
    'shard_index', 0, 'This host\'s shard in [0, num_shards).')
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
    'mesh', 'none', ['none', 'data'],
    'Multi-chip execution over all visible devices: shards each recursion-'
    'tree chunk over the mesh (parallel.ShardedVideoInterpolator) with '
    'zero cross-chip traffic. Frontier mode only; outputs match '
    'single-device.')

_INPUT_EXT = ('png', 'jpg', 'jpeg')


def process_directory(directory: str, interpolator) -> None:
  from ..inference import recursion
  from ..io import images, video
  input_frames: List[str] = []
  for ext in _INPUT_EXT:
    input_frames.extend(glob.glob(os.path.join(directory, f'*.{ext}')))
  input_frames = images.natural_sort(input_frames)
  if len(input_frames) < 2:
    logging.warning('Skipping %s: fewer than 2 input frames.', directory)
    return
  logging.info('Generating in-between frames for %s.', directory)
  times = _TIMES_TO_INTERPOLATE.value
  frames_dir = os.path.join(directory, 'interpolated_frames')
  # Both modes stream: frames load on demand and write as produced, so host
  # memory is O(1) and (in frontier mode) device memory is bounded by
  # --device_memory_budget_gb for arbitrarily long videos.
  if _STREAMING.value:
    # Feature caching halves feat_net work per midpoint with bit-identical
    # outputs; --nocache_features restores the naive per-pair forward.
    if _CACHE_FEATURES.value:
      # as_uint8: the writers quantize anyway; device-side quantization
      # (identical rule) quarters the per-midpoint fetch.
      frame_iter = recursion.interpolate_recursively_cached(
          input_frames, times, interpolator, as_uint8=True)
    else:
      frame_iter = recursion.interpolate_recursively_from_files(
          input_frames, times, interpolator)
  else:
    # as_uint8: the PNG/mp4 writers quantize anyway; doing it on device
    # (identical rule) quarters the device->host fetch volume.
    frame_iter = recursion.interpolate_frontier_streaming(
        input_frames, times, interpolator, max_batch=_MAX_BATCH.value,
        pairs_per_chunk=_PAIRS_PER_CHUNK.value or None,
        memory_budget_bytes=int(_DEVICE_MEMORY_BUDGET_GB.value * 2**30),
        as_uint8=True)
  os.makedirs(frames_dir, exist_ok=True)

  def stream():
    for index, frame in enumerate(frame_iter):
      images.write_image(
          os.path.join(frames_dir, f'frame_{index:03d}.png'), frame)
      yield frame

  if _OUTPUT_VIDEO.value and video.have_ffmpeg():
    out = os.path.join(directory, 'interpolated.mp4')
    video.write_video(out, stream(), fps=_FPS.value)
    logging.info('Output video saved at %s.', out)
  else:
    if _OUTPUT_VIDEO.value:
      logging.error('ffmpeg not found; skipping video for %s.', directory)
    for _ in stream():
      pass
  logging.info('Output frames saved in %s.', frames_dir)


def main(argv):
  del argv
  if _MESH.value != 'none':
    if _STREAMING.value:
      raise app.UsageError(
          '--mesh data shards frontier-recursion chunks; it does not apply '
          'to the in-order --streaming generator.')
    if _BLOCK_HEIGHT.value * _BLOCK_WIDTH.value > 1:
      raise app.UsageError(
          '--mesh data shards whole recursion-tree nodes; combine with '
          '--block_height/--block_width via interpolate_pair --mesh data '
          'instead.')
  apply_platform_flag(_PLATFORM.value)
  directories = sorted(d for d in glob.glob(_PATTERN.value)
                       if os.path.isdir(d))
  if not directories:
    raise ValueError(f'No directories match pattern {_PATTERN.value}')
  if _NUM_SHARDS.value > 1:
    from ..utils import fanout
    directories = fanout.shard(directories, _SHARD_INDEX.value,
                               _NUM_SHARDS.value)
    logging.info('Shard %d/%d: %d directories.', _SHARD_INDEX.value,
                 _NUM_SHARDS.value, len(directories))
  interpolator = load_interpolator_from_flag(
      _PARAMS.value, _ALIGN.value,
      [_BLOCK_HEIGHT.value, _BLOCK_WIDTH.value],
      warp_impl=_WARP_IMPL.value, fold_convs=_FOLD_CONVS.value,
      conv_stack=_CONV_STACK.value)
  from ._common import to_mesh_interpolator
  interpolator = to_mesh_interpolator(interpolator, _MESH.value,
                                      _ALIGN.value, kind='video')
  for directory in directories:
    process_directory(directory, interpolator)


def cli():
  """Console-script entry point (pyproject.toml)."""
  app.run(main)


if __name__ == '__main__':
  app.run(main)
