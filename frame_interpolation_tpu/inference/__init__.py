"""Inference API: Interpolator wrapper and recursive midpoint drivers."""

from .interpolator import Interpolator, load_interpolator
from .recursion import (interpolate_frontier, interpolate_frontier_streaming,
                        interpolate_recursively,
                        interpolate_recursively_cached,
                        interpolate_recursively_from_files,
                        num_interpolated_frames, num_output_frames)

__all__ = [
    'Interpolator', 'interpolate_frontier', 'interpolate_frontier_streaming',
    'interpolate_recursively',
    'interpolate_recursively_cached',
    'interpolate_recursively_from_files', 'load_interpolator',
    'num_interpolated_frames', 'num_output_frames',
]
