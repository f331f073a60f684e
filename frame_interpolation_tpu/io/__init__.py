"""Host-side I/O: images, video, parameter bundles, TF weight import."""

from .images import natural_sort, read_image, to_uint8, write_image
from .params_io import load_params, save_params

__all__ = [
    'load_params', 'natural_sort', 'read_image', 'save_params', 'to_uint8',
    'write_image',
]
