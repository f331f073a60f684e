"""Core TPU-native ops for the frame interpolation framework."""

from .image_metrics import psnr, ssim
from .pyramid import (avg_pool_2x, build_image_pyramid, concatenate_pyramids,
                      flow_pyramid_synthesis, multiply_pyramid, pyramid_warp)
from .resize import resize_bilinear, resize_nearest
from .tiling import (crop_to_bounding_box, image_to_patches, pad_to_align,
                     patches_to_image)
from .warp import backward_warp, backward_warp_impl
from .warp_window import backward_warp_window

__all__ = [
    'avg_pool_2x', 'backward_warp', 'backward_warp_impl',
    'backward_warp_window', 'build_image_pyramid',
    'concatenate_pyramids', 'crop_to_bounding_box', 'flow_pyramid_synthesis',
    'image_to_patches', 'multiply_pyramid', 'pad_to_align',
    'patches_to_image', 'psnr', 'pyramid_warp', 'resize_bilinear',
    'resize_nearest', 'ssim',
]
