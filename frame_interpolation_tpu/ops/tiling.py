"""Padding and patch fold/unfold for high-resolution inference.

TPU-native equivalent of the reference's alignment padding and
`tf.space_to_batch`-based patching (eval/interpolator.py:30-126 in
google-research/frame-interpolation):

  * `pad_to_align` center-pads H and W up to a multiple of `align` (64 for the
    released 7-level models) and returns the crop box to undo it.
  * `image_to_patches` folds (B=1, H, W, C) into (bh*bw, H/bh, W/bw, C)
    contiguous patches in raster order — equivalent to the reference's
    space_to_batch + split + stack + reshape dance, but done as a single
    reshape/transpose so it stays free (layout-only) on device.
  * `patches_to_image` is the exact inverse.

Unlike the reference — which loops over patches at batch size 1
(eval/interpolator.py:199-202) — callers here run all patches as one batch,
which is how TPUs want the work delivered.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp


def pad_to_align(x: jnp.ndarray, align: int) -> Tuple[jnp.ndarray, Dict]:
  """Center-pads so H and W divide `align`; returns (padded, crop_box).

  Matches reference eval/interpolator.py:30-63 (tf.image.pad_to_bounding_box
  zero-pads; offset is pad//2).
  """
  assert x.ndim == 4
  assert align > 0, 'align must be a positive number.'
  height, width = x.shape[-3:-1]
  height_to_pad = (align - height % align) if height % align != 0 else 0
  width_to_pad = (align - width % align) if width % align != 0 else 0

  top = height_to_pad // 2
  left = width_to_pad // 2
  padded = jnp.pad(
      x, ((0, 0), (top, height_to_pad - top), (left, width_to_pad - left),
          (0, 0)))
  bbox_to_crop = {
      'offset_height': top,
      'offset_width': left,
      'target_height': height,
      'target_width': width,
  }
  return padded, bbox_to_crop


def crop_to_bounding_box(image: jnp.ndarray, offset_height: int,
                         offset_width: int, target_height: int,
                         target_width: int) -> jnp.ndarray:
  """tf.image.crop_to_bounding_box parity."""
  return image[..., offset_height:offset_height + target_height,
               offset_width:offset_width + target_width, :]


def image_to_patches(image: jnp.ndarray, block_shape) -> jnp.ndarray:
  """Folds (1, H, W, C) into (bh*bw, H/bh, W/bw, C) raster-order patches."""
  block_height, block_width = block_shape
  batch, height, width, channel = image.shape
  assert batch == 1, 'patch folding is defined for batch-1 images.'
  patch_height, patch_width = height // block_height, width // block_width
  assert height == patch_height * block_height, (
      f'block_height={block_height} should evenly divide height={height}.')
  assert width == patch_width * block_width, (
      f'block_width={block_width} should evenly divide width={width}.')
  x = image.reshape(block_height, patch_height, block_width, patch_width,
                    channel)
  x = x.transpose(0, 2, 1, 3, 4)
  return x.reshape(block_height * block_width, patch_height, patch_width,
                   channel)


def patches_to_image(patches: jnp.ndarray, block_shape) -> jnp.ndarray:
  """Inverse of `image_to_patches`: (bh*bw, ph, pw, C) -> (1, H, W, C)."""
  block_height, block_width = block_shape
  num, patch_height, patch_width, channel = patches.shape
  assert num == block_height * block_width
  x = patches.reshape(block_height, block_width, patch_height, patch_width,
                      channel)
  x = x.transpose(0, 2, 1, 3, 4)
  return x.reshape(1, block_height * patch_height, block_width * patch_width,
                   channel)
