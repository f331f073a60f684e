"""Host-side image I/O (PIL), reference-parity numerics.

Matches eval/util.py:29-59 of google-research/frame-interpolation:
  * read: decode to 3-channel RGB, float32, [0, 1] (value / 255).
  * write: clip(image * 255, 0, 255), add 0.5, truncate to uint8 —
    i.e. round-half-up — then PNG (default) or JPEG by extension.

Image decode/encode stays on the host CPU, exactly as in the reference; the
TPU only ever sees float32 tensors.
"""
from __future__ import annotations

import os
from typing import Sequence

import numpy as np
from PIL import Image
from PIL import PngImagePlugin

# Some PNGs in the wild (e.g. the reference's photos/) carry very large
# ancillary text chunks; raise PIL's safety cap so they decode.
PngImagePlugin.MAX_TEXT_CHUNK = max(PngImagePlugin.MAX_TEXT_CHUNK,
                                    64 * 1024 * 1024)

_UINT8_MAX_F = 255.0


def read_image(filename: str) -> np.ndarray:
  """Reads an sRGB 8-bit image into a float32 [0,1] RGB array (H, W, 3)."""
  with Image.open(filename) as img:
    rgb = img.convert('RGB')
    arr = np.asarray(rgb, dtype=np.float32)
  return arr / _UINT8_MAX_F


def read_image_uint8(filename: str) -> np.ndarray:
  """Reads an sRGB 8-bit image as raw (H, W, 3) uint8.

  `uint8 / 255` on device reproduces read_image bit-for-bit, so device
  consumers (Interpolator.expand_tree_device) can take this form directly
  and quarter the host->device transfer — material on tunneled TPU hosts
  where transfers bound video throughput.
  """
  with Image.open(filename) as img:
    return np.asarray(img.convert('RGB'), dtype=np.uint8)


def to_uint8(image: np.ndarray) -> np.ndarray:
  """Float [0,1] -> uint8 with the reference's round-half-up rule.

  uint8 input passes through unchanged, so frames already quantized on
  device (Interpolator.expand_tree_device(as_uint8=True) applies this
  exact rule in-jit) are not double-converted.
  """
  image = np.asarray(image)
  if image.dtype == np.uint8:
    return image
  clipped = np.clip(image.astype(np.float32) * _UINT8_MAX_F, 0.0,
                    _UINT8_MAX_F)
  return (clipped + 0.5).astype(np.uint8)


def write_image(filename: str, image: np.ndarray) -> None:
  """Writes a float32 [0,1] RGB array as PNG (or JPEG for .jpg)."""
  directory = os.path.dirname(filename)
  if directory:
    os.makedirs(directory, exist_ok=True)
  data = to_uint8(image)
  img = Image.fromarray(data)
  extension = os.path.splitext(filename)[1].lower()
  if extension in ('.jpg', '.jpeg'):
    img.save(filename, format='JPEG', quality=95)
  else:
    img.save(filename, format='PNG')


def natural_sort(names: Sequence[str]) -> list:
  """Natural (human) sort: frame_2 < frame_10. Replaces natsort.natsorted."""
  import re

  def key(name):
    parts = re.split(r'(\d+)', name)
    return [int(p) if p.isdigit() else p for p in parts]

  return sorted(names, key=key)
