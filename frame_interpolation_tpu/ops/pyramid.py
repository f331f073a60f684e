"""Pyramid algebra for the FILM interpolator, as pure JAX functions.

TPU-native re-design of the pyramid helpers in the reference's
models/film_net/util.py (google-research/frame-interpolation):
  * build_image_pyramid   (util.py:23-45)  — 2x2/2 average-pool halving
  * multiply_pyramid      (util.py:85-103) — per-batch scalar multiply
  * flow_pyramid_synthesis(util.py:106-117)— residual -> absolute flows
  * pyramid_warp          (util.py:120-134)— backward-warp each level
  * concatenate_pyramids  (util.py:137-144)— channel concat per level

Pyramids are plain Python lists of (B, H, W, C) arrays, finest level first.
All ops are jit-compatible (static list lengths, static shapes).
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from . import resize
from . import warp as warp_ops


def avg_pool_2x(image: jnp.ndarray) -> jnp.ndarray:
  """2x2 stride-2 VALID average pooling (tf.keras AveragePooling2D parity).

  The init value must be a Python scalar literal so JAX pattern-matches the
  add-monoid and uses the differentiable reduce-window-sum primitive.
  """
  return jax.lax.reduce_window(
      image, 0., jax.lax.add,
      window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
      padding='VALID') * 0.25


def build_image_pyramid(image: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
  """Builds `levels` images, original first, each successive one half-size."""
  pyramid = []
  for i in range(levels):
    pyramid.append(image)
    if i < levels - 1:
      image = avg_pool_2x(image)
  return pyramid


def multiply_pyramid(pyramid: Sequence[jnp.ndarray],
                     scalar: jnp.ndarray) -> List[jnp.ndarray]:
  """Multiplies each level by a per-batch scalar of shape (B,)."""
  return [
      image * scalar[:, None, None, None].astype(image.dtype)
      for image in pyramid
  ]


def flow_pyramid_synthesis(
    residual_pyramid: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
  """Converts residual flow pyramid (finest first) into absolute flows.

  Coarse-to-fine: each finer absolute flow is the 2x-upsampled, 2x-scaled
  coarser flow plus the residual at that level (reference util.py:106-117).
  """
  flow = residual_pyramid[-1]
  flow_pyramid = [flow]
  for residual_flow in reversed(list(residual_pyramid)[:-1]):
    h, w = residual_flow.shape[-3], residual_flow.shape[-2]
    flow = resize.resize_bilinear(2.0 * flow, (h, w)).astype(flow.dtype)
    flow = residual_flow + flow
    flow_pyramid.append(flow)
  return list(reversed(flow_pyramid))


def pyramid_warp(feature_pyramid: Sequence[jnp.ndarray],
                 flow_pyramid: Sequence[jnp.ndarray],
                 impl: str = 'gather') -> List[jnp.ndarray]:
  """Backward-warps each feature level with the matching flow level."""
  return [
      warp_ops.backward_warp_impl(features, flow, impl)
      for features, flow in zip(feature_pyramid, flow_pyramid)
  ]






def concatenate_pyramids(pyramid1: Sequence[jnp.ndarray],
                         pyramid2: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
  """Concatenates matching levels along channels."""
  return [
      jnp.concatenate([a, b], axis=-1)
      for a, b in zip(pyramid1, pyramid2)
  ]
