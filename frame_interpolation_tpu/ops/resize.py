"""TPU-native image resizing with TF2 `tf.image.resize` parity.

The FILM reference uses `tf.image.resize` in two places on the hot path:
  * bilinear x2 upsampling of flow fields
    (reference: models/film_net/pyramid_flow_estimator.py:154-155 and
     models/film_net/util.py:116-118), and
  * nearest-neighbor upsampling inside the fusion decoder
    (reference: models/film_net/fusion.py:133-134).

TF2's resize uses half-pixel centers and no antialiasing by default. We
reproduce those semantics exactly, because the checkpoint-parity budget is
<0.05 dB PSNR.

Implementation notes (TPU-first):
  * The exact-x2 upsampling cases are implemented with pure slicing +
    interleaving arithmetic (no gathers), which XLA fuses into neighboring
    element-wise ops and keeps entirely on the VPU.
  * The general path builds static index/weight tables with numpy at trace
    time (shapes are static under jit), and applies two 1-D linear resamples
    via `jnp.take`. Static-index gathers lower efficiently on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _linear_interp_tables(in_size: int, out_size: int):
  """TF2 half-pixel bilinear interpolation tables for one axis.

  Mirrors the TF kernel (compute_interpolation_weights with
  HalfPixelScaler): in_x = (x + 0.5) * scale - 0.5; lower = max(floor, 0);
  upper = min(ceil, in-1); lerp = in_x - floor(in_x).
  """
  scale = in_size / out_size
  x = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
  floor = np.floor(x)
  lower = np.maximum(floor.astype(np.int64), 0)
  upper = np.minimum(np.ceil(x).astype(np.int64), in_size - 1)
  lerp = (x - floor).astype(np.float32)
  return lower, upper, lerp


def _nearest_index_table(in_size: int, out_size: int):
  """TF2 half-pixel nearest neighbor index table for one axis."""
  scale = in_size / out_size
  idx = np.floor((np.arange(out_size, dtype=np.float64) + 0.5) * scale)
  return np.clip(idx.astype(np.int64), 0, in_size - 1)


def _resample_axis_linear(x: jnp.ndarray, axis: int, in_size: int,
                          out_size: int) -> jnp.ndarray:
  lower, upper, lerp = _linear_interp_tables(in_size, out_size)
  lo = jnp.take(x, jnp.asarray(lower), axis=axis)
  up = jnp.take(x, jnp.asarray(upper), axis=axis)
  shape = [1] * x.ndim
  shape[axis] = out_size
  w = jnp.asarray(lerp, dtype=jnp.float32).reshape(shape)
  out = lo.astype(jnp.float32) * (1.0 - w) + up.astype(jnp.float32) * w
  return out


def _interleave(a: jnp.ndarray, b: jnp.ndarray, axis: int) -> jnp.ndarray:
  """Interleaves two equal-shaped arrays along `axis` (a0 b0 a1 b1 ...)."""
  stacked = jnp.stack([a, b], axis=axis + 1)
  shape = list(a.shape)
  shape[axis] *= 2
  return stacked.reshape(shape)


def _upsample2x_axis_linear(x: jnp.ndarray, axis: int) -> jnp.ndarray:
  """Exact-x2 TF bilinear upsample along one axis using only slices.

  With half-pixel centers, out[2i] = 0.25*in[i-1] + 0.75*in[i] and
  out[2i+1] = 0.75*in[i] + 0.25*in[i+1], with edge-clamped neighbors.
  Verified bit-equal (mod fp-association) with tf.image.resize in tests.
  """
  n = x.shape[axis]
  # Edge-clamped shifted views.
  first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
  last = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
  prev = jnp.concatenate(
      [first, jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)], axis=axis)
  nxt = jnp.concatenate(
      [jax.lax.slice_in_dim(x, 1, n, axis=axis), last], axis=axis)
  even = 0.25 * prev + 0.75 * x
  odd = 0.75 * x + 0.25 * nxt
  return _interleave(even, odd, axis)


def resize_bilinear(image: jnp.ndarray, size) -> jnp.ndarray:
  """`tf.image.resize(images, size)` parity (bilinear, half-pixel, no AA).

  Args:
    image: (..., H, W, C) array.
    size: (new_h, new_w) python ints.

  Returns:
    Resized array with float32 values (TF returns float32 as well).
  """
  new_h, new_w = int(size[0]), int(size[1])
  h, w = image.shape[-3], image.shape[-2]
  if (h, w) == (new_h, new_w):
    return image.astype(jnp.float32)
  orig_dtype = image.dtype
  x = image.astype(jnp.float32)
  if new_h == 2 * h and new_w == 2 * w:
    x = _upsample2x_axis_linear(x, image.ndim - 3)
    x = _upsample2x_axis_linear(x, image.ndim - 2)
    return x
  x = _resample_axis_linear(x, image.ndim - 3, h, new_h)
  x = _resample_axis_linear(x, image.ndim - 2, w, new_w)
  del orig_dtype
  return x


def resize_nearest(image: jnp.ndarray, size) -> jnp.ndarray:
  """`tf.image.resize(images, size, method=NEAREST)` parity.

  Keeps the input dtype (TF nearest does not convert to float).
  """
  new_h, new_w = int(size[0]), int(size[1])
  h, w = image.shape[-3], image.shape[-2]
  if (h, w) == (new_h, new_w):
    return image
  if new_h == 2 * h and new_w == 2 * w:
    x = jnp.repeat(image, 2, axis=image.ndim - 3)
    return jnp.repeat(x, 2, axis=image.ndim - 2)
  hi = jnp.asarray(_nearest_index_table(h, new_h))
  wi = jnp.asarray(_nearest_index_table(w, new_w))
  x = jnp.take(image, hi, axis=image.ndim - 3)
  return jnp.take(x, wi, axis=image.ndim - 2)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _resize_bilinear_jit(image, new_h, new_w):
  return resize_bilinear(image, (new_h, new_w))
