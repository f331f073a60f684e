"""Data augmentations as batched, jit-compatible JAX transforms.

Functional parity with the reference's tf.data augmentations
(training/augmentation_lib.py in google-research/frame-interpolation):
random 90-degree rotations, left-right flips, +/-45-degree bilinear
rotations, temporal reversal, plus the flow-aware variants (flow_rot90,
rotate_flow, flow_flip) that counter-rotate (u, v) vectors.

TPU-first design difference: the reference runs augmentations per-example
on the host CPU inside tf.data; here they are pure functions of
(rng, batch) executed ON DEVICE inside the jitted train step — vmapped over
the batch with per-example keys. The host input pipeline stays a thin
decode+crop loop (it is bandwidth-bound), while the interpolation-heavy
rotation runs on the VPU where it is effectively free alongside the model
step. Randomness is drawn per example, matching the reference's semantics
of independent per-example augmentation.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Batch = Dict[str, jnp.ndarray]
_IMAGE_KEYS = ('x0', 'x1', 'y')


def _rot90_single(image: jnp.ndarray, k) -> jnp.ndarray:
  """tf.image.rot90 parity (counter-clockwise k times) for (H, W, C).

  `k` may be a Python int for any image, or a traced value for SQUARE
  images only (lax.switch branches must agree on shape; the reference only
  randomizes rot90 after the square training crop anyway).
  """
  branches = [
      lambda x: x,
      lambda x: jnp.flip(jnp.swapaxes(x, 0, 1), 0),  # 90 ccw
      lambda x: jnp.flip(jnp.flip(x, 0), 1),         # 180
      lambda x: jnp.flip(jnp.swapaxes(x, 0, 1), 1),  # 270 ccw
  ]
  if isinstance(k, (int, np.integer)):
    return branches[k % 4](image)
  if image.shape[0] != image.shape[1]:
    raise ValueError(
        'random rot90 with a traced k needs square images (apply the '
        f'training crop first); got {image.shape}')
  return jax.lax.switch(k, branches, image)


def _bilinear_sample_constant(image: jnp.ndarray, qy: jnp.ndarray,
                              qx: jnp.ndarray) -> jnp.ndarray:
  """Bilinear lookup of (H, W, C) at query points, constant-0 outside."""
  h, w = image.shape[0], image.shape[1]
  fy = jnp.floor(qy)
  fx = jnp.floor(qx)
  ay = (qy - fy)[..., None]
  ax = (qx - fx)[..., None]
  iy = fy.astype(jnp.int32)
  ix = fx.astype(jnp.int32)

  def tap(dy, dx):
    yy = iy + dy
    xx = ix + dx
    valid = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w))[..., None]
    yc = jnp.clip(yy, 0, h - 1)
    xc = jnp.clip(xx, 0, w - 1)
    return jnp.where(valid, image[yc, xc], 0.0)

  top = tap(0, 0) * (1 - ax) + tap(0, 1) * ax
  bot = tap(1, 0) * (1 - ax) + tap(1, 1) * ax
  return top * (1 - ay) + bot * ay


def rotate_image(image: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
  """Rotates (H, W, C) by `angle` radians counter-clockwise about center.

  Bilinear sampling, constant-0 fill — tfa_image.rotate parity
  (reference augmentation_lib.py:83-88, 189-193). The output pixel (y, x)
  reads the input at the inverse-rotated location.
  """
  h, w = image.shape[0], image.shape[1]
  cy = (h - 1) / 2.0
  cx = (w - 1) / 2.0
  gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
  gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
  cos = jnp.cos(angle)
  sin = jnp.sin(angle)
  # Inverse rotation of the output grid (image content turns ccw).
  qx = cos * gx - sin * gy + cx
  qy = sin * gx + cos * gy + cy
  return _bilinear_sample_constant(image, qy, qx)


def rotate_flow_vectors(flow: jnp.ndarray, angle) -> jnp.ndarray:
  """Rotates each (u, v) flow vector by `angle` radians.

  Matches the reference's coordinate handling (augmentation_lib.py:27-54):
  image y points down, so v = -y and the vector rotation becomes
  rot_u = cos*u + sin*v, rot_v = -sin*u + cos*v.
  """
  u = flow[..., 0:1]
  v = flow[..., 1:2]
  rot_u = jnp.cos(angle) * u + jnp.sin(angle) * v
  rot_v = -jnp.sin(angle) * u + jnp.cos(angle) * v
  return jnp.concatenate([rot_u, rot_v], axis=-1)


def flow_rot90(flow: jnp.ndarray, k) -> jnp.ndarray:
  """Rotates a flow map (H, W, 2) by k*90deg, counter-rotating vectors."""
  angle = jnp.asarray(k, jnp.float32) * (jnp.pi / 2.0)
  flow = _rot90_single(flow, k)
  return rotate_flow_vectors(flow, angle)


def rotate_flow(flow: jnp.ndarray, angle) -> jnp.ndarray:
  """Rotates a flow map by `angle` radians, counter-rotating vectors.

  Uses reflect fill like the reference (augmentation_lib.py:83-88); with
  bilinear interpolation the map is rotated first, then vectors adjusted.
  """
  h, w = flow.shape[0], flow.shape[1]
  cy = (h - 1) / 2.0
  cx = (w - 1) / 2.0
  gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
  gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
  cos = jnp.cos(angle)
  sin = jnp.sin(angle)
  qx = cos * gx - sin * gy + cx
  qy = sin * gx + cos * gy + cy
  # Reflect out-of-bounds queries into the valid range.
  qy = _reflect(qy, h)
  qx = _reflect(qx, w)
  rotated = _bilinear_sample_constant(flow, qy, qx)
  return rotate_flow_vectors(rotated, angle)


def _reflect(q: jnp.ndarray, size: int) -> jnp.ndarray:
  """Reflects coordinates into [0, size-1] (tfa 'reflect' fill mode)."""
  period = 2.0 * (size - 1)
  q = jnp.mod(jnp.abs(q), period)
  return jnp.where(q > size - 1, period - q, q)


def flow_flip(flow: jnp.ndarray) -> jnp.ndarray:
  """Left-right flips a flow map and negates the u component."""
  flow = jnp.flip(flow, axis=1)
  return jnp.concatenate([-flow[..., 0:1], flow[..., 1:2]], axis=-1)


# ---- per-example random augmentations (vmapped over the batch) --------------


def _random_image_rot90(key, images: Batch) -> Batch:
  k = jax.random.randint(key, (), 0, 4)
  return {name: _rot90_single(img, k) for name, img in images.items()}


def _random_flip(key, images: Batch) -> Batch:
  flip = jax.random.randint(key, (), 0, 2).astype(bool)
  return {
      name: jnp.where(flip, jnp.flip(img, axis=1), img)
      for name, img in images.items()
  }


def _random_rotate(key, images: Batch) -> Batch:
  key_prob, key_angle = jax.random.split(key)
  prob = jax.random.randint(key_prob, (), 0, 2).astype(jnp.float32)
  angle = jax.random.uniform(key_angle, (), minval=-0.25 * jnp.pi,
                             maxval=0.25 * jnp.pi)
  return {name: rotate_image(img, angle * prob)
          for name, img in images.items()}


def _random_reverse(key, images: Batch) -> Batch:
  swap = jax.random.randint(key, (), 0, 2).astype(bool)
  out = dict(images)
  if 'x0' in images and 'x1' in images:
    out['x0'] = jnp.where(swap, images['x1'], images['x0'])
    out['x1'] = jnp.where(swap, images['x0'], images['x1'])
  return out

_REGISTRY: Dict[str, Callable] = {
    'random_image_rot90': _random_image_rot90,
    'random_flip': _random_flip,
    'random_rotate': _random_rotate,
    'random_reverse': _random_reverse,
}


def data_augmentations(names: Sequence[str]) -> List[Callable]:
  """Name registry parity (reference augmentation_lib.py:197-220)."""
  fns = []
  for name in names:
    if name not in _REGISTRY:
      raise AttributeError(f'Invalid augmentation function {name}')
    fns.append(_REGISTRY[name])
  return fns


def apply_data_augmentation(augmentation_fns: Sequence[Callable],
                            rng: jax.Array, batch: Batch) -> Batch:
  """Applies augmentations to a batch, independently per example.

  Args:
    augmentation_fns: from `data_augmentations`.
    rng: a PRNG key; consumed functionally (pass a fresh fold per step).
    batch: dict with (B, H, W, C) arrays under 'x0', 'x1', 'y' (other keys
      pass through untouched).

  Returns:
    The augmented batch, same shapes.
  """
  if not augmentation_fns:
    return batch
  image_keys = [k for k in _IMAGE_KEYS if k in batch]
  images = {k: batch[k] for k in image_keys}
  batch_size = images[image_keys[0]].shape[0]

  def augment_one(key, example: Batch) -> Batch:
    for index, fn in enumerate(augmentation_fns):
      key_fn = jax.random.fold_in(key, index)
      example = fn(key_fn, example)
    return example

  keys = jax.random.split(rng, batch_size)
  augmented = jax.vmap(augment_one)(keys, images)
  out = dict(batch)
  out.update(augmented)
  return out


@functools.partial(jax.jit, static_argnames=('names',))
def augment_batch(rng: jax.Array, batch: Batch, names) -> Batch:
  """Jitted convenience wrapper keyed by augmentation names."""
  return apply_data_augmentation(data_augmentations(tuple(names)), rng, batch)
