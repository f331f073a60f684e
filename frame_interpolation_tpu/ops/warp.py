"""Backward (inverse) bilinear warping for TPU.

This is the TPU-native equivalent of the reference's only custom-kernel-worthy
op: `tensorflow_addons.image.dense_image_warp` as used through
`models/film_net/util.py:48-82` in google-research/frame-interpolation.

Reference semantics (util.warp):
  out[b, y, x] = bilinear_lookup(image[b], y + flow[b,y,x,1], x + flow[b,y,x,0])

with the tfa `_interpolate_bilinear` boundary rule: the floor of each query
coordinate is clamped into [0, size-2] and the fractional part (alpha) is
clamped into [0, 1]. Out-of-bounds queries therefore clamp to edge pixels.

TPU-first implementation: the four neighbor taps are expressed as one flat
row-gather over the (H*W, C) image followed by three shifted gathers. XLA
lowers these to dynamic-gathers of contiguous C-length rows, which is
bandwidth-efficient on TPU; coordinates and blend weights are computed in
f32 on the VPU regardless of the image dtype. Gradients flow through both
the image (scatter-add transpose of gather) and the flow (through alpha).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def backward_warp(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
  """Backward-warps `image` with `flow` ((dx, dy) per pixel).

  Args:
    image: (B, H, W, C) array.
    flow: (B, H, W, 2) array; channel 0 is dx (x-offset), channel 1 is dy.

  Returns:
    Warped image of the same shape and dtype as `image`.
  """
  b, h, w, c = image.shape
  compute_dtype = image.dtype

  # Query coordinates, f32 for precision even when images are bf16.
  flow = flow.astype(jnp.float32)
  gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
  gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
  qy = gy[None] + flow[..., 1]
  qx = gx[None] + flow[..., 0]

  # tfa boundary rule: floor clamped to [0, size-2], alpha clamped to [0, 1].
  fy = jnp.clip(jnp.floor(qy), 0.0, float(h - 2))
  fx = jnp.clip(jnp.floor(qx), 0.0, float(w - 2))
  ay = jnp.clip(qy - fy, 0.0, 1.0)
  ax = jnp.clip(qx - fx, 0.0, 1.0)

  iy = fy.astype(jnp.int32)
  ix = fx.astype(jnp.int32)
  flat_tl = iy * w + ix  # (B, H, W)

  img_flat = image.reshape(b, h * w, c)

  def gather_rows(flat_idx):
    # (B, H, W) int32 -> (B, H, W, C)
    return jax.vmap(lambda im, idx: jnp.take(im, idx, axis=0))(
        img_flat, flat_idx.reshape(b, h * w)).reshape(b, h, w, c)

  tl = gather_rows(flat_tl)
  tr = gather_rows(flat_tl + 1)
  bl = gather_rows(flat_tl + w)
  br = gather_rows(flat_tl + w + 1)

  ax = ax[..., None]
  ay = ay[..., None]
  top = tl.astype(jnp.float32) + (tr.astype(jnp.float32) -
                                  tl.astype(jnp.float32)) * ax
  bot = bl.astype(jnp.float32) + (br.astype(jnp.float32) -
                                  bl.astype(jnp.float32)) * ax
  out = top + (bot - top) * ay
  return out.astype(compute_dtype)
