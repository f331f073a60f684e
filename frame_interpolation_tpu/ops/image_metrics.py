"""SSIM / PSNR image metrics with `tf.image` parity, in pure JAX.

The reference computes eval metrics with `tf.image.ssim` / `tf.image.psnr`
(losses/losses.py:105-113 in google-research/frame-interpolation). Benchmark
parity requires matching TF's exact formulation:

  * SSIM: 11x11 Gaussian window (sigma=1.5), VALID padding, k1=0.01,
    k2=0.03, computed per channel then averaged over spatial positions and
    channels. TF's helper computes cs from reducer(x*y) and
    reducer(x**2 + y**2) (not centered moments directly) — reproduced here
    so rounding behavior matches.
  * PSNR: 20*log10(max_val) - 10*log10(mse), mse over (H, W, C).

Separable Gaussian filtering is expressed as two depthwise 1-D convolutions,
which XLA maps onto TPU convolution hardware.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(size: int, sigma: float) -> np.ndarray:
  coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
  g = np.exp(-(coords**2) / (2.0 * sigma**2))
  # TF builds the 2D kernel via softmax over the outer sum; normalizing the
  # outer product is equivalent.
  k2d = np.outer(g, g)
  k2d /= k2d.sum()
  return k2d.astype(np.float32)


def _filter2d_valid(x: jnp.ndarray, kernel2d: np.ndarray) -> jnp.ndarray:
  """Depthwise VALID 2-D filter on (B, H, W, C) with a (k, k) kernel."""
  b, h, w, c = x.shape
  k = kernel2d.shape[0]
  # Fold channels into batch, convolve single-channel (TF does the same).
  xr = x.transpose(0, 3, 1, 2).reshape(b * c, h, w, 1)
  kern = jnp.asarray(kernel2d).reshape(k, k, 1, 1)
  out = jax.lax.conv_general_dilated(
      xr, kern, window_strides=(1, 1), padding='VALID',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  oh, ow = out.shape[1], out.shape[2]
  return out.reshape(b, c, oh, ow, 1)[..., 0].transpose(0, 2, 3, 1)


def ssim(img1: jnp.ndarray,
         img2: jnp.ndarray,
         max_val: float = 1.0,
         filter_size: int = 11,
         filter_sigma: float = 1.5,
         k1: float = 0.01,
         k2: float = 0.03) -> jnp.ndarray:
  """Per-image SSIM, shape (B,), matching tf.image.ssim."""
  x = img1.astype(jnp.float32)
  y = img2.astype(jnp.float32)
  kernel = _gaussian_kernel(filter_size, filter_sigma)
  c1 = (k1 * max_val)**2
  c2 = (k2 * max_val)**2

  mean0 = _filter2d_valid(x, kernel)
  mean1 = _filter2d_valid(y, kernel)
  num0 = mean0 * mean1 * 2.0
  den0 = jnp.square(mean0) + jnp.square(mean1)
  luminance = (num0 + c1) / (den0 + c1)

  num1 = _filter2d_valid(x * y, kernel) * 2.0
  den1 = _filter2d_valid(jnp.square(x) + jnp.square(y), kernel)
  cs = (num1 - num0 + c2) / (den1 - den0 + c2)

  ssim_map = luminance * cs
  return jnp.mean(ssim_map, axis=(1, 2, 3))


def psnr(img1: jnp.ndarray, img2: jnp.ndarray,
         max_val: float = 1.0) -> jnp.ndarray:
  """Per-image PSNR, shape (B,), matching tf.image.psnr."""
  x = img1.astype(jnp.float32)
  y = img2.astype(jnp.float32)
  mse = jnp.mean(jnp.square(x - y), axis=(-3, -2, -1))
  log10 = jnp.log(jnp.asarray(10.0, jnp.float32))
  return (20.0 * jnp.log(jnp.asarray(float(max_val), jnp.float32)) / log10 -
          10.0 * jnp.log(mse) / log10)
