"""VGG19 perceptual and style (Gram) losses in pure JAX.

TPU-native re-implementation of the reference's VGG19 losses
(losses/vgg19_loss.py in google-research/frame-interpolation), preserving its
numerical quirks exactly, because the released Style checkpoint was trained
against them:

  * weights come from the MatConvNet `imagenet-vgg-verydeep-19.mat` release
    (loaded host-side with scipy.io, converted to jnp constants, memoized);
  * inputs are scaled to [0, 255] and the hardcoded ImageNet mean
    (123.68, 116.779, 103.939) is subtracted (reference vgg19_loss.py:104-106,
    238-241);
  * the tower runs conv1_1..conv5_2 with ReLU, and 2x2 stride-2 SAME
    average pooling between blocks (reference vgg19_loss.py:50-62);
  * vgg_loss = sum_i w_i * mean|feat_ref_i - feat_img_i| over
    conv{1..5}_2, divided by 255 at the end (reference vgg19_loss.py:243-251);
  * style_loss = sum_i w_i * mean((G(ref_i/255) - G(img_i/255))^2) with
    Gram G(F) = F^T F / (h*w) (reference vgg19_loss.py:287-303, 336-362);
  * default layer weights [1/2.6, 1/4.8, 1/3.7, 1/5.6, 10/1.5]
    (reference vgg19_loss.py:237, 335).

TPU notes: the whole tower is plain convs + relus, which XLA fuses onto the
MXU; the weights are closed over as constants so the loss jits into the
training step. An optional single-channel spatial mask is resized per layer,
matching the reference.
"""
from __future__ import annotations

import functools
import threading
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import resize

_DEFAULT_WEIGHTS = (1.0 / 2.6, 1.0 / 4.8, 1.0 / 3.7, 1.0 / 5.6, 10.0 / 1.5)
_IMAGENET_MEAN = (123.6800, 116.7790, 103.9390)

# MatConvNet layer indices of the conv layers we need, in tower order.
_CONV_INDICES = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30)
_CONV_NAMES = ('conv1_1', 'conv1_2', 'conv2_1', 'conv2_2', 'conv3_1',
               'conv3_2', 'conv3_3', 'conv3_4', 'conv4_1', 'conv4_2',
               'conv4_3', 'conv4_4', 'conv5_1', 'conv5_2')
# Average pooling happens after these layers (end of each VGG block).
_POOL_AFTER = ('conv1_2', 'conv2_2', 'conv3_4', 'conv4_4')
_LOSS_LAYERS = ('conv1_2', 'conv2_2', 'conv3_2', 'conv4_2', 'conv5_2')

_cache_lock = threading.Lock()


@functools.lru_cache(maxsize=2)
def _load_vgg_weights(model_filepath: str) -> Tuple[Tuple[np.ndarray,
                                                          np.ndarray], ...]:
  """Loads (kernel, bias) pairs from the MatConvNet .mat release.

  The nested indexing mirrors the MatConvNet cell-array layout the reference
  reads (vgg19_loss.py:65-82): layers[0][i][0][0][2][0][{0,1}].
  """
  import scipy.io as sio
  raw = sio.loadmat(model_filepath)
  layers = raw['layers'][0]
  out = []
  for index in _CONV_INDICES:
    weights = np.asarray(layers[index][0][0][2][0][0], dtype=np.float32)
    bias = np.asarray(layers[index][0][0][2][0][1], dtype=np.float32)
    out.append((weights, bias.reshape(-1)))
  return tuple(out)


def _conv_relu(x: jnp.ndarray, kernel: jnp.ndarray,
               bias: jnp.ndarray) -> jnp.ndarray:
  y = jax.lax.conv_general_dilated(
      x, kernel, window_strides=(1, 1), padding='SAME',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  return jax.nn.relu(y + bias)


def _avg_pool_same(x: jnp.ndarray) -> jnp.ndarray:
  """2x2 stride-2 SAME average pooling (tf.nn.avg_pool parity).

  TF's SAME avg-pool divides by the true window size at edges; with
  2x2/stride-2 on possibly odd inputs, edge windows shrink to 2 or 1
  elements. reduce_window-sum with a matching count normalizer reproduces
  that exactly.
  """
  sum_pool = jax.lax.reduce_window(
      x, 0., jax.lax.add, window_dimensions=(1, 2, 2, 1),
      window_strides=(1, 2, 2, 1), padding='SAME')
  ones = jnp.ones(x.shape[1:3], x.dtype)[None, ..., None]
  counts = jax.lax.reduce_window(
      ones, 0., jax.lax.add, window_dimensions=(1, 2, 2, 1),
      window_strides=(1, 2, 2, 1), padding='SAME')
  return sum_pool / counts


def vgg_features(image: jnp.ndarray,
                 model_filepath: str) -> Dict[str, jnp.ndarray]:
  """Runs the VGG19 tower; `image` must already be in [0, 255] RGB.

  Returns the conv outputs needed by the losses, keyed by layer name.
  """
  params = _load_vgg_weights(model_filepath)
  mean = jnp.asarray(_IMAGENET_MEAN, jnp.float32).reshape(1, 1, 1, 3)
  net = image - mean
  feats: Dict[str, jnp.ndarray] = {}
  for (kernel, bias), name in zip(params, _CONV_NAMES):
    net = _conv_relu(net, jnp.asarray(kernel), jnp.asarray(bias))
    feats[name] = net
    if name in _POOL_AFTER:
      net = _avg_pool_same(net)
  return feats


def _masked_l1(a: jnp.ndarray, b: jnp.ndarray,
               mask: Optional[jnp.ndarray]) -> jnp.ndarray:
  if mask is None:
    return jnp.mean(jnp.abs(a - b))
  resized = resize.resize_bilinear(mask, (a.shape[1], a.shape[2]))
  return jnp.mean(jnp.abs(a - b) * resized)


def vgg_loss(image: jnp.ndarray,
             reference: jnp.ndarray,
             vgg_model_file: str,
             weights: Optional[Sequence[float]] = None,
             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
  """Perceptual loss between [0,1]-range RGB images (B, H, W, 3)."""
  if not weights:
    weights = _DEFAULT_WEIGHTS
  feats_ref = vgg_features(reference * 255.0, vgg_model_file)
  feats_img = vgg_features(image * 255.0, vgg_model_file)
  total = 0.0
  for name, weight in zip(_LOSS_LAYERS, weights):
    total += _masked_l1(feats_ref[name], feats_img[name], mask) * weight
  return total / 255.0


def _gram(features: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
  b, h, w, c = features.shape
  del b
  if mask is not None:
    resized = resize.resize_bilinear(mask, (h, w))
    features = features * resized
  flat = features.reshape(-1, h * w, c)
  return jnp.einsum('bpc,bpd->bcd', flat, flat,
                    preferred_element_type=jnp.float32) / float(h * w)


def style_loss(image: jnp.ndarray,
               reference: jnp.ndarray,
               vgg_model_file: str,
               weights: Optional[Sequence[float]] = None,
               mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
  """Gram-matrix style loss between [0,1]-range RGB images."""
  if not weights:
    weights = _DEFAULT_WEIGHTS
  feats_ref = vgg_features(reference * 255.0, vgg_model_file)
  feats_img = vgg_features(image * 255.0, vgg_model_file)
  total = 0.0
  for name, weight in zip(_LOSS_LAYERS, weights):
    gram_ref = _gram(feats_ref[name] / 255.0, mask)
    gram_img = _gram(feats_img[name] / 255.0, mask)
    total += jnp.mean(jnp.square(gram_ref - gram_img)) * weight
  return total
