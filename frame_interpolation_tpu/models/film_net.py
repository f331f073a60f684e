"""The film_net frame interpolator: full model assembly (flax).

TPU-native re-implementation of the reference model graph
(models/film_net/interpolator.py:89-207 in
google-research/frame-interpolation):

  image pyramids -> siamese cascaded feature pyramids (shared weights)
  -> bidirectional coarse-to-fine residual flows (one shared estimator,
     called once per direction)
  -> residual->absolute flow synthesis, truncated to fusion levels
  -> flows scaled by t (backward) and 1-t (forward); t fixed to 0.5
     (reference interpolator.py:163-165 — film_net ignores the time input
     and relies on recursive invocation for other timestamps)
  -> backward-warp of concat(image, features) pyramids
  -> aligned-pyramid concat -> fusion decoder -> RGB + aux outputs.

The whole forward pass is one jit-compatible function of (params, x0, x1,
time): static shapes, static pyramid depths, no Python control flow on
traced values — XLA sees a single fusable graph and keeps the convs on the
MXU back-to-back.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import folded_conv
from ..ops import pyramid as pyramid_ops
from ..options import Options
from .feature_extractor import FeatureExtractor
from .flow_estimator import PyramidFlowEstimator
from .fusion import Fusion


class FilmNet(nn.Module):
  """Frame interpolator model. Call with (x0, x1, time) NHWC batches."""
  options: Options

  def setup(self):
    self.feat_net = FeatureExtractor(self.options, name='feat_net')
    self.predict_flow = PyramidFlowEstimator(self.options, name='predict_flow')
    self.fusion = Fusion(self.options, name='fusion')

  def extract_features(self, x):
    """Image + feature pyramids for ONE frame (reusable across pairs).

    The midpoint-recursion tree evaluates each frame in up to three pairs;
    splitting the forward here lets callers compute `feat_net` once per
    frame (~26% of model FLOPs) and reuse it — a semantics-preserving split
    at the same point as reference interpolator.py:119-150.
    """
    decoded = x.astype(self.options.compute_dtype)
    image_pyramid = pyramid_ops.build_image_pyramid(
        decoded, self.options.pyramid_levels)
    return image_pyramid, self.feat_net(image_pyramid)

  def __call__(self, x0: jnp.ndarray, x1: jnp.ndarray,
               time: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    features0 = self.extract_features(x0)
    features1 = self.extract_features(x1)
    return self.interpolate_from_features(features0, features1, time)

  def interpolate_from_features(self, features0, features1,
                                time: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Interpolates from precomputed (image_pyramid, feature_pyramid) pairs."""
    config = self.options
    compute_dtype = config.compute_dtype

    image_pyramids = [features0[0], features1[0]]
    feature_pyramids = [features0[1], features1[1]]

    forward_residual_flow_pyramid = self.predict_flow(feature_pyramids[0],
                                                      feature_pyramids[1])
    backward_residual_flow_pyramid = self.predict_flow(feature_pyramids[1],
                                                       feature_pyramids[0])

    fusion_pyramid_levels = config.fusion_pyramid_levels
    forward_flow_pyramid = pyramid_ops.flow_pyramid_synthesis(
        forward_residual_flow_pyramid)[:fusion_pyramid_levels]
    backward_flow_pyramid = pyramid_ops.flow_pyramid_synthesis(
        backward_residual_flow_pyramid)[:fusion_pyramid_levels]

    # film_net fixes t=0.5 regardless of the `time` input (reference
    # interpolator.py:157-165); other timestamps come from recursion.
    mid_time = jnp.ones_like(time) * 0.5
    backward_flow = pyramid_ops.multiply_pyramid(backward_flow_pyramid,
                                                 mid_time[:, 0])
    forward_flow = pyramid_ops.multiply_pyramid(forward_flow_pyramid,
                                                1.0 - mid_time[:, 0])

    pyramids_to_warp = [
        pyramid_ops.concatenate_pyramids(
            image_pyramids[0][:fusion_pyramid_levels],
            feature_pyramids[0][:fusion_pyramid_levels]),
        pyramid_ops.concatenate_pyramids(
            image_pyramids[1][:fusion_pyramid_levels],
            feature_pyramids[1][:fusion_pyramid_levels]),
    ]

    # Backward warping: backward flow reads from image 0, forward from 1.
    # (Stacking both directions as batch-2 through one kernel call was
    # measured SLOWER in round 2 — the stack/split concats do not fuse
    # into the planar relayout; PERF.md "Paired-direction fusion warps".)
    forward_warped_pyramid = pyramid_ops.pyramid_warp(
        pyramids_to_warp[0], backward_flow, impl=config.warp_impl)
    backward_warped_pyramid = pyramid_ops.pyramid_warp(
        pyramids_to_warp[1], forward_flow, impl=config.warp_impl)

    aligned_pyramid = pyramid_ops.concatenate_pyramids(
        forward_warped_pyramid, backward_warped_pyramid)
    aligned_pyramid = pyramid_ops.concatenate_pyramids(
        aligned_pyramid, [f.astype(compute_dtype) for f in backward_flow])
    aligned_pyramid = pyramid_ops.concatenate_pyramids(
        aligned_pyramid, [f.astype(compute_dtype) for f in forward_flow])

    # W-fold the finest aligned level (ops/folded_conv.py): the skip
    # concat is built from separately folded pieces so each fold fuses
    # into its producer, and the fusion decoder's finest conv stack runs
    # lane-exact. Identical math (tests/test_folded_conv.py).
    if folded_conv.should_fold(config.fold_convs, config.filters,
                               forward_warped_pyramid[0].shape,
                               even_height=True):
      aligned_pyramid[0] = folded_conv.fold_pieces([
          forward_warped_pyramid[0],
          backward_warped_pyramid[0],
          backward_flow[0].astype(compute_dtype),
          forward_flow[0].astype(compute_dtype),
      ])

    prediction = self.fusion(aligned_pyramid)
    output_color = prediction[..., :3].astype(jnp.float32)
    outputs = {'image': output_color}

    if config.use_aux_outputs:
      outputs.update({
          'x0_warped':
              forward_warped_pyramid[0][..., 0:3].astype(jnp.float32),
          'x1_warped':
              backward_warped_pyramid[0][..., 0:3].astype(jnp.float32),
          'forward_residual_flow_pyramid': forward_residual_flow_pyramid,
          'backward_residual_flow_pyramid': backward_residual_flow_pyramid,
          'forward_flow_pyramid': forward_flow_pyramid,
          'backward_flow_pyramid': backward_flow_pyramid,
      })
    return outputs


def create_model(options: Options) -> FilmNet:
  """Factory mirroring training/model_lib.py:32-53 of the reference."""
  return FilmNet(options)


def init_params(model: FilmNet, rng, height: int = 64, width: int = 64):
  """Initializes a parameter pytree with tiny dummy shapes.

  Conv parameters do not depend on H/W, so initializing at a small size is
  fast and produces the exact same pytree as any other resolution.
  """
  align = model.options.align
  h = max(height, align)
  w = max(width, align)
  x = jnp.zeros((1, h, w, 3), jnp.float32)
  t = jnp.full((1, 1), 0.5, jnp.float32)
  # jit keeps init to one device program (important on remote-tunneled
  # devices where eager per-op dispatch is slow).
  variables = jax.jit(model.init)(rng, x, x, t)
  return variables['params']
