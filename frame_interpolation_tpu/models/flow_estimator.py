"""Coarse-to-fine residual flow estimation (flax) for film_net.

TPU-native re-implementation of the reference's PyramidFlowEstimator
(models/film_net/pyramid_flow_estimator.py in
google-research/frame-interpolation): the coarsest level predicts a 'DC'
flow; each finer level upsamples the accumulated flow (x2 magnitude and
resolution, bilinear), backward-warps pyramid B's features, and predicts a
residual from (A, warped B). The `specialized_levels` finest levels have
their own weights; all coarser levels share one predictor (reference
pyramid_flow_estimator.py:101-163).

Flow values and the warp coordinate math stay in float32 even under a
bfloat16 compute policy — sub-pixel flow precision is a PSNR landmine.
"""
from __future__ import annotations

import functools
import os
from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import folded_conv
from ..ops import resize
from ..ops import warp as warp_ops
from ..options import Options

_leaky_relu = functools.partial(jax.nn.leaky_relu, negative_slope=0.2)


class FlowEstimator(nn.Module):
  """Small-receptive-field residual flow predictor.

  N 3x3 convs + a 1x1 conv (filters/2) + a 1x1 2-channel conv with no
  activation (reference pyramid_flow_estimator.py:49-98). The low-filter
  wide levels run W-folded (ops/folded_conv.py): XLA pads the 32/64
  channel operands to 128 lanes, so folding halves their real HBM
  traffic; the inputs are folded per piece so the producers' reshapes
  cancel against the extractor's folded outputs.
  """
  num_convs: int
  num_filters: int
  options: Options

  def setup(self):
    convs = []
    for i in range(self.num_convs):
      convs.append(
          folded_conv.FoldableConv(
              self.num_filters, kernel_size=(3, 3),
              dtype=self.options.compute_dtype, name=f'conv_{i}'))
    convs.append(
        folded_conv.FoldableConv(
            self.num_filters // 2, kernel_size=(1, 1),
            dtype=self.options.compute_dtype,
            name=f'conv_{self.num_convs}'))
    convs.append(
        folded_conv.FoldableConv(
            2, kernel_size=(1, 1), dtype=jnp.float32,
            name=f'conv_{self.num_convs + 1}'))
    self.convs = convs

  def _fold_levels(self, x: jnp.ndarray) -> int:
    """0 = unfolded, 1 = W-folded, 2 = quad-folded (4 px per lane row).

    Quad engages for the 32-filter predictor (released flow_filters[0]),
    whose once-folded 64-lane convs XLA still pads to 128 lanes — quad
    makes the whole chain lane-exact, halving its real HBM traffic again.
    """
    mode = self.options.fold_convs
    if (x.shape[-2] % 4 == 0 and
        os.environ.get('FI_QUAD_FOLD', '1') != '0' and
        folded_conv.should_fold(mode, 2 * self.num_filters, x.shape)):
      return 2
    if folded_conv.should_fold(mode, self.num_filters, x.shape):
      return 1
    return 0

  def __call__(self, features_a: jnp.ndarray,
               features_b: jnp.ndarray) -> jnp.ndarray:
    split = folded_conv.should_split(self.options.split_convs)
    lvl = self._fold_levels(features_a)
    if lvl:
      fa = folded_conv.fold_n(features_a, lvl)
      fb = folded_conv.fold_n(features_b, lvl)
      if split:
        # conv(concat) == sum of per-piece convs: the (features, warped)
        # concat — ~16.5 ms/frame of HBM copies at 1080p — is never built.
        net = _leaky_relu(self.convs[0](
            [fa, fb], folded=lvl,
            piece_sizes=[(features_a.shape[-1],), (features_b.shape[-1],)]))
      else:
        pieces = (features_a.shape[-1], features_b.shape[-1])
        net = _leaky_relu(self.convs[0](jnp.concatenate([fa, fb], axis=-1),
                                        folded=lvl, piece_sizes=pieces))
      for conv in self.convs[1:-1]:
        net = _leaky_relu(conv(net, folded=lvl))
      net = self.convs[-1](net.astype(jnp.float32), folded=lvl)
      return folded_conv.unfold_n(net, lvl)
    if split:
      net = _leaky_relu(self.convs[0]([features_a, features_b]))
    else:
      net = _leaky_relu(self.convs[0](
          jnp.concatenate([features_a, features_b], axis=-1)))
    for conv in self.convs[1:-1]:
      net = _leaky_relu(conv(net))
    # Final conv: no activation, f32 output (flow values).
    net = self.convs[-1](net.astype(jnp.float32))
    return net


class PyramidFlowEstimator(nn.Module):
  """Predicts optical flow by coarse-to-fine refinement.

  Reference: models/film_net/pyramid_flow_estimator.py:101-163.
  """
  options: Options

  def setup(self):
    predictors = []
    for i in range(self.options.specialized_levels):
      predictors.append(
          FlowEstimator(
              num_convs=self.options.flow_convs[i],
              num_filters=self.options.flow_filters[i],
              options=self.options,
              name=f'flow_predictor_{i}'))
    shared = FlowEstimator(
        num_convs=self.options.flow_convs[-1],
        num_filters=self.options.flow_filters[-1],
        options=self.options,
        name='flow_predictor_shared')
    # The same module instance is reused for every coarse level, sharing
    # weights exactly as the reference does.
    self._shared = shared
    self._specialized = predictors

  def _predictor(self, level: int) -> FlowEstimator:
    if level < self.options.specialized_levels:
      return self._specialized[level]
    return self._shared

  def __call__(self, feature_pyramid_a: List[jnp.ndarray],
               feature_pyramid_b: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Returns the residual flow pyramid, finest level first.

    The coarsest entry is the DC term (a residual against zero).
    """
    levels = len(feature_pyramid_a)
    v = self._predictor(levels - 1)(feature_pyramid_a[-1],
                                    feature_pyramid_b[-1])
    residuals = [v]
    for i in reversed(range(0, levels - 1)):
      h, w = (feature_pyramid_a[i].shape[-3], feature_pyramid_a[i].shape[-2])
      # Upsample flow to the current level; x2 magnitude for the new scale.
      v = resize.resize_bilinear(2.0 * v, (h, w))
      warped = warp_ops.backward_warp_impl(
          feature_pyramid_b[i], v,
          self.options.warp_impl).astype(feature_pyramid_b[i].dtype)
      v_residual = self._predictor(i)(feature_pyramid_a[i], warped)
      residuals.append(v_residual)
      v = v_residual + v
    return list(reversed(residuals))
