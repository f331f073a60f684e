"""Cascaded feature pyramid extractor (flax) for the film_net interpolator.

TPU-native re-implementation of the reference's shared-weight cascade
(models/film_net/feature_extractor.py in google-research/frame-interpolation):
one `SubTreeExtractor` (two 3x3 convs per level, filter count doubling per
level, 2x2 average pool between levels) is applied at every image-pyramid
level, and the cascaded features are channel-concats of same-resolution
subtree levels: feat_i = concat(S_i_0, S_{i-1}_1, ...) (reference
feature_extractor.py:150-193). This makes feature semantics constant across
coarse levels, enabling a single shared flow predictor.

Module/parameter names mirror the TF layer names ('sub_extractor',
'cfeat_conv_{k}') so released TF2 checkpoints map 1:1 onto this tree.

Convolutions use NHWC x HWIO (TF kernel layout), 'SAME' padding and
leaky-relu(0.2), all of which XLA maps straight onto the MXU.
"""
from __future__ import annotations

import functools
from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import conv_stack
from ..ops import conv_stack_wide
from ..ops import folded_conv
from ..ops import pyramid as pyramid_ops
from ..options import Options

_leaky_relu = functools.partial(jax.nn.leaky_relu, negative_slope=0.2)


class SubTreeExtractor(nn.Module):
  """Conventional hierarchical extractor: 2 convs per level + avg-pool.

  Reference: models/film_net/feature_extractor.py:102-147. Sub-levels
  whose channel count leaves XLA's 128-lane conv layouts padded run
  W-folded (ops/folded_conv.py) under options.fold_convs — identical
  math, half the HBM traffic on TPU.
  """
  options: Options

  def setup(self):
    k = self.options.filters
    n = self.options.sub_levels
    convs = []
    for i in range(n):
      convs.append(
          folded_conv.FoldableConv(
              features=k << i, kernel_size=(3, 3),
              dtype=self.options.compute_dtype,
              name=f'cfeat_conv_{2 * i}'))
      convs.append(
          folded_conv.FoldableConv(
              features=k << i, kernel_size=(3, 3),
              dtype=self.options.compute_dtype,
              name=f'cfeat_conv_{2 * i + 1}'))
    self.convs = convs

  def _fold(self, head: jnp.ndarray, features: int) -> bool:
    return folded_conv.should_fold(self.options.fold_convs, features,
                                   head.shape)

  def _stack(self, head: jnp.ndarray, i: int, emit_pool: bool):
    """Runs sub-level `i` as the fused pair-flat stack (ops/conv_stack.py).

    The raw conv params are pulled OUTSIDE the fused program (see
    FoldableConv raw=True), so all weight transforms hoist and no flax
    scope is touched inside lax.map bodies.
    """
    features = self.options.filters << i
    kernel0, bias0 = self.convs[2 * i](head, raw=True)
    kernel1, bias1 = self.convs[2 * i + 1](
        jnp.zeros((features,), head.dtype), raw=True)
    mode = conv_stack.resolve_mode(self.options.conv_stack,
                                   conv_stack.slab_shape(head.shape),
                                   features, dtype=head.dtype)
    if conv_stack.spmd_rows_ctx() is not None:
      return conv_stack.stack_rows(
          conv_stack._extractor_stack_impl, head, kernel0, bias0, kernel1,
          bias1, emit_pool=emit_pool, interpret=(mode == 'interpret'))
    return conv_stack.extractor_stack(
        head, kernel0, bias0, kernel1, bias1, emit_pool=emit_pool,
        interpret=(mode == 'interpret'))

  def _stack_wide(self, head: jnp.ndarray, i: int, emit_pool: bool):
    """Runs wide sub-level `i` (C in {128, 256, 512}) as the fused flat
    stack (ops/conv_stack_wide.py); same raw-params hoisting as _stack."""
    features = self.options.filters << i
    kernel0, bias0 = self.convs[2 * i](head, raw=True)
    kernel1, bias1 = self.convs[2 * i + 1](
        jnp.zeros((features,), head.dtype), raw=True)
    mode = conv_stack_wide.resolve_wide_mode(
        self.options.conv_stack, conv_stack.slab_shape(head.shape),
        features, dtype=head.dtype)
    if conv_stack.spmd_rows_ctx() is not None:
      return conv_stack.stack_rows(
          conv_stack_wide._wide_stack_impl, head, kernel0, bias0,
          kernel1, bias1, emit_pool=emit_pool,
          interpret=(mode == 'interpret'))
    return conv_stack_wide.wide_extractor_stack(
        head, kernel0, bias0, kernel1, bias1, emit_pool=emit_pool,
        interpret=(mode == 'interpret'))

  def __call__(self, image: jnp.ndarray, n: int) -> List[jnp.ndarray]:
    """Extracts `n` pyramid levels of features from `image` (finest first)."""
    head = image
    pyramid = []
    for i in range(n):
      # Under the rows-SPMD context the stacks run per-device on row
      # slabs (conv_stack.stack_rows), so the engagement gates look at
      # the slab shape, not the global one.
      gate_shape = conv_stack.slab_shape(head.shape)
      if gate_shape is not None and conv_stack.resolve_mode(
          self.options.conv_stack, gate_shape, self.options.filters << i,
          dtype=head.dtype):
        feat, pooled = self._stack(head, i, emit_pool=(i < n - 1))
        pyramid.append(feat)
        if i < n - 1:
          head = pooled
      elif gate_shape is not None and conv_stack_wide.resolve_wide_mode(
          self.options.conv_stack, gate_shape, self.options.filters << i,
          dtype=head.dtype):
        feat, pooled = self._stack_wide(head, i, emit_pool=(i < n - 1))
        pyramid.append(feat)
        if i < n - 1:
          head = pooled
      elif self._fold(head, self.options.filters << i):
        hf = folded_conv.fold(head)
        hf = _leaky_relu(self.convs[2 * i](hf, folded=True))
        hf = _leaky_relu(self.convs[2 * i + 1](hf, folded=True))
        pyramid.append(folded_conv.unfold(hf))
        if i < n - 1:
          head = (folded_conv.avg_pool_2x_folded(hf)
                  if head.shape[-3] % 2 == 0 else
                  pyramid_ops.avg_pool_2x(pyramid[-1]))
      else:
        head = _leaky_relu(self.convs[2 * i](head))
        head = _leaky_relu(self.convs[2 * i + 1](head))
        pyramid.append(head)
        if i < n - 1:
          head = pyramid_ops.avg_pool_2x(head)
    return pyramid


class FeatureExtractor(nn.Module):
  """Extracts a cascaded feature pyramid from an image pyramid.

  Reference: models/film_net/feature_extractor.py:150-193. The same
  SubTreeExtractor instance (shared weights) is applied at every image
  pyramid level, with subtree depth capped so no features extend beyond the
  coarsest cascade level.
  """
  options: Options

  def setup(self):
    self.extract_sublevels = SubTreeExtractor(self.options,
                                              name='sub_extractor')

  def __call__(self, image_pyramid: List[jnp.ndarray]) -> List[jnp.ndarray]:
    sub_pyramids = []
    for i in range(len(image_pyramid)):
      capped_sub_levels = min(
          len(image_pyramid) - i, self.options.sub_levels)
      sub_pyramids.append(
          self.extract_sublevels(image_pyramid[i], capped_sub_levels))
    feature_pyramid = []
    for i in range(len(image_pyramid)):
      features = sub_pyramids[i][0]
      for j in range(1, self.options.sub_levels):
        if j <= i:
          features = jnp.concatenate([features, sub_pyramids[i - j][j]],
                                     axis=-1)
      feature_pyramid.append(features)
    return feature_pyramid
