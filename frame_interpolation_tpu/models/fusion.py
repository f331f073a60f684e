"""U-Net style fusion decoder (flax) for film_net.

TPU-native re-implementation of the reference Fusion module
(models/film_net/fusion.py in google-research/frame-interpolation): starting
from the coarsest aligned-feature level, each finer level does
nearest-neighbor x2 upsampling -> 2x2 conv ('resize convolution', the
anti-checkerboard trick) -> concat with the skip connection -> two 3x3
convs with leaky-relu; a final 1x1 conv produces RGB (reference
fusion.py:56-140). No convs at the coarsest level.

Filter counts double per finer level up to `specialized_levels`, mirroring
the feature extractor (reference fusion.py:74-80).
"""
from __future__ import annotations

import functools
from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import folded_conv
from ..ops import resize
from ..options import Options

_leaky_relu = functools.partial(jax.nn.leaky_relu, negative_slope=0.2)

_NUMBER_OF_COLOR_CHANNELS = 3


class Fusion(nn.Module):
  """The decoder. Input: aligned feature pyramid, finest first.

  A pyramid entry may be a folded_conv.Folded (the finest level, built by
  film_net when options.fold_convs applies): that level's resize-conv,
  skip-concat, 3x3 convs, and the output conv then all run W-folded —
  identical math, lane-exact layouts on TPU.
  """
  options: Options

  def setup(self):
    levels = self.options.fusion_pyramid_levels
    m = self.options.specialized_levels
    k = self.options.filters
    convs = []
    # Fine-to-coarse order so index i corresponds to pyramid level i,
    # matching the reference's layout (fusion.py:76-101). Names encode
    # (level, slot) for the checkpoint importer.
    for i in range(levels - 1):
      num_filters = (k << i) if i < m else (k << m)
      convs.append([
          folded_conv.FoldableConv(
              num_filters, kernel_size=(2, 2),
              dtype=self.options.compute_dtype, name=f'conv_{i}_0'),
          folded_conv.FoldableConv(
              num_filters, kernel_size=(3, 3),
              dtype=self.options.compute_dtype, name=f'conv_{i}_1'),
          folded_conv.FoldableConv(
              num_filters, kernel_size=(3, 3),
              dtype=self.options.compute_dtype, name=f'conv_{i}_2'),
      ])
    self.convs = convs
    self.output_conv = folded_conv.FoldableConv(
        _NUMBER_OF_COLOR_CHANNELS, kernel_size=(1, 1),
        dtype=jnp.float32, name='output_conv')

  def __call__(self, pyramid: List[jnp.ndarray]) -> jnp.ndarray:
    if len(pyramid) != self.options.fusion_pyramid_levels:
      raise ValueError(
          'Fusion called with different number of pyramid levels '
          f'{len(pyramid)} than it was configured for, '
          f'{self.options.fusion_pyramid_levels}.')
    # The coarsest level passes through without convs (reference
    # fusion.py:121-127) — features are already spatially aligned by warp.
    net = pyramid[-1]
    net_folded = False
    split = folded_conv.should_split(self.options.split_convs)
    for i in reversed(range(0, len(pyramid) - 1)):
      entry = pyramid[i]
      if isinstance(entry, folded_conv.Folded):
        # Folded entries are only built for the finest level, whose
        # coarser neighbor is exactly 2x smaller (align guarantees it).
        assert not net_folded and entry.x.shape[-3] == 2 * net.shape[-3]
        netf = folded_conv.resize_nearest_2x_folded(net)
        netf = self.convs[i][0](netf, folded=True)  # 2x2 conv, no act.
        if split:
          # conv(concat(skip, net)) as sliced-weight convs summed: the
          # ~850 MB skip concat at 1080p is never materialized.
          net = _leaky_relu(self.convs[i][1](
              [entry.x, netf], folded=True,
              piece_sizes=[entry.pieces, (self.convs[i][0].features,)]))
        else:
          xf = jnp.concatenate([entry.x, netf], axis=-1)
          pieces = entry.pieces + (self.convs[i][0].features,)
          net = _leaky_relu(self.convs[i][1](xf, folded=True,
                                             piece_sizes=pieces))
        net = _leaky_relu(self.convs[i][2](net, folded=True))
        net_folded = True
      else:
        h, w = entry.shape[-3], entry.shape[-2]
        net = resize.resize_nearest(net, (h, w))
        net = self.convs[i][0](net)  # 2x2 conv, no activation
        if split:
          net = _leaky_relu(self.convs[i][1]([entry, net]))
        else:
          net = jnp.concatenate([entry, net], axis=-1)
          net = _leaky_relu(self.convs[i][1](net))
        net = _leaky_relu(self.convs[i][2](net))
    net = self.output_conv(net.astype(jnp.float32), folded=net_folded)
    if net_folded:
      net = folded_conv.unfold(net)
    return net
