"""Model hyperparameter options for the film_net interpolator.

TPU-native replacement for the gin-configurable Options class
(models/film_net/options.py:20-81 in google-research/frame-interpolation).
A frozen dataclass keeps it hashable, so it can be a static argument to
jit-compiled functions.

The maximum motion in pixels the model resolves is
2^(pyramid_levels-1) * flow_convs[-1]; inputs must be divisible by
2^(pyramid_levels-1) (reference options.py:30-37). The released checkpoints
use the values in `Options.film_net_released()` (training/config/
film_net-L1.gin:17-23): 7 levels -> 192 px max motion, align 64.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Options:
  """Options for the film_net video frame interpolator.

  Attributes:
    pyramid_levels: levels for the feature pyramid and flow prediction.
    fusion_pyramid_levels: levels used by the fusion (decoder) module;
      must be <= pyramid_levels.
    specialized_levels: number of finest levels with unshared weights.
    flow_convs: 3x3 convs per residual flow predictor; specialized_levels+1
      entries, the last for all shared coarse levels.
    flow_filters: filters per residual flow predictor, same layout.
    sub_levels: depth of the cascaded feature subtrees; in [1,
      specialized_levels+1].
    filters: base feature count; doubles per sub-level.
    use_aux_outputs: include aux outputs (warped images, flow pyramids).
    dtype_policy: 'float32' for full-precision (checkpoint parity), or
      'bfloat16' for MXU-friendly mixed precision (params stay f32; conv
      compute in bf16, flow/warp coordinate math stays f32).
    warp_impl: backward-warp implementation — 'gather' (XLA 2-slice
      gather formulation, ops/warp.py), 'window' (two-level window-DMA
      Pallas kernel, ops/warp_window.py; TPU only), 'auto' (window on
      TPU for levels large enough to benefit, gather elsewhere), or
      'window_rows' (the window kernel under row-sharded SPMD forwards:
      each device warps its output-row slab against the all-gathered
      source — parallel/inference.SpatialShardedInterpolator; falls back
      to gather for small planes or outside a spmd_rows_mesh context).
      All choices are numerically equivalent (pinned in tests).
    fold_convs: W-folded (space-to-channel) execution of sub-128-channel
      conv stacks (ops/folded_conv.py) — 'auto' (fold wide layers where
      XLA's 128-lane padding would inflate HBM traffic), 'on' (fold every
      eligible layer; tests), or 'off'. Numerically equivalent up to
      accumulation order (pinned in tests).
    split_convs: split-concat execution of convs whose input is a channel
      concat (the flow predictors' (features, warped) inputs and the
      fusion decoder's (skip, upsampled) inputs): the conv runs per piece
      with sliced weights and the partial sums are added, so the concat
      is never materialized in HBM (~31 ms/frame of copies at 1080p).
      'auto'/'on' engage it, 'off' restores the literal concat form.
      Numerically equivalent up to accumulation order (pinned in tests).
    conv_stack: fused conv+pool execution of the extractor's sub-level-0
      stacks (ops/conv_stack.py: second conv + bias + leaky + 2x2 avg-pool
      as ONE Pallas kernel over a natively-produced guarded pair-flat
      layout) — 'auto' (engage on TPU under a 2-byte compute dtype at
      sizes where the kernel's window pipeline beats XLA), 'on' (every
      eligible stack), 'interpret' (Pallas interpret mode; CPU tests), or
      'off'. Numerically equivalent up to accumulation order (pinned in
      tests).
  """
  pyramid_levels: int = 5
  fusion_pyramid_levels: int = 5
  specialized_levels: int = 3
  flow_convs: Tuple[int, ...] = (4, 4, 4, 4)
  flow_filters: Tuple[int, ...] = (64, 128, 256, 256)
  sub_levels: int = 4
  filters: int = 16
  use_aux_outputs: bool = True
  dtype_policy: str = 'float32'
  warp_impl: str = 'gather'
  fold_convs: str = 'auto'
  conv_stack: str = 'auto'
  split_convs: str = 'auto'

  def __post_init__(self):
    if self.pyramid_levels < self.fusion_pyramid_levels:
      raise ValueError(
          'pyramid_levels must be greater than or equal to '
          'fusion_pyramid_levels.')
    if self.dtype_policy not in ('float32', 'bfloat16'):
      raise ValueError(f'Unknown dtype_policy: {self.dtype_policy}')
    if self.warp_impl not in ('gather', 'window', 'auto', 'window_rows'):
      raise ValueError(f'Unknown warp_impl: {self.warp_impl}')
    if self.fold_convs not in ('auto', 'on', 'off'):
      raise ValueError(f'Unknown fold_convs: {self.fold_convs}')
    if self.conv_stack not in ('auto', 'on', 'off', 'interpret'):
      raise ValueError(f'Unknown conv_stack: {self.conv_stack}')
    if self.split_convs not in ('auto', 'on', 'off'):
      raise ValueError(f'Unknown split_convs: {self.split_convs}')

  @property
  def compute_dtype(self):
    return jnp.bfloat16 if self.dtype_policy == 'bfloat16' else jnp.float32

  @property
  def align(self) -> int:
    """Inputs must have H, W divisible by this."""
    return 2**(self.pyramid_levels - 1)

  @property
  def max_motion_px(self) -> int:
    return 2**(self.pyramid_levels - 1) * self.flow_convs[-1]

  def feature_channels(self, level: int) -> int:
    """Cascaded feature channels at a pyramid level.

    Derived from the concat rule (reference feature_extractor.py:186-192):
    feat_i = concat(S_i_0, S_{i-1}_1, ...), where subtree depth at image
    level i is capped to min(pyramid_levels - i, sub_levels) and subtree
    level j has filters<<j channels.
    """
    total = 0
    for j in range(self.sub_levels):
      if j > level:
        break
      i = level - j  # subtree rooted at image level i contributes its level j
      if j < min(self.pyramid_levels - i, self.sub_levels):
        total += self.filters << j
    return total

  @classmethod
  def film_net_released(cls, **overrides) -> 'Options':
    """Hyperparameters of the released L1/VGG/Style checkpoints."""
    values = dict(
        pyramid_levels=7,
        fusion_pyramid_levels=5,
        specialized_levels=3,
        flow_convs=(3, 3, 3, 3),
        flow_filters=(32, 64, 128, 256),
        sub_levels=4,
        filters=64,
        use_aux_outputs=True,
    )
    values.update(overrides)
    return cls(**values)

  @classmethod
  def tiny(cls, **overrides) -> 'Options':
    """A small config for fast tests."""
    values = dict(
        pyramid_levels=4,
        fusion_pyramid_levels=3,
        specialized_levels=2,
        flow_convs=(1, 1, 1),
        flow_filters=(8, 8, 8),
        sub_levels=3,
        filters=4,
        use_aux_outputs=True,
    )
    values.update(overrides)
    return cls(**values)
