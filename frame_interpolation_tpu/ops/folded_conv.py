"""W-folded convolutions: space-to-channel folding for sub-128-lane convs.

On TPU, XLA assigns feature-minor T(2,128) layouts to conv operands and
pads the channel dim to 128 lanes, so a C=64 conv moves 2x its logical
bytes and a C=32 conv 4x (measured: experiments/probe_conv_inflation.py —
a 1088x1920x64 conv costs the same as 1088x1920x128, while the folded
1088x960x128 equivalent runs 1.6x faster). Folding pairs of horizontally
adjacent pixels into channels ((N, H, W, C) -> (N, H, W/2, 2C)) makes the
lane dim exact, halving real HBM traffic for C=64 sites at the cost of 2x
MXU issue (cheap: these convs are bandwidth-bound).

A 3x3 (or 2x2) conv commutes with folding through a block-structured
weight transform: folded output sub-position so at folded column p is
original column 2p+so; its original tap at offset dx lands at folded
column p + kxp - 1, sub-position si, with 2*(kxp-1) + si = so + dx.
Equivalence is exact up to accumulation order (verified in
experiments/probe_folded_conv.py and tests/test_folded_conv.py).

Reference conv sites this accelerates: feature_extractor.py:119-123,
pyramid_flow_estimator.py:49-98, fusion.py:76-101 of
google-research/frame-interpolation (all stock Keras Conv2D there).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def fold(x: jnp.ndarray) -> jnp.ndarray:
  """(N, H, W, C) -> (N, H, W/2, 2C); lane order [left px C | right px C].

  A pure reshape: NHWC row-major adjacency means the W and C dims merge
  contiguously, so no data movement beyond XLA's layout change.
  """
  n, h, w, c = x.shape
  assert w % 2 == 0, ('fold requires even width', x.shape)
  return x.reshape(n, h, w // 2, 2 * c)


def unfold(y: jnp.ndarray) -> jnp.ndarray:
  """(N, H, W/2, 2C) -> (N, H, W, C)."""
  n, h, wp, c2 = y.shape
  assert c2 % 2 == 0
  return y.reshape(n, h, wp * 2, c2 // 2)


def fold_n(x: jnp.ndarray, levels: int) -> jnp.ndarray:
  """`levels` applications of fold; level 2 = quad fold (4 px per lane
  row), which keeps 32-filter conv chains 128-lane-exact."""
  for _ in range(levels):
    x = fold(x)
  return x


def unfold_n(y: jnp.ndarray, levels: int) -> jnp.ndarray:
  for _ in range(levels):
    y = unfold(y)
  return y


def fold_weights(w: jnp.ndarray,
                 piece_sizes: Sequence[int] = ()) -> jnp.ndarray:
  """(KH, KW, Cin, Cout) conv weights -> (KH, KW', 2Cin, 2Cout) folded.

  KW' = KW for odd KW (3x3), KW/2 + 1 for even KW (2x2 'SAME', whose taps
  cover dx in {0, 1}).

  piece_sizes: if the folded input is a channel-concat of separately
  folded pieces (concat(fold(x1), fold(x2), ...) rather than
  fold(concat(x1, x2, ...))), pass the per-piece channel counts; the
  input-lane blocks are laid out per piece as [x1_L x1_R x2_L x2_R ...].
  """
  kh, kw, cin, cout = w.shape
  # Original horizontal tap offsets under lax 'SAME': odd kw -> centered
  # {-(kw//2), ..., kw//2}; even kw -> pad_lo=0 so taps {0, ..., kw-1}.
  taps = (list(range(-(kw // 2), kw // 2 + 1)) if kw % 2
          else list(range(kw)))
  # t = so + dx spans [min(taps), 1 + max(taps)]; folded column offset
  # o = floor(t / 2), sub-position si = t mod 2 (floor semantics).
  o_min = min(taps) // 2 if min(taps) >= 0 else -((-min(taps) + 1) // 2)
  o_max = (1 + max(taps)) // 2
  kwp = o_max - o_min + 1
  pieces = tuple(piece_sizes) if piece_sizes else (cin,)
  assert sum(pieces) == cin, (pieces, cin)
  # Assemble by pure concat/stack (no scatter): scatter chains defeat
  # XLA's loop-invariant hoisting inside lax.map/scan bodies, turning a
  # parameter-only transform into per-iteration work.
  blocks = {}
  in_off = 0
  for p_idx, piece in enumerate(pieces):
    for so in range(2):
      for ti, dx in enumerate(taps):
        t = so + dx
        blocks[(t // 2 - o_min, p_idx, t % 2, so)] = (
            w[:, ti, in_off:in_off + piece, :])
    in_off += piece
  mats = []
  for k in range(kwp):
    rows = []
    in_off = 0
    for p_idx, piece in enumerate(pieces):
      for si in range(2):
        cols = [
            blocks.get((k, p_idx, si, so),
                       jnp.zeros((kh, piece, cout), w.dtype))
            for so in range(2)
        ]
        rows.append(jnp.concatenate(cols, axis=-1))
      in_off += piece
    mats.append(jnp.concatenate(rows, axis=1))
  return jnp.stack(mats, axis=1)


def fold_bias(b: jnp.ndarray) -> jnp.ndarray:
  return jnp.concatenate([b, b])


def avg_pool_2x_folded(hf: jnp.ndarray) -> jnp.ndarray:
  """2x2/2 average pool of a folded tensor -> UNfolded half-res result.

  The fold pairs are exactly the horizontal pool pairs, so pooling a
  folded (N, H, W/2, 2C) tensor is a row-pair + lane-half mean producing
  (N, H/2, W/2, C) — naturally unfolded. Matches ops/pyramid.avg_pool_2x
  up to accumulation order.
  """
  n, h, wp, c2 = hf.shape
  assert h % 2 == 0 and c2 % 2 == 0
  c = c2 // 2
  v = hf.reshape(n, h // 2, 2, wp, 2, c)
  return (v.sum(axis=(2, 4)) * jnp.asarray(0.25, hf.dtype)).astype(hf.dtype)


class FoldableConv(nn.Module):
  """Drop-in nn.Conv replacement that can run W-folded.

  Parameters (name, shape, init, dtype handling) are identical to
  flax.linen.Conv with the same arguments, so init_params trees and
  checkpoint imports are unchanged. __call__(x, folded=k) expects a
  k-times-folded input (N, H, W/2^k, 2^k*Cin) and produces a k-folded
  output (folded=True == 1; k=2 is the quad layout that keeps 32-filter
  chains 128-lane-exact).

  SPLIT-CONCAT mode: pass `x` as a LIST of arrays to compute the conv of
  their channel concatenation WITHOUT materializing the concat —
  conv(concat(x1, .., xk), W) == sum_i conv(x_i, W[:, :, off_i:off_i+c_i])
  with the bias added once. The round-5 device trace shows the concats
  feeding the flow-predictor and fusion skip convs costing ~31 ms/frame
  of pure HBM writes+reads at 1080p; the split form reads each piece in
  place. Identical math up to float accumulation order (the per-piece
  partial sums are added in the compute dtype). In split+folded mode,
  every piece must be individually folded and `piece_sizes` is a per-
  piece sequence of sub-piece tuples (as produced by fold_pieces).
  """
  features: int
  kernel_size: Tuple[int, int]
  dtype: jnp.dtype = jnp.float32

  @nn.compact
  def __call__(self, x, folded=False, piece_sizes: Sequence = (),
               raw: bool = False):
    kh, kw = self.kernel_size
    levels = int(folded)  # 0 = unfolded, 1 = W-folded, 2 = quad-folded
    div = 1 << levels
    split = isinstance(x, (list, tuple))
    if split:
      sizes = [p.shape[-1] // div for p in x]
      cin = sum(sizes)
    else:
      cin = x.shape[-1] // div
    kernel = self.param('kernel', nn.initializers.lecun_normal(),
                        (kh, kw, cin, self.features), jnp.float32)
    bias = self.param('bias', nn.initializers.zeros, (self.features,),
                      jnp.float32)
    if raw:
      # Raw-parameter access for externally-fused execution (e.g. the
      # pair-flat stack kernel, ops/conv_stack.py): `x` only supplies the
      # trailing input-channel extent. Creating/reading the params HERE —
      # outside any lax.map/scan the fused path may run under — keeps
      # flax's scope out of traced loop bodies.
      return kernel, bias

    def conv(xi, ki):
      return jax.lax.conv_general_dilated(
          xi, ki, (1, 1), 'SAME',
          dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def fold_k(k, sub):
      # Level i re-folds the (i-1)-folded weights; piece channel counts
      # double per level (fold(fold(x)) == the quad pixel layout
      # [LL LR RL RR], so the composition is exact by induction).
      for i in range(levels):
        k = fold_weights(k, tuple(s << i for s in sub))
      return k

    if split:
      promoted = nn.dtypes.promote_dtype(*x, kernel, bias, dtype=self.dtype)
      xs, kernel, bias = promoted[:-2], promoted[-2], promoted[-1]
      subs = list(piece_sizes) if piece_sizes else [()] * len(xs)
      assert len(subs) == len(xs), (len(subs), len(xs))
      y = None
      off = 0
      for xi, size, sub in zip(xs, sizes, subs):
        ki = jax.lax.slice_in_dim(kernel, off, off + size, axis=2)
        ki = fold_k(ki, tuple(sub) or (size,))
        yi = conv(xi, ki)
        y = yi if y is None else y + yi
        off += size
      for _ in range(levels):
        bias = fold_bias(bias)
      return y + bias.reshape((1,) * (y.ndim - 1) + (-1,))

    x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                              dtype=self.dtype)
    kernel = fold_k(kernel, tuple(piece_sizes) or (cin,))
    for _ in range(levels):
      bias = fold_bias(bias)
    y = conv(x, kernel)
    return y + bias.reshape((1,) * (y.ndim - 1) + (-1,))


def should_split(mode: str) -> bool:
  """The split-concat-conv gate shared by every splitting call site.

  `mode` is options.split_convs ('off'/'on'/'auto'). The split form is
  plain XLA and exact up to accumulation order, so 'auto' simply engages
  it everywhere; the knob exists for A/B measurement and fallback.
  """
  return mode != 'off'


def should_fold(mode: str, features: int, shape,
                even_height: bool = False, min_width: int = 256) -> bool:
  """The single fold gate shared by every folding call site.

  `mode` is options.fold_convs ('off'/'on'/'auto'); `features` the conv
  stack's output channels (folded lanes are 2x that and must fit one
  128-lane register); `shape` the candidate tensor's (static) shape.
  Folding needs an even W. `even_height=True` additionally requires an
  even H — the fusion decoder's folded finest level assumes its coarser
  neighbor is EXACTLY 2x smaller in both axes, which ceil-halving pyramid
  construction only guarantees for even extents (odd-H inputs previously
  tripped fusion's 2x assert under mode 'auto'). In 'auto', folding only
  engages at W >= min_width, where the lane-padding win beats the fold
  relayout.
  """
  h, w = shape[-3], shape[-2]
  if mode == 'off' or 2 * features > 128 or w % 2:
    return False
  if even_height and h % 2:
    return False
  return mode == 'on' or w >= min_width


class Folded(NamedTuple):
  """A W-folded tensor plus the channel sizes of its concat pieces.

  `x` is concat(fold(p_1), ..., fold(p_k)) — NOT fold(concat(...)); the
  per-piece lane layout is what fold_weights(piece_sizes=...) consumes.
  """
  x: jnp.ndarray
  pieces: Tuple[int, ...]


def fold_pieces(arrays: Sequence[jnp.ndarray]) -> 'Folded':
  return Folded(
      jnp.concatenate([fold(a) for a in arrays], axis=-1),
      tuple(a.shape[-1] for a in arrays))


def resize_nearest_2x_folded(x: jnp.ndarray) -> jnp.ndarray:
  """Nearest-neighbor 2x upsample of an UNfolded input, folded output.

  Both folded lane halves of an output column are the same source pixel,
  so the result is a row-repeat plus a lane duplicate — equal to
  fold(resize_nearest(x, 2x)) with no unfolded materialization.
  """
  xr = jnp.repeat(x, 2, axis=x.ndim - 3)
  return jnp.concatenate([xr, xr], axis=-1)
