#!/usr/bin/env python
"""W-folded conv equivalence: conv3x3 on (H,W,C) == conv3x3 on (H,W/2,2C).

If XLA stores feature-minor conv operands padded to 128 lanes, C<128
tensors move 128/C x their logical bytes. Folding pairs of adjacent
columns into channels makes C'=2C lane-exact, halving real traffic —
with a block-structured weight transform, entirely in XLA:

  out_folded[h, p, (s, co)] = conv(x_folded, W')[...]
  W'[ky, kx', (si, ci), (so, co)] = W[ky, kx, ci, co]
    where the original horizontal tap offset dx = 2*kx' - 2 + si - so + 1
    must satisfy |dx| <= 1 (kx in 0..2), else the block is zero.

Verified here against lax.conv on random data (CPU), including odd
positions and SAME-padding edges.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np


def fold_image(x):
  """(N, H, W, C) -> (N, H, W/2, 2C); lane order [left px C | right px C]."""
  n, h, w, c = x.shape
  assert w % 2 == 0
  return x.reshape(n, h, w // 2, 2 * c)


def unfold_image(y):
  n, h, wp, c2 = y.shape
  return y.reshape(n, h, wp * 2, c2 // 2)


def fold_weights(w):
  """(3, 3, Cin, Cout) -> (3, 3, 2Cin, 2Cout) folded-conv weights.

  Folded output position so (0=left px, 1=right px) at folded column p
  is original column 2p+so; its tap at original offset dx in {-1,0,1}
  lands at original column 2p+so+dx = folded column p + kx'-1 with
  sub-position si, where 2*(kx'-1) + si = so + dx.
  """
  kh, kw, cin, cout = w.shape
  assert (kh, kw) == (3, 3)
  wf = np.zeros((3, 3, 2 * cin, 2 * cout), np.asarray(w).dtype)
  for so in range(2):
    for dx in (-1, 0, 1):
      t = so + dx            # in [-1, 2]
      kxp = (t + 2) // 2     # folded tap index 0..2 given t+2 in [1, 4]
      si = (t + 2) % 2
      wf[:, kxp, si * cin:(si + 1) * cin, so * cout:(so + 1) * cout] = (
          np.asarray(w)[:, dx + 1])
  return jnp.asarray(wf)


def conv(x, w):
  return jax.lax.conv_general_dilated(
      x, w, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
      preferred_element_type=jnp.float32)


def main():
  rng = np.random.RandomState(0)
  for (h, w, cin, cout) in [(8, 12, 3, 64), (6, 10, 64, 64),
                            (5, 8, 32, 16), (4, 6, 2, 5)]:
    x = jnp.asarray(rng.rand(2, h, w, cin).astype(np.float32))
    wt = jnp.asarray((rng.rand(3, 3, cin, cout) - 0.5).astype(np.float32))
    want = conv(x, wt)
    got = unfold_image(conv(fold_image(x), fold_weights(wt)))
    err = float(jnp.abs(got - want).max())
    print(f'h={h} w={w} {cin}->{cout}: max err {err:.2e}')
    assert err < 1e-4, err
  print('folded conv equivalence OK')


if __name__ == '__main__':
  main()
