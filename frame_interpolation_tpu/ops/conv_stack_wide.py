"""Fused flat-layout conv3x3+bias+leaky(+pool) kernel for C in {128, 256, 512}.

Extends the pair-flat sub-level-0 stack kernel (ops/conv_stack.py) to the
extractor's WIDE sub-levels — the second convs of sub-levels 1..3
(cfeat_conv_3/5/7: 128->128, 256->256, 512->512; reference
models/film_net/feature_extractor.py:119-147) — which the round-5 device
trace shows running at ~4.4-4.7 ms each under XLA (~35 TFLOPS, 3-4x over
this chip's traffic floor) plus a layout copy feeding every one.

At C >= 128 one pixel's channels already fill whole 128-lane tiles, so the
resident format is simpler than pair-flat: a FLAT layout with ONE PIXEL PER
BUFFER ROW of C lanes. Conv taps become pure row offsets — tap (ky, dx) of
flat row r is row r + (ky-1)*gw + dx — so every matmul lhs is a contiguous
row slice (the MXU-native shape, no im2col, no relayout) and the 9 matmuls
per row block are fully DENSE (C, C) contractions: zero padding waste,
unlike the pair kernel's half-empty side matmuls.

Geometry mirrors conv_stack.Geometry: guard columns (valid image cols at
[2, 2+w) of a gw-wide row) make horizontal taps fall on zeros across row
seams, guard rows above/below do the same vertically, and the kernel
re-zeroes guards in its epilogue so outputs CHAIN in-layout. The 2x2
avg-pool is fused as a row-pair sum emitted at half height ('half' mode;
the column-pair finish is a strided add XLA fuses into the consumer).

The producing first conv of each sub-level (cfeat_conv_2/4/6, Cin != Cout)
runs as a plain XLA conv over the guarded TALL frame (pad_image_tall_flat)
with the guard mask fused into its epilogue — the same native-production
scheme as conv_stack.py, so no seam pads exist.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import conv_stack


def _round_up(x: int, m: int) -> int:
  return -(-x // m) * m


class FlatGeometry(NamedTuple):
  """Static flat-buffer geometry for an (h, w, c) plane at block size tm.

  Flat row body_start + y*gw + (2 + x) holds pixel (y, x); columns 0..1 and
  2+w..gw-1 of each image row are guards (zero), as is everything outside
  the body. Blocks start at even image rows (tm even, body_start =
  (tm+2)*gw), so each tm-row block holds complete y-pairs and pools
  independently.
  """
  h: int
  w: int
  c: int
  tm: int
  gw: int
  r_total: int
  n_blocks: int
  body_start: int

  @property
  def tall_rows(self) -> int:
    """Image rows of the tall (guarded) frame: r_total / gw."""
    return self.r_total // self.gw


def default_tm_wide(c: int) -> int:
  """Grid block height (image rows per block) by channel count.

  Measured on-chip (experiments/probe_wide_variants.py): tm=16 wins at
  C=128 (window overlap falls from 1.27x to 1.14x of the plane); at
  C=512 the larger double-buffered window crowds VMEM and loses. Override
  with FI_STACK_WIDE_TM.
  """
  env = os.environ.get('FI_STACK_WIDE_TM')
  if env:
    return int(env)
  return 16 if c == 128 else 8


def flat_geometry(h: int, w: int, c: int, tm: int = 8) -> FlatGeometry:
  assert tm % 2 == 0, tm
  assert h % 2 == 0 and w % 2 == 0, (h, w)
  assert c % 128 == 0, c
  gw = _round_up(w + 4, 16)
  body_start = (tm + 2) * gw
  m = tm * gw
  n_blocks = -(-(body_start + (h + 1) * gw + 16) // m) + 1
  return FlatGeometry(h, w, c, tm, gw, n_blocks * m, n_blocks, body_start)


def pad_image_tall_flat(image: jnp.ndarray, g: FlatGeometry) -> jnp.ndarray:
  """(h, w, cin) image -> (tall_rows, gw, cin) guarded tall frame.

  Pixel (y, x) lands at tall row (tm+2) + y, column 2 + x; everything else
  is zero — exactly the guard content the kernel's tap math assumes.
  """
  h, w, _ = image.shape
  assert (h, w) == (g.h, g.w), (image.shape, g)
  top = g.tm + 2
  return jnp.pad(image, ((top, g.tall_rows - top - h),
                         (2, g.gw - 2 - w), (0, 0)))


def mask_tall_flat(y: jnp.ndarray, g: FlatGeometry) -> jnp.ndarray:
  """Zeroes guard/halo positions of a tall-frame conv output.

  `y` is (tall_rows, gw, c). Elementwise iota masks, so XLA fuses it into
  the producing conv's epilogue — the halo zeros are free, not a seam pad.
  """
  rows = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
  cols = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
  top = g.tm + 2
  ok = ((rows >= top) & (rows < top + g.h) &
        (cols >= 2) & (cols < 2 + g.w))
  return jnp.where(ok, y, jnp.zeros_like(y))


def _flat_stack_kernel(xflat, w_ref, b_ref, out_ref, pool_ref, buf, sem,
                       *, gw: int, tm: int, n_blocks: int, win_h: int,
                       r_in: int, body_start: int, body_rows: int, w_img: int,
                       negative_slope: float, chunk: int, emit_pool: bool):
  j = pl.program_id(0)
  slot = jax.lax.rem(j, 2)
  m = tm * gw

  def start_row(jj):
    raw = jj * m - gw - 16
    return jnp.clip(raw, 0, r_in - win_h)

  def window_dma(jj, slot_index):
    return pltpu.make_async_copy(
        xflat.at[pl.ds(pl.multiple_of(start_row(jj), 16), win_h)],
        buf.at[slot_index], sem.at[slot_index])

  @pl.when(j == 0)
  def _():
    window_dma(0, 0).start()

  @pl.when(j + 1 < n_blocks)
  def _():
    window_dma(j + 1, 1 - slot).start()

  window_dma(j, slot).wait()

  block_start = j * m
  n_sub = -(-m // chunk)
  for s in range(n_sub):
    row0 = s * chunk
    cm = min(chunk, m - row0)
    c = out_ref.shape[-1]
    acc = jnp.zeros((cm, c), jnp.float32)
    for ky in range(3):
      base = 16 + ky * gw + row0
      for kx, off in ((0, -1), (1, 0), (2, 1)):
        x_tap = buf[slot, pl.ds(base + off, cm), :]
        acc += jnp.dot(x_tap, w_ref[ky, kx],
                       preferred_element_type=jnp.float32)
    value = acc + b_ref[:]
    value = jnp.where(value >= 0, value, value * negative_slope)
    r = (block_start + row0 +
         jax.lax.broadcasted_iota(jnp.int32, (cm, c), 0))
    q = r - body_start
    col = jax.lax.rem(q, gw)
    ok = ((q >= 0) & (q < body_rows) & (col >= 2) & (col < 2 + w_img))
    masked = jnp.where(ok, value, 0.0)
    out_ref[pl.ds(row0, cm), :] = masked.astype(out_ref.dtype)
    if emit_pool:
      # chunk == 2*gw and blocks start on even image rows, so each chunk
      # holds one complete y-pair: the row-pair sum lands at half height.
      # The column-pair finish (a strided add over even/odd columns) runs
      # outside the kernel — see pooled_from_half.
      ysum = (masked[:gw] + masked[gw:]) * 0.25
      pool_ref[pl.ds(row0 // 2, gw), :] = ysum.astype(pool_ref.dtype)


def conv_flat(xflat: jnp.ndarray, w, b, g: FlatGeometry,
              negative_slope: float = 0.2, emit_pool: bool = True,
              interpret: bool = False):
  """conv3x3+bias+leaky(+half-pool) over a guarded flat (r, cin) plane.

  w: (3, 3, cin, c) HWIO weights in the plane dtype — RECTANGULAR taps
  are supported (cin need not equal g.c, only be a 128-lane multiple):
  every tap is then a dense (cin, c) contraction, which lets a
  sub-level's FIRST conv (cfeat_conv_4/6: 128->256, 256->512) run in the
  same window pipeline instead of XLA (measured 3-8x over its traffic
  floor at those shapes). b: (c,) f32. Returns (features_flat,
  pool_half) — pool_half is the 0.25-scaled row-pair sum at
  (r_total//2, c) (None when emit_pool is False). Both carry the guard
  masking, so features chain into further flat convs.
  """
  c = g.c
  cin = w.shape[2]
  assert cin % 128 == 0, w.shape
  assert xflat.shape == (g.r_total, cin), (xflat.shape, g)
  assert w.shape == (3, 3, cin, c), w.shape
  win_h = (g.tm + 2) * g.gw + 32
  chunk = 2 * g.gw
  m = g.tm * g.gw
  kernel = functools.partial(
      _flat_stack_kernel, gw=g.gw, tm=g.tm, n_blocks=g.n_blocks,
      win_h=win_h, r_in=g.r_total, body_start=g.body_start,
      body_rows=g.h * g.gw, w_img=g.w, negative_slope=negative_slope,
      chunk=chunk, emit_pool=emit_pool)
  out_specs = [pl.BlockSpec((m, c), lambda j: (j, 0))]
  out_shape = [jax.ShapeDtypeStruct((g.r_total, c), xflat.dtype)]
  if emit_pool:
    out_specs.append(pl.BlockSpec((m // 2, c), lambda j: (j, 0)))
    out_shape.append(jax.ShapeDtypeStruct((g.r_total // 2, c), xflat.dtype))
  bias2d = b.astype(jnp.float32).reshape(1, c)
  outs = pl.pallas_call(
      _wrap_no_pool(kernel) if not emit_pool else kernel,
      grid=(g.n_blocks,),
      in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [
          pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
      out_specs=tuple(out_specs),
      out_shape=tuple(out_shape),
      scratch_shapes=[
          pltpu.VMEM((2, win_h, cin), xflat.dtype),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=64 * 1024 * 1024),
      interpret=interpret,
  )(xflat, w, bias2d)
  if emit_pool:
    return outs
  return outs[0], None


def _wrap_no_pool(kernel):
  def wrapped(xflat, w_ref, b_ref, out_ref, buf, sem):
    kernel(xflat, w_ref, b_ref, out_ref, None, buf, sem)
  return wrapped


def features_from_flat(y: jnp.ndarray, g: FlatGeometry) -> jnp.ndarray:
  """(r_total, c) masked kernel output -> (h, w, c) features.

  A contiguous row slice + reshape + column crop; XLA fuses it into the
  consumers (or pays one copy — cheaper than a seam-pad round trip).
  """
  body = y[g.body_start:g.body_start + g.h * g.gw]
  return body.reshape(g.h, g.gw, g.c)[:, 2:2 + g.w]


def pooled_from_half(p: jnp.ndarray, g: FlatGeometry) -> jnp.ndarray:
  """(r_total//2, c) half-pooled kernel output -> (h/2, w/2, c).

  The kernel emits 0.25-scaled row-pair sums at full guarded width; the
  2x2 pool finishes here with the column-pair add over even/odd columns
  (strided slices XLA folds into the consumer's input copy).
  """
  start = g.body_start // 2
  half = p[start:start + (g.h // 2) * g.gw].reshape(g.h // 2, g.gw, g.c)
  return half[:, 2:2 + g.w:2] + half[:, 3:3 + g.w:2]


def resolve_wide_mode(mode: str, shape, features: int,
                      dtype=None) -> Optional[str]:
  """Resolves options.conv_stack for one WIDE extractor stack call site.

  Same contract as conv_stack.resolve_mode, for the C in {128, 256, 512}
  sub-levels. In 'auto', engages on TPU under a 2-byte compute dtype at
  sizes where the window pipeline beats XLA's conv (the trace shows the
  XLA convs 3-4x over the traffic floor down to 136x240x512).
  """
  if mode == 'off' or features not in (128, 256, 512):
    return None
  if os.environ.get('FI_STACK_WIDE', '1') == '0':  # A/B: wide kernel off
    return None
  h, w = shape[-3], shape[-2]
  if h % 2 or w % 2:
    return None
  if mode == 'interpret':
    return 'interpret'
  try:
    platform = jax.devices()[0].platform
  except Exception:  # pragma: no cover - no backend configured
    platform = 'cpu'
  if platform != 'tpu':
    return None
  if mode == 'on':
    return 'compiled'
  if dtype is not None and jnp.dtype(dtype).itemsize > 2:
    return None
  return 'compiled' if h * w * features >= 64 * 256 * 128 else None


def _wide_stack_impl(head: jnp.ndarray, kernel0, bias0, kernel1, bias1,
                     negative_slope: float = 0.2, emit_pool: bool = True,
                     interpret: bool = False, valid_rows=None
                     ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
  """Runs one wide extractor sub-level in the native flat layout.

  head: (N, H, W, cin) sub-level input (the previous level's pooled head).
  kernel0 / bias0: raw (3, 3, cin, c) HWIO weights + (c,) bias of the
    sub-level's FIRST conv (cfeat_conv_{2i}) — run by XLA over the guarded
    tall frame with the mask fused into its epilogue.
  kernel1 / bias1: raw (3, 3, c, c) weights + (c,) bias of the SECOND conv
    (cfeat_conv_{2i+1}), consumed by the fused Pallas kernel.

  Returns (features (N, H, W, c), pooled (N, H/2, W/2, c) or None), both
  post-activation.
  """
  n, h, w, cin = head.shape
  dtype = head.dtype
  c = kernel1.shape[-1]
  g = flat_geometry(h, w, c, tm=default_tm_wide(c))
  w0 = kernel0.astype(dtype)
  b0 = bias0.astype(dtype)
  w1 = kernel1.astype(dtype)
  # Lane-exact heads (cfeat_conv_4/6: cin 128/256) run conv0 in the same
  # flat window pipeline — XLA's conv at those deep-narrow shapes sits
  # 3-8x over the traffic floor (round-5 trace). The rows-SPMD path
  # (valid_rows) keeps the XLA conv0: its slab-edge zeroing is fused into
  # that conv's epilogue mask. FI_WIDE_FLAT_CONV0=0 pins the XLA conv0
  # (A/B control).
  flat_conv0 = (cin % 128 == 0 and valid_rows is None and
                os.environ.get('FI_WIDE_FLAT_CONV0', '1') != '0')

  def one(frame):
    tall = pad_image_tall_flat(frame, g)
    if flat_conv0:
      y0_flat, _ = conv_flat(
          tall.reshape(g.r_total, cin), w0, bias0, g,
          negative_slope=negative_slope, emit_pool=False,
          interpret=interpret)
      xflat = y0_flat
    else:
      y0 = jax.lax.conv_general_dilated(
          tall[None], w0, (1, 1), 'SAME',
          dimension_numbers=('NHWC', 'HWIO', 'NHWC'))[0] + b0
      y0 = jnp.where(y0 >= 0, y0, y0 * negative_slope)
      y0 = conv_stack.apply_valid_rows(mask_tall_flat(y0, g), g.tm + 2,
                                       valid_rows)
      xflat = y0.reshape(g.r_total, c)
    feat_flat, pool_half = conv_flat(
        xflat, w1, bias1, g, negative_slope=negative_slope,
        emit_pool=emit_pool, interpret=interpret)
    feat = features_from_flat(feat_flat, g)
    if emit_pool:
      return feat, pooled_from_half(pool_half, g)
    return feat

  if n == 1:
    out = one(head[0])
    out = jax.tree_util.tree_map(lambda a: a[None], out)
  else:
    out = jax.lax.map(one, head)
  if emit_pool:
    return out
  return out, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _wide_diff(negative_slope, emit_pool, interpret,
               head, kernel0, bias0, kernel1, bias1):
  out = _wide_stack_impl(head, kernel0, bias0, kernel1, bias1,
                         negative_slope=negative_slope,
                         emit_pool=emit_pool, interpret=interpret)
  return out if emit_pool else out[0]


def _wide_diff_fwd(negative_slope, emit_pool, interpret,
                   head, kernel0, bias0, kernel1, bias1):
  out = _wide_diff(negative_slope, emit_pool, interpret,
                   head, kernel0, bias0, kernel1, bias1)
  return out, (head, kernel0, bias0, kernel1, bias1)


def _wide_diff_bwd(negative_slope, emit_pool, interpret, residuals, cts):
  """Backward = XLA autodiff of the unfused composition (rematerialized),
  exactly as conv_stack._stack_diff_bwd: same tap math, so the gradient is
  the gradient of the function the kernel computes."""
  head, kernel0, bias0, kernel1, bias1 = residuals
  _, vjp_fn = jax.vjp(
      functools.partial(conv_stack._unfused_stack,
                        negative_slope=negative_slope, emit_pool=emit_pool),
      head, kernel0, bias0, kernel1, bias1)
  if emit_pool:
    feat_ct, pool_ct = cts
    if pool_ct is None:
      pool_ct = jnp.zeros(
          (feat_ct.shape[0], feat_ct.shape[1] // 2, feat_ct.shape[2] // 2,
           feat_ct.shape[3]), feat_ct.dtype)
    cts = (feat_ct, pool_ct)
  return vjp_fn(cts)


_wide_diff.defvjp(_wide_diff_fwd, _wide_diff_bwd)


def wide_extractor_stack(head: jnp.ndarray, kernel0, bias0, kernel1, bias1,
                         negative_slope: float = 0.2, emit_pool: bool = True,
                         interpret: bool = False
                         ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
  """Differentiable entry point for the fused wide extractor sub-level."""
  out = _wide_diff(negative_slope, emit_pool, interpret,
                   head, kernel0, bias0, kernel1, bias1)
  if emit_pool:
    return out
  return out, None
