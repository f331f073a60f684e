"""Fused pair-flat conv3x3+bias+leaky(+2x2-avg-pool) extractor stack kernel.

The extractor's sub-level-0 stack (reference
models/film_net/feature_extractor.py:119-123: conv -> conv -> avg-pool at
full resolution) is the single largest HBM consumer of the forward pass.
This module runs its second conv + pool as ONE Pallas kernel over a
"pair-flat" layout, producing the conv features and the pooled next-level
head in a single HBM round-trip, with the layout produced NATIVELY by the
first conv so no seam pads exist:

  * PAIR-FLAT LAYOUT: the W-folded tensor (ops/folded_conv.py: 2 adjacent
    pixels x 64 ch = 128 exact lanes) flattened to (rows, 128) with guard
    columns and guard rows built in. Output flat row r takes conv tap
    (ky, dx) from input row r + (ky-1)*pw + dx, so the kernel needs only
    static in-window offsets and masks guards to zero in its epilogue.
  * NATIVE PRODUCTION: `pad_image_tall` pads the 3-channel *image* (cheap:
    ~13 MB at 1080p) to the full guarded geometry before folding, the
    stack's first conv runs as a plain folded XLA conv over the tall
    image, and `mask_tall` (a fusable elementwise epilogue) zeroes the
    guard/halo positions; a free reshape then IS the kernel input.
  * SIDE-MATMUL COMBINE: the folded conv's two 3/4-zero side matmuls are
    combined into one half-dense matmul via a lane select + 64-lane roll:
    2 matmuls per ky instead of 3 (measured 7.3 -> 6.1 ms at 1080p).
  * FUSED POOL: the 2x2 avg-pool of the conv's own output block is a
    lane-half + adjacent-row sum emitted as a second kernel output —
    measured free (<0.03 ms), where the separate XLA pool pass re-reads
    the full 267 MB feature plane.

Measured on-chip (1088x1920x64, bf16): 6.14 ms/stack vs 13.6 ms for XLA
conv+pool in the same chained-loop harness (PERF.md round 4).

Numerics: identical tap math to lax.conv 'SAME' with f32 accumulation from
bf16 operands — the same class as the XLA path; parity pinned in
tests/test_conv_stack.py against the unfused extractor.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 64  # channels per folded lane half; the kernel is specialized to 64.


def _round_up(x: int, m: int) -> int:
  return -(-x // m) * m


def pair_width(w: int) -> int:
  """Folded row length: w/2 pairs + 2 guard pairs, rounded to 32 lanes."""
  return _round_up(w + 4, 32) // 2


class Geometry(NamedTuple):
  """Static pair-flat buffer geometry for an (h, w) image at block size tm.

  rows [body_start, body_start + h*pw) hold the real image rows; one halo
  row of zeros sits on each side; everything else is guard (zero). Blocks
  start at even image rows (body_start = (tm+2)*pw with tm even), so each
  tm-row block holds complete y-pairs and pools independently.
  """
  h: int
  w: int
  tm: int
  pw: int
  r_total: int
  n_blocks: int
  body_start: int

  @property
  def tall_rows(self) -> int:
    """Image rows of the tall (pre-fold) padded frame: r_total / pw."""
    return self.r_total // self.pw


def geometry(h: int, w: int, tm: int = 8) -> Geometry:
  assert tm % 2 == 0, tm
  assert h % 2 == 0 and w % 2 == 0, (h, w)
  pw = pair_width(w)
  body_start = (tm + 2) * pw
  m = tm * pw
  n_blocks = -(-(body_start + (h + 1) * pw + 16) // m) + 1
  return Geometry(h, w, tm, pw, n_blocks * m, n_blocks, body_start)


def pad_image_tall(image: jnp.ndarray, g: Geometry) -> jnp.ndarray:
  """(h, w, cin) image -> (tall_rows, 2*pw, cin) guarded tall frame.

  Cheap at image channel counts (~13 MB for 1080p RGB). Row y of the image
  lands at tall row (tm+2) + y; columns at 2 + x. Everything else is zero,
  which is exactly the guard/halo content the kernel's tap math assumes.
  """
  h, w, _ = image.shape
  assert (h, w) == (g.h, g.w), (image.shape, g)
  top = g.tm + 2
  return jnp.pad(image, ((top, g.tall_rows - top - h),
                         (2, 2 * g.pw - 2 - w), (0, 0)))


def mask_tall(y: jnp.ndarray, g: Geometry) -> jnp.ndarray:
  """Zeroes guard/halo positions of a folded tall conv output.

  `y` is (tall_rows, pw, lanes). Elementwise with iota masks, so XLA fuses
  it into the producing conv's epilogue — this is what makes the halo
  zeros free instead of a seam pad.
  """
  rows = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
  cols = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
  top = g.tm + 2
  ok = ((rows >= top) & (rows < top + g.h) &
        (cols >= 1) & (cols < 1 + g.w // 2))
  return jnp.where(ok, y, jnp.zeros_like(y))


def pack_weights_combined(w: jnp.ndarray):
  """(3, 3, 64, 64) HWIO conv weights -> (wc, ws), each (3, 128, 128).

  wc[ky] is the dense center matmul [[w1, w0], [w2, w1]]; ws[ky] the
  block-diagonal side matmul blockdiag(w0, w2) consumed by the combined
  side operand S = [xl lanes 64: | xr lanes :64]. Pure concat/stack — no
  scatter, so the parameter-only transform stays hoistable (CLAUDE.md).
  """
  zeros = jnp.zeros((C, C), w.dtype)
  wc, ws = [], []
  for ky in range(3):
    w0, w1, w2 = w[ky, 0], w[ky, 1], w[ky, 2]
    wc.append(jnp.concatenate([
        jnp.concatenate([w1, w0], axis=1),
        jnp.concatenate([w2, w1], axis=1)], axis=0))
    ws.append(jnp.concatenate([
        jnp.concatenate([w0, zeros], axis=1),
        jnp.concatenate([zeros, w2], axis=1)], axis=0))
  return jnp.stack(wc), jnp.stack(ws)


def _stack_kernel(xflat, wc_ref, ws_ref, b_ref, out_ref, pool_ref, buf, sem,
                  *, pw: int, tm: int, n_blocks: int, win_h: int,
                  r_in: int, body_start: int, body_rows: int,
                  valid_pairs: int, negative_slope: float, chunk: int,
                  emit_pool: bool):
  j = pl.program_id(0)
  slot = jax.lax.rem(j, 2)
  m = tm * pw

  def start_row(jj):
    raw = jj * m - pw - 16
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
    acc = jnp.zeros((cm, 128), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (cm, 128), 1)
    for ky in range(3):
      base = 16 + ky * pw + row0
      xc = buf[slot, pl.ds(base, cm), :]
      acc += jnp.dot(xc, wc_ref[ky], preferred_element_type=jnp.float32)
      xl = buf[slot, pl.ds(base - 1, cm), :]
      xr = buf[slot, pl.ds(base + 1, cm), :]
      # Combined side operand: S[i<64] = xl[i+64], S[i>=64] = xr[i-64] —
      # select THEN one roll. Mosaic's lane rotate is 32-bit-only, so the
      # 64-lane shuffle runs on an exact f32 copy.
      sel = jnp.where(lane < 64, xr, xl).astype(jnp.float32)
      s_val = pltpu.roll(sel, 64, 1).astype(xc.dtype)
      acc += jnp.dot(s_val, ws_ref[ky], preferred_element_type=jnp.float32)
    value = acc + b_ref[:]
    value = jnp.where(value >= 0, value, value * negative_slope)
    r = (block_start + row0 +
         jax.lax.broadcasted_iota(jnp.int32, (cm, 128), 0))
    q = r - body_start
    pair = jax.lax.rem(q, pw)
    ok = ((q >= 0) & (q < body_rows) & (pair >= 1) & (pair < valid_pairs))
    masked = jnp.where(ok, value, 0.0)
    out_ref[pl.ds(row0, cm), :] = masked.astype(out_ref.dtype)
    if emit_pool:
      # chunk % (2*pw) == 0 and blocks start on even image rows, so each
      # chunk holds complete y-pairs: sum adjacent y rows, then lane
      # halves; pooled row (ypair, p) keeps the sum in lanes 0:64.
      v2 = masked.reshape(cm // (2 * pw), 2, pw, 128)
      ysum = (v2[:, 0] + v2[:, 1]).reshape(cm // 2, 128)
      hsum = ysum + pltpu.roll(ysum, 64, 1)
      pool_ref[pl.ds(row0 // 2, cm // 2), :] = (
          hsum * 0.25).astype(pool_ref.dtype)


def conv_stack_flat(xflat: jnp.ndarray, wc, ws, b2, g: Geometry,
                    negative_slope: float = 0.2, emit_pool: bool = True,
                    interpret: bool = False):
  """conv3x3+bias+leaky(+pool) over a guarded pair-flat (r_total, 128) plane.

  Returns (features_flat, pooled_flat) — pooled_flat is None when
  emit_pool is False. Both carry the guard masking (exact zeros outside
  the body), so outputs chain into further pair-flat convs directly.
  """
  assert xflat.shape == (g.r_total, 128), (xflat.shape, g)
  win_h = (g.tm + 2) * g.pw + 32
  chunk = 2 * g.pw
  m = g.tm * g.pw
  kernel = functools.partial(
      _stack_kernel, pw=g.pw, tm=g.tm, n_blocks=g.n_blocks, win_h=win_h,
      r_in=g.r_total, body_start=g.body_start, body_rows=g.h * g.pw,
      valid_pairs=1 + g.w // 2, negative_slope=negative_slope, chunk=chunk,
      emit_pool=emit_pool)
  out_specs = [pl.BlockSpec((m, 128), lambda j: (j, 0))]
  out_shape = [jax.ShapeDtypeStruct((g.r_total, 128), xflat.dtype)]
  if emit_pool:
    out_specs.append(pl.BlockSpec((m // 2, 128), lambda j: (j, 0)))
    out_shape.append(
        jax.ShapeDtypeStruct((g.r_total // 2, 128), xflat.dtype))
  outs = pl.pallas_call(
      _wrap_no_pool(kernel) if not emit_pool else kernel,
      grid=(g.n_blocks,),
      in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [
          pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
      out_specs=tuple(out_specs),
      out_shape=tuple(out_shape),
      scratch_shapes=[
          pltpu.VMEM((2, win_h, 128), xflat.dtype),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      interpret=interpret,
  )(xflat, wc, ws, b2)
  if emit_pool:
    return outs
  return outs[0], None


def _wrap_no_pool(kernel):
  def wrapped(xflat, wc_ref, ws_ref, b_ref, out_ref, buf, sem):
    kernel(xflat, wc_ref, ws_ref, b_ref, out_ref, None, buf, sem)
  return wrapped


def features_from_flat(y: jnp.ndarray, g: Geometry) -> jnp.ndarray:
  """(r_total, 128) masked kernel output -> (h, w, 64) unfolded features.

  A contiguous row slice + reshape + lane crop; XLA fuses it into the
  consumers (or pays one copy — still cheaper than a seam pad round-trip).
  """
  body = y[g.body_start:g.body_start + g.h * g.pw]
  return body.reshape(g.h, 2 * g.pw, C)[:, 2:2 + g.w]


def pooled_from_flat(p: jnp.ndarray, g: Geometry) -> jnp.ndarray:
  """(r_total/2, 128) pooled kernel output -> (h/2, w/2, 64)."""
  start = g.body_start // 2
  body = p[start:start + (g.h // 2) * g.pw]
  return body.reshape(g.h // 2, g.pw, 128)[:, 1:1 + g.w // 2, :C]


def default_tm() -> int:
  return int(os.environ.get('FI_STACK_TM', '8'))


def resolve_mode(mode: str, shape, features: int,
                 dtype=None) -> Optional[str]:
  """Resolves options.conv_stack for one extractor stack call site.

  Returns 'compiled', 'interpret', or None (use the unfused path).
  `shape` is the stack input's (N, H, W, C); `features` its output
  channels — the kernel is specialized to 64 (2 pixels x 64 ch = 128
  exact lanes). In 'auto', engages on TPU under a 2-byte compute dtype
  (f32 window buffers would crowd VMEM at tm=8) at sizes where the
  kernel's window pipeline beats XLA (same floor as the window warp);
  'on' skips the dtype/size gates (explicit user choice).
  """
  if mode == 'off' or features != C:
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
  return 'compiled' if (h >= 64 and w >= 256) else None


def apply_valid_rows(y_tall: jnp.ndarray, top: int, valid_rows):
  """Zeroes tall-frame rows outside the traced image-row range [lo, hi).

  Used by the rows-SPMD path (stack_rows): a device's slab extension
  carries 2 halo rows on each side that are REAL image rows at interior
  slab boundaries but lie OUTSIDE the global image at the mesh edges —
  there the reference's 'SAME' semantics zero conv0's output before conv1
  consumes it. `valid_rows` is (lo, hi) in image-row units of the frame
  the impl was given (traced per-device scalars).
  """
  if valid_rows is None:
    return y_tall
  lo, hi = valid_rows
  rows = jax.lax.broadcasted_iota(jnp.int32, y_tall.shape, 0)
  ok = (rows >= top + lo) & (rows < top + hi)
  return jnp.where(ok, y_tall, jnp.zeros_like(y_tall))


def _extractor_stack_impl(image: jnp.ndarray, kernel0, bias0, kernel1, bias1,
                          negative_slope: float = 0.2, emit_pool: bool = True,
                          interpret: bool = False, valid_rows=None
                          ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
  """Runs one sub-level-0 extractor stack in the native pair-flat layout.

  image: (N, H, W, cin) stack input (an image-pyramid level).
  kernel0 / bias0: raw (3, 3, cin, 64) HWIO weights + (64,) bias of the
    stack's FIRST conv — run W-folded by XLA over the guarded tall frame
    (its halo-zero mask fuses into the conv epilogue).
  kernel1 / bias1: raw (3, 3, 64, 64) HWIO weights + (64,) bias of the
    SECOND conv, consumed by the fused Pallas kernel.

  All weight transforms (fold, side-combine packing) are pure concat/stack
  on the raw f32 params, hoisted OUTSIDE the per-frame loop — no flax
  scope access happens inside traced bodies.

  Returns (features (N, H, W, 64), pooled (N, H/2, W/2, 64) or None),
  both post-activation — callers must not re-apply the nonlinearity.
  """
  from . import folded_conv  # local import: folded_conv is TPU-agnostic

  n, h, w, _ = image.shape
  dtype = image.dtype
  g = geometry(h, w, default_tm())
  # First-conv numerics mirror FoldableConv's folded path exactly:
  # promote params to the compute dtype, THEN fold (concat — exact).
  w0f = folded_conv.fold_weights(kernel0.astype(dtype))
  b0f = folded_conv.fold_bias(bias0.astype(dtype))
  wc, ws = pack_weights_combined(kernel1.astype(dtype))
  b2 = jnp.concatenate([bias1, bias1]).astype(jnp.float32)[None, :]

  def one(frame):
    tall = pad_image_tall(frame, g)
    folded = tall.reshape(g.tall_rows, g.pw, -1)
    y0 = jax.lax.conv_general_dilated(
        folded[None], w0f, (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))[0] + b0f
    y0 = jnp.where(y0 >= 0, y0, y0 * negative_slope)
    y0 = apply_valid_rows(mask_tall(y0, g), g.tm + 2, valid_rows)
    xflat = y0.reshape(g.r_total, 128)
    feat_flat, pool_flat = conv_stack_flat(
        xflat, wc, ws, b2, g, negative_slope=negative_slope,
        emit_pool=emit_pool, interpret=interpret)
    feat = features_from_flat(feat_flat, g)
    if emit_pool:
      return feat, pooled_from_flat(pool_flat, g)
    return feat

  if n == 1:
    out = one(image[0])
    out = jax.tree_util.tree_map(lambda a: a[None], out)
  else:
    out = jax.lax.map(one, image)
  if emit_pool:
    return out
  return out, None


def _unfused_stack(image, kernel0, bias0, kernel1, bias1,
                   negative_slope: float, emit_pool: bool):
  """The stack as plain XLA ops, numerics mirroring the unfused model path
  (FoldableConv promotes params to the input dtype; leaky-relu epilogues;
  ops/pyramid.avg_pool_2x). Used as the differentiation reference for the
  fused kernel's custom VJP — same tap math, so the gradient is the
  gradient of the function the kernel computes (up to accumulation order).
  """
  from . import pyramid as pyramid_ops  # local import: avoid a cycle

  dt = image.dtype

  def conv(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k.astype(dt), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y + b.astype(dt)[None, None, None]

  y0 = conv(image, kernel0, bias0)
  y0 = jnp.where(y0 >= 0, y0, y0 * negative_slope)
  y1 = conv(y0, kernel1, bias1)
  y1 = jnp.where(y1 >= 0, y1, y1 * negative_slope)
  if emit_pool:
    return y1, pyramid_ops.avg_pool_2x(y1)
  return y1


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _stack_diff(negative_slope, emit_pool, interpret,
                image, kernel0, bias0, kernel1, bias1):
  out = _extractor_stack_impl(image, kernel0, bias0, kernel1, bias1,
                              negative_slope=negative_slope,
                              emit_pool=emit_pool, interpret=interpret)
  return out if emit_pool else out[0]


def _stack_diff_fwd(negative_slope, emit_pool, interpret,
                    image, kernel0, bias0, kernel1, bias1):
  out = _stack_diff(negative_slope, emit_pool, interpret,
                    image, kernel0, bias0, kernel1, bias1)
  return out, (image, kernel0, bias0, kernel1, bias1)


def _stack_diff_bwd(negative_slope, emit_pool, interpret, residuals, cts):
  """Backward = XLA autodiff of the unfused composition (rematerialized).

  The Pallas forward kernel has no differentiation rule; training-path
  gradients (VERDICT round-4 item 5) route through the equivalent plain
  conv stack, whose conv-transposes XLA maps cleanly onto the MXU. The
  fused primal's value is kept (only the backward recomputes).
  """
  image, kernel0, bias0, kernel1, bias1 = residuals
  _, vjp_fn = jax.vjp(
      functools.partial(_unfused_stack, negative_slope=negative_slope,
                        emit_pool=emit_pool),
      image, kernel0, bias0, kernel1, bias1)
  if emit_pool:
    feat_ct, pool_ct = cts
    if pool_ct is None:
      pool_ct = jnp.zeros(
          (feat_ct.shape[0], feat_ct.shape[1] // 2, feat_ct.shape[2] // 2,
           feat_ct.shape[3]), feat_ct.dtype)
    cts = (feat_ct, pool_ct)
  return vjp_fn(cts)


_stack_diff.defvjp(_stack_diff_fwd, _stack_diff_bwd)


def spmd_rows_ctx():
  """The (mesh, axis) installed by ops.warp.spmd_rows_mesh, or None.

  The row-sharded spatial interpolator (parallel/inference.py) installs it
  while tracing; fused-stack sites consult it to drop into shard_map the
  same way the window warp does (ops/warp_window.py window_rows)."""
  from . import warp as warp_lib
  return warp_lib._SPMD_ROWS


def slab_shape(shape):
  """Per-device slab shape for stack gating under the rows-SPMD context.

  Returns `shape` unchanged when no context is installed, the slab shape
  (rows divided by the mesh axis) when the split is clean, or None when
  rows cannot slab-split (odd slabs break the fused pool's y-pairs) — the
  caller must then use the unfused path, which GSPMD partitions itself.
  """
  ctx = spmd_rows_ctx()
  if ctx is None:
    return shape
  mesh, axis = ctx
  n = int(mesh.shape[axis])
  h = shape[-3]
  if h % n or (h // n) % 2:
    return None
  return tuple(shape[:-3]) + (h // n,) + tuple(shape[-2:])


def stack_rows(impl_fn, head, kernel0, bias0, kernel1, bias1,
               emit_pool: bool, interpret: bool):
  """Runs a fused extractor stack under the installed rows-SPMD mesh.

  Inside `jax.shard_map`, each device exchanges a STATIC 2-row halo with
  its neighbors (conv0 + conv1 reach one image row each), runs the fused
  kernel on its local (slab+4)-row extension, and keeps the interior rows:
  full-frame output semantics, 1/n of the stack per device. This is what
  lets SpatialShardedInterpolator keep conv_stack engaged (the Pallas
  custom call carries no GSPMD rules; VERDICT round-4 item 4).

  At the mesh EDGES the halo rows lie outside the global image:
  lax.ppermute zero-fills them (= the global 'SAME' input padding) and
  `valid_rows` makes the impl zero conv0's OUTPUT there too — the
  reference's second conv consumes zero-padded conv0 output at the frame
  boundary, not conv0-of-zeros.

  `impl_fn` is an inference impl accepting valid_rows
  (conv_stack._extractor_stack_impl / conv_stack_wide._wide_stack_impl);
  like the row-sharded window warp, this path carries no custom VJP
  (spatial sharding is a serving latency play; training shards the batch).
  """
  import jax.sharding as shd
  mesh, axis = spmd_rows_ctx()
  n = int(mesh.shape[axis])
  spec = shd.PartitionSpec(None, axis)
  slab_rows = head.shape[1] // n

  def per_shard(slab):
    up = jax.lax.ppermute(slab[:, -2:], axis,
                          [(i, i + 1) for i in range(n - 1)])
    down = jax.lax.ppermute(slab[:, :2], axis,
                            [(i + 1, i) for i in range(n - 1)])
    ext = jnp.concatenate([up, slab, down], axis=1)
    d = jax.lax.axis_index(axis)
    lo = jnp.where(d == 0, 2, 0)
    hi = jnp.where(d == n - 1, slab_rows + 2, slab_rows + 4)
    feat, pooled = impl_fn(ext, kernel0, bias0, kernel1, bias1,
                           emit_pool=emit_pool, interpret=interpret,
                           valid_rows=(lo, hi))
    feat = feat[:, 2:-2]
    if emit_pool:
      return feat, pooled[:, 1:-1]
    return feat

  out_specs = (spec, spec) if emit_pool else spec
  out = jax.shard_map(per_shard, mesh=mesh, in_specs=(spec,),
                      out_specs=out_specs, check_vma=False)(head)
  if emit_pool:
    return out
  return out, None


def extractor_stack(image: jnp.ndarray, kernel0, bias0, kernel1, bias1,
                    negative_slope: float = 0.2, emit_pool: bool = True,
                    interpret: bool = False
                    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
  """Differentiable entry point for the fused extractor stack.

  Forward runs the fused pair-flat kernel (_extractor_stack_impl);
  gradients flow through a custom VJP that differentiates the equivalent
  unfused conv composition, so the training forward can engage the kernel
  (reference training regime: 256x256 crops,
  /root/reference/training/config/film_net-L1.gin:25-34).
  """
  out = _stack_diff(negative_slope, emit_pool, interpret,
                    image, kernel0, bias0, kernel1, bias1)
  if emit_pool:
    return out
  return out, None
