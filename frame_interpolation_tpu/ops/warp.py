"""Backward (inverse) bilinear warping for TPU.

This is the TPU-native equivalent of the reference's only custom-kernel-worthy
op: `tensorflow_addons.image.dense_image_warp` as used through
`models/film_net/util.py:48-82` in google-research/frame-interpolation.

Reference semantics (util.warp):
  out[b, y, x] = bilinear_lookup(image[b], y + flow[b,y,x,1], x + flow[b,y,x,0])

with the tfa `_interpolate_bilinear` boundary rule: the floor of each query
coordinate is clamped into [0, size-2] and the fractional part (alpha) is
clamped into [0, 1]. Out-of-bounds queries therefore clamp to edge pixels.

TPU-first implementation notes. XLA lowers per-pixel gathers to an
index-count-bound loop on TPU, so the formulation minimizes gathered
slices: the two x-taps (ix, ix+1) are fetched as ONE contiguous 2C-wide
slice of the flattened (H*W*C,) image, giving 2 slices per output pixel
(top and bottom rows) instead of 4. Coordinates and blend weights are
computed in f32 on the VPU regardless of the image dtype. Gradients flow
through both the image (scatter-add transpose of gather) and the flow
(through the alphas).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Flow-cotangent formulation (A/B knob, read once at import):
#   'planes' (default): the forward saves the two flow-derivative planes
#     (du, dv) via jax.linearize; the backward's flow grad is an
#     elementwise multiply-reduce (no gathers).
#   'regather': round-2 behavior — the backward re-runs XLA's transpose
#     of the gather formulation (re-gathers the taps).
_FLOWGRAD_MODE = os.environ.get('FI_WARP_FLOWGRAD', 'planes')


def _query_coords_full(h, w, flow, row_offset=0):
  """_query_coords plus the RAW (pre-clip) fractional offsets ty/tx.

  ty/tx feed the analytically-computed flow-derivative planes: the
  derivative of the clipped alpha w.r.t. the flow is the clip gradient
  of the raw offset (1 inside (0, 1), 0.5 exactly at the clip
  boundaries — JAX's min/max tie rule — and 0 outside).
  """
  flow = flow.astype(jnp.float32)
  oh, ow = flow.shape[1], flow.shape[2]
  gy = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0)
  gx = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1)
  if isinstance(row_offset, (int, float)):
    gy = gy + float(row_offset)
  else:
    gy = gy + row_offset.astype(jnp.float32)
  qy = gy[None] + flow[..., 1]
  qx = gx[None] + flow[..., 0]
  # tfa boundary rule: floor clamped to [0, size-2], alpha clamped to [0, 1].
  fy = jnp.clip(jnp.floor(qy), 0.0, float(h - 2))
  fx = jnp.clip(jnp.floor(qx), 0.0, float(w - 2))
  ty = qy - fy
  tx = qx - fx
  ay = jnp.clip(ty, 0.0, 1.0)
  ax = jnp.clip(tx, 0.0, 1.0)
  return fy.astype(jnp.int32), fx.astype(jnp.int32), ay, ax, ty, tx


def _query_coords(h, w, flow, row_offset=0):
  """Returns clamped integer corners and fractional weights, all f32/int32.

  The output grid comes from `flow`'s spatial shape; `h`/`w` are the
  SOURCE bounds the taps clamp to. `row_offset` (static or traced scalar)
  shifts the output grid's global row index — used by the row-sharded
  warp, where each device holds a slab of the output rows but taps the
  full-height source (ops/warp_window.backward_warp_window_rows).
  Default arguments reproduce the classic same-shape warp exactly.
  """
  return _query_coords_full(h, w, flow, row_offset)[:4]


def backward_warp_impl(image: jnp.ndarray, flow: jnp.ndarray,
                       impl: str = 'gather') -> jnp.ndarray:
  """Dispatches between the numerically-equivalent warp implementations.

  'gather': the XLA 2-slice gather below (portable, the CPU/parity path).
  'window': the two-level window-DMA Pallas kernel (ops/warp_window.py).
  'auto': 'window' on TPU when the plane is large enough for the kernel's
  per-tile pipeline to win over XLA's per-pixel gather floor; 'gather'
  otherwise (small pyramid levels and non-TPU backends).
  """
  if impl == 'auto':
    try:
      platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend configured
      platform = 'cpu'
    h, w = image.shape[1], image.shape[2]
    impl = 'window' if platform == 'tpu' and h >= 64 and w >= 256 else (
        'gather')
  if impl == 'window':
    from .warp_window import backward_warp_window
    return backward_warp_window(image, flow)
  if impl == 'window_rows':
    from .warp_window import backward_warp_window_rows
    return backward_warp_window_rows(image, flow)
  return backward_warp(image, flow)


# (mesh, axis_name) installed by parallel.inference.SpatialShardedInterpolator
# while tracing its row-sharded forward; consumed by the 'window_rows' warp
# impl. Tracing-time state only — the jitted executable bakes the mesh in.
_SPMD_ROWS = None


class spmd_rows_mesh:
  """Context manager declaring the mesh/axis a row-sharded forward runs on."""

  def __init__(self, mesh, axis_name):
    self._value = (mesh, axis_name)

  def __enter__(self):
    global _SPMD_ROWS
    self._saved = _SPMD_ROWS
    _SPMD_ROWS = self._value
    return self._value

  def __exit__(self, *exc):
    global _SPMD_ROWS
    _SPMD_ROWS = self._saved
    return False




def _backward_warp_raw(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
  """The gather formulation, with XLA's default autodiff (scatter VJP)."""
  b, h, w, c = image.shape
  compute_dtype = image.dtype
  iy, ix, ay, ax = _query_coords(h, w, flow)

  # One (2, C) slice over the (H*W, C) pixel-row operand covers both x-taps
  # of a pixel contiguously (ix <= W-2 by clamping, so the pair never wraps
  # meaningfully); two gathers (top/bottom source row) replace the naive
  # four.
  pixels = image.reshape(b, h * w, c)
  start_top = (iy * w + ix).reshape(b, h * w)

  dnums = jax.lax.GatherDimensionNumbers(
      offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))

  def gather_pairs(pixels_b, starts_b):
    return jax.lax.gather(pixels_b, starts_b[:, None], dnums,
                          slice_sizes=(2, c), mode='clip')

  # Two separate gather calls (top and bottom source rows): profiling shows
  # a single stacked-starts call forces large slice copies on its output,
  # costing more than the saved per-call overhead. (Measured alternatives:
  # flat-2C tap views and 4-D-operand 2-D-start gathers are both slower —
  # unaligned channel slices / the 2-D-start gather path cost more than
  # the 5-D tap dimension's layout copy.)
  top2 = jax.vmap(gather_pairs)(pixels, start_top).reshape(b, h, w, 2, c)
  bot2 = jax.vmap(gather_pairs)(pixels, start_top + w).reshape(b, h, w, 2, c)

  # Blend in the image's own floating dtype: f32 stays f32 (TF parity);
  # under the bf16 policy this avoids converting the 4-tap tensors (the
  # blend is a convex combination — bf16-safe, verified by the PSNR guard).
  blend_dtype = compute_dtype if jnp.issubdtype(compute_dtype,
                                                jnp.floating) else jnp.float32
  top2 = top2.astype(blend_dtype)
  bot2 = bot2.astype(blend_dtype)
  ax = ax.astype(blend_dtype)[..., None]
  ay = ay.astype(blend_dtype)[..., None]
  top = top2[..., 0, :] + (top2[..., 1, :] - top2[..., 0, :]) * ax
  bot = bot2[..., 0, :] + (bot2[..., 1, :] - bot2[..., 0, :]) * ax
  out = top + (bot - top) * ay
  return out.astype(compute_dtype)


@jax.custom_vjp
def backward_warp(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
  """Backward-warps `image` with `flow` ((dx, dy) per pixel).

  Args:
    image: (B, H, W, C) array.
    flow: (B, H, W, 2) array; channel 0 is dx (x-offset), channel 1 is dy.

  Returns:
    Warped image of the same shape and dtype as `image`.

  Gradients: the flow cotangent runs through the bilinear weights
  (gathers — cheap everywhere). The image cotangent is a bilinear splat,
  which XLA lowers to a per-index serialized scatter on TPU (measured
  100x slower than the forward, dominating train steps); on TPU it is
  computed by the window-splat Pallas kernel (ops/warp_splat.py) instead,
  selected at lowering time so CPU keeps the plain scatter.

  Note: jax.custom_vjp makes this REVERSE-MODE ONLY — jax.jvp/jacfwd
  through any model using this warp raises. Forward-mode callers should
  use the underlying `_backward_warp_raw` (plain XLA, differentiable both
  ways, but with the serialized-scatter cotangent on TPU).
  """
  return _backward_warp_raw(image, flow)


def _raw_and_planes(image, flow):
  """The gather forward PLUS analytic flow-derivative planes (du, dv).

  Same gathers, same blend expression tree as `_backward_warp_raw` (the
  primal values are bit-identical); du/dv are assembled from the SAME
  tap values instead of via jax.linearize — the round-3 'planes' mode
  linearized the whole gather formulation, and XLA did NOT share the
  tangent's gathers with the primal's (8 x 6.9 ms of redundant gather
  fusions per train step in the round-4 profile). The clip-boundary
  derivative matches JAX autodiff exactly: 1 strictly inside (0, 1),
  0.5 at 0 or 1 (lax min/max tie rule), 0 outside.
  """
  b, h, w, c = image.shape
  compute_dtype = image.dtype
  iy, ix, ay, ax, ty, tx = _query_coords_full(h, w, flow)

  pixels = image.reshape(b, h * w, c)
  start_top = (iy * w + ix).reshape(b, h * w)
  dnums = jax.lax.GatherDimensionNumbers(
      offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))

  def gather_pairs(pixels_b, starts_b):
    return jax.lax.gather(pixels_b, starts_b[:, None], dnums,
                          slice_sizes=(2, c), mode='clip')

  top2 = jax.vmap(gather_pairs)(pixels, start_top).reshape(b, h, w, 2, c)
  bot2 = jax.vmap(gather_pairs)(pixels, start_top + w).reshape(b, h, w, 2, c)

  blend_dtype = compute_dtype if jnp.issubdtype(compute_dtype,
                                                jnp.floating) else jnp.float32
  top2 = top2.astype(blend_dtype)
  bot2 = bot2.astype(blend_dtype)
  ax = ax.astype(blend_dtype)[..., None]
  ay = ay.astype(blend_dtype)[..., None]
  dtop = top2[..., 1, :] - top2[..., 0, :]
  dbot = bot2[..., 1, :] - bot2[..., 0, :]
  top = top2[..., 0, :] + dtop * ax
  bot = bot2[..., 0, :] + dbot * ax
  out = top + (bot - top) * ay

  def clip_grad(t):
    inner = ((t > 0.0) & (t < 1.0)).astype(jnp.float32)
    edge = ((t == 0.0) | (t == 1.0)).astype(jnp.float32)
    return (inner + 0.5 * edge).astype(blend_dtype)[..., None]

  du = (dtop + (dbot - dtop) * ay) * clip_grad(tx)
  dv = (bot - top) * clip_grad(ty)
  return (out.astype(compute_dtype), du.astype(compute_dtype),
          dv.astype(compute_dtype))


def _backward_warp_fwd(image, flow):
  # Save the two flow-derivative planes (du = d out/d flow_x, dv =
  # d out/d flow_y) as residuals, computed from the primal's OWN gathered
  # taps (_raw_and_planes): the backward's flow cotangent becomes an
  # elementwise multiply-reduce, and the forward pays only the du/dv
  # plane writes (FI_WARP_FLOWGRAD=regather restores XLA's re-gathering
  # transpose for A/B).
  if _FLOWGRAD_MODE != 'planes':
    return _backward_warp_raw(image, flow), (image, flow, None, None)
  out, du, dv = _raw_and_planes(image, flow)
  return out, (image, flow, du, dv)


def flow_cotangent_from_planes(g, du, dv, flow_dtype):
  """Flow cotangent from saved derivative planes (elementwise, no gathers).

  Flow is per-pixel (diagonal Jacobian): g_flow[p, k] = sum_c
  g[p, c] * d out[p, c] / d flow[p, k] — the exact transpose of the
  linearization saved by the forward. Shared by this module's VJP and the
  window kernel's (ops/warp_window.py), whose planes come from the kernel
  itself instead of the gather formulation.
  """
  gf = g.astype(jnp.float32)
  return jnp.stack(
      [jnp.sum(gf * du.astype(jnp.float32), axis=-1),
       jnp.sum(gf * dv.astype(jnp.float32), axis=-1)],
      axis=-1).astype(flow_dtype)


def image_cotangent(g, flow, image):
  """Image cotangent of the warp: window-splat on TPU, scatter elsewhere.

  XLA lowers the transpose-of-gather to a per-index serialized scatter on
  TPU (measured ~100x the forward — PERF.md round 2), so the TPU branch
  routes by shape to the Pallas splat kernels (ops/warp_splat.py); other
  platforms keep XLA's own scatter. Selected at lowering time via
  platform_dependent so one jaxpr serves both.
  """

  def splat_image_grad(g, flow):
    from . import warp_splat
    h, w = g.shape[1], g.shape[2]
    if h * w <= warp_splat._MATMUL_SPLAT_MAX_PIXELS:
      # Coarse pyramid levels: dense one-hot matmul splat on the MXU
      # (the window kernel's tile geometry overfetches ~10-30x there).
      return warp_splat.backward_warp_splat_small(g, flow).astype(
          image.dtype)
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    if warp_splat._resident_cb(g.shape[3], hp + 40, wp) is not None:
      # Train-crop planes: accumulate in a VMEM-resident block (one HBM
      # write per plane, no RMW window chain).
      return warp_splat.backward_warp_splat_resident(g, flow).astype(
          image.dtype)
    return warp_splat.backward_warp_splat(g, flow).astype(image.dtype)

  def scatter_image_grad(g, flow):
    _, image_vjp = jax.vjp(lambda i: _backward_warp_raw(i, flow), image)
    g_image, = image_vjp(g)
    return g_image

  return jax.lax.platform_dependent(g, flow, tpu=splat_image_grad,
                                    default=scatter_image_grad)


def _backward_warp_bwd(residuals, g):
  image, flow, du, dv = residuals
  if du is None:
    _, flow_vjp = jax.vjp(lambda f: _backward_warp_raw(image, f), flow)
    g_flow, = flow_vjp(g)
  else:
    g_flow = flow_cotangent_from_planes(g, du, dv, flow.dtype)
  g_image = image_cotangent(g, flow, image)
  return g_image, g_flow


backward_warp.defvjp(_backward_warp_fwd, _backward_warp_bwd)
