"""Independent property-based oracle for the backward warp.

The existing parity pins (tests/test_ops_tf_parity.py, tests/tf_oracle.py)
compare ops.warp against a TF re-statement of the same clamping rule —
useful, but written by the same author from the same reading of
tensorflow_addons. This suite grounds the warp differently (VERDICT round 3,
next #5):

  1. A BRUTE-FORCE SCALAR ORACLE: tfa's `_interpolate_bilinear` contract
     (reference usage: models/film_net/util.py:66-82 of
     google-research/frame-interpolation) implemented as per-pixel Python
     arithmetic in float64 — no broadcasting, no shared helpers with the
     implementation under test.
  2. CLOSED-FORM PROPERTIES whose expected values need no bilinear code at
     all: integer flows select exact source pixels, |flow| >> image size
     clamps to edge rows/columns, queries landing exactly on the last
     row/column reproduce it, outputs stay in the convex hull of the four
     neighbors, and the (dx, dy) channel convention is pinned by ramp
     images.
  3. VJP ADJOINT CONSISTENCY: the warp is linear in the image for fixed
     flow, so <warp(x), g> == <x, warp^T(g)> must hold EXACTLY (up to
     rounding) for every image-cotangent path — the XLA scatter transpose,
     and each Pallas splat kernel (window RMW, VMEM-resident, matmul) in
     interpret mode; the flow cotangent must be the exact transpose of the
     jvp.

Every property here fails under single-line mutations of
ops.warp._query_coords (clip bounds, iota axes, flow channel order, alpha
clamps) — verified by hand-mutation during development.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frame_interpolation_tpu.ops import warp, warp_splat, warp_window

pytestmark = pytest.mark.slow


def oracle_warp(image: np.ndarray, flow: np.ndarray) -> np.ndarray:
  """Scalar float64 reference of tfa dense_image_warp's sampling rule.

  Per query point: floor the query, clamp the floor into [0, size-2],
  clamp the fractional part into [0, 1], then bilinearly blend the four
  neighbors (tfa _interpolate_bilinear; out-of-range queries thereby clamp
  to edge pixels).
  """
  image = np.asarray(image, np.float64)
  flow = np.asarray(flow, np.float64)
  b, h, w, c = image.shape
  out = np.empty((b, h, w, c), np.float64)
  for bi in range(b):
    for y in range(h):
      for x in range(w):
        qy = y + flow[bi, y, x, 1]
        qx = x + flow[bi, y, x, 0]
        fy = min(max(math.floor(qy), 0), h - 2)
        fx = min(max(math.floor(qx), 0), w - 2)
        ay = min(max(qy - fy, 0.0), 1.0)
        ax = min(max(qx - fx, 0.0), 1.0)
        tl = image[bi, fy, fx]
        tr = image[bi, fy, fx + 1]
        bl = image[bi, fy + 1, fx]
        br = image[bi, fy + 1, fx + 1]
        top = tl + (tr - tl) * ax
        bot = bl + (br - bl) * ax
        out[bi, y, x] = top + (bot - top) * ay
  return out


def _impls():
  return [
      ('gather', lambda img, fl: warp.backward_warp(jnp.asarray(img),
                                                    jnp.asarray(fl))),
      ('window', lambda img, fl: warp_window.backward_warp_window(
          jnp.asarray(img), jnp.asarray(fl), True)),
  ]


IMPLS = _impls()
IMPL_IDS = [name for name, _ in IMPLS]
IMPL_FNS = [fn for _, fn in IMPLS]


@pytest.fixture(params=IMPL_FNS, ids=IMPL_IDS)
def warp_fn(request):
  return request.param


class TestClosedFormProperties:

  def test_integer_flow_selects_exact_pixels(self, warp_fn):
    rng = np.random.RandomState(0)
    img = rng.rand(1, 12, 17, 3).astype(np.float32)
    # dx=+3, dy=-2: out[y, x] must be EXACTLY image[y-2, x+3] wherever the
    # source is in bounds — integer queries have alpha 0, no blending.
    flow = np.zeros((1, 12, 17, 2), np.float32)
    flow[..., 0] = 3.0
    flow[..., 1] = -2.0
    out = np.asarray(warp_fn(img, flow), np.float32)
    # Interior queries (floor untouched by the clamp) have alpha exactly 0:
    # any blend formulation returns the source pixel bit-for-bit.
    np.testing.assert_array_equal(out[0, 2:, :-4], img[0, :-2, 3:-1])
    # The last valid column queries x = w-1, which the clamp maps to
    # (floor w-2, alpha 1); the lerp `top + (bot-top)*alpha` is then 1 ulp
    # off the exact neighbor — inherent to tfa's blend, not a defect.
    np.testing.assert_allclose(out[0, 2:, -4], img[0, :-2, -1],
                               rtol=0, atol=6e-8)

  @pytest.mark.parametrize('magnitude', [1e4, 1e7])
  def test_huge_flow_clamps_to_edge_pixels(self, warp_fn, magnitude):
    rng = np.random.RandomState(1)
    img = rng.rand(1, 10, 14, 2).astype(np.float32)
    # Far beyond the image in all four sign combinations: the clamped
    # floor/alpha rule must return the corner pixel. Positive directions
    # clamp alpha to exactly 1, where the lerp `top + (bot-top)*1` is 1 ulp
    # off the corner (inherent to tfa's blend); clip-bound mutations move
    # the result by whole pixels, far outside this tolerance.
    for sx, sy, corner in [(1, 1, img[0, -1, -1]), (-1, 1, img[0, -1, 0]),
                           (1, -1, img[0, 0, -1]), (-1, -1, img[0, 0, 0])]:
      flow = np.zeros((1, 10, 14, 2), np.float32)
      flow[..., 0] = sx * magnitude
      flow[..., 1] = sy * magnitude
      out = np.asarray(warp_fn(img, flow), np.float32)
      np.testing.assert_allclose(
          out[0], np.broadcast_to(corner, out[0].shape), rtol=0, atol=1.2e-7)

  def test_exact_last_row_and_column(self, warp_fn):
    # Queries landing exactly ON y = h-1 / x = w-1 (the clamp boundary):
    # floor clamps to size-2 and alpha to 1, reproducing the last
    # row/column (to the lerp's 1-ulp blend rounding at alpha == 1). A clip
    # bound of size-1 instead of size-2 breaks this by whole pixels (the
    # second tap would read out of bounds / a clamped duplicate).
    rng = np.random.RandomState(2)
    h, w = 9, 13
    img = rng.rand(1, h, w, 3).astype(np.float32)
    flow = np.zeros((1, h, w, 2), np.float32)
    flow[..., 1] = (h - 1) - np.arange(h, dtype=np.float32)[None, :, None]
    out = np.asarray(warp_fn(img, flow), np.float32)
    np.testing.assert_allclose(out[0], np.broadcast_to(img[0, -1:],
                                                       (h, w, 3)),
                               rtol=0, atol=6e-8)
    flow = np.zeros((1, h, w, 2), np.float32)
    flow[..., 0] = (w - 1) - np.arange(w, dtype=np.float32)[None, None, :]
    out = np.asarray(warp_fn(img, flow), np.float32)
    np.testing.assert_allclose(out[0], np.broadcast_to(img[0, :, -1:],
                                                       (h, w, 3)),
                               rtol=0, atol=6e-8)

  def test_flow_channel_convention(self, warp_fn):
    # flow[..., 0] displaces along x (width), flow[..., 1] along y
    # (height) — the tfa (y, x) flip is internal (reference
    # models/film_net/util.py:66-82). Ramp images make a swap visible.
    h, w = 8, 12
    ramp_x = np.broadcast_to(np.arange(w, dtype=np.float32),
                             (1, h, w))[..., None].copy()
    ramp_y = np.broadcast_to(np.arange(h, dtype=np.float32)[:, None],
                             (1, h, w))[..., None].copy()
    flow = np.zeros((1, h, w, 2), np.float32)
    flow[..., 0] = 2.5
    out_x = np.asarray(warp_fn(ramp_x, flow), np.float32)
    out_y = np.asarray(warp_fn(ramp_y, flow), np.float32)
    # x-ramp shifts by +2.5 (clamped near the right edge); y-ramp unchanged.
    np.testing.assert_allclose(out_x[0, :, :-3, 0],
                               ramp_x[0, :, :-3, 0] + 2.5, atol=1e-5)
    np.testing.assert_allclose(out_y, ramp_y, atol=1e-6)

  def test_output_in_convex_hull_of_neighbors(self, warp_fn):
    rng = np.random.RandomState(3)
    img = rng.rand(2, 14, 19, 3).astype(np.float32)
    flow = ((rng.rand(2, 14, 19, 2) - 0.5) * 50).astype(np.float32)
    out = np.asarray(warp_fn(img, flow), np.float32)
    assert out.min() >= img.min() - 1e-6
    assert out.max() <= img.max() + 1e-6

  def test_negative_fractional_flow_matches_oracle(self, warp_fn):
    rng = np.random.RandomState(4)
    img = rng.rand(1, 11, 13, 2).astype(np.float32)
    flow = -np.abs(rng.rand(1, 11, 13, 2) * 6).astype(np.float32) - 0.25
    out = np.asarray(warp_fn(img, flow), np.float32)
    np.testing.assert_allclose(out, oracle_warp(img, flow), atol=2e-5)


class TestBruteForceFuzz:

  @pytest.mark.parametrize('seed', range(4))
  def test_random_shapes_and_flows(self, warp_fn, seed):
    rng = np.random.RandomState(100 + seed)
    b = int(rng.randint(1, 3))
    h = int(rng.randint(3, 20))
    w = int(rng.randint(3, 24))
    c = int(rng.randint(1, 5))
    img = rng.randn(b, h, w, c).astype(np.float32)
    scale = float(rng.choice([0.5, 3.0, max(h, w) * 2.0]))
    flow = ((rng.rand(b, h, w, 2) - 0.5) * scale).astype(np.float32)
    out = np.asarray(warp_fn(img, flow), np.float32)
    np.testing.assert_allclose(out, oracle_warp(img, flow),
                               atol=4e-5, rtol=1e-5)


def _dot(a, b):
  return float(jnp.vdot(jnp.asarray(a, jnp.float32).ravel(),
                        jnp.asarray(b, jnp.float32).ravel()))


class TestAdjointConsistency:
  """<warp(x), g> == <x, warp^T(g)>: warp is linear in the image."""

  def _case(self, seed, shape=(2, 12, 18, 3), scale=9.0):
    rng = np.random.RandomState(seed)
    b, h, w, c = shape
    x = rng.randn(*shape).astype(np.float32)
    g = rng.randn(*shape).astype(np.float32)
    flow = ((rng.rand(b, h, w, 2) - 0.5) * scale).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(g), jnp.asarray(flow)

  def test_custom_vjp_image_cotangent(self):
    x, g, flow = self._case(10)
    out, vjp = jax.vjp(lambda i: warp.backward_warp(i, flow), x)
    g_image, = vjp(g)
    np.testing.assert_allclose(_dot(out, g), _dot(x, g_image), rtol=1e-4)

  def test_window_kernel_image_cotangent(self):
    x, g, flow = self._case(11)
    out, vjp = jax.vjp(
        lambda i: warp_window.backward_warp_window(i, flow, True), x)
    g_image, = vjp(g)
    np.testing.assert_allclose(_dot(out, g), _dot(x, g_image), rtol=1e-4)

  @pytest.mark.parametrize('splat_name', ['window', 'resident', 'small'])
  def test_splat_kernels_are_exact_transposes(self, splat_name):
    # Each splat kernel must BE warp^T: <x, splat(g, flow)> == <warp(x), g>
    # for random x, g — adjoint-consistency across gather/window/splat
    # formulations on randomized shapes.
    x, g, flow = self._case(12, shape=(1, 16, 24, 3), scale=14.0)
    if splat_name == 'window':
      g_image = warp_splat.backward_warp_splat(g, flow, interpret=True)
    elif splat_name == 'resident':
      hp = -(-x.shape[1] // 8) * 8
      wp = -(-x.shape[2] // 128) * 128
      assert warp_splat._resident_cb(x.shape[3], hp + 40, wp) is not None
      g_image = warp_splat.backward_warp_splat_resident(g, flow,
                                                        interpret=True)
    else:
      assert (x.shape[1] * x.shape[2]
              <= warp_splat._MATMUL_SPLAT_MAX_PIXELS)
      g_image = warp_splat.backward_warp_splat_small(g, flow)
    out = warp.backward_warp(x, flow)
    np.testing.assert_allclose(_dot(out, g), _dot(x, g_image), rtol=1e-4)

  def test_flow_cotangent_is_exact_transpose_of_jvp(self):
    x, g, flow = self._case(13)
    rng = np.random.RandomState(14)
    df = jnp.asarray(rng.randn(*flow.shape).astype(np.float32))
    _, tangent = jax.jvp(lambda f: warp._backward_warp_raw(x, f), (flow,),
                         (df,))
    _, vjp = jax.vjp(lambda f: warp.backward_warp(x, f), flow)
    g_flow, = vjp(g)
    np.testing.assert_allclose(_dot(tangent, g), _dot(df, g_flow), rtol=1e-4)

  @pytest.mark.parametrize('flow_kind', ['random', 'integer', 'huge'])
  def test_analytic_planes_match_linearize(self, flow_kind):
    # The derivative planes assembled from the primal's own taps
    # (_raw_and_planes) must equal jax.linearize of the gather
    # formulation — INCLUDING the clip-boundary tie rule (0.5 at exact
    # integer coordinates and at clamped edges, JAX's min/max semantics).
    rng = np.random.RandomState(21)
    x = jnp.asarray(rng.rand(2, 9, 11, 3).astype(np.float32))
    if flow_kind == 'integer':
      flow = jnp.asarray(
          rng.randint(-4, 5, (2, 9, 11, 2)).astype(np.float32))
    elif flow_kind == 'huge':
      flow = jnp.asarray(((rng.rand(2, 9, 11, 2) - 0.5)
                          * 300).astype(np.float32))
    else:
      flow = jnp.asarray(((rng.rand(2, 9, 11, 2) - 0.5)
                          * 7).astype(np.float32))
    out, du, dv = warp._raw_and_planes(x, flow)
    out2, lin = jax.linearize(lambda f: warp._backward_warp_raw(x, f), flow)
    ones = jnp.ones(flow.shape[:-1], jnp.float32)
    zeros = jnp.zeros_like(ones)
    du2 = lin(jnp.stack([ones, zeros], axis=-1))
    dv2 = lin(jnp.stack([zeros, ones], axis=-1))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    np.testing.assert_allclose(np.asarray(du), np.asarray(du2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv2), atol=1e-5)
