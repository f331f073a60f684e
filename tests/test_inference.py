"""Tests for the inference drivers and host-side I/O."""
import os

import numpy as np
import pytest

import jax

from frame_interpolation_tpu.inference import (Interpolator,
                                               interpolate_frontier,
                                               interpolate_frontier_streaming,
                                               interpolate_recursively,
                                               interpolate_recursively_cached,
                                               num_interpolated_frames,
                                               num_output_frames)
from frame_interpolation_tpu.inference.recursion import frontier_pairs_per_chunk
from frame_interpolation_tpu.io import images
from frame_interpolation_tpu.models.film_net import FilmNet, init_params
from frame_interpolation_tpu.options import Options

pytestmark = pytest.mark.slow  # model compiles dominate runtime

OPTS = Options.tiny()


@pytest.fixture(scope='module')
def interp():
  model = FilmNet(OPTS)
  params = init_params(model, jax.random.PRNGKey(0))
  return Interpolator(params, OPTS, align=OPTS.align)


def _frames(n, h=16, w=24, seed=0):
  rng = np.random.RandomState(seed)
  return [rng.rand(h, w, 3).astype(np.float32) for _ in range(n)]


class TestRecursion:

  def test_counts(self):
    assert num_output_frames(4, 3) == 3 * 8 + 1
    assert num_interpolated_frames(4, 3) == 3 * 7

  @pytest.mark.parametrize('n_inputs,times', [(2, 1), (2, 2), (3, 2)])
  def test_frontier_matches_recursive(self, interp, n_inputs, times):
    frames = _frames(n_inputs)
    recursive = list(interpolate_recursively(frames, times, interp))
    frontier = interpolate_frontier(frames, times, interp, max_batch=3)
    assert len(recursive) == num_output_frames(n_inputs, times)
    assert len(frontier) == len(recursive)
    for i, (a, b) in enumerate(zip(recursive, frontier)):
      np.testing.assert_allclose(a, b, atol=2e-6, err_msg=f'frame {i}')

  def test_frontier_as_uint8_matches_host_quantization(self, interp):
    # Device-side quantization (expand_tree as_uint8) must produce the
    # exact bytes write_image/write_video would: io.images.to_uint8 of
    # the f32 frames.
    frames = _frames(3, seed=7)
    f32 = interpolate_frontier(frames, 2, interp, max_batch=3)
    quant = interpolate_frontier(frames, 2, interp, max_batch=3,
                                 as_uint8=True)
    assert all(f.dtype == np.uint8 for f in quant)
    for i, (a, b) in enumerate(zip(f32, quant)):
      np.testing.assert_array_equal(images.to_uint8(a), b,
                                    err_msg=f'frame {i}')

  def test_streaming_frontier_as_uint8(self, interp):
    frames = _frames(3, seed=8)
    full = interpolate_frontier(frames, 1, interp, max_batch=3,
                                as_uint8=True)
    streamed = list(interpolate_frontier_streaming(
        frames, 1, interp, max_batch=3, pairs_per_chunk=1, as_uint8=True))
    assert len(streamed) == len(full)
    for i, (a, b) in enumerate(zip(full, streamed)):
      assert b.dtype == np.uint8
      np.testing.assert_array_equal(a, b, err_msg=f'frame {i}')

  @pytest.mark.parametrize('pairs_per_chunk', [1, 2, None])
  def test_streaming_frontier_matches_frontier(self, interp,
                                               pairs_per_chunk):
    frames = _frames(5, seed=3)
    full = interpolate_frontier(frames, 2, interp, max_batch=3)
    streamed = list(interpolate_frontier_streaming(
        frames, 2, interp, max_batch=3, pairs_per_chunk=pairs_per_chunk))
    assert len(streamed) == len(full) == num_output_frames(5, 2)
    # Chunking changes device batch compositions, so agreement is to float
    # tolerance (same bound as the frontier-vs-DFS test above).
    for i, (a, b) in enumerate(zip(full, streamed)):
      np.testing.assert_allclose(a, b, atol=2e-6, err_msg=f'frame {i}')

  def test_streaming_frontier_mixed_uint8_f32(self, interp):
    # Regression: a chunk mixing uint8 and f32 frames must normalize the
    # uint8 ones on host — np.stack used to promote them into the f32
    # tree at 0-255 scale (output frames 255x too bright).
    frames = _frames(3, seed=9)
    mixed = [np.round(frames[0] * 255.0).astype(np.uint8),
             frames[1],
             np.round(frames[2] * 255.0).astype(np.uint8)]
    normalized = [f.astype(np.float32) / 255.0 if f.dtype == np.uint8
                  else f for f in mixed]
    want = interpolate_frontier(normalized, 1, interp, max_batch=3)
    got = list(interpolate_frontier_streaming(
        mixed, 1, interp, max_batch=3, pairs_per_chunk=2))
    assert len(got) == len(want)
    assert max(float(np.max(f)) for f in got) < 2.0
    for i, (a, b) in enumerate(zip(want, got)):
      np.testing.assert_allclose(a, b, atol=2e-6, err_msg=f'frame {i}')

  def test_streaming_frontier_loads_paths_lazily(self, interp, tmp_path):
    frames = _frames(3, seed=7)
    paths = []
    for i, frame in enumerate(frames):
      path = str(tmp_path / f'f_{i}.png')
      images.write_image(path, frame)
      paths.append(path)
    loaded = [images.read_image(p) for p in paths]
    want = interpolate_frontier(loaded, 1, interp)
    got = list(interpolate_frontier_streaming(paths, 1, interp,
                                              pairs_per_chunk=1))
    assert len(got) == len(want)
    for a, b in zip(want, got):
      np.testing.assert_allclose(a, b, atol=2e-6)

  def test_uint8_inputs_match_f32_path(self, interp):
    """Raw uint8 frames (quarter H2D) must reproduce the f32 path
    BIT-IDENTICALLY: the u8->f32 /255 conversion runs in its own jit
    (matching io.images.read_image's host conversion exactly), so the
    tree program is the identical f32 executable. The round-3 verify
    drive caught the fused-convert variant flipping one
    quantization-boundary pixel on the reference photos."""
    rng = np.random.RandomState(11)
    u8 = [rng.randint(0, 256, (16, 24, 3), np.uint8) for _ in range(3)]
    f32 = [f.astype(np.float32) / 255.0 for f in u8]
    want = interpolate_frontier(f32, 2, interp, max_batch=3, as_uint8=True)
    got = interpolate_frontier(u8, 2, interp, max_batch=3, as_uint8=True)
    assert len(got) == len(want)
    for i, (a, b) in enumerate(zip(want, got)):
      np.testing.assert_array_equal(a, b, err_msg=f'frame {i}')
    # Without as_uint8 the output contract stays f32 either way.
    got_f32 = interpolate_frontier(u8, 1, interp, max_batch=3)
    want_f32 = interpolate_frontier(f32, 1, interp, max_batch=3)
    for a, b in zip(want_f32, got_f32):
      assert b.dtype == np.float32
      np.testing.assert_array_equal(a, b)

  def test_device_u8_conversion_exact_all_bytes(self):
    """The device u8->f32 conversion must equal read_image's host division
    for ALL 256 byte values (XLA's reciprocal-multiply rewrite of /255
    breaks 126 of them; the split-constant form restores exactness)."""
    from frame_interpolation_tpu.inference.interpolator import (
        _u8_to_unit_f32)
    u8 = np.arange(256, dtype=np.uint8)
    want = np.arange(256, dtype=np.float32) / np.float32(255.0)
    got = np.asarray(_u8_to_unit_f32(u8))
    np.testing.assert_array_equal(got, want)

  @pytest.mark.parametrize('pipeline_depth', [1, 2, 3])
  def test_streaming_pipeline_depth_invariant(self, interp, pipeline_depth):
    frames = _frames(5, seed=13)
    want = interpolate_frontier(frames, 1, interp, max_batch=3)
    got = list(interpolate_frontier_streaming(
        frames, 1, interp, max_batch=3, pairs_per_chunk=1,
        pipeline_depth=pipeline_depth))
    assert len(got) == len(want)
    for i, (a, b) in enumerate(zip(want, got)):
      np.testing.assert_allclose(a, b, atol=2e-6, err_msg=f'frame {i}')

  def test_streaming_frontier_degenerate_inputs(self, interp):
    frames = _frames(2, seed=9)
    # T = 0: passthrough.
    out = list(interpolate_frontier_streaming(frames, 0, interp))
    assert len(out) == 2
    np.testing.assert_array_equal(out[0], frames[0])
    # Single frame.
    out = list(interpolate_frontier_streaming(frames[:1], 3, interp))
    assert len(out) == 1
    # Empty.
    assert list(interpolate_frontier_streaming([], 3, interp)) == []

  def test_pairs_per_chunk_bounds_memory(self):
    frame_nbytes = 1920 * 1080 * 3 * 4  # ~24.9 MB float32 1080p
    # At T=5 each pair expands to 32 device frames, budgeted with the x3
    # transient-expansion factor (seq + mids + merged stack in f32).
    chunk = frontier_pairs_per_chunk(frame_nbytes, 5, 4 << 30)
    assert chunk == ((4 << 30) - frame_nbytes) // (frame_nbytes * 32 * 3)
    assert 1 <= chunk <= 6
    # Budget smaller than one tree still makes progress.
    assert frontier_pairs_per_chunk(frame_nbytes, 5, 1 << 20) == 1

  def test_cached_recursion_is_bit_identical(self, interp):
    # Feature caching (PERF.md item 5) must not change a single bit: the
    # re-padded cropped midpoint reproduces the uncached pad exactly.
    frames = _frames(3, seed=11)
    naive = list(interpolate_recursively(frames, 2, interp))
    cached = list(interpolate_recursively_cached(frames, 2, interp))
    assert len(cached) == len(naive)
    for i, (a, b) in enumerate(zip(naive, cached)):
      np.testing.assert_array_equal(a, b, err_msg=f'frame {i}')

  def test_cached_recursion_as_uint8(self, interp):
    # Device-quantized frames must equal host-quantizing the f32 stream.
    frames = _frames(3, seed=13)
    f32 = list(interpolate_recursively_cached(frames, 2, interp))
    quant = list(interpolate_recursively_cached(frames, 2, interp,
                                                as_uint8=True))
    assert len(quant) == len(f32)
    for i, (a, b) in enumerate(zip(f32, quant)):
      assert b.dtype == np.uint8
      np.testing.assert_array_equal(images.to_uint8(a), b,
                                    err_msg=f'frame {i}')

  def test_cached_recursion_loads_paths(self, interp, tmp_path):
    frames = _frames(2, seed=12)
    paths = []
    for i, frame in enumerate(frames):
      path = str(tmp_path / f'c_{i}.png')
      images.write_image(path, frame)
      paths.append(path)
    want = list(interpolate_recursively(
        [images.read_image(p) for p in paths], 1, interp))
    got = list(interpolate_recursively_cached(paths, 1, interp))
    for a, b in zip(want, got):
      np.testing.assert_array_equal(a, b)

  def test_recursive_is_time_ordered_superset(self, interp):
    frames = _frames(2, seed=5)
    out = list(interpolate_recursively(frames, 1, interp))
    assert len(out) == 3
    np.testing.assert_array_equal(out[0], frames[0])
    np.testing.assert_array_equal(out[2], frames[1])

  def test_progress_callback_counts(self, interp):
    frames = _frames(3, seed=2)
    count = [0]
    list(interpolate_recursively(frames, 2, interp,
                                 progress=lambda n: count.__setitem__(
                                     0, count[0] + n)))
    assert count[0] == num_interpolated_frames(3, 2)


class TestImageIO:

  def test_read_write_roundtrip(self, tmp_path):
    rng = np.random.RandomState(1)
    image = rng.rand(20, 30, 3).astype(np.float32)
    path = str(tmp_path / 'img.png')
    images.write_image(path, image)
    back = images.read_image(path)
    assert back.shape == (20, 30, 3)
    # PNG is lossless in uint8; error bounded by quantization.
    np.testing.assert_allclose(back, image, atol=1.0 / 255.0 + 1e-6)

  def test_write_rounds_half_up(self, tmp_path):
    # The reference adds 0.5 before the uint8 cast (eval/util.py:52-54).
    value = 100.4999 / 255.0
    img = np.full((4, 4, 3), value, np.float32)
    path = str(tmp_path / 'r.png')
    images.write_image(path, img)
    assert int(images.read_image(path)[0, 0, 0] * 255 + 0.5) == 100

  def test_jpeg_extension(self, tmp_path):
    image = np.zeros((8, 8, 3), np.float32)
    path = str(tmp_path / 'img.jpg')
    images.write_image(path, image)
    assert os.path.getsize(path) > 0

  def test_natural_sort(self):
    names = ['frame_10.png', 'frame_2.png', 'frame_1.png']
    assert images.natural_sort(names) == [
        'frame_1.png', 'frame_2.png', 'frame_10.png']


class TestExpandTree:

  def test_expand_tree_matches_frontier_list(self, interp):
    frames = _frames(4, seed=13)
    want = interpolate_frontier(frames, 2, interp, max_batch=2)
    got = np.asarray(interp.expand_tree_device(np.stack(frames), 2,
                                               max_batch=2))
    assert got.shape[0] == num_output_frames(4, 2)
    for i in range(got.shape[0]):
      np.testing.assert_allclose(got[i], want[i], atol=1e-6,
                                 err_msg=f'frame {i}')

  def test_expand_tree_ragged_chunks(self, interp):
    # 3 pairs with max_batch 2: depth-1 has a ragged (padded) final chunk.
    frames = _frames(4, seed=14)
    got = np.asarray(interp.expand_tree_device(np.stack(frames), 1,
                                               max_batch=2))
    ref = list(interpolate_recursively(frames, 1, interp))
    assert got.shape[0] == len(ref)
    for i, frame in enumerate(ref):
      np.testing.assert_allclose(got[i], frame, atol=2e-6,
                                 err_msg=f'frame {i}')


class TestCachedTree:
  """The feature-cached DFS tree program (inference/cached_tree.py)."""

  @pytest.mark.parametrize('times', [1, 2, 3, 5])
  def test_schedule_invariants(self, times):
    from frame_interpolation_tpu.inference.cached_tree import dfs_schedule
    sched = dfs_schedule(times)
    n_mids = 2**times - 1
    assert len(sched['out_pos']) == n_mids
    # Every interior position is emitted exactly once.
    assert sorted(sched['out_pos'].tolist()) == list(range(1, 2**times))
    # Leaves (final-depth midpoints) skip extraction; everything else
    # extracts. 2^(T-1) leaves of 2^T - 1 midpoints.
    assert int(sched['extract'].sum()) == n_mids - 2**max(times - 1, 0)
    assert int(sched['m_slot'].max(initial=0)) < times + 2
    # Replay the schedule against the midpoint-tree arithmetic: the
    # midpoint at position p (s = largest power of two dividing p) has
    # parents at p - s and p + s. Slots must hold exactly those frames at
    # the time each step runs — this catches any slot-reuse lifetime bug.
    slots = {0: 0, 1: 2**times}
    for a, b, m, p in zip(sched['a_slot'], sched['b_slot'],
                          sched['m_slot'], sched['out_pos']):
      s = p & -p
      assert slots.get(int(a)) == p - s, f'step at {p}: bad left parent'
      assert slots.get(int(b)) == p + s, f'step at {p}: bad right parent'
      slots[int(m)] = int(p)

  # The cached program is a DIFFERENT XLA program from the chunked one
  # (scan-DFS vs per-depth lax.map), so fusion choices can reassociate
  # float math: agreement is to float noise (~1e-7 observed), not
  # bit-exact. The semantics (which frames from which parents, crop/repad
  # at every seam) are identical; quantization-rule byte-equality is
  # pinned per-path elsewhere in this file.

  @pytest.mark.parametrize('n_inputs,times', [(2, 1), (2, 3), (3, 2)])
  def test_cached_matches_chunked(self, interp, n_inputs, times):
    frames = np.stack(_frames(n_inputs, seed=21))
    chunked = np.asarray(interp.expand_tree_device(frames, times,
                                                   max_batch=2, cached=False))
    cached = np.asarray(interp.expand_tree_device(frames, times, cached=True))
    np.testing.assert_allclose(chunked, cached, atol=1e-6)

  def test_cached_uint8(self, interp):
    frames = np.stack(_frames(2, seed=22))
    chunked = np.asarray(interp.expand_tree_device(frames, 2, max_batch=2,
                                                   as_uint8=True,
                                                   cached=False))
    cached = np.asarray(interp.expand_tree_device(frames, 2, as_uint8=True,
                                                  cached=True))
    assert cached.dtype == np.uint8
    # Float noise can flip a pixel sitting exactly on a quantization
    # boundary by one level; anything larger is a real bug.
    diff = np.abs(chunked.astype(np.int32) - cached.astype(np.int32))
    assert diff.max() <= 1

  def test_cached_uint8_matches_own_f32_quantized(self, interp):
    # BYTE equality within the cached path: device uint8 == host
    # quantization of the cached f32 output.
    frames = np.stack(_frames(2, seed=22))
    f32 = np.asarray(interp.expand_tree_device(frames, 2, cached=True))
    quant = np.asarray(interp.expand_tree_device(frames, 2, as_uint8=True,
                                                 cached=True))
    np.testing.assert_array_equal(images.to_uint8(f32), quant)

  def test_cached_unaligned_input(self, interp):
    # Odd shape exercises the crop/re-pad seam inside the scan body.
    rng = np.random.RandomState(23)
    frames = rng.rand(2, 19, 27, 3).astype(np.float32)
    chunked = np.asarray(interp.expand_tree_device(frames, 2, max_batch=2,
                                                   cached=False))
    cached = np.asarray(interp.expand_tree_device(frames, 2, cached=True))
    np.testing.assert_allclose(chunked, cached, atol=1e-6)


class TestTiledTree:
  """Single-program tree expansion under patch tiling."""

  @pytest.fixture(scope='class')
  def tiled(self, interp):
    return Interpolator(interp.params, OPTS, align=OPTS.align,
                        block_shape=(2, 2))

  def test_tiled_tree_matches_legacy_loop(self, tiled, monkeypatch):
    frames = _frames(3, seed=31)
    monkeypatch.setenv('FI_TREE_CACHED', '0')  # legacy per-pair loop
    legacy = interpolate_frontier(frames, 2, tiled, max_batch=4)
    monkeypatch.delenv('FI_TREE_CACHED')
    program = interpolate_frontier(frames, 2, tiled, max_batch=4)
    assert len(program) == len(legacy) == num_output_frames(3, 2)
    for i, (a, b) in enumerate(zip(legacy, program)):
      np.testing.assert_allclose(a, b, atol=1e-6, err_msg=f'frame {i}')

  def test_tiled_tree_device_shape_and_uint8(self, tiled):
    frames = np.stack(_frames(2, seed=32))
    f32 = np.asarray(tiled.expand_tree_device(frames, 2))
    quant = np.asarray(tiled.expand_tree_device(frames, 2, as_uint8=True))
    assert f32.shape == (num_output_frames(2, 2),) + frames.shape[1:]
    assert quant.dtype == np.uint8
    np.testing.assert_array_equal(images.to_uint8(f32), quant)

  def test_tiled_streaming_matches_full(self, tiled):
    frames = _frames(3, seed=33)
    full = interpolate_frontier(frames, 1, tiled, max_batch=4)
    streamed = list(interpolate_frontier_streaming(
        frames, 1, tiled, max_batch=4, pairs_per_chunk=1))
    assert len(streamed) == len(full)
    for i, (a, b) in enumerate(zip(full, streamed)):
      np.testing.assert_allclose(a, b, atol=1e-6, err_msg=f'frame {i}')
