"""Multi-chip patch-sharded inference tests (8-device virtual CPU mesh)."""
import os

import numpy as np
import pytest

import jax

from frame_interpolation_tpu.inference import Interpolator
from frame_interpolation_tpu.models.film_net import FilmNet, init_params
from frame_interpolation_tpu.options import Options
from frame_interpolation_tpu.parallel import create_mesh
from frame_interpolation_tpu.parallel.inference import ShardedInterpolator

pytestmark = pytest.mark.slow  # model compiles dominate runtime

OPTS = Options.tiny()


def test_sharded_patches_match_single_device():
  rng = np.random.RandomState(0)
  params = init_params(FilmNet(OPTS), jax.random.PRNGKey(0))
  mesh = create_mesh(jax.devices())
  assert mesh.devices.size == 8
  h = OPTS.align * 4  # 4x4 patch grid, each patch one align unit
  w = OPTS.align * 8
  x0 = rng.rand(1, h, w, 3).astype(np.float32)
  x1 = rng.rand(1, h, w, 3).astype(np.float32)
  dt = np.array([0.5], np.float32)

  sharded = ShardedInterpolator(params, OPTS, mesh, block_shape=(2, 4),
                                align=OPTS.align)
  single = Interpolator(params, OPTS, align=OPTS.align, block_shape=(2, 4))
  out_sharded = sharded(x0, x1, dt)
  out_single = single(x0, x1, dt)
  assert out_sharded.shape == (1, h, w, 3)
  np.testing.assert_allclose(out_sharded, out_single, atol=2e-6)


def test_patch_count_not_multiple_of_mesh():
  rng = np.random.RandomState(1)
  params = init_params(FilmNet(OPTS), jax.random.PRNGKey(0))
  mesh = create_mesh(jax.devices())
  h = w = OPTS.align * 3  # 9 patches over 8 devices -> padding path
  x0 = rng.rand(1, h, w, 3).astype(np.float32)
  x1 = rng.rand(1, h, w, 3).astype(np.float32)
  dt = np.array([0.5], np.float32)
  sharded = ShardedInterpolator(params, OPTS, mesh, block_shape=(3, 3),
                                align=OPTS.align)
  single = Interpolator(params, OPTS, align=OPTS.align, block_shape=(3, 3))
  np.testing.assert_allclose(sharded(x0, x1, dt), single(x0, x1, dt),
                             atol=2e-6)


def test_sharded_video_tree_matches_single_device():
  # The mesh-sharded recursion tree must be byte-identical to the
  # single-device expand_tree (same program, batches sharded).
  rng = np.random.RandomState(2)
  params = init_params(FilmNet(OPTS), jax.random.PRNGKey(0))
  mesh = create_mesh(jax.devices())
  from frame_interpolation_tpu.parallel.inference import (
      ShardedVideoInterpolator)
  h = w = OPTS.align * 2
  frames = (rng.rand(3, h, w, 3) * 255).astype(np.uint8)
  single = Interpolator(params, OPTS, align=OPTS.align)
  sharded = ShardedVideoInterpolator(params, OPTS, mesh, align=OPTS.align)
  # cached=False: the sharded program is the chunked one; byte equality
  # is the contract between the SAME program sharded vs unsharded. (The
  # feature-cached single-chip default is a different XLA program, equal
  # only to float noise — pinned in test_inference.py.)
  want = np.asarray(single.expand_tree_device(frames, 3, max_batch=8,
                                              as_uint8=True, cached=False))
  got = np.asarray(sharded.expand_tree_device(frames, 3, as_uint8=True))
  assert got.shape == want.shape == (2 * 2**3 + 1, h, w, 3)
  np.testing.assert_array_equal(got, want)


def test_sharded_video_drives_streaming_frontier(monkeypatch):
  # The sharded interpolator is a drop-in for the streaming video driver.
  from frame_interpolation_tpu.inference import (
      interpolate_frontier_streaming)
  from frame_interpolation_tpu.parallel.inference import (
      ShardedVideoInterpolator)
  rng = np.random.RandomState(3)
  params = init_params(FilmNet(OPTS), jax.random.PRNGKey(0))
  mesh = create_mesh(jax.devices())
  h = w = OPTS.align * 2
  frames = [(rng.rand(h, w, 3) * 255).astype(np.uint8) for _ in range(3)]
  single = Interpolator(params, OPTS, align=OPTS.align)
  sharded = ShardedVideoInterpolator(params, OPTS, mesh, align=OPTS.align)
  # Chunked program on both sides (the sharded tree is the chunked one);
  # cached-vs-chunked float-noise tolerance is pinned in test_inference.
  monkeypatch.setenv('FI_TREE_CACHED', '0')
  want = list(interpolate_frontier_streaming(frames, 2, single,
                                             as_uint8=True))
  got = list(interpolate_frontier_streaming(frames, 2, sharded,
                                            as_uint8=True))
  assert len(got) == len(want)
  for a, b in zip(got, want):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_spatial_sharded_matches_single_device():
  # Row-sharded full-frame forward: GSPMD halo exchanges must reproduce
  # the single-device full-frame output (NOT the patch-tiled one).
  from frame_interpolation_tpu.parallel.inference import (
      SpatialShardedInterpolator)
  rng = np.random.RandomState(4)
  params = init_params(FilmNet(OPTS), jax.random.PRNGKey(0))
  mesh = create_mesh(jax.devices())
  h = OPTS.align * 16  # 16 align rows over 8 devices
  w = OPTS.align * 2
  x0 = rng.rand(1, h, w, 3).astype(np.float32)
  x1 = rng.rand(1, h, w, 3).astype(np.float32)
  dt = np.array([0.5], np.float32)
  import dataclasses
  opts = dataclasses.replace(OPTS, warp_impl='gather')
  sharded = SpatialShardedInterpolator(params, opts, mesh,
                                       align=OPTS.align)
  single = Interpolator(params, opts, align=OPTS.align)
  out_sharded = sharded(x0, x1, dt)
  out_single = single(x0, x1, dt)
  assert out_sharded.shape == (1, h, w, 3)
  np.testing.assert_allclose(out_sharded, out_single, atol=2e-6)


def test_window_warp_kernel_runs_inside_shard_map():
  # The batch-sharded classes keep the Pallas window warp by running the
  # per-shard forward under jax.shard_map (no GSPMD partitioning of the
  # custom call). Pin the integration directly: the kernel (interpret
  # mode on CPU) inside shard_map over the 8-device mesh must match the
  # XLA gather warp on the full batch.
  import jax.numpy as jnp
  from jax.sharding import PartitionSpec as P
  from frame_interpolation_tpu.ops import warp, warp_window
  from frame_interpolation_tpu.parallel.inference import _shard_mapped

  rng = np.random.RandomState(5)
  mesh = create_mesh(jax.devices())
  img = rng.rand(8, 16, 24, 3).astype(np.float32)
  flow = ((rng.rand(8, 16, 24, 2) - 0.5) * 6.0).astype(np.float32)

  def per_shard(img, flow):
    return warp_window.backward_warp_window(img, flow, True)

  got = jax.jit(_shard_mapped(per_shard, mesh, 2))(
      jnp.asarray(img), jnp.asarray(flow))
  want = warp.backward_warp(jnp.asarray(img), jnp.asarray(flow))
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_window_rows_warp_matches_gather():
  # The row-sharded window warp (ops/warp_window.backward_warp_window_rows)
  # must reproduce the full-frame gather warp: each device all-gathers the
  # source rows and warps its local slab of output rows.
  import jax.numpy as jnp
  from frame_interpolation_tpu.ops import warp
  from frame_interpolation_tpu.parallel import mesh as mesh_lib

  rng = np.random.RandomState(6)
  mesh = create_mesh(jax.devices())
  img = jnp.asarray(rng.rand(1, 64, 256, 3), np.float32)
  flow = jnp.asarray((rng.rand(1, 64, 256, 2) - 0.5) * 40, np.float32)

  with warp.spmd_rows_mesh(mesh, mesh_lib.DATA_AXIS):
    got = jax.jit(
        lambda i, f: warp.backward_warp_impl(i, f, 'window_rows'))(img, flow)
  want = warp.backward_warp(img, flow)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_window_rows_halo_branch_matches_gather(monkeypatch):
  # Halo-bounded source assembly (VERDICT round-4 item 7): with
  # FI_WARP_ROWS_HALO_SLABS=3 on 8x8-row slabs the runtime bound is
  # |flow_y| <= 23; flow within it takes the ppermute-halo branch, which
  # must be exact vs the full-frame warp INCLUDING queries clipped at the
  # global top/bottom edges (the pre-clip-to-[0,H-1] path).
  import jax.numpy as jnp
  from frame_interpolation_tpu.ops import warp
  from frame_interpolation_tpu.parallel import mesh as mesh_lib

  monkeypatch.setenv('FI_WARP_ROWS_HALO_SLABS', '3')
  rng = np.random.RandomState(8)
  mesh = create_mesh(jax.devices())
  img = jnp.asarray(rng.rand(1, 64, 256, 3), np.float32)
  flow_np = (rng.rand(1, 64, 256, 2) - 0.5) * 40  # |v| <= 20 < 23
  # Push edge rows hard against the global clip in both directions.
  flow_np[0, :4, :, 1] = -20.0
  flow_np[0, -4:, :, 1] = 20.0
  flow = jnp.asarray(flow_np, np.float32)

  with warp.spmd_rows_mesh(mesh, mesh_lib.DATA_AXIS):
    got = jax.jit(
        lambda i, f: warp.backward_warp_impl(i, f, 'window_rows'))(img, flow)
  want = warp.backward_warp(img, flow)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_window_rows_halo_cond_falls_back_on_large_flow(monkeypatch):
  # One flow value beyond the halo bound: every device must agree (pmax)
  # and take the all-gather branch — still exact vs the full-frame warp.
  import jax.numpy as jnp
  from frame_interpolation_tpu.ops import warp
  from frame_interpolation_tpu.parallel import mesh as mesh_lib

  monkeypatch.setenv('FI_WARP_ROWS_HALO_SLABS', '3')
  rng = np.random.RandomState(9)
  mesh = create_mesh(jax.devices())
  img = jnp.asarray(rng.rand(1, 64, 256, 3), np.float32)
  flow_np = (rng.rand(1, 64, 256, 2) - 0.5) * 10
  flow_np[0, 33, 100, 1] = 48.0  # > 23: outside any 3-slab halo
  flow = jnp.asarray(flow_np, np.float32)

  with warp.spmd_rows_mesh(mesh, mesh_lib.DATA_AXIS):
    got = jax.jit(
        lambda i, f: warp.backward_warp_impl(i, f, 'window_rows'))(img, flow)
  want = warp.backward_warp(img, flow)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_window_rows_halo_gate():
  # The static gate: halo only engages when 2k < n-1 sends actually save
  # bytes; FI_WARP_ROWS_HALO=0 pins the all-gather.
  from frame_interpolation_tpu.ops import warp_window

  assert warp_window._halo_slab_count(8, 8) == 0     # ceil(192/8)=24 slabs
  assert warp_window._halo_slab_count(136, 8) == 2   # 1088/8: 2x136 >= 192
  assert warp_window._halo_slab_count(136, 4) == 0   # 2k=4 >= n-1=3
  os.environ['FI_WARP_ROWS_HALO'] = '0'
  try:
    assert warp_window._halo_slab_count(136, 8) == 0
  finally:
    del os.environ['FI_WARP_ROWS_HALO']


def test_window_rows_falls_back_without_context_and_on_small_planes():
  import jax.numpy as jnp
  from frame_interpolation_tpu.ops import warp
  from frame_interpolation_tpu.parallel import mesh as mesh_lib

  rng = np.random.RandomState(7)
  # No context installed: plain gather path.
  img = jnp.asarray(rng.rand(1, 64, 256, 3), np.float32)
  flow = jnp.asarray((rng.rand(1, 64, 256, 2) - 0.5) * 10, np.float32)
  got = warp.backward_warp_impl(img, flow, 'window_rows')
  np.testing.assert_array_equal(np.asarray(got),
                                np.asarray(warp.backward_warp(img, flow)))
  # Context installed but the plane is too small: gather (GSPMD handles).
  mesh = create_mesh(jax.devices())
  small = jnp.asarray(rng.rand(1, 16, 24, 3), np.float32)
  sflow = jnp.asarray((rng.rand(1, 16, 24, 2) - 0.5) * 4, np.float32)
  with warp.spmd_rows_mesh(mesh, mesh_lib.DATA_AXIS):
    got = warp.backward_warp_impl(small, sflow, 'window_rows')
  np.testing.assert_array_equal(np.asarray(got),
                                np.asarray(warp.backward_warp(small, sflow)))


def test_spatial_sharded_window_rows_matches_single_device():
  # The spatially-sharded interpolator with the row-sharded window warp
  # (its default) must match the single-device full-frame forward. Frame
  # sized so the finest level engages the kernel (h=128 >= 64, w=256,
  # 128 rows / 8 devices); coarser levels route to the partitioned gather.
  from frame_interpolation_tpu.parallel.inference import (
      SpatialShardedInterpolator)
  rng = np.random.RandomState(8)
  params = init_params(FilmNet(OPTS), jax.random.PRNGKey(0))
  mesh = create_mesh(jax.devices())
  h, w = 128, 256
  x0 = rng.rand(1, h, w, 3).astype(np.float32)
  x1 = rng.rand(1, h, w, 3).astype(np.float32)
  dt = np.array([0.5], np.float32)
  sharded = SpatialShardedInterpolator(params, OPTS, mesh, align=OPTS.align)
  assert sharded._options.warp_impl == 'window_rows'
  single = Interpolator(params, OPTS, align=OPTS.align)
  out_sharded = sharded(x0, x1, dt)
  out_single = single(x0, x1, dt)
  assert out_sharded.shape == (1, h, w, 3)
  np.testing.assert_allclose(out_sharded, out_single, atol=1e-5, rtol=1e-5)


def test_stack_rows_matches_unfused():
  # The fused extractor stacks under the rows-SPMD context: shard_map with
  # a 2-row halo exchange must reproduce the plain (unsharded) stack for
  # both the pair-flat (C=64) and wide flat (C=128) kernels.
  import jax.numpy as jnp
  from frame_interpolation_tpu.ops import conv_stack, conv_stack_wide, warp
  from frame_interpolation_tpu.parallel import mesh as mesh_lib

  rng = np.random.RandomState(9)
  mesh = create_mesh(jax.devices())
  for stack_fn, cin, c in ((conv_stack._extractor_stack_impl, 3, 64),
                           (conv_stack_wide._wide_stack_impl, 64, 128)):
    head = jnp.asarray(rng.rand(1, 32, 48, cin) - 0.5, np.float32)
    k0 = jnp.asarray((rng.rand(3, 3, cin, c) - 0.5) * 0.2, np.float32)
    b0 = jnp.asarray(rng.rand(c) - 0.5, np.float32)
    k1 = jnp.asarray((rng.rand(3, 3, c, c) - 0.5) * 0.1, np.float32)
    b1 = jnp.asarray(rng.rand(c) - 0.5, np.float32)
    with warp.spmd_rows_mesh(mesh, mesh_lib.DATA_AXIS):
      assert conv_stack.slab_shape(head.shape) == (1, 4, 48, cin)
      got_f, got_p = jax.jit(lambda h: conv_stack.stack_rows(
          stack_fn, h, k0, b0, k1, b1, emit_pool=True, interpret=True))(head)
    want_f, want_p = stack_fn(head, k0, b0, k1, b1, emit_pool=True,
                              interpret=True, valid_rows=None)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               atol=1e-5)


def test_stack_rows_gate_rejects_uneven_slabs():
  from frame_interpolation_tpu.ops import conv_stack, warp
  from frame_interpolation_tpu.parallel import mesh as mesh_lib

  mesh = create_mesh(jax.devices())
  with warp.spmd_rows_mesh(mesh, mesh_lib.DATA_AXIS):
    # 8 devices: 36 rows -> 4.5 rows/device; 8 rows -> odd (1-row) slabs.
    assert conv_stack.slab_shape((1, 36, 48, 3)) is None
    assert conv_stack.slab_shape((1, 8, 48, 3)) is None
    assert conv_stack.slab_shape((1, 48, 48, 3)) == (1, 6, 48, 3)
  assert conv_stack.slab_shape((1, 36, 48, 3)) == (1, 36, 48, 3)


def test_spatial_sharded_conv_stack_matches_single_device():
  # SpatialShardedInterpolator no longer forces conv_stack='off': the
  # fused stacks run per-device on row slabs (VERDICT round-4 item 4).
  import dataclasses
  from frame_interpolation_tpu.parallel.inference import (
      SpatialShardedInterpolator)
  rng = np.random.RandomState(10)
  opts = Options.tiny(filters=64, sub_levels=2, pyramid_levels=3,
                      fusion_pyramid_levels=3, specialized_levels=1,
                      flow_convs=(1, 1), flow_filters=(8, 8),
                      conv_stack='interpret')
  params = init_params(FilmNet(opts), jax.random.PRNGKey(0))
  mesh = create_mesh(jax.devices())
  h, w = 64, 64
  x0 = rng.rand(1, h, w, 3).astype(np.float32)
  x1 = rng.rand(1, h, w, 3).astype(np.float32)
  dt = np.array([0.5], np.float32)
  sharded = SpatialShardedInterpolator(params, opts, mesh, align=opts.align)
  assert sharded._options.conv_stack == 'interpret'
  single = Interpolator(params,
                        dataclasses.replace(opts, warp_impl='gather'),
                        align=opts.align)
  out_sharded = sharded(x0, x1, dt)
  out_single = single(x0, x1, dt)
  np.testing.assert_allclose(out_sharded, out_single, atol=1e-5, rtol=1e-5)


def test_interpolate_dir_cli_mesh_data(tmp_path):
  # --mesh data on the dir CLI routes through ShardedVideoInterpolator;
  # outputs must be byte-identical to the single-device run.
  from absl import flags
  from absl.testing import flagsaver

  from frame_interpolation_tpu.cli import interpolate_dir as idir
  from frame_interpolation_tpu.io import images, params_io

  if not flags.FLAGS.is_parsed():
    flags.FLAGS.mark_as_parsed()

  rng = np.random.RandomState(7)
  frames_dir = tmp_path / 'clip'
  frames_dir.mkdir()
  for i in range(3):
    images.write_image(str(frames_dir / f'frame_{i}.png'),
                       rng.rand(24, 32, 3).astype(np.float32))
  bundle = str(tmp_path / 'bundle')
  params_io.save_params(bundle, init_params(FilmNet(OPTS),
                                            jax.random.PRNGKey(0)), OPTS)

  def run(mesh_mode, out_name):
    target = tmp_path / out_name
    import shutil
    shutil.copytree(frames_dir, target)
    with flagsaver.flagsaver(
        pattern=str(target), params=bundle, times_to_interpolate=1,
        align=OPTS.align, mesh=mesh_mode):
      idir.main([])
    out = sorted((target / 'interpolated_frames').glob('*.png'))
    assert len(out) == 5
    return [images.read_image(str(p)) for p in out]

  import os
  # Chunked tree on the single-device side: --mesh data shards the
  # chunked program, and byte equality is the same-program contract
  # (the cached default differs by float noise — test_inference.py).
  os.environ['FI_TREE_CACHED'] = '0'
  try:
    single = run('none', 'single')
  finally:
    del os.environ['FI_TREE_CACHED']
  sharded = run('data', 'sharded')
  for a, b in zip(single, sharded):
    np.testing.assert_array_equal(a, b)


def test_interpolate_dir_cli_mesh_rejects_streaming():
  from absl import flags
  from absl.testing import flagsaver
  from absl import app

  from frame_interpolation_tpu.cli import interpolate_dir as idir

  if not flags.FLAGS.is_parsed():
    flags.FLAGS.mark_as_parsed()
  with flagsaver.flagsaver(pattern='/nonexistent*', params='random',
                           mesh='data', streaming=True):
    with pytest.raises(app.UsageError):
      idir.main([])


def test_interpolate_pair_cli_mesh_modes(tmp_path):
  # Both --mesh modes of the pair CLI must reproduce the single-device
  # output: 'data' shards the patch grid, 'spatial' row-shards one
  # full-frame forward (GSPMD halo exchanges).
  from absl import flags
  from absl.testing import flagsaver

  from frame_interpolation_tpu.cli import interpolate_pair as ipair
  from frame_interpolation_tpu.io import images, params_io

  if not flags.FLAGS.is_parsed():
    flags.FLAGS.mark_as_parsed()

  rng = np.random.RandomState(11)
  h = OPTS.align * 2
  w = OPTS.align * 4
  f1 = str(tmp_path / 'f1.png')
  f2 = str(tmp_path / 'f2.png')
  images.write_image(f1, rng.rand(h, w, 3).astype(np.float32))
  images.write_image(f2, rng.rand(h, w, 3).astype(np.float32))
  bundle = str(tmp_path / 'bundle')
  params_io.save_params(bundle, init_params(FilmNet(OPTS),
                                            jax.random.PRNGKey(0)), OPTS)

  def run(mesh_mode, name, block=(1, 1)):
    out = str(tmp_path / f'{name}.png')
    with flagsaver.flagsaver(
        frame1=f1, frame2=f2, params=bundle, output_frame=out,
        align=OPTS.align, block_height=block[0], block_width=block[1],
        mesh=mesh_mode):
      ipair.main([])
    return images.read_image(out)

  # Patch tiling changes semantics at patch borders (reference block mode,
  # eval/interpolator.py:192-206): compare tiled-vs-tiled and full-vs-full.
  tiled = run('none', 'single_tiled', block=(2, 4))
  np.testing.assert_array_equal(run('data', 'data', block=(2, 4)), tiled)
  single = run('none', 'single')
  np.testing.assert_array_equal(run('spatial', 'spatial'), single)
