"""Tests for parallel.distributed and the multi-source CLI plumbing."""
import numpy as np
import pytest

from frame_interpolation_tpu.training import sources as sources_lib
from frame_interpolation_tpu.data import dataset as dataset_lib
from frame_interpolation_tpu.parallel import distributed
from frame_interpolation_tpu.training.configs import DatasetConfig


class TestDistributed:

  def test_initialize_unconfigured_is_noop(self):
    # Single host: must not try to reach a coordinator.
    distributed.initialize_multihost(None, None, None)

  def test_process_batch_slice_single_host(self):
    start, size = distributed.process_batch_slice(8)
    assert (start, size) == (0, 8)

  def test_process_batch_slice_divisibility(self):
    # jax.process_count() == 1 here, so any batch divides; exercise the
    # error path by slicing with a mocked count.
    import jax
    orig_count, orig_index = jax.process_count, jax.process_index
    try:
      jax.process_count = lambda: 4
      jax.process_index = lambda: 3
      start, size = distributed.process_batch_slice(8)
      assert (start, size) == (6, 2)
      with pytest.raises(ValueError, match='must divide'):
        distributed.process_batch_slice(6)
    finally:
      jax.process_count, jax.process_index = orig_count, orig_index


class TestBuildTrainingSources:

  def _build(self, **kw):
    args = dict(config_dataset=DatasetConfig(), train_file=None,
                train_files=[], crop_sizes=[], default_crop_size=64,
                train_weights=[])
    args.update(kw)
    return sources_lib.build_training_sources(dataset_lib, **args)

  def test_train_files_with_weights_and_sizes(self, tmp_path):
    for name in ('a-00000-of-00002', 'a-00001-of-00002', 'b'):
      open(tmp_path / name, 'wb').close()
    a, b = str(tmp_path / 'a'), str(tmp_path / 'b')
    sources, weights = self._build(
        train_files=[f'{a}@2', b], crop_sizes=['128', '256'],
        train_weights=['3', '1'])
    assert [len(s.paths) for s in sources] == [2, 1]
    assert [s.crop_size for s in sources] == [128, 256]
    assert weights == [3.0, 1.0]

  def test_single_train_file_uses_default_crop(self, tmp_path):
    solo = str(tmp_path / 'solo')
    open(solo, 'wb').close()
    sources, weights = self._build(train_file=solo)
    assert [s.crop_size for s in sources] == [64]
    assert weights is None

  def test_config_files_fallback(self, tmp_path):
    x, y = str(tmp_path / 'x'), str(tmp_path / 'y')
    open(x, 'wb').close()
    open(y, 'wb').close()
    config = DatasetConfig(files=(x, y), crop_sizes=(32, 48),
                           weights=(0.7, 0.3))
    sources, weights = self._build(config_dataset=config)
    assert [s.crop_size for s in sources] == [32, 48]
    assert weights == [0.7, 0.3]

  def test_mismatched_crop_sizes_raise(self):
    with pytest.raises(ValueError, match='crop_sizes'):
      self._build(train_files=['a', 'b'], crop_sizes=['1'])

  def test_mismatched_weights_raise(self):
    with pytest.raises(ValueError, match='train_weights'):
      self._build(train_files=['a', 'b'], train_weights=['1'])

  def test_no_source_raises(self):
    with pytest.raises(ValueError, match='no training source'):
      self._build()


class TestMultiSourceIterator:

  def test_two_source_mixing_smoke(self, tmp_path):
    # Two tiny tfrecords with distinguishable content; weighted mixing must
    # draw from both and respect per-source crop sizes.
    from frame_interpolation_tpu.data import records, tfrecord

    def write(path, value, size):
      frame = np.full((size, size, 3), value, np.uint8)
      with tfrecord.TFRecordWriter(str(path)) as writer:
        for _ in range(4):
          writer.write(records.make_triplet_example(
              [frame, frame, frame], path=str(path)))

    write(tmp_path / 'lo.tfrecord', 64, 10)
    write(tmp_path / 'hi.tfrecord', 192, 12)
    it = dataset_lib.create_training_iterator(
        [dataset_lib.TrainingSource(str(tmp_path / 'lo.tfrecord'), 8),
         dataset_lib.TrainingSource(str(tmp_path / 'hi.tfrecord'), 8)],
        batch_size=16, weights=[0.5, 0.5], seed=1)
    batch = next(it)
    assert batch['x0'].shape == (16, 8, 8, 3)
    means = batch['x0'].mean(axis=(1, 2, 3))
    lo, hi = 64 / 255.0, 192 / 255.0
    assert (np.isclose(means, lo, atol=0.02).any()
            and np.isclose(means, hi, atol=0.02).any())
