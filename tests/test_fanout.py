"""Tests for the fleet fan-out helpers (utils.fanout)."""
import pytest

from frame_interpolation_tpu.utils import fanout


def _double(x):
  return 2 * x


class TestShard:

  def test_partition_is_exact_and_ordered(self):
    items = [f'dir_{i:02d}' for i in range(11)]
    shards = [fanout.shard(items, i, 4) for i in range(4)]
    # Every item exactly once across the fleet.
    combined = [x for s in shards for x in s]
    assert sorted(combined) == sorted(items)
    # Relative order preserved within each shard.
    for s in shards:
      assert s == sorted(s)

  def test_single_shard_identity(self):
    items = list(range(5))
    assert fanout.shard(items, 0, 1) == items

  def test_bad_arguments(self):
    with pytest.raises(ValueError):
      fanout.shard([1], 0, 0)
    with pytest.raises(ValueError):
      fanout.shard([1], 2, 2)
    with pytest.raises(ValueError):
      fanout.shard([1], -1, 2)


class TestProcessMap:

  def test_inline_when_single_worker(self):
    assert fanout.process_map(_double, [1, 2, 3], 1) == [2, 4, 6]

  def test_pool_preserves_order(self):
    items = list(range(20))
    assert fanout.process_map(_double, items, 4) == [2 * x for x in items]

  def test_empty(self):
    assert fanout.process_map(_double, [], 4) == []
