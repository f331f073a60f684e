"""Co-import semantics of the CLI flag registry (cli/_common.define_flag).

Every reference entry point is its own process, so same-named flags with
different defaults never collide there; our CLIs tolerate being imported
into ONE interpreter (tests, notebooks), and each module must keep its
OWN default for a shared name (--num_shards means "output shards, 3" to
the Middlebury builder but "fleet shards, 1" to interpolate_dir).
"""
from absl import flags

from frame_interpolation_tpu.cli import create_middlebury_tfrecord as mb
from frame_interpolation_tpu.cli import interpolate_dir as idir
from frame_interpolation_tpu.cli import interpolate_pair as ipair
from frame_interpolation_tpu.cli import verify_released as vrel


def setup_module(module):
  if not flags.FLAGS.is_parsed():
    flags.FLAGS.mark_as_parsed()


def test_num_shards_keeps_module_defaults():
  # Whichever module defined --num_shards first, each holder answers with
  # its own module's default while the flag is unset.
  assert mb._NUM_SHARDS.value == 3
  assert idir._NUM_SHARDS.value == 1


def test_num_shards_explicit_value_wins_everywhere():
  flag = flags.FLAGS['num_shards']
  try:
    flag.parse('5')
    assert mb._NUM_SHARDS.value == 5
    assert idir._NUM_SHARDS.value == 5
  finally:
    flag.unparse()
  assert idir._NUM_SHARDS.value == 1


def test_dtype_policy_keeps_module_defaults():
  # interpolate_pair: optional override (None = use the bundle's policy);
  # verify_released: strict-parity gate pinned to float32.
  assert ipair._DTYPE.value is None
  assert vrel._DTYPE_POLICY.value == 'float32'
