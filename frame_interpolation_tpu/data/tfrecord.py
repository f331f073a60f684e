"""Self-contained TFRecord reader/writer (no TensorFlow dependency).

The reference stores all datasets as TFRecords written by Beam
(datasets/create_*_tfrecord.py, training/data_lib.py:170-209 in
google-research/frame-interpolation). This module implements the on-disk
format directly so the training/eval pipelines stay TF-free at runtime:

  record := uint64 length (LE) | uint32 masked_crc32c(length) |
            bytes data[length] | uint32 masked_crc32c(data)
  masked_crc(x) = ((crc32c(x) >> 15 | crc32c(x) << 17) + 0xa282ead8) & 0xffffffff

CRC32C (Castagnoli) uses the C extension in frame_interpolation_tpu.native
when built (slicing-by-8, GB/s) and falls back to a table-driven Python
loop otherwise; writing produces records that TensorFlow reads (verified in
tests), and reading validates CRCs by default.

Sharded filename conventions match the reference (data_lib.py:170-183):
'<name>@N' expands to '<name>-0000i-of-0000N'.
"""
from __future__ import annotations

import os
import struct
from typing import Iterator, List, Optional

import numpy as np

_CRC_POLY = 0x82F63B78  # reversed Castagnoli polynomial
_MASK_DELTA = 0xA282EAD8


def _make_table() -> np.ndarray:
  table = np.zeros(256, dtype=np.uint64)
  for i in range(256):
    crc = i
    for _ in range(8):
      crc = (crc >> 1) ^ (_CRC_POLY if crc & 1 else 0)
    table[i] = crc
  return table


_TABLE = _make_table()
_TABLE32 = _TABLE.astype(np.uint32)


def crc32c(data: bytes) -> int:
  """CRC32C (Castagnoli) of `data`."""
  crc = 0xFFFFFFFF
  table = _TABLE32
  for byte in data:
    crc = (crc >> 8) ^ int(table[(crc ^ byte) & 0xFF])
  return crc ^ 0xFFFFFFFF


try:
  # Native slicing-by-8 implementation (frame_interpolation_tpu/native).
  from ..native import crc32c as _crc32c_fast  # type: ignore

  def crc32c(data: bytes) -> int:  # noqa: F811
    return _crc32c_fast(data)
except ImportError:
  pass


def _masked_crc(data: bytes) -> int:
  crc = crc32c(data)
  return ((crc >> 15 | crc << 17) + _MASK_DELTA) & 0xFFFFFFFF


class TFRecordWriter:
  """Writes TFRecord files TensorFlow can read."""

  def __init__(self, path: str):
    directory = os.path.dirname(path)
    if directory:
      os.makedirs(directory, exist_ok=True)
    self._file = open(path, 'wb')

  def write(self, record: bytes) -> None:
    length = struct.pack('<Q', len(record))
    self._file.write(length)
    self._file.write(struct.pack('<I', _masked_crc(length)))
    self._file.write(record)
    self._file.write(struct.pack('<I', _masked_crc(record)))

  def close(self) -> None:
    self._file.close()

  def __enter__(self):
    return self

  def __exit__(self, *exc):
    self.close()


def read_records(path: str, validate: bool = True) -> Iterator[bytes]:
  """Yields raw record payloads from a TFRecord file.

  Uses the native frame scanner when available (one C pass over an mmap),
  falling back to a pure-Python incremental reader.
  """
  try:
    from ..native import scan_tfrecord
  except ImportError:
    scan_tfrecord = None
  if scan_tfrecord is not None:
    import mmap
    with open(path, 'rb') as f:
      if os.path.getsize(path) == 0:
        return
      with mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ) as mapped:
        view = memoryview(mapped)
        try:
          for offset, length in scan_tfrecord(view, validate):
            yield bytes(view[offset:offset + length])
        finally:
          view.release()
    return
  with open(path, 'rb') as f:
    while True:
      header = f.read(12)
      if not header:
        return
      if len(header) < 12:
        raise IOError(f'{path}: truncated record header')
      (length,) = struct.unpack('<Q', header[:8])
      (length_crc,) = struct.unpack('<I', header[8:12])
      if validate and _masked_crc(header[:8]) != length_crc:
        raise IOError(f'{path}: corrupted record length CRC')
      data = f.read(length)
      if len(data) < length:
        raise IOError(f'{path}: truncated record body')
      (data_crc,) = struct.unpack('<I', f.read(4))
      if validate and _masked_crc(data) != data_crc:
        raise IOError(f'{path}: corrupted record data CRC')
      yield data


def sharded_filenames(spec: str) -> List[str]:
  """Expands '<name>@N' to the reference's '-0000i-of-0000N' shard names.

  A spec without '@' (or with a non-integer suffix) is returned as-is
  (training/data_lib.py:170-183 semantics).
  """
  if '@' not in spec:
    return [spec]
  base, _, count = spec.rpartition('@')
  if not count.isdigit():
    return [spec]
  n = int(count)
  return [f'{base}-{i:05d}-of-{n:05d}' for i in range(n)]


def shard_filename(base: str, index: int, total: int) -> str:
  return f'{base}-{index:05d}-of-{total:05d}'


def read_sharded(spec: str, validate: bool = True,
                 max_records: Optional[int] = None) -> Iterator[bytes]:
  """Reads records across all shards of a '<name>@N' spec, in shard order."""
  count = 0
  for path in sharded_filenames(spec):
    for record in read_records(path, validate=validate):
      if max_records is not None and count >= max_records:
        return
      count += 1
      yield record
