"""Native host-side kernels (C extension), with transparent auto-build.

Importing this package tries, in order:
  1. a previously built `_fi_native` extension next to this file;
  2. building it on the fly with the local C toolchain (cached in
     `native/_build/`);
and exposes `crc32c`, `masked_crc32c`, `scan_tfrecord` on success. Callers
must treat `ImportError` from this package as "no native path available"
and fall back to pure Python (data/tfrecord.py does).
"""
from __future__ import annotations

import os
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))


def _try_import():
  try:
    from . import _fi_native  # type: ignore
    return _fi_native
  except ImportError:
    return None


def _build():
  """Compiles the extension in-place with the system compiler."""
  import subprocess
  ext_suffix = sysconfig.get_config_var('EXT_SUFFIX') or '.so'
  out = os.path.join(_HERE, '_fi_native' + ext_suffix)
  src = os.path.join(_HERE, '_fi_native.c')
  if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
    return True
  include = sysconfig.get_paths()['include']
  cc = os.environ.get('CC', 'cc')
  cmd = [cc, '-O3', '-shared', '-fPIC', f'-I{include}', src, '-o', out]
  try:
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    return True
  except (subprocess.CalledProcessError, FileNotFoundError,
          subprocess.TimeoutExpired):
    if os.path.exists(out):
      os.remove(out)
    return False


_mod = _try_import()
if _mod is None:
  if _build():
    _mod = _try_import()
if _mod is None:
  raise ImportError('native extension unavailable and could not be built')

crc32c = _mod.crc32c
masked_crc32c = _mod.masked_crc32c
scan_tfrecord = _mod.scan_tfrecord

__all__ = ['crc32c', 'masked_crc32c', 'scan_tfrecord']
