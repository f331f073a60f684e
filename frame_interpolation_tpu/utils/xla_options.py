"""Per-compile XLA option overrides for tunneled TPU hosts.

On hosts where the TPU compiler runs behind a tunnel (the axon remote
compile helper), client-side XLA_FLAGS never reach it: the client's CPU
plugin rejects TPU flag names outright, and the helper snapshots its own
environment. Per-compile `compiler_options` DO travel inside each compile
request, and the persistent compilation cache covers AOT-compiled
executables too, so repeated runs stay warm.

Measured on v5e (PERF.md): `xla_tpu_scoped_vmem_limit_kib=49152` lifts
the released-size 1080p forward 2.441 -> 2.507 fps; 98304 OOM-kills the
compile helper. Screen new option names with
experiments/probe_compiler_options.py before a full model compile.

Opt in by setting FI_COMPILER_OPTIONS to a JSON object, e.g.
  FI_COMPILER_OPTIONS='{"xla_tpu_scoped_vmem_limit_kib": "49152"}'
An empty string (or unset) leaves every jit untouched.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

_ENV = 'FI_COMPILER_OPTIONS'


def compiler_options_from_env() -> Optional[Dict[str, str]]:
  """The FI_COMPILER_OPTIONS JSON dict, or None when unset/empty."""
  raw = os.environ.get(_ENV, '')
  if not raw:
    return None
  options = json.loads(raw)
  if not isinstance(options, dict):
    raise ValueError(f'{_ENV} must be a JSON object, got: {raw!r}')
  return {str(k): str(v) for k, v in options.items()}


def _abstract_key(tree: Any) -> Any:
  import jax

  def leaf_key(x):
    if hasattr(x, 'shape') and hasattr(x, 'dtype'):
      return (tuple(x.shape), str(x.dtype))
    return repr(x)

  return tuple(jax.tree_util.tree_map(leaf_key, jax.tree_util.tree_leaves(
      tree)))


class aot_jit:
  """Wraps a jax.jit-wrapped callable with compiler-option overrides.

  When FI_COMPILER_OPTIONS is unset this is a zero-cost passthrough.
  Otherwise the first call per abstract signature lowers and compiles
  with the overrides (served from the persistent compilation cache when
  warm) and subsequent calls reuse the executable.
  """

  def __init__(self, jitted):
    self._jitted = jitted
    self._options = compiler_options_from_env()
    self._compiled = {}

  def __call__(self, *args):
    if self._options is None:
      return self._jitted(*args)
    key = _abstract_key(args)
    executable = self._compiled.get(key)
    if executable is None:
      executable = self._jitted.lower(*args).compile(
          compiler_options=self._options)
      self._compiled[key] = executable
    return executable(*_executable_args(self._jitted, args))


def _executable_args(jitted, args):
  """Drops static arguments: compiled executables take only array args."""
  info = getattr(jitted, '_jit_info', None)
  static = tuple(getattr(info, 'static_argnums', ()) or ())
  if not static:
    return args
  return tuple(a for i, a in enumerate(args) if i not in static)
