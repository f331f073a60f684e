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

The AOT path is fail-safe: if `lower().compile(compiler_options=...)`
raises (e.g. the axon client's local libtpu topology init crashing on
missing TPU_* env vars — the round-2 driver bench failure), the wrapper
logs one warning and permanently falls back to the plain jitted callable,
so callers always get an answer.
"""
from __future__ import annotations

import collections
import json
import os
import sys
from typing import Any, Dict, Optional, Sequence, Tuple

_ENV = 'FI_COMPILER_OPTIONS'

# Executables are large (MBs of device code handles); serving uses a
# handful of shape buckets, so a small LRU bounds growth under shape churn.
_CACHE_SIZE = 16


def compiler_options_from_env() -> Optional[Dict[str, str]]:
  """The FI_COMPILER_OPTIONS JSON dict, or None when unset/empty."""
  raw = os.environ.get(_ENV, '')
  if not raw:
    return None
  options = json.loads(raw)
  if not isinstance(options, dict):
    raise ValueError(f'{_ENV} must be a JSON object, got: {raw!r}')
  return {str(k): str(v) for k, v in options.items()}


def _abstract_key(args: Tuple[Any, ...],
                  static_argnums: Tuple[int, ...]) -> Any:
  """Cache key: treedef + per-leaf (shape, dtype) + static values.

  Includes the pytree structure (so identical leaves under different
  structures, or None-valued entries that tree_leaves would drop, cannot
  alias) and the static argument values verbatim (they select different
  lowerings).
  """
  import jax

  dynamic = tuple(a for i, a in enumerate(args) if i not in static_argnums)
  static = tuple(args[i] for i in static_argnums if i < len(args))

  def leaf_key(x):
    if hasattr(x, 'shape') and hasattr(x, 'dtype'):
      return (tuple(x.shape), str(x.dtype))
    return repr(x)

  leaves, treedef = jax.tree_util.tree_flatten(dynamic)
  return (str(treedef), tuple(leaf_key(x) for x in leaves), static)


class aot_jit:
  """Wraps a jax.jit-wrapped callable with compiler-option overrides.

  When FI_COMPILER_OPTIONS is unset this is a zero-cost passthrough.
  Otherwise the first call per abstract signature lowers and compiles
  with the overrides (served from the persistent compilation cache when
  warm) and subsequent calls reuse the executable. Compile failures fall
  back to the plain jitted callable (warning on stderr, once).

  Pass the jit's `static_argnums` explicitly — compiled executables take
  only the array arguments, and the static values are part of the cache
  key. (Positional args only, matching how this codebase calls its jits.)
  """

  def __init__(self, jitted, static_argnums: Sequence[int] = ()):
    self._jitted = jitted
    self._static_argnums = tuple(static_argnums)
    self._options = compiler_options_from_env()
    self._compiled = collections.OrderedDict()
    self._failed = False

  def __call__(self, *args):
    if self._options is None or self._failed:
      return self._jitted(*args)
    key = _abstract_key(args, self._static_argnums)
    executable = self._compiled.get(key)
    if executable is None:
      try:
        executable = self._jitted.lower(*args).compile(
            compiler_options=self._options)
      except Exception as e:  # fail-safe: never leave the caller w/o a result
        self._failed = True
        print(f'xla_options.aot_jit: AOT compile with {self._options} '
              f'failed ({type(e).__name__}: {e}); falling back to plain '
              'jit for this callable.', file=sys.stderr)
        return self._jitted(*args)
      self._compiled[key] = executable
      while len(self._compiled) > _CACHE_SIZE:
        self._compiled.popitem(last=False)
    else:
      self._compiled.move_to_end(key)
    dynamic = tuple(a for i, a in enumerate(args)
                    if i not in self._static_argnums)
    return executable(*dynamic)
