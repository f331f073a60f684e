"""Shared CLI helpers (no flag definitions — safe to import anywhere)."""
from __future__ import annotations


class _ModuleDefaultHolder:
  """Flag holder that keeps ITS OWN default for a name another CLI defined.

  Same-named flags across CLIs sometimes carry different defaults (e.g.
  the tfrecord builders' --num_shards output-shard counts of 2/3/200 vs
  interpolate_dir's fleet-shard default of 1). With a plain shared
  holder, import order would silently give one module another module's
  default. This holder returns the parsed value only when the user
  actually set the flag (command line or programmatic assignment);
  otherwise it returns the default the CLI module asked for.
  """

  def __init__(self, name, default):
    self._name = name
    self._default = default

  @property
  def name(self):
    return self._name

  @property
  def default(self):
    return self._default

  @property
  def value(self):
    from absl import flags
    flag = flags.FLAGS[self._name]
    # `present` covers command-line parsing; `using_default_value` covers
    # programmatic FLAGS.name = x assignment (e.g. flagsaver in tests).
    user_set = flag.present > 0 or not flag.using_default_value
    return flag.value if user_set else self._default


def define_flag(define_fn, name, *args, **kwargs):
  """absl DEFINE_* that tolerates a prior definition of the same name.

  The CLIs are standalone programs (each reference entry point is its own
  process — e.g. /root/reference/eval/interpolator_cli.py vs eval_cli.py),
  but tests and notebooks import several of them into ONE interpreter,
  where absl's process-global flag registry raises DuplicateFlagError for
  shared names like --model_path/--tfrecord. First definition wins for
  parsing; later CLI modules get a holder that preserves their OWN
  default (same observable semantics as two processes each defining it),
  so e.g. a tfrecord builder's --num_shards default can never leak into
  interpolate_dir's fleet sharding.
  """
  from absl import flags
  try:
    return define_fn(name, *args, **kwargs)
  except flags.DuplicateFlagError:
    default = args[0] if args else kwargs.get('default')
    return _ModuleDefaultHolder(name, default)


def apply_platform_flag(value) -> None:
  """Forces a JAX platform ('cpu', ...) before any device use."""
  if value:
    import jax
    jax.config.update('jax_platforms', value)


def load_interpolator_from_flag(params_flag: str, align, block_shape,
                                dtype_policy=None, warp_impl=None,
                                fold_convs=None, conv_stack=None):
  """Builds an Interpolator from a bundle/SavedModel path or 'random'."""
  import dataclasses

  from ..inference import Interpolator, load_interpolator

  def override(options):
    if warp_impl and warp_impl != options.warp_impl:
      options = dataclasses.replace(options, warp_impl=warp_impl)
    if fold_convs and fold_convs != options.fold_convs:
      options = dataclasses.replace(options, fold_convs=fold_convs)
    if conv_stack and conv_stack != options.conv_stack:
      options = dataclasses.replace(options, conv_stack=conv_stack)
    return options

  if params_flag == 'random':
    import jax

    from ..models.film_net import FilmNet, init_params
    from ..options import Options
    options = Options.film_net_released()
    if dtype_policy:
      options = dataclasses.replace(options, dtype_policy=dtype_policy)
    options = override(options)
    params = init_params(FilmNet(options), jax.random.PRNGKey(42))
    return Interpolator(params, options, align=align, block_shape=block_shape)
  interp = load_interpolator(params_flag, align=align,
                             block_shape=block_shape,
                             dtype_policy=dtype_policy)
  options = override(interp.options)
  if options is not interp.options:
    interp = Interpolator(interp.params, options, align=align,
                          block_shape=block_shape)
  return interp


def to_mesh_interpolator(interpolator, mode, align, block_shape=None,
                         kind='pair'):
  """Wraps a loaded Interpolator in a mesh-sharded class (parallel/).

  The reference is single-device at inference (eval/interpolator.py runs
  one SavedModel call at a time); on a TPU slice the same CLIs scale over
  every visible chip via a 1-D jax.sharding.Mesh.

  Args:
    interpolator: the single-device `Interpolator` (supplies params and
      options; its compiled programs are never touched).
    mode: 'none'/None (return `interpolator` unchanged), 'data' (patch
      batches / recursion-tree nodes sharded over the mesh — throughput),
      or 'spatial' (rows of one full-frame forward sharded over the mesh
      with GSPMD halo exchanges — single-frame latency; kind='pair' only).
    align: pad-to-align passed through to the sharded class.
    block_shape: (bh, bw) patch grid for kind='pair' data mode.
    kind: 'pair' (ShardedInterpolator / SpatialShardedInterpolator) or
      'video' (ShardedVideoInterpolator, the frontier-driver drop-in).

  Falls back to the plain interpolator (with a log) on a 1-device host,
  so `--mesh data` is safe in single-chip and CPU-debug runs.
  """
  if not mode or mode == 'none':
    return interpolator
  import jax
  from absl import logging

  from ..parallel import mesh as mesh_lib
  if len(jax.devices()) == 1:
    logging.info('--mesh %s requested but only one device is visible; '
                 'running single-device.', mode)
    return interpolator
  from ..parallel.inference import (ShardedInterpolator,
                                    ShardedVideoInterpolator,
                                    SpatialShardedInterpolator)
  mesh = mesh_lib.create_mesh(jax.devices())
  if kind == 'video':
    if mode != 'data':
      raise ValueError(
          "directory/video interpolation shards the recursion tree; only "
          "--mesh data applies (got %r)." % mode)
    return ShardedVideoInterpolator(interpolator.params,
                                    interpolator.options, mesh, align=align)
  if mode == 'spatial':
    return SpatialShardedInterpolator(interpolator.params,
                                      interpolator.options, mesh,
                                      align=align)
  if mode == 'data':
    block_shape = tuple(block_shape or (1, 1))
    import numpy as np
    if int(np.prod(block_shape)) < mesh.devices.size:
      logging.warning(
          '--mesh data shards the %s patch grid over %d devices; pass '
          '--block_height/--block_width so patches cover the mesh '
          '(excess devices idle on padded patches).',
          block_shape, mesh.devices.size)
    return ShardedInterpolator(interpolator.params, interpolator.options,
                               mesh, block_shape=block_shape, align=align)
  raise ValueError('Unknown --mesh mode: %r' % (mode,))
