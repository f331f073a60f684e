"""Shared CLI helpers (no flag definitions — safe to import anywhere)."""
from __future__ import annotations


def apply_platform_flag(value) -> None:
  """Forces a JAX platform ('cpu', ...) before any device use."""
  if value:
    import jax
    jax.config.update('jax_platforms', value)


def load_interpolator_from_flag(params_flag: str, align, block_shape,
                                dtype_policy=None):
  """Builds an Interpolator from a bundle/SavedModel path or 'random'."""
  from ..inference import Interpolator, load_interpolator
  if params_flag == 'random':
    import dataclasses

    import jax

    from ..models.film_net import FilmNet, init_params
    from ..options import Options
    options = Options.film_net_released()
    if dtype_policy:
      options = dataclasses.replace(options, dtype_policy=dtype_policy)
    params = init_params(FilmNet(options), jax.random.PRNGKey(42))
    return Interpolator(params, options, align=align, block_shape=block_shape)
  return load_interpolator(params_flag, align=align, block_shape=block_shape,
                           dtype_policy=dtype_policy)
