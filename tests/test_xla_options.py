"""Tests for the per-compile XLA option override helper (utils.xla_options)."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frame_interpolation_tpu.utils import xla_options


def _jitted():
  @functools.partial(jax.jit, static_argnums=(1,))
  def f(x, scale):
    return x * scale
  return f


class TestAotJit:

  def test_passthrough_when_env_unset(self, monkeypatch):
    monkeypatch.delenv('FI_COMPILER_OPTIONS', raising=False)
    wrapped = xla_options.aot_jit(_jitted())
    out = wrapped(jnp.ones((4,)), 3)
    np.testing.assert_allclose(np.asarray(out), 3.0)
    assert not wrapped._compiled  # plain jit path, nothing AOT-compiled

  def test_aot_path_compiles_and_caches(self, monkeypatch):
    monkeypatch.setenv('FI_COMPILER_OPTIONS', '{}')
    wrapped = xla_options.aot_jit(_jitted())
    out = wrapped(jnp.ones((4,)), 3)
    np.testing.assert_allclose(np.asarray(out), 3.0)
    assert len(wrapped._compiled) == 1
    # Same signature reuses the executable; a new static value recompiles.
    wrapped(jnp.ones((4,)), 3)
    assert len(wrapped._compiled) == 1
    out5 = wrapped(jnp.ones((4,)), 5)
    np.testing.assert_allclose(np.asarray(out5), 5.0)
    assert len(wrapped._compiled) == 2
    out2d = wrapped(jnp.ones((2, 2)), 3)
    np.testing.assert_allclose(np.asarray(out2d), 3.0)
    assert len(wrapped._compiled) == 3

  def test_env_parsing(self, monkeypatch):
    monkeypatch.delenv('FI_COMPILER_OPTIONS', raising=False)
    assert xla_options.compiler_options_from_env() is None
    monkeypatch.setenv('FI_COMPILER_OPTIONS', '')
    assert xla_options.compiler_options_from_env() is None
    monkeypatch.setenv('FI_COMPILER_OPTIONS',
                       '{"xla_tpu_scoped_vmem_limit_kib": 49152}')
    assert xla_options.compiler_options_from_env() == {
        'xla_tpu_scoped_vmem_limit_kib': '49152'}
    monkeypatch.setenv('FI_COMPILER_OPTIONS', '["not", "a", "dict"]')
    with pytest.raises(ValueError):
      xla_options.compiler_options_from_env()

  def test_interpolator_uses_aot_path(self, monkeypatch):
    from frame_interpolation_tpu.inference import Interpolator
    from frame_interpolation_tpu.models.film_net import FilmNet, init_params
    from frame_interpolation_tpu.options import Options

    monkeypatch.setenv('FI_COMPILER_OPTIONS', '{}')
    opts = Options.tiny()
    model = FilmNet(opts)
    params = init_params(model, jax.random.PRNGKey(0))
    interp = Interpolator(params, opts, align=opts.align)
    rng = np.random.RandomState(0)
    x0 = rng.rand(1, 16, 24, 3).astype(np.float32)
    x1 = rng.rand(1, 16, 24, 3).astype(np.float32)
    dt = np.full((1,), 0.5, np.float32)
    mid = interp(x0, x1, dt)
    assert mid.shape == (1, 16, 24, 3)
    assert len(interp._forward._compiled) == 1
