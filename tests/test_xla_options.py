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
    wrapped = xla_options.aot_jit(_jitted(), static_argnums=(1,))
    out = wrapped(jnp.ones((4,)), 3)
    np.testing.assert_allclose(np.asarray(out), 3.0)
    assert not wrapped._compiled  # plain jit path, nothing AOT-compiled

  def test_aot_path_compiles_and_caches(self, monkeypatch):
    monkeypatch.setenv('FI_COMPILER_OPTIONS', '{}')
    wrapped = xla_options.aot_jit(_jitted(), static_argnums=(1,))
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

  def test_cache_key_includes_structure(self, monkeypatch):
    """Same leaves under different pytree structures must not alias."""
    monkeypatch.setenv('FI_COMPILER_OPTIONS', '{}')

    @jax.jit
    def f(tree):
      leaves = jax.tree_util.tree_leaves(tree)
      return sum(jnp.sum(leaf) for leaf in leaves)

    wrapped = xla_options.aot_jit(f)
    a = wrapped((jnp.ones((2,)), jnp.ones((3,))))
    b = wrapped({'x': jnp.ones((2,)), 'y': jnp.ones((3,))})
    np.testing.assert_allclose(np.asarray(a), 5.0)
    np.testing.assert_allclose(np.asarray(b), 5.0)
    assert len(wrapped._compiled) == 2

  def test_cache_is_bounded(self, monkeypatch):
    monkeypatch.setenv('FI_COMPILER_OPTIONS', '{}')
    monkeypatch.setattr(xla_options, '_CACHE_SIZE', 3)
    wrapped = xla_options.aot_jit(_jitted(), static_argnums=(1,))
    for scale in range(6):
      wrapped(jnp.ones((4,)), scale)
    assert len(wrapped._compiled) == 3

  def test_compile_failure_falls_back_to_plain_jit(self, monkeypatch,
                                                   capsys):
    """A dying AOT path must never leave the caller without a result.

    This is the round-2 driver-bench failure mode: compile-time env
    crashes in the AOT path produced rc=1 and no benchmark line.
    """
    monkeypatch.setenv('FI_COMPILER_OPTIONS', '{}')
    jitted = _jitted()

    class Exploding:
      def lower(self, *args):
        raise RuntimeError('simulated libtpu topology init failure')

      def __call__(self, *args):
        return jitted(*args)

    wrapped = xla_options.aot_jit(Exploding(), static_argnums=(1,))
    out = wrapped(jnp.ones((4,)), 3)
    np.testing.assert_allclose(np.asarray(out), 3.0)
    assert wrapped._failed
    assert 'falling back to plain jit' in capsys.readouterr().err
    # Subsequent calls skip the broken AOT path entirely.
    out = wrapped(jnp.ones((4,)), 5)
    np.testing.assert_allclose(np.asarray(out), 5.0)

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
