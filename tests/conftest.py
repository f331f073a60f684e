"""Test configuration: force an 8-device virtual CPU platform.

The reference has no automated tests at all (SURVEY.md §4); we use the
JAX-idiomatic fake-backend trick — a virtual multi-device CPU platform — so
unit tests and multi-chip sharding tests run anywhere, deterministically.

Note: this environment's sitecustomize registers an 'axon' TPU plugin and
overrides the JAX_PLATFORMS env var, so we must also force the platform via
jax.config after import.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'
# Keep TF quiet and CPU-only in parity tests.
os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '2')
os.environ.setdefault('CUDA_VISIBLE_DEVICES', '-1')
# The reference model code predates Keras 3; tf.keras must resolve to the
# legacy tf_keras package for tests/test_reference_parity.py (must be set
# before tensorflow is first imported anywhere in the test process).
os.environ.setdefault('TF_USE_LEGACY_KERAS', '1')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
