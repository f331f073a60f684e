"""Native parameter bundle save/load for the framework.

A parameter bundle is a directory:
    <bundle>/options.json     — model hyperparameters (Options fields)
    <bundle>/params.msgpack   — flax-serialized parameter pytree

This is the framework's own deployment format (analogous to the reference's
SavedModel export at training/build_saved_model_cli.py:58-76). `load_params`
also transparently accepts a TF2 SavedModel / TF checkpoint directory from
the reference release, delegating to io.tf_import — so users can point the
CLIs directly at the released L1/VGG/Style models.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Tuple

import flax.serialization
import jax
import jax.numpy as jnp

from ..options import Options

_OPTIONS_FILE = 'options.json'
_PARAMS_FILE = 'params.msgpack'


def save_params(path: str, params: Any, options: Options) -> None:
  """Writes a parameter bundle directory."""
  os.makedirs(path, exist_ok=True)
  with open(os.path.join(path, _OPTIONS_FILE), 'w') as f:
    json.dump(dataclasses.asdict(options), f, indent=2)
  params = jax.device_get(params)
  with open(os.path.join(path, _PARAMS_FILE), 'wb') as f:
    f.write(flax.serialization.to_bytes(params))


def _options_from_dict(d: dict) -> Options:
  d = dict(d)
  for key in ('flow_convs', 'flow_filters'):
    if key in d and isinstance(d[key], list):
      d[key] = tuple(d[key])
  return Options(**d)


def is_native_bundle(path: str) -> bool:
  return (os.path.isfile(os.path.join(path, _OPTIONS_FILE)) and
          os.path.isfile(os.path.join(path, _PARAMS_FILE)))


def is_tf_saved_model(path: str) -> bool:
  return (os.path.isfile(os.path.join(path, 'saved_model.pb')) or
          os.path.isfile(os.path.join(path, 'saved_model.pbtxt')))


def is_tf_checkpoint_dir(path: str) -> bool:
  if os.path.isfile(os.path.join(path, 'checkpoint')):
    return True
  if os.path.isdir(path):
    return any(name.endswith('.index') for name in os.listdir(path))
  # A checkpoint prefix like /dir/ckpt-183 (no extension).
  return os.path.isfile(path + '.index')


def load_params(path: str) -> Tuple[Any, Options]:
  """Loads (params, options) from a native bundle or a TF2 model.

  Args:
    path: a native bundle dir, a TF2 SavedModel dir, a TF checkpoint dir,
      or a TF checkpoint prefix.
  """
  if is_native_bundle(path):
    with open(os.path.join(path, _OPTIONS_FILE)) as f:
      options = _options_from_dict(json.load(f))
    from ..models.film_net import FilmNet, init_params
    template = init_params(FilmNet(options), jax.random.PRNGKey(0))
    with open(os.path.join(path, _PARAMS_FILE), 'rb') as f:
      params = flax.serialization.from_bytes(template, f.read())
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return params, options
  if is_tf_saved_model(path) or is_tf_checkpoint_dir(path):
    from . import tf_import
    return tf_import.load_tf_params(path)
  raise FileNotFoundError(
      f'{path} is neither a native parameter bundle (options.json + '
      'params.msgpack) nor a TF2 SavedModel/checkpoint.')
