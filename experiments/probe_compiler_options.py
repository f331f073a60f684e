#!/usr/bin/env python
"""Probe which XLA compile-option overrides the remote TPU helper accepts.

Client-side XLA_FLAGS cannot reach the tunneled compile helper (the
client's CPU plugin rejects TPU flag names outright); per-compile
`compiler_options` travel inside the compile request and are validated by
the remote backend. A tiny matmul compile (~10 s) screens each candidate
before spending a full model-bench compile (~15 min) on it.
"""
import os
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')

import jax
import jax.numpy as jnp

CANDIDATES = [
    {'xla_tpu_scoped_vmem_limit_kib': '32768'},
    {'xla_tpu_enable_aggressive_loop_fusion_layout_opt': 'true'},
    {'xla_tpu_enable_experimental_exhaustive_output_fusion': 'true'},
    {'xla_tpu_use_repeated_instance_for_preferred_prefetch_time': 'true'},
    {'xla_tpu_enable_dot_strength_reduction': 'false'},
    {'xla_tpu_rwb_fusion': 'false'},
    {'xla_enable_async_all_gather': 'true'},
    {'xla_tpu_memory_bound_loop_optimizer_options': 'enabled:true'},
    {'xla_tpu_enable_copy_fusion': 'true'},
    {'xla_tpu_copy_with_multiple_strided_dims': 'true'},
    {'xla_tpu_enable_flash_attention': 'false'},
    {'xla_tpu_vector_load_fusion_window': '2048'},
    {'xla_tpu_vector_store_fusion_window': '512'},
    {'xla_tpu_reduce_loop_fusion_dup_with_unfusable_user': 'true'},
    {'xla_tpu_licm_size_inflation_ratio': '2.0'},
]


def main():
  f = jax.jit(lambda x: jnp.sin(x) @ x.T)
  x = jnp.ones((128, 128), jnp.bfloat16)
  lowered = f.lower(x)
  for opts in CANDIDATES:
    name = list(opts.items())[0]
    try:
      lowered.compile(compiler_options=opts)
      print(f'OK      {name[0]}={name[1]}', flush=True)
    except Exception as e:
      msg = str(e).split('\n')[0][:120]
      print(f'REJECT  {name[0]}={name[1]}: {msg}', flush=True)


if __name__ == '__main__':
  main()
