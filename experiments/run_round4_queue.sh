#!/bin/bash
# Round-4 TPU experiment queue (run serially; the chip is a single
# resource and concurrent jobs wedge the tunnel). Each step is
# independently skippable; all honor JAX_COMPILATION_CACHE_DIR.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

echo "=== 1. window-warp group-height sweep (g=4 baseline, g=6, g=8) ==="
for g in 4 6 8; do
  echo "--- g=$g"
  FI_WARP_GROUP=$g timeout 1800 python experiments/bench_warp_window.py \
    2>/dev/null | tail -8
done

echo "=== 2. fused conv+pool stack kernel vs XLA (side-combine A/B) ==="
CONV_SIDE=combined timeout 2400 python experiments/conv_stack.py 2>/dev/null | tail -5
CONV_SIDE=separate CONV_POOL=1 timeout 1800 python experiments/conv_stack.py 2>/dev/null | tail -3

echo "=== 3. train-step re-profile (post shape-routed splat) ==="
timeout 3600 python experiments/profile_train_step.py 2>/dev/null | tail -25

echo "=== queue done ==="
