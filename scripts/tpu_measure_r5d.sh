#!/bin/bash
# Round-5 fourth queue: dots_small remat-policy A/B (full 'dots' OOMs by
# 0.6 GB; the size-thresholded variant keeps the saves that fit).
set -u
OUT=${1:-/tmp/tpu_r5d}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

health() {
  for i in $(seq 1 30); do
    timeout 240 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256, 256)); print('ok', np.asarray((x @ x)[0, 0]))
" >"$OUT/health.out" 2>&1 && return 0
    echo "  health retry $i" | tee -a "$OUT/queue.log"
    sleep 45
  done
  return 1
}

run() { # name timeout cmd...
  local name=$1 t=$2; shift 2
  health || { echo "$name SKIPPED (worker down 20+ min)" | tee -a "$OUT/queue.log"; return 1; }
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  echo "rc=$? $(tail -c 300 "$OUT/$name.out" | tr '\n' ' ')" | tee -a "$OUT/queue.log"
  sleep 60
}

health || { echo "tunnel unhealthy, aborting" | tee -a "$OUT/queue.log"; exit 1; }
echo "health ok" | tee -a "$OUT/queue.log"

run bench_train_dots_small 2400 python bench.py --train --repeats 3 --remat-policy dots_small
echo "queue complete" | tee -a "$OUT/queue.log"
