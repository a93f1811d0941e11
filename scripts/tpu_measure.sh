#!/bin/bash
# Ordered TPU measurement queue for a freshly healthy tunnel.
# Each step is independently time-bounded, health-gated, and logs to $OUT;
# a failure moves on to the next step (a wedged tunnel should not strand
# the whole queue).
# Usage: scripts/tpu_measure.sh [outdir]
#
# Tunnel rules learned the hard way (2026-08-19):
#  - probe with `python -c` — the `python - <<EOF` heredoc form hangs
#    against the axon tunnel while the identical -c code succeeds;
#  - never run two TPU clients concurrently (the second's first device op
#    can hang indefinitely);
#  - after a heavy client disconnects the worker can refuse NEW clients
#    for 10-20 min, so every step re-gates on a patient health loop.
set -u
OUT=${1:-/tmp/tpu_measure}
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
  sleep 60  # give the worker disconnect-recovery room before the next step
}

health || { echo "tunnel unhealthy, aborting" | tee -a "$OUT/queue.log"; exit 1; }
echo "health ok" | tee -a "$OUT/queue.log"

# 1. simple bench (warms the persistent cache; full driver metric)
run bench_simple 3000 python bench.py --no-train-row
# 2. train iteration (also warms the train program for the driver's
# plain `bench.py`, whose default mode appends a train row)
run bench_train 3000 python bench.py --train --repeats 3
# 3. 6-view single-chip validation (driver config #5)
run bench_6view 3600 python bench.py --advanced --views 6 --multistep 6 --accumulate 2 --repeats 1
# 4. accumulate A/B at 4 views
run bench_acc_scan 3000 python bench.py --advanced --views 4 --multistep 3 --accumulate 2 --repeats 2
run bench_acc_batched 3000 python bench.py --advanced --views 4 --multistep 3 --accumulate 2 --acc-batched --repeats 2
# 4b. split-decode: exact denoise/decode phase timing + per-program compile
run bench_split 3000 python bench.py --split-decode
# 5. compile split + step profile (cold = throwaway cache dir: the real
# item-2 measurement; warm = persistent-cache-hit UX number)
run stage_timing_cold 2400 python scripts/stage_timing.py --cold
run stage_timing_warm 1200 python scripts/stage_timing.py
run step_profile 2400 python scripts/step_profile.py
# 6. compile-diet A/B: fresh-process cold(ish) compiles with gated Mosaic
run warm_default 2400 python bench.py --warm-only
# 6b. layer-dedup compile A/B (fresh process each; step time must hold)
run warm_scan 2400 python bench.py --warm-only --scan-layers
run bench_scan 3000 python bench.py --scan-layers --no-train-row
run warm_gated 2400 env CVD_TPU_GN_MIN_BYTES=8388608 \
  CVD_TPU_LNMM_MIN_BYTES=8388608 python bench.py --warm-only
run bench_gated 3000 env CVD_TPU_GN_MIN_BYTES=8388608 \
  CVD_TPU_LNMM_MIN_BYTES=8388608 python bench.py --no-train-row

echo "queue done ($(date -u +%H:%M:%S))" | tee -a "$OUT/queue.log"
