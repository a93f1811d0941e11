#!/bin/bash
# Round-5 ordered TPU measurement queue (see tpu_measure.sh for the tunnel
# rules: -c probes only, one client at a time, patient health gates).
#
# Order is by driver value:
#  1-2  train A/B: pre-encoded-latents cache (new default) vs in-step encode
#  3-4  warm the simple + advanced caches the driver's default bench hits
#  5    full `python bench.py` rehearsal — the exact driver contract
#  6    6-view ms6 acc2 25-step via the advanced CLI (validation, step_chunk)
#  7-10 PAB: quality PSNR + perf A/B (simple + advanced)
#  11-12 step-time XLA-flag experiment (conv/resnet bucket lever)
set -u
OUT=${1:-/tmp/tpu_r5}
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

run bench_train_latcache 2400 python bench.py --train --repeats 3
run bench_train_encstep 2400 python bench.py --train --repeats 3 --encode-in-step
run bench_simple_warm 2400 python bench.py --no-train-row
run bench_adv_warm 2400 python bench.py --advanced --views 4 --multistep 3 --repeats 1 --no-train-row
run bench_default_rehearsal 3000 python bench.py
printf 'a cinematic fly-through of a modern house interior, golden hour\n' \
  > "$OUT/one_prompt.txt"
run sixview_cli 3600 python -m cvd_tpu.cli.inference_advanced \
  --random-weights-full --bf16 --caption_file "$OUT/one_prompt.txt" \
  --view_num 6 --multistep 6 --accumulate_step 2 --num_inference_steps 25 \
  --step_chunk 5 --cam_pattern upper_hemi --out_root "$OUT/sixview"
run pab_quality_simple 2400 python scripts/pab_quality.py --steps 25
run bench_pab_simple 2400 python bench.py --pab --no-train-row
run pab_quality_adv 3000 python scripts/pab_quality.py --advanced --steps 25
run bench_pab_adv 3000 python bench.py --advanced --views 4 --multistep 3 --pab --repeats 1 --no-train-row
# step-time lever experiment: scoped-VMEM headroom for conv fusions
run bench_vmem_flag 2400 env XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
  python bench.py --no-train-row
echo "queue complete" | tee -a "$OUT/queue.log"
