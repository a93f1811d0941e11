#!/usr/bin/env bash
# Offline AnimateDiff-adapter LoRA fusion (reference run_merge.sh).
set -euo pipefail
BASE=${1:?SD1.5 diffusers folder}
LORA=${2:?v3_sd15_adapter.ckpt}
python -m cvd_tpu.cli.merge_lora --base_path "$BASE" --lora_ckpt "$LORA" --save_path "$BASE"
