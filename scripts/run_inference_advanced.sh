#!/usr/bin/env bash
# N-view inference (reference run_inference_advanced.sh): maps view_num to
# multistep/accumulate like run_inference_advanced.sh:30-36.
#   scripts/run_inference_advanced.sh <model_root> <out_root> <captions> <cam_pattern> <view_num>
set -euo pipefail
MODEL_ROOT=${1:?model root}
OUT=${2:?output root}
CAPTIONS=${3:?captions json/txt}
PATTERN=${4:-circle}
VIEWS=${5:-4}
shift 5 || true
case "$VIEWS" in
  2) EXTRA=(--multistep 1) ;;
  4) EXTRA=(--multistep 3) ;;
  6) EXTRA=(--multistep 6 --accumulate_step 2) ;;
  *) EXTRA=(--multistep 3) ;;
esac
python -m cvd_tpu.cli.inference_advanced \
  --ori_model_path "$MODEL_ROOT" --unet_subfolder unet_webvidlora_v3 \
  --motion_module_ckpt "$MODEL_ROOT/v3_sd15_mm.ckpt" \
  --epi_module_ckpt "$MODEL_ROOT/cvd.ckpt" \
  --pose_adaptor_ckpt "$MODEL_ROOT/CameraCtrl.ckpt" \
  --caption_file "$CAPTIONS" --cam_pattern "$PATTERN" --view_num "$VIEWS" \
  "${EXTRA[@]}" --bf16 --out_root "$OUT" "$@"
