#!/usr/bin/env bash
# 2-view inference (reference run_inference_simple.sh). No
# torch.distributed.launch equivalent is needed: JAX owns all local devices.
#   scripts/run_inference_simple.sh <model_root> <out_root> <pose0> <pose1> <captions>
set -euo pipefail
MODEL_ROOT=${1:?model root (SD1.5 diffusers folder)}
OUT=${2:?output root}
POSE0=${3:?pose file 0}
POSE1=${4:?pose file 1}
CAPTIONS=${5:?captions json/txt}
shift 5
python -m cvd_tpu.cli.inference \
  --ori_model_path "$MODEL_ROOT" --unet_subfolder unet_webvidlora_v3 \
  --motion_module_ckpt "$MODEL_ROOT/v3_sd15_mm.ckpt" \
  --epi_module_ckpt "$MODEL_ROOT/cvd.ckpt" \
  --pose_adaptor_ckpt "$MODEL_ROOT/CameraCtrl.ckpt" \
  --caption_file "$CAPTIONS" --use_negative_prompt \
  --pose_file_0 "$POSE0" --pose_file_1 "$POSE1" \
  --image_height 256 --image_width 256 --guidance_scale 8.5 --bf16 \
  --out_root "$OUT" "$@"
