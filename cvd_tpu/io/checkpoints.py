"""High-level weight import: the reference's four artifact kinds -> Flax trees.

Mirrors get_pipeline's load order and strictness (inference_epi.py:72-145):
  1. SD1.5 diffusers folder: unet (2D weights into the inflated 3D model,
     non-strict like from_pretrained_2d), vae, text_encoder
  2. image LoRA ckpt (optional; CameraCtrl's image LoRA — usually pre-fused
     offline via tools/merge_lora2unet, see cvd_tpu.io.lora)
  3. AnimateDiff motion-module ckpt -> motion_modules params
  4. CVD epi ckpt ('unet_trainable_dict') -> epi_modules params
  5. CameraCtrl pose-adaptor ckpt -> pose encoder + qkv_merge processors
Every loader asserts full consumption of the checkpoint keys it accepts.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

from cvd_tpu.io.key_mapping import merge_torch_state, vae_legacy_rename
from cvd_tpu.io.torch_io import load_diffusers_folder_weights, load_torch_state


def load_sd_unet_weights(unet_params: Dict, folder: str, subfolder: str = "unet") -> Dict:
    """SD1.5 2D UNet weights into the 3D UNet (motion/epi params untouched)."""
    state = load_diffusers_folder_weights(os.path.join(folder, subfolder))
    params, consumed = merge_torch_state(unet_params, state)
    assert len(consumed) == len(state), "unconsumed SD UNet keys"
    return params


def load_vae_weights(vae_params: Dict, folder: str, subfolder: str = "vae") -> Dict:
    state = load_diffusers_folder_weights(os.path.join(folder, subfolder))
    params, consumed = merge_torch_state(vae_params, state, rename=vae_legacy_rename)
    assert len(consumed) == len(state), "unconsumed VAE keys"
    return params


def clip_rename(key: str) -> str:
    key = key.replace("text_model.", "")
    key = key.replace("embeddings.token_embedding", "token_embedding")
    key = key.replace("encoder.layers", "layers")
    if key == "embeddings.position_embedding.weight":
        return "position_embedding"  # direct param, no kernel/scale leaf
    return key


def load_clip_weights(clip_params: Dict, folder: str, subfolder: str = "text_encoder") -> Dict:
    state = load_diffusers_folder_weights(os.path.join(folder, subfolder))
    # drop projection heads if present (full CLIP checkpoints)
    state = {k: v for k, v in state.items() if "text_projection" not in k}
    params, consumed = merge_torch_state(clip_params, state, rename=clip_rename)
    assert len(consumed) == len(state), "unconsumed CLIP keys"
    return params


def load_motion_module_weights(
    unet_params: Dict, path: str,
    motion_lora_ckpt: Optional[str] = None,
    motion_lora_scale: float = 1.0,
) -> Dict:
    """AnimateDiff motion-module ckpt (inference_epi.py:100-105), with
    optional motion-LoRA (pan/zoom) fusion applied to the torch-layout
    state before import (convert_lora_safetensor_to_diffusers.py:28-49)."""
    state = load_torch_state(path)
    state = {k: v for k, v in state.items() if "motion_modules" in k or "pos_encoder" in k}
    if motion_lora_ckpt:
        from cvd_tpu.io.lora import fuse_motion_lora_into_state

        lora_raw = load_torch_state(motion_lora_ckpt)
        # AnimateDiff motion-LoRA ckpts wrap the pairs in a 'state_dict' key
        if not any(".down." in k or ".up." in k for k in lora_raw):
            lora_raw = load_torch_state(motion_lora_ckpt, sub_dict="state_dict")
        state = fuse_motion_lora_into_state(state, lora_raw, motion_lora_scale)
    params, consumed = merge_torch_state(unet_params, state)
    assert len(consumed) == len(state), "unconsumed motion-module keys"
    return params


def load_epi_module_weights(unet_params: Dict, path: str) -> Dict:
    """CVD epi ckpt: dict with 'unet_trainable_dict' (inference_epi.py:107-113)."""
    state = load_torch_state(path, sub_dict="unet_trainable_dict")
    params, consumed = merge_torch_state(unet_params, state)
    assert len(consumed) == len(state), "unconsumed epi keys"
    return params


def sparsectrl_rename(key: str) -> str:
    """Collapse the SparseCtrl ckpt's nested block paths onto the Flax
    model's flat layer names (models/sparse_controlnet.py names layers
    ``down_blocks_i_resnets_j`` etc. because the encoder copy is a single
    module, not a block hierarchy)."""
    import re

    key = re.sub(
        r"^down_blocks\.(\d+)\.(resnets|attentions|motion_modules|"
        r"downsamplers)\.(\d+)\.",
        r"down_blocks_\1_\2_\3.", key)
    key = re.sub(r"^mid_block\.(resnets|attentions)\.(\d+)\.",
                 r"mid_block_\1_\2.", key)
    return key


def load_sparse_controlnet_weights(params: Dict, path: str) -> Dict:
    """AnimateDiff SparseCtrl ckpt (v3_sd15_sparsectrl_{rgb,scribble}.ckpt)
    into SparseControlNetModel params. The reference ships the model but no
    entry point loads it (sparse_controlnet.py:316 from_unet is never
    called); this importer + the --controlnet_ckpt flag make the released
    weights actually usable. Strict: zero unconsumed keys."""
    state = load_torch_state(path)
    if not any(k.startswith(("conv_in", "down_blocks")) for k in state):
        state = load_torch_state(path, sub_dict="state_dict")
    params, consumed = merge_torch_state(params, state,
                                         rename=sparsectrl_rename)
    assert len(consumed) == len(state), "unconsumed SparseCtrl keys"
    return params


def load_pose_adaptor_weights(
    unet_params: Dict, pose_encoder_params: Dict, path: str
) -> Tuple[Dict, Dict]:
    """CameraCtrl ckpt: pose encoder + qkv_merge attention processors
    (inference_epi.py:115-123)."""
    enc_state = load_torch_state(path, sub_dict="pose_encoder_state_dict")
    pose_encoder_params, consumed = merge_torch_state(pose_encoder_params, enc_state)
    assert len(consumed) == len(enc_state), "unconsumed pose-encoder keys"

    proc_state = load_torch_state(path, sub_dict="attention_processor_state_dict")
    unet_params, consumed = merge_torch_state(unet_params, proc_state)
    assert len(consumed) == len(proc_state), "unconsumed attention-processor keys"
    return unet_params, pose_encoder_params


def load_sd_pipeline_weights(
    unet_params: Dict,
    vae_params: Dict,
    clip_params: Dict,
    sd_folder: str,
    unet_subfolder: str = "unet",
    motion_module_ckpt: Optional[str] = None,
    epi_module_ckpt: Optional[str] = None,
    pose_adaptor_ckpt: Optional[str] = None,
    pose_encoder_params: Optional[Dict] = None,
    motion_lora_ckpt: Optional[str] = None,
    motion_lora_scale: float = 1.0,
):
    """The full reference load sequence. Returns (unet, vae, clip, pose_enc)."""
    unet_params = load_sd_unet_weights(unet_params, sd_folder, unet_subfolder)
    vae_params = load_vae_weights(vae_params, sd_folder)
    clip_params = load_clip_weights(clip_params, sd_folder)
    if motion_module_ckpt:
        unet_params = load_motion_module_weights(
            unet_params, motion_module_ckpt,
            motion_lora_ckpt=motion_lora_ckpt,
            motion_lora_scale=motion_lora_scale,
        )
    if epi_module_ckpt:
        unet_params = load_epi_module_weights(unet_params, epi_module_ckpt)
    if pose_adaptor_ckpt:
        assert pose_encoder_params is not None
        unet_params, pose_encoder_params = load_pose_adaptor_weights(
            unet_params, pose_encoder_params, pose_adaptor_ckpt
        )
    return unet_params, vae_params, clip_params, pose_encoder_params
