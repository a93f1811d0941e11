"""Reading PyTorch artifacts (.ckpt/.pt via torch, .safetensors) into numpy.

The reference consumes four artifact kinds (inference_epi.py:72-145): an
SD1.5 diffusers folder, the AnimateDiff motion-module .ckpt, the CVD epi
.ckpt (dict with 'unet_trainable_dict'), and the CameraCtrl pose-adaptor
.ckpt (dicts 'pose_encoder_state_dict' + 'attention_processor_state_dict'),
plus optional civitai .safetensors/.ckpt full models.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def _to_numpy(t) -> np.ndarray:
    arr = t.detach().cpu().float().numpy() if hasattr(t, "detach") else np.asarray(t)
    return np.ascontiguousarray(arr)


def load_torch_state(path: str, sub_dict: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint or safetensors file as {key: float32 ndarray}.

    sub_dict: pull a nested state dict (e.g. 'unet_trainable_dict',
    'pose_encoder_state_dict', 'lora_state_dict', 'state_dict').
    """
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        state = {}
        with safe_open(path, framework="np") as f:
            for key in f.keys():
                state[key] = np.ascontiguousarray(f.get_tensor(key)).astype(np.float32)
        return state

    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if sub_dict is not None:
        obj = obj[sub_dict]
    elif isinstance(obj, dict) and "state_dict" in obj and all(
        not hasattr(v, "detach") for k, v in list(obj.items())[:1]
    ):
        # common wrapper
        obj = obj.get("state_dict", obj)
    return {k: _to_numpy(v) for k, v in obj.items() if hasattr(v, "detach")}


def load_diffusers_folder_weights(folder: str) -> Dict[str, np.ndarray]:
    """Load a diffusers model subfolder (prefers .safetensors, else .bin)."""
    for name in (
        "diffusion_pytorch_model.safetensors",
        "model.safetensors",
        "diffusion_pytorch_model.bin",
        "pytorch_model.bin",
    ):
        p = os.path.join(folder, name)
        if os.path.exists(p):
            return load_torch_state(p)
    raise FileNotFoundError(f"no weight file found under {folder}")
