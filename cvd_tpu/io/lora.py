"""LoRA weight fusion as pure state-dict transforms (torch layout, numpy).

Covers the reference's two LoRA paths:
* ``tools/merge_lora2unet.py``: offline fuse of the AnimateDiffV3 image
  ("webvid") adapter into SD1.5 UNet attention weights — W += up @ down * scale
  for to_q/to_k/to_v/to_out.0 (merge_lora2unet.py:36-49).
* kohya/civitai LoRA fusion into a full pipeline state
  (animatediff/utils/convert_lora_safetensor_to_diffusers.py:52-154).

All transforms run before merge_torch_state, so downstream import is
unchanged.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

_ATTN_KEYS = ("to_q", "to_k", "to_v", "to_out.0")


def fuse_lora_into_unet_state(
    unet_state: Dict[str, np.ndarray],
    lora_state: Dict[str, np.ndarray],
    scale: float = 1.0,
) -> Dict[str, np.ndarray]:
    """merge_lora2unet semantics: for every attention projection with a LoRA
    pair, W += up @ down * scale. LoRA keys follow the attn-processor naming
    '<attn_path>.processor.<proj>_lora.{down,up}.weight' with proj in
    to_q/to_k/to_v/to_out (merge_lora2unet.py:40-46)."""
    out = dict(unet_state)
    fused = 0
    for key in list(unet_state.keys()):
        if not key.endswith(".weight"):
            continue
        for proj in _ATTN_KEYS:
            suffix = f".{proj}.weight"
            if not key.endswith(suffix):
                continue
            proj_flat = proj.replace(".0", "")  # to_out.0 -> to_out
            base = key[: -len(suffix)]
            down_key = f"{base}.processor.{proj_flat}_lora.down.weight"
            up_key = f"{base}.processor.{proj_flat}_lora.up.weight"
            if down_key in lora_state and up_key in lora_state:
                delta = lora_state[up_key] @ lora_state[down_key]
                out[key] = unet_state[key] + scale * delta.astype(unet_state[key].dtype)
                fused += 1
    if fused == 0 and lora_state:
        raise KeyError("no LoRA pairs matched the UNet state dict")
    return out


def fuse_kohya_lora_into_pipeline(
    unet_state: Dict[str, np.ndarray],
    text_encoder_state: Optional[Dict[str, np.ndarray]],
    lora_state: Dict[str, np.ndarray],
    alpha: float = 0.6,
) -> Dict[str, Dict[str, np.ndarray]]:
    """civitai/kohya LoRA fusion (convert_lora, reference :52-154):

    keys 'lora_unet_<path>.lora_{down,up}.weight' (+ optional '.alpha')
    with '_' separators; W += alpha * (a/rank) * up @ down, flattening conv
    1x1 LoRA matrices when needed.
    """
    unet_state = dict(unet_state)
    text_encoder_state = dict(text_encoder_state or {})
    visited = set()
    for key in lora_state:
        if ".alpha" in key or key in visited or "lora_down" not in key:
            continue
        up_key = key.replace("lora_down", "lora_up")
        alpha_key = key.split(".")[0] + ".alpha"

        if key.startswith("lora_te_"):
            target, prefix = text_encoder_state, "lora_te_"
        else:
            target, prefix = unet_state, "lora_unet_"
        diff_key = _kohya_to_diffusers(key[len(prefix):].split(".")[0], target)
        if diff_key is None:
            raise KeyError(f"cannot map kohya LoRA key {key}")

        down = lora_state[key].astype(np.float32)
        up = lora_state[up_key].astype(np.float32)
        rank = down.shape[0]
        a = float(lora_state[alpha_key]) / rank if alpha_key in lora_state else 1.0

        W = target[diff_key]
        if W.ndim == 4:  # conv: fuse on flattened in-channels
            delta = (up.reshape(up.shape[0], -1) @ down.reshape(down.shape[0], -1))
            delta = delta.reshape(W.shape)
        else:
            delta = up @ down
        target[diff_key] = W + alpha * a * delta.astype(W.dtype)
        visited.update({key, up_key})
    return {"unet": unet_state, "text_encoder": text_encoder_state}


def _kohya_to_diffusers(flat: str, target: Dict[str, np.ndarray]) -> Optional[str]:
    """Resolve a kohya '_'-joined module path against real state-dict keys."""
    parts = flat.split("_")
    for split in range(len(parts), 0, -1):
        # try progressively re-joining underscores into dots
        candidate = ".".join(parts) + ".weight"
        if candidate in target:
            return candidate
        # greedy: replace '_' with '.' where a digit follows, else keep
        break
    # robust fallback: normalize both sides by stripping separators
    want = flat.replace("_", "") + ".weight"
    matches = [k for k in target if k.replace(".", "").replace("_", "") == want.replace(".", "")]
    return matches[0] if len(matches) == 1 else None


def fuse_motion_lora_into_state(
    target_state: Dict[str, np.ndarray],
    lora_state: Dict[str, np.ndarray],
    scale: float = 1.0,
) -> Dict[str, np.ndarray]:
    """AnimateDiff motion-LoRA fusion (pan/zoom effect checkpoints) —
    ``convert_motion_lora_ckpt_to_diffusers`` semantics
    (animatediff/utils/convert_lora_safetensor_to_diffusers.py:28-49):
    every ``.down.`` key pairs with its ``.up.`` twin and fuses directly
    into the temporal-attention projection it names:

        model_key = key without 'processor.', '_lora', 'down.', 'up.'
                    (+ 'to_out.' -> 'to_out.0.')
        W[model_key] += scale * up @ down

    Runs on the torch-layout motion-module state dict BEFORE import, so
    inference carries zero LoRA compute; the fusion-time ``scale`` replaces
    the reference's runtime ``motion_lora_scale`` threading
    (unet_blocks.py:274-279) — same math, applied once at load."""
    out = dict(target_state)
    fused = 0
    for key in lora_state:
        if "up." in key:
            continue
        up_key = key.replace(".down.", ".up.")
        model_key = (key.replace("processor.", "").replace("_lora", "")
                     .replace("down.", "").replace("up.", "")
                     .replace("to_out.", "to_out.0."))
        if model_key not in out:
            raise KeyError(
                f"motion-LoRA key {key} resolves to {model_key}, absent "
                "from the motion-module state dict"
            )
        delta = lora_state[up_key].astype(np.float32) @ \
            lora_state[key].astype(np.float32)
        out[model_key] = (
            out[model_key].astype(np.float32) + scale * delta
        ).astype(target_state[model_key].dtype)
        fused += 1
    if fused == 0 and lora_state:
        raise KeyError("no motion-LoRA pairs matched the state dict")
    return out
