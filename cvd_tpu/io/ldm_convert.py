"""LDM/CompVis (civitai) checkpoint -> diffusers-layout state dicts.

Re-implementation of the standard SD conversion used by the reference
(animatediff/utils/convert_from_ckpt.py: convert_ldm_unet_checkpoint :328,
convert_ldm_vae_checkpoint :559, convert_ldm_clip_checkpoint :716) as pure
key renames over numpy dicts, feeding the same merge_torch_state importer.
Covers SD1.x single-file .safetensors/.ckpt models (civitai_base_model,
inference_epi.py:49-69).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from cvd_tpu.io.key_mapping import merge_torch_state, vae_legacy_rename
from cvd_tpu.io.torch_io import load_torch_state

_RES_MAP = {
    "in_layers.0": "norm1",
    "in_layers.2": "conv1",
    "emb_layers.1": "time_emb_proj",
    "out_layers.0": "norm2",
    "out_layers.3": "conv2",
    "skip_connection": "conv_shortcut",
}


def _rename_resnet(rest: str) -> str:
    for old, new in _RES_MAP.items():
        if rest.startswith(old):
            return new + rest[len(old):]
    raise KeyError(rest)


def convert_ldm_unet_state(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """'model.diffusion_model.*' -> diffusers UNet2DConditionModel keys."""
    src = {
        k[len("model.diffusion_model."):]: v
        for k, v in state.items()
        if k.startswith("model.diffusion_model.")
    }
    out: Dict[str, np.ndarray] = {}
    for k, v in src.items():
        if k.startswith("time_embed.0."):
            out["time_embedding.linear_1." + k.split(".")[-1]] = v
        elif k.startswith("time_embed.2."):
            out["time_embedding.linear_2." + k.split(".")[-1]] = v
        elif k.startswith("input_blocks.0.0."):
            out["conv_in." + k.split(".")[-1]] = v
        elif k.startswith("out.0."):
            out["conv_norm_out." + k.split(".")[-1]] = v
        elif k.startswith("out.2."):
            out["conv_out." + k.split(".")[-1]] = v
        elif k.startswith("input_blocks."):
            parts = k.split(".")
            i, sub = int(parts[1]), int(parts[2])
            rest = ".".join(parts[3:])
            block, j = (i - 1) // 3, (i - 1) % 3
            if j == 2:  # downsample at input_blocks 3, 6, 9
                assert rest.startswith("op.")
                out[f"down_blocks.{block}.downsamplers.0.conv." + rest[len("op."):]] = v
            elif sub == 0:
                out[f"down_blocks.{block}.resnets.{j}." + _rename_resnet(rest)] = v
            else:
                out[f"down_blocks.{block}.attentions.{j}." + rest] = v
        elif k.startswith("middle_block."):
            parts = k.split(".")
            sub = int(parts[1])
            rest = ".".join(parts[2:])
            if sub == 0:
                out["mid_block.resnets.0." + _rename_resnet(rest)] = v
            elif sub == 1:
                out["mid_block.attentions.0." + rest] = v
            else:
                out["mid_block.resnets.1." + _rename_resnet(rest)] = v
        elif k.startswith("output_blocks."):
            parts = k.split(".")
            i, sub = int(parts[1]), int(parts[2])
            rest = ".".join(parts[3:])
            block, j = i // 3, i % 3
            if sub == 0:
                out[f"up_blocks.{block}.resnets.{j}." + _rename_resnet(rest)] = v
            elif rest.startswith("conv."):  # upsampler (last layer of blocks 2,5,8)
                out[f"up_blocks.{block}.upsamplers.0." + rest] = v
            else:
                out[f"up_blocks.{block}.attentions.{j}." + rest] = v
        else:
            raise KeyError(f"unhandled LDM unet key {k}")
    return out


_VAE_RES = {"nin_shortcut": "conv_shortcut"}


def _vae_rest(rest: str) -> str:
    for old, new in _VAE_RES.items():
        rest = rest.replace(old, new)
    return rest


def convert_ldm_vae_state(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """'first_stage_model.*' -> diffusers AutoencoderKL keys."""
    src = {
        k[len("first_stage_model."):]: v
        for k, v in state.items()
        if k.startswith("first_stage_model.")
    }
    # number of decoder up levels for index reversal
    n_up = 1 + max(
        (int(k.split(".")[2]) for k in src if k.startswith("decoder.up.")), default=-1
    )
    out: Dict[str, np.ndarray] = {}
    for k, v in src.items():
        parts = k.split(".")
        if k.startswith(("quant_conv.", "post_quant_conv.")):
            out[k] = v
        elif parts[1] == "conv_in" or parts[1] == "conv_out":
            out[k] = v
        elif parts[1] == "norm_out":
            out[f"{parts[0]}.conv_norm_out.{parts[-1]}"] = v
        elif parts[1] == "mid":
            rest = _vae_rest(".".join(parts[3:]))
            if parts[2] == "block_1":
                out[f"{parts[0]}.mid_block.resnets.0.{rest}"] = v
            elif parts[2] == "block_2":
                out[f"{parts[0]}.mid_block.resnets.1.{rest}"] = v
            else:  # attn_1 (legacy q/k/v/norm names; importer renames them)
                # CompVis calls the out-projection 'proj_out'; route it to
                # the diffusers-legacy 'proj_attn' that vae_legacy_rename
                # already maps to to_out.0 (convert_from_ckpt.py:142-143)
                if rest.startswith("proj_out."):
                    rest = "proj_attn." + rest[len("proj_out."):]
                out[f"{parts[0]}.mid_block.attentions.0.{rest}"] = v
        elif parts[1] == "down":
            i = int(parts[2])
            if parts[3] == "block":
                rest = _vae_rest(".".join(parts[5:]))
                out[f"encoder.down_blocks.{i}.resnets.{parts[4]}.{rest}"] = v
            else:  # downsample.conv
                out[f"encoder.down_blocks.{i}.downsamplers.0.conv.{parts[-1]}"] = v
        elif parts[1] == "up":
            i = n_up - 1 - int(parts[2])  # LDM reverses decoder block order
            if parts[3] == "block":
                rest = _vae_rest(".".join(parts[5:]))
                out[f"decoder.up_blocks.{i}.resnets.{parts[4]}.{rest}"] = v
            else:  # upsample.conv
                out[f"decoder.up_blocks.{i}.upsamplers.0.conv.{parts[-1]}"] = v
        else:
            raise KeyError(f"unhandled LDM vae key {k}")
    return out


def convert_ldm_clip_state(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """'cond_stage_model.transformer.*' -> HF CLIPTextModel keys."""
    out = {}
    for k, v in state.items():
        if k.startswith("cond_stage_model.transformer."):
            out[k[len("cond_stage_model.transformer."):]] = v
    return out


def load_civitai_base_model(modules, path: str) -> None:
    """Swap the SD base (UNet spatial weights + VAE + CLIP) from a civitai
    single-file model, like load_civitai_base_model (inference_epi.py:49-69)."""
    from cvd_tpu.io.checkpoints import clip_rename

    state = load_torch_state(path)
    unet_state = convert_ldm_unet_state(state)
    modules.unet_params, consumed = merge_torch_state(modules.unet_params, unet_state)
    assert len(consumed) == len(unet_state)
    vae_state = convert_ldm_vae_state(state)
    modules.vae_params, consumed = merge_torch_state(
        modules.vae_params, vae_state, rename=vae_legacy_rename
    )
    assert len(consumed) == len(vae_state)
    clip_state = convert_ldm_clip_state(state)
    clip_state = {k: v for k, v in clip_state.items() if "text_projection" not in k}
    if clip_state:
        modules.clip_params, consumed = merge_torch_state(
            modules.clip_params, clip_state, rename=clip_rename
        )
        assert len(consumed) == len(clip_state)


def apply_civitai_lora(modules, path: str, alpha: float = 0.6) -> None:
    """Fuse a kohya-format LoRA into the pipeline weights
    (pipe.load_lora_weights path, inference_epi.py:138-139)."""
    from cvd_tpu.io.key_mapping import export_torch_state
    from cvd_tpu.io.lora import fuse_kohya_lora_into_pipeline

    lora = load_torch_state(path)
    unet_state = export_torch_state(modules.unet_params)
    te_state = export_torch_state(modules.clip_params, prefix="text_model.")
    fused = fuse_kohya_lora_into_pipeline(unet_state, te_state, lora, alpha)
    modules.unet_params, _ = merge_torch_state(modules.unet_params, fused["unet"])
