"""Pipeline assembly for the CLIs — the get_pipeline equivalent
(inference_epi.py:72-145): build modules, load the four checkpoint kinds,
or fall back to a random-weight smoke bundle when no weights are given.
"""
from __future__ import annotations

import argparse
from typing import Optional, Tuple

import jax

from cvd_tpu.models.clip_text import CLIPTextConfig
from cvd_tpu.models.unet import UNetConfig
from cvd_tpu.models.vae import VAEConfig
from cvd_tpu.pipelines.common import PipelineModules
from cvd_tpu.schedulers import DDIMScheduler
from cvd_tpu.utils.cache import enable_compilation_cache

SMOKE_UNET = UNetConfig(
    block_out_channels=(32, 64, 64, 64),
    attention_heads=4,
    cross_attention_dim=24,
    norm_num_groups=8,
)
SMOKE_VAE = VAEConfig(block_out_channels=(32, 32, 64, 64), norm_num_groups=8)
SMOKE_CLIP = CLIPTextConfig(hidden_size=24, num_layers=2, num_heads=4, intermediate_size=48)


def add_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--ori_model_path", default=None, help="SD1.5 diffusers folder")
    p.add_argument("--unet_subfolder", default="unet", help="e.g. unet_webvidlora_v3")
    p.add_argument("--motion_module_ckpt", default=None)
    p.add_argument("--motion_lora_ckpt", default=None,
                   help="AnimateDiff motion-LoRA ckpt (pan/zoom effects), "
                        "fused into the temporal attentions at load")
    p.add_argument("--motion_lora_scale", type=float, default=1.0)
    p.add_argument("--epi_module_ckpt", default=None)
    p.add_argument("--pose_adaptor_ckpt", default=None)
    p.add_argument("--image_lora_ckpt", default=None)
    p.add_argument("--civitai_lora_ckpt", default=None)
    p.add_argument("--civitai_base_model", default=None)
    p.add_argument("--random-weights", action="store_true", dest="random_weights",
                   help="tiny random-weight smoke mode (no checkpoints needed)")
    p.add_argument("--random-weights-full", action="store_true",
                   dest="random_weights_full",
                   help="FULL-SIZE random weights (host fast-init): real "
                        "deployment shapes without checkpoint artifacts — "
                        "perf/memory validation, garbage pixels")
    p.add_argument("--pose_adaptor_scale", type=float, default=1.0)
    p.add_argument("--bf16", action="store_true", help="bfloat16 activations")
    p.add_argument("--spatial_extended_attention", action="store_true")
    p.add_argument("--image_lora_rank", type=int, default=2)
    p.add_argument("--controlnet_ckpt", default=None,
                   help="AnimateDiff SparseCtrl ckpt; imported strictly "
                        "into a SparseControlNetModel whose residuals the "
                        "UNet accepts (down/mid additional_residuals)")
    p.add_argument("--controlnet_simplified_embedding", action="store_true",
                   help="v3-RGB SparseCtrl layout: single zero-init conv "
                        "conditioning embedding over VAE latents")
    p.add_argument("--sync_lora_rank", type=int, default=0,
                   help="sync-LoRA rank on the pose-conditioned temporal "
                        "attention (reference sync_lora_kwargs; 0 = off, "
                        ">16 absolute, 1..16 resolves per layer)")
    p.add_argument("--sync_lora_scale", type=float, default=1.0)
    p.add_argument("--remat_policy", default="",
                   help="training remat checkpoint policy: '' = replay "
                        "whole blocks (min memory), 'dots' = save matmul "
                        "outputs, replay only convs/norms (faster step "
                        "when HBM allows, e.g. with --cache_latents)")
    p.add_argument("--model_config", default=None,
                   help="reference-format model config yaml")
    p.add_argument("--scan_layers", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="dedup identical UNet layers into lax.scan bodies "
                        "(~35%% faster compile, ~1 GB extra resident HBM; "
                        "measured 2026-08-19 on v5e). Default: on for "
                        "simple single-chip inference, off elsewhere")


def load_sparse_controlnet(ckpt: str, unet_cfg: UNetConfig,
                           simplified: bool = False):
    """-> (SparseControlNetModel, params). Weights come ENTIRELY from the
    ckpt (strict full-coverage import over a zeros tree), so no random init
    or compile is paid. The returned residual-producer plugs into the
    UNet's down/mid additional_residual inputs — the hooks the reference
    keeps live even though no reference entry point loads this model
    (sparse_controlnet.py:316)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cvd_tpu.io.checkpoints import load_sparse_controlnet_weights
    from cvd_tpu.models.sparse_controlnet import SparseControlNetModel

    cond_ch = 4 if simplified else 3
    model = SparseControlNetModel(
        unet_cfg, conditioning_channels=cond_ch,
        use_simplified_condition_embedding=simplified,
    )
    B, F, h = 1, 2, 8
    cr = h if simplified else 8 * h
    shapes = jax.eval_shape(
        lambda k: model.init(
            k, jnp.zeros((B, F, h, h, 4)), jnp.zeros((B,), jnp.int32),
            jnp.zeros((B, 7, unet_cfg.cross_attention_dim)),
            jnp.zeros((B, F, cr, cr, cond_ch)), jnp.zeros((B, F, cr, cr, 1)),
        ),
        jax.random.key(0),
    )
    zeros = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes
    )
    params = load_sparse_controlnet_weights(zeros, ckpt)
    # every param must have been written by the ckpt (zeros tree = no
    # silent random weights); spot-check a non-zero-init leaf
    flat = jax.tree_util.tree_leaves(params)
    assert any(float(jnp.abs(np.asarray(x)).max()) > 0 for x in flat[:50]), \
        "SparseCtrl import left the tree at zeros"
    return model, params


def build_modules(args, video_length: int, image_size: int,
                  scan_default: bool = False) -> Tuple[PipelineModules, object]:
    """-> (modules, tokenizer)."""
    import jax.numpy as jnp

    from cvd_tpu.io.tokenizer import get_tokenizer

    enable_compilation_cache()
    dtype = jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32
    scan = getattr(args, "scan_layers", None)
    scan = scan_default if scan is None else scan
    if (args.random_weights or getattr(args, "random_weights_full", False)
            or not args.ori_model_path):
        import dataclasses

        full = getattr(args, "random_weights_full", False)
        base_unet = UNetConfig() if full else SMOKE_UNET
        modules = PipelineModules.create(
            unet_config=dataclasses.replace(
                base_unet, pose_scale=args.pose_adaptor_scale, dtype=dtype,
                scan_identical_layers=scan,
                sync_lora_rank=getattr(args, "sync_lora_rank", 0),
                sync_lora_scale=getattr(args, "sync_lora_scale", 1.0),
                remat_policy=getattr(args, "remat_policy", ""),
            ),
            vae_config=dataclasses.replace(
                VAEConfig() if full else SMOKE_VAE, dtype=dtype),
            clip_config=CLIPTextConfig() if full else SMOKE_CLIP,
            latent_size=image_size // 8,
            video_length=video_length,
            fast_init=full,
        )
        return modules, get_tokenizer(None)

    import dataclasses

    # runtime (unfused) image LoRA: rank semantics from the reference
    # (unet.py:1028: rank if >16 else hidden_size // rank)
    lora_rank = 0
    if args.image_lora_ckpt:
        r = getattr(args, "image_lora_rank", 2)
        lora_rank = r if r > 16 else -r  # negative => per-layer channels//r

    scheduler = None
    pose_encoder_kwargs = None
    if getattr(args, "model_config", None):
        from cvd_tpu.io.model_config import load_model_config

        unet_cfg, pose_encoder_kwargs, scheduler, _extra = load_model_config(
            args.model_config, dtype=dtype, F_mat_size=image_size
        )
        unet_cfg = dataclasses.replace(
            unet_cfg,
            pose_scale=args.pose_adaptor_scale,
            spatial_extended_attention=getattr(args, "spatial_extended_attention", False),
            spatial_lora_rank=lora_rank,
            scan_identical_layers=scan,
            sync_lora_rank=getattr(args, "sync_lora_rank", 0),
            sync_lora_scale=getattr(args, "sync_lora_scale", 1.0),
            remat_policy=getattr(args, "remat_policy", ""),
        )
    else:
        unet_cfg = UNetConfig(
            pose_scale=args.pose_adaptor_scale,
            spatial_extended_attention=getattr(args, "spatial_extended_attention", False),
            spatial_lora_rank=lora_rank,
            scan_identical_layers=scan,
            sync_lora_rank=getattr(args, "sync_lora_rank", 0),
            sync_lora_scale=getattr(args, "sync_lora_scale", 1.0),
            remat_policy=getattr(args, "remat_policy", ""),
            dtype=dtype,
        )
    modules = PipelineModules.create(
        unet_config=unet_cfg,
        vae_config=dataclasses.replace(VAEConfig(), dtype=dtype),
        clip_config=CLIPTextConfig(),
        pose_encoder_kwargs=pose_encoder_kwargs,
        scheduler=scheduler,
        latent_size=image_size // 8,
        video_length=video_length,
    )

    from cvd_tpu.io.checkpoints import load_sd_pipeline_weights

    (
        modules.unet_params,
        modules.vae_params,
        modules.clip_params,
        modules.pose_encoder_params,
    ) = load_sd_pipeline_weights(
        modules.unet_params,
        modules.vae_params,
        modules.clip_params,
        args.ori_model_path,
        unet_subfolder=args.unet_subfolder,
        motion_module_ckpt=args.motion_module_ckpt,
        epi_module_ckpt=args.epi_module_ckpt,
        pose_adaptor_ckpt=args.pose_adaptor_ckpt,
        pose_encoder_params=modules.pose_encoder_params,
        motion_lora_ckpt=getattr(args, "motion_lora_ckpt", None),
        motion_lora_scale=getattr(args, "motion_lora_scale", 1.0),
    )

    if args.image_lora_ckpt:
        # runtime image LoRA (inference_epi.py:91-98); keys map mechanically
        # ('processor.to_q_lora.down' -> attn/to_q_lora/down)
        import torch as _torch

        from cvd_tpu.io.key_mapping import merge_torch_state
        from cvd_tpu.io.torch_io import load_torch_state

        raw = _torch.load(args.image_lora_ckpt, map_location="cpu", weights_only=False)
        sub = "lora_state_dict" if isinstance(raw, dict) and "lora_state_dict" in raw else None
        state = load_torch_state(args.image_lora_ckpt, sub_dict=sub)
        modules.unet_params, consumed = merge_torch_state(modules.unet_params, state)
        assert len(consumed) == len(state), "unconsumed image-LoRA keys"

    if getattr(args, "controlnet_ckpt", None):
        modules.controlnet = load_sparse_controlnet(
            args.controlnet_ckpt, unet_cfg,
            simplified=getattr(args, "controlnet_simplified_embedding", False),
        )

    if args.civitai_base_model:
        from cvd_tpu.io.ldm_convert import load_civitai_base_model

        load_civitai_base_model(modules, args.civitai_base_model)
    if args.civitai_lora_ckpt:
        from cvd_tpu.io.ldm_convert import apply_civitai_lora

        apply_civitai_lora(modules, args.civitai_lora_ckpt)

    return modules, get_tokenizer(args.ori_model_path)


def validate_ckpts(args) -> int:
    """--validate-ckpts dry run: route every checkpoint key (from the real
    files when paths are given, else the built-in manifests) onto the
    full-size Flax parameter trees WITHOUT allocating or loading weights.
    Prints one line per artifact; non-zero exit on any unmapped key."""
    from cvd_tpu.io import manifests as M
    from cvd_tpu.io.key_mapping import merge_torch_state, vae_legacy_rename
    from cvd_tpu.pipelines.common import abstract_param_shapes

    shapes = abstract_param_shapes()
    failures = 0

    def check(name, tree, state, **kw):
        nonlocal failures
        try:
            _, consumed = merge_torch_state(tree, state, strict=True,
                                            dry_run=True, **kw)
            extra = len(state) - len(consumed)
            status = "ok" if extra == 0 else f"{extra} keys unconsumed"
            failures += extra != 0
        except KeyError as e:
            status = str(e).splitlines()[0].strip("'")
            failures += 1
        print(f"[validate-ckpts] {name}: {len(state)} keys -> {status}")

    def file_state(path, sub=None):
        from cvd_tpu.io.torch_io import load_torch_state

        return load_torch_state(path, sub_dict=sub)

    from cvd_tpu.io.checkpoints import clip_rename

    if args.ori_model_path:
        import os

        from cvd_tpu.io.torch_io import load_diffusers_folder_weights

        sub = args.unet_subfolder or "unet"
        check("unet (folder)", shapes["unet"],
              load_diffusers_folder_weights(os.path.join(args.ori_model_path, sub)))
        check("vae (folder)", shapes["vae"],
              load_diffusers_folder_weights(os.path.join(args.ori_model_path, "vae")),
              rename=vae_legacy_rename)
        check("text_encoder (folder)", shapes["clip"],
              load_diffusers_folder_weights(
                  os.path.join(args.ori_model_path, "text_encoder")),
              rename=clip_rename)
    else:
        check("unet (manifest)", shapes["unet"], M.zeros_state(M.sd15_unet_manifest()))
        check("vae (manifest)", shapes["vae"], M.zeros_state(M.sd15_vae_manifest()),
              rename=vae_legacy_rename)
        check("text_encoder (manifest)", shapes["clip"],
              M.zeros_state(M.sd15_clip_manifest()), rename=clip_rename)

    check("motion module", shapes["unet"],
          file_state(args.motion_module_ckpt) if args.motion_module_ckpt
          else M.zeros_state(M.animatediff_v3_mm_manifest()))
    check("epi module", shapes["unet"],
          file_state(args.epi_module_ckpt, "unet_trainable_dict")
          if args.epi_module_ckpt
          else M.zeros_state(M.cvd_epi_ckpt_manifest()))
    if args.pose_adaptor_ckpt:
        check("pose encoder", shapes["pose"],
              file_state(args.pose_adaptor_ckpt, "pose_encoder_state_dict"))
        check("pose qkv_merge", shapes["unet"],
              file_state(args.pose_adaptor_ckpt,
                         "attention_processor_state_dict"))
    else:
        check("pose encoder", shapes["pose"],
              M.zeros_state(M.cameractrl_pose_encoder_manifest()))
        check("pose qkv_merge", shapes["unet"],
              M.zeros_state(M.cameractrl_attention_processor_manifest()))
    print(f"[validate-ckpts] {'FAILED' if failures else 'all artifacts map cleanly'}")
    return 1 if failures else 0


def main():
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    p.add_argument("--validate-ckpts", action="store_true", dest="validate",
                   help="dry-run checkpoint key routing against the "
                        "full-size parameter shapes (no weights loaded)")
    args = p.parse_args()
    if args.validate:
        raise SystemExit(validate_ckpts(args))
    p.error("nothing to do (pass --validate-ckpts)")


if __name__ == "__main__":
    main()
