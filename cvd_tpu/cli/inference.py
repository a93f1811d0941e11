"""2-view inference CLI — the reference's ``inference_epi.py`` equivalent.

    python -m cvd_tpu.cli.inference \
        --ori_model_path <sd folder> --unet_subfolder unet_webvidlora_v3 \
        --motion_module_ckpt ... --epi_module_ckpt ... --pose_adaptor_ckpt ... \
        --caption_file prompts.json --pose_file_0 a.txt --pose_file_1 b.txt \
        --out_root results/

Smoke mode (no checkpoints): add --random-weights.
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def load_prompts(caption_file: str, use_negative: bool, num_videos=None):
    if caption_file.endswith(".json"):
        data = json.load(open(caption_file))
        captions = data.get("captions", data.get("prompts"))
        if isinstance(captions[0], dict):
            captions = [c["caption"] for c in captions]
        negatives = data.get("negative_prompts") if use_negative else None
        if negatives is not None and len(negatives) != len(captions):
            # fail at load, not mid-run after minutes of sampling
            raise SystemExit(
                f"--use_negative_prompt: negative_prompts has "
                f"{len(negatives)} entries but captions has {len(captions)}"
            )
        seeds = data.get("seeds")
    else:
        captions = [l.strip() for l in open(caption_file) if l.strip()]
        negatives, seeds = None, None
    if num_videos:
        captions = captions * num_videos
        negatives = negatives * num_videos if negatives else None
    return captions, negatives, seeds


def main(args):
    from cvd_tpu.cli.build import build_modules
    from cvd_tpu.data.validation import ValRealEstate10KPoseFolded
    from cvd_tpu.pipelines.simple import SimplePipeline
    from cvd_tpu.utils.logging import setup_logger
    from cvd_tpu.utils.video import save_video, save_video_as_images, save_videos_grid

    logger = setup_logger(args.out_root)
    if args.image_width != args.image_height:
        raise SystemExit(
            f"--image_width {args.image_width} != --image_height "
            f"{args.image_height}: the epipolar attention mask assumes a "
            "square token grid (reference parity — epi_module.py:294-299 "
            "derives feat_size from sqrt(tokens)); use a square resolution"
        )
    captions, negatives, seeds = load_prompts(
        args.caption_file, args.use_negative_prompt, args.num_videos
    )

    logger.info("building pipeline")
    # scan-layers defaults ON for single-chip simple inference (35% faster
    # compile at zero step cost, measured 2026-08-19); sharded sampling
    # keeps the ~1 GB of stacked-param HBM instead (--scan_layers to force)
    pab_config = None
    if args.pab and args.sharded:
        raise SystemExit("--pab + --sharded is not validated; pick one")
    if args.pab:
        from cvd_tpu.pipelines.pab import PABConfig

        pab_config = (PABConfig.from_string(args.pab_ranges)
                      if args.pab_ranges else PABConfig())
        logger.info(f"PAB enabled: {pab_config}")
    modules, tokenizer = build_modules(
        args, args.video_length, args.image_height,
        # PAB caches are per-layer state the scan-dedup body can't carry
        scan_default=not (args.sharded or args.pab),
    )
    if args.bf16:
        # bf16 weights for inference: halves the resident bundle and the
        # per-step weight HBM traffic (reference deploys fp16 weights,
        # inference_epi.py:160)
        modules.cast_params()
    mesh = None
    if args.sharded:
        from cvd_tpu.parallel import inference_mesh

        mesh = inference_mesh(len(jax.devices()))
        logger.info(f"sharded sampling over mesh {dict(mesh.shape)}")
    pipe = SimplePipeline(
        modules,
        F_mat_size=args.image_height,
        rand_slope_ff=True,
        mesh=mesh,
    )

    # total frames with multidiff sliding windows (reference
    # pipeline_animation_epi.py:548 — window length = --video_length)
    F_total = (
        args.multidiff_total_steps * (args.video_length - args.multidiff_overlaps)
        + args.multidiff_overlaps
        if args.multidiff_total_steps > 1
        else args.video_length
    )
    dataset = ValRealEstate10KPoseFolded(
        validation_prompts=captions,
        validation_negative_prompts=negatives,
        pose_file_0=args.pose_file_0,
        pose_file_1=args.pose_file_1,
        sample_n_frames=F_total,
        sample_size=args.image_height,
        zero_first_frame_scale=args.zero_first_frame_scale,
    )

    for idx in range(len(dataset)):
        sample = dataset[idx]
        seed = seeds[idx] if (seeds and args.use_specific_seeds) else args.global_seed + idx
        prompt_ids = jnp.asarray(tokenizer([sample["validation_prompt"]]))
        neg = sample.get("validation_negative_prompt", "")
        neg_ids = jnp.asarray(tokenizer([neg]))
        plucker = jnp.asarray(sample["plucker_embedding"], jnp.float32).reshape(
            2, F_total, args.image_height, args.image_height, 6
        )
        F_mats = jnp.asarray(sample["F_mats"], jnp.float32).reshape(2, F_total, 3, 3)

        logger.info(f"[{idx}] {sample['validation_prompt']!r} seed={seed}")
        videos = np.asarray(
            pipe(
                prompt_ids, neg_ids, plucker, F_mats,
                num_inference_steps=args.num_inference_steps,
                guidance_scale=args.guidance_scale,
                rng=jax.random.key(seed),
                multidiff_total_steps=args.multidiff_total_steps,
                multidiff_overlaps=args.multidiff_overlaps,
                window_length=args.video_length,
                pab_config=pab_config,
            )
        )  # [2, F, H, W, 3]

        out = os.path.join(args.out_root, str(idx))
        img_root = os.path.join(out, "imgs")
        os.makedirs(img_root, exist_ok=True)
        for v in range(2):
            save_video_as_images(videos[v], os.path.join(img_root, str(v)))
            save_video(videos[v], os.path.join(out, "vids", f"{v}.mp4"))
        side = np.concatenate([videos[0], videos[1]], axis=2)  # horizontal
        save_video(side, os.path.join(out, "vids", "horizontal.mp4"))
        save_videos_grid(videos, os.path.join(out, "vids", "vertical.mp4"), n_rows=2)
        if args.save_trajectory:
            from cvd_tpu.utils.visualize import save_trajectory_plot

            save_trajectory_plot(
                sample["ret_c2w"], os.path.join(out, "poses"), args.video_length
            )
    logger.info("done")


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    from cvd_tpu.cli.build import add_model_args

    p.add_argument("--out_root", required=True)
    p.add_argument("--image_height", type=int, default=256)
    p.add_argument("--image_width", type=int, default=256)
    p.add_argument("--video_length", type=int, default=16)
    add_model_args(p)
    p.add_argument("--num_inference_steps", type=int, default=25)
    p.add_argument(
        "--multidiff_total_steps", type=int, default=1,
        help="sliding denoise windows for videos longer than --video_length "
             "(total frames = steps*(video_length-overlaps)+overlaps)",
    )
    p.add_argument("--multidiff_overlaps", type=int, default=12)
    p.add_argument("--guidance_scale", type=float, default=8.5)
    p.add_argument("--caption_file", required=True)
    p.add_argument("--use_negative_prompt", action="store_true")
    p.add_argument("--use_specific_seeds", action="store_true")
    p.add_argument("--zero_first_frame_scale", action="store_true", default=True,
                   help="identity-first relative pose normalization (the "
                        "default; reference launch scripts always pass it)")
    p.add_argument("--preserve_first_frame_scale", dest="zero_first_frame_scale",
                   action="store_false",
                   help="keep the first camera's distance from the world "
                        "origin (CameraCtrl get_relative_pose semantics, "
                        "inference_epi_advanced.py:55-72)")
    p.add_argument("--global_seed", type=int, default=1024)
    p.add_argument("--pose_file_0", required=True)
    p.add_argument("--pose_file_1", required=True)
    p.add_argument("--num_videos", type=int, default=None)
    p.add_argument("--no_lora_validation", action="store_true")
    p.add_argument("--save_trajectory", action="store_true")
    p.add_argument("--sharded", action="store_true",
                   help="shard sampling over all local devices "
                        "(rows x frames mesh; kernels stay active per shard)")
    p.add_argument("--pab", action="store_true",
                   help="Pyramid Attention Broadcast: reuse cached attention "
                        "outputs on statically scheduled mid-trajectory "
                        "steps (speed/quality trade; see pipelines/pab.py)")
    p.add_argument("--pab_ranges", type=str, default="",
                   help="e.g. 'spatial=2,cross=3,temporal=2,epi=1'")
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
