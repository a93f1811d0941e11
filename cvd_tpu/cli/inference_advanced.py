"""N-view inference CLI — the reference's ``inference_epi_advanced.py``.

Procedural camera patterns (circle / upper_hemi / interpolate), multistep
recurrent denoising, accumulate-step pair averaging, NeRF transforms.json
export (OpenCV -> OpenGL conversion, reference :362-410).
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_cameras(args):
    from cvd_tpu.geometry.trajectories import (
        circle_trajectory,
        default_intrinsics,
        interpolate_trajectories,
        upper_hemi_trajectory,
    )

    fn = {
        "circle": circle_trajectory,
        "upper_hemi": upper_hemi_trajectory,
        "interpolate": interpolate_trajectories,
    }[args.cam_pattern]
    c2ws = fn(args.view_num, args.video_length, args.camera_dist, args.cam_perturb_traj)
    K = default_intrinsics(args.view_num, args.video_length, args.image_height, args.image_width)
    return c2ws, K


def export_transforms_json(path, intrinsics, c2ws, frames, args):
    """NeRF-style transforms.json with OpenCV->OpenGL axes flip (:362-410)."""
    data = {
        "fl_x": float(intrinsics[0, 0]),
        "fl_y": float(intrinsics[0, 1]),
        "cx": float(intrinsics[0, 2]),
        "cy": float(intrinsics[0, 3]),
        "w": args.image_width,
        "h": args.image_height,
        "camera_model": "PINHOLE",
        "frames": [],
    }
    for file_path, c2w in frames:
        c2w = np.array(c2w, np.float64).copy()
        c2w[:3, 1] *= -1
        c2w[:3, 2] *= -1
        data["frames"].append(
            {"file_path": file_path, "transform_matrix": c2w.tolist()}
        )
    with open(path, "w") as f:
        json.dump(data, f, indent=4)


def main(args):
    from cvd_tpu.cli.build import build_modules
    from cvd_tpu.cli.inference import load_prompts
    from cvd_tpu.geometry.plucker import ray_condition
    from cvd_tpu.pipelines.advanced import AdvancedPipeline
    from cvd_tpu.utils.logging import setup_logger
    from cvd_tpu.utils.video import save_video, save_video_as_images

    logger = setup_logger(args.out_root)
    if args.image_width != args.image_height:
        raise SystemExit(
            f"--image_width {args.image_width} != --image_height "
            f"{args.image_height}: the epipolar attention mask assumes a "
            "square token grid (reference parity — epi_module.py:294-299); "
            "use a square resolution"
        )
    if args.view_num % 2 != 0:
        raise SystemExit(
            f"--view_num {args.view_num} must be even: the per-step random "
            "pairing is a perfect matching across views "
            "(pipeline_animation_epi_advanced.py:621-633)"
        )
    captions, negatives, seeds = load_prompts(
        args.caption_file, args.use_negative_prompt
    )

    c2ws, K = build_cameras(args)  # [V*F, 4, 4], [V*F, 3, 3]
    intr = np.stack([K[:, 0, 0], K[:, 1, 1], K[:, 0, 2], K[:, 1, 2]], -1).astype(np.float32)
    V, F = args.view_num, args.video_length
    plucker = np.asarray(
        ray_condition(
            intr[None], c2ws[None].astype(np.float32),
            args.image_height, args.image_width,
        )[0]
    ).reshape(V, F, args.image_height, args.image_width, 6)

    logger.info("building pipeline")
    modules, tokenizer = build_modules(args, F, args.image_height)
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
    pab_config = None
    if args.pab:
        if args.sharded:
            raise SystemExit("--pab + --sharded is not validated; pick one")
        from cvd_tpu.pipelines.pab import PABConfig

        pab_config = (PABConfig.from_string(args.pab_ranges)
                      if args.pab_ranges else PABConfig())
        logger.info(f"PAB enabled: {pab_config}")
    pipe = AdvancedPipeline(
        modules,
        F_mat_size=args.image_height,
        rand_slope_ff=True,
        mono_direction=args.mono_direction,
        fix_firstframe=args.fix_firstframe,
        mesh=mesh,
    )
    for seed_id in range(args.multiseed):
        for idx, prompt in enumerate(captions):
            # per-prompt negative (inference_epi_advanced.py:444,269-272)
            neg_ids = jnp.asarray(
                tokenizer([negatives[idx] if negatives else ""])
            )
            sub = os.path.join(args.out_root, f"{seed_id}_{idx:04d}")
            os.makedirs(sub, exist_ok=True)
            seed = (
                seeds[idx] if (seeds and args.use_specific_seeds) else 42 + seed_id * 1000 + idx
            )
            logger.info(f"[seed {seed_id} prompt {idx}] {prompt!r}")
            videos = np.asarray(
                pipe(
                    jnp.asarray(tokenizer([prompt])), neg_ids,
                    jnp.asarray(plucker, jnp.float32),
                    c2w=jnp.asarray(c2ws, jnp.float32),
                    K_mats=jnp.asarray(K, jnp.float32),
                    num_inference_steps=args.num_inference_steps,
                    guidance_scale=args.guidance_scale,
                    multistep=args.multistep,
                    accumulate_step=args.accumulate_step,
                    rng=jax.random.key(seed),
                    step_chunk=args.step_chunk,
                    pab_config=pab_config,
                )
            )  # [V, F, H, W, 3]

            stacked = videos.transpose(1, 0, 2, 3, 4).reshape(
                F, V * args.image_height, args.image_width, 3
            )
            save_video(stacked, os.path.join(sub, "video.gif"))
            save_video(stacked, os.path.join(sub, "video.mp4"))

            frames_meta = []
            for v in range(V):
                paths = save_video_as_images(
                    videos[v], os.path.join(sub, "images", str(v))
                )
                for i, p in enumerate(paths):
                    frames_meta.append(
                        (os.path.relpath(p, sub), c2ws[v * F + i])
                    )
            export_transforms_json(
                os.path.join(sub, "transforms.json"), intr, c2ws, frames_meta, args
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
    p.add_argument("--guidance_scale", type=float, default=8.5)
    p.add_argument("--caption_file", required=True)
    p.add_argument("--use_negative_prompt", action="store_true",
                   help="read per-prompt negative_prompts from the caption "
                        "json (inference_epi_advanced.py:444)")
    p.add_argument("--use_specific_seeds", action="store_true")
    p.add_argument("--zero_first_frame_scale", action="store_true", default=True,
                   help="identity-first pose normalization; procedural "
                        "trajectories start at identity so both settings "
                        "coincide here (as in the reference, whose "
                        "get_relative_pose is never called on this path)")
    p.add_argument("--view_num", type=int, default=4)
    p.add_argument("--multistep", type=int, default=3)
    p.add_argument("--accumulate_step", type=int, default=1)
    p.add_argument("--step_chunk", type=int, default=None,
                   help="execute the denoise scan as ceil(steps/N) runs of "
                        "one compiled chunk program (identical outputs; "
                        "keeps single device-program executions short for "
                        "long multistep*accumulate schedules)")
    p.add_argument("--multiseed", type=int, default=1)
    p.add_argument("--cam_pattern", choices=["circle", "upper_hemi", "interpolate"],
                   default="circle")
    p.add_argument("--camera_dist", type=float, default=1.0)
    p.add_argument("--cam_perturb_traj", type=float, default=0.0)
    p.add_argument("--mono_direction", action="store_true",
                   help="not supported — the reference raises too "
                        "(attention_processor.py:622)")
    p.add_argument("--sharded", action="store_true",
                   help="shard sampling over all local devices "
                        "(rows x frames mesh; kernels stay active per shard)")
    p.add_argument("--fix_firstframe", action="store_true")
    p.add_argument("--pab", action="store_true",
                   help="Pyramid Attention Broadcast: reuse attention "
                        "outputs on scheduled outer steps (speed/quality "
                        "trade; see pipelines/pab.py). Requires "
                        "--no-scan_layers (per-layer caches)")
    p.add_argument("--pab_ranges", type=str, default="",
                   help="per-class broadcast ranges, e.g. "
                        "'spatial=2,cross=3,temporal=2,epi=1'")
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
