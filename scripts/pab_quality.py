"""PAB approximation error at full size: same-seed decoded outputs with and
without Pyramid Attention Broadcast, reported as PSNR (dB) + max |delta|.

With no trained checkpoints in this environment the absolute quality of
either output is meaningless, but the PSNR between them is an honest
measure of how much the scheduled attention reuse perturbs the exact
sampling trajectory at deployment shapes (bf16, 256px, 16 frames,
25 DDIM steps). Prints one JSON line per config.

Usage: python scripts/pab_quality.py [--advanced] [--ranges STR] [--steps N]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvd_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from cvd_tpu import geometry as G
from cvd_tpu.geometry.trajectories import default_intrinsics
from cvd_tpu.io.tokenizer import HashTokenizer
from cvd_tpu.models.clip_text import CLIPTextConfig
from cvd_tpu.models.unet import UNetConfig
from cvd_tpu.models.vae import VAEConfig
from cvd_tpu.pipelines.common import PipelineModules
from cvd_tpu.pipelines.pab import PABConfig


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--advanced", action="store_true")
    p.add_argument("--views", type=int, default=None)
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--multistep", type=int, default=3)
    p.add_argument("--accumulate", type=int, default=1)
    p.add_argument("--step-chunk", type=int, default=None)
    p.add_argument("--ranges", type=str, default="",
                   help="PABConfig.from_string input; default = PABConfig()")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    dtype = jnp.bfloat16
    V = args.views or (4 if args.advanced else 2)
    F, IMG = args.frames, args.size
    if args.tiny:
        IMG = 64
        F = 4
    t0 = time.time()
    if args.tiny:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
        from tests.tiny import tiny_modules

        modules = tiny_modules(latent_size=IMG // 8, video_length=F)
    else:
        modules = PipelineModules.create(
            unet_config=UNetConfig(dtype=dtype),
            vae_config=VAEConfig(dtype=dtype), clip_config=CLIPTextConfig(),
            latent_size=IMG // 8, video_length=F, fast_init=True)
        modules.cast_params()
    print(f"init: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    c2ws = G.circle_trajectory(V, F, camera_dist=0.4)
    K = default_intrinsics(V, F, IMG, IMG)
    intr = np.stack([K[:, 0, 0], K[:, 1, 1], K[:, 0, 2], K[:, 1, 2]], -1)
    plucker = G.ray_condition(
        jnp.asarray(intr, jnp.float32)[None],
        jnp.asarray(c2ws, jnp.float32)[None], IMG, IMG,
    )[0].reshape(V, F, IMG, IMG, 6)
    tok = HashTokenizer()
    ids = jnp.asarray(tok(["a cinematic fly-through of a modern house"]))
    neg = jnp.asarray(tok([""]))
    cfg = (PABConfig.from_string(args.ranges) if args.ranges else PABConfig())

    if args.advanced:
        from cvd_tpu.pipelines.advanced import AdvancedPipeline

        pipe = AdvancedPipeline(modules, F_mat_size=IMG)
        call = lambda pab: pipe(
            ids, neg, jnp.copy(plucker),
            c2w=jnp.asarray(c2ws, jnp.float32),
            K_mats=jnp.asarray(K, jnp.float32),
            num_inference_steps=args.steps, multistep=args.multistep,
            accumulate_step=args.accumulate, rng=jax.random.key(7),
            step_chunk=args.step_chunk, pab_config=pab)
        label = f"advanced-{V}view-ms{args.multistep}-acc{args.accumulate}"
    else:
        from cvd_tpu.pipelines.simple import SimplePipeline

        Fp = G.fundamental_between_views(
            jnp.asarray(c2ws[:F], jnp.float32),
            jnp.asarray(c2ws[F:], jnp.float32),
            jnp.asarray(K[:F], jnp.float32), jnp.asarray(K[F:], jnp.float32))
        F_mats = jnp.stack([Fp, jnp.swapaxes(Fp, -1, -2)])
        pipe = SimplePipeline(modules, F_mat_size=IMG)
        call = lambda pab: pipe(
            ids, neg, plucker, F_mats, num_inference_steps=args.steps,
            rng=jax.random.key(7), pab_config=pab)
        label = f"simple-2view"

    for name, pab in (("baseline", None), ("pab", cfg)):
        t0 = time.time()
        out = np.asarray(call(pab))
        print(f"{name}: {time.time()-t0:.1f}s (incl. compile)",
              file=sys.stderr, flush=True)
        if name == "baseline":
            base = out
        else:
            print(json.dumps({
                "metric": "pab_output_psnr_db",
                "value": round(psnr(base, out), 2),
                "unit": "dB vs exact same-seed sampling",
                "config": f"{label}-{args.steps}steps-{IMG}px",
                "ranges": str(cfg),
                "max_abs_delta": round(float(np.abs(
                    base.astype(np.float64) - out.astype(np.float64)).max()), 4),
            }), flush=True)


if __name__ == "__main__":
    main()
