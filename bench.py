"""Benchmark harness: 2-view 16-frame 256px generation, 25 DDIM steps.

Prints ONE JSON line:
  {"metric": "videos_per_min_per_chip", "value": N, "unit": "videos/min",
   "vs_baseline": R, ...extras}

vs_baseline is the ratio against the BASELINE.md north star expressed per
chip: 2 videos in <20 s on v5e-8 -> 0.75 videos/min/chip if scaling were
linear; we hold ONE chip to the full 2-videos-in-20s bar (6 videos/min),
i.e. vs_baseline >= 1.0 means one chip alone beats the 8-chip target.

Weights are random (the reference artifacts are not available in this
environment); FLOP/byte cost is weight-independent.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _sync(x):
    """Force completion: device_get a corner of the result. Needed because
    block_until_ready over the remote-TPU tunnel can return early."""
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])
    return x


def _note(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--f32", action="store_true", help="disable bf16 activations")
    p.add_argument("--tiny", action="store_true", help="tiny model smoke run")
    p.add_argument("--advanced", action="store_true",
                   help="bench the N-view advanced pipeline instead "
                        "(--views views, multistep per run_inference_advanced.sh)")
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--multistep", type=int, default=3)
    p.add_argument("--accumulate", type=int, default=1,
                   help="accumulate_step (reference 6-view config: "
                        "--multistep 6 --accumulate 2)")
    args = p.parse_args()

    from cvd_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from cvd_tpu import geometry as G
    from cvd_tpu.geometry.trajectories import default_intrinsics
    from cvd_tpu.io.tokenizer import HashTokenizer
    from cvd_tpu.models.clip_text import CLIPTextConfig
    from cvd_tpu.models.unet import UNetConfig
    from cvd_tpu.models.vae import VAEConfig
    from cvd_tpu.pipelines.common import PipelineModules
    from cvd_tpu.pipelines.simple import SimplePipeline

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    if args.tiny:
        unet_cfg = UNetConfig(
            block_out_channels=(32, 64, 64, 64), attention_heads=4,
            cross_attention_dim=24, norm_num_groups=8, dtype=dtype,
        )
        vae_cfg = VAEConfig(block_out_channels=(32, 32, 64, 64), norm_num_groups=8,
                            dtype=dtype)
        clip_cfg = CLIPTextConfig(hidden_size=24, num_layers=2, num_heads=4,
                                  intermediate_size=48)
    else:
        unet_cfg = UNetConfig(dtype=dtype)
        vae_cfg = VAEConfig(dtype=dtype)
        clip_cfg = CLIPTextConfig()

    _note("building modules (random weights)")
    t0 = time.time()
    modules = PipelineModules.create(
        unet_config=unet_cfg, vae_config=vae_cfg, clip_config=clip_cfg,
        latent_size=args.size // 8, video_length=args.frames,
    )
    if not args.f32:
        # bf16 weights, matching the CLIs' --bf16 deployment: halves the
        # resident bundle (7.9 -> 4.0 GiB) and per-step weight HBM reads
        modules.cast_params()
    init_s = time.time() - t0
    _note(f"init done in {init_s:.1f}s")

    V = args.views if args.advanced else 2
    F, IMG = args.frames, args.size
    c2ws = G.circle_trajectory(V, F, camera_dist=0.4)
    K = default_intrinsics(V, F, IMG, IMG)
    intr = np.stack([K[:, 0, 0], K[:, 1, 1], K[:, 0, 2], K[:, 1, 2]], -1)
    plucker = G.ray_condition(
        jnp.asarray(intr, jnp.float32)[None], jnp.asarray(c2ws, jnp.float32)[None],
        IMG, IMG,
    )[0].reshape(V, F, IMG, IMG, 6)
    tok = HashTokenizer()
    ids = jnp.asarray(tok(["a cinematic fly-through of a modern house"]))
    neg = jnp.asarray(tok([""]))

    if args.advanced:
        from cvd_tpu.pipelines.advanced import AdvancedPipeline

        pipe_a = AdvancedPipeline(modules, F_mat_size=IMG)
        # the advanced jit donates the plucker buffer; ship a fresh
        # device-side copy per call so repeats don't hit a deleted buffer
        run = lambda key: pipe_a(
            ids, neg, jnp.copy(plucker),
            c2w=jnp.asarray(c2ws, jnp.float32),
            K_mats=jnp.asarray(K, jnp.float32),
            num_inference_steps=args.steps, multistep=args.multistep,
            accumulate_step=args.accumulate, rng=key,
        )
    else:
        Fp = G.fundamental_between_views(
            jnp.asarray(c2ws[:F], jnp.float32), jnp.asarray(c2ws[F:], jnp.float32),
            jnp.asarray(K[:F], jnp.float32), jnp.asarray(K[F:], jnp.float32),
        )
        F_mats = jnp.stack([Fp, jnp.swapaxes(Fp, -1, -2)])
        pipe = SimplePipeline(modules, F_mat_size=IMG)
        run = lambda key: pipe(ids, neg, plucker, F_mats,
                               num_inference_steps=args.steps, rng=key)

    _note("compiling end-to-end pipeline")
    t0 = time.time()
    _sync(run(jax.random.key(0)))
    compile_s = time.time() - t0
    _note(f"compile done in {compile_s:.1f}s")

    times = []
    for i in range(args.repeats):
        t0 = time.time()
        _sync(run(jax.random.key(i + 1)))
        times.append(time.time() - t0)
        _note(f"e2e repeat {i}: {times[-1]:.2f}s")
    e2e_s = float(np.median(times))

    if args.advanced:
        videos_per_min = V / e2e_s * 60.0
        print(json.dumps({
            "metric": "advanced_videos_per_min_per_chip",
            "value": round(videos_per_min, 3),
            "unit": "videos/min",
            "vs_baseline": round(videos_per_min / 6.0, 3),
            "e2e_seconds": round(e2e_s, 3),
            "compile_seconds": round(compile_s, 1),
            "config": f"{V}view-{F}f-{IMG}px-{args.steps}steps-"
                      f"ms{args.multistep}-acc{args.accumulate}-"
                      f"{'f32' if args.f32 else 'bf16'}{'-tiny' if args.tiny else ''}",
        }))
        return

    # UNet step time = (e2e - VAE decode) / steps. Decode is timed with a
    # small decode-only program instead of recompiling the whole pipeline
    # without decode (saves a second ~200 s full-UNet server compile).
    _note("compiling decode-only variant")
    from cvd_tpu.pipelines.common import decode_latents

    lat_shape = (2, args.frames, args.size // 8, args.size // 8, 4)
    z = jnp.zeros(lat_shape, dtype)
    dec = jax.jit(lambda vp, zz: decode_latents(modules, vp, zz))
    # the remote backend finishes lazy setup on the SECOND call too
    # (measured: call 2 of a fresh program runs 3x slower than call 3+);
    # warm twice, then take the median of three
    _sync(dec(modules.vae_params, z))
    _sync(dec(modules.vae_params, z * 2.0))
    dts = []
    for i in range(3):
        t0 = time.time()
        _sync(dec(modules.vae_params, z * (0.5 + i)))
        dts.append(time.time() - t0)
    decode_s = float(np.median(dts))
    denoise_s = e2e_s - decode_s

    videos_per_min = V / e2e_s * 60.0
    step_s = denoise_s / args.steps
    result = {
        "metric": "videos_per_min_per_chip",
        "value": round(videos_per_min, 3),
        "unit": "videos/min",
        "vs_baseline": round(videos_per_min / 6.0, 3),
        "e2e_seconds_2view": round(e2e_s, 3),
        "unet_step_ms": round(step_s * 1000.0, 2),
        "decode_seconds": round(decode_s, 3),
        "compile_seconds": round(compile_s, 1),
        "init_seconds": round(init_s, 1),
        "config": f"{V}view-{F}f-{IMG}px-{args.steps}steps-"
                  f"{'f32' if args.f32 else 'bf16'}{'-tiny' if args.tiny else ''}",
    }
    if not args.tiny:
        # achieved TFLOP/s + MFU of the denoise step (HLO-exact FLOP count
        # from utils.flops, CPU-subprocess cached; v5e bf16 peak 197 TF/s)
        from cvd_tpu.utils.flops import V5E_PEAK_BF16_FLOPS, cached_unet_flops

        flops = cached_unet_flops(2 * V, args.frames, args.size // 8,
                                  bf16=not args.f32)
        if flops:
            result["unet_step_tflops"] = round(flops / 1e12, 2)
            result["achieved_tflops_per_s"] = round(flops / step_s / 1e12, 1)
            result["mfu"] = round(flops / step_s / V5E_PEAK_BF16_FLOPS, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        # one retry: a freshly restarted TPU worker can fail/crash the
        # first client after it (transient UNAVAILABLE/RESOURCE_EXHAUSTED
        # over the remote tunnel)
        _note(f"first attempt failed ({type(e).__name__}: {e}); retrying once")
        time.sleep(30)
        main()
