"""Analytic UNet-step FLOP accounting for MFU reporting.

``python -m cvd_tpu.utils.flops --batch 4 --frames 16 --latent 32`` prints
one JSON line ``{"flops": N}`` — the FLOPs of ONE UNet apply at those
shapes, measured by AOT-lowering the real model on abstract inputs and
reading XLA's HLO cost analysis (dot/conv FLOPs are exact; no weights are
allocated and nothing is compiled to machine code).

Run under the CPU backend (the TPU tunnel backend returns no cost
analysis): bench.py spawns this in a ``JAX_PLATFORMS=cpu`` subprocess and
caches the result per shape tuple.
"""
from __future__ import annotations

import argparse
import json
import os

# v5e peak dense bf16 matmul throughput, per chip
V5E_PEAK_BF16_FLOPS = 197e12


def unet_apply_flops(batch: int, frames: int, latent: int,
                     bf16: bool = True) -> float:
    import jax
    import jax.numpy as jnp

    from cvd_tpu.models.epi import EpiConditioning
    from cvd_tpu.models.unet import UNet3DConditionModel, UNetConfig
    from cvd_tpu.pipelines.common import abstract_param_shapes

    cfg = UNetConfig(dtype=jnp.bfloat16 if bf16 else jnp.float32)
    unet = UNet3DConditionModel(cfg)
    shapes = abstract_param_shapes(unet_config=cfg, latent_size=latent,
                                   video_length=frames)
    S = jax.ShapeDtypeStruct
    act = jnp.bfloat16 if bf16 else jnp.float32
    ch = cfg.block_out_channels
    args = (
        shapes["unet"],
        S((batch, frames, latent, latent, 4), jnp.float32),
        S((), jnp.int32),
        S((batch, 77, cfg.cross_attention_dim), jnp.float32),
        [S((batch, frames, latent // 2**i, latent // 2**i, ch[i]), act)
         for i in range(4)],
        EpiConditioning(F_mats=S((batch * frames, 3, 3), jnp.float32),
                        video_length=frames, rand_slope_ff=False,
                        use_flash_kernel=False),
    )
    lowered = jax.jit(
        lambda p, lat, t, text, pf, cond: unet.apply(p, lat, t, text, pf, cond)
    ).lower(*args)
    cost = lowered.cost_analysis()
    if not cost or "flops" not in cost:
        raise RuntimeError("backend returned no HLO cost analysis")
    return float(cost["flops"])


def cached_unet_flops(batch: int, frames: int, latent: int,
                      bf16: bool = True):
    """FLOPs of one UNet apply, via a CPU-backend subprocess; cached on
    disk (the count is shape-deterministic). Returns None on failure."""
    import subprocess
    import sys

    cache_dir = os.path.expanduser("~/.cache/cvd_tpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    cache = os.path.join(
        cache_dir, f"flops_b{batch}_f{frames}_l{latent}_{int(bf16)}.json"
    )
    if os.path.exists(cache):
        return json.load(open(cache))["flops"]
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    try:
        out = subprocess.run(
            [sys.executable, "-m", "cvd_tpu.utils.flops", "--batch",
             str(batch), "--frames", str(frames), "--latent", str(latent)]
            + ([] if bf16 else ["--f32"]),
            capture_output=True, text=True, timeout=600, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
        )
        flops = json.loads(out.stdout.strip().splitlines()[-1])["flops"]
    except Exception:
        return None
    json.dump({"flops": flops}, open(cache, "w"))
    return flops


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--latent", type=int, default=32)
    p.add_argument("--f32", action="store_true")
    args = p.parse_args()
    flops = unet_apply_flops(args.batch, args.frames, args.latent,
                             bf16=not args.f32)
    print(json.dumps({"flops": flops}))


if __name__ == "__main__":
    main()
