"""Profile ONE UNet denoise step on the TPU and bucket device time.

Settles BASELINE.md's analytic "~190 ms HBM floor" claim with measured
data (VERDICT r2 weak #3): captures a jax.profiler trace of the jitted
UNet apply at the bench config (batch 4 = 2 views x CFG, 16f, 32x32
latents, bf16) with create_perfetto_trace=True and buckets the
`/device:TPU:*` complete events by HLO-op name. (The image's
tensorboard_plugin_profile is incompatible with its TF/protobuf, so the
xplane path is unusable; the perfetto JSON needs no converter.)

Usage: python scripts/step_profile.py [--repeats 3] [--outdir /tmp/cvd_prof]
Prints a markdown table for BASELINE.md plus one JSON line.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUCKETS = (
    # (bucket, regexes matched against op name/category, first hit wins).
    # Named norm kernels come FIRST so the Mosaic GroupNorm / LN->matmul
    # kernels (_gn / _ln_mm in the program census) are not swallowed by the
    # generic custom-call patterns.
    ("ln_groupnorm", (r"ln_matmul", r"_ln_mm", r"_gn", r"group_norm",
                      r"groupnorm", r"layer_norm", r"layernorm", r"ln_qkv",
                      r"norm")),
    ("attention_kernels", (r"flash", r"_fwd", r"epi_attn", r"temporal_attn",
                           r"attention")),
    # bare custom-call.N events carry no kernel identity in the trace; give
    # them their own bucket instead of inflating the attention share
    ("mosaic_unattributed", (r"mosaic", r"custom-call", r"tpu_custom_call")),
    # (?!ert) so dtype-cast 'convert.N' HLOs fall through to
    # elementwise_fusion instead of being counted as convolutions
    ("conv_matmul", (r"conv(?!ert)", r"dot", r"einsum", r"matmul", r"dense")),
    ("copies_reshapes", (r"copy", r"reshape", r"transpose", r"pad",
                         r"concatenate", r"slice", r"bitcast", r"gather",
                         r"dynamic-update")),
    ("pooling", (r"reduce-window",)),
    # unattributed loop/elementwise fusions (XLA names carry the root op
    # when it's interesting; plain "fusion.N" lands here)
    ("elementwise_fusion", (r"fusion", r"broadcast", r"multiply", r"add",
                            r"convert", r"select", r"compare", r"reduce")),
)


def bucket_of(name: str, category: str) -> str:
    s = f"{name} {category}".lower()
    for bucket, pats in BUCKETS:
        if any(re.search(p, s) for p in pats):
            return bucket
    return "other"


def build_step(tiny: bool = False):
    import jax
    import jax.numpy as jnp

    from cvd_tpu.models.epi import EpiConditioning
    from cvd_tpu.models.unet import UNetConfig
    from cvd_tpu.pipelines.common import PipelineModules

    from cvd_tpu.models.clip_text import CLIPTextConfig
    from cvd_tpu.models.vae import VAEConfig

    if tiny:  # cheap smoke of the trace/parse path (CPU-friendly)
        cfg = UNetConfig(block_out_channels=(32, 64, 64, 64),
                         attention_heads=4, cross_attention_dim=24,
                         norm_num_groups=8, dtype=jnp.bfloat16)
        vae_cfg = VAEConfig(block_out_channels=(32, 32, 64, 64),
                            norm_num_groups=8, dtype=jnp.bfloat16)
        clip_cfg = CLIPTextConfig(hidden_size=24, num_layers=2, num_heads=4,
                                  intermediate_size=48)
    else:
        cfg, vae_cfg, clip_cfg = UNetConfig(dtype=jnp.bfloat16), None, None
    modules = PipelineModules.create(unet_config=cfg, vae_config=vae_cfg,
                                     clip_config=clip_cfg, latent_size=32,
                                     video_length=16, fast_init=True)
    modules.cast_params()
    B, F, s = 4, 16, 32
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((B, F, s, s, 4)), jnp.bfloat16)
    text = jnp.asarray(rng.standard_normal((B, 77, cfg.cross_attention_dim)),
                       jnp.bfloat16)
    pose = [jnp.asarray(
        rng.standard_normal((B, F, s // 2**i, s // 2**i,
                             cfg.block_out_channels[i])) * 0.1, jnp.bfloat16)
        for i in range(4)]
    F_mats = jnp.asarray(rng.standard_normal((B * F, 3, 3)) * 1e-3)
    cond = EpiConditioning(F_mats=F_mats, video_length=F, rand_slope_ff=False,
                           use_flash_kernel=True)

    from cvd_tpu.models import layers as _layers

    _layers.FLASH_SPATIAL, _layers.SHARD_MESH = True, None
    step = jax.jit(
        lambda p, x, t, c, pf: modules.unet.apply(p, x, t, c, pf, cond)[0]
    )
    args = (modules.unet_params, lat, jnp.asarray(500, jnp.int32), text, pose)
    return step, args


def _sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])


def parse_perfetto(outdir: str):
    """perfetto_trace.json.gz -> list of (op name, duration us) for events
    on device tracks (process_name metadata starting with "/device:")."""
    paths = sorted(glob.glob(
        os.path.join(outdir, "**", "perfetto_trace.json.gz"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no perfetto_trace.json.gz under {outdir}")
    doc = json.loads(gzip.open(paths[-1]).read())
    events = doc["traceEvents"] if isinstance(doc, dict) else doc

    # per-HLO-op events carry an `hlo_op` arg (on TPU they live on
    # /device:* tracks; on the CPU backend on XLA executor threads under
    # /host:CPU). Host wrapper events ($..., ThunkExecutor) don't.
    hlo = [e for e in events
           if e.get("ph") == "X" and isinstance(e.get("args"), dict)
           and "hlo_op" in e["args"]]
    if not hlo:
        raise RuntimeError(
            "no hlo_op-annotated events in trace (backend exports no "
            "per-op timeline); cannot bucket the step")
    device_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and str(e.get("args", {}).get("name", "")).startswith("/device:")}
    on_device = [e for e in hlo if e.get("pid") in device_pids]
    kind = "device" if on_device else "host_hlo"
    return kind, [(e.get("name", ""), float(e.get("dur", 0.0)))
                  for e in (on_device or hlo)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--outdir", default="/tmp/cvd_prof")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model smoke run (verifies the trace/parse path)")
    args = p.parse_args()

    from cvd_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    step, step_args = build_step(tiny=args.tiny)
    print("[profile] compiling one UNet step", file=sys.stderr, flush=True)
    t0 = time.time()
    _sync(step(*step_args))
    print(f"[profile] compile {time.time() - t0:.1f}s", file=sys.stderr,
          flush=True)
    # warm twice (remote backend lazy setup on call 2)
    _sync(step(*step_args))

    ts = []
    os.makedirs(args.outdir, exist_ok=True)
    jax.profiler.start_trace(args.outdir, create_perfetto_trace=True)
    try:
        for _ in range(args.repeats):
            t0 = time.time()
            _sync(step(*step_args))
            ts.append(time.time() - t0)
    finally:
        jax.profiler.stop_trace()
    step_ms = float(np.median(ts)) * 1000
    print(f"[profile] step {step_ms:.1f} ms (median of {args.repeats})",
          file=sys.stderr, flush=True)

    try:
        track_kind, op_events = parse_perfetto(args.outdir)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"step_ms": round(step_ms, 1),
                          "trace_parse_error": f"{type(e).__name__}: {e}"}))
        return

    buckets: dict = {}
    for name, t_us in op_events:
        if t_us <= 0:
            continue
        b = bucket_of(name, "")
        d = buckets.setdefault(b, {"us": 0.0, "ops": 0})
        d["us"] += t_us
        d["ops"] += 1

    total_us = sum(d["us"] for d in buckets.values())
    print("\n| bucket | device ms/step | share | ops |")
    print("|---|---|---|---|")
    for b, d in sorted(buckets.items(), key=lambda kv: -kv[1]["us"]):
        ms = d["us"] / 1000.0 / args.repeats
        print(f"| {b} | {ms:.1f} | {d['us'] / max(total_us, 1):.0%} | {d['ops']} |")
    print(f"| total traced | {total_us / 1000.0 / args.repeats:.1f} | 100% | |\n")
    print(json.dumps({
        "step_ms": round(step_ms, 1),
        "track_kind": track_kind,
        "buckets_ms_per_step": {
            b: round(d["us"] / 1000.0 / args.repeats, 2)
            for b, d in buckets.items()
        },
        "traced_total_ms_per_step": round(total_us / 1000.0 / args.repeats, 2),
    }))


if __name__ == "__main__":
    main()
