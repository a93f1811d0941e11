"""Profile ONE UNet denoise step on the TPU and bucket device time.

Settles BASELINE.md's analytic "~190 ms HBM floor" claim with measured
data (VERDICT r2 weak #3): captures a jax.profiler trace of the jitted
UNet apply at the bench config (batch 4 = 2 views x CFG, 16f, 32x32
latents, bf16), converts the xplane via tensorboard_plugin_profile's
framework_op_stats, and prints per-bucket device time + (when the
tooling reports it) bytes.

Usage: python scripts/step_profile.py [--repeats 3] [--outdir /tmp/cvd_prof]
Prints a markdown table for BASELINE.md plus one JSON line.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUCKETS = (
    # (bucket, regexes matched against op name/category, first hit wins)
    ("attention_kernels", (r"flash", r"epi_attn", r"temporal_attn",
                           r"mosaic", r"custom-call", r"tpu_custom_call")),
    ("ln_groupnorm", (r"ln_matmul", r"group_norm", r"groupnorm", r"layer_norm",
                      r"layernorm", r"ln_qkv", r"norm")),
    ("conv_matmul", (r"conv", r"dot", r"einsum", r"matmul", r"dense")),
    ("copies_reshapes", (r"copy", r"reshape", r"transpose", r"pad",
                         r"concatenate", r"slice", r"bitcast", r"gather",
                         r"dynamic-update")),
)


def bucket_of(name: str, category: str) -> str:
    s = f"{name} {category}".lower()
    for bucket, pats in BUCKETS:
        if any(re.search(p, s) for p in pats):
            return bucket
    return "other"


def build_step():
    import jax
    import jax.numpy as jnp

    from cvd_tpu.models.epi import EpiConditioning
    from cvd_tpu.models.unet import UNetConfig
    from cvd_tpu.pipelines.common import PipelineModules

    cfg = UNetConfig(dtype=jnp.bfloat16)
    modules = PipelineModules.create(unet_config=cfg, latent_size=32,
                                     video_length=16)
    modules.cast_params()
    B, F, s = 4, 16, 32
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((B, F, s, s, 4)), jnp.bfloat16)
    text = jnp.asarray(rng.standard_normal((B, 77, 768)), jnp.bfloat16)
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


def parse_xplane(outdir: str):
    """xplane.pb -> list of (op name, category, self time us, bytes?)."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {outdir}")
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    return data


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--outdir", default="/tmp/cvd_prof")
    args = p.parse_args()

    from cvd_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    step, step_args = build_step()
    print("[profile] compiling one UNet step", file=sys.stderr, flush=True)
    t0 = time.time()
    _sync(step(*step_args))
    print(f"[profile] compile {time.time() - t0:.1f}s", file=sys.stderr,
          flush=True)
    # warm twice (remote backend lazy setup on call 2)
    _sync(step(*step_args))

    ts = []
    os.makedirs(args.outdir, exist_ok=True)
    jax.profiler.start_trace(args.outdir)
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
        raw = parse_xplane(args.outdir)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"step_ms": round(step_ms, 1),
                          "trace_parse_error": f"{type(e).__name__}: {e}"}))
        return

    # framework_op_stats CSV/JSON: bucket self-times
    rows = []
    try:
        parsed = json.loads(raw)
        # gviz DataTable: {cols: [{label:...}], rows: [{c: [{v:..}]}]}
        cols = [c.get("label", c.get("id", "")) for c in parsed[0]["cols"]] \
            if isinstance(parsed, list) else \
            [c.get("label", c.get("id", "")) for c in parsed["cols"]]
        table = parsed[0] if isinstance(parsed, list) else parsed
        for r in table["rows"]:
            vals = [c.get("v") if isinstance(c, dict) else c for c in r["c"]]
            rows.append(dict(zip(cols, vals)))
    except Exception:
        # fall back: raw CSV
        import csv
        import io

        for r in csv.DictReader(io.StringIO(raw)):
            rows.append(r)

    def g(row, *names, default=0.0):
        for n in names:
            for k in row:
                if n.lower() in str(k).lower():
                    try:
                        return float(row[k])
                    except (TypeError, ValueError):
                        pass
        return default

    buckets: dict = {}
    for row in rows:
        name = str(row.get("Operation", row.get("Op name", row.get("op_name", ""))))
        cat = str(row.get("Type", row.get("Category", row.get("category", ""))))
        t_us = g(row, "total self-time (us)", "self time (us)", "self_time")
        if t_us <= 0:
            continue
        b = bucket_of(name, cat)
        d = buckets.setdefault(b, {"us": 0.0, "ops": 0})
        d["us"] += t_us
        d["ops"] += 1

    total_us = sum(d["us"] for d in buckets.values())
    scale = (step_ms * 1000 * args.repeats) or 1.0
    print("\n| bucket | device ms/step | share | ops |")
    print("|---|---|---|---|")
    for b, d in sorted(buckets.items(), key=lambda kv: -kv[1]["us"]):
        ms = d["us"] / 1000.0 / args.repeats
        print(f"| {b} | {ms:.1f} | {d['us'] / max(total_us, 1):.0%} | {d['ops']} |")
    print(f"| total traced | {total_us / 1000.0 / args.repeats:.1f} | 100% | |\n")
    print(json.dumps({
        "step_ms": round(step_ms, 1),
        "buckets_ms_per_step": {
            b: round(d["us"] / 1000.0 / args.repeats, 2)
            for b, d in buckets.items()
        },
        "traced_total_ms_per_step": round(total_us / 1000.0 / args.repeats, 2),
    }))


if __name__ == "__main__":
    main()
