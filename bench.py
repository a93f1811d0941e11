"""Benchmark harness: 2-view 16-frame 256px generation, 25 DDIM steps.

Prints JSON lines on stdout; the LAST line is the complete result:
  {"metric": "videos_per_min_per_chip", "value": N, "unit": "videos/min",
   "vs_baseline": R, ...extras}
In simple mode a partial line (same metric, "partial": true) is emitted as
soon as the end-to-end number is known, so a driver timeout mid-way still
leaves a parsable number.

Output contract (BENCH_r03 post-mortem): every stdout line this script
emits is bounded-size. Error strings are truncated to their first line,
<=200 chars (a JAX RESOURCE_EXHAUSTED message embeds XLA's multi-hundred-KB
HBM dump; one such line blew the driver's tail capture in round 3), and the
compact headline is ALWAYS re-emitted as the absolute last line.

The default mode is an ORCHESTRATOR that never imports jax itself: it runs
the inference measurement and the training-iteration measurement as two
subprocesses (each gets a fresh TPU client, so the train phase can never
inherit the inference session's HBM — the round-3 OOM), streams their
stdout through line-by-line, and finally emits the combined headline.

vs_baseline is the ratio against the BASELINE.md north star expressed per
chip: 2 videos in <20 s on v5e-8 -> 0.75 videos/min/chip if scaling were
linear; we hold ONE chip to the full 2-videos-in-20s bar (6 videos/min),
i.e. vs_baseline >= 1.0 means one chip alone beats the 8-chip target.

Weights are random (the reference artifacts are not available in this
environment); FLOP/byte cost is weight-independent.

Modes:
  (default)     simple 2-view pipeline e2e + denoise-step ms + MFU +
                steady-state throughput + a training-iteration row
                (--no-train-row skips the train phase)
  --advanced    N-view advanced pipeline (+ per-UNet-call MFU)
  --train       full-size training iteration ms (B=2 folded pairs)
  --warm-only   build + compile + exit (run after kernel changes so the
                persistent XLA cache is hot before a driver bench window)
  --split-decode denoise + VAE decode as two separately cached executables
                (smaller programs to compile; exact phase timing)

Robustness (the round-2 driver bench died in a wedged backend init):
  * backend init + first device op run under a hard SIGALRM watchdog
    (~150 s) instead of hanging for the driver's whole window;
  * the one-shot retry fires ONLY for transient backend errors
    (UNAVAILABLE / worker crash / watchdog timeout), never for
    deterministic failures like bad flags or shape errors.
"""
from __future__ import annotations

import argparse
import contextlib
import json
import os
import signal
import sys
import time

import numpy as np

INIT_WATCHDOG_SECONDS = 240  # healthy remote init measured at 110-130s
FIRST_PROBE_SECONDS = 150  # r04 lesson: watchdog retries are now immediate
# (no 60s sleep — backend init keeps progressing in background threads, so
# the retry probe typically returns instantly: r04 logged "healthy in 0.0s"
# right after each pointless sleep). A short first probe therefore costs
# nothing when it fires spuriously and saves 90s when the tunnel is wedged.

# substrings that mark an error as a transient remote-backend failure worth
# one retry; anything else (shape errors, OOM-by-design, bad flags) re-raises
# immediately with its original traceback
_TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "RESOURCE_EXHAUSTED: TPU backend",
    "worker process crashed",
    "worker process restarted",
    "Connection reset",
    "Socket closed",
    "failed to connect",
    "watchdog:",
)


class _WatchdogTimeout(RuntimeError):
    pass


@contextlib.contextmanager
def _watchdog(seconds: int, what: str):
    """Hard SIGALRM deadline: a wedged remote TPU worker can hang backend
    init for 25+ minutes (BENCH_r02); fail in minutes so the retry (or the
    driver) has budget left."""

    def _fire(signum, frame):
        raise _WatchdogTimeout(f"watchdog: {what} exceeded {seconds}s")

    prev = signal.signal(signal.SIGALRM, _fire)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, prev)


_BACKEND_WAS_HEALTHY = False


def _is_transient(e: BaseException) -> bool:
    s = f"{type(e).__name__}: {e}"
    if "RESOURCE_EXHAUSTED" in s and _BACKEND_WAS_HEALTHY:
        # OOM raised AFTER this process saw a healthy backend = our own
        # program genuinely doesn't fit. An in-process retry can never
        # succeed (this process holds the HBM that starved it) — r04's
        # bench_train burned 8 min of health retries learning that. Before
        # first health, RESOURCE_EXHAUSTED stays transient: it usually
        # means a previous client is still draining its buffers.
        return False
    return any(m in s for m in _TRANSIENT_MARKERS)


def _short_err(e) -> str:
    """First line of an error, <=200 chars. NEVER embed a raw exception in
    an emitted JSON line: XLA's RESOURCE_EXHAUSTED carries the full
    per-buffer HBM dump and one such line destroyed BENCH_r03's tail."""
    s = f"{type(e).__name__}: {e}" if isinstance(e, BaseException) else str(e)
    return s.splitlines()[0][:200] if s else "unknown error"


def _sync(x):
    """Force completion: device_get a corner of the result. Needed because
    block_until_ready over the remote-TPU tunnel can return early."""
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])
    return x


def _note(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _emit(obj):
    print(json.dumps(obj), flush=True)


def _init_backend(budget_s: float = 900.0):
    """Import jax and run one tiny device op under the watchdog.

    A wedged TPU worker sometimes recovers within minutes; retry the CHEAP
    health op on a bounded budget (~10 min) instead of either hanging the
    driver's whole window (round-2 failure mode) or giving up after one
    shot. Heavy work starts only after a healthy first op."""
    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            with _watchdog(FIRST_PROBE_SECONDS if attempt == 1
                           else INIT_WATCHDOG_SECONDS,
                           "backend init + first device op"):
                import jax
                import jax.numpy as jnp

                t0 = time.time()
                dev = jax.devices()
                x = jnp.ones((256, 256))
                _sync(x @ x)
                _note(
                    f"backend {jax.default_backend()} ({len(dev)} device(s)) "
                    f"healthy in {time.time() - t0:.1f}s"
                )
                global _BACKEND_WAS_HEALTHY
                _BACKEND_WAS_HEALTHY = True
                return
        except Exception as e:  # noqa: BLE001
            if not _is_transient(e):
                raise
            # watchdog timeouts retry IMMEDIATELY: init keeps progressing in
            # background threads, so the next probe usually succeeds at once
            # (r04: "healthy in 0.0s" after each wasted 60s sleep). Other
            # transient errors (server restarting) still back off 60s.
            wait = 5 if isinstance(e, _WatchdogTimeout) else 60
            if time.time() + wait > deadline:
                raise
            _note(f"health check failed ({type(e).__name__}: {e}); "
                  f"attempt {attempt}, retrying in {wait}s")
            time.sleep(wait)


def _build_modules(args, dtype):
    from cvd_tpu.models.clip_text import CLIPTextConfig
    from cvd_tpu.models.unet import UNetConfig
    from cvd_tpu.models.vae import VAEConfig
    from cvd_tpu.pipelines.common import PipelineModules

    scan_layers = getattr(args, "scan_layers", False)
    if args.tiny:
        unet_cfg = UNetConfig(
            block_out_channels=(32, 64, 64, 64), attention_heads=4,
            cross_attention_dim=24, norm_num_groups=8, dtype=dtype,
            scan_identical_layers=scan_layers,
        )
        vae_cfg = VAEConfig(block_out_channels=(32, 32, 64, 64),
                            norm_num_groups=8, dtype=dtype)
        clip_cfg = CLIPTextConfig(hidden_size=24, num_layers=2, num_heads=4,
                                  intermediate_size=48)
    else:
        unet_cfg = UNetConfig(dtype=dtype, scan_identical_layers=scan_layers,
                              remat_policy=getattr(args, "remat_policy", ""))
        vae_cfg = VAEConfig(dtype=dtype)
        clip_cfg = CLIPTextConfig()

    _note("building modules (random weights, host fast-init)")
    t0 = time.time()
    modules = PipelineModules.create(
        unet_config=unet_cfg, vae_config=vae_cfg, clip_config=clip_cfg,
        latent_size=args.size // 8, video_length=args.frames,
        fast_init=True,
    )
    if not args.f32:
        # bf16 weights, matching the CLIs' --bf16 deployment: halves the
        # resident bundle (7.9 -> 4.0 GiB) and per-step weight HBM reads.
        # Training: the train state upcasts the TRAINABLE leaves back to
        # f32 masters (create_train_state frozen_dtype) — an f32 copy of
        # the frozen 4.8 GiB is what OOM'd the round-3/4 full-size train
        # row (17.65 GiB > 15.75 GiB HBM).
        modules.cast_params()
    init_s = time.time() - t0
    _note(f"init done in {init_s:.1f}s")
    return modules, init_s


def _camera_inputs(V, F, IMG):
    import jax.numpy as jnp

    from cvd_tpu import geometry as G
    from cvd_tpu.geometry.trajectories import default_intrinsics
    from cvd_tpu.io.tokenizer import HashTokenizer

    c2ws = G.circle_trajectory(V, F, camera_dist=0.4)
    K = default_intrinsics(V, F, IMG, IMG)
    intr = np.stack([K[:, 0, 0], K[:, 1, 1], K[:, 0, 2], K[:, 1, 2]], -1)
    plucker = G.ray_condition(
        jnp.asarray(intr, jnp.float32)[None],
        jnp.asarray(c2ws, jnp.float32)[None],
        IMG, IMG,
    )[0].reshape(V, F, IMG, IMG, 6)
    tok = HashTokenizer()
    ids = jnp.asarray(tok(["a cinematic fly-through of a modern house"]))
    neg = jnp.asarray(tok([""]))
    return c2ws, K, plucker, ids, neg


def _pair_F_mats(c2ws, K, F):
    import jax.numpy as jnp

    from cvd_tpu import geometry as G

    Fp = G.fundamental_between_views(
        jnp.asarray(c2ws[:F], jnp.float32), jnp.asarray(c2ws[F:], jnp.float32),
        jnp.asarray(K[:F], jnp.float32), jnp.asarray(K[F:], jnp.float32),
    )
    return jnp.stack([Fp, jnp.swapaxes(Fp, -1, -2)])


def _bench_train(args, modules, init_s):
    """Full-size training-iteration time: B=2 folded pairs -> 4 rows of
    16 frames @256px, epi/sync/auxiliary trainable, block remat — the
    BASELINE.md training row, now driver-visible."""
    import jax
    import jax.numpy as jnp

    from cvd_tpu.train.state import create_train_state
    from cvd_tpu.train.train_step import make_jitted_train_step

    from cvd_tpu import geometry as G

    F, IMG = args.frames, args.size
    B = 4  # 2 videos x 2 folded views, video-major like the train CLI fold()
    c2ws, K, plucker, ids, _ = _camera_inputs(4, F, IMG)
    # videos: (cam0, cam2) and (cam1, cam3); fold() lays rows out
    # [vid0_v0, vid1_v0, vid0_v1, vid1_v1], F per row maps it to its partner
    c2 = jnp.asarray(c2ws, jnp.float32).reshape(4, F, 4, 4)
    K2 = jnp.asarray(K, jnp.float32).reshape(4, F, 3, 3)
    F02 = G.fundamental_between_views(c2[0], c2[2], K2[0], K2[2])
    F13 = G.fundamental_between_views(c2[1], c2[3], K2[1], K2[3])
    F_mats = jnp.stack(
        [F02, F13, jnp.swapaxes(F02, -1, -2), jnp.swapaxes(F13, -1, -2)]
    )
    rng = np.random.default_rng(0)
    batch = {
        "text_ids": jnp.concatenate([ids] * B, axis=0),
        "plucker": jnp.asarray(plucker[:B], jnp.float32),
        "F_mats": F_mats,
    }
    if args.encode_in_step:
        # legacy path: VAE-encode all 64 frames inside every step (the
        # reference's in-loop no_grad encode, train_epi_control.py:514-523)
        batch["pixel_values"] = jnp.asarray(
            rng.standard_normal((B, F, IMG, IMG, 3), np.float32) * 0.5
        )
    else:
        # production path: pre-encoded latents cache (cache_latents knob,
        # data/latents_cache.py) — the step samples from stored posterior
        # moments; the per-epoch-repeated encoder conv stack is gone
        batch["latent_mean"] = jnp.asarray(
            rng.standard_normal((B, F, IMG // 8, IMG // 8, 4), np.float32)
        )
        batch["latent_logvar"] = jnp.full(
            (B, F, IMG // 8, IMG // 8, 4), -6.0, jnp.float32
        )
    state = create_train_state(
        modules.unet_params,
        frozen_dtype=None if args.f32 else jnp.bfloat16,
    )
    # drop the module's own reference so the pre-state tree can be freed
    # (frozen leaves alias the bf16 bundle; trainable leaves were upcast)
    modules.unet_params = state.params
    step_fn = make_jitted_train_step(modules, None, F_mat_size=IMG)

    _note("compiling training step")
    t0 = time.time()
    key = jax.random.key(0)
    state, metrics = step_fn(state, batch, key)
    _sync(metrics["loss"])
    compile_s = time.time() - t0
    _note(f"compile done in {compile_s:.1f}s")
    if args.warm_only:
        return {"metric": "warm_compile_seconds", "value": round(compile_s, 1),
                "unit": "s", "vs_baseline": 1.0, "mode": "train"}

    times = []
    for i in range(args.repeats):
        t0 = time.time()
        state, metrics = step_fn(state, batch, jax.random.key(i + 1))
        _sync(metrics["loss"])
        times.append(time.time() - t0)
        _note(f"train iter {i}: {times[-1] * 1000:.0f}ms")
    iter_ms = float(np.median(times)) * 1000.0
    result = {
        "metric": "train_iter_ms",
        "value": round(iter_ms, 1),
        "unit": "ms",
        # baseline: the 2026-08-17 manual run in BASELINE.md (576 ms);
        # >1.0 means faster than that run
        "vs_baseline": round(576.0 / iter_ms, 3),
        "compile_seconds": round(compile_s, 1),
        "init_seconds": round(init_s, 1),
        "config": f"B{B}rows-{F}f-{IMG}px-remat-"
                  f"{'f32' if args.f32 else 'bf16'}"
                  f"{'-encstep' if args.encode_in_step else '-latcache'}"
                  f"{'-' + args.remat_policy if args.remat_policy else ''}"
                  f"{'-tiny' if args.tiny else ''}",
    }
    if not args.tiny:
        # standard MFU convention: fwd+bwd = 3x forward model FLOPs; remat
        # recompute and the VAE encode are excluded (so this undercounts
        # the chip's actual work — it is model-FLOPs utilization, not HFU)
        from cvd_tpu.utils.flops import V5E_PEAK_BF16_FLOPS, cached_unet_flops

        fwd = cached_unet_flops(B, F, IMG // 8, bf16=not args.f32)
        if fwd:
            result["train_mfu"] = round(
                3.0 * fwd / (iter_ms / 1000.0) / V5E_PEAK_BF16_FLOPS, 3)
    return result


def _time_decode(modules, dtype, rows, frames, latent):
    """Median decode-only seconds via a small decode-only program (avoids a
    second ~200 s full-UNet server compile). Note: attributing e2e - decode
    entirely to the UNet denoise loop also charges CLIP/pose-encoder/
    scheduler/dispatch overhead to it — unet_step_ms is an upper bound."""
    import jax
    import jax.numpy as jnp

    from cvd_tpu.pipelines.common import decode_latents

    z = jnp.zeros((rows, frames, latent, latent, 4), dtype)
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
    return float(np.median(dts))


def _run_phase(cmd, timeout_s, to_stderr=False):
    """Run one measurement subprocess, stream its stdout through (so its
    partial/headline lines reach the driver even if WE are later killed),
    and return (last_parsed_json_or_None, short_error_or_None).

    to_stderr: route the child's lines to OUR stderr instead of stdout —
    used for the train phase so that a driver kill arriving mid-phase can
    never leave a train_iter_ms row as the last stdout line in place of
    the headline metric (the combined headline re-emits the train fields).
    """
    import subprocess
    import threading

    _note(f"phase: {' '.join(cmd[2:])}")
    last = None
    timed_out = threading.Event()
    try:
        # binary pipe: BufferedReader.readline yields at each newline,
        # while the text-mode TextIOWrapper chunk-buffers lines from a
        # still-running child. stderr=None inherits the real fd (a pytest
        # capsys replacement object has no fileno, so sys.stderr won't do).
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=None)

        def _kill():  # a silently hung child must not eat the whole window
            timed_out.set()
            proc.kill()

        timer = threading.Timer(timeout_s, _kill)
        timer.start()
        try:
            for raw in iter(proc.stdout.readline, b""):
                line = raw.decode("utf-8", "replace").rstrip("\n")
                if len(line) > 4096:  # never pass a giant line through
                    line = line[:4096]
                print(line, flush=True,
                      file=sys.stderr if to_stderr else sys.stdout)
                if line.startswith("{"):
                    try:
                        last = json.loads(line)
                    except ValueError:
                        pass
            rc = proc.wait(timeout=60)
        finally:
            timer.cancel()
        if timed_out.is_set():
            return last, f"phase timeout after {timeout_s}s"
        if rc != 0:
            return last, f"phase exited rc={rc}"
        return last, None
    except Exception as e:  # noqa: BLE001
        return last, _short_err(e)


def _orchestrate(args):
    """Default mode: inference + training + advanced phases as subprocesses.

    Each phase gets a FRESH TPU client — the round-3 failure was the train
    row OOMing inside the process that still held the inference session's
    buffers/executables. The compact combined headline is the last line.

    All phases share one global budget (CVD_BENCH_TOTAL_BUDGET_S, default
    2700 s): per-phase timeouts must never stack past the driver's own
    window (round-2 died rc=124 with zero output). A phase that does not
    fit the remaining budget is skipped with a short recorded reason."""
    t_start = time.time()
    budget_s = float(os.environ.get("CVD_BENCH_TOTAL_BUDGET_S", "2700"))

    def _left():
        return budget_s - (time.time() - t_start)

    common = ["--steps", str(args.steps), "--frames", str(args.frames),
              "--size", str(args.size), "--repeats", str(args.repeats)]
    for flag in ("f32", "tiny"):
        if getattr(args, flag):
            common.append("--" + flag.replace("_", "-"))
    if getattr(args, "pab", False):
        common.append("--pab")
        if args.pab_ranges:
            common += ["--pab-ranges", args.pab_ranges]
    # scan-layers is tri-state: forward only an EXPLICIT user choice; each
    # phase subprocess otherwise resolves its own default (inference ON,
    # train OFF — the stacked-param copy is HBM the train step can't spare)
    if args.scan_layers is True:
        common.append("--scan-layers")
    elif args.scan_layers is False:
        common.append("--no-scan-layers")
    py = [sys.executable, __file__]

    # cap: the inference phase must leave room for the advanced + train
    # phases even on a slow tunnel (its partial headline is emitted as soon
    # as the e2e number exists, so a timeout kill here still parses)
    headline, err = _run_phase(py + common + ["--no-train-row"],
                               timeout_s=int(min(2400, budget_s * 0.45)))
    if headline is None:
        # nothing parsable from the inference phase: emit a bounded error
        # line so the driver artifact is at least diagnosable
        _emit({"metric": "videos_per_min_per_chip", "value": None,
               "unit": "videos/min", "vs_baseline": None,
               "error": _short_err(err or "no output")})
        sys.exit(1)
    headline.pop("partial", None)

    # advanced-pipeline row FIRST (r04 lesson: it ran last and timed out —
    # the flagship N-view workload must land before the train row spends
    # budget): 4 views, multistep 3 = 75 UNet calls at batch 8
    if not args.tiny and _left() > 300:
        adv_cmd = py + ["--advanced", "--views", "4", "--multistep", "3",
                        "--steps", str(args.steps), "--frames",
                        str(args.frames), "--size", str(args.size),
                        "--repeats", "1", "--no-train-row"]
        if args.f32:
            adv_cmd.append("--f32")
        adv_row, aerr = _run_phase(
            adv_cmd, timeout_s=int(max(min(1100, _left() - 60), 60)),
            to_stderr=True)
        if adv_row is not None and \
                adv_row.get("metric") == "advanced_videos_per_min_per_chip":
            headline["advanced_videos_per_min"] = adv_row.get("value")
            for k_src, k_dst in (("unet_step_ms", "advanced_unet_step_ms"),
                                 ("mfu", "advanced_mfu"),
                                 ("config", "advanced_config")):
                if k_src in adv_row:
                    headline[k_dst] = adv_row[k_src]
        elif aerr:
            headline["advanced_row_error"] = _short_err(aerr)
    elif not args.tiny:
        headline["advanced_row_error"] = \
            "skipped: total bench budget exhausted before advanced phase"

    train_row, terr = None, None
    if _left() > 240:
        train_row, terr = _run_phase(
            py + common + ["--train"],
            timeout_s=int(max(min(900, _left() - 60), 60)), to_stderr=True)
    else:
        terr = "skipped: total bench budget exhausted before train phase"
    if (train_row is None or train_row.get("metric") != "train_iter_ms") \
            and not args.tiny and _left() > 240:
        # degrade instead of erroring into the artifact: a tiny-model train
        # row still proves the train path runs on the chip this round
        _note(f"full-size train row failed ({_short_err(terr or 'n/a')}); "
              "degrading to --tiny")
        train_row, terr2 = _run_phase(
            py + common + ["--train", "--tiny"],
            timeout_s=int(max(min(600, _left() - 60), 60)), to_stderr=True)
        if train_row is not None and train_row.get("metric") == "train_iter_ms":
            train_row["degraded"] = "tiny"
        terr = terr or terr2
    if train_row is not None and train_row.get("metric") == "train_iter_ms":
        headline["train_iter_ms"] = train_row.get("value")
        if train_row.get("degraded"):
            headline["train_row_degraded"] = train_row["degraded"]
        if "train_mfu" in train_row:
            headline["train_mfu"] = train_row["train_mfu"]
        if "compile_seconds" in train_row:
            headline["train_compile_seconds"] = train_row["compile_seconds"]
    if terr:
        headline["train_row_error"] = _short_err(terr)

    _emit(headline)  # the absolute last stdout line, bounded by construction


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
    p.add_argument("--acc-batched", action="store_true",
                   help="run accumulate pairings as ONE UNet call at batch "
                        "2V*acc instead of an inner scan (A/B experiment)")
    p.add_argument("--train", action="store_true",
                   help="bench one full training iteration instead")
    p.add_argument("--remat-policy", default="", dest="remat_policy",
                   help="train row: UNetConfig.remat_policy — '' replays "
                        "whole blocks in the backward (min memory; the "
                        "only policy that fits full-size on a 16 GB "
                        "v5e, see BASELINE.md); 'dots' saves matmul+conv "
                        "outputs; 'dots_small' excludes tensors >96 MiB "
                        "(CVD_TPU_REMAT_SAVE_MAX_BYTES) — both for "
                        "larger-HBM parts")
    p.add_argument("--encode-in-step", action="store_true",
                   help="train row: VAE-encode pixels inside the step "
                        "(reference behavior) instead of the default "
                        "pre-encoded-latents-cache input")
    p.add_argument("--scan-layers", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="UNetConfig.scan_identical_layers: dedup identical "
                        "UNet layers into lax.scan bodies. Costs ~1 GB "
                        "resident HBM in stacked params. Default: ON for "
                        "simple inference (measured 2026-08-19: warm "
                        "compile 208.8 -> 134.7 s, step time unchanged "
                        "within noise), OFF for --train/--advanced where "
                        "HBM is the binding constraint")
    p.add_argument("--split-decode", action="store_true",
                   help="run denoise and VAE decode as TWO separately "
                        "cached executables (compile-diet A/B: a UNet "
                        "kernel change no longer invalidates the decode "
                        "cache entry; also gives exact phase timing)")
    p.add_argument("--warm-only", action="store_true",
                   help="build + compile + exit: warms the persistent XLA "
                        "cache after kernel changes so the next (driver) "
                        "bench run skips the cold compile")
    p.add_argument("--step-chunk", type=int, default=None,
                   help="advanced mode: execute the denoise scan as "
                        "ceil(steps/N) separate runs of one compiled chunk "
                        "program (identical math; keeps any single device-"
                        "program execution short — the remote worker dies "
                        "on ~7 min single executions)")
    p.add_argument("--pab", action="store_true",
                   help="Pyramid Attention Broadcast: reuse cached "
                        "attention outputs on statically scheduled steps "
                        "(simple + advanced; forces --no-scan-layers)")
    p.add_argument("--pab-ranges", type=str, default="",
                   help="e.g. 'spatial=2,cross=3,temporal=2,epi=1'")
    p.add_argument("--no-train-row", action="store_true",
                   help="skip the training-iteration phase the default "
                        "mode appends after the inference result")
    args = p.parse_args()

    if not (args.advanced or args.train or args.split_decode
            or args.warm_only or args.no_train_row):
        # default mode: orchestrate the two measurement subprocesses; this
        # parent never imports jax (see _orchestrate docstring)
        _orchestrate(args)
        return

    if args.scan_layers is None:
        # measured default (scripts/tpu_measure.sh, 2026-08-19): scan
        # dedup wins 35% of warm compile at zero step-time cost for the
        # simple pipeline; train/advanced keep the HBM instead. PAB caches
        # are per-layer state the scan-dedup body can't carry.
        args.scan_layers = not (args.advanced or args.train
                                or getattr(args, "pab", False))
    elif args.scan_layers and getattr(args, "pab", False):
        p.error("--pab requires --no-scan-layers (per-layer caches)")

    from cvd_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    _init_backend()

    import jax
    import jax.numpy as jnp

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    modules, init_s = _build_modules(args, dtype)

    if args.train:
        _emit(_bench_train(args, modules, init_s))
        return

    V = args.views if args.advanced else 2
    F, IMG = args.frames, args.size
    c2ws, K, plucker, ids, neg = _camera_inputs(V, F, IMG)

    pab_cfg = None
    if args.pab:
        from cvd_tpu.pipelines.pab import PABConfig

        pab_cfg = (PABConfig.from_string(args.pab_ranges)
                   if args.pab_ranges else PABConfig())

    if args.advanced:
        from cvd_tpu.pipelines.advanced import AdvancedPipeline

        pipe_a = AdvancedPipeline(modules, F_mat_size=IMG,
                                  accumulate_batched=args.acc_batched)
        # the advanced jit donates the plucker buffer; ship a fresh
        # device-side copy per call so repeats don't hit a deleted buffer
        run_pipe = lambda key, decode: pipe_a(
            ids, neg, jnp.copy(plucker),
            c2w=jnp.asarray(c2ws, jnp.float32),
            K_mats=jnp.asarray(K, jnp.float32),
            num_inference_steps=args.steps, multistep=args.multistep,
            accumulate_step=args.accumulate, rng=key, decode=decode,
            step_chunk=args.step_chunk, pab_config=pab_cfg,
        )
    else:
        from cvd_tpu.pipelines.simple import SimplePipeline

        F_mats = _pair_F_mats(c2ws, K, F)
        pipe = SimplePipeline(modules, F_mat_size=IMG)
        run_pipe = lambda key, decode: pipe(ids, neg, plucker, F_mats,
                                            num_inference_steps=args.steps,
                                            rng=key, decode=decode,
                                            pab_config=pab_cfg)

    if args.split_decode:
        # two independently cached executables: a denoise-only pipeline and
        # a decode-only program. A UNet kernel change no longer invalidates
        # the decode executable's cache entry, and the phase split makes
        # unet_step_ms exact (no cross-program decode approximation).
        from cvd_tpu.pipelines.common import decode_latents

        dec = jax.jit(lambda vp, z: decode_latents(modules, vp, z))
        phase_times = []

        def run(key):
            t0 = time.time()
            z = _sync(run_pipe(key, False))
            t1 = time.time()
            v = _sync(dec(modules.vae_params, z))
            phase_times.append((t1 - t0, time.time() - t1))
            return v
    else:
        run = lambda key: run_pipe(key, True)

    _note("compiling end-to-end pipeline")
    t0 = time.time()
    _sync(run(jax.random.key(0)))
    compile_s = time.time() - t0
    _note(f"compile done in {compile_s:.1f}s")

    if args.warm_only:
        if not args.split_decode:
            # also warm the decode-only program the full bench will time
            # (both modes: the advanced bench calls _time_decode too)
            _time_decode(modules, dtype, V, args.frames, args.size // 8)
        _emit({"metric": "warm_compile_seconds", "value": round(compile_s, 1),
               "unit": "s", "vs_baseline": 1.0,
               "mode": "advanced" if args.advanced else "simple"})
        return

    times = []
    for i in range(args.repeats):
        t0 = time.time()
        _sync(run(jax.random.key(i + 1)))
        times.append(time.time() - t0)
        _note(f"e2e repeat {i}: {times[-1]:.2f}s")
    e2e_s = float(np.median(times))

    # steady-state throughput: enqueue `repeats` generations back-to-back and
    # sync ONCE — async dispatch overlaps host work and VAE decode with the
    # next clip's denoise, which is the production serving rate (the
    # per-clip latency above stays the headline `value`)
    steady_s = None
    if args.repeats > 1 and not args.split_decode:
        t0 = time.time()
        outs = [run_pipe(jax.random.key(100 + i), True)
                for i in range(args.repeats)]
        for o in outs:
            _sync(o)
        steady_s = (time.time() - t0) / args.repeats
        _note(f"steady-state: {steady_s:.2f}s/clip over {args.repeats} clips")

    config = (f"{V}view-{F}f-{IMG}px-{args.steps}steps-"
              + (f"ms{args.multistep}-acc{args.accumulate}"
                 + ("b-" if args.acc_batched else "-") if args.advanced else "")
              + ("f32" if args.f32 else "bf16") + ("-tiny" if args.tiny else "")
              + ("-split" if args.split_decode else "")
              + ("-scan" if args.scan_layers else "")
              + ("-pab" if getattr(args, "pab", False) else "")
              + (f"-ck{args.step_chunk}" if getattr(args, "step_chunk", None)
                 else ""))
    metric = ("advanced_videos_per_min_per_chip" if args.advanced
              else "videos_per_min_per_chip")
    videos_per_min = V / e2e_s * 60.0
    result = {
        "metric": metric,
        "value": round(videos_per_min, 3),
        "unit": "videos/min",
        "vs_baseline": round(videos_per_min / 6.0, 3),
        "e2e_seconds": round(e2e_s, 3),
        "compile_seconds": round(compile_s, 1),
        "init_seconds": round(init_s, 1),
        "config": config,
    }
    if steady_s:
        result["steady_state_videos_per_min"] = round(V / steady_s * 60.0, 3)
        result["steady_state_seconds_per_clip"] = round(steady_s, 3)
    # partial emission: if the decode timing / MFU accounting below dies at
    # a driver timeout, this line is already parsable
    _emit(dict(result, partial=True))

    if args.advanced and args.acc_batched:
        # batched accumulate: ONE UNet call per multistep iteration at
        # batch 2V*acc (vs the scan path's `accumulate` calls at 2V) —
        # unet_calls / unet_step_ms / MFU must reflect the real launch
        # count and per-call batch or the A/B comparison is skewed
        ncalls = args.steps * args.multistep
        batch_per_call = 2 * V * args.accumulate
    else:
        ncalls = args.steps * (
            args.multistep * args.accumulate if args.advanced else 1
        )
        batch_per_call = 2 * V
    if args.split_decode:
        # exact per-phase medians from the repeat loop (the compile call's
        # inflated sample is excluded by slicing to the last `repeats`)
        ph = phase_times[-args.repeats:]
        denoise_s = float(np.median([a for a, _ in ph]))
        decode_s = float(np.median([b for _, b in ph]))
        step_s = denoise_s / ncalls
        includes = "clip+pose+scheduler (in-program; exact split timing)"
    else:
        # UNet step time = (e2e - VAE decode) / UNet calls. Decode is timed
        # with a small decode-only program instead of recompiling the whole
        # pipeline without decode (saves a second ~200 s full-UNet server
        # compile); the residual (CLIP/pose/scheduler/dispatch) is charged to
        # the step, so unet_step_ms is an upper bound (step_ms_includes).
        _note("compiling decode-only variant")
        decode_s = _time_decode(modules, dtype, V, args.frames, args.size // 8)
        step_s = (e2e_s - decode_s) / ncalls
        includes = "clip+pose+scheduler overhead (upper bound)"
    result.update({
        "unet_step_ms": round(step_s * 1000.0, 2),
        "unet_calls": ncalls,
        "decode_seconds": round(decode_s, 3),
        "step_ms_includes": includes,
    })
    if not args.tiny:
        # achieved TFLOP/s + MFU of the denoise step (HLO-exact FLOP count
        # from utils.flops, CPU-subprocess cached; v5e bf16 peak 197 TF/s);
        # batch per UNet call is 2V (views x CFG), or 2V*acc when
        # --acc-batched folds the accumulate pairings into one call
        from cvd_tpu.utils.flops import V5E_PEAK_BF16_FLOPS, cached_unet_flops

        flops = cached_unet_flops(batch_per_call, args.frames, args.size // 8,
                                  bf16=not args.f32)
        if flops:
            result["unet_step_tflops"] = round(flops / 1e12, 2)
            result["achieved_tflops_per_s"] = round(flops / step_s / 1e12, 1)
            result["mfu"] = round(flops / step_s / V5E_PEAK_BF16_FLOPS, 3)
    _emit(result)



if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        # one retry, ONLY for transient backend failures (a freshly
        # restarted TPU worker can fail/crash the first client after it);
        # deterministic errors re-raise immediately with their traceback
        if not _is_transient(e):
            raise
        _note(f"transient failure ({type(e).__name__}: {e}); retrying once")
        time.sleep(30)
        main()
