"""Unit tests for bench.py's robustness helpers.

The round-2 driver bench died in a wedged backend init (BENCH_r02: rc=124,
parsed=null) because there was no init deadline and the retry fired for
every exception. These tests pin the fix: the SIGALRM watchdog fires and
is classified transient (so the bounded health-retry loop handles it), and
deterministic failures are NOT classified transient (so they re-raise with
their original traceback instead of burning the driver's window twice).
"""
import json
import signal
import subprocess
import sys
import time

import pytest

import bench


# ---------------------------------------------------------- _is_transient
@pytest.mark.parametrize("msg", [
    "UNAVAILABLE: no TPU backend",
    "DEADLINE_EXCEEDED: rpc timed out",
    "RESOURCE_EXHAUSTED: TPU backend error",
    "TPU worker process crashed or restarted",
    "Connection reset by peer",
    "Socket closed",
    "failed to connect to all addresses",
    "watchdog: backend init + first device op exceeded 150s",
])
def test_transient_markers_retryable(msg):
    assert bench._is_transient(RuntimeError(msg))


@pytest.mark.parametrize("exc", [
    ValueError("operands could not be broadcast together"),
    TypeError("unsupported operand type(s)"),
    RuntimeError("Mosaic lowering failed: bad block shape"),
    # OOM by program design is deterministic — retrying doubles time-to-fail
    RuntimeError("RESOURCE_EXHAUSTED: Out of memory while trying to "
                 "allocate 17179869184 bytes"),
])
def test_deterministic_failures_not_retryable(exc):
    assert not bench._is_transient(exc)


def test_transient_matches_exception_type_name_too():
    """The marker scan covers 'TypeName: message' so exception classes whose
    NAME carries the marker (e.g. a wrapped XlaRuntimeError subclass whose
    str lacks it) still match."""
    class UnavailableError(Exception):
        pass

    # message alone has no marker, but the rendered form is
    # "UnavailableError: ..." — no match expected (marker is 'UNAVAILABLE'
    # uppercase); pin that case-sensitivity so a future .lower() doesn't
    # silently widen the retry net.
    assert not bench._is_transient(UnavailableError("backend gone"))


# -------------------------------------------------------------- _watchdog
def test_watchdog_fires_and_is_transient():
    with pytest.raises(bench._WatchdogTimeout) as ei:
        with bench._watchdog(1, "sleepy op"):
            time.sleep(5)
    assert "sleepy op" in str(ei.value)
    assert bench._is_transient(ei.value)  # the bounded retry loop handles it


def test_watchdog_no_fire_and_handler_restored():
    prev = signal.getsignal(signal.SIGALRM)
    with bench._watchdog(30, "fast op"):
        pass
    assert signal.getsignal(signal.SIGALRM) is prev
    assert signal.alarm(0) == 0  # no pending alarm leaked


def test_watchdog_restores_handler_after_fire():
    prev = signal.getsignal(signal.SIGALRM)
    with pytest.raises(bench._WatchdogTimeout):
        with bench._watchdog(1, "x"):
            time.sleep(5)
    assert signal.getsignal(signal.SIGALRM) is prev


# ------------------------------------------------------- emission contract
def test_emit_json_lines_parse(capsys):
    bench._emit({"metric": "videos_per_min_per_chip", "value": 1.0,
                 "unit": "videos/min", "vs_baseline": 0.2, "partial": True})
    bench._emit({"metric": "videos_per_min_per_chip", "value": 1.0,
                 "unit": "videos/min", "vs_baseline": 0.2})
    lines = capsys.readouterr().out.strip().splitlines()
    rows = [json.loads(l) for l in lines]
    assert rows[0]["partial"] is True
    # the driver keeps the LAST parsable line: it must carry the metric
    assert rows[-1]["metric"] == "videos_per_min_per_chip"
    assert "value" in rows[-1] and "vs_baseline" in rows[-1]


def test_bench_import_does_not_touch_jax():
    """bench.py must stay importable (and its helpers testable) without
    initialising any backend: a wedged tunnel at import time would defeat
    the watchdog. Checked in a subprocess so this test's own process state
    can't mask a regression."""
    import os

    code = ("import sys; import bench; "
            "sys.exit(1 if 'jax' in sys.modules else 0)")
    r = subprocess.run(
        [sys.executable, "-c", code],
        cwd=os.path.dirname(os.path.abspath(bench.__file__)),
        capture_output=True, text=True, timeout=60,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert r.returncode == 0, r.stderr


# ------------------------------------------------------------- _short_err
def test_short_err_truncates_xla_hbm_dump():
    """BENCH_r03 post-mortem: a RESOURCE_EXHAUSTED message carrying XLA's
    multi-hundred-KB per-buffer HBM dump was embedded verbatim in the final
    stdout line and blew the driver's tail capture. Every emitted error
    field must be first-line-only and <=200 chars."""
    dump = ("RESOURCE_EXHAUSTED: Out of memory while trying to allocate "
            "16106127360 bytes." + "x" * 500 + "\n"
            + "\n".join(f"  buffer {i}: 123MB f32[4,320,16,32,32]"
                        for i in range(5000)))
    s = bench._short_err(RuntimeError(dump))
    assert len(s) <= 200
    assert "\n" not in s
    assert s.startswith("RuntimeError: RESOURCE_EXHAUSTED")


def test_short_err_accepts_strings_and_empty():
    assert bench._short_err("phase timeout after 900s") == \
        "phase timeout after 900s"
    assert bench._short_err("") == "unknown error"


# ------------------------------------------------------------- _run_phase
def _fake_child(code):
    return [sys.executable, "-c", code]


def test_run_phase_streams_and_parses_last_json(capsys):
    code = ("import json\n"
            "print('[bench] note line')\n"
            "print(json.dumps({'metric': 'm', 'value': 1, 'partial': True}))\n"
            "print(json.dumps({'metric': 'm', 'value': 2}))\n")
    last, err = bench._run_phase(_fake_child(code), timeout_s=60)
    assert err is None
    assert last == {"metric": "m", "value": 2}
    out = capsys.readouterr().out.splitlines()
    # every child line was streamed through (driver sees partials live)
    assert "[bench] note line" in out
    assert json.loads(out[-1])["value"] == 2


def test_run_phase_nonzero_exit_keeps_partial(capsys):
    code = ("import json, sys\n"
            "print(json.dumps({'metric': 'm', 'value': 7, 'partial': True}))\n"
            "sys.exit(3)\n")
    last, err = bench._run_phase(_fake_child(code), timeout_s=60)
    assert last == {"metric": "m", "value": 7, "partial": True}
    assert err == "phase exited rc=3"


def test_run_phase_kills_hung_child(capsys):
    code = ("import json, time\n"
            "print(json.dumps({'metric': 'm', 'value': 5}), flush=True)\n"
            "time.sleep(600)\n")
    t0 = time.time()
    # interpreter startup is ~2.5s in this container; 15s is ample for the
    # child to print its line yet far below the 600s it would hang for
    last, err = bench._run_phase(_fake_child(code), timeout_s=15)
    assert time.time() - t0 < 60
    assert last == {"metric": "m", "value": 5}
    assert "timeout" in err


def test_run_phase_truncates_giant_lines(capsys):
    code = "print('y' * 500000)"
    bench._run_phase(_fake_child(code), timeout_s=60)
    out = capsys.readouterr().out.splitlines()
    assert max(len(l) for l in out) <= 4096


# ----------------------------------------------------------- _orchestrate
def _orch_args(**kw):
    import argparse

    base = dict(steps=25, frames=16, size=256, repeats=3, f32=False,
                tiny=False, scan_layers=False)
    base.update(kw)
    return argparse.Namespace(**base)


def test_orchestrate_headline_is_last_and_bounded(monkeypatch, capsys):
    calls = []

    def fake_run_phase(cmd, timeout_s, to_stderr=False):
        calls.append(cmd)
        if "--train" in cmd:
            return ({"metric": "train_iter_ms", "value": 580.0,
                     "train_mfu": 0.2, "compile_seconds": 30.0}, None)
        if "--advanced" in cmd:
            return ({"metric": "advanced_videos_per_min_per_chip",
                     "value": 6.35, "unet_step_ms": 558.0, "mfu": 0.4,
                     "config": "4view"}, None)
        return ({"metric": "videos_per_min_per_chip", "value": 18.8,
                 "unit": "videos/min", "vs_baseline": 3.1,
                 "partial": True}, None)

    monkeypatch.setattr(bench, "_run_phase", fake_run_phase)
    bench._orchestrate(_orch_args())
    lines = capsys.readouterr().out.strip().splitlines()
    final = json.loads(lines[-1])
    assert final["metric"] == "videos_per_min_per_chip"
    assert final["train_iter_ms"] == 580.0
    assert final["train_mfu"] == 0.2
    assert final["advanced_videos_per_min"] == 6.35
    assert final["advanced_unet_step_ms"] == 558.0
    assert "partial" not in final  # the re-emitted headline is final
    assert len(lines[-1]) < 4096
    assert len(calls) == 3  # inference, train, advanced; no tiny retry


def test_orchestrate_degrades_train_to_tiny(monkeypatch, capsys):
    calls = []

    def fake_run_phase(cmd, timeout_s, to_stderr=False):
        calls.append(cmd)
        if "--train" in cmd and "--tiny" in cmd:
            return ({"metric": "train_iter_ms", "value": 33.0}, None)
        if "--train" in cmd:
            return (None, "phase exited rc=1")
        if "--advanced" in cmd:
            return (None, "phase exited rc=1")
        return ({"metric": "videos_per_min_per_chip", "value": 18.8}, None)

    monkeypatch.setattr(bench, "_run_phase", fake_run_phase)
    bench._orchestrate(_orch_args())
    final = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert final["train_iter_ms"] == 33.0
    assert final["train_row_degraded"] == "tiny"
    assert final["train_row_error"] == "phase exited rc=1"
    assert final["advanced_row_error"] == "phase exited rc=1"
    assert len(calls) == 4


def test_orchestrate_train_failure_never_floods_headline(monkeypatch, capsys):
    giant = "RESOURCE_EXHAUSTED: " + "b" * 100000

    def fake_run_phase(cmd, timeout_s, to_stderr=False):
        if "--train" in cmd:
            return (None, giant)
        return ({"metric": "videos_per_min_per_chip", "value": 18.8}, None)

    monkeypatch.setattr(bench, "_run_phase", fake_run_phase)
    bench._orchestrate(_orch_args())
    last = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(last) < 1000
    final = json.loads(last)
    assert final["metric"] == "videos_per_min_per_chip"
    assert len(final["train_row_error"]) <= 200


def test_orchestrate_budget_skips_later_phases(monkeypatch, capsys):
    """Per-phase timeouts must never stack past the driver's window: with
    the global budget exhausted after the inference phase, the train and
    advanced phases are skipped with short recorded reasons."""
    calls = []

    def fake_run_phase(cmd, timeout_s, to_stderr=False):
        calls.append(cmd)
        return ({"metric": "videos_per_min_per_chip", "value": 18.8}, None)

    monkeypatch.setattr(bench, "_run_phase", fake_run_phase)
    monkeypatch.setenv("CVD_BENCH_TOTAL_BUDGET_S", "1")
    bench._orchestrate(_orch_args())
    final = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(calls) == 1  # only the inference phase ran
    assert "budget exhausted" in final["train_row_error"]
    assert "budget exhausted" in final["advanced_row_error"]
    assert final["value"] == 18.8


def test_orchestrate_no_inference_headline_exits_nonzero(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_run_phase",
                        lambda cmd, timeout_s, to_stderr=False: (None, "phase exited rc=137"))
    with pytest.raises(SystemExit) as ei:
        bench._orchestrate(_orch_args())
    assert ei.value.code == 1
    final = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert final["error"] == "phase exited rc=137"
    assert final["metric"] == "videos_per_min_per_chip"


def test_run_phase_to_stderr_keeps_stdout_clean(capsys):
    """The train phase streams to stderr: a driver kill mid-train-phase must
    never leave a train_iter_ms row as the last STDOUT line in place of the
    headline metric."""
    code = ("import json\n"
            "print(json.dumps({'metric': 'train_iter_ms', 'value': 9}))\n")
    last, err = bench._run_phase(_fake_child(code), timeout_s=60,
                                 to_stderr=True)
    assert err is None and last == {"metric": "train_iter_ms", "value": 9}
    assert capsys.readouterr().out == ""  # nothing on stdout
