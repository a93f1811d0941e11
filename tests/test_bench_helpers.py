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
