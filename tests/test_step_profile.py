"""Contract tests for scripts/step_profile.py's perfetto-trace parser.

The profiler (VERDICT r2 weak #3: settle the analytic HBM-floor claim
with measured data) buckets hlo_op-annotated events from the perfetto
JSON that `jax.profiler.start_trace(..., create_perfetto_trace=True)`
writes. These tests pin the two track layouts it must handle:

  * TPU: per-op events on a `/device:TPU:N` process track;
  * CPU backend: per-op events on XLA executor threads under
    `/host:CPU` (no device track) — used for off-TPU smoke runs.

Host wrapper events (`$...` python frames, ThunkExecutor spans) carry no
`hlo_op` arg and must be excluded, otherwise step totals double-count.
"""
from __future__ import annotations

import gzip
import importlib.util
import json
import os
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def sp():
    spec = importlib.util.spec_from_file_location(
        "step_profile", os.path.join(_ROOT, "scripts", "step_profile.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_trace(tmpdir, events):
    d = os.path.join(tmpdir, "plugins", "profile", "run1")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "perfetto_trace.json.gz")
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)
    return tmpdir


def _meta(pid, name):
    return {"ph": "M", "pid": pid, "name": "process_name",
            "args": {"name": name}}


def _op(pid, tid, name, dur):
    return {"ph": "X", "pid": pid, "tid": tid, "name": name, "dur": dur,
            "args": {"hlo_op": name, "hlo_module": "jit_step"}}


def test_device_track_preferred(sp, tmp_path):
    """With a /device: track present, host hlo events are ignored."""
    events = [
        _meta(1, "/device:TPU:0"),
        _meta(2, "/host:CPU"),
        _op(1, 10, "fusion.7", 120.0),
        _op(1, 10, "dot_general.3", 80.0),
        _op(2, 20, "dot_general.3", 9999.0),  # host-side copy of the op
        # wrapper events without hlo_op must never be counted
        {"ph": "X", "pid": 2, "tid": 21, "name": "ThunkExecutor::Execute",
         "dur": 5e6, "args": {"run_id": "1"}},
        {"ph": "X", "pid": 2, "tid": 21, "name": "$numpy asarray", "dur": 4e6},
    ]
    kind, ops = sp.parse_perfetto(str(_write_trace(str(tmp_path), events)))
    assert kind == "device"
    assert sorted(ops) == [("dot_general.3", 80.0), ("fusion.7", 120.0)]


def test_host_hlo_fallback(sp, tmp_path):
    """CPU backend: no device track -> hlo_op events are used, flagged."""
    events = [
        _meta(2, "/host:CPU"),
        _op(2, 20, "wrapped_reduce-window.7", 300.0),
        _op(2, 20, "broadcast_multiply_fusion.8", 50.0),
        {"ph": "X", "pid": 2, "tid": 21, "name": "ThunkExecutor::Execute",
         "dur": 5e6, "args": {"run_id": "1"}},
    ]
    kind, ops = sp.parse_perfetto(str(_write_trace(str(tmp_path), events)))
    assert kind == "host_hlo"
    assert len(ops) == 2


def test_no_hlo_events_raises(sp, tmp_path):
    events = [_meta(2, "/host:CPU"),
              {"ph": "X", "pid": 2, "tid": 21, "name": "python", "dur": 1.0}]
    with pytest.raises(RuntimeError, match="hlo_op"):
        sp.parse_perfetto(str(_write_trace(str(tmp_path), events)))


def test_bucketing(sp):
    cases = {
        # bare Mosaic calls carry no kernel identity -> own bucket, never
        # charged to attention
        "tpu_custom_call.42": "mosaic_unattributed",
        # named Mosaic kernels (census: _fwd / _gn / _ln_mm)
        "flash_attention_fwd.3": "attention_kernels",
        "_gn.17": "ln_groupnorm",
        "_ln_mm.5": "ln_groupnorm",
        "fused_group_norm_silu": "ln_groupnorm",
        "dot_general.3": "conv_matmul",
        "conv_general_dilated.9": "conv_matmul",
        # dtype casts must NOT be counted as convolutions
        "convert.123": "elementwise_fusion",
        "copy.1": "copies_reshapes",
        "wrapped_reduce-window.7": "pooling",
        "broadcast_multiply_fusion.8": "elementwise_fusion",
        "fusion.130": "elementwise_fusion",
        "tuple.2": "other",
    }
    for name, want in cases.items():
        assert sp.bucket_of(name, "") == want, name
