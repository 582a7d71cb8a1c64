"""utils/trace_report.py — device-op breakdown parser.

The capture side is exercised on hardware (tools/trace_report.py, results
in NOTES.md); here the parser is pinned against a synthetic Perfetto
trace.json.gz with the exact structure the axon TPU backend emits
(verified 2026-08-17: '/device:TPU:0' process, 'XLA Ops'/'XLA Modules'
threads, complete 'X' events with microsecond 'dur')."""

import gzip
import json
import os

import pytest

from clip_for_dl_tpu.utils.trace_report import device_op_table, format_table


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


EVENTS = [
    {"ph": "M", "pid": 3, "name": "process_name",
     "args": {"name": "/device:TPU:0"}},
    {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
     "args": {"name": "XLA Modules"}},
    {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
     "args": {"name": "XLA Ops"}},
    {"ph": "M", "pid": 1, "name": "process_name",
     "args": {"name": "python"}},
    # device ops: two executions of fusion.1, one of convolution.2
    {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.1", "dur": 1500.0},
    {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.1", "dur": 500.0},
    {"ph": "X", "pid": 3, "tid": 3, "name": "convolution.2", "dur": 1000.0},
    # module-level event
    {"ph": "X", "pid": 3, "tid": 2, "name": "jit_step", "dur": 3100.0},
    # host event with a huge duration must NOT pollute the device table
    {"ph": "X", "pid": 1, "tid": 9, "name": "hostwork", "dur": 9e6},
]


def test_device_op_table_aggregates_only_device_ops(tmp_path):
    report = device_op_table(_write_trace(tmp_path, EVENTS))
    assert report["device_total_ms"] == 3.0
    assert report["ops"][0] == {
        "name": "fusion.1", "total_ms": 2.0, "count": 2, "pct": 66.7,
    }
    assert report["ops"][1]["name"] == "convolution.2"
    assert [m["name"] for m in report["modules"]] == ["jit_step"]
    table = format_table(report)
    assert "fusion.1" in table and "hostwork" not in table


def test_device_op_table_top_limit(tmp_path):
    report = device_op_table(_write_trace(tmp_path, EVENTS), top=1)
    assert len(report["ops"]) == 1


def test_missing_capture_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        device_op_table(str(tmp_path / "nope"))
