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


GROUPED_EVENTS = EVENTS[:5] + [
    # two layers of the same scope must collapse into one layer_* group;
    # jit()/jvp() wrappers dropped, bwd detected from transpose(jvp
    {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.10", "dur": 1000.0,
     "args": {"tf_op": "jit(step)/jvp(M)/M.encode/tower/layer_0/mlp/"
              "dot_general:", "hlo_category": "fusion"}},
    {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.11", "dur": 3000.0,
     "args": {"tf_op": "jit(step)/jvp(M)/M.encode/tower/layer_1/mlp/"
              "dot_general:", "hlo_category": "fusion"}},
    {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.12", "dur": 2000.0,
     "args": {"tf_op": "jit(step)/transpose(jvp(M))/M.encode/tower/"
              "layer_0/mlp/dot_general:", "hlo_category": "fusion"}},
    # named_scope region
    {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.13", "dur": 500.0,
     "args": {"tf_op": "jit(step)/optimizer_update/add:",
              "hlo_category": "loop fusion"}},
    # scope-less DMA op lands under its hlo_category
    {"ph": "X", "pid": 3, "tid": 3, "name": "copy-done.1", "dur": 250.0,
     "args": {"hlo_category": "copy-done"}},
]


def test_scope_groups(tmp_path):
    report = device_op_table(
        _write_trace(tmp_path, GROUPED_EVENTS), group_depth=4
    )
    groups = {g["name"]: g for g in report["groups"]}
    fwd = groups["fwd M.encode/tower/layer_*/mlp"]
    assert fwd["total_ms"] == 4.0 and fwd["count"] == 2  # layers collapsed
    bwd = groups["bwd M.encode/tower/layer_*/mlp"]
    assert bwd["total_ms"] == 2.0
    # outside-the-grad scopes (no jvp wrapper) carry no fwd/bwd prefix —
    # the optimizer is neither forward nor backward pass time
    assert groups["optimizer_update/add:"]["total_ms"] == 0.5
    assert groups["<untraced> copy-done"]["total_ms"] == 0.25
    # ops with no args at all (the base EVENTS) still group somewhere
    assert sum(g["total_ms"] for g in report["groups"]) == pytest.approx(
        report["device_total_ms"]
    )
    table = format_table(report)
    assert "by scope" in table and "layer_*" in table


def test_group_depth_zero_omits_groups(tmp_path):
    report = device_op_table(_write_trace(tmp_path, GROUPED_EVENTS))
    assert "groups" not in report
