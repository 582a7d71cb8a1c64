"""Device-op breakdown from a jax.profiler trace (SURVEY.md §5.1).

`utils.profiling.trace` writes a Perfetto/XPlane capture; this module turns
the `*.trace.json.gz` artifact into the table perf work actually needs: per
XLA-op device time, sorted, with %-of-device-total — the "trace-backed
roofline" evidence for claims like "the ViT tower is scheduling-bound"
(VERDICT r1). Verified against the axon TPU backend: the capture carries a
`/device:TPU:N` process with an "XLA Ops" thread whose complete events are
the compiled ops (fusions, convolutions, copies) with microsecond
durations.

Host-side python/runtime events are excluded by construction (only events
on device-process "XLA Ops" threads are aggregated).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from typing import Any, Dict, List, Optional


def _load_trace_json(log_dir: str) -> Dict[str, Any]:
    pattern = os.path.join(
        log_dir, "plugins", "profile", "*", "*.trace.json.gz"
    )
    paths = sorted(glob.glob(pattern))
    if not paths:
        raise FileNotFoundError(
            f"no trace.json.gz under {log_dir!r} — did the capture run?"
        )
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)


def device_op_table(
    log_dir: str, top: Optional[int] = None
) -> Dict[str, Any]:
    """Aggregate device-side op durations from the newest capture.

    Returns {"device_total_ms", "ops": [{"name", "total_ms", "count",
    "pct"}...], "modules": [...]} — ops from "XLA Ops" threads, whole
    executables from "XLA Modules" threads, of every device process.
    """
    data = _load_trace_json(log_dir)
    events = data.get("traceEvents", [])

    device_pids = set()
    thread_names: Dict[tuple, str] = {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            if "/device:" in e.get("args", {}).get("name", ""):
                device_pids.add(e["pid"])
        elif e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e["args"]["name"]

    ops: Dict[str, List[float]] = {}
    modules: Dict[str, List[float]] = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        lane = thread_names.get((e["pid"], e.get("tid")), "")
        bucket = (
            ops if lane == "XLA Ops"
            else modules if lane == "XLA Modules"
            else None
        )
        if bucket is None:
            continue
        entry = bucket.setdefault(e["name"], [0.0, 0])
        entry[0] += float(e.get("dur", 0.0))  # microseconds
        entry[1] += 1

    total_us = sum(t for t, _ in ops.values())

    def rows(bucket: Dict[str, List[float]], denom: float):
        out = [
            {
                "name": name,
                "total_ms": round(t / 1e3, 3),
                "count": c,
                "pct": round(100.0 * t / denom, 1) if denom else 0.0,
            }
            for name, (t, c) in bucket.items()
        ]
        out.sort(key=lambda r: -r["total_ms"])
        return out[:top] if top else out

    return {
        "device_total_ms": round(total_us / 1e3, 3),
        "ops": rows(ops, total_us),
        "modules": rows(
            modules, sum(t for t, _ in modules.values())
        ),
    }


def format_table(report: Dict[str, Any], top: int = 20) -> str:
    lines = [
        f"device op time total: {report['device_total_ms']:.3f} ms",
        f"{'ms':>10}  {'%':>5}  {'calls':>5}  op",
    ]
    for r in report["ops"][:top]:
        lines.append(
            f"{r['total_ms']:10.3f}  {r['pct']:5.1f}  {r['count']:5d}  "
            f"{r['name'][:80]}"
        )
    return "\n".join(lines)
