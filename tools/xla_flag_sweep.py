"""XLA compiler-option sweep over the zero-shot bench (VERDICT r1 item 2's
deferred latency-hiding-scheduler experiment, done systematically).

TPU-backend flags CANNOT ride ``XLA_FLAGS`` in this environment: the axon
client's local XLA build parses the env var and hard-fails on unknown
(TPU-only) flags before anything reaches the device compiler. The working
path is per-compile ``compiler_options`` on ``Lowered.compile()``, which the
tunnel forwards to the backend — so each configuration runs ``bench.py
--compiler-options '<json>'`` as a fresh subprocess and the JSON result
lines are collected here. NOTES.md records the conclusions so negative
results stay discoverable.

Usage:
    python tools/xla_flag_sweep.py --tower vit          # the r1 laggard
    python tools/xla_flag_sweep.py --tower resnet --quick
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Each entry: (name, {compiler option: value}). Baseline first.
SWEEP = [
    ("baseline", {}),
    ("latency_hiding_scheduler",
     {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("aggressive_fusion", {"xla_tpu_rwb_fusion": "true"}),
    ("scoped_vmem_128m", {"xla_tpu_scoped_vmem_limit_kib": "131072"}),
    ("async_all_ops",
     {"xla_tpu_enable_async_collective_fusion": "true"}),
    ("sched+fusion",
     {"xla_tpu_enable_latency_hiding_scheduler": "true",
      "xla_tpu_rwb_fusion": "true"}),
]


def run_one(name: str, options: dict, bench_args, timeout: int):
    cmd = [sys.executable, "bench.py", *bench_args]
    if options:
        cmd += ["--compiler-options", json.dumps(options)]
    proc = subprocess.run(
        cmd, cwd=REPO, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    out = proc.stdout.decode(errors="replace")
    if proc.returncode != 0:
        return {"config": name, "options": options, "error": out[-1000:]}
    # bench prints one JSON line last
    for line in reversed(out.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            row = json.loads(line)
            return {"config": name, "options": options,
                    "img_per_sec": row["value"],
                    **{k: row[k] for k in ("mfu_pct", "tflops_per_sec")
                       if k in row}}
    return {"config": name, "options": options, "error": "no JSON in output"}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--tower", choices=["resnet", "vit"], default="vit")
    p.add_argument("--quick", action="store_true",
                   help="baseline + scheduler only")
    p.add_argument("--fast-gelu", action="store_true")
    p.add_argument("--timeout", type=int, default=1800)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    sweep = SWEEP[:2] if args.quick else SWEEP
    bench_args = ["--tower", args.tower]
    if args.fast_gelu:
        bench_args.append("--fast-gelu")

    rows = []
    for name, options in sweep:
        row = run_one(name, options, bench_args, args.timeout)
        rows.append(row)
        print(json.dumps(row), flush=True)
    if rows and "img_per_sec" in rows[0]:
        base = rows[0]["img_per_sec"]
        best = max(
            (r for r in rows if "img_per_sec" in r),
            key=lambda r: r["img_per_sec"],
        )
        print(json.dumps({
            "best_config": best["config"],
            "best_img_per_sec": best["img_per_sec"],
            "speedup_vs_baseline": round(best["img_per_sec"] / base, 3),
        }), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
