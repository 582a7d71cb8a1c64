"""Guard against fast-tier budget drift (VERDICT r2 weak #1).

The slow manifest (tests/slow_tests.txt) is generated from a timing run;
every test added AFTER that run lands in the fast tier untimed, so the
suite silently outgrows the <5-minute commit gate (r2 drifted 4-5x this
way: +114 unmanifested tests -> ~20 min). This checker compares the
manifest's recorded `timed-tests` count against the currently collected
test count and FAILS when more than --max-drift new tests exist, i.e.
when the manifest must be regenerated:

    python -m pytest tests/ -q --durations=0 > /tmp/run.log
    python tools/gen_slow_manifest.py /tmp/run.log

Wired as `make check-fast-budget`. Collection-only, so it runs in
seconds — cheap enough to precede any full timing decision.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(REPO, "tests", "slow_tests.txt")


def manifest_counts() -> tuple[int, int]:
    """(timed-tests, projected-fast-seconds) from the manifest header."""
    timed, projected = -1, -1
    with open(MANIFEST) as f:
        for line in f:
            if not line.startswith("#"):
                break
            m = re.match(r"#\s*timed-tests:\s*(\d+)", line)
            if m:
                timed = int(m.group(1))
            m = re.match(r"#\s*projected-fast-seconds:\s*(\d+)", line)
            if m:
                projected = int(m.group(1))
    return timed, projected


def collected_count() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--collect-only"],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    m = re.search(r"(\d+) tests? collected", out.stdout)
    if m:
        return int(m.group(1))
    # this pytest's -q --collect-only prints per-module "path: N" lines
    per_module = re.findall(r"^tests/\S+:\s+(\d+)\s*$", out.stdout, re.M)
    if per_module:
        return sum(int(n) for n in per_module)
    ids = [ln for ln in out.stdout.splitlines() if "::" in ln]
    if not ids:
        print(out.stdout[-2000:], file=sys.stderr)
        raise SystemExit("could not parse pytest --collect-only output")
    return len(ids)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--max-drift", type=int, default=25,
                   help="max tests allowed beyond the manifest's timing "
                        "run before regeneration is required (default 25)")
    p.add_argument("--budget", type=float, default=300.0,
                   help="fast-tier wall budget in seconds (default 300)")
    args = p.parse_args(argv)

    timed, projected = manifest_counts()
    if timed < 0:
        print("FAIL: tests/slow_tests.txt has no '# timed-tests:' header — "
              "regenerate it with tools/gen_slow_manifest.py", file=sys.stderr)
        return 1
    now = collected_count()
    drift = now - timed
    print(f"manifest timing run: {timed} tests, projected fast tier "
          f"{projected}s; currently collected: {now} (drift {drift:+d}, "
          f"allowed {args.max_drift})")
    if projected > args.budget:
        print(f"FAIL: manifest's own projection {projected}s exceeds the "
              f"{args.budget:.0f}s budget — regenerate with a lower "
              "--budget", file=sys.stderr)
        return 1
    if drift > args.max_drift:
        print("FAIL: too many tests added since the manifest's timing run "
              "— rerun the full suite with --durations=0 and regenerate "
              "(see module docstring)", file=sys.stderr)
        return 1
    print("ok")
    return 0


if __name__ == "__main__":
    sys.exit(main())
