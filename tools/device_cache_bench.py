"""Pretrain-epoch feed benchmark: streaming image cache vs device-resident.

VERDICT r4 item 1's training leg: the reference re-decodes and ships every
image to the device every epoch (0425/prepare_data.py:65-90); our disk
cache already kills the decode, and `--device-cache` kills the per-batch
H2D too (the whole gray-packed dataset lives in HBM; batches gather on
device by index — data/device_cache.py). This tool measures what that's
worth on a REAL pretrain epoch, by driving the actual CLI both ways over
an Indiana-shaped synthetic dataset:

  1. generate N gray PNGs + reports/projections CSVs (the exact Kaggle
     layout the CLI's real-data branch parses);
  2. `cache-images` once (shared by both runs);
  3. `pretrain --image-cache C` for E epochs           (streaming feed)
  4. `pretrain --image-cache C --device-cache` again   (HBM-resident)
  5. report per-epoch wall times from training_history.csv (epoch 0 is
     excluded — it carries the jit compile) and effective img/s.

Both runs execute the SAME jitted step program (the feed mode does not
change the jaxpr), so the delta is purely host-feed + H2D overhead.

Usage:
  python tools/device_cache_bench.py --tiny           # CPU smoke
  python tools/device_cache_bench.py --out benchmarks/device_cache_train
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_dataset(root: str, n_images: int, src_px: int) -> dict:
    """Indiana-layout synthetic dataset: one frontal PNG per uid."""
    import cv2
    import pandas as pd

    from clip_for_dl_tpu.data import label_reports

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    rows, projs = [], []
    problems = ["normal", "Cardiomegaly", "Pleural Effusion", "Nodule"]
    base = np.linspace(20, 230, src_px, dtype=np.float32)[None, :]
    for uid in range(1, n_images + 1):
        rows.append({
            "uid": uid,
            "Problems": problems[uid % len(problems)],
            "findings": (
                f"the cardiac silhouette is normal for uid {uid}. "
                "no focal airspace consolidation, pleural effusion or "
                "pneumothorax. degenerative changes of the spine."
            ),
        })
        fname = f"{uid}_IM-0001-1001.png"
        img = np.clip(
            base + rng.normal(0, 35, (src_px, src_px)), 0, 255
        ).astype(np.uint8)
        cv2.imwrite(os.path.join(img_dir, fname), img)
        projs.append({"uid": uid, "filename": fname, "projection": "Frontal"})
    label_reports(pd.DataFrame(rows)).to_csv(
        os.path.join(root, "reports_labeled.csv"), index=False
    )
    pd.DataFrame(projs).to_csv(
        os.path.join(root, "projections.csv"), index=False
    )
    return {"img_dir": img_dir, "root": root, "n": n_images}


def run_pretrain(ds: dict, cache_dir: str, log_dir: str, *, device_cache,
                 epochs, batch_size, tiny, extra=()) -> dict:
    from clip_for_dl_tpu.cli import main

    argv = [
        "pretrain", "--epochs", str(epochs),
        "--reports-csv", os.path.join(ds["root"], "reports_labeled.csv"),
        "--projections-csv", os.path.join(ds["root"], "projections.csv"),
        "--image-dir", ds["img_dir"],
        "--image-cache", cache_dir,
        "--batch-size", str(batch_size),
        "--log-dir", log_dir,
        *extra,
    ]
    if tiny:
        argv += ["--tiny", "--fp32"]
    if device_cache:
        argv.append("--device-cache")
    t0 = time.perf_counter()
    rc = main(argv)
    wall = time.perf_counter() - t0
    assert rc == 0, f"pretrain rc={rc}"
    import pandas as pd

    hist = pd.read_csv(os.path.join(log_dir, "training_history.csv"))
    times = hist["epoch_time"].tolist()
    # epoch 0 pays the jit compile; steady state is epochs 1..E-1
    steady = times[1:] if len(times) > 1 else times
    return {
        "epoch_times_s": [round(t, 2) for t in times],
        "steady_epoch_s": round(float(np.mean(steady)), 2),
        "total_wall_s": round(wall, 1),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n-images", type=int, default=2048)
    p.add_argument("--src-px", type=int, default=256,
                   help="source PNG side (decode cost is one-time — the "
                        "cache amortizes it; 256 keeps the build fast)")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--tiny", action="store_true",
                   help="tiny towers (CPU smoke; image size 64)")
    p.add_argument("--image-size", type=int, default=224,
                   help="must match the CLI preset's model size: 224 "
                        "(or 64 with --tiny) — the pretrain runs use the "
                        "preset geometry and a mismatched cache is a "
                        "hard error at dataset construction")
    p.add_argument("--keep", action="store_true")
    p.add_argument("--extra", default=[],
                   type=lambda s: [f for f in s.split(",") if f],
                   help="comma-separated extra CLI flags for both "
                        "pretrain runs, e.g. "
                        "--extra=--flash-attention,--bert-fused-mlp "
                        "(comma form because argparse would swallow "
                        "space-separated dashed tokens)")
    p.add_argument("--out", default=None, metavar="BASE",
                   help="write BASE.md + BASE.json")
    args = p.parse_args(argv)

    from clip_for_dl_tpu.core.compile_cache import enable_from_env

    enable_from_env()

    size = 64 if args.tiny else args.image_size
    if not args.tiny and args.image_size != 224:
        p.error(
            "--image-size other than 224 needs a matching model preset; "
            "the CLI pretrain runs at the preset's image_size (224, or "
            "64 under --tiny), and a cache built at any other size fails "
            "the dataset's geometry check"
        )
    root = tempfile.mkdtemp(prefix="devcache_bench_")
    try:
        ds = build_dataset(root, args.n_images, args.src_px)
        from clip_for_dl_tpu.cli import main as cli_main

        cache_dir = os.path.join(root, "cache")
        t0 = time.perf_counter()
        rc = cli_main([
            "cache-images", "--image-dir", ds["img_dir"],
            "--out", cache_dir, "--image-size", str(size), "--workers", "4",
        ])
        assert rc == 0
        cache_build_s = time.perf_counter() - t0

        # n_train below mirrors split_by_uid's grouped 80/20 (seed 42);
        # read the actual count from the epoch batch math after the run
        results = {}
        for mode, dc in (("streaming", False), ("device_cache", True)):
            log_dir = os.path.join(root, f"logs_{mode}")
            results[mode] = run_pretrain(
                ds, cache_dir, log_dir, device_cache=dc,
                epochs=args.epochs, batch_size=args.batch_size,
                tiny=args.tiny, extra=args.extra,
            )
        n_train_batches = None
        # effective throughput over the steady epoch (train split ~0.8 N,
        # drop_last): infer images/epoch from the batch count the loader
        # actually ran — derivable from the split sizes
        import pandas as pd

        from clip_for_dl_tpu.data import merge_image_report, split_by_uid

        reports = pd.read_csv(
            os.path.join(ds["root"], "reports_labeled.csv")
        )
        projections = pd.read_csv(
            os.path.join(ds["root"], "projections.csv")
        )
        merged = merge_image_report(projections, reports)
        train_f, _ = split_by_uid(merged, 0.2, 42)
        n_train = (len(train_f) // args.batch_size) * args.batch_size
        for mode in results:
            results[mode]["img_per_sec_steady"] = round(
                n_train / results[mode]["steady_epoch_s"], 1
            )
        speedup = round(
            results["streaming"]["steady_epoch_s"]
            / results["device_cache"]["steady_epoch_s"], 2,
        )
        report = {
            "metric": "pretrain steady-epoch wall time, streaming vs "
                      "device-resident image feed",
            "n_images": args.n_images,
            "n_train_epoch_images": n_train,
            "batch_size": args.batch_size,
            "epochs": args.epochs,
            "image_size": size,
            "tiny": bool(args.tiny),
            "extra": list(args.extra),
            "cache_build_s": round(cache_build_s, 1),
            "streaming": results["streaming"],
            "device_cache": results["device_cache"],
            "steady_epoch_speedup": speedup,
        }
        if args.out:
            report["out_base"] = args.out
        print(json.dumps(report))
        if args.out:
            with open(args.out + ".json", "w") as f:
                json.dump(report, f, indent=2)
            with open(args.out + ".md", "w") as f:
                f.write(render_md(report))
            print(f"wrote {args.out}.md / .json", file=sys.stderr)
        return 0
    finally:
        if not args.keep:
            shutil.rmtree(root, ignore_errors=True)


def render_md(r: dict) -> str:
    s = r["streaming"]
    d = r["device_cache"]
    extra_cli = (
        ' "--extra=' + ",".join(r["extra"]) + '"' if r["extra"] else ""
    )
    out = r.get("out_base", "benchmarks/device_cache_train")
    return f"""# Pretrain epoch: streaming vs device-resident image feed

`--device-cache` uploads the whole gray-packed uint8 image cache to HBM
once and gathers every batch on device by index (data/device_cache.py) —
steady-state H2D is the index vector. Reference anchor: the reference
re-decodes + re-uploads every image every epoch
(/root/reference/0425/prepare_data.py:65-90; 02 nb cell 25 trains at
~17.7 img/s end-to-end).

Both runs drive the REAL CLI `pretrain` over an Indiana-layout synthetic
dataset ({r["n_images"]} gray PNGs, {r["n_train_epoch_images"]} train
images/epoch after the grouped split, B={r["batch_size"]},
image {r["image_size"]}px{", tiny towers" if r["tiny"] else ""},
extra flags: {" ".join(r["extra"]) or "none"}); identical jitted step
program — the delta is purely host-feed + H2D.

| feed | epoch times (s) | steady epoch (s) | steady img/s |
|---|---|---|---|
| streaming cache | {s["epoch_times_s"]} | {s["steady_epoch_s"]} | {s["img_per_sec_steady"]} |
| device-resident | {d["epoch_times_s"]} | {d["steady_epoch_s"]} | {d["img_per_sec_steady"]} |

**Steady-epoch speedup: {r["steady_epoch_speedup"]}x.** (Epoch 0 carries
the jit compile in both runs and is excluded from the steady mean.)

Reproduce: `python tools/device_cache_bench.py{extra_cli} --out {out}`
"""


if __name__ == "__main__":
    sys.exit(main())
