"""One-command real-data readiness drill (VERDICT r1 item 6).

Generates a miniature dataset in the EXACT Kaggle
`raddar/chest-xrays-indiana-university` layout the reference consumes
(`/root/reference/README.md:14-18` — `images/images_normalized/*.dcm.png` +
`indiana_reports.csv` + `indiana_projections.csv`), then drives the real
CLI chain **unmodified** against it:

    prep -> pretrain -> adapter -> zeroshot -> zeroshot --dynamic -> eval
         -> gradcam

and diffs every produced metric/artifact against the schema BASELINE.md's
rows require (jaccard / f1 micro-macro / hamming / exact-match / top-k /
mAP / LRAP / AUROC families, labeled-CSV column contract, Grad-CAM PNGs).

Day-one-with-data procedure: replace --root's generated files with the
Kaggle download and drop --tiny; every command line stays identical
(docs/REAL_DATA.md). Exit code 0 = the full real-data path is wired.

Usage:
    python tools/real_data_dryrun.py            # generate + run (tiny)
    python tools/real_data_dryrun.py --root DIR # use an existing layout
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# metric keys BASELINE.md's rows require from the eval surfaces
# (evals/metrics.py multilabel_metrics — the reference's published families:
# Jaccard 0.4473 / F1-micro 0.5009 / Hamming / exact-match / top-k /
# mAP / LRAP, 02 nb cell 30 & 03 nb cell 30)
BASELINE_METRIC_KEYS = {
    "zeroshot": [
        "f1_micro", "hamming_score", "exact_match", "jaccard", "f1_samples",
    ],
    "eval": [
        "f1_micro", "f1_macro", "hamming_score", "hamming_loss",
        "exact_match", "jaccard", "mAP", "LRAP", "top1_accuracy",
        "top3_accuracy", "auroc_macro",
    ],
}
LABELED_CSV_COLUMNS = 25  # 01_preprocess_data/indiana_reports_labeled.csv


def make_miniature_dataset(root: str, n_uids: int = 24,
                           gray: bool = False) -> dict:
    """Kaggle layout: images/images_normalized/*.dcm.png + the two CSVs.

    gray=True writes single-channel PNGs — the real Indiana sources are
    8-bit grayscale, and tools/day_one.py uses this to rehearse the
    grayscale-packed cache path (data/cache.py) end to end."""
    import numpy as np
    import pandas as pd

    try:
        import cv2
    except ImportError:  # pragma: no cover
        raise SystemExit("cv2 required to generate the miniature dataset")

    img_dir = os.path.join(root, "images", "images_normalized")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    problems = [
        "normal", "Cardiomegaly", "Cardiomegaly;Pulmonary Atelectasis",
        "Bullous Emphysema", "Pleural Effusion", "Nodule", "Mass",
        "Cicatrix", "Opacity", "normal",
    ]
    reports, projections = [], []
    for uid in range(1, n_uids + 1):
        reports.append({
            "uid": uid,
            "MeSH": problems[uid % len(problems)],
            "Problems": problems[uid % len(problems)],
            "image": f"CXR{uid}",
            "indication": "chest pain",
            "comparison": "none",
            "findings": (
                f"The cardiac silhouette of patient {uid} is within normal "
                "limits. No acute cardiopulmonary abnormality."
            ),
            "impression": "No acute disease.",
        })
        for view, tag in (("Frontal", "IM-0001-1001"), ("Lateral", "IM-0001-2001")):
            fname = f"CXR{uid}_{tag}.dcm.png"
            shape = (256, 208) if gray else (256, 208, 3)
            img = rng.integers(20, 235, shape, dtype=np.uint8)
            cv2.imwrite(os.path.join(img_dir, fname), img)
            projections.append(
                {"uid": uid, "filename": fname, "projection": view}
            )
    pd.DataFrame(reports).to_csv(
        os.path.join(root, "indiana_reports.csv"), index=False
    )
    pd.DataFrame(projections).to_csv(
        os.path.join(root, "indiana_projections.csv"), index=False
    )
    return {
        "reports": os.path.join(root, "indiana_reports.csv"),
        "projections": os.path.join(root, "indiana_projections.csv"),
        "image_dir": img_dir,
    }


def _last_json(out: str) -> dict:
    """Parse the final JSON object a command printed (logging lines may
    contain braces, so scan candidate start positions from the end)."""
    for start in range(len(out) - 1, -1, -1):
        if out[start] != "{":
            continue
        try:
            return json.loads(out[start: out.rindex("}") + 1])
        except (ValueError, json.JSONDecodeError):
            continue
    raise SystemExit(f"no JSON object in output:\n{out[-2000:]}")


RUN_ON_CPU = True  # path validation, not perf: CPU compiles in seconds,
# the tunneled-TPU compile of each command's graphs takes ~10 min. Pass
# --tpu to exercise the accelerator backend end-to-end instead.


def run_cli(args_list, timeout=900):
    cmd = [sys.executable, "-m", "clip_for_dl_tpu"] + args_list
    print("+", " ".join(args_list), flush=True)
    env = dict(os.environ)
    if RUN_ON_CPU:
        env["JAX_PLATFORMS"] = "cpu"
        env["CLIP_FOR_DL_TPU_FORCE_CPU"] = "1"
    proc = subprocess.run(
        cmd, cwd=REPO, timeout=timeout, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    if proc.returncode != 0:
        print(proc.stdout.decode(errors="replace")[-4000:])
        raise SystemExit(f"FAILED: {' '.join(args_list)}")
    return proc.stdout.decode(errors="replace")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default=None,
                   help="existing Kaggle-layout dir (default: generate one)")
    p.add_argument("--keep", action="store_true")
    p.add_argument("--full", action="store_true",
                   help="full-size towers (hours; default --tiny)")
    args = p.parse_args(argv)

    import pandas as pd

    work = args.root or tempfile.mkdtemp(prefix="indiana_mini_")
    generated = args.root is None
    if generated:
        paths = make_miniature_dataset(work)
    else:
        paths = {
            "reports": os.path.join(work, "indiana_reports.csv"),
            "projections": os.path.join(work, "indiana_projections.csv"),
            "image_dir": os.path.join(work, "images", "images_normalized"),
        }
    logs = os.path.join(work, "logs")
    ckpt = os.path.join(work, "ckpts")
    labeled = os.path.join(work, "indiana_reports_labeled.csv")
    sizing = [] if args.full else ["--tiny"]
    checks: dict = {}

    # 1. prep — label extraction (byte-validated vs the real CSV elsewhere)
    run_cli(["prep", "--reports", paths["reports"], "--out", labeled,
             "--unlabeled-out", os.path.join(work, "unlabeled.csv")])
    df = pd.read_csv(labeled)
    assert df.shape[1] == LABELED_CSV_COLUMNS, (
        f"labeled CSV has {df.shape[1]} columns, reference has "
        f"{LABELED_CSV_COLUMNS}"
    )
    checks["prep_columns"] = int(df.shape[1])

    data_flags = [
        "--reports-csv", labeled,
        "--projections-csv", paths["projections"],
        "--image-dir", paths["image_dir"],
    ]

    # 2. pretrain (phase A) + 3. adapter (phase B) on the REAL file path
    run_cli(["pretrain", *sizing, *data_flags, "--fp32", "--epochs", "1",
             "--checkpoint-dir", ckpt, "--log-dir", logs])
    assert os.path.exists(os.path.join(logs, "training_history.csv"))
    adapter_ckpt = os.path.join(work, "adapter_ckpt")
    run_cli(["adapter", *sizing, *data_flags, "--fp32", "--epochs", "1",
             "--checkpoint", ckpt, "--checkpoint-dir", adapter_ckpt,
             "--log-dir", logs])
    # phase B publishes its own metric family from the ADAPTER logits
    # (02 nb cell 30) and persists the trained head
    am_path = os.path.join(logs, "adapter_metrics.json")
    assert os.path.exists(am_path), "adapter_metrics.json missing"
    with open(am_path) as f:
        am = json.load(f)
    missing = [k for k in BASELINE_METRIC_KEYS["eval"] if k not in am]
    assert not missing, f"adapter metrics missing {missing}"
    assert os.path.isdir(adapter_ckpt), "adapter checkpoint not persisted"
    # eval --head adapter re-scores the saved adapter head
    out = run_cli(["eval", *sizing, *data_flags, "--fp32", "--head",
                   "adapter", "--checkpoint", adapter_ckpt,
                   "--log-dir", logs])
    head_ev = _last_json(out)
    assert abs(head_ev["mAP"] - am["mAP"]) < 1e-6, (
        "eval --head adapter does not reproduce the in-train adapter "
        f"metrics ({head_ev['mAP']} vs {am['mAP']})"
    )
    checks["train_chain"] = (
        "pretrain+adapter ok (resumed from orbax; adapter head "
        "persisted + reproduced by eval --head adapter)"
    )

    # 4. zero-shot (union-max) + dynamic-threshold two-pass
    out = run_cli(["zeroshot", *sizing, *data_flags, "--fp32",
                   "--checkpoint", ckpt, "--log-dir", logs])
    zs_csv = os.path.join(logs, "zero_shot_results.csv")
    assert os.path.exists(zs_csv), "zero_shot_results.csv missing"
    zs_metrics = _last_json(out)
    missing = [k for k in BASELINE_METRIC_KEYS["zeroshot"]
               if k not in zs_metrics]
    assert not missing, f"zeroshot metrics missing {missing}"
    checks["zeroshot_metrics"] = sorted(zs_metrics)[:8]
    run_cli(["zeroshot", *sizing, *data_flags, "--fp32", "--dynamic",
             "--checkpoint", ckpt, "--log-dir", logs])

    # 5. eval — the full multilabel metric suite over the checkpoint
    out = run_cli(["eval", *sizing, *data_flags, "--fp32",
                   "--checkpoint", ckpt, "--log-dir", logs])
    ev = _last_json(out)
    missing = [k for k in BASELINE_METRIC_KEYS["eval"] if k not in ev]
    assert not missing, f"eval metrics missing {missing}"
    assert os.path.exists(os.path.join(logs, "eval_predictions.csv"))
    checks["eval_metrics"] = {
        k: ev[k] for k in BASELINE_METRIC_KEYS["eval"] if k in ev
    }

    # 6. gradcam — interpretability artifacts on a real decoded image
    run_cli(["gradcam", *sizing, *data_flags, "--fp32",
             "--checkpoint", ckpt, "--log-dir", logs, "--sample_index", "0"])
    pngs = [
        os.path.join(r, f)
        for r, _, files in os.walk(logs)
        for f in files
        if f.endswith(".png")
    ]
    assert pngs, "gradcam produced no PNG overlays"
    checks["gradcam_pngs"] = len(pngs)

    print(json.dumps({"real_data_dryrun": "OK", "workdir": work, **checks},
                     indent=2))
    if generated and not args.keep:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
