"""Real-dataset code path with actual files on disk: PNG decode via cv2,
exam pairing from a projections CSV, CLI loader construction, zero-shot
over the decoded images."""

import dataclasses
import os

import numpy as np
import pandas as pd
import pytest

cv2 = pytest.importorskip("cv2")

from clip_for_dl_tpu.core.config import DISEASE_LABELS
from clip_for_dl_tpu.data import (
    ChestXrayMultiViewDataset,
    HostLoader,
    build_exam_index,
    label_reports,
    load_image,
    merge_image_report,
    split_by_uid,
)


@pytest.fixture(scope="module")
def fake_dataset(tmp_path_factory):
    """A miniature Indiana-CXR layout: reports CSV + projections CSV + PNGs."""
    root = tmp_path_factory.mktemp("indiana")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    problems = [
        "normal", "Cardiomegaly", "Cardiomegaly;Nodule", "Bullous Emphysema",
        "normal", "Pleural Effusion", "Mass", "normal",
    ]
    rows, projs = [], []
    for uid, prob in enumerate(problems, start=1):
        rows.append({"uid": uid, "Problems": prob,
                     "findings": f"report text for {uid}"})
        for view, tag in (("Frontal", "f"), ("Lateral", "l")):
            fname = f"{uid}_{tag}.png"
            img = rng.integers(0, 255, (180, 140, 3), dtype=np.uint8)
            cv2.imwrite(str(img_dir / fname), img)
            projs.append({"uid": uid, "filename": fname, "projection": view})
    # drop one lateral to exercise the duplicate-view policy
    projs = [p for p in projs if p["filename"] != "3_l.png"]
    reports = label_reports(pd.DataFrame(rows))
    projections = pd.DataFrame(projs)
    reports.to_csv(root / "reports_labeled.csv", index=False)
    projections.to_csv(root / "projections.csv", index=False)
    return root, reports, projections, str(img_dir)


def test_load_image_decodes_and_resizes(fake_dataset):
    root, reports, projections, img_dir = fake_dataset
    img = load_image(os.path.join(img_dir, "1_f.png"), 64)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert img.any()
    # missing file → zero image (reference decode-failure fallback)
    missing = load_image(os.path.join(img_dir, "nope.png"), 64)
    assert missing.shape == (64, 64, 3) and not missing.any()


def test_exam_index_and_loader_over_real_files(fake_dataset):
    root, reports, projections, img_dir = fake_dataset
    idx = build_exam_index(reports, projections, img_dir)
    assert len(idx) == 8
    ds = ChestXrayMultiViewDataset(idx, image_size=64)
    uid3 = list(idx.uids).index(3)
    assert idx.view_types[uid3] == ("frontal", "frontal")  # duplicated view
    item = ds[uid3]
    np.testing.assert_array_equal(item["images"][0], item["images"][1])
    assert item["labels"][0] == 1.0  # Cardiomegaly
    loader = HostLoader(ds, batch_size=4, num_threads=2)
    batches = list(loader)
    assert batches[0]["images"].shape == (4, 2, 64, 64, 3)
    assert batches[0]["images"].any()


def test_merge_and_split_over_real_files(fake_dataset):
    root, reports, projections, img_dir = fake_dataset
    merged = merge_image_report(projections, reports)
    assert (merged[list(DISEASE_LABELS)].sum(axis=1) >= 1).all()
    train, test = split_by_uid(merged, 0.25, 42)
    assert set(train.uid).isdisjoint(test.uid)


def test_zero_shot_over_decoded_files(fake_dataset, rng):
    import jax
    import jax.numpy as jnp

    from clip_for_dl_tpu.core.config import ModelConfig, ZeroShotConfig
    from clip_for_dl_tpu.models import CXRClip
    from clip_for_dl_tpu.text import BertTokenizer, build_tiny_vocab
    from clip_for_dl_tpu.zeroshot import (
        ZeroShotEngine,
        prompts_for_family,
        run_zero_shot_eval,
    )

    root, reports, projections, img_dir = fake_dataset
    idx = build_exam_index(reports, projections, img_dir)
    ds = ChestXrayMultiViewDataset(idx, image_size=32)
    loader = HostLoader(ds, batch_size=4, num_threads=2)

    vocab = build_tiny_vocab(
        "this chest x-ray shows a of normal without any significant findings".split()
        + [w for d in DISEASE_LABELS for w in d.split()]
    )
    cfg = ModelConfig(
        image_size=32, max_text_length=16, vocab_size=len(vocab),
        text_embedding_dim=32, text_layers=1, text_heads=2,
        text_intermediate_dim=64, shared_embedding_dim=64,
        resnet_stages=(1, 1, 1, 1), resnet_width=8,
    )
    model = CXRClip(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 16), jnp.int32)
    )
    engine = ZeroShotEngine(
        model, variables, BertTokenizer(vocab), DISEASE_LABELS,
        ZeroShotConfig(), image_size=32, max_text_length=16,
        compute_dtype=jnp.float32,
    )
    engine.build_text_features(prompts_for_family("prediction", DISEASE_LABELS))
    out = run_zero_shot_eval(engine, loader, top_k=3)
    assert out["pred_matrix"].shape == (8, 16)
    assert "auroc_macro" in out["metrics"]


def test_cli_real_data_branch(fake_dataset, tmp_path):
    """The CLI's real-dataset branch end-to-end: CSVs + PNGs → zeroshot."""
    from clip_for_dl_tpu.cli import main

    root, reports, projections, img_dir = fake_dataset
    rc = main([
        "zeroshot", "--tiny", "--fp32",
        "--reports-csv", str(root / "reports_labeled.csv"),
        "--projections-csv", str(root / "projections.csv"),
        "--image-dir", img_dir,
        "--batch-size", "4",
        "--log-dir", str(tmp_path),
    ])
    assert rc == 0
    assert (tmp_path / "zero_shot_results.csv").exists()


def test_cli_real_pretrain_uses_image_text_pairs(fake_dataset, tmp_path):
    from clip_for_dl_tpu.cli import main

    root, reports, projections, img_dir = fake_dataset
    rc = main([
        "pretrain", "--tiny", "--fp32", "--epochs", "1",
        "--reports-csv", str(root / "reports_labeled.csv"),
        "--projections-csv", str(root / "projections.csv"),
        "--image-dir", img_dir,
        "--batch-size", "4",
        "--log-dir", str(tmp_path),
    ])
    assert rc == 0


@pytest.fixture(scope="module")
def built_cache(fake_dataset, tmp_path_factory):
    """cache-images over the fake layout at the --tiny geometry (64)."""
    from clip_for_dl_tpu.cli import main

    root, _, _, img_dir = fake_dataset
    out = str(tmp_path_factory.mktemp("cache") / "c64")
    rc = main([
        "cache-images", "--image-dir", img_dir, "--out", out,
        "--projections-csv", str(root / "projections.csv"),
        "--image-size", "64", "--workers", "2",
    ])
    assert rc == 0
    return out


def test_cli_pretrain_device_cache(fake_dataset, built_cache, tmp_path,
                                   caplog):
    """--device-cache: whole cache resident in device memory, batches
    gathered on device by index (VERDICT r4 item 1); the epoch must train
    to completion through the device-feed path."""
    import logging as _logging

    from clip_for_dl_tpu.cli import main

    root, _, _, img_dir = fake_dataset
    with caplog.at_level(_logging.INFO, logger="clip_for_dl_tpu.data"):
        rc = main([
            "pretrain", "--tiny", "--fp32", "--epochs", "1",
            "--reports-csv", str(root / "reports_labeled.csv"),
            "--projections-csv", str(root / "projections.csv"),
            "--image-dir", img_dir,
            "--image-cache", built_cache, "--device-cache",
            "--batch-size", "4",
            "--log-dir", str(tmp_path),
        ])
    assert rc == 0
    assert any("device cache resident" in r.message for r in caplog.records)
    assert (tmp_path / "training_history.csv").exists()


def test_cli_train_multiview_device_cache(fake_dataset, built_cache,
                                          tmp_path):
    """Multi-view command over the device cache: [B, 2] row gathers with
    the -1 missing-view slot (one lateral is dropped in the fixture)."""
    from clip_for_dl_tpu.cli import main

    root, _, _, img_dir = fake_dataset
    rc = main([
        "train", "--tiny", "--fp32", "--epochs", "1",
        "--reports-csv", str(root / "reports_labeled.csv"),
        "--projections-csv", str(root / "projections.csv"),
        "--image-dir", img_dir,
        "--image-cache", built_cache, "--device-cache",
        "--batch-size", "4",
        "--log-dir", str(tmp_path),
    ])
    assert rc == 0


def test_cli_pretrain_device_cache_dp(fake_dataset, built_cache, tmp_path):
    """--device-cache composed with --num-devices: the resident array is
    replicated over the dp mesh and gathers shard along the batch axis
    (conftest provides the 8-device virtual CPU mesh)."""
    from clip_for_dl_tpu.cli import main

    root, _, _, img_dir = fake_dataset
    rc = main([
        "pretrain", "--tiny", "--fp32", "--epochs", "1",
        "--reports-csv", str(root / "reports_labeled.csv"),
        "--projections-csv", str(root / "projections.csv"),
        "--image-dir", img_dir,
        "--image-cache", built_cache, "--device-cache",
        "--num-devices", "2", "--batch-size", "4",
        "--log-dir", str(tmp_path),
    ])
    assert rc == 0
    assert (tmp_path / "training_history.csv").exists()


def test_cli_device_cache_requires_image_cache(fake_dataset, tmp_path):
    from clip_for_dl_tpu.cli import main

    root, _, _, img_dir = fake_dataset
    with pytest.raises(SystemExit, match="image-cache"):
        main([
            "pretrain", "--tiny", "--fp32", "--epochs", "1",
            "--reports-csv", str(root / "reports_labeled.csv"),
            "--projections-csv", str(root / "projections.csv"),
            "--image-dir", img_dir, "--device-cache",
            "--batch-size", "4", "--log-dir", str(tmp_path),
        ])


def test_cli_device_cache_budget_fallback(fake_dataset, built_cache,
                                          tmp_path, monkeypatch, caplog):
    """Over-budget dataset streams instead of failing (gated at open)."""
    import logging as _logging

    from clip_for_dl_tpu.cli import main

    monkeypatch.setenv("CLIP_FOR_DL_TPU_HBM_BYTES", "1024")
    root, _, _, img_dir = fake_dataset
    with caplog.at_level(_logging.WARNING):
        rc = main([
            "pretrain", "--tiny", "--fp32", "--epochs", "1",
            "--reports-csv", str(root / "reports_labeled.csv"),
            "--projections-csv", str(root / "projections.csv"),
            "--image-dir", img_dir,
            "--image-cache", built_cache, "--device-cache",
            "--batch-size", "4", "--log-dir", str(tmp_path),
        ])
    assert rc == 0
    assert any("streaming instead" in r.message for r in caplog.records)
