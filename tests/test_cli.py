"""CLI smoke tests (tiny models, synthetic data, fp32 on CPU)."""

import json

import numpy as np
import pandas as pd
import pytest

from clip_for_dl_tpu.cli import build_parser, main


def run(args):
    return main(args)


def test_parser_covers_all_commands():
    parser = build_parser()
    subs = parser._subparsers._group_actions[0].choices
    assert set(subs) >= {
        "prep", "pretrain", "train", "adapter", "shared-adapter",
        "zeroshot", "gradcam", "rollout", "eval",
    }


def test_prep_roundtrip(tmp_path):
    df = pd.DataFrame({
        "uid": [1, 2, 3],
        "Problems": ["normal", "Cardiomegaly;Nodule", "Bullous Emphysema"],
    })
    src = tmp_path / "reports.csv"
    df.to_csv(src, index=False)
    out = tmp_path / "labeled.csv"
    unl = tmp_path / "unlabeled.csv"
    assert run(["prep", "--reports", str(src), "--out", str(out),
                "--unlabeled-out", str(unl)]) == 0
    labeled = pd.read_csv(out)
    assert labeled["Cardiomegaly"].tolist() == [0, 1, 0]
    assert labeled["Emphysema"].tolist() == [0, 0, 1]
    assert labeled["Normal"].tolist() == [1, 0, 0]


@pytest.mark.parametrize("command,extra", [
    (["zeroshot"], []),
    (["zeroshot", "--dynamic"], []),
    (["eval"], []),
    (["eval"], ["--bootstrap", "20"]),
])
def test_inference_commands(tmp_path, command, extra):
    rc = run(command + [
        "--synthetic", "--tiny", "--fp32", "--synthetic-samples", "8",
        "--log-dir", str(tmp_path),
    ] + extra)
    assert rc == 0
    if "--dynamic" in command:
        # the calibration is persisted for serve --thresholds
        saved = json.loads((tmp_path / "thresholds.json").read_text())
        assert saved and all(0.0 <= v <= 1.0 for v in saved.values())


def test_pretrain_then_restore_zeroshot(tmp_path):
    ck = str(tmp_path / "ck")
    assert run([
        "pretrain", "--synthetic", "--tiny", "--fp32",
        "--synthetic-samples", "8", "--epochs", "1",
        "--log-dir", str(tmp_path), "--checkpoint-dir", ck,
    ]) == 0
    assert run([
        "zeroshot", "--synthetic", "--tiny", "--fp32",
        "--synthetic-samples", "8", "--log-dir", str(tmp_path),
        "--checkpoint", ck,
    ]) == 0
    # metric stream written by the pretrain run
    rows = [json.loads(l) for l in
            open(tmp_path / "pretrain_metrics.jsonl") if l.strip()]
    assert rows and "train_loss" in rows[0]


def test_pretrain_length_grouped_smoke(tmp_path):
    """--length-grouped tokenizes the corpus once, installs lengths via
    HostLoader.set_lengths, and trains bucketed; rejected without
    --bucket-text (grouping only pays when batches pad to their bucket)."""
    assert run([
        "pretrain", "--synthetic", "--tiny", "--fp32",
        "--synthetic-samples", "16", "--epochs", "1",
        "--bucket-text", "--length-grouped",
        "--log-dir", str(tmp_path), "--checkpoint-dir",
        str(tmp_path / "ck"),
    ]) == 0
    with pytest.raises(SystemExit, match="bucket-text"):
        run([
            "pretrain", "--synthetic", "--tiny", "--fp32",
            "--synthetic-samples", "8", "--epochs", "1",
            "--length-grouped", "--log-dir", str(tmp_path / "x"),
        ])


def test_gradcam_writes_overlays(tmp_path):
    assert run([
        "gradcam", "--synthetic", "--tiny", "--fp32",
        "--synthetic-samples", "8", "--sample_index", "0",
        "--log-dir", str(tmp_path),
    ]) == 0
    out = list((tmp_path / "gradcam").glob("*.png"))
    assert out


def test_rollout_writes_overlays(tmp_path):
    assert run([
        "rollout", "--synthetic", "--tiny", "--fp32",
        "--synthetic-samples", "8", "--sample_index", "0",
        "--log-dir", str(tmp_path),
    ]) == 0
    assert list((tmp_path / "rollout").glob("*.png"))


def test_adapter_saves_checkpoint_metrics_and_head_eval(tmp_path):
    """The phase-B chain the reference publishes (02 nb cells 28-32):
    adapter training persists its weights, emits the cell-30 metric family
    from the ADAPTER logits, and `eval --head adapter` re-scores the saved
    checkpoint with the classifier (not zero-shot similarity)."""
    ck = str(tmp_path / "adapter_ck")
    assert run([
        "adapter", "--synthetic", "--tiny", "--fp32",
        "--synthetic-samples", "8", "--epochs", "1",
        "--log-dir", str(tmp_path), "--checkpoint-dir", ck,
    ]) == 0
    import os

    assert os.path.isdir(ck)  # trained adapter weights persisted
    metrics = json.loads((tmp_path / "adapter_metrics.json").read_text())
    for key in ("jaccard", "hamming_loss", "f1_micro", "f1_macro",
                "mAP", "LRAP", "auroc_macro"):
        assert key in metrics  # 02 nb cell 30 family + AUROC
    assert (tmp_path / "adapter_predictions.csv").exists()
    assert run([
        "eval", "--synthetic", "--tiny", "--fp32",
        "--synthetic-samples", "8", "--log-dir", str(tmp_path),
        "--checkpoint", ck, "--head", "adapter",
    ]) == 0


def test_shared_adapter_emits_metric_suite(tmp_path):
    assert run([
        "shared-adapter", "--synthetic", "--tiny", "--fp32",
        "--synthetic-samples", "8", "--epochs", "1",
        "--log-dir", str(tmp_path),
    ]) == 0
    metrics = json.loads(
        (tmp_path / "shared_adapter_metrics.json").read_text()
    )
    assert "mAP" in metrics and "LRAP" in metrics  # 03 nb cell 30 family
    assert (tmp_path / "shared_adapter_history.csv").exists()


def test_serve_rejects_bad_buckets():
    # validation fires before any model construction — fast
    assert run(["serve", "--tiny", "--buckets", "0"]) == 2
    assert run(["serve", "--tiny", "--buckets", "4", "-1"]) == 2


def test_pretrain_lora(tmp_path):
    assert run([
        "pretrain", "--synthetic", "--tiny", "--fp32", "--lora", "2",
        "--epochs", "1", "--synthetic-samples", "16",
        "--log-dir", str(tmp_path),
    ]) == 0
    assert (tmp_path / "training_history.csv").exists()
    assert run(["pretrain", "--tiny", "--lora", "-3"]) == 2


class TestNumDevices:
    def test_pretrain_data_parallel(self, tmp_path, eight_devices):
        assert run([
            "pretrain", "--synthetic", "--tiny", "--fp32",
            "--synthetic-samples", "16", "--epochs", "1",
            "--batch-size", "8", "--num-devices", "8",
            "--log-dir", str(tmp_path),
        ]) == 0

    def test_adapter_data_parallel(self, tmp_path, eight_devices):
        assert run([
            "adapter", "--synthetic", "--tiny", "--fp32",
            "--synthetic-samples", "16", "--epochs", "1",
            "--batch-size", "8", "--num-devices", "4",
            "--log-dir", str(tmp_path),
        ]) == 0

    def test_zeroshot_data_parallel(self, tmp_path, eight_devices):
        assert run([
            "zeroshot", "--synthetic", "--tiny", "--fp32",
            "--synthetic-samples", "8", "--num-devices", "4",
            "--log-dir", str(tmp_path),
        ]) == 0

    def test_indivisible_batch_rejected(self, tmp_path, eight_devices):
        with pytest.raises(SystemExit):
            run([
                "pretrain", "--synthetic", "--tiny", "--fp32",
                "--epochs", "1", "--batch-size", "9", "--num-devices", "8",
                "--log-dir", str(tmp_path),
            ])

    def test_lora_rejects_num_devices(self, tmp_path, eight_devices):
        with pytest.raises(SystemExit):
            run([
                "pretrain", "--synthetic", "--tiny", "--fp32",
                "--epochs", "1", "--batch-size", "8", "--lora", "2",
                "--num-devices", "8", "--log-dir", str(tmp_path),
            ])

    def test_zeroshot_tensor_parallel(self, tmp_path, eight_devices):
        assert run([
            "zeroshot", "--synthetic", "--tiny", "--fp32",
            "--synthetic-samples", "8", "--num-devices", "8", "--tp", "2",
            "--log-dir", str(tmp_path),
        ]) == 0

    def test_pretrain_pipeline_parallel(self, tmp_path, eight_devices):
        """--pp 2 over 4 devices: trains, writes stacked in-run checkpoints
        plus a canonical unstacked copy that zeroshot can load."""
        ck = str(tmp_path / "ck")
        assert run([
            "pretrain", "--synthetic", "--tiny", "--fp32",
            "--synthetic-samples", "16", "--epochs", "1",
            "--batch-size", "8", "--num-devices", "4", "--pp", "2",
            "--pp-microbatches", "2",
            "--log-dir", str(tmp_path), "--checkpoint-dir", ck,
        ]) == 0
        unstacked = str(tmp_path / "ck" / "unstacked")
        assert run([
            "zeroshot", "--synthetic", "--tiny", "--fp32",
            "--synthetic-samples", "8", "--checkpoint", unstacked,
            "--log-dir", str(tmp_path),
        ]) == 0

    def test_pretrain_moe_expert_parallel(self, tmp_path, eight_devices):
        assert run([
            "pretrain", "--synthetic", "--tiny", "--fp32",
            "--synthetic-samples", "16", "--epochs", "1",
            "--batch-size", "8", "--num-devices", "4",
            "--moe-experts", "4", "--ep", "2",
            "--log-dir", str(tmp_path),
        ]) == 0

    def test_ep_requires_moe(self, tmp_path, eight_devices):
        with pytest.raises(SystemExit):
            run([
                "pretrain", "--synthetic", "--tiny", "--fp32",
                "--epochs", "1", "--batch-size", "8",
                "--num-devices", "4", "--ep", "2",
                "--log-dir", str(tmp_path),
            ])

    def test_pp_rejects_bad_microbatches(self, tmp_path, eight_devices):
        with pytest.raises(SystemExit):
            run([
                "pretrain", "--synthetic", "--tiny", "--fp32",
                "--epochs", "1", "--batch-size", "8",
                "--num-devices", "4", "--pp", "2", "--pp-microbatches", "3",
                "--log-dir", str(tmp_path),
            ])

    def test_pretrain_pp_resume(self, tmp_path, eight_devices):
        """A preempted --pp run resumes from its stacked in-run checkpoint
        (the restore template is restacked before resume_or_init)."""
        ck = str(tmp_path / "ck")
        base = [
            "pretrain", "--synthetic", "--tiny", "--fp32",
            "--synthetic-samples", "16", "--batch-size", "8",
            "--num-devices", "4", "--pp", "2", "--pp-microbatches", "2",
            "--log-dir", str(tmp_path), "--checkpoint-dir", ck,
        ]
        assert run(base + ["--epochs", "1"]) == 0
        assert run(base + ["--epochs", "2"]) == 0  # resumes epoch 2

    def test_pp_rejects_moe(self, tmp_path, eight_devices):
        with pytest.raises(SystemExit):
            run([
                "pretrain", "--synthetic", "--tiny", "--fp32",
                "--epochs", "1", "--batch-size", "8",
                "--num-devices", "4", "--pp", "2", "--moe-experts", "4",
                "--log-dir", str(tmp_path),
            ])

    def test_pretrain_dense_then_pp_resume(self, tmp_path, eight_devices):
        """Continuing a dense checkpoint dir with --pp restores against the
        canonical layout and restacks (the fallback restore path)."""
        ck = str(tmp_path / "ck")
        common_args = [
            "pretrain", "--synthetic", "--tiny", "--fp32",
            "--synthetic-samples", "16", "--batch-size", "8",
            "--log-dir", str(tmp_path), "--checkpoint-dir", ck,
        ]
        assert run(common_args + ["--epochs", "1"]) == 0  # dense
        assert run(common_args + [
            "--epochs", "2", "--num-devices", "4", "--pp", "2",
        ]) == 0  # continue pipelined


class TestRound2Flags:
    def test_pp_with_lora_rejected(self, tmp_path):
        with pytest.raises(SystemExit, match="--pp does not compose"):
            run([
                "pretrain", "--synthetic", "--tiny", "--fp32",
                "--epochs", "1", "--lora", "2", "--pp", "2",
                "--log-dir", str(tmp_path),
            ])

    def test_local_loss_requires_num_devices(self, tmp_path):
        with pytest.raises(SystemExit, match="--local-loss requires"):
            run([
                "pretrain", "--synthetic", "--tiny", "--fp32",
                "--epochs", "1", "--local-loss", "--log-dir", str(tmp_path),
            ])

    def test_pretrain_local_loss_dp(self, tmp_path, eight_devices):
        assert run([
            "pretrain", "--synthetic", "--tiny", "--fp32",
            "--synthetic-samples", "16", "--epochs", "1",
            "--batch-size", "8", "--num-devices", "8", "--local-loss",
            "--log-dir", str(tmp_path),
        ]) == 0
        assert (tmp_path / "training_history.csv").exists()

    def test_pretrain_siglip_ring(self, tmp_path, eight_devices):
        """--loss siglip --local-loss: the constant-memory ppermute ring
        drives a full dp8 train step."""
        assert run([
            "pretrain", "--synthetic", "--tiny", "--fp32",
            "--synthetic-samples", "16", "--epochs", "1",
            "--batch-size", "8", "--num-devices", "8", "--local-loss",
            "--loss", "siglip", "--log-dir", str(tmp_path),
        ]) == 0
        assert (tmp_path / "training_history.csv").exists()

    def test_pretrain_ema_then_zeroshot_use_ema(self, tmp_path):
        """--ema-decay writes the EMA slot; zeroshot --use-ema scores with
        the smoothed weights, and without --ema-decay the flag errors."""
        ck = tmp_path / "ck"
        assert run([
            "pretrain", "--synthetic", "--tiny", "--fp32",
            "--synthetic-samples", "8", "--epochs", "1",
            "--batch-size", "4", "--ema-decay", "0.999",
            "--log-dir", str(tmp_path), "--checkpoint-dir", str(ck),
        ]) == 0
        assert run([
            "zeroshot", "--synthetic", "--tiny", "--fp32",
            "--synthetic-samples", "8", "--use-ema",
            "--checkpoint", str(ck), "--log-dir", str(tmp_path / "zs"),
        ]) == 0

        ck2 = tmp_path / "ck2"
        assert run([
            "pretrain", "--synthetic", "--tiny", "--fp32",
            "--synthetic-samples", "8", "--epochs", "1",
            "--batch-size", "4",
            "--log-dir", str(tmp_path), "--checkpoint-dir", str(ck2),
        ]) == 0
        with pytest.raises(ValueError, match="lacks"):
            run([
                "zeroshot", "--synthetic", "--tiny", "--fp32",
                "--synthetic-samples", "8", "--use-ema",
                "--checkpoint", str(ck2), "--log-dir", str(tmp_path / "z2"),
            ])

    def test_pretrain_learnable_temperature(self, tmp_path):
        """--learnable-temperature trains the calibration scalars and the
        checkpoint still serves a default (non-learnable) model — the
        extra scalars are ignored at restore."""
        ck = tmp_path / "ck"
        assert run([
            "pretrain", "--synthetic", "--tiny", "--fp32",
            "--synthetic-samples", "8", "--epochs", "1",
            "--batch-size", "4", "--loss", "siglip",
            "--learnable-temperature",
            "--log-dir", str(tmp_path), "--checkpoint-dir", str(ck),
        ]) == 0
        assert run([
            "zeroshot", "--synthetic", "--tiny", "--fp32",
            "--synthetic-samples", "8",
            "--checkpoint", str(ck), "--log-dir", str(tmp_path / "zs"),
        ]) == 0

    def test_pretrain_accum_steps(self, tmp_path):
        assert run([
            "pretrain", "--synthetic", "--tiny", "--fp32",
            "--synthetic-samples", "16", "--epochs", "1",
            "--batch-size", "8", "--accum-steps", "2",
            "--log-dir", str(tmp_path),
        ]) == 0
        assert (tmp_path / "training_history.csv").exists()

    def test_accum_rejects_moe(self, tmp_path):
        with pytest.raises(SystemExit, match="MoE"):
            run([
                "pretrain", "--synthetic", "--tiny", "--fp32",
                "--epochs", "1", "--accum-steps", "2", "--moe-experts", "2",
                "--log-dir", str(tmp_path),
            ])

    def test_zeroshot_tp_validates_degree(self, tmp_path, eight_devices):
        # tiny text tower has 2 heads — tp=8 cannot divide them; must die
        # with the clear validate_tp message, not an XLA sharding error
        with pytest.raises(SystemExit, match="must divide"):
            run([
                "zeroshot", "--synthetic", "--tiny", "--fp32",
                "--synthetic-samples", "8", "--num-devices", "8",
                "--tp", "8", "--log-dir", str(tmp_path),
            ])
