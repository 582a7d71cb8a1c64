"""tools/ scripts: export, parity harness (tiny smoke)."""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def test_export_inference_writes_weights_and_manifest(tmp_path):
    from tools.export_inference import main

    out = tmp_path / "serving"
    rc = main(["--checkpoint", "fresh", "--out", str(out), "--tiny"])
    assert rc == 0
    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["fold_bn"] is True
    assert len(manifest["disease_labels"]) == 16
    assert (out / "weights").exists()

    # exported weights reload and run through the folded model
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from clip_for_dl_tpu.core.config import ModelConfig
    from clip_for_dl_tpu.models import CXRClip

    cfg = ModelConfig(**{
        k: (tuple(v) if isinstance(v, list) else v)
        for k, v in manifest["model"].items()
    })
    model = CXRClip(cfg, fold_bn=True)
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        variables = ckptr.restore(str(out / "weights"))
    feats = model.apply(
        jax.tree.map(jnp.asarray, variables),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
        method="encode_image",
    )
    assert feats.shape == (1, cfg.shared_embedding_dim)
    assert np.isfinite(np.asarray(feats)).all()


def test_host_pipeline_bench_tiny(capsys):
    from tools.host_pipeline_bench import main

    rc = main(["--tiny"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 3  # device-resize + host-resize + cached
    saw_cached = False
    for line in lines:
        rec = json.loads(line)
        assert rec["value"] > 0
        assert rec["host_decode_img_s"] > 0
        assert rec["h2d_MBps"] > 0
        if "(cached)" in rec["metric"]:
            saw_cached = True
            assert rec["cache_build_s"] >= 0
    assert saw_cached


def test_scaling_report_tiny(capsys):
    from tools.scaling_report import main

    rc = main(["--devices", "1", "4"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 2
    one, four = (json.loads(l) for l in lines)
    assert one["devices"] == 1 and not one["collectives"]
    assert four["devices"] == 4 and four["global_batch"] == 32
    # DP step must gather embeddings and reduce gradients
    assert four["collectives"]["all-gather"]["count"] >= 1
    assert four["collectives"]["all-reduce"]["count"] >= 1
    assert four["collective_mb_per_device"] > 0


@pytest.mark.parametrize("regime", ["tp", "pp", "ep"])
def test_scaling_report_regimes(capsys, regime):
    """The 2-D (data, X) regimes analyze too; pp shows its microbatch
    ppermute hops in the traffic table."""
    from tools.scaling_report import main

    rc = main(["--devices", "4", "--regime", regime, "--degree", "2"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert rec["regime"] == regime and rec["devices"] == 4
    assert rec["collective_mb_per_device"] > 0
    if regime == "pp":
        assert rec["collectives"]["collective-permute"]["count"] >= 1


def test_collective_traffic_parser():
    from tools.scaling_report import collective_traffic, wire_bytes_per_device

    hlo = """
  %ag = bf16[16,64]{1,0} all-gather(bf16[4,64]{1,0} %x), dimensions={0}
  %ar = (f32[128]{0}, f32[2,2]{1,0}) all-reduce(f32[128]{0} %a, f32[2,2]{1,0} %b)
  %add = f32[128]{0} add(f32[128]{0} %p, f32[128]{0} %q)
"""
    t = collective_traffic(hlo)
    assert t["all-gather"] == {"count": 1, "bytes": 16 * 64 * 2}
    assert t["all-reduce"] == {"count": 1, "bytes": 128 * 4 + 4 * 4}
    assert t["reduce-scatter"]["count"] == 0
    # ring wire cost: all-reduce pays both phases (2x), all-gather one
    ar, ag = 128 * 4 + 4 * 4, 16 * 64 * 2
    assert wire_bytes_per_device(t, 4) == ag * 0.75 + ar * 2 * 0.75
    assert wire_bytes_per_device(t, 1) == 0.0


def test_collective_traffic_parser_async_spellings():
    from tools.scaling_report import collective_traffic

    hlo = """
  %s = f32[256]{0} all-reduce-start(f32[256]{0} %a)
  %d = f32[256]{0} all-reduce-done(f32[256]{0} %s)
  %g = bf16[8,8]{1,0} all-gather-start(bf16[2,8]{1,0} %x)
"""
    t = collective_traffic(hlo)
    assert t["all-reduce"] == {"count": 1, "bytes": 256 * 4}  # -done not double-counted
    assert t["all-gather"] == {"count": 1, "bytes": 64 * 2}


def test_train_bench_tiny(capsys):
    from tools.train_bench import main

    rc = main(["--tiny", "--seq-lens", "16"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert rec["value"] > 0 and rec["seq_len"] == 16


def test_parity_harness_tiny(capsys):
    from tools.parity_harness import main

    rc = main(["--random-weights", "--tiny", "--batch", "4"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["prob_max_abs_err"] < 1e-3
    assert report["decision_agreement"] == 1.0


def test_parity_harness_from_png_tiny(capsys):
    """PNG-bytes→AUROC oracle (VERDICT r2 item 6): both chains start from
    the same files on disk (incl. a corrupt one); host chains must be
    byte-identical and tower math fp32-tight."""
    from tools.parity_harness import main

    rc = main(["--from-png", "--random-weights", "--tiny",
               "--n-images", "6"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["mode"] == "from_png_bytes"
    assert report["host_chain_max_abs_delta_u8"] == 0
    assert report["zero_fallbacks"] == 1
    assert report["prob_max_abs_err"] < 2e-3
    # rank-flip tolerance: near-tied random-weight probs step AUROC by
    # ~1/(n_pos·n_neg) — see the gate comment in run_from_png
    assert report["auroc_max_abs_delta"] < 1e-2


@pytest.mark.parametrize("extra", [
    ["--tower", "vit"],
    ["--enhance"],
    ["--tower", "vit", "--enhance"],
], ids=["vit", "enhance", "vit_enhance"])
def test_parity_harness_from_png_vit_and_enhance(capsys, extra):
    """VERDICT r4 item 6: the from-PNG oracle also covers the ViT tower
    (vit_vision nb cell 24 chain) and the AdditiveMultiModalAttention
    enhanced zero-shot path (disease_analysis.py:344-356)."""
    from tools.parity_harness import main

    rc = main(["--from-png", "--random-weights", "--tiny",
               "--n-images", "6"] + extra)
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["host_chain_max_abs_delta_u8"] == 0
    assert report["prob_max_abs_err"] < 2e-3
    assert report["auroc_max_abs_delta"] < 1e-2
    assert report["tower"] == ("vit" if "--tower" in extra else "resnet")
    assert report["enhance"] == ("--enhance" in extra)


def test_gen_slow_manifest_selection_and_budget_guard(tmp_path, monkeypatch):
    """gen_slow_manifest picks slowest-first within budget (every module
    keeps a fast test) and stamps the counts check_fast_budget reads."""
    import importlib

    gen = importlib.import_module("gen_slow_manifest")
    chk = importlib.import_module("check_fast_budget")

    log = (
        "10.00s call tests/test_a.py::test_slow1\n"
        "8.00s call tests/test_a.py::test_slow2\n"
        "0.50s call tests/test_a.py::test_fast\n"
        "6.00s call tests/test_b.py::test_only\n"  # sole test in module
        "1.00s setup tests/test_b.py::test_only\n"
    )
    per_test = gen.parse_durations(log)
    assert per_test["tests/test_b.py::test_only"] == 7.0
    slow, projected = gen.select_slow(per_test, budget_s=5.0)
    slow_ids = {tid for tid, _ in slow}
    # the two slowest test_a entries go slow; test_b's only test must stay
    assert slow_ids == {
        "tests/test_a.py::test_slow1", "tests/test_a.py::test_slow2"
    }
    assert projected == pytest.approx(7.5)

    manifest = tmp_path / "slow_tests.txt"
    manifest.write_text(
        "# header\n# timed-tests: 4\n# projected-fast-seconds: 8\n"
        "tests/test_a.py::test_slow1\n"
    )
    monkeypatch.setattr(chk, "MANIFEST", str(manifest))
    assert chk.manifest_counts() == (4, 8)


def test_serving_load_bench_tiny_smoke(capsys):
    """Concurrency sweep against a real live server (tiny model, CPU):
    every level row carries throughput, latency percentiles, and the
    batcher stage split, with no transport errors at smoke scale."""
    from tools.serving_load_bench import main

    rc = main(["--tiny", "--cpu", "--levels", "1,2", "--duration", "1.0"])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()
            if l.strip().startswith("{")]
    assert [r["concurrency"] for r in rows] == [1, 2]
    for r in rows:
        assert r["req_per_s"] > 0 and r["completed"] > 0
        assert r["errors"] == 0
        assert r["latency_ms"]["p50"] <= r["latency_ms"]["p99"]
        assert r["mean_batch_size"] >= 1


@pytest.mark.skipif(
    not __import__("os").path.exists(
        "/root/reference/00_data/indiana_reports.csv"),
    reason="reference reports CSV not present",
)
def test_real_lengths_hist_only(capsys):
    """Token-length histogram over the REAL Indiana findings text (both
    bracketing vocabs) — the artifact behind benchmarks/bucketed_pretrain."""
    from tools.real_lengths_bench import main

    rc = main(["--hist-only"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert rec["reports"] > 3000
    for name in ("corpus", "top1000"):
        v = rec["vocabs"][name]
        assert v["p50"] > 0 and v["p99"] <= 200
        # bucketed epochs must cover every batch of the padded epoch
        n_batches = sum(v["epoch_batches_per_bucket"].values())
        assert n_batches == sum(
            v["epoch_batches_per_bucket_length_grouped"].values())


@pytest.mark.slow  # two full pretrain CLI runs (compile x1, shared cache)
def test_device_cache_bench_tiny(capsys):
    """Streaming-vs-device-resident feed benchmark drives the real CLI
    both ways over an Indiana-layout dataset and reports steady-epoch
    times (VERDICT r4 item 1's training leg)."""
    from tools.device_cache_bench import main

    rc = main(["--tiny", "--n-images", "32", "--src-px", "96",
               "--epochs", "2", "--batch-size", "8"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert rec["streaming"]["steady_epoch_s"] > 0
    assert rec["device_cache"]["steady_epoch_s"] > 0
    assert len(rec["streaming"]["epoch_times_s"]) == 2


@pytest.mark.slow  # full seven-leg chain incl. a parity_harness subprocess
def test_day_one_rehearsal(tmp_path):
    """The one-command bring-up chain (prep -> cache-images -> pretrain ->
    adapter -> zeroshot -> convert -> parity gate) on stand-ins; the
    report must mark it a rehearsal and every leg must have run."""
    from tools.day_one import main

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["--work", str(tmp_path / "w"), "--keep"])
    assert rc == 0
    lines = [l for l in buf.getvalue().splitlines() if l.startswith("{")]
    report = json.loads(lines[-1])
    assert report["standin"], "rehearsal must record its stand-ins"
    assert report["cache_channels"] == 1  # gray-packed CXR cache
