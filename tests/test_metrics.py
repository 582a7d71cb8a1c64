"""Metric suite vs sklearn ground truth."""

import numpy as np
import pytest
import sklearn.metrics as skm

from clip_for_dl_tpu.evals import (
    MeanAccumulator,
    auroc_per_class,
    exact_match,
    f1_scores,
    hamming_loss,
    jaccard_example_accuracy,
    lrap,
    macro_auroc,
    mean_average_precision,
    multilabel_metrics,
    per_class_report,
    top_k_accuracy,
)


@pytest.fixture
def data(rng):
    scores = rng.random((64, 16)).astype(np.float64)
    true = (rng.random((64, 16)) > 0.8).astype(np.int32)
    true[0] = 0  # an all-negative sample
    pred = (scores > 0.5).astype(np.int32)
    return scores, true, pred


def test_hamming_loss(data):
    scores, true, pred = data
    assert hamming_loss(pred, true) == pytest.approx(
        skm.hamming_loss(true, pred)
    )


def test_exact_match(data):
    scores, true, pred = data
    assert exact_match(pred, true) == pytest.approx(
        skm.accuracy_score(true, pred)
    )


def test_jaccard(data):
    scores, true, pred = data
    # sklearn jaccard_score(samples) warns on empty unions and scores them 0
    # unless zero_division=1; the notebook metric counts them as 1.
    want = skm.jaccard_score(true, pred, average="samples", zero_division=1)
    assert jaccard_example_accuracy(pred, true) == pytest.approx(want)


def test_f1_family(data):
    scores, true, pred = data
    got = f1_scores(pred, true)
    for avg in ("macro", "micro", "weighted", "samples"):
        want = skm.f1_score(true, pred, average=avg, zero_division=0)
        assert got[f"f1_{avg}"] == pytest.approx(want), avg


def test_per_class_report(data):
    scores, true, pred = data
    rep = per_class_report(pred, true, [f"c{i}" for i in range(16)])
    p, r, f, s = skm.precision_recall_fscore_support(true, pred, zero_division=0)
    for i in range(16):
        assert rep[f"c{i}"]["precision"] == pytest.approx(p[i])
        assert rep[f"c{i}"]["recall"] == pytest.approx(r[i])
        assert rep[f"c{i}"]["f1"] == pytest.approx(f[i])


def test_map(data):
    scores, true, pred = data
    want = skm.average_precision_score(true, scores, average="macro")
    assert mean_average_precision(scores, true) == pytest.approx(want, abs=1e-9)


def test_lrap(data):
    scores, true, pred = data
    want = skm.label_ranking_average_precision_score(true, scores)
    assert lrap(scores, true) == pytest.approx(want, abs=1e-9)


def test_lrap_with_ties(rng):
    scores = np.round(rng.random((32, 8)), 1)  # force ties
    true = (rng.random((32, 8)) > 0.7).astype(np.int32)
    want = skm.label_ranking_average_precision_score(true, scores)
    assert lrap(scores, true) == pytest.approx(want, abs=1e-9)


def test_auroc(data):
    scores, true, pred = data
    got = auroc_per_class(scores, true)
    for c in range(16):
        if true[:, c].sum() in (0, len(true)):
            assert np.isnan(got[c])
        else:
            want = skm.roc_auc_score(true[:, c], scores[:, c])
            assert got[c] == pytest.approx(want, abs=1e-9)
    valid = [c for c in range(16) if 0 < true[:, c].sum() < len(true)]
    want_macro = np.mean(
        [skm.roc_auc_score(true[:, c], scores[:, c]) for c in valid]
    )
    assert macro_auroc(scores, true) == pytest.approx(want_macro, abs=1e-9)


def test_auroc_with_ties(rng):
    scores = np.round(rng.random((64, 4)), 1)
    true = (rng.random((64, 4)) > 0.6).astype(np.int32)
    got = auroc_per_class(scores, true)
    for c in range(4):
        want = skm.roc_auc_score(true[:, c], scores[:, c])
        assert got[c] == pytest.approx(want, abs=1e-9)


def test_top_k(rng):
    scores = np.array([[0.9, 0.1, 0.5], [0.2, 0.8, 0.3]])
    true = np.array([[0, 0, 1], [0, 1, 0]])
    assert top_k_accuracy(scores, true, 1) == pytest.approx(0.5)
    assert top_k_accuracy(scores, true, 2) == pytest.approx(1.0)


def test_aggregate_has_all_keys(data):
    scores, true, pred = data
    m = multilabel_metrics(scores, true, class_names=[f"c{i}" for i in range(16)])
    for key in (
        "sample_accuracy", "label_accuracy", "hamming_score", "hamming_loss",
        "exact_match", "jaccard", "top1_accuracy", "top3_accuracy", "mAP",
        "LRAP", "auroc_macro", "f1_macro", "f1_micro", "f1_weighted",
        "f1_samples", "auroc/c0",
    ):
        assert key in m, key


def test_mean_accumulator():
    acc = MeanAccumulator()
    acc.update(1.0, n=2)
    acc.update(4.0, n=1)
    assert acc.mean == pytest.approx(2.0)
    assert acc.last == 4.0


def test_top1_per_label_counts():
    from clip_for_dl_tpu.evals import top1_per_label_counts

    scores = np.array([[0.9, 0.1], [0.8, 0.2], [0.3, 0.7]])
    true = np.array([[1, 0], [0, 1], [0, 1]])
    counts = top1_per_label_counts(scores, true)
    assert counts[0] == {"predicted": 2, "correct": 1}
    assert counts[1] == {"predicted": 1, "correct": 1}


class TestBootstrapCI:
    def _data(self, n=120, seed=3):
        rng = np.random.default_rng(seed)
        true = (rng.random((n, 6)) < 0.3).astype(np.int32)
        # informative but overlapping scores → AUROC well inside (0.5, 1)
        scores = np.clip(0.35 * true + 0.65 * rng.random((n, 6)), 0.0, 1.0)
        return scores, true

    def test_interval_brackets_point_and_orders(self):
        from clip_for_dl_tpu.evals import bootstrap_ci

        scores, true = self._data()
        cis = bootstrap_ci(scores, true, n_boot=200, seed=0)
        for k, c in cis.items():
            assert c["lo"] <= c["hi"], k
            # percentile bootstrap: point estimate inside the 95% interval
            # for these well-behaved metrics
            assert c["lo"] - 1e-9 <= c["value"] <= c["hi"] + 1e-9, k
        # the CI is non-degenerate for a continuous metric
        assert cis["auroc_macro"]["hi"] > cis["auroc_macro"]["lo"]

    def test_deterministic_and_metric_subset(self):
        from clip_for_dl_tpu.evals import bootstrap_ci

        scores, true = self._data()
        a = bootstrap_ci(scores, true, n_boot=50, seed=7,
                         metrics=("auroc_macro", "f1_micro"))
        b = bootstrap_ci(scores, true, n_boot=50, seed=7,
                         metrics=("auroc_macro", "f1_micro"))
        assert a == b
        assert set(a) == {"auroc_macro", "f1_micro"}
        with pytest.raises(KeyError, match="unknown metric"):
            bootstrap_ci(scores, true, n_boot=10, metrics=("nope",))

    def test_more_samples_tighter_interval(self):
        from clip_for_dl_tpu.evals import bootstrap_ci

        small = self._data(n=40, seed=1)
        large = self._data(n=640, seed=1)
        w_small = bootstrap_ci(*small, n_boot=200, seed=2,
                               metrics=("auroc_macro",))["auroc_macro"]
        w_large = bootstrap_ci(*large, n_boot=200, seed=2,
                               metrics=("auroc_macro",))["auroc_macro"]
        assert (w_large["hi"] - w_large["lo"]) < (w_small["hi"] - w_small["lo"])

    def test_degenerate_replicates_excluded(self):
        from clip_for_dl_tpu.evals import bootstrap_ci

        # one positive in one class: many replicates lose it → NaN AUROC
        true = np.zeros((20, 2), np.int32)
        true[0, 0] = 1
        true[:10, 1] = 1
        rng = np.random.default_rng(0)
        scores = rng.random((20, 2))
        cis = bootstrap_ci(scores, true, n_boot=100, seed=0,
                           metrics=("auroc_macro",))
        assert cis["auroc_macro"]["n_boot"] <= 100
        assert np.isfinite(cis["auroc_macro"]["lo"])
