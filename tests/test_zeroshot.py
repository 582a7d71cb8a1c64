"""Zero-shot layer: prompts, predictors, thresholds, engine end-to-end."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from clip_for_dl_tpu.core.config import DISEASE_LABELS, ModelConfig, ZeroShotConfig
from clip_for_dl_tpu.models import CXRClip
from clip_for_dl_tpu.text import BertTokenizer, build_tiny_vocab
from clip_for_dl_tpu.zeroshot import (
    ZeroShotEngine,
    analyze_disease_distribution,
    create_basic_prompts,
    create_enhanced_prompts_with_findings,
    create_prediction_prompts,
    create_rich_prompts,
    merge_views_union_max,
    merge_views_weighted,
    predictions_to_matrix,
    prompts_for_family,
    search_threshold,
    search_thresholds,
    sigmoid_predictions,
    softmax_topk_predictions,
)


class TestPrompts:
    def test_distribution(self):
        df = pd.DataFrame({"Problems": [
            "Cardiomegaly;Nodule", "Cardiomegaly", "Nodule;Cardiomegaly", None,
        ]})
        stats = analyze_disease_distribution(df)
        assert stats.loc["Cardiomegaly", "total_count"] == 3
        assert stats.loc["Cardiomegaly", "first_position_count"] == 2
        assert stats.loc["Nodule", "percentage_as_first"] == pytest.approx(50.0)

    def test_rich_prompt_conditioning(self):
        stats = pd.DataFrame({
            "total_count": [20, 7, 2],
            "first_position_count": [18, 4, 0],
            "percentage_as_first": [90.0, 57.0, 0.0],
            "frequency": [20, 7, 2],
        }, index=["A", "B", "C"])
        p = create_rich_prompts(stats)
        assert len(p["A"]) == 10 and len(p["B"]) == 9 and len(p["C"]) == 9
        assert any("typical case" in t for t in p["A"])
        assert any("primary finding" in t for t in p["A"])
        assert any("possible signs" in t for t in p["C"])

    def test_prediction_prompts_normal_special_case(self):
        prompts = create_prediction_prompts(["Cardiomegaly", "Normal"])
        assert prompts[0] == "This chest X-ray shows Cardiomegaly."
        assert "normal chest X-ray" in prompts[1]

    def test_basic_prompts(self):
        assert create_basic_prompts(["Mass"]) == ["a chest x-ray of mass"]

    def test_findings_prompts(self):
        df = pd.DataFrame({
            "Problems": ["Cardiomegaly;Nodule"],
            "Findings": ["enlarged heart"],
        })
        p = create_enhanced_prompts_with_findings(df)
        assert len(p["Cardiomegaly"]) == 5
        assert any("enlarged heart" in t for t in p["Cardiomegaly"])

    def test_family_accessor(self):
        fam = prompts_for_family("prediction", DISEASE_LABELS)
        assert set(fam) == set(DISEASE_LABELS)


class TestPredictors:
    def test_sigmoid_threshold_and_backfill(self):
        probs = np.array([[0.9, 0.6, 0.1], [0.1, 0.2, 0.3]])
        preds, scores = sigmoid_predictions(probs, ["a", "b", "c"], 0.5)
        assert preds[0] == ["a", "b"]
        assert preds[1] == ["c"]  # backfill top-1 when nothing clears
        assert scores[1] == [pytest.approx(0.3)]

    def test_sigmoid_per_disease_thresholds(self):
        probs = np.array([[0.9, 0.6, 0.1]])
        preds, _ = sigmoid_predictions(
            probs, ["a", "b", "c"], {"a": 0.95, "b": 0.5, "c": 0.05}
        )
        assert preds[0] == ["b", "c"]

    def test_sigmoid_topk_truncation(self):
        probs = np.array([[0.9, 0.8, 0.7, 0.6]])
        preds, _ = sigmoid_predictions(probs, list("abcd"), 0.5, top_k=2)
        assert preds[0] == ["a", "b"]

    def test_softmax_topk(self):
        logits = np.array([[2.0, 1.0, 0.0]])
        preds, scores = softmax_topk_predictions(logits, ["a", "b", "c"], 2)
        assert preds[0] == ["a", "b"]
        assert sum(scores[0]) < 1.0 and scores[0][0] > scores[0][1]

    def test_union_max_merge(self):
        preds, scores = merge_views_union_max(
            ["a", "b"], [0.9, 0.5], ["b", "c"], [0.7, 0.6]
        )
        d = dict(zip(preds, scores))
        assert d == {"a": 0.9, "b": 0.7, "c": 0.6}

    def test_weighted_merge_with_fallback(self):
        vp = np.zeros((2, 2, 3))
        vp[0] = [[0.9, 0.1, 0.1], [0.2, 0.95, 0.1]]  # lateral weighted 0.8
        vp[1] = [[0.1, 0.1, 0.2], [0.1, 0.1, 0.1]]  # nothing clears → argmax
        preds, scores = merge_views_weighted(
            vp, ["a", "b", "c"], {"a": 0.5, "b": 0.5, "c": 0.5}
        )
        assert preds[0] == ["a", "b"]
        assert scores[0][1] == pytest.approx(0.95 * 0.8)
        assert preds[1] == ["c"]

    def test_predictions_to_matrix(self):
        m = predictions_to_matrix([["a"], ["b", "junk"]], ["a", "b"])
        np.testing.assert_array_equal(m, [[1, 0], [0, 1]])


class TestThresholds:
    def test_separable_distributions(self, rng):
        pos = rng.normal(0.8, 0.02, 50)
        neg = rng.normal(0.2, 0.02, 200)
        scores = np.concatenate([pos, neg])
        labels = np.concatenate([np.ones(50), np.zeros(200)])
        t = search_threshold(scores, labels)
        # grid keeps the FIRST F1-maximizing point, i.e. just above the
        # negative cluster
        assert 0.25 < t < 0.79
        preds = (scores >= t).astype(int)
        np.testing.assert_array_equal(preds, labels)

    def test_degenerate_cases(self):
        assert search_threshold(np.array([0.5]), np.array([0])) == 0.8
        assert search_threshold(np.array([0.5]), np.array([1])) == 0.2
        assert search_threshold(np.array([]), np.array([])) == 0.3

    def test_matrix_search(self, rng):
        scores = rng.random((40, 3))
        labels = (rng.random((40, 3)) > 0.5).astype(int)
        th = search_thresholds(scores, labels, ["a", "b", "c"])
        assert set(th) == {"a", "b", "c"}
        assert all(0.0 <= v <= 0.9 for v in th.values())


@pytest.fixture(scope="module")
def engine():
    cfg = ModelConfig(
        image_size=32, max_text_length=16, vocab_size=None,  # set below
        text_embedding_dim=32, text_layers=1, text_heads=2,
        text_intermediate_dim=64, shared_embedding_dim=64,
    )
    vocab = build_tiny_vocab(
        ["this chest x-ray shows normal without any significant findings is a of"]
        + [d.lower() for d in DISEASE_LABELS]
        + list(DISEASE_LABELS)
    )
    cfg = dataclasses.replace(cfg, vocab_size=len(vocab))
    tok_path_vocab = vocab
    tokenizer = BertTokenizer(tok_path_vocab, do_lower_case=False)
    model = CXRClip(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 16), jnp.int32)
    )
    eng = ZeroShotEngine(
        model, variables, tokenizer, DISEASE_LABELS,
        ZeroShotConfig(), image_size=32, max_text_length=16,
        compute_dtype=jnp.float32,
    )
    eng.build_text_features(prompts_for_family("prediction", DISEASE_LABELS))
    return eng


class TestEngine:
    def test_text_features_shape(self, engine):
        assert engine.text_features.shape == (16, 64)

    def test_logits_and_probs(self, engine, rng):
        imgs = rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8)
        logits = engine.logits(imgs)
        assert logits.shape == (4, 16)
        probs = engine.probs(imgs)
        assert ((probs > 0) & (probs < 1)).all()

    def test_multiview_flattening(self, engine, rng):
        imgs = rng.integers(0, 255, (2, 2, 32, 32, 3), dtype=np.uint8)
        logits = engine.logits(imgs)
        assert logits.shape == (4, 16)

    def test_predict_sets(self, engine, rng):
        imgs = rng.integers(0, 255, (3, 32, 32, 3), dtype=np.uint8)
        preds, scores = engine.predict(imgs, top_k=3)
        assert len(preds) == 3
        assert all(1 <= len(p) <= 16 for p in preds)

    def test_deterministic(self, engine, rng):
        imgs = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
        np.testing.assert_allclose(engine.logits(imgs), engine.logits(imgs))


class TestAuxiliaryPredictHelpers:
    def test_unique_problem_labels(self):
        from clip_for_dl_tpu.zeroshot import unique_problem_labels

        out = unique_problem_labels(["A;B", "B; C", None, 3])
        assert sorted(out) == ["A", "B", "C"]

    def test_frequency_thresholds(self):
        import pandas as pd

        from clip_for_dl_tpu.zeroshot import frequency_thresholds

        stats = pd.DataFrame({"frequency": [200, 5]}, index=["a", "b"])
        assert frequency_thresholds(stats) == [0.4, 0.6]

    def test_adjust_predictions_by_cooccurrence(self):
        import pandas as pd

        from clip_for_dl_tpu.zeroshot import adjust_predictions_by_cooccurrence

        diseases = ["a", "b", "c"]
        cooc = pd.DataFrame(
            [[0, 10, 0], [10, 0, 0], [0, 0, 0]],
            index=diseases, columns=diseases,
        )
        pred = np.array([[1, 0, 0], [1, 1, 0]], np.float32)
        out = adjust_predictions_by_cooccurrence(pred, cooc, diseases)
        assert out[0].tolist() == [1, 1, 0]  # b switched on via co-occurrence
        assert out[1].tolist() == [1, 1, 0]  # multi-pred rows untouched


class TestStreaming:
    def test_stream_logits_matches_sync_and_preserves_order(self, engine, rng):
        batches = [
            {"images": rng.integers(0, 255, (3, 32, 32, 3), dtype=np.uint8),
             "tag": i}
            for i in range(4)
        ]
        streamed = list(engine.stream_logits(iter(batches)))
        assert [b["tag"] for b, _ in streamed] == [0, 1, 2, 3]
        for b, logits in streamed:
            np.testing.assert_allclose(
                logits, engine.logits(b["images"]), atol=1e-5
            )
