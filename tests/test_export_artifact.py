"""Portable StableHLO deployment artifacts (clip_for_dl_tpu/export.py):
the serialized scorer must reproduce InferenceSession exactly, survive a
bytes roundtrip, accept any batch size (symbolic batch dim), and fail
loudly on geometry mismatches."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_for_dl_tpu.core.config import DISEASE_LABELS, ModelConfig
from clip_for_dl_tpu.export import (
    MANIFEST_FILE,
    SCORER_FILE,
    TEXT_ENCODER_FILE,
    ExportedScorer,
    ExportedTextEncoder,
    export_multiview_scorer,
    export_text_encoder,
    make_multiview_scorer,
    write_artifact,
)
from clip_for_dl_tpu.inference import InferenceSession
from clip_for_dl_tpu.models import CXRClip
from clip_for_dl_tpu.text import BertTokenizer, build_tiny_vocab
from clip_for_dl_tpu.zeroshot.prompts import create_basic_prompts

TINY = ModelConfig(
    image_size=32, max_text_length=16, text_embedding_dim=32, text_layers=1,
    text_heads=2, text_intermediate_dim=64, shared_embedding_dim=64,
    resnet_stages=(1, 1, 1, 1), resnet_width=8,
)


@pytest.fixture(scope="module")
def setup():
    vocab = build_tiny_vocab(
        "this chest x-ray shows a of normal".split()
        + [w for d in DISEASE_LABELS for w in d.lower().split()]
        + [w for d in DISEASE_LABELS for w in d.split()]
    )
    cfg = dataclasses.replace(TINY, vocab_size=len(vocab))
    tokenizer = BertTokenizer(vocab)
    model = CXRClip(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 16), jnp.int32),
    )
    session = InferenceSession(
        model, variables, tokenizer, DISEASE_LABELS,
        image_size=32, max_text_length=16,
    )
    return model, variables, tokenizer, session, cfg


class TestScorerExport:
    def test_roundtrip_matches_inference_session(self, setup, rng, tmp_path):
        model, variables, _, session, _ = setup
        data = export_multiview_scorer(
            model, variables, session.text_features, 32,
            session.mean, session.std,
        )
        path = tmp_path / SCORER_FILE
        path.write_bytes(data)
        scorer = ExportedScorer(str(path))
        for b in (1, 3):  # symbolic batch: one artifact, several sizes
            imgs = rng.integers(0, 255, (b, 2, 32, 32, 3), dtype=np.uint8)
            preds, probs = scorer(imgs)
            _, ref = session(imgs)
            np.testing.assert_allclose(probs, ref, atol=2e-6)
            assert preds.shape == (b, 16)
            assert set(np.unique(preds)) <= {0.0, 1.0}

    def test_source_geometry_baked_and_validated(self, setup, rng):
        model, variables, _, session, _ = setup
        data = export_multiview_scorer(
            model, variables, session.text_features, 32,
            session.mean, session.std, source_hw=(48, 48),
        )
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, SCORER_FILE)
            with open(p, "wb") as f:
                f.write(data)
            scorer = ExportedScorer(p)
            assert scorer.input_hw == (48, 48)
            # the 48->32 resize is baked in: matches the live fn
            imgs = rng.integers(0, 255, (2, 2, 48, 48, 3), dtype=np.uint8)
            live = make_multiview_scorer(
                model, variables, session.text_features, 32,
                session.mean, session.std,
            )
            _, probs = scorer(imgs)
            np.testing.assert_allclose(
                probs, np.asarray(live(jnp.asarray(imgs))), atol=2e-6
            )
            with pytest.raises(ValueError, match="exported geometry"):
                scorer(rng.integers(0, 255, (2, 2, 32, 32, 3), np.uint8))

    def test_artifact_dir_carries_manifest_labels(self, setup, rng, tmp_path):
        model, variables, _, session, _ = setup
        data = export_multiview_scorer(
            model, variables, session.text_features, 32,
            session.mean, session.std,
        )
        write_artifact(
            str(tmp_path), data,
            manifest={"disease_labels": list(DISEASE_LABELS)[:16]},
        )
        assert (tmp_path / MANIFEST_FILE).exists()
        scorer = ExportedScorer(str(tmp_path), threshold=0.7)
        assert scorer.disease_list == list(DISEASE_LABELS)[:16]
        imgs = rng.integers(0, 255, (2, 2, 32, 32, 3), dtype=np.uint8)
        preds, probs = scorer(imgs)
        assert (preds == (probs > 0.7)).all()  # threshold honored


class TestSingleViewExport:
    def test_lockstep_with_live_engine(self, setup, rng, tmp_path):
        from clip_for_dl_tpu.core.config import ZeroShotConfig
        from clip_for_dl_tpu.export import (
            SINGLEVIEW_FILE,
            ExportedEngine,
            export_singleview_scorer,
        )
        from clip_for_dl_tpu.zeroshot import ZeroShotEngine, prompts_for_family

        model, variables, tokenizer, _, cfg = setup
        engine = ZeroShotEngine(
            model, variables, tokenizer, DISEASE_LABELS,
            ZeroShotConfig(temperature=0.5), image_size=32,
            max_text_length=16,
        )
        engine.build_text_features(
            prompts_for_family("prediction", DISEASE_LABELS)
        )
        data = export_singleview_scorer(
            model, variables, engine.text_features, 32,
            engine.mean, engine.std, temperature=0.5,
        )
        write_artifact(
            str(tmp_path), b"", singleview_bytes=data,
            manifest={"disease_labels": list(DISEASE_LABELS)},
        )
        exp = ExportedEngine(str(tmp_path))
        assert exp.image_size == 32
        imgs = rng.integers(0, 255, (3, 32, 32, 3), dtype=np.uint8)
        np.testing.assert_allclose(
            exp.logits(imgs), engine.logits(imgs), atol=2e-5
        )
        np.testing.assert_allclose(
            exp.probs(imgs), engine.probs(imgs), atol=2e-6
        )
        # multi-view input flattens like the live engine
        mv = rng.integers(0, 255, (2, 2, 32, 32, 3), dtype=np.uint8)
        np.testing.assert_allclose(
            exp.logits(mv), engine.logits(mv), atol=2e-5
        )
        with pytest.raises(ValueError, match="exported geometry"):
            exp.logits(rng.integers(0, 255, (2, 48, 48, 3), np.uint8))
        # missing module file → clear error
        with pytest.raises(FileNotFoundError, match="stablehlo"):
            ExportedEngine(str(tmp_path / "nope" / SINGLEVIEW_FILE))

    def test_serves_through_zeroshot_service(self, setup, rng, tmp_path):
        from clip_for_dl_tpu.export import (
            ExportedEngine,
            export_singleview_scorer,
        )
        from clip_for_dl_tpu.serving import ZeroShotService
        from clip_for_dl_tpu.zeroshot import ZeroShotEngine, prompts_for_family

        model, variables, tokenizer, _, _ = setup
        engine = ZeroShotEngine(
            model, variables, tokenizer, DISEASE_LABELS,
            image_size=32, max_text_length=16,
        )
        engine.build_text_features(
            prompts_for_family("prediction", DISEASE_LABELS)
        )
        data = export_singleview_scorer(
            model, variables, engine.text_features, 32,
            engine.mean, engine.std,
            temperature=engine.config.temperature,
        )
        write_artifact(
            str(tmp_path), b"", singleview_bytes=data,
            manifest={"disease_labels": list(DISEASE_LABELS)},
        )
        service = ZeroShotService(
            ExportedEngine(str(tmp_path)), DISEASE_LABELS,
            buckets=(1, 2), max_wait_ms=1.0, image_size=32,
        )
        try:
            out = service.predict_one(
                rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            )
            assert set(out["probs"]) == set(DISEASE_LABELS)
            assert all(0.0 <= p <= 1.0 for p in out["probs"].values())
        finally:
            service.close()


class TestAdapterExport:
    def test_lockstep_with_adapter_engine_and_service(
        self, setup, rng, tmp_path
    ):
        from clip_for_dl_tpu.export import (
            ADAPTER_FILE,
            ExportedEngine,
            export_adapter_scorer,
        )
        from clip_for_dl_tpu.inference import AdapterEngine
        from clip_for_dl_tpu.serving import ZeroShotService

        model, variables, _, _, _ = setup
        live = AdapterEngine(model, variables, image_size=32)
        data = export_adapter_scorer(model, variables, 32, (0, 0, 0),
                                     (1, 1, 1))
        write_artifact(
            str(tmp_path), b"", adapter_bytes=data,
            manifest={"disease_labels": list(DISEASE_LABELS)},
        )
        exp = ExportedEngine(str(tmp_path), module=ADAPTER_FILE)
        imgs = rng.integers(0, 255, (3, 32, 32, 3), dtype=np.uint8)
        np.testing.assert_allclose(
            exp.logits(imgs), live.logits(imgs), atol=2e-5
        )
        # multi-view flattening matches
        mv = rng.integers(0, 255, (2, 2, 32, 32, 3), dtype=np.uint8)
        np.testing.assert_allclose(
            exp.logits(mv), live.logits(mv), atol=2e-5
        )
        # both engines drive the service (async _dispatch path)
        for engine in (live, exp):
            service = ZeroShotService(
                engine, DISEASE_LABELS, buckets=(1,), max_wait_ms=1.0,
                image_size=32,
            )
            try:
                out = service.predict_one(
                    rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                )
                assert set(out["probs"]) == set(DISEASE_LABELS)
            finally:
                service.close()


class TestServeExportedCLI:
    def test_exported_rejects_checkpoint_tp_ema(self, tmp_path):
        from clip_for_dl_tpu.cli.main import main

        for extra in (["--checkpoint", "ckpts"], ["--tp", "2"],
                      ["--use-ema"]):
            with pytest.raises(SystemExit, match="--exported"):
                main(["serve", "--exported", str(tmp_path)] + extra)

    def test_head_adapter_rejects_tp(self):
        from clip_for_dl_tpu.cli.main import main

        with pytest.raises(SystemExit, match="--head adapter"):
            main(["serve", "--tiny", "--head", "adapter", "--tp", "2"])


class TestTextEncoderExport:
    def test_roundtrip_matches_encode_text(self, setup, tmp_path):
        model, variables, tokenizer, _, cfg = setup
        data = export_text_encoder(model, variables, cfg.max_text_length)
        path = tmp_path / TEXT_ENCODER_FILE
        path.write_bytes(data)
        enc_fn = ExportedTextEncoder(str(path))
        assert enc_fn.max_text_length == 16
        enc = tokenizer.encode(
            create_basic_prompts(DISEASE_LABELS), max_length=16
        )
        got = enc_fn(enc["input_ids"], enc["attention_mask"])
        ref = model.apply(
            variables, jnp.asarray(enc["input_ids"]),
            jnp.asarray(enc["attention_mask"]),
            normalize=True, method="encode_text",
        )
        np.testing.assert_allclose(got, np.asarray(ref), atol=2e-6)
        # L2-normalized rows
        np.testing.assert_allclose(
            np.linalg.norm(got, axis=-1), 1.0, atol=1e-5
        )

    def test_length_validated(self, setup, tmp_path):
        model, variables, _, _, cfg = setup
        data = export_text_encoder(model, variables, cfg.max_text_length)
        path = tmp_path / TEXT_ENCODER_FILE
        path.write_bytes(data)
        enc_fn = ExportedTextEncoder(str(path))
        bad = np.zeros((2, 8), np.int32)
        with pytest.raises(ValueError, match="max_text_length"):
            enc_fn(bad, bad)


class TestExportTool:
    def test_stablehlo_flag_writes_runnable_artifact(self, rng, tmp_path):
        import sys

        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "tools")
        )
        try:
            import export_inference
        finally:
            sys.path.pop(0)
        out = tmp_path / "artifact"
        rc = export_inference.main([
            "--checkpoint", "fresh", "--out", str(out), "--tiny",
            "--stablehlo",
        ])
        assert rc == 0
        assert (out / SCORER_FILE).exists()
        assert (out / TEXT_ENCODER_FILE).exists()
        assert (out / "manifest.json").exists()
        labels = json.loads((out / "manifest.json").read_text())[
            "disease_labels"]
        scorer = ExportedScorer(str(out))
        assert scorer.disease_list == labels
        s = scorer.input_hw[0]
        imgs = rng.integers(0, 255, (2, 2, s, s, 3), dtype=np.uint8)
        preds, probs = scorer(imgs)
        assert probs.shape == (2, len(labels))
        assert ((probs >= 0) & (probs <= 1)).all()
