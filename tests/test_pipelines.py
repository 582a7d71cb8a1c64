"""End-to-end pipeline tests: zero-shot eval drivers + inference session on
synthetic multi-view data with a tiny model."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_for_dl_tpu.core.config import DISEASE_LABELS, ModelConfig, ZeroShotConfig
from clip_for_dl_tpu.data import HostLoader, SyntheticMultiViewDataset
from clip_for_dl_tpu.inference import InferenceSession, load_trained_model
from clip_for_dl_tpu.models import CXRClip
from clip_for_dl_tpu.text import BertTokenizer, build_tiny_vocab
from clip_for_dl_tpu.zeroshot import ZeroShotEngine, prompts_for_family
from clip_for_dl_tpu.zeroshot.driver import (
    run_dynamic_threshold_eval,
    run_zero_shot_eval,
)

TINY = ModelConfig(
    image_size=32, max_text_length=16, text_embedding_dim=32, text_layers=1,
    text_heads=2, text_intermediate_dim=64, shared_embedding_dim=64,
    resnet_stages=(1, 1, 1, 1), resnet_width=8,
)


@pytest.fixture(scope="module")
def setup():
    vocab = build_tiny_vocab(
        "this chest x-ray shows a of normal without any significant findings".split()
        + [w for d in DISEASE_LABELS for w in d.lower().split()]
        + [w for d in DISEASE_LABELS for w in d.split()]
    )
    cfg = dataclasses.replace(TINY, vocab_size=len(vocab))
    tokenizer = BertTokenizer(vocab)
    model = CXRClip(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 16), jnp.int32)
    )
    engine = ZeroShotEngine(
        model, variables, tokenizer, DISEASE_LABELS,
        ZeroShotConfig(), image_size=32, max_text_length=16,
        compute_dtype=jnp.float32,
    )
    engine.build_text_features(prompts_for_family("prediction", DISEASE_LABELS))
    return model, variables, tokenizer, engine, cfg


def loader():
    ds = SyntheticMultiViewDataset(n=20, image_size=32)
    return HostLoader(ds, batch_size=8, pad_final=True)


class TestZeroShotDriver:
    def test_union_max_pipeline(self, setup, tmp_path):
        _, _, _, engine, _ = setup
        out = run_zero_shot_eval(
            engine, loader(), top_k=3, csv_path=str(tmp_path / "zs.csv")
        )
        assert out["pred_matrix"].shape == (20, 16)
        assert out["labels"].shape == (20, 16)
        m = out["metrics"]
        assert "set_f1_micro" in m and "auroc_macro" in m
        assert (tmp_path / "zs.csv").exists()
        # top-3 union over two views → between 3 and 6 predictions
        assert all(3 <= r.sum() <= 6 for r in out["pred_matrix"])

    def test_dynamic_threshold_pipeline(self, setup):
        _, _, _, engine, _ = setup
        out = run_dynamic_threshold_eval(engine, loader, calib_frac=0.5)
        assert set(out["thresholds"]) == set(DISEASE_LABELS)
        assert out["pred_matrix"].shape == (20, 16)
        assert (out["pred_matrix"].sum(axis=1) >= 1).all()  # argmax fallback
        assert "Cardiomegaly" in out["per_class"]


class TestInference:
    def test_session_predictions(self, setup, rng):
        model, variables, tokenizer, _, cfg = setup
        session = InferenceSession(
            model, variables, tokenizer, DISEASE_LABELS,
            image_size=32, max_text_length=16,
        )
        imgs = rng.integers(0, 255, (3, 2, 32, 32, 3), dtype=np.uint8)
        preds, probs = session(imgs)
        assert preds.shape == (3, 16) and probs.shape == (3, 16)
        assert ((probs >= 0) & (probs <= 1)).all()
        assert set(np.unique(preds)) <= {0.0, 1.0}

    def test_load_trained_model_fresh(self):
        import clip_for_dl_tpu.core.config as cc

        cfg = cc.ExperimentConfig(model=TINY)
        model, variables = load_trained_model(
            None, cfg, compute_dtype=jnp.float32
        )
        assert "params" in variables

    def test_load_reference_pth(self, tmp_path):
        import torch
        import torch.nn as tnn

        ip = tnn.Module()
        ip.image_projection = tnn.Linear(256, 64)
        ip.fc = tnn.Linear(64, 64)
        ip.layer_norm = tnn.LayerNorm(64)
        torch.save(
            {"epoch": 3, "models": {"image_projector": ip.state_dict()}},
            tmp_path / "model_best.pth",
        )
        import clip_for_dl_tpu.core.config as cc

        cfg = cc.ExperimentConfig(model=TINY)
        model, variables = load_trained_model(
            str(tmp_path / "model_best.pth"), cfg, compute_dtype=jnp.float32
        )
        got = np.asarray(variables["params"]["image_projector"]["projection"]["kernel"])
        want = ip.image_projection.weight.detach().numpy().T
        np.testing.assert_allclose(got, want, atol=1e-6)
