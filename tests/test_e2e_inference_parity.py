"""Full inference-API parity: the reference's get_model_predictions
(0426/load_model.py:73-135 — per-view encode → MultiViewFusion → prompt text
features from BERT → normalize → sigmoid(sim·4.0) > 0.5) in torch vs our
InferenceSession with every weight flowing through the importers."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from clip_for_dl_tpu.core.config import DISEASE_LABELS, ModelConfig
from clip_for_dl_tpu.inference import InferenceSession
from clip_for_dl_tpu.models import CXRClip, import_hf_bert
from clip_for_dl_tpu.models import torch_import as ti
from clip_for_dl_tpu.models.resnet import import_torchvision_resnet50
from clip_for_dl_tpu.testing import (
    TorchMultiViewFusion,
    TorchResidualProjection,
    TorchResNet,
    randomize_bn_stats,
)
from clip_for_dl_tpu.text import BertTokenizer, build_tiny_vocab

transformers = pytest.importorskip("transformers")
torch.manual_seed(0)


def test_inference_session_full_parity(rng, tmp_path):
    # shared tokenizer (our WordPiece == HF on the same vocab, proven in
    # test_tokenizer.py; here we use ours on both sides)
    vocab = build_tiny_vocab(
        "a chest x-ray of".split()
        + [w for d in DISEASE_LABELS for w in d.lower().split()]
    )
    tokenizer = BertTokenizer(vocab)

    cfg = ModelConfig(
        image_size=64, max_text_length=16, vocab_size=len(vocab),
        text_embedding_dim=32, text_layers=2, text_heads=2,
        text_intermediate_dim=64, shared_embedding_dim=64,
        text_max_position=64,
        resnet_stages=(1, 1, 1, 1), resnet_width=8,
    )

    # torch reference modules
    t_resnet = TorchResNet(cfg.resnet_stages, cfg.resnet_width)
    randomize_bn_stats(t_resnet)
    t_resnet.eval()
    feat = cfg.resnet_width * 8 * 4
    t_img_proj = TorchResidualProjection(feat, 64, "image_projection").eval()
    t_txt_proj = TorchResidualProjection(32, 64, "text_projection").eval()
    t_fusion = TorchMultiViewFusion(64).eval()
    hf_cfg = transformers.BertConfig(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    t_bert = transformers.BertModel(hf_cfg).eval()

    # reference forward (load_model.py semantics)
    prompts = [f"a chest x-ray of {d.lower()}" for d in DISEASE_LABELS]
    enc = tokenizer.encode(prompts, max_length=16)
    with torch.no_grad():
        hidden = t_bert(
            input_ids=torch.from_numpy(enc["input_ids"].astype(np.int64)),
            attention_mask=torch.from_numpy(enc["attention_mask"].astype(np.int64)),
        ).last_hidden_state[:, 0, :]
        t_text = F.normalize(t_txt_proj(hidden), dim=-1)

    images = rng.integers(0, 255, (3, 2, 64, 64, 3), dtype=np.uint8)
    x = images.astype(np.float32) / 255.0  # mean 0 / std 1 path
    flat = torch.from_numpy(
        x.reshape(6, 64, 64, 3).transpose(0, 3, 1, 2)
    )
    with torch.no_grad():
        emb = t_resnet(flat).flatten(1)
        proj = t_img_proj(emb).reshape(3, 2, 64)
        fused = t_fusion(proj[:, 0], proj[:, 1])
        sims = F.normalize(fused, dim=-1) @ t_text.T
        want_probs = torch.sigmoid(sims * 4.0).numpy()

    # our side: import every module's weights
    model = CXRClip(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 16), jnp.int32)
    )
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    rp, rs = import_torchvision_resnet50(t_resnet.state_dict())
    params["image_tower"] = jax.tree.map(jnp.asarray, rp)
    stats["image_tower"] = jax.tree.map(jnp.asarray, rs)
    params["image_projector"] = jax.tree.map(
        jnp.asarray,
        ti.import_residual_projection(t_img_proj.state_dict(), "image_projection"),
    )
    params["text_projector"] = jax.tree.map(
        jnp.asarray,
        ti.import_residual_projection(t_txt_proj.state_dict(), "text_projection"),
    )
    params["view_fusion"] = jax.tree.map(
        jnp.asarray, ti.import_multiview_fusion(t_fusion.state_dict())
    )
    params["text_tower"] = jax.tree.map(
        jnp.asarray, import_hf_bert(t_bert.state_dict(), layers=2)
    )
    variables = {"params": params, "batch_stats": stats}

    session = InferenceSession(
        model, variables, tokenizer, DISEASE_LABELS,
        mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0),
        image_size=64, max_text_length=16,
    )
    # fp32 forward for strict comparison
    session._forward = jax.jit(
        lambda v, img, tf: _fp32_forward(model, v, img, tf)
    )
    preds, probs = session(images)
    np.testing.assert_allclose(probs, want_probs, atol=2e-4)
    np.testing.assert_array_equal(preds, (want_probs > 0.5).astype(np.float32))


def _fp32_forward(model, variables, images_u8, text_features):
    from clip_for_dl_tpu.ops.image_prep import preprocess_images
    from clip_for_dl_tpu.ops.similarity import l2_normalize

    b = images_u8.shape[0]
    flat = images_u8.reshape((b * 2, *images_u8.shape[2:]))
    x = preprocess_images(flat, 64, 64, (0, 0, 0), (1, 1, 1), jnp.float32)
    fused = model.apply(
        variables, x.reshape((b, 2, *x.shape[1:])), method="encode_multiview"
    )
    sims = l2_normalize(fused.astype(jnp.float32)) @ text_features.T
    return jax.nn.sigmoid(sims * 4.0)
