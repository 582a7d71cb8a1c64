"""End-to-end pipeline parity: the reference's full zero-shot forward in
torch (mirror ResNet-50 + notebook projection head) vs our jitted CXRClip
pipeline with weights flowing through the importers — final sigmoid
probabilities must agree. This is the offline version of the north-star
per-class-probability parity check (BASELINE.json); with the real
torchvision/Bio_ClinicalBERT weights dropped in, the same pathway validates
against the actual reference checkpoints (tools/parity_harness.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch

from clip_for_dl_tpu.core.config import ModelConfig
from clip_for_dl_tpu.models import CXRClip
from clip_for_dl_tpu.models.resnet import import_torchvision_resnet50
from clip_for_dl_tpu.models import torch_import as ti
from clip_for_dl_tpu.ops.similarity import l2_normalize, similarity
from clip_for_dl_tpu.testing import (
    TorchResidualProjection,
    TorchResNet,
    randomize_bn_stats,
    reference_zero_shot_probs,
)

torch.manual_seed(0)

CFG = ModelConfig(
    image_size=64, max_text_length=8, vocab_size=64, text_embedding_dim=16,
    text_layers=1, text_heads=2, text_intermediate_dim=32,
    shared_embedding_dim=64, resnet_stages=(1, 1, 1, 1), resnet_width=8,
)


def test_zero_shot_pipeline_probability_parity(rng):
    # torch reference pipeline (random weights standing in for the ckpt)
    t_resnet = TorchResNet(layers=CFG.resnet_stages, width=CFG.resnet_width)
    randomize_bn_stats(t_resnet)
    t_resnet.eval()
    feat_dim = CFG.resnet_width * 8 * 4
    t_proj = TorchResidualProjection(feat_dim, 64).eval()
    text_features = torch.randn(16, 64)

    images = rng.standard_normal((5, 64, 64, 3)).astype(np.float32)
    want = reference_zero_shot_probs(
        t_resnet, t_proj, text_features,
        torch.from_numpy(images.transpose(0, 3, 1, 2)), temperature=0.5,
    ).numpy()

    # ours: import the same weights, run the jitted pipeline
    model = CXRClip(CFG)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 8), jnp.int32)
    )
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    rp, rs = import_torchvision_resnet50(
        t_resnet.state_dict(), CFG.resnet_stages
    )
    params["image_tower"] = jax.tree.map(jnp.asarray, rp)
    stats["image_tower"] = jax.tree.map(jnp.asarray, rs)
    params["image_projector"] = jax.tree.map(
        jnp.asarray, ti.import_residual_projection(t_proj.state_dict())
    )
    variables = {"params": params, "batch_stats": stats}

    @jax.jit
    def pipeline(variables, images, text_features):
        feats = model.apply(
            variables, images, normalize=True, method="encode_image"
        )
        logits = similarity(feats, l2_normalize(text_features), 0.5,
                            use_pallas=False)
        return jax.nn.sigmoid(logits)

    got = np.asarray(
        pipeline(variables, jnp.asarray(images),
                 jnp.asarray(text_features.numpy()))
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pth_roundtrip_pipeline_parity(rng, tmp_path):
    """Same check through a serialized reference-style checkpoint.pth."""
    t_resnet = TorchResNet(layers=CFG.resnet_stages, width=CFG.resnet_width)
    randomize_bn_stats(t_resnet, seed=1)
    t_resnet.eval()
    feat_dim = CFG.resnet_width * 8 * 4
    t_proj = TorchResidualProjection(feat_dim, 64).eval()
    torch.save(
        {"epoch": 9, "models": {
            "resnet": t_resnet.state_dict(),
            "image_projector": t_proj.state_dict(),
        }},
        tmp_path / "model_best.pth",
    )

    from clip_for_dl_tpu.core.config import ExperimentConfig
    from clip_for_dl_tpu.inference import load_trained_model

    model, variables = load_trained_model(
        str(tmp_path / "model_best.pth"),
        ExperimentConfig(model=CFG),
        compute_dtype=jnp.float32,
    )
    images = rng.standard_normal((3, 64, 64, 3)).astype(np.float32)
    got = np.asarray(
        model.apply(variables, jnp.asarray(images), normalize=True,
                    method="encode_image")
    )
    with torch.no_grad():
        emb = t_resnet(torch.from_numpy(images.transpose(0, 3, 1, 2)))
        want = torch.nn.functional.normalize(t_proj(emb), dim=-1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)
