"""Interpretability: Grad-CAM math vs torch-hook reference, rollout math,
colormaps, attention viz file output."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from clip_for_dl_tpu.core.config import ModelConfig
from clip_for_dl_tpu.interpret import (
    attention_rollout,
    gradcam,
    jet_colormap,
    overlay_cam,
    save_attention_weights,
    upsample_cam,
    vit_rollout,
)
from clip_for_dl_tpu.interpret.gradcam import _cam_from_grads
from clip_for_dl_tpu.models import CXRClip, ViT

TINY = ModelConfig(
    image_size=32, max_text_length=8, vocab_size=64, text_embedding_dim=16,
    text_layers=1, text_heads=2, text_intermediate_dim=32,
    shared_embedding_dim=32, resnet_stages=(1, 1, 1, 1), resnet_width=8,
)


@pytest.fixture(scope="module")
def clip_model():
    model = CXRClip(TINY)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 8), jnp.int32)
    )
    return model, variables


class TestGradCAMMath:
    def test_cam_matches_torch_hook_gradcam(self, rng):
        """The CAM formula (mean-grad weights × activations, ReLU, min-max)
        against a torch hook-style computation on a linear head."""
        act = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
        w = rng.standard_normal((8, 5)).astype(np.float32)

        # torch: NCHW activations, score = pooled @ w, grads via backward
        t_act = torch.from_numpy(act.transpose(0, 3, 1, 2)).requires_grad_(True)
        score = t_act.mean(dim=(2, 3)) @ torch.from_numpy(w)
        score[:, 2].sum().backward()
        t_grads = t_act.grad.numpy().transpose(0, 2, 3, 1)
        weights = t_grads.mean(axis=(1, 2), keepdims=True)
        cam = np.maximum((weights * act).sum(-1), 0)
        lo = cam.min(axis=(1, 2), keepdims=True)
        hi = cam.max(axis=(1, 2), keepdims=True)
        want = (cam - lo) / np.maximum(hi - lo, 1e-8)

        def head(a):
            return a.mean(axis=(1, 2)) @ jnp.asarray(w)

        scores, vjp = jax.vjp(head, jnp.asarray(act))
        cot = jnp.zeros_like(scores).at[:, 2].set(1.0)
        (grads,) = vjp(cot)
        got = np.asarray(_cam_from_grads(jnp.asarray(act), grads))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_gradcam_shapes_and_range(self, clip_model, rng):
        model, variables = clip_model
        images = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
        text = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
        cams, scores = gradcam(model, variables, images, text, mode="similarity")
        assert cams.shape[0] == 16 and cams.shape[1] == 2
        assert scores.shape == (2, 16)
        c = np.asarray(cams)
        assert c.min() >= 0.0 and c.max() <= 1.0 + 1e-6

    def test_gradcam_adapter_mode(self, clip_model, rng):
        model, variables = clip_model
        images = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
        cams, scores = gradcam(model, variables, images, mode="adapter")
        assert cams.shape[:2] == (16, 2)
        assert np.isfinite(np.asarray(scores)).all()

    def test_upsample_and_overlay(self, rng):
        cam = jnp.asarray(rng.random((2, 4, 4)), jnp.float32)
        up = upsample_cam(cam, 32, 32)
        assert up.shape == (2, 32, 32)
        img = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
        out = overlay_cam(img, up)
        o = np.asarray(out)
        assert o.shape == (2, 32, 32, 3)
        assert o.min() >= 0 and o.max() <= 1

    def test_jet_colormap_endpoints(self):
        ends = np.asarray(jet_colormap(jnp.asarray([0.0, 0.5, 1.0])))
        assert ends[0, 2] >= 0.5 and ends[0, 0] == 0.0  # low → blue
        assert ends[2, 0] >= 0.5 and ends[2, 2] == 0.0  # high → red
        assert ends[1, 1] > 0.9  # mid → green


class TestRollout:
    def test_uniform_attention_gives_uniform_mask(self):
        n, h, b = 5, 2, 1
        attn = jnp.full((b, h, n, n), 1.0 / n)
        mask = attention_rollout([attn, attn])
        m = np.asarray(mask)
        np.testing.assert_allclose(m, m.flat[0], atol=1e-6)

    def test_matches_manual_numpy_rollout(self, rng):
        layers = [
            jnp.asarray(
                jax.nn.softmax(
                    jnp.asarray(rng.standard_normal((2, 3, 10, 10)), jnp.float32),
                    axis=-1,
                )
            )
            for _ in range(3)
        ]
        got = np.asarray(attention_rollout(layers, "mean"))
        rollout = np.stack([np.eye(10)] * 2)
        for a in layers:
            fused = np.asarray(a).mean(axis=1) + np.eye(10)
            fused = fused / fused.sum(-1, keepdims=True)
            rollout = np.einsum("bij,bjk->bik", fused, rollout)
        want = rollout[:, 0, 1:].reshape(2, 3, 3)
        want = want / want.max(axis=(1, 2), keepdims=True)
        np.testing.assert_allclose(got, want, atol=1e-5)

    @pytest.mark.parametrize("fusion", ["mean", "max", "min"])
    def test_head_fusion_modes(self, rng, fusion):
        attn = jnp.asarray(
            jax.nn.softmax(
                jnp.asarray(rng.standard_normal((1, 4, 5, 5)), jnp.float32), -1
            )
        )
        mask = attention_rollout([attn], fusion)
        assert np.isfinite(np.asarray(mask)).all()

    def test_vit_rollout_end_to_end(self, rng):
        model = ViT(image_size=32, patch=8, hidden=32, layers=2, heads=2,
                    mlp_dim=64)
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
        variables = model.init(jax.random.key(0), x)
        mask = vit_rollout(model, variables, x)
        assert mask.shape == (2, 4, 4)
        assert float(np.asarray(mask).max()) == pytest.approx(1.0, abs=1e-5)


class TestAttentionViz:
    def test_writes_npy_and_png(self, tmp_path, rng):
        attn = rng.random((3, 16)).astype(np.float32)
        paths = save_attention_weights(
            attn, [f"d{i}" for i in range(16)], str(tmp_path),
            epoch=1, batch_idx=2,
            images=rng.random((3, 8, 8, 3)).astype(np.float32),
        )
        assert any(p.endswith(".npy") for p in paths)
        loaded = np.load([p for p in paths if p.endswith(".npy")][0])
        np.testing.assert_allclose(loaded, attn)
