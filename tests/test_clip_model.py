"""CXRClip composite model: shapes, method routing, both towers."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_for_dl_tpu.core.config import ModelConfig
from clip_for_dl_tpu.models import CXRClip

TINY = ModelConfig(
    image_size=32,
    max_text_length=16,
    vocab_size=100,
    text_embedding_dim=32,
    text_layers=1,
    text_heads=2,
    text_intermediate_dim=64,
    shared_embedding_dim=64,
    vit_hidden=32,
    vit_layers=1,
    vit_heads=2,
    vit_mlp_dim=64,
    vit_patch=8,
    use_multimodal_attention=True,
)


@pytest.fixture(scope="module", params=["resnet50", "vit_b16"])
def model_and_vars(request):
    cfg = dataclasses.replace(TINY, image_tower=request.param)
    model = CXRClip(cfg)
    imgs = jnp.zeros((2, 32, 32, 3))
    ids = jnp.zeros((2, 16), jnp.int32)
    variables = model.init(jax.random.key(0), imgs, ids)
    return model, variables, cfg


def test_joint_forward_shapes(model_and_vars):
    model, variables, cfg = model_and_vars
    imgs = jnp.ones((2, 32, 32, 3))
    ids = jnp.ones((2, 16), jnp.int32)
    img, txt = model.apply(variables, imgs, ids)
    assert img.shape == (2, 64) and txt.shape == (2, 64)


def test_encode_methods(model_and_vars, rng):
    model, variables, cfg = model_and_vars
    imgs = jnp.asarray(rng.standard_normal((3, 32, 32, 3)), jnp.float32)
    feats = model.apply(variables, imgs, method="encode_image")
    assert feats.shape == (3, 64)
    normed = model.apply(variables, imgs, normalize=True, method="encode_image")
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(normed), axis=-1), 1.0, atol=1e-5
    )
    ids = jnp.asarray(rng.integers(0, 100, (3, 16)), jnp.int32)
    mask = jnp.ones((3, 16), jnp.int32)
    txt = model.apply(variables, ids, mask, method="encode_text")
    assert txt.shape == (3, 64)


def test_multiview_and_adapter(model_and_vars, rng):
    model, variables, cfg = model_and_vars
    views = jnp.asarray(rng.standard_normal((2, 2, 32, 32, 3)), jnp.float32)
    fused = model.apply(variables, views, method="encode_multiview")
    assert fused.shape == (2, 64)
    logits = model.apply(variables, fused, method="adapter_logits")
    assert logits.shape == (2, 16)
    txt = jnp.asarray(rng.standard_normal((16, 64)), jnp.float32)
    enhanced, attn = model.apply(variables, fused, txt, method="enhance")
    assert enhanced.shape == (2, 64) and attn.shape == (2, 16)


def test_encode_image_jits(model_and_vars):
    model, variables, cfg = model_and_vars
    f = jax.jit(lambda v, x: model.apply(v, x, method="encode_image"))
    out = f(variables, jnp.ones((2, 32, 32, 3)))
    assert out.shape == (2, 64)
