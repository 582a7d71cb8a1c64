"""BN folding: folded inference tower == unfolded eval tower."""

import jax
import jax.numpy as jnp
import numpy as np

from clip_for_dl_tpu.core.config import ModelConfig
from clip_for_dl_tpu.models import CXRClip, ResNet
from clip_for_dl_tpu.models.resnet import fold_batchnorm, fold_clip_image_tower


def test_folded_resnet_matches_eval(rng):
    model = ResNet(stage_sizes=(1, 1, 1, 1), width=8)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    # randomize BN stats so folding is non-trivial
    stats = jax.tree.map(
        lambda a: a + jnp.asarray(
            np.random.default_rng(1).uniform(0.1, 0.5, a.shape), a.dtype
        ),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    want = model.apply(variables, x)

    folded_params = fold_batchnorm(variables["params"], stats)
    folded_model = ResNet(stage_sizes=(1, 1, 1, 1), width=8, fold_bn=True)
    got = folded_model.apply({"params": folded_params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fold_clip_variables(rng):
    cfg = ModelConfig(
        image_size=32, max_text_length=8, vocab_size=64, text_embedding_dim=16,
        text_layers=1, text_heads=2, text_intermediate_dim=32,
        shared_embedding_dim=32, resnet_stages=(1, 1, 1, 1), resnet_width=8,
    )
    model = CXRClip(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 8), jnp.int32)
    )
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    want = model.apply(variables, imgs, method="encode_image")

    folded_vars = fold_clip_image_tower(variables)
    folded_model = CXRClip(cfg, fold_bn=True)
    got = folded_model.apply(folded_vars, imgs, method="encode_image")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    assert "image_tower" not in folded_vars.get("batch_stats", {})
