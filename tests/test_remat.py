"""Remat policies are semantically invisible: identical loss and gradients
vs the un-remat'd model, for every policy, on every tower.

jax.checkpoint only changes WHICH intermediates the backward pass recomputes
(models/remat.py); any numeric divergence would be a bug in the wiring
(e.g. a dropout key replayed differently inside the checkpointed region).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_for_dl_tpu.core.config import ModelConfig
from clip_for_dl_tpu.models import CXRClip
from clip_for_dl_tpu.models.remat import REMAT_POLICIES, resolve_remat_policy

TINY = ModelConfig(
    image_size=16, max_text_length=8, vocab_size=64, text_embedding_dim=16,
    text_layers=2, text_heads=2, text_intermediate_dim=32,
    shared_embedding_dim=32,
    resnet_stages=(1, 1, 1, 1), resnet_width=8,
)


def _loss_and_grads(cfg, images, ids, mask):
    model = CXRClip(cfg)
    variables = model.init(jax.random.key(0), images[:1], ids[:1])

    def loss_fn(params):
        v = {**variables, "params": params}
        img = model.apply(v, images, normalize=True, method="encode_image")
        txt = model.apply(v, ids, mask, normalize=True, method="encode_text")
        return jnp.sum((img @ txt.T) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    return loss, grads


@pytest.mark.parametrize("policy", ["full", "dots", "dots_no_batch", "none"])
@pytest.mark.parametrize("tower", ["resnet50", "vit_b16"])
def test_policy_matches_no_remat(policy, tower):
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, (2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)

    base = dataclasses.replace(TINY, image_tower=tower)
    if tower == "vit_b16":
        base = dataclasses.replace(
            base, image_embedding_dim=32, vit_patch=4, vit_layers=2,
            vit_hidden=32, vit_heads=2, vit_mlp_dim=64,
        )
    ref_loss, ref_grads = _loss_and_grads(base, images, ids, mask)
    cfg = dataclasses.replace(
        base, remat=True, remat_conv=True, remat_policy=policy
    )
    loss, grads = _loss_and_grads(cfg, images, ids, mask)

    np.testing.assert_allclose(np.asarray(loss), np.asarray(ref_loss), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        grads, ref_grads,
    )


def test_unknown_policy_rejected():
    with pytest.raises(ValueError, match="unknown remat policy"):
        resolve_remat_policy("everything")


def test_policy_names_resolve():
    for name in REMAT_POLICIES:
        resolve_remat_policy(name)  # no raise
