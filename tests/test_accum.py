"""GradCache gradient accumulation: microbatched towers, full-batch
contrastive negatives, exact gradients (train/accum.py; VERDICT r1 item 4).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_for_dl_tpu.core.config import ModelConfig
from clip_for_dl_tpu.models import CXRClip
from clip_for_dl_tpu.train import (
    TrainState,
    base_transform,
    make_accum_clip_pretrain_step,
    make_clip_pretrain_step,
    make_label_fn,
)

# ViT tower: LayerNorm only, so per-microbatch forward == full-batch
# forward and the equivalence is exact (BatchNorm towers accumulate
# sequential running stats — standard semantics, tested separately).
TINY_VIT = ModelConfig(
    image_size=16, max_text_length=8, vocab_size=64, text_embedding_dim=16,
    text_layers=1, text_heads=2, text_intermediate_dim=32,
    shared_embedding_dim=32, resnet_stages=(1, 1, 1, 1), resnet_width=8,
    vit_patch=8, vit_layers=1, vit_heads=2, vit_hidden=16, vit_mlp_dim=32,
    dropout=0.0,
).with_vit()
TINY_VIT = dataclasses.replace(TINY_VIT, image_embedding_dim=16)


def _setup():
    model = CXRClip(TINY_VIT, dtype=jnp.float32)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
        jnp.zeros((1, 8), jnp.int32),
    )
    tx = base_transform()
    return model, variables, tx


def _batch(rng, b=8):
    return {
        "images": rng.integers(0, 255, (b, 16, 16, 3), np.uint8),
        "input_ids": rng.integers(1, 64, (b, 8)).astype(np.int32),
        "attention_mask": np.ones((b, 8), np.int32),
    }


@pytest.mark.parametrize("loss_name", ["clip_self_distill", "info_nce"])
@pytest.mark.parametrize("accum", [2, 4])
def test_accum_matches_full_batch_step(loss_name, accum):
    import optax

    rng = np.random.default_rng(0)
    model, variables, _ = _setup()
    # SGD: the param delta is LINEAR in the gradient, so gradient
    # equivalence shows up directly (Adam's g/sqrt(g^2) at step 1 would
    # amplify fp32 reassociation noise into sign-level diffs)
    tx = optax.sgd(1.0)
    label_fn = make_label_fn([])
    kwargs = dict(
        loss_name=loss_name, temperature=2.0, image_size=16,
        compute_dtype=jnp.float32,
    )
    plain = jax.jit(make_clip_pretrain_step(model, tx, label_fn, **kwargs))
    accum_step = jax.jit(
        make_accum_clip_pretrain_step(model, tx, label_fn, accum, **kwargs)
    )
    batch = _batch(rng)
    key = jax.random.key(7)

    s1 = TrainState.create(variables, tx)
    s1, m1 = plain(s1, batch, {"default": 1.0}, key)
    s2 = TrainState.create(variables, tx)
    s2, m2 = accum_step(s2, batch, {"default": 1.0}, key)

    # dropout=0 → the rng key difference is inert; with lr=1 the param
    # delta IS the gradient: equal to fp32 reassociation noise
    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-6)
    for (p0, p1, p2) in zip(
        jax.tree.leaves(variables["params"]),
        jax.tree.leaves(s1.params),
        jax.tree.leaves(s2.params),
    ):
        g1 = np.asarray(p1) - np.asarray(p0)
        g2 = np.asarray(p2) - np.asarray(p0)
        np.testing.assert_allclose(g1, g2, atol=5e-6)


def test_accum_rejects_bad_split():
    model, variables, tx = _setup()
    step = jax.jit(
        make_accum_clip_pretrain_step(
            model, tx, make_label_fn([]), 3, temperature=2.0, image_size=16,
            compute_dtype=jnp.float32,
        )
    )
    state = TrainState.create(variables, tx)
    batch = _batch(np.random.default_rng(0), b=8)  # 8 % 3 != 0
    with pytest.raises(ValueError, match="divide into accum_steps"):
        step(state, batch, {"default": 1e-3}, jax.random.key(0))


def test_accum_rejects_moe():
    cfg = dataclasses.replace(TINY_VIT, text_moe_experts=2)
    model = CXRClip(cfg, dtype=jnp.float32)
    tx = base_transform()
    with pytest.raises(ValueError, match="MoE"):
        make_accum_clip_pretrain_step(model, tx, make_label_fn([]), 2)


def test_accum_resnet_trains_with_sequential_bn():
    """BatchNorm tower: not bit-equal to the full-batch step (per-microbatch
    stats), but the step must run, reduce loss, and update running stats."""
    cfg = ModelConfig(
        image_size=16, max_text_length=8, vocab_size=64,
        text_embedding_dim=16, text_layers=1, text_heads=2,
        text_intermediate_dim=32, shared_embedding_dim=32,
        resnet_stages=(1, 1, 1, 1), resnet_width=8, dropout=0.0,
    )
    model = CXRClip(cfg, dtype=jnp.float32)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
        jnp.zeros((1, 8), jnp.int32),
    )
    tx = base_transform()
    step = jax.jit(
        make_accum_clip_pretrain_step(
            model, tx, make_label_fn([]), 2, temperature=2.0, image_size=16,
            compute_dtype=jnp.float32,
        )
    )
    state = TrainState.create(variables, tx)
    rng = np.random.default_rng(1)
    batch = _batch(rng)
    losses = []
    for i in range(4):
        state, m = step(state, batch, {"default": 3e-3}, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # running stats moved off init
    mean0 = jax.tree.leaves(variables["batch_stats"])[0]
    mean1 = jax.tree.leaves(state.batch_stats)[0]
    assert float(jnp.abs(mean1 - mean0).max()) > 0
