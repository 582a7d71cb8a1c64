"""Zero-shot engine + shared adapter: multi-device equivalence."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_for_dl_tpu.core.config import DISEASE_LABELS, ModelConfig, ZeroShotConfig
from clip_for_dl_tpu.core.mesh import create_mesh
from clip_for_dl_tpu.models import CXRClip
from clip_for_dl_tpu.text import BertTokenizer, build_tiny_vocab
from clip_for_dl_tpu.zeroshot import ZeroShotEngine, prompts_for_family

TINY = ModelConfig(
    image_size=32, max_text_length=16, text_embedding_dim=32, text_layers=1,
    text_heads=2, text_intermediate_dim=64, shared_embedding_dim=64,
    resnet_stages=(1, 1, 1, 1), resnet_width=8,
)


@pytest.fixture(scope="module")
def setup():
    vocab = build_tiny_vocab(
        "this chest x-ray shows a of normal without any significant findings".split()
        + [w for d in DISEASE_LABELS for w in d.split()]
    )
    cfg = dataclasses.replace(TINY, vocab_size=len(vocab))
    tokenizer = BertTokenizer(vocab)
    model = CXRClip(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 16), jnp.int32)
    )
    return model, variables, tokenizer


def _engine(model, variables, tokenizer, mesh=None):
    eng = ZeroShotEngine(
        model, variables, tokenizer, DISEASE_LABELS, ZeroShotConfig(),
        image_size=32, max_text_length=16, compute_dtype=jnp.float32,
        mesh=mesh,
    )
    eng.build_text_features(prompts_for_family("prediction", DISEASE_LABELS))
    return eng


def test_sharded_engine_matches_single_device(setup, rng, eight_devices):
    model, variables, tokenizer = setup
    imgs = rng.integers(0, 255, (16, 32, 32, 3), dtype=np.uint8)
    single = _engine(model, variables, tokenizer).logits(imgs)
    mesh = create_mesh(8)
    sharded = _engine(model, variables, tokenizer, mesh).logits(imgs)
    np.testing.assert_allclose(sharded, single, atol=2e-4, rtol=1e-4)


def test_shared_adapter_step(setup, rng):
    import optax

    from clip_for_dl_tpu.train import (
        TrainState,
        base_transform,
        freeze_mask,
        make_label_fn,
        make_shared_adapter_train_step,
    )

    model, variables, tokenizer = setup
    tx = base_transform(weight_decay=0.0)
    label_fn = make_label_fn(["shared_adapter"])
    freeze = freeze_mask(variables["params"], ["shared_adapter"])
    step = jax.jit(
        make_shared_adapter_train_step(
            model, tx, label_fn, freeze, image_size=32,
            compute_dtype=jnp.float32,
        )
    )
    state = TrainState.create(variables, tx)
    enc = tokenizer.encode(["normal chest x-ray"] * 4, max_length=16)
    batch = {
        "images": jnp.asarray(rng.integers(0, 255, (4, 32, 32, 3), np.uint8)),
        "input_ids": jnp.asarray(enc["input_ids"]),
        "attention_mask": jnp.asarray(enc["attention_mask"]),
        "labels": jnp.asarray((rng.random((4, 16)) > 0.7), jnp.float32),
    }
    state2, m = step(
        state, batch, {"shared_adapter": 1e-3, "default": 0.0}, jax.random.key(0)
    )
    assert np.isfinite(float(m["loss"]))
    moved = np.abs(
        np.asarray(state2.params["shared_adapter"]["classifier"]["kernel"])
        - np.asarray(state.params["shared_adapter"]["classifier"]["kernel"])
    ).max()
    frozen = np.abs(
        np.asarray(state2.params["image_tower"]["conv1"]["kernel"])
        - np.asarray(state.params["image_tower"]["conv1"]["kernel"])
    ).max()
    assert moved > 0 and frozen == 0


def test_shared_adapter_eval_step(setup, rng):
    from clip_for_dl_tpu.train import (
        TrainState,
        base_transform,
        make_shared_adapter_eval_step,
    )

    model, variables, tokenizer = setup
    step = jax.jit(
        make_shared_adapter_eval_step(model, image_size=32,
                                      compute_dtype=jnp.float32)
    )
    state = TrainState.create(variables, base_transform())
    enc = tokenizer.encode(["normal chest x-ray"] * 3, max_length=16)
    batch = {
        "images": jnp.asarray(rng.integers(0, 255, (3, 32, 32, 3), np.uint8)),
        "input_ids": jnp.asarray(enc["input_ids"]),
        "attention_mask": jnp.asarray(enc["attention_mask"]),
        "labels": jnp.asarray((rng.random((3, 16)) > 0.7), jnp.float32),
    }
    m = step(state, batch)
    assert m["probs"].shape == (3, 16)
    assert np.isfinite(float(m["loss"]))


def test_sharded_engine_pads_uneven_batches(setup, rng, eight_devices):
    from clip_for_dl_tpu.core.mesh import create_mesh

    model, variables, tokenizer = setup
    mesh = create_mesh(8)
    eng = _engine(model, variables, tokenizer, mesh)
    imgs = rng.integers(0, 255, (13, 32, 32, 3), dtype=np.uint8)  # 13 % 8 != 0
    sharded = eng.logits(imgs)
    assert sharded.shape == (13, 16)
    single = _engine(model, variables, tokenizer).logits(imgs)
    np.testing.assert_allclose(sharded, single, atol=2e-4, rtol=1e-4)
