"""LoRA PEFT: init identity, targeted paths, training, fold equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from clip_for_dl_tpu.core.config import ModelConfig
from clip_for_dl_tpu.models import (
    CXRClip,
    fold_lora,
    init_lora,
    lora_param_count,
    lora_paths,
    make_lora_pretrain_step,
    merge_lora,
)
from clip_for_dl_tpu.train import TrainState


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig(
        image_size=32, max_text_length=16, vocab_size=64,
        text_embedding_dim=32, text_layers=2, text_heads=2,
        text_intermediate_dim=64, shared_embedding_dim=32,
        resnet_stages=(1, 1, 1, 1), resnet_width=8,
    )
    model = CXRClip(cfg, dtype=jnp.float32)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 16), jnp.int32),
    )
    return cfg, model, variables


class TestLoraSurgery:
    def test_paths_target_attention_and_mlp_kernels(self, tiny):
        _, _, variables = tiny
        paths = lora_paths(variables["params"])
        assert paths  # matched something
        assert all(p.endswith("/kernel") for p in paths)
        # BERT attention projections are in
        assert any("query" in p for p in paths)
        assert any("intermediate" in p for p in paths)
        # conv kernels (4-D) and embeddings must NOT be targeted
        assert not any("conv" in p.lower() for p in paths)
        assert not any("embeddings/" in p for p in paths)

    def test_init_is_identity(self, tiny):
        from flax import traverse_util

        _, _, variables = tiny
        lora = init_lora(jax.random.key(1), variables["params"], rank=4)
        merged = merge_lora(variables["params"], lora)
        flat0 = traverse_util.flatten_dict(variables["params"])
        flat1 = traverse_util.flatten_dict(merged)
        assert flat0.keys() == flat1.keys()
        for k in flat0:
            np.testing.assert_array_equal(
                np.asarray(flat0[k]), np.asarray(flat1[k])
            )

    def test_merge_applies_delta(self, tiny):
        _, _, variables = tiny
        lora = init_lora(jax.random.key(1), variables["params"], rank=4)
        path = lora_paths(variables["params"])[0]
        lora[path]["b"] = jnp.ones_like(lora[path]["b"])
        merged = merge_lora(variables["params"], lora, alpha=8.0)
        from flax import traverse_util

        flat0 = {
            "/".join(k): v
            for k, v in traverse_util.flatten_dict(variables["params"]).items()
        }
        flat1 = {
            "/".join(k): v
            for k, v in traverse_util.flatten_dict(merged).items()
        }
        want = np.asarray(flat0[path]) + np.asarray(
            (lora[path]["a"] @ lora[path]["b"]) * (8.0 / 4)
        )
        np.testing.assert_allclose(np.asarray(flat1[path]), want, atol=1e-6)
        # every other kernel untouched
        for p in flat0:
            if p != path:
                np.testing.assert_array_equal(
                    np.asarray(flat0[p]), np.asarray(flat1[p])
                )

    def test_no_match_raises(self, tiny):
        _, _, variables = tiny
        with pytest.raises(ValueError, match="no 2-D kernels"):
            init_lora(jax.random.key(0), variables["params"],
                      pattern="definitely_not_a_module")

    def test_param_count_is_small(self, tiny):
        _, _, variables = tiny
        lora = init_lora(jax.random.key(1), variables["params"], rank=4)
        total = sum(
            int(x.size) for x in jax.tree.leaves(variables["params"])
        )
        assert 0 < lora_param_count(lora) < total // 10


class TestLoraTraining:
    def test_loss_decreases_and_base_stays_frozen(self, tiny, rng):
        cfg, model, variables = tiny
        from clip_for_dl_tpu.train import base_transform

        lora = init_lora(jax.random.key(1), variables["params"], rank=4)
        tx = base_transform(max_grad_norm=1.0)  # lr-free (optim.py convention)
        state = TrainState(
            params=lora, batch_stats={}, opt_state=tx.init(lora),
            step=jnp.zeros((), jnp.int32),
        )
        step = jax.jit(make_lora_pretrain_step(
            model, tx, temperature=2.0, image_size=32,
            compute_dtype=jnp.float32,
        ))
        lrs = {"default": 1e-2}
        batch = {
            "images": rng.integers(0, 255, (8, 32, 32, 3)).astype(np.uint8),
            "input_ids": rng.integers(0, 64, (8, 16)).astype(np.int32),
            "attention_mask": np.ones((8, 16), np.int32),
        }
        from flax import traverse_util

        frozen_before = {
            k: np.asarray(v)
            for k, v in traverse_util.flatten_dict(variables["params"]).items()
        }
        losses = []
        for i in range(8):
            state, metrics = step(state, variables, batch, lrs,
                                  jax.random.key(i))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses
        # base params are untouched (only the LoRA factors trained)
        flat_after = traverse_util.flatten_dict(variables["params"])
        for k, before in frozen_before.items():
            np.testing.assert_array_equal(before, np.asarray(flat_after[k]))
        # the LoRA B factors actually moved
        moved = sum(
            float(np.abs(np.asarray(ab["b"])).sum())
            for ab in state.params.values()
        )
        assert moved > 0

    def test_fold_equals_merged_forward(self, tiny, rng):
        cfg, model, variables = tiny
        lora = init_lora(jax.random.key(1), variables["params"], rank=4)
        # give the deltas real magnitude
        lora = jax.tree.map(
            lambda x: x + 0.01 * jnp.ones_like(x), lora
        )
        images = jnp.asarray(
            rng.standard_normal((2, 32, 32, 3)), jnp.float32
        )
        folded = fold_lora(variables, lora, alpha=16.0)
        out_folded = model.apply(folded, images, method="encode_image")
        merged_vars = dict(variables)
        merged_vars["params"] = merge_lora(
            variables["params"], lora, alpha=16.0
        )
        out_merged = model.apply(merged_vars, images, method="encode_image")
        np.testing.assert_allclose(
            np.asarray(out_folded), np.asarray(out_merged), atol=1e-6
        )
        # and the deltas change the forward vs the frozen base
        out_base = model.apply(variables, images, method="encode_image")
        assert np.abs(np.asarray(out_base) - np.asarray(out_folded)).max() > 1e-5
