"""ops/flash_attention.py — fused fwd+bwd attention with in-kernel dropout.

The training kernel the r3 trace demanded (benchmarks/
trace_resnet_pretrain_b128.md: BERT attention = 44.4% of the pretrain
step; the backward materializes bf16 [128,12,200,200] dropout/softmax
tensors and the fp32 logits residual costs 4.8 GB + 12% of the step in
layout copies). These tests pin:
- forward/backward exactness vs the towers' einsum formulation,
- the in-kernel dropout bits vs the shared pure-jnp oracle,
- GSPMD batch-sharding through both kernels (no all-gather),
- model-level equivalence in both towers and a full train step.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_for_dl_tpu.ops.flash_attention import (
    dropout_seeds_from_rng,
    flash_attention,
    flash_attention_reference,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _qkv(rng, b=2, h=3, n=50, d=16, dtype=jnp.float32):
    return tuple(
        jnp.asarray(rng.normal(size=(b, h, n, d)), dtype) for _ in range(3)
    )


def _key_bias(rng, b=2, n=50, n_valid=37):
    mask = np.zeros((b, n), np.float32)
    mask[:, :n_valid] = 1
    return jnp.where(jnp.asarray(mask) > 0, 0.0, -1e10).astype(jnp.float32)


class TestForward:
    def test_matches_reference_no_bias(self, rng):
        q, k, v = _qkv(rng)
        np.testing.assert_allclose(
            np.asarray(flash_attention(q, k, v)),
            np.asarray(flash_attention_reference(q, k, v)),
            atol=2e-6, rtol=2e-6,
        )

    def test_matches_reference_with_key_bias(self, rng):
        q, k, v = _qkv(rng)
        bias = _key_bias(rng)
        np.testing.assert_allclose(
            np.asarray(flash_attention(q, k, v, bias)),
            np.asarray(flash_attention_reference(q, k, v, bias)),
            atol=2e-6, rtol=2e-6,
        )

    def test_bf16(self, rng):
        q, k, v = _qkv(rng, dtype=jnp.bfloat16)
        out = flash_attention(q, k, v).astype(jnp.float32)
        ref = flash_attention_reference(q, k, v).astype(jnp.float32)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-3
        )

    def test_lane_aligned_seq_no_padding_path(self, rng):
        q, k, v = _qkv(rng, n=128)
        np.testing.assert_allclose(
            np.asarray(flash_attention(q, k, v)),
            np.asarray(flash_attention_reference(q, k, v)),
            atol=2e-6, rtol=2e-6,
        )

    def test_fwd_pack2_bitwise_equal_to_per_head(self, rng):
        # fwd analog of the bwd lane-packing test: the pair-batched
        # forward must reproduce the per-head form bit-for-bit,
        # dropout streams included
        import clip_for_dl_tpu.ops.flash_attention as fa

        q, k, v = _qkv(rng, h=4, dtype=jnp.bfloat16)
        bias = _key_bias(rng)
        seeds = dropout_seeds_from_rng(jax.random.key(3), q.shape[0])

        def run():
            return flash_attention(
                q, k, v, bias, dropout_rate=0.1, dropout_seeds=seeds
            )

        orig = fa.FWD_PACK2
        try:
            fa.FWD_PACK2 = True
            with_pack = np.asarray(run())
            fa.FWD_PACK2 = False
            jax.clear_caches()  # kernel choice is bound at trace time
            without = np.asarray(run())
        finally:
            fa.FWD_PACK2 = orig
            jax.clear_caches()
        np.testing.assert_array_equal(with_pack, without)

    def test_bias_shape_rejected(self, rng):
        q, k, v = _qkv(rng)
        with pytest.raises(ValueError, match="key_bias"):
            flash_attention(q, k, v, jnp.zeros((2, 49)))

    def test_dropout_requires_seeds(self, rng):
        q, k, v = _qkv(rng)
        with pytest.raises(ValueError, match="seeds"):
            flash_attention(q, k, v, dropout_rate=0.1)


class TestBackward:
    def test_grads_match_reference_autodiff(self, rng):
        q, k, v = _qkv(rng)
        bias = _key_bias(rng)

        def loss(f):
            return lambda q, k, v: jnp.sum(f(q, k, v, bias) ** 2)

        got = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(loss(flash_attention_reference), argnums=(0, 1, 2))(
            q, k, v
        )
        for g, w in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=1e-5, rtol=1e-4
            )

    def test_pack2_bitwise_equal_to_per_head(self, rng):
        # the pair-batched (lane-packed) backward must reproduce the
        # per-head form BIT-FOR-BIT, dropout streams included — it is a
        # pure issue-width transformation (VERDICT r3 weak #4)
        import clip_for_dl_tpu.ops.flash_attention as fa

        q, k, v = _qkv(rng, h=4, dtype=jnp.bfloat16)
        bias = _key_bias(rng)
        seeds = dropout_seeds_from_rng(jax.random.key(11), q.shape[0])

        def grads():
            return jax.grad(
                lambda q, k, v: jnp.sum(
                    flash_attention(
                        q, k, v, bias, dropout_rate=0.1,
                        dropout_seeds=seeds,
                    ).astype(jnp.float32) ** 2
                ),
                argnums=(0, 1, 2),
            )(q, k, v)

        orig = fa.BWD_PACK2
        try:
            fa.BWD_PACK2 = True
            with_pack = grads()
            fa.BWD_PACK2 = False
            jax.clear_caches()  # kernel choice is bound at trace time
            without = grads()
        finally:
            fa.BWD_PACK2 = orig
            jax.clear_caches()
        for g, w in zip(with_pack, without):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    def test_padded_rows_produce_no_nan(self, rng):
        # a fully-masked key set for some rows must not poison dk/dv
        q, k, v = _qkv(rng)
        bias = _key_bias(rng, n_valid=1)
        grads = jax.grad(
            lambda q, k, v: jnp.sum(flash_attention(q, k, v, bias) ** 2),
            argnums=(0, 1, 2),
        )(q, k, v)
        for g in grads:
            assert np.isfinite(np.asarray(g)).all()


class TestDropout:
    def test_forward_matches_oracle_bitwise_mask(self, rng):
        q, k, v = _qkv(rng)
        seeds = dropout_seeds_from_rng(jax.random.key(7), q.shape[0])
        got = flash_attention(
            q, k, v, dropout_rate=0.1, dropout_seeds=seeds
        )
        want = flash_attention_reference(
            q, k, v, dropout_rate=0.1, dropout_seeds=seeds
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-6, rtol=2e-6
        )

    def test_dropout_changes_output_and_is_seed_deterministic(self, rng):
        q, k, v = _qkv(rng)
        s1 = dropout_seeds_from_rng(jax.random.key(1), q.shape[0])
        s2 = dropout_seeds_from_rng(jax.random.key(2), q.shape[0])
        det = flash_attention(q, k, v)
        d1 = flash_attention(q, k, v, dropout_rate=0.1, dropout_seeds=s1)
        d1b = flash_attention(q, k, v, dropout_rate=0.1, dropout_seeds=s1)
        d2 = flash_attention(q, k, v, dropout_rate=0.1, dropout_seeds=s2)
        assert float(jnp.abs(d1 - det).max()) > 1e-3
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d1b))
        assert float(jnp.abs(d1 - d2).max()) > 1e-3

    def test_drop_fraction_and_scaling(self, rng):
        # the mask itself: oracle probs vs deterministic probs — dropped
        # cells are exactly zero, kept cells scaled by 1/(1-rate)
        from clip_for_dl_tpu.ops.flash_attention import _uniform01

        u = np.asarray(_uniform01(jnp.int32(1234), 5, (200, 200)))
        frac = (u < 0.1).mean()
        assert abs(frac - 0.1) < 0.01
        # uniform on [0,1): std = 1/sqrt(12) ~ 0.2887
        assert 0.28 < np.asarray(u).std() < 0.30

    def test_grads_match_oracle_autodiff_same_mask(self, rng):
        q, k, v = _qkv(rng)
        seeds = dropout_seeds_from_rng(jax.random.key(3), q.shape[0])

        def loss(f):
            return lambda q, k, v: jnp.sum(
                f(q, k, v, dropout_rate=0.1, dropout_seeds=seeds) ** 2
            )

        got = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(loss(flash_attention_reference), argnums=(0, 1, 2))(
            q, k, v
        )
        for g, w in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=1e-5, rtol=1e-4
            )


def test_dp_sharding_partitions_through_kernels(rng):
    """Batch-sharded q/k/v stay sharded through BOTH pallas calls (fwd and
    bwd) — no all-gather anywhere in the train-style grad computation, and
    the result is bitwise identical to the unsharded run (per-row dropout
    seeds make the masks sharding-invariant)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    q, k, v = _qkv(rng, b=2 * n_dev)
    bias = _key_bias(rng, b=2 * n_dev)
    seeds = dropout_seeds_from_rng(jax.random.key(5), q.shape[0])

    def loss(q, k, v):
        out = flash_attention(
            q, k, v, bias, dropout_rate=0.1, dropout_seeds=seeds
        )
        return jnp.sum(out ** 2)

    grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    want = grad_fn(q, k, v)

    shard = NamedSharding(mesh, P("data", None, None, None))
    qs, ks, vs = (jax.device_put(t, shard) for t in (q, k, v))
    hlo = grad_fn.lower(qs, ks, vs).compile().as_text()
    assert "all-gather" not in hlo and "all_gather" not in hlo
    got = grad_fn(qs, ks, vs)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


class TestModelWiring:
    def _bert(self, flash):
        from clip_for_dl_tpu.models.bert import BertEncoder

        return BertEncoder(
            vocab_size=64, hidden=32, layers=2, heads=2, intermediate=64,
            max_position=64, flash=flash,
        )

    def test_bert_deterministic_equivalence(self, rng):
        ids = jnp.asarray(rng.integers(0, 64, (2, 20)).astype(np.int32))
        mask = jnp.asarray(
            (np.arange(20)[None, :] < np.array([[14], [20]])).astype(np.int32)
        )
        base = self._bert(False)
        params = base.init(jax.random.key(0), ids, mask)
        want = base.apply(params, ids, mask)
        got = self._bert(True).apply(params, ids, mask)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_bert_training_dropout_runs_finite(self, rng):
        ids = jnp.asarray(rng.integers(0, 64, (2, 20)).astype(np.int32))
        mask = jnp.ones((2, 20), jnp.int32)
        m = self._bert(True)
        params = m.init(jax.random.key(0), ids, mask)
        out = m.apply(
            params, ids, mask, deterministic=False,
            rngs={"dropout": jax.random.key(1)},
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_bert_sow_weights_falls_back(self, rng):
        ids = jnp.asarray(rng.integers(0, 64, (2, 20)).astype(np.int32))
        m = self._bert(True)
        params = m.init(jax.random.key(0), ids)
        _, inter = m.apply(
            params, ids, sow_weights=True, mutable=["intermediates"]
        )
        leaves = jax.tree.leaves(inter)
        assert any(l.shape[-2:] == (20, 20) for l in leaves)

    def test_vit_deterministic_equivalence(self, rng):
        from clip_for_dl_tpu.models.vit import ViT

        imgs = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        kw = dict(image_size=32, patch=16, hidden=32, layers=2, heads=2,
                  mlp_dim=64)
        base = ViT(**kw)
        params = base.init(jax.random.key(0), imgs)
        want = base.apply(params, imgs)
        got = ViT(flash=True, **kw).apply(params, imgs)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_pretrain_step_flash_runs_and_learns(self, rng):
        from clip_for_dl_tpu.core.config import ModelConfig
        from clip_for_dl_tpu.models import CXRClip
        from clip_for_dl_tpu.train import (
            TrainState,
            base_transform,
            make_clip_pretrain_step,
            make_label_fn,
        )

        cfg = ModelConfig(
            image_size=32, max_text_length=16, vocab_size=64,
            text_embedding_dim=32, text_layers=1, text_heads=2,
            text_intermediate_dim=64, shared_embedding_dim=32,
            resnet_stages=(1, 1, 1, 1), resnet_width=8,
            flash_attention=True,
        )
        model = CXRClip(cfg, dtype=jnp.float32)
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
            jnp.zeros((1, 16), jnp.int32),
        )
        tx = base_transform(max_grad_norm=1.0, weight_decay=1e-3)
        label_fn = make_label_fn(
            ["image_tower", "text_tower", "image_projector",
             "text_projector"]
        )
        step = jax.jit(make_clip_pretrain_step(
            model, tx, label_fn, "clip_self_distill", temperature=2.0,
            image_size=32, compute_dtype=jnp.float32,
        ))
        state = TrainState.create(variables, tx)
        batch = {
            "images": jnp.asarray(
                rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8)
            ),
            "input_ids": jnp.asarray(
                rng.integers(0, 64, (4, 16)).astype(np.int32)
            ),
            "attention_mask": jnp.ones((4, 16), jnp.int32),
        }
        lrs = {"image_tower": 1e-4, "text_tower": 1e-5,
               "image_projector": 1e-3, "text_projector": 1e-3,
               "default": 1e-4}
        losses = []
        for i in range(4):
            state, metrics = step(state, batch, lrs, jax.random.key(i))
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]
