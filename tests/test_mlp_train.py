"""ops/mlp_train.py: fused Dense→GELU→Dense training kernel (interpret
mode on the CPU test backend — Mosaic compiles only on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_for_dl_tpu.ops.mlp_train import dense_gelu_dense


def _params(rng, H=32, F=128, dtype=jnp.float32):
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, dtype)
    return mk(H, F), mk(F), mk(F, H), mk(H)


def _ref(x, w1, b1, w2, b2, approximate=False):
    h = x @ w1 + b1
    return jax.nn.gelu(h, approximate=approximate) @ w2 + b2


class TestDenseGeluDense:
    @pytest.mark.parametrize("rows", [8, 10, 300])  # pad + multi-tile
    def test_forward_matches_reference(self, rng, rows):
        w1, b1, w2, b2 = _params(rng)
        x = jnp.asarray(rng.standard_normal((rows, 32)) * 0.5, jnp.float32)
        out = dense_gelu_dense(x, w1, b1, w2, b2)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_ref(x, w1, b1, w2, b2)),
            atol=2e-6, rtol=2e-6,
        )

    def test_forward_3d_leading_dims(self, rng):
        w1, b1, w2, b2 = _params(rng)
        x = jnp.asarray(rng.standard_normal((2, 5, 32)) * 0.5, jnp.float32)
        out = dense_gelu_dense(x, w1, b1, w2, b2)
        assert out.shape == (2, 5, 32)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_ref(x, w1, b1, w2, b2)), atol=2e-6
        )

    @pytest.mark.parametrize("approximate", [False, True])
    def test_grads_match_autodiff(self, rng, approximate):
        """Fused backward (recompute-from-x dx kernel + XLA dW GEMMs)
        equals jax.grad through the XLA composition — all five grads."""
        w1, b1, w2, b2 = _params(rng)
        x = jnp.asarray(rng.standard_normal((20, 32)) * 0.5, jnp.float32)
        # non-uniform cotangent: sum() alone would miss dy-dependence bugs
        cot = jnp.asarray(rng.standard_normal((20, 32)), jnp.float32)

        f = lambda *a: (dense_gelu_dense(
            *a, approximate=approximate) * cot).sum()
        g = lambda *a: (_ref(*a, approximate=approximate) * cot).sum()
        got = jax.grad(f, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        want = jax.grad(g, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        for name, a, b in zip("x w1 b1 w2 b2".split(), got, want):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4,
                err_msg=f"grad {name}",
            )

    def test_dp_sharding_no_allgather(self, rng):
        """Row-sharded activations stay sharded through fwd AND bwd —
        no all-gather in the compiled train-style grad HLO."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        n = len(jax.devices())
        mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
        w1, b1, w2, b2 = _params(rng)
        x = jnp.asarray(
            rng.standard_normal((8 * n, 32)) * 0.5, jnp.float32
        )
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))

        def loss(x, w1, b1, w2, b2):
            return (dense_gelu_dense(x, w1, b1, w2, b2) ** 2).sum()

        grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1, 3)))
        got = grad_fn(xs, w1, b1, w2, b2)
        want = jax.grad(loss, argnums=(0, 1, 3))(x, w1, b1, w2, b2)
        for a, b in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
            )
        assert got[0].sharding.spec[0] == "data"
        hlo = grad_fn.lower(xs, w1, b1, w2, b2).compile().as_text()
        # dx is computed per-shard; only the WEIGHT grads may reduce
        assert "all-gather" not in hlo and "all_gather" not in hlo


class TestBertWiring:
    def _layer_pair(self, fused_dtype):
        from clip_for_dl_tpu.models.bert import BertLayer

        kw = dict(hidden=128, heads=2, intermediate=256, dropout=0.0)
        plain = BertLayer(**kw, dtype=fused_dtype)
        fused = BertLayer(**kw, fused_mlp=True, dtype=fused_dtype)
        return plain, fused

    def test_bert_layer_fused_matches_plain_bf16(self, rng):
        plain, fused = self._layer_pair(jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((2, 16, 128)), jnp.bfloat16)
        variables = plain.init(jax.random.key(0), x, None)
        a = np.asarray(plain.apply(variables, x, None), np.float32)
        b = np.asarray(fused.apply(variables, x, None), np.float32)
        # same params, same math to bf16 rounding (kernel holds the
        # intermediate in fp32 where the XLA path rounds it to bf16)
        np.testing.assert_allclose(a, b, atol=5e-2, rtol=5e-2)

    def test_bert_layer_fp32_falls_back_bitwise(self, rng):
        plain, fused = self._layer_pair(jnp.float32)
        x = jnp.asarray(rng.standard_normal((2, 16, 128)), jnp.float32)
        variables = plain.init(jax.random.key(0), x, None)
        a = np.asarray(plain.apply(variables, x, None))
        b = np.asarray(fused.apply(variables, x, None))
        np.testing.assert_array_equal(a, b)  # fp32 gate keeps XLA path

    def test_param_tree_unchanged(self, rng):
        """fused_mlp declares the exact same checkpoint tree (importer /
        exporter compatibility)."""
        plain, fused = self._layer_pair(jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((1, 8, 128)), jnp.bfloat16)
        va = plain.init(jax.random.key(0), x, None)
        vb = fused.init(jax.random.key(0), x, None)
        ta = jax.tree_util.tree_structure(va)
        tb = jax.tree_util.tree_structure(vb)
        assert ta == tb
        sa = {k: v.shape for k, v in
              jax.tree_util.tree_leaves_with_path(va)}
        sb = {k: v.shape for k, v in
              jax.tree_util.tree_leaves_with_path(vb)}
        assert {str(k): s for k, s in sa.items()} == {
            str(k): s for k, s in sb.items()
        }

    def test_full_train_step_finite(self, rng):
        """A CLIP pretrain step with bert_fused_mlp on runs and yields a
        finite loss close to the XLA-path step (bf16 towers)."""
        import dataclasses

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
            text_embedding_dim=128, text_layers=1, text_heads=2,
            text_intermediate_dim=256, shared_embedding_dim=32,
            resnet_stages=(1, 1, 1, 1), resnet_width=8,
        )
        batch = {
            "images": rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8),
            "input_ids": rng.integers(0, 64, (4, 16)).astype(np.int32),
            "attention_mask": np.ones((4, 16), np.int32),
        }
        lrs = {"default": 1e-4}
        losses = {}
        for name, c in (
            ("xla", cfg),
            ("fused", dataclasses.replace(cfg, bert_fused_mlp=True)),
        ):
            model = CXRClip(c, dtype=jnp.bfloat16)
            variables = model.init(
                jax.random.key(0),
                jnp.zeros((1, 32, 32, 3)),
                jnp.zeros((1, 16), jnp.int32),
            )
            tx = base_transform()
            step = make_clip_pretrain_step(
                model, tx, make_label_fn([]), temperature=2.0,
                image_size=32, compute_dtype=jnp.bfloat16,
            )
            state = TrainState.create(variables, tx)
            state, metrics = jax.jit(step)(
                state, batch, lrs, jax.random.key(1)
            )
            losses[name] = float(metrics["loss"])
            assert np.isfinite(losses[name])
        assert abs(losses["xla"] - losses["fused"]) < 5e-2, losses
