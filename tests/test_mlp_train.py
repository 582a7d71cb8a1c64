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
        self._run_full_train_step(rng, "resnet")

    def _run_full_train_step(self, rng, tower):
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
        if tower == "vit":
            cfg = dataclasses.replace(
                cfg, image_tower="vit_b16", image_embedding_dim=128,
                vit_patch=16, vit_layers=1, vit_heads=2, vit_hidden=128,
                vit_mlp_dim=256,
            )
            fused_cfg = dataclasses.replace(cfg, vit_fused_mlp_train=True)
        else:
            fused_cfg = dataclasses.replace(cfg, bert_fused_mlp=True)
        batch = {
            "images": rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8),
            "input_ids": rng.integers(0, 64, (4, 16)).astype(np.int32),
            "attention_mask": np.ones((4, 16), np.int32),
        }
        lrs = {"default": 1e-4}
        losses = {}
        for name, c in (("xla", cfg), ("fused", fused_cfg)):
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

    def test_full_vit_train_step_finite(self, rng):
        """Same drill with the ViT image tower + vit_fused_mlp_train."""
        self._run_full_train_step(rng, "vit")


class TestViTWiring:
    """fused_mlp_train in ViTEncoderLayer (models/vit.py) — the TRAINING
    kernel, distinct from the inference-only fused_mlp block."""

    def _layer_pair(self, dtype, dropout=0.0, fused_dropout=None):
        from clip_for_dl_tpu.models.vit import ViTEncoderLayer

        kw = dict(hidden=128, heads=2, mlp_dim=256)
        plain = ViTEncoderLayer(**kw, dropout=dropout, dtype=dtype)
        fused = ViTEncoderLayer(
            **kw, dropout=dropout if fused_dropout is None else fused_dropout,
            fused_mlp_train=True, dtype=dtype,
        )
        return plain, fused

    def test_vit_layer_fused_matches_plain_bf16(self, rng):
        plain, fused = self._layer_pair(jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((2, 9, 128)), jnp.bfloat16)
        variables = plain.init(jax.random.key(0), x, False, False)
        a = np.asarray(plain.apply(variables, x, False, False), np.float32)
        b = np.asarray(fused.apply(variables, x, False, False), np.float32)
        np.testing.assert_allclose(a, b, atol=5e-2, rtol=5e-2)

    def test_grads_match_plain_bf16(self, rng):
        """d(loss)/d(params) through the fused training layer tracks the
        XLA layer's grads (bf16 rounding tolerance)."""
        plain, fused = self._layer_pair(jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((2, 9, 128)), jnp.bfloat16)
        variables = plain.init(jax.random.key(0), x, False, False)

        def loss(mod):
            def f(v):
                return (mod.apply(v, x, False, False)
                        .astype(jnp.float32) ** 2).mean()
            return f

        ga = jax.grad(loss(plain))(variables)
        gb = jax.grad(loss(fused))(variables)
        flat_a = jax.tree_util.tree_leaves_with_path(ga)
        flat_b = {str(k): v for k, v in
                  jax.tree_util.tree_leaves_with_path(gb)}
        for k, va in flat_a:
            vb = flat_b[str(k)]
            np.testing.assert_allclose(
                np.asarray(va, np.float32), np.asarray(vb, np.float32),
                atol=3e-2, rtol=3e-1, err_msg=str(k),
            )

    def test_fp32_falls_back_bitwise(self, rng):
        plain, fused = self._layer_pair(jnp.float32)
        x = jnp.asarray(rng.standard_normal((2, 9, 128)), jnp.float32)
        variables = plain.init(jax.random.key(0), x, False, False)
        a = np.asarray(plain.apply(variables, x, False, False))
        b = np.asarray(fused.apply(variables, x, False, False))
        np.testing.assert_array_equal(a, b)

    def test_active_dropout_falls_back_bitwise(self, rng):
        """dropout > 0 in training: the kernel has no internal dropout
        point, so the layer must take the XLA path (bitwise equal to the
        plain layer under the same rng)."""
        plain, fused = self._layer_pair(
            jnp.bfloat16, dropout=0.3, fused_dropout=0.3
        )
        x = jnp.asarray(rng.standard_normal((2, 9, 128)), jnp.bfloat16)
        variables = plain.init(jax.random.key(0), x, True, False)
        rngs = {"dropout": jax.random.key(7)}
        a = np.asarray(
            plain.apply(variables, x, False, False, rngs=rngs), np.float32
        )
        b = np.asarray(
            fused.apply(variables, x, False, False, rngs=rngs), np.float32
        )
        np.testing.assert_array_equal(a, b)

    def test_param_tree_unchanged(self, rng):
        plain, fused = self._layer_pair(jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((1, 4, 128)), jnp.bfloat16)
        va = plain.init(jax.random.key(0), x, False, False)
        vb = fused.init(jax.random.key(0), x, False, False)
        assert jax.tree_util.tree_structure(va) == \
            jax.tree_util.tree_structure(vb)
        sa = {str(k): v.shape for k, v in
              jax.tree_util.tree_leaves_with_path(va)}
        sb = {str(k): v.shape for k, v in
              jax.tree_util.tree_leaves_with_path(vb)}
        assert sa == sb

    def test_cli_flag_plumbs_to_config(self):
        from clip_for_dl_tpu.cli import build_parser
        from clip_for_dl_tpu.cli.main import _apply_tiny
        from clip_for_dl_tpu.core.config import get_preset

        args = build_parser().parse_args(
            ["pretrain", "--synthetic", "--tiny", "--vit-fused-mlp-train"]
        )
        cfg = _apply_tiny(get_preset("pretrain_clip"), args, 64)
        assert cfg.model.vit_fused_mlp_train

    def test_inference_fused_mlp_takes_precedence(self, rng):
        """Both flags on + deterministic: output equals the inference
        fused_mlp layer's (the LN-fusing kernel wins at serving)."""
        from clip_for_dl_tpu.models.vit import ViTEncoderLayer

        kw = dict(hidden=128, heads=2, mlp_dim=256, dtype=jnp.bfloat16)
        inf = ViTEncoderLayer(**kw, fused_mlp=True)
        both = ViTEncoderLayer(**kw, fused_mlp=True, fused_mlp_train=True)
        x = jnp.asarray(rng.standard_normal((2, 9, 128)), jnp.bfloat16)
        variables = inf.init(jax.random.key(0), x, True, False)
        a = np.asarray(inf.apply(variables, x, True, False), np.float32)
        b = np.asarray(both.apply(variables, x, True, False), np.float32)
        np.testing.assert_array_equal(a, b)
