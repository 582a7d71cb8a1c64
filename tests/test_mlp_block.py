"""Pallas fused MLP block (ops/mlp_block.py): kernel vs XLA oracle, the
in-kernel erf approximation, ViT wiring, checkpoint-tree compatibility,
and the training fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_for_dl_tpu.ops.mlp_block import (
    _erf,
    fused_mlp_block,
    mlp_block_reference,
)


def _inputs(rng, m=37, d=256, h=512, dtype=jnp.float32, batch_shape=(3,)):
    mk = lambda *s: jnp.asarray(
        (rng.standard_normal(s) * 0.05).astype(np.float32)
    )
    x = jnp.asarray(
        rng.standard_normal((*batch_shape, m, d)).astype(np.float32), dtype
    )
    return (
        x, mk(d) + 1.0, mk(d), mk(d, h), mk(h), mk(h, d), mk(d),
    )


class TestKernelEquivalence:
    def test_fp32_matches_reference(self, rng):
        args = _inputs(rng)
        want = mlp_block_reference(*args)
        got = fused_mlp_block(*args, block_rows=64)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
        )

    def test_bf16_matches_reference(self, rng):
        args = _inputs(rng, dtype=jnp.bfloat16)
        want = np.asarray(mlp_block_reference(*args), np.float32)
        got = np.asarray(fused_mlp_block(*args, block_rows=64), np.float32)
        scale = np.abs(want).max()
        assert np.abs(got - want).max() <= 0.02 * scale

    def test_tanh_gelu_path(self, rng):
        args = _inputs(rng)
        want = mlp_block_reference(*args, gelu_approximate=True)
        got = fused_mlp_block(*args, gelu_approximate=True, block_rows=64)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
        )

    def test_ragged_rows_and_2d_input(self, rng):
        """Row count not a multiple of block_rows (the B·197 case) and a
        flat [M, D] input both work; padded tail rows are never written."""
        args = _inputs(rng, m=197, batch_shape=(2,))
        want = mlp_block_reference(*args)
        got = fused_mlp_block(*args, block_rows=128)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
        )
        flat = (args[0].reshape(-1, args[0].shape[-1]), *args[1:])
        got2 = fused_mlp_block(*flat, block_rows=128)
        np.testing.assert_allclose(
            np.asarray(got2), np.asarray(got).reshape(got2.shape), atol=0
        )

    def test_unaligned_dims_rejected(self, rng):
        args = _inputs(rng, d=96, h=192)
        with pytest.raises(ValueError, match="MXU-aligned"):
            fused_mlp_block(*args)


def test_cli_fused_mlp_model_parallel_guard():
    """--fused-mlp is data-parallel-only: the opaque custom call can't be
    partitioned by tp/pp/ep model sharding — clear error, not XLA
    replication."""
    from clip_for_dl_tpu.cli.main import main

    with pytest.raises(SystemExit, match="data parallelism only"):
        main(["zeroshot", "--tiny", "--synthetic", "--preset", "vit",
              "--fused-mlp", "--tp", "2", "--num-devices", "2"])
    with pytest.raises(SystemExit, match="data parallelism only"):
        main(["pretrain", "--tiny", "--synthetic", "--preset", "vit",
              "--fused-mlp", "--pp", "2"])


def test_erf_matches_lax_erf():
    """The in-kernel A&S 7.1.26 erf (Mosaic lowers neither erf nor erfc)
    stays within 1e-6 of lax.erf — three orders below bf16 resolution."""
    x = jnp.asarray(np.linspace(-6.0, 6.0, 20001, dtype=np.float32))
    got = np.asarray(_erf(x))
    want = np.asarray(jax.lax.erf(x))
    assert np.abs(got - want).max() < 1e-6


class TestViTWiring:
    CFG = dict(
        image_size=32, patch=16, hidden=128, layers=2, heads=2, mlp_dim=256
    )

    def _vit(self, **kw):
        from clip_for_dl_tpu.models.vit import ViT

        return ViT(**self.CFG, **kw)

    def test_fused_forward_matches_unfused(self, rng):
        """bf16 compute (the fused gate's dtype — fp32 keeps the XLA
        parity path by design) engages the kernel; tolerance is bf16
        rounding."""
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
        base = self._vit(dtype=jnp.bfloat16)
        fused = self._vit(fused_mlp=True, dtype=jnp.bfloat16)
        variables = base.init(jax.random.key(0), x)
        want = np.asarray(base.apply(variables, x), np.float32)
        got = np.asarray(fused.apply(variables, x), np.float32)
        scale = np.abs(want).max()
        assert np.abs(got - want).max() <= 0.03 * scale

    def test_fp32_keeps_parity_path_bitwise(self, rng):
        """fp32 compute must not engage the kernel (VMEM budget + parity
        mode): fused output is bitwise the unfused output."""
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
        base = self._vit()
        fused = self._vit(fused_mlp=True)
        variables = base.init(jax.random.key(0), x)
        np.testing.assert_array_equal(
            np.asarray(base.apply(variables, x)),
            np.asarray(fused.apply(variables, x)),
        )

    def test_param_tree_identical(self):
        """fused_mlp=True declares the exact same checkpoint tree (names,
        shapes, dtypes) — restores interoperate both directions."""
        x = jnp.zeros((1, 32, 32, 3))
        v_base = self._vit().init(jax.random.key(1), x)
        v_fused = self._vit(fused_mlp=True).init(jax.random.key(1), x)
        base_s = jax.tree.map(lambda a: (a.shape, a.dtype), v_base)
        fused_s = jax.tree.map(lambda a: (a.shape, a.dtype), v_fused)
        assert jax.tree_util.tree_structure(base_s) == jax.tree_util.tree_structure(fused_s)
        assert jax.tree.all(jax.tree.map(lambda a, b: a == b, base_s, fused_s))
        # same seed → same values: the fused branch uses nn.Dense's inits
        chex = pytest.importorskip("chex")
        chex.assert_trees_all_close(v_base, v_fused)

    def test_unaligned_config_falls_back_bitwise(self, rng):
        from clip_for_dl_tpu.models.vit import ViT

        x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
        base = ViT(image_size=32, patch=16, hidden=96, layers=1, heads=2,
                   mlp_dim=192)
        fused = ViT(image_size=32, patch=16, hidden=96, layers=1, heads=2,
                    mlp_dim=192, fused_mlp=True)
        variables = base.init(jax.random.key(2), x)
        np.testing.assert_array_equal(
            np.asarray(base.apply(variables, x)),
            np.asarray(fused.apply(variables, x)),
        )

    def test_training_path_differentiable(self, rng):
        """deterministic=False keeps the XLA path, so grads flow even with
        fused_mlp=True (the kernel has no VJP)."""
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
        fused = self._vit(fused_mlp=True)
        variables = fused.init(jax.random.key(3), x)

        def loss(params):
            out = fused.apply(
                {"params": params}, x, deterministic=False,
                rngs={"dropout": jax.random.key(0)},
            )
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(variables["params"])
        assert jax.tree.all(
            jax.tree.map(lambda a: bool(jnp.all(jnp.isfinite(a))), g)
        )

    def test_cxrclip_config_plumbs_flag(self, rng):
        from clip_for_dl_tpu.core.config import ModelConfig
        from clip_for_dl_tpu.models import CXRClip

        cfg = ModelConfig(
            image_size=32, max_text_length=8, vocab_size=64,
            text_embedding_dim=16, text_layers=1, text_heads=2,
            text_intermediate_dim=32, shared_embedding_dim=64,
            text_max_position=16, image_tower="vit_b16", vit_patch=16,
            vit_layers=1, vit_heads=2, vit_hidden=128, vit_mlp_dim=256,
            image_embedding_dim=128, vit_fused_mlp=True,
        )
        import dataclasses

        base_cfg = dataclasses.replace(cfg, vit_fused_mlp=False)
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
        base = CXRClip(base_cfg, dtype=jnp.bfloat16)
        fused = CXRClip(cfg, dtype=jnp.bfloat16)
        variables = base.init(
            jax.random.key(0), x, jnp.zeros((2, 8), jnp.int32)
        )
        want = np.asarray(
            base.apply(variables, x, method="encode_image"), np.float32
        )
        got = np.asarray(
            fused.apply(variables, x, method="encode_image"), np.float32
        )
        scale = np.abs(want).max()
        assert np.abs(got - want).max() <= 0.05 * scale
