import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from clip_for_dl_tpu.ops import (
    fused_resize_normalize,
    fused_similarity,
    l2_normalize,
    preprocess_images,
    resize_bilinear,
    similarity_reference,
)


class TestL2Normalize:
    def test_matches_torch_normalize(self, rng):
        x = rng.standard_normal((7, 512)).astype(np.float32)
        ours = np.asarray(l2_normalize(jnp.asarray(x)))
        theirs = F.normalize(torch.from_numpy(x), dim=-1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_zero_vector_stable(self):
        x = jnp.zeros((2, 8))
        out = l2_normalize(x)
        assert np.isfinite(np.asarray(out)).all()


class TestSimilarity:
    def test_reference_matches_torch(self, rng):
        img = rng.standard_normal((5, 512)).astype(np.float32)
        txt = rng.standard_normal((16, 512)).astype(np.float32)
        ours = np.asarray(
            similarity_reference(jnp.asarray(img), jnp.asarray(txt), 0.5)
        )
        ti = F.normalize(torch.from_numpy(img), dim=-1)
        tt = F.normalize(torch.from_numpy(txt), dim=-1)
        theirs = ((ti @ tt.T) / 0.5).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    @pytest.mark.parametrize("b,c,d", [(5, 16, 512), (33, 16, 512), (8, 3, 130)])
    def test_fused_kernel_matches_reference(self, rng, b, c, d):
        img = rng.standard_normal((b, d)).astype(np.float32)
        txt = rng.standard_normal((c, d)).astype(np.float32)
        ref = np.asarray(
            similarity_reference(jnp.asarray(img), jnp.asarray(txt), 0.07)
        )
        fused = np.asarray(
            fused_similarity(
                jnp.asarray(img), jnp.asarray(txt), 0.07, interpret=True
            )
        )
        np.testing.assert_allclose(fused, ref, atol=1e-4, rtol=1e-4)

    def test_dp_sharding_partitions_through_kernel(self, rng):
        """A dp-sharded image-feature batch stays sharded through the
        Pallas kernel (custom_partitioning) — no all-gather, row-sharded
        output (an opaque custom call would be replicated by GSPMD)."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        n = len(jax.devices())
        mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
        img = rng.standard_normal((8 * n, 512)).astype(np.float32)
        txt = rng.standard_normal((16, 512)).astype(np.float32)
        want = np.asarray(
            similarity_reference(jnp.asarray(img), jnp.asarray(txt), 0.07)
        )
        xs = jax.device_put(
            jnp.asarray(img), NamedSharding(mesh, P("data", None))
        )
        f = jax.jit(
            lambda a, b: fused_similarity(a, b, 0.07, interpret=True)
        )
        out = f(xs, jnp.asarray(txt))
        assert out.sharding.spec[0] == "data"
        hlo = f.lower(xs, jnp.asarray(txt)).compile().as_text()
        assert "all-gather" not in hlo and "all_gather" not in hlo
        np.testing.assert_allclose(
            np.asarray(out), want, atol=1e-4, rtol=1e-4
        )


class TestResize:
    @pytest.mark.parametrize("in_hw,out_hw", [((448, 512), (224, 224)),
                                              ((100, 80), (224, 224)),
                                              ((224, 224), (224, 224)),
                                              ((2048, 1500), (224, 224))])
    def test_matches_cv2_float(self, rng, in_hw, out_hw):
        cv2 = pytest.importorskip("cv2")
        img = rng.random((*in_hw, 3)).astype(np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(img)[None], *out_hw))[0]
        theirs = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_matches_cv2_uint8_within_quantization(self, rng):
        cv2 = pytest.importorskip("cv2")
        img = rng.integers(0, 256, (300, 400, 3), dtype=np.uint8)
        ours = np.asarray(resize_bilinear(jnp.asarray(img)[None], 224, 224))[0]
        theirs = cv2.resize(img, (224, 224), interpolation=cv2.INTER_LINEAR)
        # cv2 uses 11-bit fixed point + uint8 rounding; stay within 1 level.
        assert np.abs(ours - theirs.astype(np.float32)).max() <= 1.0


class TestPreprocess:
    def test_normalization_values(self, rng):
        mean, std = (0.5, 0.4, 0.3), (0.2, 0.25, 0.3)
        img = rng.integers(0, 256, (2, 224, 224, 3), dtype=np.uint8)
        out = np.asarray(
            preprocess_images(
                jnp.asarray(img), 224, 224, mean, std, out_dtype=jnp.float32
            )
        )
        expected = (img.astype(np.float32) / 255.0 - np.array(mean)) / np.array(std)
        np.testing.assert_allclose(out, expected, atol=1e-4)

    def test_fused_pallas_matches_xla_path(self, rng):
        mean, std = (0.48, 0.45, 0.40), (0.26, 0.26, 0.27)
        img = rng.integers(0, 256, (2, 64, 48, 3), dtype=np.uint8)
        xla = np.asarray(
            preprocess_images(jnp.asarray(img), 32, 32, mean, std, jnp.float32)
        )
        pallas = np.asarray(
            fused_resize_normalize(
                jnp.asarray(img), 32, 32, mean, std, jnp.float32, interpret=True
            )
        )
        np.testing.assert_allclose(pallas, xla, atol=1e-4, rtol=1e-4)


class TestPrepDispatchAndSharding:
    def test_preprocess_fused_always_matches_xla(self, rng):
        """preprocess_images(fused="always") routes through the Pallas
        kernel (interpret on CPU) and matches the XLA composition."""
        from clip_for_dl_tpu.ops.image_prep import preprocess_images

        mean, std = (0.48, 0.45, 0.40), (0.26, 0.26, 0.27)
        img = jnp.asarray(rng.integers(0, 256, (2, 64, 48, 3), dtype=np.uint8))
        xla = np.asarray(
            preprocess_images(img, 32, 32, mean, std, jnp.float32,
                              fused="never")
        )
        fused = np.asarray(
            preprocess_images(img, 32, 32, mean, std, jnp.float32,
                              fused="always")
        )
        np.testing.assert_allclose(fused, xla, atol=1e-4, rtol=1e-4)

    def test_fused_prep_dp_sharding_no_allgather(self, rng):
        """A dp-sharded uint8 batch stays batch-sharded through the fused
        prep kernel (custom_partitioning) — no all-gather in the HLO."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from clip_for_dl_tpu.ops.image_prep import fused_resize_normalize

        n = len(jax.devices())
        mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
        img = rng.integers(0, 256, (2 * n, 64, 48, 3), dtype=np.uint8)
        want = np.asarray(fused_resize_normalize(
            jnp.asarray(img), 32, 32, (0.5, 0.5, 0.5), (0.25, 0.25, 0.25),
            jnp.float32, interpret=True,
        ))
        xs = jax.device_put(
            jnp.asarray(img), NamedSharding(mesh, P("data", None, None, None))
        )
        f = jax.jit(lambda a: fused_resize_normalize(
            a, 32, 32, (0.5, 0.5, 0.5), (0.25, 0.25, 0.25), jnp.float32,
            interpret=True,
        ))
        out = f(xs)
        assert out.sharding.spec[0] == "data"
        hlo = f.lower(xs).compile().as_text()
        assert "all-gather" not in hlo and "all_gather" not in hlo
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)

    def test_fused_prep_vmem_gate(self):
        """The auto dispatch's VMEM viability gate admits the 512-source
        serving shape and rejects native-resolution (2048) sources. The
        budget uses the ACTUAL out_h (not a hardcoded 224) and counts the
        fp32 H-resized intermediate + output block (ADVICE r3)."""
        from clip_for_dl_tpu.ops.image_prep import _fused_prep_viable

        assert _fused_prep_viable(512, 512, 3, 224, 224, 3)
        assert not _fused_prep_viable(2048, 2048, 3, 224, 224, 3)
        # a tall output target inflates wh + intermediate + out blocks:
        # the old 224-hardcoded estimate said yes here, the real budget no
        assert not _fused_prep_viable(768, 768, 3, 2048, 224, 3)

    def test_gray_broadcast_paths_bit_identical_to_rgb(self, rng):
        """C==1 input + 3-channel mean/std → 3-channel output identical
        to feeding the triplicated RGB batch, on every path (identity
        resize, XLA resize, fused Pallas kernel) — the grayscale-packed
        cache contract (data/cache.py)."""
        mean, std = (0.48, 0.45, 0.40), (0.26, 0.26, 0.27)
        g = rng.integers(0, 256, (2, 64, 48, 1), dtype=np.uint8)
        rgb = np.repeat(g, 3, axis=-1)
        # identity resize (the 224-cache e2e hot path)
        a = preprocess_images(jnp.asarray(g), 64, 48, mean, std, jnp.float32)
        b = preprocess_images(jnp.asarray(rgb), 64, 48, mean, std,
                              jnp.float32)
        assert a.shape == (2, 64, 48, 3)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # real resize, XLA path
        a = preprocess_images(jnp.asarray(g), 32, 32, mean, std,
                              jnp.float32, fused="never")
        b = preprocess_images(jnp.asarray(rgb), 32, 32, mean, std,
                              jnp.float32, fused="never")
        assert a.shape == (2, 32, 32, 3)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # fused Pallas kernel (broadcast folded into the W-resize kron)
        af = fused_resize_normalize(jnp.asarray(g), 32, 32, mean, std,
                                    jnp.float32, interpret=True)
        bf = fused_resize_normalize(jnp.asarray(rgb), 32, 32, mean, std,
                                    jnp.float32, interpret=True)
        assert af.shape == (2, 32, 32, 3)
        np.testing.assert_allclose(np.asarray(af), np.asarray(bf),
                                   atol=1e-5, rtol=1e-5)

    def test_gray_single_channel_mean_stays_single_channel(self, rng):
        """C==1 with 1-channel constants keeps a 1-channel output (no
        implicit broadcast)."""
        g = rng.integers(0, 256, (2, 32, 32, 1), dtype=np.uint8)
        out = preprocess_images(jnp.asarray(g), 32, 32, (0.5,), (0.25,),
                                jnp.float32)
        assert out.shape == (2, 32, 32, 1)
