"""Native runtime: cv2 byte-parity resize, fused normalize, threading."""

import numpy as np
import pytest

from clip_for_dl_tpu.native import (
    batch_resize_normalize,
    batch_resize_u8,
    is_available,
    resize_u8,
)

needs_native = pytest.mark.skipif(
    not is_available(), reason="native library unavailable (no g++?)"
)


@needs_native
class TestCv2Parity:
    @pytest.mark.parametrize("shape,target", [
        ((300, 400), (224, 224)),
        ((512, 512), (224, 224)),
        ((2048, 1500), (224, 224)),
        ((224, 224), (224, 224)),
        ((640, 480), (128, 96)),
    ])
    def test_downscale_exact_byte_parity_with_cv2(self, rng, shape, target):
        """The production path (Indiana CXRs are ~2048px, always downscaled
        to 224) is byte-identical to cv2.resize INTER_LINEAR."""
        cv2 = pytest.importorskip("cv2")
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        want = cv2.resize(img, (target[1], target[0]),
                          interpolation=cv2.INTER_LINEAR)
        got = resize_u8(img, *target)
        mismatches = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert mismatches.max() == 0, f"max diff {mismatches.max()}"

    @pytest.mark.parametrize("shape,target", [
        ((100, 80), (224, 224)),
        ((64, 48), (128, 96)),
    ])
    def test_upscale_within_one_lsb(self, rng, shape, target):
        """cv2 5.x's upscale border rows (fy==0) use an internal rounding we
        match to ≤1 LSB; all interior rows are exact."""
        cv2 = pytest.importorskip("cv2")
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        want = cv2.resize(img, (target[1], target[0]),
                          interpolation=cv2.INTER_LINEAR)
        got = resize_u8(img, *target)
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 1
        assert diff[1:-1].max() == 0  # interior rows exact

    def test_grayscale_downscale_exact(self, rng):
        cv2 = pytest.importorskip("cv2")
        img = rng.integers(0, 256, (99, 77, 1), dtype=np.uint8)
        want = cv2.resize(img, (32, 32), interpolation=cv2.INTER_LINEAR)
        got = resize_u8(img, 32, 32)
        np.testing.assert_array_equal(got[..., 0], want)


@needs_native
class TestBatchOps:
    def test_batch_resize_variable_sizes(self, rng):
        images = [
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for h, w in [(100, 120), (300, 200), (64, 64), (224, 224)]
        ]
        out = batch_resize_u8(images, 96, 96, threads=2)
        assert out.shape == (4, 96, 96, 3)
        for i, img in enumerate(images):
            np.testing.assert_array_equal(out[i], resize_u8(img, 96, 96))

    def test_batch_normalize_values(self, rng):
        images = [rng.integers(0, 256, (50, 60, 3), dtype=np.uint8)] * 2
        mean, std = (0.5, 0.4, 0.3), (0.2, 0.25, 0.3)
        out = batch_resize_normalize(images, 32, 32, mean, std, threads=2)
        assert out.dtype == np.float32
        u8 = resize_u8(images[0], 32, 32)
        want = (u8.astype(np.float32) / 255.0 - np.asarray(mean)) / np.asarray(std)
        np.testing.assert_allclose(out[0], want, atol=1e-5)

    def test_threaded_matches_serial(self, rng):
        images = [
            rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
            for _ in range(16)
        ]
        a = batch_resize_u8(images, 64, 64, threads=1)
        b = batch_resize_u8(images, 64, 64, threads=8)
        np.testing.assert_array_equal(a, b)


def test_numpy_fallback_close_to_cv2(rng, monkeypatch):
    """The pure-numpy fallback stays within 1 LSB of cv2."""
    cv2 = pytest.importorskip("cv2")
    from clip_for_dl_tpu.native import bindings

    img = rng.integers(0, 256, (100, 90, 3), dtype=np.uint8)
    got = bindings._np_resize_u8(img, 64, 64)
    want = cv2.resize(img, (64, 64), interpolation=cv2.INTER_LINEAR)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
