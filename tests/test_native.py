"""Native runtime: cv2 byte-parity resize, fused normalize, threading,
libpng decode parity, and the whole-batch read→decode→resize loader."""

import numpy as np
import pytest

from clip_for_dl_tpu.native import (
    batch_load_resize_u8,
    batch_resize_normalize,
    batch_resize_u8,
    decode_png,
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


@needs_native
class TestPngDecode:
    """cv2.imread-parity decode for every PNG flavor the Kaggle dump can
    contain (the files are 8/16-bit grayscale `*.dcm.png`; the parity net
    is wider: palette, RGBA, sub-8-bit)."""

    def _roundtrip(self, tmp_path, pil_img, name):
        cv2 = pytest.importorskip("cv2")
        path = str(tmp_path / name)
        pil_img.save(path)
        with open(path, "rb") as f:
            got = decode_png(f.read())
        want = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        np.testing.assert_array_equal(got, want)

    def test_gray8(self, tmp_path, rng):
        Image = pytest.importorskip("PIL.Image")
        img = rng.integers(0, 256, (33, 41), dtype=np.uint8)
        self._roundtrip(tmp_path, Image.fromarray(img), "g8.png")

    def test_gray16_high_byte_strip(self, tmp_path, rng):
        """16-bit grayscale (real DICOM-export depth): cv2 keeps the high
        byte (png_set_strip_16), not a 257-scaled value — pinned."""
        Image = pytest.importorskip("PIL.Image")
        img = rng.integers(0, 65536, (17, 23), dtype=np.uint16)
        pil = Image.fromarray(img)
        path = str(tmp_path / "g16.png")
        pil.save(path)
        with open(path, "rb") as f:
            got = decode_png(f.read())
        np.testing.assert_array_equal(
            got[..., 0], (img >> 8).astype(np.uint8)
        )
        cv2 = pytest.importorskip("cv2")
        want = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        np.testing.assert_array_equal(got, want)

    def test_rgb_rgba_palette_1bit(self, tmp_path, rng):
        Image = pytest.importorskip("PIL.Image")
        rgb = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
        self._roundtrip(tmp_path, Image.fromarray(rgb), "rgb.png")
        rgba = rng.integers(0, 256, (9, 11, 4), dtype=np.uint8)
        self._roundtrip(tmp_path, Image.fromarray(rgba), "rgba.png")
        gray = Image.fromarray(rng.integers(0, 256, (9, 11), dtype=np.uint8))
        self._roundtrip(tmp_path, gray.convert("P"), "pal.png")
        self._roundtrip(tmp_path, gray.convert("1"), "b1.png")

    def test_non_png_returns_none(self):
        assert decode_png(b"not a png at all") is None
        assert decode_png(b"") is None

    def test_truncated_png_returns_none(self, tmp_path, rng):
        Image = pytest.importorskip("PIL.Image")
        img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
        path = str(tmp_path / "t.png")
        Image.fromarray(img).save(path)
        with open(path, "rb") as f:
            data = f.read()
        assert decode_png(data[: len(data) // 2]) is None


@needs_native
class TestBatchLoad:
    def test_matches_load_image_bytes(self, tmp_path, rng):
        """The native batch loader is byte-identical to the live
        datasets.load_image path (native decode + cv2-parity resize)."""
        Image = pytest.importorskip("PIL.Image")
        from clip_for_dl_tpu.data.datasets import load_image

        paths = []
        for i, (h, w) in enumerate([(300, 260), (64, 80), (224, 224)]):
            img = rng.integers(0, 256, (h, w), dtype=np.uint8)
            p = str(tmp_path / f"im{i}.dcm.png")
            Image.fromarray(img).save(p)
            paths.append(p)
        batch, ok = batch_load_resize_u8(paths, 96, 96, threads=2)
        assert batch.shape == (3, 96, 96, 3) and ok.all()
        for i, p in enumerate(paths):
            np.testing.assert_array_equal(batch[i], load_image(p, 96))

    def test_missing_and_corrupt_slots_zero_filled(self, tmp_path, rng):
        Image = pytest.importorskip("PIL.Image")
        good = str(tmp_path / "good.png")
        Image.fromarray(
            rng.integers(0, 256, (32, 32), dtype=np.uint8)
        ).save(good)
        bad = str(tmp_path / "bad.png")
        with open(bad, "wb") as f:
            f.write(b"\x89PNG\r\n\x1a\n garbage")
        missing = str(tmp_path / "nope.png")
        batch, ok = batch_load_resize_u8([good, bad, missing], 16, 16)
        assert ok.tolist() == [True, False, False]
        assert batch[1].max() == 0 and batch[2].max() == 0
        assert batch[0].max() > 0


def test_load_image_native_path_matches_cv2(tmp_path, rng):
    """datasets.load_image's native fast path returns the same bytes cv2
    would (decode + resize), including for 16-bit sources."""
    cv2 = pytest.importorskip("cv2")
    Image = pytest.importorskip("PIL.Image")
    from clip_for_dl_tpu.data.datasets import load_image

    img = rng.integers(0, 65536, (260, 300), dtype=np.uint16)
    path = str(tmp_path / "x.dcm.png")
    Image.fromarray(img).save(path)
    got = load_image(path, 224)
    want = cv2.cvtColor(
        cv2.resize(cv2.imread(path), (224, 224)), cv2.COLOR_BGR2RGB
    )
    if is_available():
        np.testing.assert_array_equal(got, want)
    else:
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_cache_build_uses_native_loader_bytes(tmp_path, rng):
    """build_image_cache rows equal the live load_image rows whichever
    backend (native chunked loader or cv2 threads) built them."""
    Image = pytest.importorskip("PIL.Image")
    from clip_for_dl_tpu.data.cache import build_image_cache
    from clip_for_dl_tpu.data.datasets import load_image

    paths = []
    for i in range(5):
        img = rng.integers(0, 256, (50 + 7 * i, 60, 3), dtype=np.uint8)
        p = str(tmp_path / f"c{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    paths.append(str(tmp_path / "missing.png"))  # zero-row fallback
    cache = build_image_cache(paths, 32, str(tmp_path / "cache"), workers=2)
    for p in paths:
        np.testing.assert_array_equal(cache.get(p), load_image(p, 32))


def test_numpy_fallback_close_to_cv2(rng, monkeypatch):
    """The pure-numpy fallback stays within 1 LSB of cv2."""
    cv2 = pytest.importorskip("cv2")
    from clip_for_dl_tpu.native import bindings

    img = rng.integers(0, 256, (100, 90, 3), dtype=np.uint8)
    got = bindings._np_resize_u8(img, 64, 64)
    want = cv2.resize(img, (64, 64), interpolation=cv2.INTER_LINEAR)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
