"""Preprocessed image cache (data/cache.py): byte parity with the live
cv2 decode path, graceful fallback, staleness/geometry guards, CLI build."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from clip_for_dl_tpu.data import (
    ImageCache,
    ImageMultiLabelDataset,
    ImageTextDataset,
    build_image_cache,
    load_image,
)
from clip_for_dl_tpu.data.cache import DATA_NAME, META_NAME


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(7)
    for i in range(6):
        img = rng.integers(0, 255, (90 + 7 * i, 70 + 5 * i, 3), np.uint8)
        cv2.imwrite(str(d / f"img_{i}.png"), img)
    return str(d)


def _paths(image_dir):
    return sorted(
        os.path.join(image_dir, f) for f in os.listdir(image_dir)
    )


class TestBuildAndRead:
    def test_byte_parity_with_live_decode(self, image_dir, tmp_path):
        paths = _paths(image_dir)
        cache = build_image_cache(paths, 64, str(tmp_path / "c"), workers=2)
        assert len(cache) == len(paths)
        for p in paths:
            np.testing.assert_array_equal(cache.get(p), load_image(p, 64))

    def test_reopen_and_basename_keying(self, image_dir, tmp_path):
        paths = _paths(image_dir)
        build_image_cache(paths, 32, str(tmp_path / "c"))
        cache = ImageCache(str(tmp_path / "c"))
        # a different mount point for the same filenames still hits
        moved = os.path.join("/elsewhere", os.path.basename(paths[0]))
        assert moved in cache
        np.testing.assert_array_equal(
            cache.get(moved), load_image(paths[0], 32)
        )

    def test_unknown_path_returns_none(self, image_dir, tmp_path):
        cache = build_image_cache(_paths(image_dir), 32, str(tmp_path / "c"))
        assert cache.get("/nope/missing.png") is None
        assert "/nope/missing.png" not in cache

    def test_duplicate_same_file_ok_collision_raises(self, image_dir, tmp_path):
        paths = _paths(image_dir)
        # the same path repeated (multi-label rows share images) dedups
        cache = build_image_cache(
            paths + [paths[0]], 32, str(tmp_path / "c1")
        )
        assert len(cache) == len(paths)
        # a different file with the same basename is a hard error
        other = tmp_path / "other"
        other.mkdir()
        clash = str(other / os.path.basename(paths[0]))
        cv2.imwrite(clash, np.zeros((8, 8, 3), np.uint8))
        with pytest.raises(ValueError, match="collision"):
            build_image_cache(paths + [clash], 32, str(tmp_path / "c2"))

    def test_decode_failure_matches_live_zero_fallback(self, tmp_path):
        bad = tmp_path / "bad.png"
        bad.write_bytes(b"not a png")
        # an all-zero row is trivially grayscale → auto-packs to 1 channel
        cache = build_image_cache([str(bad)], 16, str(tmp_path / "c"))
        assert cache.channels == 1
        np.testing.assert_array_equal(
            cache.get(str(bad)), np.zeros((16, 16, 1), np.uint8)
        )
        # forced-RGB layout keeps the live path's exact 3-channel zeros
        cache = build_image_cache(
            [str(bad)], 16, str(tmp_path / "c3"), channels="rgb"
        )
        assert cache.channels == 3
        np.testing.assert_array_equal(
            cache.get(str(bad)), np.zeros((16, 16, 3), np.uint8)
        )


class TestGrayscalePacking:
    """Grayscale-packed caches (channels=1): the CXR ingest fast path —
    3x smaller rows, bit-identical model input after the on-device
    broadcast (ops/image_prep.py)."""

    @pytest.fixture(scope="class")
    def gray_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("gray")
        rng = np.random.default_rng(11)
        for i in range(5):
            cv2.imwrite(
                str(d / f"CXR{i}.png"),
                rng.integers(0, 255, (80 + 6 * i, 64 + 4 * i), np.uint8),
            )
        return str(d)

    def test_all_gray_sources_pack_to_one_channel(self, gray_dir, tmp_path):
        paths = _paths(gray_dir)
        cache = build_image_cache(paths, 48, str(tmp_path / "c"), workers=2)
        assert cache.channels == 1
        data = os.path.join(str(tmp_path / "c"), DATA_NAME)
        assert os.path.getsize(data) == len(paths) * 48 * 48  # 1 byte/px
        for p in paths:
            live = load_image(p, 48)  # [S,S,3], three identical channels
            np.testing.assert_array_equal(live[..., :1], live[..., 1:2])
            np.testing.assert_array_equal(cache.get(p), live[..., :1])

    def test_one_color_file_keeps_rgb_layout(self, gray_dir, image_dir,
                                             tmp_path):
        paths = _paths(gray_dir) + _paths(image_dir)[:1]
        cache = build_image_cache(paths, 32, str(tmp_path / "c"), workers=2)
        assert cache.channels == 3
        for p in paths:
            np.testing.assert_array_equal(cache.get(p), load_image(p, 32))

    def test_force_rgb_overrides_auto(self, gray_dir, tmp_path):
        cache = build_image_cache(
            _paths(gray_dir), 32, str(tmp_path / "c"), channels="rgb"
        )
        assert cache.channels == 3

    def test_bad_channels_arg_rejected(self, gray_dir, tmp_path):
        with pytest.raises(ValueError, match="channels"):
            build_image_cache(
                _paths(gray_dir), 32, str(tmp_path / "c"), channels="gray"
            )

    def test_v1_meta_opens_as_rgb(self, image_dir, tmp_path):
        """Round-3 caches (version 1, no channels field) still open."""
        d = str(tmp_path / "c")
        build_image_cache(_paths(image_dir), 32, d)
        meta_path = os.path.join(d, META_NAME)
        meta = json.load(open(meta_path))
        assert meta["channels"] == 3  # color fixture → rgb layout
        meta["version"] = 1
        del meta["channels"]
        json.dump(meta, open(meta_path, "w"))
        cache = ImageCache(d)
        assert cache.channels == 3

    def test_multiview_dataset_emits_consistent_gray_items(
        self, gray_dir, tmp_path
    ):
        """Datasets fed a gray cache emit 1-channel items everywhere —
        cached rows, the zero-view fallback, and live-decode stragglers —
        so batches stack."""
        from clip_for_dl_tpu.data.datasets import (
            ChestXrayMultiViewDataset, ExamIndex,
        )

        paths = _paths(gray_dir)
        cache = build_image_cache(paths[:-1], 48, str(tmp_path / "c"))
        assert cache.channels == 1
        index = ExamIndex(
            uids=np.array(["u1", "u2", "u3"]),
            frontal_paths=[paths[0], paths[-1], None],  # [-1] is uncached
            lateral_paths=[paths[1], None, None],
            labels=np.zeros((3, 16), np.float32),
            findings=["", "", ""],
            view_types=[("frontal", "lateral")] * 3,
        )
        ds = ChestXrayMultiViewDataset(index, 48, cache=cache)
        assert ds.channels == 1
        for i in range(3):
            item = ds[i]
            assert item["images"].shape == (2, 48, 48, 1)
        # straggler went through live decode + channel-0 reduction
        np.testing.assert_array_equal(
            ds[1]["images"][0], load_image(paths[-1], 48)[..., :1]
        )

    def test_color_straggler_through_gray_cache_raises(
        self, gray_dir, tmp_path
    ):
        """A genuinely color image NOT in a gray-packed cache cannot be
        represented in a 1-channel batch; keeping channel 0 would be
        silent data corruption, so the loader refuses loudly."""
        from clip_for_dl_tpu.data.datasets import _cached_load

        paths = _paths(gray_dir)
        cache = build_image_cache(paths, 48, str(tmp_path / "c"))
        assert cache.channels == 1
        color = str(tmp_path / "color.png")
        rng = np.random.default_rng(3)
        cv2.imwrite(color, rng.integers(0, 255, (64, 64, 3), np.uint8))
        with pytest.raises(ValueError, match="color image"):
            _cached_load(cache, color, 48)
        # a gray straggler still loads fine
        gray2 = str(tmp_path / "gray2.png")
        cv2.imwrite(gray2, rng.integers(0, 255, (64, 64), np.uint8))
        assert _cached_load(cache, gray2, 48).shape == (48, 48, 1)


class TestGuards:
    def test_size_mismatch_rejected_at_dataset_construction(
        self, image_dir, tmp_path
    ):
        paths = _paths(image_dir)
        cache = build_image_cache(paths, 32, str(tmp_path / "c"))
        with pytest.raises(ValueError, match="built at size 32"):
            ImageTextDataset(paths, ["t"] * len(paths), 64, cache=cache)

    def test_truncated_data_file_rejected(self, image_dir, tmp_path):
        d = str(tmp_path / "c")
        build_image_cache(_paths(image_dir), 32, d)
        data = os.path.join(d, DATA_NAME)
        with open(data, "r+b") as f:
            f.truncate(os.path.getsize(data) - 1)
        with pytest.raises(ValueError, match="truncated or stale"):
            ImageCache(d)

    def test_version_mismatch_rejected(self, image_dir, tmp_path):
        d = str(tmp_path / "c")
        build_image_cache(_paths(image_dir), 32, d)
        meta_path = os.path.join(d, META_NAME)
        meta = json.load(open(meta_path))
        meta["version"] = 99
        json.dump(meta, open(meta_path, "w"))
        with pytest.raises(ValueError, match="version"):
            ImageCache(d)


class TestDatasetIntegration:
    def test_image_text_dataset_serves_cached_bytes(self, image_dir, tmp_path):
        paths = _paths(image_dir)
        cache = build_image_cache(paths, 48, str(tmp_path / "c"))
        live = ImageTextDataset(paths, ["t"] * len(paths), 48)
        cached = ImageTextDataset(paths, ["t"] * len(paths), 48, cache=cache)
        for i in range(len(paths)):
            np.testing.assert_array_equal(
                cached[i]["image"], live[i]["image"]
            )

    def test_multilabel_dataset_falls_back_for_uncached(
        self, image_dir, tmp_path
    ):
        paths = _paths(image_dir)
        # cache everything except the last path
        cache = build_image_cache(paths[:-1], 48, str(tmp_path / "c"))
        labels = np.zeros((len(paths), 16), np.float32)
        ds = ImageMultiLabelDataset(paths, labels, 48, cache=cache)
        for i in range(len(paths)):
            np.testing.assert_array_equal(
                ds[i]["image"], load_image(paths[i], 48)
            )


class TestCLI:
    def test_cache_images_command_and_training_flag(self, image_dir, tmp_path):
        out = str(tmp_path / "cache")
        r = subprocess.run(
            [sys.executable, "-m", "clip_for_dl_tpu.cli.main",
             "cache-images", "--image-dir", image_dir, "--out", out,
             "--image-size", "32", "--workers", "2"],
            capture_output=True, text=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert r.returncode == 0, r.stderr
        assert "cached 6 images" in r.stdout
        cache = ImageCache(out)
        assert len(cache) == 6 and cache.image_size == 32
