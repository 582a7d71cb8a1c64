"""Device-resident dataset cache (data/device_cache.py): whole dataset in
HBM, batches gathered on device by index — bit-identical to the streaming
ImageCache path, budget-gated at open, dp-shardable over a mesh.

Reference anchor being beaten: per-epoch re-decode + per-batch H2D
(/root/reference/0425/prepare_data.py:65-90 inside Dataset.__getitem__)."""

import os

import jax
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from clip_for_dl_tpu.data import (
    ChestXrayMultiViewDataset,
    DeviceCacheBudgetError,
    DeviceImageCache,
    HostLoader,
    ImageCache,
    ImageTextDataset,
    build_image_cache,
    device_image_feed,
)
from clip_for_dl_tpu.data.datasets import ExamIndex


@pytest.fixture(scope="module")
def cache_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(11)
    paths = []
    for i in range(10):
        p = str(d / f"CXR{i}_IM.png")
        # grayscale sources → the builder packs to one channel
        cv2.imwrite(p, rng.integers(10, 240, (48, 40), np.uint8))
        paths.append(p)
    cdir = str(tmp_path_factory.mktemp("cache") / "c")
    build_image_cache(paths, 32, cdir, workers=2)
    return cdir, paths


class TestGather:
    def test_gather_is_bit_identical_to_streaming(self, cache_dir):
        cdir, paths = cache_dir
        cache = ImageCache(cdir)
        dcache = DeviceImageCache(cache)
        rows = np.array([dcache.row(p) for p in paths[:4]])
        got = np.asarray(dcache.gather(rows))
        want = np.stack([cache.get(p) for p in paths[:4]])
        np.testing.assert_array_equal(got, want)
        assert got.dtype == np.uint8

    def test_multidim_rows_gather_views(self, cache_dir):
        cdir, paths = cache_dir
        cache = ImageCache(cdir)
        dcache = DeviceImageCache(cache)
        rows = np.array([[0, 1], [2, -1]])  # -1 = missing view
        got = np.asarray(dcache.gather(rows))
        assert got.shape == (2, 2, 32, 32, 1)
        np.testing.assert_array_equal(got[0, 0], cache.get(paths[0]))
        assert (got[1, 1] == 0).all()  # zero-image slot

    def test_budget_gate(self, cache_dir, monkeypatch):
        cdir, _ = cache_dir
        monkeypatch.setenv("CLIP_FOR_DL_TPU_HBM_BYTES", "1024")
        with pytest.raises(DeviceCacheBudgetError, match="budget"):
            DeviceImageCache(ImageCache(cdir))

    def test_mesh_sharded_gather_matches(self, cache_dir):
        cdir, paths = cache_dir
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        cache = ImageCache(cdir)
        dcache = DeviceImageCache(cache, mesh=mesh)
        rows = np.arange(8)
        got = dcache.gather(rows)
        # output is sharded over the data axis, values identical
        assert len(got.sharding.device_set) == 8
        np.testing.assert_array_equal(
            np.asarray(got), np.stack([cache.get(p) for p in paths[:8]])
        )


class TestRowsDatasets:
    def test_image_text_rows_mode(self, cache_dir):
        cdir, paths = cache_dir
        cache = ImageCache(cdir)
        ds = ImageTextDataset(paths, ["t%d" % i for i in range(len(paths))],
                              32, cache=cache, image_rows=True)
        item = ds[3]
        assert "image" not in item
        assert int(item["image_rows"]) == cache.row(paths[3])

    def test_rows_mode_requires_cache(self, cache_dir):
        _, paths = cache_dir
        with pytest.raises(ValueError, match="image cache"):
            ImageTextDataset(paths, ["x"] * len(paths), 32,
                             cache=None, image_rows=True)

    def test_uncached_path_fails_loudly(self, cache_dir):
        cdir, paths = cache_dir
        cache = ImageCache(cdir)
        ds = ImageTextDataset(paths + ["/nope/missing.png"],
                              ["x"] * (len(paths) + 1), 32,
                              cache=cache, image_rows=True)
        with pytest.raises(KeyError, match="full coverage"):
            ds[len(paths)]

    def test_multiview_rows_mode_with_missing_view(self, cache_dir):
        cdir, paths = cache_dir
        cache = ImageCache(cdir)
        idx = ExamIndex(
            uids=["u0"],
            frontal_paths=[paths[0]],
            lateral_paths=[None],
            labels=np.zeros((1, 16), np.float32),
            findings=["f"],
            view_types=[("F", None)],
        )
        ds = ChestXrayMultiViewDataset(idx, 32, cache=cache, image_rows=True)
        item = ds[0]
        assert item["images_rows"].tolist() == [cache.row(paths[0]), -1]

    def test_feed_pipeline_matches_streaming(self, cache_dir):
        """HostLoader + device_image_feed over rows mode yields the same
        image bytes (now device-resident) as the streaming pipeline."""
        cdir, paths = cache_dir
        cache = ImageCache(cdir)
        texts = ["t%d" % i for i in range(len(paths))]
        stream_ds = ImageTextDataset(paths, texts, 32, cache=cache)
        rows_ds = ImageTextDataset(paths, texts, 32, cache=cache,
                                   image_rows=True)
        dcache = DeviceImageCache(cache)

        def batches(ds):
            return HostLoader(ds, batch_size=4, shuffle=True, seed=3)

        streamed = list(batches(stream_ds))
        fed = list(device_image_feed(batches(rows_ds), dcache))
        assert len(streamed) == len(fed) == 3
        for a, b in zip(streamed, fed):
            assert isinstance(b["image"], jax.Array)
            assert "image_rows" not in b
            np.testing.assert_array_equal(a["image"], np.asarray(b["image"]))
            assert a["text"] == b["text"]
            np.testing.assert_array_equal(a["mask"], b["mask"])
