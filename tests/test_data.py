"""Dataset / split / loader behavior tests."""

import numpy as np
import pandas as pd
import pytest

from clip_for_dl_tpu.core.config import DISEASE_LABELS
from clip_for_dl_tpu.data import (
    ChestXrayMultiViewDataset,
    HostLoader,
    SyntheticImageTextDataset,
    SyntheticMultiViewDataset,
    build_exam_index,
    label_reports,
    merge_image_report,
    prefetch_to_device,
    split_by_uid,
    split_reports,
    synthetic_projection_frame,
    synthetic_report_frame,
)


@pytest.fixture(scope="module")
def frames():
    return synthetic_report_frame(60), synthetic_projection_frame(60)


class TestSplits:
    def test_uid_split_no_leakage(self, frames):
        reports, projections = frames
        merged = merge_image_report(projections, reports.assign(findings=reports["findings"]))
        train, test = split_by_uid(merged, 0.2, 42)
        assert set(train["uid"]).isdisjoint(set(test["uid"]))
        assert len(train) + len(test) == len(merged)

    def test_uid_split_deterministic(self, frames):
        reports, projections = frames
        merged = merge_image_report(projections, reports)
        t1, _ = split_by_uid(merged, 0.2, 42)
        t2, _ = split_by_uid(merged, 0.2, 42)
        pd.testing.assert_frame_equal(t1, t2)

    def test_report_split(self, frames):
        reports, _ = frames
        train, test = split_reports(reports, 0.2, 42)
        assert len(train) + len(test) == len(reports)
        assert abs(len(test) - 0.2 * len(reports)) <= 1


class TestExamIndex:
    def test_view_pairing(self, frames):
        reports, projections = frames
        idx = build_exam_index(reports, projections)
        assert len(idx) == reports["uid"].nunique()
        for i in range(len(idx)):
            vt = idx.view_types[i]
            f, l = idx.frontal_paths[i], idx.lateral_paths[i]
            if vt == ("frontal", "lateral"):
                assert f != l
            elif vt in (("frontal", "frontal"), ("lateral", "lateral")):
                assert f == l and f is not None
            else:
                assert vt == ("unknown", "unknown") and f is None and l is None

    def test_dataset_item_shapes(self, frames):
        reports, projections = frames
        idx = build_exam_index(reports, projections)
        ds = ChestXrayMultiViewDataset(idx, image_size=32)
        item = ds[0]
        assert item["images"].shape == (2, 32, 32, 3)
        assert item["images"].dtype == np.uint8
        assert item["labels"].shape == (16,)
        assert isinstance(item["findings"], str)


class TestLoader:
    def test_fixed_shapes_with_padding(self):
        ds = SyntheticMultiViewDataset(n=10, image_size=16)
        loader = HostLoader(ds, batch_size=4, pad_final=True)
        batches = list(loader)
        assert len(batches) == 3
        for b in batches:
            assert b["images"].shape == (4, 2, 16, 16, 3)
            assert b["mask"].shape == (4,)
        assert batches[-1]["mask"].sum() == 2  # 10 = 4+4+2

    def test_drop_last(self):
        ds = SyntheticMultiViewDataset(n=10, image_size=16)
        loader = HostLoader(ds, batch_size=4, drop_last=True)
        assert len(list(loader)) == 2

    def test_shuffle_reproducible_across_epochs(self):
        ds = SyntheticImageTextDataset(n=8, image_size=8)
        l1 = HostLoader(ds, batch_size=8, shuffle=True, seed=3)
        l2 = HostLoader(ds, batch_size=8, shuffle=True, seed=3)
        b1, b2 = next(iter(l1)), next(iter(l2))
        assert b1["text"] == b2["text"]
        # second epoch shuffles differently
        b1b = next(iter(l1))
        assert b1b["text"] != b1["text"]

    def test_mid_epoch_resume_replays_remaining_order(self):
        ds = SyntheticImageTextDataset(n=16, image_size=8)
        loader = HostLoader(ds, batch_size=2, shuffle=True, seed=5)
        it = iter(loader)
        consumed = [next(it)["text"], next(it)["text"]]
        snap = loader.state_dict()
        rest = [b["text"] for b in it]  # what an uninterrupted run yields

        fresh = HostLoader(ds, batch_size=2, shuffle=True, seed=5)
        fresh.load_state_dict(snap)
        resumed = [b["text"] for b in fresh]
        assert resumed == rest
        assert snap == {"epoch": 1, "step": 2}
        # next epoch after a resume shuffles as epoch 2, same as uninterrupted
        again = next(iter(fresh))["text"]
        loader2 = HostLoader(ds, batch_size=2, shuffle=True, seed=5)
        next(iter(loader2))  # consume one batch of epoch 1
        assert again == next(iter(loader2))["text"]  # epoch 2 matches
        assert consumed[0] != consumed[1]

    def test_prefetch_to_device(self):
        ds = SyntheticMultiViewDataset(n=6, image_size=8)
        loader = HostLoader(ds, batch_size=3)
        out = list(prefetch_to_device(iter(loader), keys=("images", "labels", "mask")))
        assert len(out) == 2
        import jax

        assert isinstance(out[0]["images"], jax.Array)
        assert isinstance(out[0]["findings"], list)

    def test_prefetch_threaded_matches_inline(self):
        """threaded=True (producer-thread H2D, the e2e/serving overlap
        path) yields the same batches in the same order as the in-line
        double-buffered form."""
        ds = SyntheticMultiViewDataset(n=10, image_size=8)

        def batches():
            return iter(HostLoader(ds, batch_size=4, shuffle=True, seed=1))

        inline = list(prefetch_to_device(batches(), keys=("images",)))
        threaded = list(prefetch_to_device(
            batches(), keys=("images",), threaded=True
        ))
        assert len(inline) == len(threaded) == 3
        for a, b in zip(inline, threaded):
            np.testing.assert_array_equal(
                np.asarray(a["images"]), np.asarray(b["images"])
            )
            assert a["findings"] == b["findings"]

    def test_prefetch_threaded_reraises_producer_error(self):
        def boom():
            yield {"x": np.zeros(2)}
            raise RuntimeError("decode failed")

        it = prefetch_to_device(boom(), threaded=True)
        next(it)
        with pytest.raises(RuntimeError, match="decode failed"):
            next(it)

    def test_prefetch_threaded_abandonment_stops_producer(self):
        """bench.py's timed e2e loops abandon the generator mid-stream
        over an infinite source; the producer thread must exit (not block
        forever on a full queue pinning device batches)."""
        import threading
        import time

        pulled = [0]

        def infinite():
            while True:
                pulled[0] += 1
                yield {"x": np.zeros(4)}

        before = set(threading.enumerate())
        it = prefetch_to_device(infinite(), threaded=True, depth=2)
        next(it)
        next(it)
        it.close()  # consumer walks away
        extra = []
        deadline = time.time() + 5.0
        while time.time() < deadline:
            extra = [
                t for t in set(threading.enumerate()) - before if t.is_alive()
            ]
            if not extra:
                break
            time.sleep(0.05)
        assert not extra, f"producer thread leaked: {extra}"
        n = pulled[0]
        time.sleep(0.2)
        assert pulled[0] == n  # and it stopped pulling the source

    def test_hostloader_abandonment_stops_producer(self):
        """Abandoning a HostLoader-backed pipeline mid-epoch (the prefetch
        generator being closed GC-closes the upstream iterator) must stop
        HostLoader's OWN producer thread and its ThreadPoolExecutor too —
        not just prefetch_to_device's (ADVICE r4: the inner producer was
        previously an unbounded queue.put one level down)."""
        import threading
        import time

        ds = SyntheticMultiViewDataset(n=64, image_size=8)
        loader = HostLoader(ds, batch_size=2, prefetch=1)
        before = set(threading.enumerate())
        it = prefetch_to_device(iter(loader), keys=("images",),
                                threaded=True, depth=1)
        next(it)
        it.close()  # consumer walks away with >20 batches unproduced
        extra = []
        deadline = time.time() + 10.0
        while time.time() < deadline:
            extra = [
                t for t in set(threading.enumerate()) - before if t.is_alive()
            ]
            if not extra:
                break
            time.sleep(0.05)
        assert not extra, f"thread leaked past abandonment: {extra}"

    def test_hostloader_getitem_exception_surfaces(self):
        """A raising dataset __getitem__ (decode failure, rows-mode cache
        miss) must re-raise in the CONSUMER — a dead producer with no
        sentinel used to hang queue.get() forever (r5 review finding)."""

        class Boom:
            def __len__(self):
                return 8

            def __getitem__(self, i):
                if i >= 4:
                    raise KeyError("not in the image cache")
                return {"x": np.zeros(2, np.float32)}

        loader = HostLoader(Boom(), batch_size=2, prefetch=1)
        with pytest.raises(KeyError, match="image cache"):
            for _ in loader:
                pass

    def test_hostloader_direct_break_stops_producer(self):
        """Breaking out of a bare HostLoader loop (no prefetch wrapper)
        joins the producer thread via the iterator's finally clause."""
        import threading
        import time

        ds = SyntheticMultiViewDataset(n=64, image_size=8)
        loader = HostLoader(ds, batch_size=2, prefetch=1)
        before = set(threading.enumerate())
        for i, _ in enumerate(loader):
            if i == 1:
                break
        extra = []
        deadline = time.time() + 10.0
        while time.time() < deadline:
            extra = [
                t for t in set(threading.enumerate()) - before if t.is_alive()
            ]
            if not extra:
                break
            time.sleep(0.05)
        assert not extra, f"thread leaked past break: {extra}"


class TestLengthGrouped:
    def test_order_groups_without_losing_samples(self):
        from clip_for_dl_tpu.data.loader import length_grouped_order

        rng = np.random.default_rng(0)
        lengths = rng.integers(2, 200, 256)
        order = rng.permutation(256)
        out = length_grouped_order(order, lengths, batch_size=8,
                                   window_batches=4)
        # a permutation of the input order (nothing dropped/duplicated)
        assert sorted(out) == sorted(order)
        # within each 32-sample window, lengths are descending
        for s in range(0, 256, 32):
            w = lengths[out[s:s + 32]]
            assert (np.diff(w) <= 0).all()

    def test_loader_batches_are_length_homogeneous(self):
        ds = SyntheticImageTextDataset(n=64, image_size=8)
        lengths = np.arange(64)[::-1].copy()  # deterministic spread
        grouped = HostLoader(ds, batch_size=8, shuffle=True, seed=2,
                             lengths=lengths, length_group_window=2)
        plain = HostLoader(ds, batch_size=8, shuffle=True, seed=2)
        # grouped epoch = same sample set, different order
        g_texts = [t for b in grouped for t in b["text"]]
        p_texts = [t for b in plain for t in b["text"]]
        assert sorted(g_texts) == sorted(p_texts)
        # per-batch length spread shrinks vs the uniform shuffle
        def spreads(loader):
            out = []
            idx = {ds[i]["text"]: i for i in range(64)}
            for b in loader:
                ls = lengths[[idx[t] for t in b["text"]]]
                out.append(ls.max() - ls.min())
            return out
        assert np.mean(spreads(grouped)) < np.mean(spreads(plain))

    def test_lengths_size_mismatch_rejected(self):
        ds = SyntheticImageTextDataset(n=8, image_size=8)
        with pytest.raises(ValueError, match="lengths"):
            HostLoader(ds, batch_size=4, lengths=np.arange(5))

    def test_set_lengths_validates_like_constructor(self):
        # the CLI installs lengths post-construction (tokenizer exists
        # only later); the setter must keep the constructor's guard
        ds = SyntheticImageTextDataset(n=8, image_size=8)
        loader = HostLoader(ds, batch_size=4)
        with pytest.raises(ValueError, match="lengths"):
            loader.set_lengths(np.arange(5))
        loader.set_lengths(np.arange(8))
        assert loader.lengths is not None and len(loader.lengths) == 8


def test_synthetic_labels_shape():
    ds = SyntheticMultiViewDataset(n=32, image_size=8)
    assert ds.labels.shape == (32, 16)
    assert (ds.labels.sum(axis=1) >= 1).all()


def test_merge_image_report_counts(frames):
    reports, projections = frames
    merged = merge_image_report(projections, reports)
    # every merged row's uid has ≥1 label
    cols = list(DISEASE_LABELS)
    assert (merged[cols].sum(axis=1) >= 1).all()
    assert "image_path" in merged and "report" in merged


class TestLoaderSharding:
    def test_shards_are_disjoint_and_complete(self):
        ds = SyntheticMultiViewDataset(n=20, image_size=8)
        seen = []
        for shard in range(4):
            loader = HostLoader(
                ds, batch_size=3, shuffle=True, seed=7,
                shard_index=shard, num_shards=4, pad_final=False,
            )
            for batch in loader:
                seen.extend(batch["findings"])
        # global shuffle is shared → union covers every sample exactly once
        all_findings = [ds[i]["findings"] for i in range(20)]
        assert sorted(seen) == sorted(all_findings)

    def test_shard_len(self):
        ds = SyntheticMultiViewDataset(n=21, image_size=8)
        l0 = HostLoader(ds, batch_size=4, shard_index=0, num_shards=2)
        l1 = HostLoader(ds, batch_size=4, shard_index=1, num_shards=2)
        assert len(l0) == 3 and len(l1) == 3  # 11 and 10 samples

    def test_pad_shards_scores_every_sample_once(self):
        """Eval sharding (pad_shards): shards stay length-synchronized
        (no collective deadlock) AND no sample is dropped — the truncating
        even_shards policy loses up to num_shards-1 eval samples, which is
        wrong for validation metrics."""
        ds = SyntheticMultiViewDataset(n=19, image_size=8)  # 19 = 4*4+3
        lens, seen = [], []
        for shard in range(4):
            loader = HostLoader(
                ds, batch_size=3, shuffle=False, seed=0,
                shard_index=shard, num_shards=4, pad_final=True,
                pad_shards=True,
            )
            lens.append(len(loader))
            batches = list(loader)
            assert len(batches) == len(loader)
            for batch in batches:
                m = batch["mask"].astype(bool)
                seen.extend(
                    f for f, keep in zip(batch["findings"], m) if keep
                )
        assert len(set(lens)) == 1  # every shard yields the same count
        all_findings = [ds[i]["findings"] for i in range(19)]
        assert sorted(seen) == sorted(all_findings)  # exactly once each

    def test_pad_shards_requires_mask_channel(self):
        ds = SyntheticMultiViewDataset(n=8, image_size=8)
        with pytest.raises(ValueError):
            HostLoader(ds, batch_size=2, num_shards=2, shard_index=0,
                       pad_final=False, pad_shards=True)
        with pytest.raises(ValueError):
            HostLoader(ds, batch_size=2, num_shards=2, shard_index=0,
                       even_shards=True, pad_shards=True)
