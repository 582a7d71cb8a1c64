"""Serving layer: micro-batcher coalescing, request decoding, HTTP API."""

import base64
import http.client
import json
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from clip_for_dl_tpu.core.config import DISEASE_LABELS
from clip_for_dl_tpu.serving import (
    MicroBatcher,
    ZeroShotService,
    create_server,
    decode_request_image,
)


class TestMicroBatcher:
    def test_single_request_roundtrip(self):
        batcher = MicroBatcher(lambda x: x.sum(axis=(1, 2, 3)),
                               buckets=(1, 4), max_wait_ms=1.0)
        img = np.ones((8, 8, 3), np.uint8)
        assert batcher.submit(img).result(timeout=5) == 8 * 8 * 3
        batcher.close()

    def test_concurrent_requests_coalesce(self):
        seen_batches = []

        def predict(x):
            seen_batches.append(x.shape[0])
            time.sleep(0.01)  # give the queue time to fill
            return x.sum(axis=(1, 2, 3))

        batcher = MicroBatcher(predict, buckets=(1, 4, 16), max_wait_ms=50.0)
        imgs = [np.full((4, 4, 3), i, np.uint8) for i in range(16)]
        with ThreadPoolExecutor(16) as pool:
            futs = list(pool.map(batcher.submit, imgs))
            results = [f.result(timeout=10) for f in futs]
        batcher.close()
        # every request got ITS OWN image's sum back, in submit order
        assert results == [i * 4 * 4 * 3 for i in range(16)]
        stats = batcher.stats()
        assert stats["requests"] == 16
        assert stats["batches"] < 16  # coalescing happened
        assert all(b in (1, 4, 16) for b in seen_batches)  # bucketed shapes

    def test_padding_counted_and_sliced_off(self):
        batcher = MicroBatcher(lambda x: x.sum(axis=(1, 2, 3)),
                               buckets=(4,), max_wait_ms=1.0)
        out = batcher.submit(np.ones((2, 2, 3), np.uint8)).result(timeout=5)
        assert out == 12  # own row, not a padded zero row
        assert batcher.stats()["rows_padded"] >= 3
        batcher.close()

    def test_shape_mismatch_fails_callers_not_worker(self):
        # batch assembly errors must resolve the futures AND leave the
        # worker alive for later requests (no zombie server)
        batcher = MicroBatcher(lambda x: x.sum(axis=(1, 2, 3)),
                               buckets=(4,), max_wait_ms=500.0)
        f1 = batcher.submit(np.ones((4, 4, 3), np.uint8))
        f2 = batcher.submit(np.ones((8, 8, 3), np.uint8))  # mismatched
        errs = 0
        for f in (f1, f2):
            try:
                f.result(timeout=5)
            except ValueError:
                errs += 1
        assert errs >= 1  # at least the coalesced pair failed
        # worker survived: a clean request still succeeds
        out = batcher.submit(np.ones((4, 4, 3), np.uint8)).result(timeout=5)
        assert out == 4 * 4 * 3
        batcher.close()

    def test_close_drains_pending_futures(self):
        import threading

        release = threading.Event()

        def slow_predict(x):
            release.wait(5)
            return x.sum(axis=(1, 2, 3))

        batcher = MicroBatcher(slow_predict, buckets=(1,), max_wait_ms=1.0)
        first = batcher.submit(np.ones((2, 2, 3), np.uint8))  # occupies worker
        time.sleep(0.1)
        queued = batcher.submit(np.ones((2, 2, 3), np.uint8))
        release.set()
        first.result(timeout=5)
        batcher.close()
        # the still-queued request fails fast instead of hanging
        if not queued.done():
            with pytest.raises(RuntimeError, match="batcher closed"):
                queued.result(timeout=1)

    def test_close_resolves_futures_behind_blocked_handoff(self):
        """Regression: shutdown while the finalizer is mid-fetch (slow
        tunnel), the depth-2 hand-off queue full, and the assembler blocked
        in put(). Every pending future must still resolve — pre-fix, an
        entry deposited after close()'s one-shot drain hung its callers
        forever."""
        import threading

        fetch_gate = threading.Event()

        def blocking_fetch(handle):
            fetch_gate.wait(20)
            return np.asarray(handle)

        batcher = MicroBatcher(
            lambda x: x.sum(axis=(1, 2, 3)), buckets=(1,),
            max_wait_ms=1.0, fetch_fn=blocking_fetch,
        )
        # 1st batch: finalizer blocks in fetch; 2nd+3rd fill the depth-2
        # hand-off; 4th leaves the assembler blocked in put()
        futs = [batcher.submit(np.ones((2, 2, 3), np.uint8))
                for _ in range(4)]
        deadline = time.monotonic() + 5
        while time.monotonic() < deadline and not (
            batcher._inflight.full() and batcher.queue.empty()
        ):  # assembler now blocked in put() on the 4th batch
            time.sleep(0.02)

        closer = threading.Thread(target=batcher.close)
        closer.start()
        # the blocked-put and drained entries fail fast even while the
        # finalizer is still stuck in fetch
        for fut in futs[1:]:
            with pytest.raises(RuntimeError, match="batcher closed"):
                fut.result(timeout=5)
        fetch_gate.set()  # release the finalizer; first future completes
        closer.join(timeout=15)
        assert not closer.is_alive()
        assert futs[0].done()

    def test_predict_failure_propagates(self):
        def boom(x):
            raise RuntimeError("device fell over")

        batcher = MicroBatcher(boom, buckets=(1,), max_wait_ms=1.0)
        fut = batcher.submit(np.zeros((2, 2, 3), np.uint8))
        with pytest.raises(RuntimeError, match="fell over"):
            fut.result(timeout=5)
        batcher.close()

    def test_backlog_sheds_at_max_pending(self):
        # admission control: past max_pending queued requests, submit
        # raises BacklogFull (HTTP layer maps it to 429) instead of
        # queueing unboundedly; accepted requests still complete
        from clip_for_dl_tpu.serving import BacklogFull

        release = threading.Event()

        def slow(x):
            release.wait(timeout=10)
            return x.sum(axis=(1, 2, 3))

        batcher = MicroBatcher(slow, buckets=(1,), max_wait_ms=1.0,
                               max_pending=2)
        img = np.ones((2, 2, 3), np.uint8)
        futs = [batcher.submit(img)]  # assembler takes this one
        # wait until the worker has dequeued the first request so the
        # backlog accounting below is deterministic
        deadline = time.monotonic() + 30
        while batcher.queue.qsize() > 0 and time.monotonic() < deadline:
            time.sleep(0.005)
        # fail loudly here rather than letting the fills below trip
        # BacklogFull outside the pytest.raises block on a starved CI host
        assert batcher.queue.qsize() == 0, "worker never dequeued request 1"
        futs += [batcher.submit(img), batcher.submit(img)]  # fills backlog
        with pytest.raises(BacklogFull):
            batcher.submit(img)
        assert batcher.stats()["shed"] == 1
        release.set()
        assert all(f.result(timeout=10) == 12 for f in futs)
        batcher.close()


class TestDecodeRequestImage:
    def _png_bytes(self, size=32):
        import cv2

        img = np.random.default_rng(0).integers(
            0, 255, (size, size, 3), dtype=np.uint8
        )
        ok, buf = cv2.imencode(".png", img)
        assert ok
        return buf.tobytes()

    def test_raw_bytes(self):
        out = decode_request_image(self._png_bytes(), "image/png", 24)
        assert out.shape == (24, 24, 3) and out.dtype == np.uint8

    def test_json_b64(self):
        body = json.dumps(
            {"image_b64": base64.b64encode(self._png_bytes()).decode()}
        ).encode()
        out = decode_request_image(body, "application/json", 24)
        assert out.shape == (24, 24, 3)

    def test_garbage_raises_value_error(self):
        with pytest.raises(ValueError, match="could not decode"):
            decode_request_image(b"not an image", "image/png", 24)
        with pytest.raises(ValueError, match="bad JSON"):
            decode_request_image(b"{oops", "application/json", 24)


@pytest.fixture(scope="module")
def live_server():
    """Tiny real engine behind the real HTTP server on an ephemeral port."""
    import jax.numpy as jnp

    from clip_for_dl_tpu.core.config import ModelConfig
    from clip_for_dl_tpu.models import CXRClip
    from clip_for_dl_tpu.text import BertTokenizer, build_tiny_vocab
    from clip_for_dl_tpu.zeroshot import ZeroShotEngine, prompts_for_family

    size = 32
    cfg = ModelConfig(
        image_size=size, max_text_length=16, vocab_size=None,
        text_embedding_dim=32, text_layers=1, text_heads=2,
        text_intermediate_dim=64, shared_embedding_dim=32,
        resnet_stages=(1, 1, 1, 1), resnet_width=8,
    )
    tokenizer = BertTokenizer(build_tiny_vocab(
        "a chest x-ray of showing this is normal".split()
        + [w for d in DISEASE_LABELS for w in d.lower().split()]
    ))
    import dataclasses

    cfg = dataclasses.replace(cfg, vocab_size=len(tokenizer.vocab))
    model = CXRClip(cfg, dtype=jnp.float32)
    import jax

    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, size, size, 3)),
        jnp.zeros((1, 16), jnp.int32),
    )
    engine = ZeroShotEngine(
        model, variables, tokenizer, DISEASE_LABELS,
        image_size=size, max_text_length=16, compute_dtype=jnp.float32,
    )
    engine.build_text_features(
        prompts_for_family("basic", DISEASE_LABELS)
    )
    service = ZeroShotService(
        engine, DISEASE_LABELS, buckets=(1, 4), max_wait_ms=2.0,
        image_size=size,
    )
    server = create_server(service, "127.0.0.1", 0,
                           model_info={"image_size": size})
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield server.server_address
    server.shutdown()
    server.server_close()
    service.close()


def _request(addr, method, path, body=None, content_type="image/png"):
    conn = http.client.HTTPConnection(*addr, timeout=30)
    headers = {"Content-Type": content_type} if body else {}
    conn.request(method, path, body=body, headers=headers)
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    return resp.status, data


class TestHTTPAPI:
    def _png(self):
        import cv2

        img = np.random.default_rng(1).integers(
            0, 255, (48, 48, 3), dtype=np.uint8
        )
        return cv2.imencode(".png", img)[1].tobytes()

    def test_healthz(self, live_server):
        status, data = _request(live_server, "GET", "/healthz")
        assert status == 200
        assert data["status"] == "ok"
        assert data["diseases"] == list(DISEASE_LABELS)

    def test_predict_png(self, live_server):
        status, data = _request(live_server, "POST", "/predict", self._png())
        assert status == 200
        assert set(data["probs"]) == set(DISEASE_LABELS)
        assert all(0.0 <= p <= 1.0 for p in data["probs"].values())
        assert data["latency_ms"] > 0
        # predictions are exactly the above-threshold diseases
        assert set(data["predictions"]) == {
            d for d, p in data["probs"].items() if p > 0.5
        }

    def test_predict_json_b64(self, live_server):
        body = json.dumps(
            {"image_b64": base64.b64encode(self._png()).decode()}
        ).encode()
        status, data = _request(live_server, "POST", "/predict", body,
                                "application/json")
        assert status == 200 and set(data["probs"]) == set(DISEASE_LABELS)

    def test_bad_body_400(self, live_server):
        status, data = _request(live_server, "POST", "/predict", b"garbage")
        assert status == 400 and "could not decode" in data["error"]

    def test_empty_body_400(self, live_server):
        status, data = _request(live_server, "POST", "/predict")
        assert status == 400

    def test_unknown_route_404(self, live_server):
        status, _ = _request(live_server, "GET", "/nope")
        assert status == 404
        status, _ = _request(live_server, "POST", "/nope", b"x")
        assert status == 404

    def test_backlog_full_maps_to_429(self):
        # overload shedding surfaces as HTTP 429 + Retry-After, distinct
        # from the 500 an actual failure produces
        from clip_for_dl_tpu.serving import BacklogFull

        class SheddingService:
            image_size = 48
            disease_list = list(DISEASE_LABELS)

            class batcher:  # /stats route only
                @staticmethod
                def stats():
                    return {"shed": 1}

            def predict_one(self, image, timeout_s=30.0):
                raise BacklogFull("backlog at max_pending=2")

        server = create_server(SheddingService(), "127.0.0.1", 0,
                               model_info={})
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            conn = http.client.HTTPConnection(*server.server_address,
                                              timeout=30)
            conn.request("POST", "/predict", body=self._png(),
                         headers={"Content-Type": "image/png"})
            resp = conn.getresponse()
            data = json.loads(resp.read())
            assert resp.status == 429
            assert resp.getheader("Retry-After") == "1"
            assert "max_pending" in data["error"]
            conn.close()
        finally:
            server.shutdown()
            server.server_close()

    def test_stats_and_concurrent_load(self, live_server):
        png = self._png()
        with ThreadPoolExecutor(8) as pool:
            out = list(pool.map(
                lambda _: _request(live_server, "POST", "/predict", png),
                range(8),
            ))
        assert all(s == 200 for s, _ in out)
        # deterministic engine → identical probs for identical images,
        # whatever batch each request landed in
        first = out[0][1]["probs"]
        for _, data in out[1:]:
            for d in first:
                assert abs(first[d] - data["probs"][d]) < 1e-5
        status, stats = _request(live_server, "GET", "/stats")
        # >= 8: only THIS test's requests — counting siblings' traffic
        # through the shared live_server made the assertion order-dependent
        # (failed when the manifest excluded a sibling from the fast tier)
        assert status == 200 and stats["requests"] >= 8


class TestPipelinedBatcher:
    """VERDICT r1 item 7: device compute must overlap next-batch assembly,
    and the latency components must be reported, not guessed."""

    def test_dispatch_overlaps_fetch(self):
        """With a slow fetch (device busy), the assembler must dispatch
        batch N+1 BEFORE batch N's fetch completes — the double buffer."""
        events = []
        lock = threading.Lock()

        def dispatch(images):  # fast, like an async jax call
            with lock:
                events.append(("dispatch", time.monotonic()))
            return images.sum(axis=(1, 2, 3))

        def fetch(handle):  # slow, like device compute + tunnel fetch
            time.sleep(0.08)
            with lock:
                events.append(("fetch_done", time.monotonic()))
            return np.asarray(handle)

        batcher = MicroBatcher(
            dispatch, buckets=(1,), max_wait_ms=0.5, fetch_fn=fetch
        )
        try:
            imgs = [np.full((4, 4, 3), i, np.uint8) for i in range(3)]
            futs = [batcher.submit(im) for im in imgs]
            results = [f.result(timeout=10) for f in futs]
            for i, r in enumerate(results):
                assert r == imgs[i].sum()
            with lock:
                seq = list(events)
            dispatches = [t for k, t in seq if k == "dispatch"]
            fetches = [t for k, t in seq if k == "fetch_done"]
            assert len(dispatches) == 3 and len(fetches) == 3
            # batch 1 dispatched while batch 0 still fetching: its dispatch
            # timestamp precedes batch 0's fetch completion
            assert dispatches[1] < fetches[0], (
                "assembler waited for the fetch — compute idle during "
                "assembly, no overlap"
            )
        finally:
            batcher.close()

    def test_stats_expose_latency_breakdown(self):
        batcher = MicroBatcher(
            lambda x: x.sum(axis=(1, 2, 3)), buckets=(1, 4), max_wait_ms=1.0
        )
        try:
            futs = [
                batcher.submit(np.zeros((4, 4, 3), np.uint8))
                for _ in range(5)
            ]
            for f in futs:
                f.result(timeout=10)
            stats = batcher.stats()
            for stage in ("queue_ms", "assemble_ms", "fetch_ms"):
                assert stage in stats and "p50" in stats[stage], stats
                assert stats[stage]["p99"] >= stats[stage]["p50"] >= 0.0
            # achieved-occupancy histogram: 5 requests, pre-padding sizes,
            # counts sum to the request total
            hist = stats["batch_size_hist"]
            assert sum(int(k) * v for k, v in hist.items()) == 5, stats
        finally:
            batcher.close()

    def test_error_in_fetch_fails_callers_only(self):
        calls = {"n": 0}

        def bad_fetch(handle):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("transient fetch failure")
            return np.asarray(handle)

        batcher = MicroBatcher(
            lambda x: x.sum(axis=(1, 2, 3)), buckets=(1,), max_wait_ms=0.5,
            fetch_fn=bad_fetch,
        )
        try:
            f1 = batcher.submit(np.zeros((4, 4, 3), np.uint8))
            with pytest.raises(RuntimeError, match="transient"):
                f1.result(timeout=10)
            # the worker survives and serves the next request
            f2 = batcher.submit(np.ones((4, 4, 3), np.uint8))
            assert f2.result(timeout=10) == 48
        finally:
            batcher.close()


class TestPerDiseaseThresholds:
    """Calibrated thresholds (zeroshot --dynamic → thresholds.json) applied
    per disease in the serving prediction set."""

    class _StubEngine:
        def __init__(self, probs_row):
            self._row = np.asarray(probs_row, np.float32)

        def probs(self, images_u8):
            return np.tile(self._row, (len(images_u8), 1))

    def _service(self, threshold):
        row = np.linspace(0.1, 0.9, len(DISEASE_LABELS))
        return (
            ZeroShotService(
                self._StubEngine(row), DISEASE_LABELS,
                threshold=threshold, buckets=(1,), max_wait_ms=1.0,
                image_size=8,
            ),
            row,
        )

    def test_scalar_threshold_unchanged(self):
        service, row = self._service(0.5)
        try:
            out = service.predict_one(np.zeros((8, 8, 3), np.uint8))
            want = {d for d, p in zip(DISEASE_LABELS, row) if p > 0.5}
            assert set(out["predictions"]) == want
        finally:
            service.close()

    def test_dict_threshold_per_disease_with_default(self):
        # strict threshold for the highest-prob disease, lax for the lowest;
        # everything else defaults to 0.5
        lo, hi = DISEASE_LABELS[0], DISEASE_LABELS[-1]
        service, row = self._service({hi: 0.95, lo: 0.05})
        try:
            out = service.predict_one(np.zeros((8, 8, 3), np.uint8))
            preds = set(out["predictions"])
            assert hi not in preds          # 0.9 < 0.95
            assert lo in preds              # 0.1 > 0.05
            mids = {d for d, p in zip(DISEASE_LABELS, row)
                    if d not in (lo, hi) and p > 0.5}
            assert mids <= preds
        finally:
            service.close()
