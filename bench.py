"""Benchmark: zero-shot chest X-ray prediction throughput (images/sec/chip).

Baseline: the reference's zero-shot eval runs at ~25 img/s on an RTX A5000
(BASELINE.md: 902 imgs / 36 s, bs 16, fp32, per-batch python loops) — and
that number is END-TO-END (decode→prediction, 02 nb cell 42). Here the
identical workload — ResNet-50 image tower → 512-d projection →
L2-normalize → similarity against 16 disease prompt features → sigmoid
probabilities — runs as one jitted bf16 XLA program, and the default run
reports THREE tiers in one JSON line:

- the headline compute-only rate (HBM-resident uint8 batch, cached text
  features — the chip's ceiling for the program);
- ``e2e``: a SUSTAINED loop through the real serving data path — uint8
  memmap image cache (data/cache.py, built once from synthetic PNGs) →
  double-buffered ``prefetch_to_device`` H2D → device compute → per-batch
  D2H fetch of the probabilities (serving semantics: predictions land on
  the host) — with a device-busy fraction measured from a profiler trace
  and per-stage attribution (host cache read rate, H2D bandwidth) when
  the gap to compute-only is environment-bound (in THIS container: 1 CPU
  core + ~30-80 MB/s axon-tunnel H2D; on a TPU VM the same loop is
  compute-bound);
- ``vit_fused_fast``: the ViT-B/16 serving ceiling with the Pallas fused
  MLP block and tanh GELU composed (VERDICT r2 item 8);
- ``pretrain_flash``: the TRAINING headline — ResNet-50+BERT CLIP
  pretrain step (B=128 seq200) with the r3 Pallas training kernels
  (``--flash-attention --bert-fused-mlp``), run via tools/train_bench.py
  in a subprocess against the reference's 17.7 img/s train anchor
  (02 nb cell 25). Skipped (with a note) if its compile misses the
  persistent cache and exceeds the row budget.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_SEC = 25.0  # 02 nb cell 42: 902 imgs / 36 s on A5000
BATCH = 256
WARMUP = 3
ITERS = 30


def build_zero_shot(tower: str, batch_n: int, *, fast_gelu=False,
                    fused_mlp=False,
                    flash_attention=False, compiler_options=None,
                    channels: int = 3, gather_n: int = 0, scan_k: int = 0):
    """Compile the zero-shot program; returns (compiled, args, mfu_fn).

    gather_n > 0: the DEVICE-CACHE form — the program takes the whole
    HBM-resident [gather_n, 224, 224, C] uint8 dataset plus an int32
    [batch] index vector and gathers the batch ON DEVICE before the
    forward (jnp.take fused into the same XLA program: one dispatch per
    batch, steady-state H2D = the indices). Same weights/text features
    (seed-pinned) as the streaming form, so predictions are comparable
    bit-for-bit."""
    from clip_for_dl_tpu.core.config import CLIP_MEAN, CLIP_STD, ModelConfig
    from clip_for_dl_tpu.models import CXRClip
    from clip_for_dl_tpu.ops.image_prep import preprocess_images
    from clip_for_dl_tpu.ops.similarity import similarity

    cfg = ModelConfig(
        max_text_length=64,
        vit_gelu_approximate=fast_gelu,
        vit_fused_mlp=fused_mlp,
        flash_attention=flash_attention,
    )
    if tower == "vit":
        cfg = cfg.with_vit()
    model = CXRClip(cfg, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.bfloat16),
        jnp.zeros((1, 64), jnp.int32),
    )

    # 16 disease text features: encoded once by the text tower (cached for
    # the whole eval in the real pipeline — reproduce that here).
    ids = jax.random.randint(jax.random.key(1), (16, 64), 0, cfg.vocab_size)
    mask = jnp.ones((16, 64), jnp.int32)
    text_features = jax.jit(
        lambda v, i, m: model.apply(v, i, m, normalize=True, method="encode_text")
    )(variables, ids, mask)
    text_features = jax.block_until_ready(text_features)

    use_pallas = jax.default_backend() == "tpu"

    @jax.jit
    def zero_shot_fn(variables, images_u8, text_features):
        x = preprocess_images(
            images_u8, 224, 224, CLIP_MEAN, CLIP_STD, jnp.bfloat16
        )
        feats = model.apply(variables, x, normalize=True, method="encode_image")
        logits = similarity(
            feats.astype(jnp.float32), text_features.astype(jnp.float32),
            temperature=0.5, use_pallas=use_pallas,
        )
        return jax.nn.sigmoid(logits)

    if gather_n:
        if scan_k:
            # offline-eval form: ONE dispatch scores K consecutive
            # batches (lax.scan keeps the per-step batch at the optimal
            # B) and ONE D2H ships [K, B, 16] — amortizes this
            # container's ~50 ms dispatch RTT K-fold. Semantics: results
            # land on the host per K batches, which is exactly the
            # reference's offline zero-shot eval workload (02 nb cell
            # 42), not the per-batch serving contract.
            @jax.jit
            def zero_shot_scan_fn(variables, data_u8, idx_k, text_features):
                def one(_, idx):
                    images_u8 = jnp.take(data_u8, idx, axis=0, mode="clip")
                    return None, zero_shot_fn(
                        variables, images_u8, text_features
                    )

                _, probs = jax.lax.scan(one, None, idx_k)
                return probs

            data = jax.ShapeDtypeStruct(
                (gather_n, 224, 224, channels), jnp.uint8
            )
            idx = jax.ShapeDtypeStruct((scan_k, batch_n), jnp.int32)
            compiled = zero_shot_scan_fn.lower(
                variables, data, idx, text_features
            ).compile(compiler_options=compiler_options)
            return compiled, (variables, text_features)

        @jax.jit
        def zero_shot_gather_fn(variables, data_u8, idx, text_features):
            images_u8 = jnp.take(data_u8, idx, axis=0, mode="clip")
            return zero_shot_fn(variables, images_u8, text_features)

        data = jax.ShapeDtypeStruct(
            (gather_n, 224, 224, channels), jnp.uint8
        )
        idx = jax.ShapeDtypeStruct((batch_n,), jnp.int32)
        compiled = zero_shot_gather_fn.lower(
            variables, data, idx, text_features
        ).compile(compiler_options=compiler_options)
        return compiled, (variables, text_features)

    images = jax.device_put(
        np.random.default_rng(0).integers(
            0, 255, (batch_n, 224, 224, channels), dtype=np.uint8
        )
    )
    compiled = zero_shot_fn.lower(variables, images, text_features).compile(
        compiler_options=compiler_options
    )
    return compiled, (variables, images, text_features)


def measure_compute(compiled, args, batch_n: int):
    """Compute-only rate on the HBM-resident batch."""
    for _ in range(WARMUP):
        np.asarray(compiled(*args))
    t0 = time.perf_counter()
    probs = None
    for _ in range(ITERS):
        probs = compiled(*args)
    # fetch the result to fence the timing (block_until_ready does not
    # reliably block through the axon tunnel)
    np.asarray(probs)
    dt = time.perf_counter() - t0
    return batch_n * ITERS / dt


def measure_train(timeout_s: float, phase: str = "pretrain") -> dict:
    """A training row: tools/train_bench.py in a subprocess (fresh process
    = clean device). phase="pretrain" is the ResNet-50+BERT CLIP step
    (B=128 seq200) with the r3 Pallas training kernels — the 17.7 img/s
    reference anchor; phase="adapter" is the frozen-backbone phase-B head
    step — the 26.6 img/s anchor (02 nb cell 29). The persistent compile
    cache (enabled above) makes repeat runs cheap; a cold compile takes
    ~10 min, so a timeout returns a note instead of sinking the bench."""
    import subprocess
    import sys

    cmd = [
        sys.executable,
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "tools", "train_bench.py"),
        "--batch-size", "128", "--iters", "20", "--phase", phase,
    ]
    if phase == "pretrain":
        cmd += ["--seq-lens", "200", "--flash-attention", "--bert-fused-mlp"]
    try:
        proc = subprocess.run(
            cmd, timeout=timeout_s, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
    except subprocess.TimeoutExpired:
        return {"skipped": f"cold compile exceeded {timeout_s:.0f}s budget"}
    out = proc.stdout.decode(errors="replace")
    for line in reversed(out.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            row = json.loads(line)
            return {
                "value": row["value"],
                "unit": row["unit"],
                "batch": row["batch"],
                "seq_len": row["seq_len"],
                # pretrain: 17.7 img/s anchor; adapter: 26.6 img/s anchor
                "vs_baseline_train": row["vs_baseline"],
                **{k: row[k] for k in
                   ("mfu_pct", "tflops_per_sec", "gflops_per_item",
                    "hbm_temp_gb")
                   if k in row},
            }
    return {"skipped": f"train_bench failed: {out[-300:]}"}


def _make_cache(n_images: int, image_size: int = 224):
    """Synthetic GRAYSCALE PNGs at drill geometry → the uint8 memmap cache.

    Indiana CXR sources are 8-bit grayscale PNGs (the reference triplicates
    them to RGB at decode, 0425/prepare_data.py:65-90); the cache builder
    detects that per file and packs one channel per pixel — a third of the
    bytes on disk and over H2D (data/cache.py)."""
    import cv2

    from clip_for_dl_tpu.data.cache import build_image_cache

    root = tempfile.mkdtemp(prefix="bench_e2e_")
    img_dir = os.path.join(root, "img")
    os.makedirs(img_dir)
    rng = np.random.default_rng(42)
    paths = []
    for i in range(n_images):
        p = os.path.join(img_dir, f"CXR{i}_IM.dcm.png")
        cv2.imwrite(p, rng.integers(20, 235, (256, 208), dtype=np.uint8))
        paths.append(p)
    t0 = time.perf_counter()
    cache = build_image_cache(
        paths, image_size, os.path.join(root, "cache"), workers=4
    )
    return cache, time.perf_counter() - t0


def measure_e2e(compiled, variables, text_features, batch_n: int,
                seconds: float = 30.0, n_images: int = 512,
                rgb_compiled=None):
    """Sustained cache→H2D→device→D2H loop + per-stage attribution.

    `compiled` must accept the cache's channel count (1 for gray-packed).
    When `rgb_compiled` (the 3-channel program) is given, one batch is run
    through BOTH paths — gray-packed H2D + on-device broadcast vs
    triplicated-RGB H2D — and the predictions are asserted bit-identical;
    the result is reported as `gray_pred_identical`."""
    from clip_for_dl_tpu.data.cache import DATA_NAME
    from clip_for_dl_tpu.data.loader import prefetch_to_device
    from clip_for_dl_tpu.utils.profiling import trace
    from clip_for_dl_tpu.utils.trace_report import device_op_table

    cache, build_s = _make_cache(n_images)
    c = cache.channels
    arr = np.memmap(
        os.path.join(cache.directory, DATA_NAME), dtype=np.uint8,
        mode="r", shape=(len(cache), cache.image_size, cache.image_size, c),
    )

    def host_iter(limit=None):
        i, n = 0, len(arr)
        while limit is None or i < limit:
            lo = (i * batch_n) % n
            idx = (np.arange(batch_n) + lo) % n
            yield {"images": np.ascontiguousarray(arr[idx])}
            i += 1

    # stage: host cache-read rate alone (memmap gather + copy)
    t0 = time.perf_counter()
    for _ in host_iter(limit=8):
        pass
    host_rate = 8 * batch_n / (time.perf_counter() - t0)

    # stage: H2D bandwidth (device_put + on-device touch + tiny fetch)
    touch = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    batch0 = next(host_iter(limit=1))["images"]
    np.asarray(touch(jax.device_put(batch0)))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(4):
        np.asarray(touch(jax.device_put(batch0)))
    h2d_s = (time.perf_counter() - t0) / 4
    h2d_mb_s = batch0.nbytes / 2**20 / h2d_s

    # gray-ingest correctness gate: 1-channel H2D + device broadcast must
    # produce the SAME bytes as triplicated-RGB H2D (VERDICT r3 item 1)
    gray_identical = None
    if rgb_compiled is not None and c == 1:
        p_gray = np.asarray(compiled(variables, batch0, text_features))
        p_rgb = np.asarray(
            rgb_compiled(variables, np.repeat(batch0, 3, axis=-1),
                         text_features)
        )
        gray_identical = bool((p_gray == p_rgb).all())
        # a real gate, not a report: the gray-packed path's whole claim
        # is bit-identity with the triplicated-RGB program
        assert gray_identical, (
            "gray-packed predictions diverged from the RGB program "
            f"(max|d| {abs(p_gray - p_rgb).max()})"
        )

    # sustained loop: PIPELINED — a producer thread owns host-read +
    # device_put (H2D overlaps everything), the consumer keeps a small
    # in-flight window of dispatched batches and fetches with lag 2, so
    # the per-batch D2H probability fetch (serving semantics — every
    # prediction lands on the host) never serializes against the next
    # batch's H2D. In-line prefetch measured 306.7 img/s on this tunnel;
    # this loop is what the serving MicroBatcher does internally.
    from collections import deque

    lag = 3
    it = prefetch_to_device(host_iter(), threaded=True, depth=lag)
    for _ in range(2):  # warm the pipeline
        np.asarray(compiled(variables, next(it)["images"], text_features))
    t0 = time.perf_counter()
    n_done = 0
    inflight = deque()
    for batch in it:
        inflight.append(compiled(variables, batch["images"], text_features))
        if len(inflight) >= lag:
            np.asarray(inflight.popleft())
            n_done += batch_n
        if time.perf_counter() - t0 >= seconds:
            break
    while inflight:  # drain: count only results actually on host
        np.asarray(inflight.popleft())
        n_done += batch_n
    wall = time.perf_counter() - t0
    e2e_rate = n_done / wall

    # device-busy fraction: profiler trace over a slice of the same loop
    log_dir = tempfile.mkdtemp(prefix="bench_e2e_trace_")
    it2 = prefetch_to_device(host_iter(), threaded=True, depth=lag)
    t0 = time.perf_counter()
    with trace(log_dir):
        for _ in range(6):
            np.asarray(
                compiled(variables, next(it2)["images"], text_features)
            )
    slice_wall_ms = (time.perf_counter() - t0) * 1e3
    try:
        device_ms = device_op_table(log_dir)["device_total_ms"]
        busy = min(1.0, device_ms / slice_wall_ms)
    except Exception:
        busy = None

    out = {
        "img_per_sec": round(e2e_rate, 1),
        "seconds": round(wall, 1),
        "n_images": n_done,
        "cache_images": n_images,
        "cache_build_s": round(build_s, 1),
        "device_busy_frac": None if busy is None else round(busy, 3),
        "host_cache_read_img_s": round(host_rate, 1),
        "h2d_mb_per_s": round(h2d_mb_s, 1),
        "batch_mb": round(batch0.nbytes / 2**20, 1),
        "cache_channels": c,
    }
    if gray_identical is not None:
        out["gray_pred_identical"] = gray_identical
    return out


def measure_e2e_device_cache(tower: str, batch_n: int,
                             seconds: float = 30.0, n_images: int = 512,
                             rgb_compiled=None, rgb_args=None,
                             compiler_options=None):
    """Sustained loop with the DATASET RESIDENT IN HBM (VERDICT r4 item 1).

    The gray-packed uint8 cache is uploaded once; every batch is gathered
    on device by a host-supplied index vector fused into the zero-shot
    program — steady-state H2D is ~1 KB of indices instead of ~12.8 MB of
    pixels, so the loop is compute-bound where the streaming form is
    tunnel-bound. Predictions are asserted bit-identical to the
    triplicated-RGB streaming program on one batch (same seed-pinned
    weights)."""
    from collections import deque

    from clip_for_dl_tpu.data.cache import DATA_NAME
    from clip_for_dl_tpu.utils.profiling import trace
    from clip_for_dl_tpu.utils.trace_report import device_op_table

    cache, build_s = _make_cache(n_images)
    c = cache.channels
    arr = np.memmap(
        os.path.join(cache.directory, DATA_NAME), dtype=np.uint8,
        mode="r", shape=(len(cache), cache.image_size, cache.image_size, c),
    )
    compiled, (variables, text_features) = build_zero_shot(
        tower, batch_n, compiler_options=compiler_options, channels=c,
        gather_n=n_images,
    )

    # one-time upload of the whole dataset
    host = np.asarray(arr)
    t0 = time.perf_counter()
    data = jax.device_put(host)
    np.asarray(jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))(data))  # fence
    upload_s = time.perf_counter() - t0
    upload_mb = host.nbytes / 2**20

    # bit-identity gate vs the triplicated-RGB streaming program
    gray_identical = None
    if rgb_compiled is not None and c == 1:
        idx0 = np.arange(batch_n, dtype=np.int32) % n_images
        p_dev = np.asarray(compiled(variables, data, idx0, text_features))
        p_rgb = np.asarray(rgb_compiled(
            rgb_args[0], np.repeat(host[idx0], 3, axis=-1), rgb_args[2]
        ))
        gray_identical = bool((p_dev == p_rgb).all())
        assert gray_identical, (
            "device-cache gathered predictions diverged from the "
            f"streamed RGB program (max|d| {abs(p_dev - p_rgb).max()})"
        )

    # sustained loop: epoch-shuffled index batches, in-flight window with
    # lag-3 D2H fetches (serving semantics — every prediction lands on
    # the host)
    rng = np.random.default_rng(7)

    def idx_stream():
        # modular wrap like measure_e2e.host_iter: batch_n > n_images
        # must still yield (repeated rows), not spin forever
        while True:
            order = rng.permutation(n_images).astype(np.int32)
            for s in range(0, max(n_images - batch_n + 1, 1), batch_n):
                yield order[(np.arange(batch_n) + s) % n_images]

    it = idx_stream()
    for _ in range(2):  # warm
        np.asarray(compiled(variables, data, next(it), text_features))
    lag = 3
    t0 = time.perf_counter()
    n_done = 0
    inflight = deque()
    while True:
        inflight.append(compiled(variables, data, next(it), text_features))
        if len(inflight) >= lag:
            np.asarray(inflight.popleft())
            n_done += batch_n
        if time.perf_counter() - t0 >= seconds:
            break
    while inflight:
        np.asarray(inflight.popleft())
        n_done += batch_n
    wall = time.perf_counter() - t0
    rate = n_done / wall

    # device-busy fraction over a slice of the same PIPELINED loop — a
    # synchronous fetch-per-batch slice would measure the ~50 ms tunnel
    # RTT, not the loop being benchmarked (lag-3 in-flight window keeps
    # dispatches ahead of fetches exactly like the timed loop above)
    log_dir = tempfile.mkdtemp(prefix="bench_devcache_trace_")
    t0 = time.perf_counter()
    with trace(log_dir):
        fl = deque()
        for _ in range(12):
            fl.append(compiled(variables, data, next(it), text_features))
            if len(fl) >= lag:
                np.asarray(fl.popleft())
        while fl:
            np.asarray(fl.popleft())
    slice_wall_ms = (time.perf_counter() - t0) * 1e3
    try:
        device_ms = device_op_table(log_dir)["device_total_ms"]
        busy = min(1.0, device_ms / slice_wall_ms)
    except Exception:
        busy = None

    # offline-eval form: one dispatch scores K batches (scan), one D2H
    # ships [K, B, 16] — the remaining per-batch gap above is dispatch/
    # fetch RTT, and the reference's own zero-shot eval (02 nb cell 42)
    # is exactly this offline workload
    K = 8
    scan_compiled, (sv, stf) = build_zero_shot(
        tower, batch_n, compiler_options=compiler_options, channels=c,
        gather_n=n_images, scan_k=K,
    )

    def idx_k():
        return np.stack([next(it) for _ in range(K)])

    np.asarray(scan_compiled(sv, data, idx_k(), stf))  # warm
    # the scan-compiled tower schedules differently from the standalone
    # program, so bf16 results differ at schedule-noise scale rather
    # than being bit-identical like the gather form (measured 2.2e-4 in
    # probability space vs bf16's ~8e-3 resolution) — report the delta
    scan_max_dprob = None
    if rgb_compiled is not None and c == 1:
        i0 = np.arange(batch_n, dtype=np.int32) % n_images
        ik = np.tile(i0, (K, 1))
        pk = np.asarray(scan_compiled(sv, data, ik, stf))
        pr = np.asarray(rgb_compiled(
            rgb_args[0], np.repeat(host[i0], 3, axis=-1), rgb_args[2]
        ))
        scan_max_dprob = float(np.abs(pk - pr[None]).max())
    t0 = time.perf_counter()
    n_scan = 0
    fl = deque()
    while True:
        fl.append(scan_compiled(sv, data, idx_k(), stf))
        if len(fl) >= 2:
            np.asarray(fl.popleft())
            n_scan += batch_n * K
        if time.perf_counter() - t0 >= seconds / 2:
            break
    while fl:
        np.asarray(fl.popleft())
        n_scan += batch_n * K
    scan_wall = time.perf_counter() - t0
    scan_rate = n_scan / scan_wall

    out = {
        "img_per_sec": round(rate, 1),
        "seconds": round(wall, 1),
        "n_images": n_done,
        "cache_images": n_images,
        "resident_mb": round(upload_mb, 1),
        "upload_s": round(upload_s, 2),
        "h2d_per_batch_bytes": batch_n * 4,  # the index vector
        "device_busy_frac": None if busy is None else round(busy, 3),
        "vs_baseline_e2e": round(rate / BASELINE_IMG_PER_SEC, 2),
        "cache_channels": c,
        "offline_eval_scan8": {
            "img_per_sec": round(scan_rate, 1),
            "vs_baseline_e2e": round(scan_rate / BASELINE_IMG_PER_SEC, 2),
            "n_images": n_scan,
            **({} if scan_max_dprob is None
               else {"max_abs_dprob_vs_streamed": scan_max_dprob}),
        },
    }
    if gray_identical is not None:
        out["gray_pred_identical"] = gray_identical
    return out


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tower", choices=["resnet", "vit"], default=None,
                   help="single-tower mode (skips the default multi-row "
                        "report); default: resnet headline + e2e + "
                        "vit-fused-fast rows in one line")
    p.add_argument("--fast-gelu", action="store_true",
                   help="tanh-GELU in the ViT tower (serving knob)")
    p.add_argument("--fused-mlp", action="store_true",
                   help="Pallas fused MLP block in the ViT layers "
                        "(exact-GELU, 3.5x the XLA composition)")
    p.add_argument("--flash-attention", action="store_true",
                   help="fused Pallas flash attention in the towers "
                        "(the TRAINING kernel; measurable here for the "
                        "inference tradeoff)")
    p.add_argument("--e2e", action="store_true",
                   help="with --tower: also run the sustained "
                        "cache→H2D→device loop for that tower")
    p.add_argument("--no-e2e", action="store_true",
                   help="default mode: skip the sustained e2e loop")
    p.add_argument("--no-vit", action="store_true",
                   help="default mode: skip the ViT fused+fast-gelu row")
    p.add_argument("--no-pretrain", action="store_true",
                   help="default mode: skip the pretrain training row")
    p.add_argument("--pretrain-timeout", type=float, default=1500.0,
                   help="seconds allowed for the pretrain row (compile "
                        "rehits the persistent cache in ~seconds; a cold "
                        "compile takes ~10 min)")
    p.add_argument("--e2e-seconds", type=float, default=30.0)
    p.add_argument("--batch", type=int, default=BATCH)
    p.add_argument("--compiler-options", default=None, metavar="JSON",
                   help="JSON dict of XLA backend compiler options passed "
                        "to .compile() (the TPU-flag path that works "
                        "through the axon tunnel — XLA_FLAGS TPU flags "
                        "are rejected by the local client parse)")
    args = p.parse_args(argv)
    compiler_options = (
        json.loads(args.compiler_options) if args.compiler_options else None
    )
    batch_n = args.batch

    from clip_for_dl_tpu.core.compile_cache import ENV_VAR, enable_from_env

    # default the persistent compile cache ON for the benchmark (repeat
    # runs rehit the compiled executable from disk instead of paying the
    # remote compile); opt out with CLIP_FOR_DL_TPU_COMPILE_CACHE=""
    os.environ.setdefault(
        ENV_VAR,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache"),
    )
    enable_from_env()
    from clip_for_dl_tpu.utils.mfu import mfu_fields

    if args.tower is not None:
        # single-tower mode (previous CLI contract)
        compiled, fn_args = build_zero_shot(
            args.tower, batch_n, fast_gelu=args.fast_gelu,
            fused_mlp=args.fused_mlp,
            flash_attention=args.flash_attention,
            compiler_options=compiler_options,
        )
        rate = measure_compute(compiled, fn_args, batch_n)
        row = {
            "metric": "zero-shot images/sec/chip (Indiana CXR pipeline, "
                      "compute-only: HBM-resident batch, cached text "
                      "features)",
            "tower": args.tower,
            "value": round(rate, 1),
            "unit": "images/sec",
            "vs_baseline": round(rate / BASELINE_IMG_PER_SEC, 2),
            **mfu_fields(compiled, batch_n, rate / batch_n),
        }
        if args.e2e:
            gray_compiled, gray_args = build_zero_shot(
                args.tower, batch_n, fast_gelu=args.fast_gelu,
                fused_mlp=args.fused_mlp,
                flash_attention=args.flash_attention,
                compiler_options=compiler_options, channels=1,
            )
            row["e2e"] = measure_e2e(
                gray_compiled, gray_args[0], gray_args[2], batch_n,
                seconds=args.e2e_seconds, rgb_compiled=compiled,
            )
            row["e2e"]["frac_of_compute"] = round(
                row["e2e"]["img_per_sec"] / rate, 3
            )
        print(json.dumps(row))
        return

    # default: full report in one line
    compiled, fn_args = build_zero_shot(
        "resnet", batch_n, compiler_options=compiler_options
    )
    rate = measure_compute(compiled, fn_args, batch_n)
    row = {
        "metric": "zero-shot images/sec/chip (Indiana CXR pipeline, "
                  "compute-only: HBM-resident batch, cached text features)",
        "tower": "resnet",
        "value": round(rate, 1),
        "unit": "images/sec",
        "vs_baseline": round(rate / BASELINE_IMG_PER_SEC, 2),
        **mfu_fields(compiled, batch_n, rate / batch_n),
    }
    if not args.no_e2e:
        # reference's 25 img/s is end-to-end; this is our end-to-end.
        # The sustained loop ships the gray-packed single-channel batches
        # (the real CXR workload shape); the 3-channel program double-checks
        # prediction bit-identity on one batch.
        gray_compiled, gray_args = build_zero_shot(
            "resnet", batch_n, compiler_options=compiler_options, channels=1,
        )
        row["e2e"] = measure_e2e(
            gray_compiled, gray_args[0], gray_args[2], batch_n,
            seconds=args.e2e_seconds, rgb_compiled=compiled,
        )
        row["e2e"]["frac_of_compute"] = round(
            row["e2e"]["img_per_sec"] / rate, 3
        )
        row["e2e"]["vs_baseline_e2e"] = round(
            row["e2e"]["img_per_sec"] / BASELINE_IMG_PER_SEC, 2
        )
        # e2e with the dataset RESIDENT IN HBM: batches gathered on
        # device by index, steady-state H2D = the index vector — the
        # whole Indiana set is ~225 MB gray-packed vs 16 GB of v5e HBM
        # (VERDICT r4 item 1; CLI: --device-cache)
        row["e2e_device_cache"] = measure_e2e_device_cache(
            "resnet", batch_n, seconds=args.e2e_seconds,
            rgb_compiled=compiled, rgb_args=fn_args,
            compiler_options=compiler_options,
        )
        # the sustained-vs-ceiling ratio is the honest utilization figure
        # here: the trace-slice busy fraction under-reads on this tunnel
        # (profiler window edges + ~50 ms dispatch RTT inside a short
        # 12-batch slice), while the 30 s loop itself sustains this
        # fraction of the compute-only rate
        row["e2e_device_cache"]["frac_of_compute"] = round(
            row["e2e_device_cache"]["img_per_sec"] / rate, 3
        )
    if not args.no_pretrain:
        row["pretrain_flash"] = measure_train(args.pretrain_timeout,
                                              "pretrain")
        # the phase-B frozen-backbone head step (26.6 img/s anchor) —
        # driver-captured like the pretrain row (VERDICT r4 item 5)
        row["adapter_train"] = measure_train(args.pretrain_timeout,
                                             "adapter")
    if not args.no_vit:
        vt_compiled, vt_args = build_zero_shot(
            "vit", batch_n, fast_gelu=True, fused_mlp=True,
            compiler_options=compiler_options,
        )
        vrate = measure_compute(vt_compiled, vt_args, batch_n)
        row["vit_fused_fast"] = {
            "value": round(vrate, 1),
            "vs_baseline": round(vrate / 15.2, 2),  # vit nb cell 25 anchor
            **mfu_fields(vt_compiled, batch_n, vrate / batch_n),
        }
    print(json.dumps(row))


if __name__ == "__main__":
    main()
