"""End-to-end host-pipeline throughput: disk → decode → H2D → TPU zero-shot.

bench.py measures the compute ceiling on HBM-resident batches; this tool
measures the whole pipeline the way a real eval runs it (reference path:
0425/prepare_data.py DataLoader workers + cv2 decode feeding the GPU loop):

  PNGs on disk → HostLoader threaded native-libpng decode → buffered H2D
  (data/loader.py prefetch_to_device) → jitted resize+normalize+ResNet50+
  similarity zero-shot step.

Three pipeline layouts are measured:
  device-resize  decode at stored resolution, ship uint8, resize+normalize
                 on the TPU (the north-star input-fusion layout; H2D scales
                 with source resolution)
  host-resize    decode + native C++ threaded resize to 224 on the host
                 (native/bindings.py batch_resize_u8), ship the small uint8
                 batch, normalize on device (minimum H2D bytes)
  cached         one-time decode into a uint8 memmap (data/cache.py,
                 `cache-images` CLI); epochs read preprocessed rows at
                 disk/page-cache bandwidth — zero per-epoch decode work
                 (the layout real multi-epoch runs should use)

Also reports the host-only decode rate (loader iterated with no device
work) and the raw H2D bandwidth, so the bottleneck — host decode vs H2D vs
TPU compute — is visible by comparison with bench.py's compute-only number.

Environment caveat: through a tunneled transport (axon) H2D runs at network
speed (~30 MB/s measured), not PCIe speed, and this container has 1 CPU
core — so absolute numbers here characterize the tunnel, not a TPU VM. The
h2d_MBps / host_decode_img_s fields make that attribution explicit: on a
real TPU VM (H2D ≥ 10 GB/s, tens of cores) the same pipeline is
compute-bound at bench.py's number until the host runs out of decode
threads.

Usage: python tools/host_pipeline_bench.py [--num-images 2048]
       [--stored-size 512] [--batch-size 256] [--threads 8] [--epochs 2]
       [--mode device-resize host-resize] [--tiny]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import tempfile
import time


def _write_pngs(root: str, n: int, size: int) -> list:
    """Deterministic synthetic radiographs as real PNG files."""
    import cv2
    import numpy as np

    from clip_for_dl_tpu.data.synthetic import synthetic_image

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        img = synthetic_image(rng, size=size)
        path = os.path.join(root, f"img_{i:05d}.png")
        cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        paths.append(path)
    return paths


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-images", type=int, default=2048)
    p.add_argument("--stored-size", type=int, default=512,
                   help="resolution of the PNGs on disk")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--threads", type=int, default=8)
    p.add_argument("--epochs", type=int, default=2,
                   help="timed epochs (first full epoch warms the compile)")
    p.add_argument("--mode", nargs="+",
                   default=["device-resize", "host-resize", "cached"],
                   choices=["device-resize", "host-resize", "cached"])
    p.add_argument("--tiny", action="store_true",
                   help="tiny model/shapes for CI smoke")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke runs; the tunneled "
                        "axon backend hangs when no TPU is attached)")
    args = p.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from clip_for_dl_tpu.core.config import CLIP_MEAN, CLIP_STD, ModelConfig
    from clip_for_dl_tpu.data.loader import HostLoader, prefetch_to_device
    from clip_for_dl_tpu.data.datasets import ImageMultiLabelDataset
    from clip_for_dl_tpu.data.synthetic import synthetic_labels
    from clip_for_dl_tpu.models import CXRClip
    from clip_for_dl_tpu.native import bindings as native
    from clip_for_dl_tpu.ops.image_prep import preprocess_images
    from clip_for_dl_tpu.ops.similarity import similarity

    if args.tiny:
        args.num_images = min(args.num_images, 32)
        args.stored_size = min(args.stored_size, 64)
        args.batch_size = min(args.batch_size, 8)
    args.epochs = max(1, args.epochs)
    if args.num_images < args.batch_size:
        p.error(f"--num-images {args.num_images} must be >= "
                f"--batch-size {args.batch_size} (full batches are timed)")

    image_size = 64 if args.tiny else 224
    cfg = (
        ModelConfig(
            image_size=image_size, max_text_length=16, vocab_size=64,
            text_embedding_dim=32, text_layers=1, text_heads=2,
            text_intermediate_dim=64, shared_embedding_dim=64,
            resnet_stages=(1, 1, 1, 1), resnet_width=8,
        )
        if args.tiny
        else ModelConfig(max_text_length=64)
    )
    model = CXRClip(cfg, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((1, image_size, image_size, 3), jnp.bfloat16),
        jnp.zeros((1, cfg.max_text_length), jnp.int32),
    )
    ids = jax.random.randint(
        jax.random.key(1), (16, cfg.max_text_length), 0, cfg.vocab_size
    )
    tmask = jnp.ones((16, cfg.max_text_length), jnp.int32)
    text_features = jax.jit(
        lambda v, i, m: model.apply(v, i, m, normalize=True,
                                    method="encode_text")
    )(variables, ids, tmask)
    np.asarray(text_features)

    use_pallas = jax.default_backend() == "tpu"

    @jax.jit
    def zero_shot(variables, images_u8, text_features):
        x = preprocess_images(
            images_u8, image_size, image_size, CLIP_MEAN, CLIP_STD,
            jnp.bfloat16,
        )
        feats = model.apply(variables, x, normalize=True,
                            method="encode_image")
        logits = similarity(
            feats.astype(jnp.float32), text_features.astype(jnp.float32),
            temperature=0.5, use_pallas=use_pallas,
        )
        return jax.nn.sigmoid(logits)

    # raw H2D bandwidth at the eval batch shape (fetch-fenced)
    probe = np.zeros((args.batch_size, image_size, image_size, 3), np.uint8)
    np.asarray(jax.device_put(probe)[0, 0, 0])
    t0 = time.perf_counter()
    np.asarray(jax.device_put(probe)[0, 0, 0])
    h2d_mbps = probe.nbytes / (time.perf_counter() - t0) / 1e6

    rng = np.random.default_rng(0)
    results = []
    with tempfile.TemporaryDirectory(prefix="hpb_") as root:
        paths = _write_pngs(root, args.num_images, args.stored_size)
        labels = synthetic_labels(args.num_images, rng)

        def run_epoch(dataset, host_transform=None):
            loader = HostLoader(
                dataset, args.batch_size, shuffle=False,
                num_threads=args.threads, drop_last=True, pad_final=False,
            )
            it = prefetch_to_device(
                iter(loader), keys=("image",), transform=host_transform
            )
            n = 0
            t0 = time.perf_counter()
            probs = None
            for batch in it:
                probs = zero_shot(variables, batch["image"], text_features)
                n += batch["image"].shape[0]
            np.asarray(probs)  # fence (block_until_ready doesn't, on axon)
            return n, time.perf_counter() - t0

        def host_only_rate(dataset):
            loader = HostLoader(
                dataset, args.batch_size, shuffle=False,
                num_threads=args.threads, drop_last=True, pad_final=False,
            )
            n = 0
            t0 = time.perf_counter()
            for batch in loader:
                n += batch["image"].shape[0]
            return n / (time.perf_counter() - t0)

        for mode in args.mode:
            cache_build_s = None
            if mode == "cached":
                # one-time decode into the memmap cache (data/cache.py);
                # the epoch then reads preprocessed uint8 rows — no cv2
                from clip_for_dl_tpu.data.cache import build_image_cache

                t0 = time.perf_counter()
                cache = build_image_cache(
                    paths, image_size, os.path.join(root, "img_cache"),
                    workers=args.threads,
                )
                cache_build_s = time.perf_counter() - t0
                dataset = ImageMultiLabelDataset(
                    paths, labels, image_size=image_size, cache=cache
                )
                transform = None
            elif mode == "device-resize":
                # decode at stored resolution; resize happens inside the jit
                dataset = ImageMultiLabelDataset(
                    paths, labels, image_size=None
                )
                transform = None
            else:
                dataset = ImageMultiLabelDataset(
                    paths, labels, image_size=None
                )

                def transform(batch):
                    batch = dict(batch)
                    batch["image"] = native.batch_resize_u8(
                        list(batch["image"]), image_size, image_size,
                        threads=args.threads,
                    )
                    return batch

            run_epoch(dataset, transform)  # warm: compile + page cache
            best = 0.0
            for _ in range(args.epochs):
                n, dt = run_epoch(dataset, transform)
                best = max(best, n / dt)
            decode_rate = host_only_rate(dataset)
            row = {
                "metric": f"host-pipeline zero-shot img/s ({mode})",
                "value": round(best, 1),
                "unit": "images/sec",
                "stored_px": args.stored_size,
                "host_decode_img_s": round(decode_rate, 1),
                "h2d_MBps": round(h2d_mbps, 1),
            }
            if cache_build_s is not None:
                row["cache_build_s"] = round(cache_build_s, 2)
            results.append(row)
            print(json.dumps(results[-1]))

    return 0


if __name__ == "__main__":
    sys.exit(main())
