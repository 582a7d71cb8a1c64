"""Serving latency percentiles for the zero-shot pipeline.

Measures end-to-end request latency (H2D + compiled forward + D2H of the
[B, 16] probabilities) per batch size — the serving-side complement of
bench.py's throughput number. On tunneled transports (axon) the RPC
round-trip is included, which is honest for remote serving and an upper
bound for local chips.

Usage: python tools/latency_bench.py [--batches 1 4 16 64] [--iters 50]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batches", type=int, nargs="+", default=[1, 4, 16, 64])
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_for_dl_tpu.core.config import CLIP_MEAN, CLIP_STD, ModelConfig
    from clip_for_dl_tpu.models import CXRClip
    from clip_for_dl_tpu.ops.image_prep import preprocess_images
    from clip_for_dl_tpu.ops.similarity import similarity

    if args.tiny:
        cfg = ModelConfig(
            image_size=64, max_text_length=16, vocab_size=64,
            text_embedding_dim=32, text_layers=1, text_heads=2,
            text_intermediate_dim=64, shared_embedding_dim=64,
            resnet_stages=(1, 1, 1, 1), resnet_width=8,
        )
    else:
        cfg = ModelConfig(max_text_length=64)
    size = cfg.image_size
    model = CXRClip(cfg, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, size, size, 3), jnp.bfloat16),
        jnp.zeros((1, cfg.max_text_length), jnp.int32),
    )
    tf = jnp.ones((16, cfg.shared_embedding_dim), jnp.float32)
    use_pallas = jax.default_backend() == "tpu"

    @jax.jit
    def zs(v, img, tf):
        x = preprocess_images(img, size, size, CLIP_MEAN, CLIP_STD, jnp.bfloat16)
        f = model.apply(v, x, normalize=True, method="encode_image")
        return jax.nn.sigmoid(
            similarity(f.astype(jnp.float32), tf, 0.5, use_pallas=use_pallas)
        )

    rng = np.random.default_rng(0)
    report = {}
    for b in args.batches:
        host_img = rng.integers(0, 255, (b, size, size, 3), dtype=np.uint8)
        # warmup/compile
        for _ in range(3):
            np.asarray(zs(variables, jnp.asarray(host_img), tf))
        lat = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = np.asarray(zs(variables, jnp.asarray(host_img), tf))
            lat.append((time.perf_counter() - t0) * 1e3)
        lat = np.asarray(lat)
        report[f"batch_{b}"] = {
            "p50_ms": round(float(np.percentile(lat, 50)), 2),
            "p90_ms": round(float(np.percentile(lat, 90)), 2),
            "p99_ms": round(float(np.percentile(lat, 99)), 2),
            "img_per_sec_at_p50": round(b / np.percentile(lat, 50) * 1e3, 1),
        }
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
