"""Measure the two on-device preprocess paths head-to-head (VERDICT r2
weak #3 / item 4a: `ops/image_prep.fused_resize_normalize` had no caller
— wire it where it wins or delete it).

Compares, at the serving shapes that actually occur:

- `preprocess_images` — the pure-XLA path every engine dispatches
  (separable resize matmuls with the normalize epilogue fused by XLA);
- `fused_resize_normalize` — the Pallas single-pass kernel (u8→f32,
  H-matmul, W-matmul via Ww⊗I_C, scale/bias, cast, all in VMEM).

Shapes: the native-resolution serving ingest (512→224 — what `serve`
/ `AdapterEngine` see when fed raw decoded PNGs) and the cache hot path
(224→224, normalize-only — where `preprocess_images` skips the matmuls
entirely, so the Pallas kernel must beat a pure elementwise program).

Prints one JSON line per (shape, path) with img/s; the decision lives in
NOTES.md ("image-prep kernel decision").
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def measure(fn, x, iters: int, warmup: int = 3) -> float:
    from clip_for_dl_tpu.utils.profiling import fence

    for _ in range(warmup):
        fence(fn(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    fence(out)
    dt = time.perf_counter() - t0
    return x.shape[0] * iters / dt


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args(argv)

    from clip_for_dl_tpu.core.config import CLIP_MEAN, CLIP_STD
    from clip_for_dl_tpu.ops.image_prep import (
        fused_resize_normalize,
        preprocess_images,
    )

    rng = np.random.default_rng(0)
    for name, (b, side) in (
        ("serve_512to224", (64, 512)),
        ("cache_224_norm_only", (256, 224)),
    ):
        host = rng.integers(0, 255, (b, side, side, 3), dtype=np.uint8)
        x = jax.device_put(jnp.asarray(host))

        def xla_path(img):
            return preprocess_images(
                img, 224, 224, CLIP_MEAN, CLIP_STD, jnp.bfloat16,
                precision="default" if side > 224 else "highest",
            )

        def pallas_path(img):
            return fused_resize_normalize(
                img, 224, 224, CLIP_MEAN, CLIP_STD, jnp.bfloat16
            )

        # parity first — same bytes through both paths
        a = np.asarray(xla_path(x), np.float32)
        bv = np.asarray(pallas_path(x), np.float32)
        max_d = float(np.abs(a - bv).max())
        for path, fn in (("xla", xla_path), ("pallas", pallas_path)):
            rate = measure(fn, x, args.iters)
            print(json.dumps({
                "shape": name, "path": path,
                "img_per_sec": round(rate, 1),
                "max_abs_delta_vs_other": round(max_d, 5),
            }))


if __name__ == "__main__":
    main()
