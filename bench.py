"""Benchmark: zero-shot chest X-ray prediction throughput (images/sec/chip).

Baseline: the reference's zero-shot eval runs at ~25 img/s on an RTX A5000
(BASELINE.md: 902 imgs / 36 s, bs 16, fp32, per-batch python loops). Here the
identical workload — ResNet-50 image tower → 512-d projection → L2-normalize
→ similarity against 16 disease prompt features → sigmoid probabilities —
runs as one jitted bf16 XLA program on HBM-resident uint8 batches (the
north-star input-fusion design), including the on-device resize+normalize.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_SEC = 25.0  # 02 nb cell 42: 902 imgs / 36 s on A5000
BATCH = 256
WARMUP = 3
ITERS = 30


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tower", choices=["resnet", "vit"], default="resnet",
                   help="image tower (default: the flagship ResNet-50)")
    p.add_argument("--fast-gelu", action="store_true",
                   help="tanh-GELU in the ViT tower (serving knob)")
    p.add_argument("--fused-attention", action="store_true",
                   help="Pallas fused-MHA in the ViT layers")
    p.add_argument("--fused-mlp", action="store_true",
                   help="Pallas fused MLP block in the ViT layers "
                        "(exact-GELU, 3.5x the XLA composition)")
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

    import os

    from clip_for_dl_tpu.core.compile_cache import ENV_VAR, enable_from_env
    from clip_for_dl_tpu.core.config import CLIP_MEAN, CLIP_STD, ModelConfig

    # default the persistent compile cache ON for the benchmark (repeat
    # runs rehit the compiled executable from disk instead of paying the
    # remote compile); opt out with CLIP_FOR_DL_TPU_COMPILE_CACHE=""
    os.environ.setdefault(
        ENV_VAR,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache"),
    )
    enable_from_env()
    from clip_for_dl_tpu.models import CXRClip
    from clip_for_dl_tpu.ops.image_prep import preprocess_images
    from clip_for_dl_tpu.ops.similarity import similarity

    cfg = ModelConfig(
        max_text_length=64,
        vit_gelu_approximate=args.fast_gelu,
        vit_fused_attention=args.fused_attention,
        vit_fused_mlp=args.fused_mlp,
    )
    if args.tower == "vit":
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

    # NOTE (honest-benchmark caveat, stated wherever this number is
    # quoted): compute-only on a synthetic HBM-resident uint8 batch with
    # precached text features — the host decode/H2D side is benchmarked
    # separately (tools/host_pipeline_bench.py) because in THIS container
    # it measures the 1-core/axon-tunnel environment, not the framework.
    images = jax.device_put(
        np.random.default_rng(0).integers(
            0, 255, (batch_n, 224, 224, 3), dtype=np.uint8
        )
    )

    compiled = zero_shot_fn.lower(variables, images, text_features).compile(
        compiler_options=compiler_options
    )
    zero_shot = lambda *a: compiled(*a)  # noqa: E731

    for _ in range(WARMUP):
        np.asarray(zero_shot(variables, images, text_features))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        probs = zero_shot(variables, images, text_features)
    # fetch the result to fence the timing (block_until_ready does not
    # reliably block through the axon tunnel)
    np.asarray(probs)
    dt = time.perf_counter() - t0

    img_per_sec = batch_n * ITERS / dt
    from clip_for_dl_tpu.utils.mfu import mfu_fields

    print(json.dumps({
        "metric": "zero-shot images/sec/chip (Indiana CXR pipeline, "
                  "compute-only: HBM-resident batch, cached text features)",
        "tower": args.tower,
        "value": round(img_per_sec, 1),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 2),
        **mfu_fields(compiled, batch_n, ITERS / dt),
    }))


if __name__ == "__main__":
    main()
