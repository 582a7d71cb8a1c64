"""Capture a device trace of a workload and print the XLA-op breakdown.

The trace-backed counterpart to the img/s + %MFU numbers: which compiled
ops the step time actually goes to, measured on the chip (VERDICT r1 asked
for trace-level evidence behind the "scheduling-bound" claims). Uses
`utils.profiling.trace` (jax.profiler) for capture and
`utils.trace_report.device_op_table` for parsing — both work through the
tunneled TPU backend.

Usage:
    python tools/trace_report.py --workload zeroshot --tower vit
    python tools/trace_report.py --workload pretrain --batch-size 128
    python tools/trace_report.py --parse-only /tmp/xtrace   # existing capture
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import tempfile


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workload", choices=["zeroshot", "pretrain"],
                   default="zeroshot")
    p.add_argument("--tower", choices=["resnet", "vit"], default="resnet")
    p.add_argument("--batch", "--batch-size", dest="batch", type=int,
                   default=256)
    p.add_argument("--seq-len", type=int, default=200)
    p.add_argument("--iters", type=int, default=3,
                   help="traced executions (after one warmup)")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--flash-attention", action="store_true",
                   help="trace with the fused Pallas flash attention "
                        "(ops/flash_attention.py) in both towers")
    p.add_argument("--bert-fused-mlp", action="store_true",
                   help="trace with the fused Dense-GELU-Dense training "
                        "kernel in the BERT MLPs (ops/mlp_train.py)")
    p.add_argument("--out", default=None, help="also write the JSON report")
    p.add_argument("--parse-only", default=None, metavar="LOG_DIR",
                   help="skip capture; parse an existing trace dir")
    p.add_argument("--group-depth", type=int, default=4, metavar="N",
                   help="also aggregate device time by jax scope path "
                        "(tf_op) truncated to N components, fwd/bwd "
                        "split, layer indices collapsed — names the "
                        "named_scope regions (optimizer_update, loss) "
                        "and DMA buckets; 0 disables")
    args = p.parse_args(argv)

    from clip_for_dl_tpu.utils.trace_report import (
        device_op_table,
        format_table,
    )

    if args.parse_only:
        report = device_op_table(args.parse_only,
                                 group_depth=args.group_depth)
        print(format_table(report, args.top))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(report, f, indent=2)
        return 0

    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_for_dl_tpu.core.compile_cache import enable_from_env
    from clip_for_dl_tpu.core.config import CLIP_MEAN, CLIP_STD, ModelConfig
    from clip_for_dl_tpu.models import CXRClip
    from clip_for_dl_tpu.ops.image_prep import preprocess_images
    from clip_for_dl_tpu.utils.profiling import fence, trace

    enable_from_env()
    rng = np.random.default_rng(0)
    if args.tiny:
        args.batch = min(args.batch, 8)
        size, seq = 64, 16
        cfg = ModelConfig(
            image_size=size, max_text_length=seq, vocab_size=64,
            text_embedding_dim=32, text_layers=1, text_heads=2,
            text_intermediate_dim=64, shared_embedding_dim=32,
            resnet_stages=(1, 1, 1, 1), resnet_width=8,
            vit_patch=16, vit_layers=1, vit_heads=2, vit_hidden=32,
            vit_mlp_dim=64,
        )
    else:
        size, seq = 224, args.seq_len
        cfg = ModelConfig(max_text_length=seq)
    if args.flash_attention:
        cfg = dataclasses.replace(cfg, flash_attention=True)
    if args.bert_fused_mlp:
        cfg = dataclasses.replace(cfg, bert_fused_mlp=True)
    if args.tower == "vit":
        # tiny traces a tiny ViT tower — never a ResNet labeled 'vit'
        cfg = (
            dataclasses.replace(
                cfg, image_tower="vit_b16", image_embedding_dim=32
            )
            if args.tiny else cfg.with_vit()
        )
    model = CXRClip(cfg, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((1, size, size, 3)),
        jnp.zeros((1, seq), jnp.int32),
    )
    images = jnp.asarray(
        rng.integers(0, 255, (args.batch, size, size, 3), dtype=np.uint8)
    )

    if args.workload == "zeroshot":
        from clip_for_dl_tpu.ops.similarity import similarity

        text_features = jnp.asarray(
            rng.normal(size=(16, cfg.shared_embedding_dim)), jnp.float32
        )

        @jax.jit
        def run(variables, images, text_features):
            x = preprocess_images(
                images, size, size, CLIP_MEAN, CLIP_STD, jnp.bfloat16
            )
            img_f = model.apply(variables, x, method=model.encode_image)
            return jax.nn.sigmoid(similarity(img_f, text_features))

        fns_args = (variables, images, text_features)
    else:
        from clip_for_dl_tpu.train import (
            TrainState,
            base_transform,
            make_clip_pretrain_step,
            make_label_fn,
        )

        tx = base_transform(max_grad_norm=1.0, weight_decay=1e-3)
        label_fn = make_label_fn(
            ["image_tower", "text_tower", "image_projector",
             "text_projector"]
        )
        step = jax.jit(make_clip_pretrain_step(
            model, tx, label_fn, "clip_self_distill", temperature=2.0,
            image_size=size, compute_dtype=jnp.bfloat16,
        ))
        state = TrainState.create(variables, tx)
        lrs = {"image_tower": 1e-4, "text_tower": 1e-5,
               "image_projector": 1e-3, "text_projector": 1e-3,
               "default": 1e-4}
        batch = {
            "images": images,
            "input_ids": jnp.asarray(
                rng.integers(0, cfg.vocab_size, (args.batch, seq))
                .astype(np.int32)
            ),
            "attention_mask": jnp.ones((args.batch, seq), jnp.int32),
        }

        def run(variables, images, _tf=None):
            _, metrics = step(state, batch, lrs, jax.random.key(0))
            return metrics["loss"]

        fns_args = (None, None, None)

    fence(run(*fns_args))  # compile + warm
    log_dir = tempfile.mkdtemp(prefix="trace_report_")
    with trace(log_dir):
        out = None
        for _ in range(args.iters):
            out = run(*fns_args)
        fence(out)

    report = device_op_table(log_dir, group_depth=args.group_depth)
    report["workload"] = args.workload
    report["tower"] = args.tower
    report["batch"] = args.batch
    report["iters"] = args.iters
    print(format_table(report, args.top))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
