"""CLIP pretrain step throughput (images/sec/chip) — reproducible.

The reference trains at ~17.7 img/s (02 nb cell 25: ~203 s/epoch over 3595
images on an RTX A5000). Here the same two-tower contrastive step (ResNet-50
+ BERT fwd+bwd, self-distill loss, AdamW with per-group lrs) is one jitted
XLA program; this tool measures it at a configurable batch size / sequence
length on the current chip and prints one JSON line per config.

Sequence length matters: the text tower is ~84% of the step FLOPs at the
notebook's padded seq 200, which is why `--bucket-text` (length-bucketed
batches, identical math) gives ~3.6× on real Indiana reports whose median
length is far below the pad. Benchmark both with `--seq-lens 200 64`.

Usage: python tools/train_bench.py [--batch-size 128] [--seq-lens 200]
       [--iters 20] [--remat] [--tiny]
NOTE: first compile of the full train step through a tunneled transport
takes minutes (cached afterwards).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tower", choices=["resnet", "vit"], default="resnet",
                   help="image tower; vit matches the reference's ViT-B/16 "
                        "pretrain row (15.2 img/s, vit nb cell 25)")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--seq-lens", type=int, nargs="+", default=[200])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the text tower (fits B=256)")
    p.add_argument("--remat-policy", default="full",
                   choices=("full", "dots", "dots_no_batch"),
                   help="with --remat: what jax.checkpoint saves "
                        "(see models/remat.py)")
    p.add_argument("--remat-conv", action="store_true",
                   help="also rematerialize the ResNet blocks")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--bf16-moments", action="store_true",
                   help="store the first Adam moment in bf16 "
                        "(train/optim.py moment_dtype)")
    p.add_argument("--bf16-attention-probs", action="store_true",
                   help="bf16 attention probabilities (halves the saved "
                        "softmax residual + its bwd layout copies)")
    p.add_argument("--flash-attention", action="store_true",
                   help="fused Pallas flash attention (fwd+bwd, in-kernel "
                        "dropout) in both transformer towers — no "
                        "[B, H, L, L] residual (ops/flash_attention.py)")
    p.add_argument("--bert-fused-mlp", action="store_true",
                   help="fused Dense-GELU-Dense Pallas TRAINING kernel in "
                        "the BERT MLPs (fwd+bwd, ops/mlp_train.py)")
    p.add_argument("--vit-fused-mlp-train", action="store_true",
                   help="the same fused training MLP kernel in the ViT "
                        "tower's MLPs (models/vit.py fused_mlp_train)")
    p.add_argument("--fused-mlp", action="store_true",
                   help="Pallas fused MLP block in the ViT layers — engages "
                        "in the training forward too (custom VJP, exact-XLA "
                        "backward)")
    p.add_argument("--phase", choices=["pretrain", "adapter"],
                   default="pretrain",
                   help="adapter = the frozen-CLIP phase-B step (only the "
                        "Linear head trains, towers eval-mode under "
                        "stop_gradient; 02 nb cell 29's ~135 s/epoch = "
                        "26.6 img/s anchor)")
    p.add_argument("--compiler-options", default=None, metavar="JSON",
                   help="JSON dict of XLA backend compiler options passed "
                        "to .compile() (TPU flags can't ride XLA_FLAGS "
                        "through the axon client — this is the path that "
                        "reaches the device compiler)")
    args = p.parse_args(argv)
    compiler_options = (
        json.loads(args.compiler_options) if args.compiler_options else None
    )
    if args.batch_size < 1:
        p.error("--batch-size must be >= 1")
    if min(args.seq_lens) < 1:
        p.error("--seq-lens entries must be >= 1")
    if args.iters < 1:
        p.error("--iters must be >= 1")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_for_dl_tpu.core.compile_cache import enable_from_env
    from clip_for_dl_tpu.core.config import ModelConfig

    enable_from_env()
    from clip_for_dl_tpu.models import CXRClip
    from clip_for_dl_tpu.train import (
        TrainState,
        base_transform,
        make_clip_pretrain_step,
        make_label_fn,
    )

    # 02 nb cell 25 (ResNet) / vit nb cell 25 (ViT) / 02 nb cell 29 (adapter)
    baseline = 17.7 if args.tower == "resnet" else 15.2
    if args.phase == "adapter":
        baseline = 26.6
    if args.tiny:
        args.batch_size = min(args.batch_size, 8)
        args.seq_lens = [min(s, 16) for s in args.seq_lens]
        args.iters = min(args.iters, 3)

    size = 64 if args.tiny else 224
    rng = np.random.default_rng(0)
    for seq in args.seq_lens:
        if args.tiny:
            cfg = ModelConfig(
                image_size=size, max_text_length=seq, vocab_size=64,
                text_embedding_dim=32, text_layers=1, text_heads=2,
                text_intermediate_dim=64, shared_embedding_dim=32,
                resnet_stages=(1, 1, 1, 1), resnet_width=8,
                vit_patch=16, vit_layers=1, vit_heads=2, vit_hidden=32,
                vit_mlp_dim=64,
                remat=args.remat, remat_conv=args.remat_conv,
                remat_policy=args.remat_policy,
            )
        else:
            cfg = ModelConfig(
                max_text_length=seq, remat=args.remat,
                remat_conv=args.remat_conv, remat_policy=args.remat_policy,
            )
        if args.tower == "vit":
            # tiny mode keeps the flag honest too: a tiny ViT tower, not a
            # tiny ResNet silently reported under tower='vit'
            cfg = (
                dataclasses.replace(
                    cfg, image_tower="vit_b16", image_embedding_dim=32
                )
                if args.tiny else cfg.with_vit()
            )
        if args.bf16_attention_probs:
            cfg = dataclasses.replace(cfg, bf16_attention_probs=True)
        if args.fused_mlp:
            cfg = dataclasses.replace(cfg, vit_fused_mlp=True)
        if args.flash_attention:
            cfg = dataclasses.replace(cfg, flash_attention=True)
        if args.bert_fused_mlp:
            cfg = dataclasses.replace(cfg, bert_fused_mlp=True)
        if args.vit_fused_mlp_train:
            cfg = dataclasses.replace(cfg, vit_fused_mlp_train=True)
        model = CXRClip(cfg, dtype=jnp.bfloat16)
        variables = model.init(
            jax.random.key(0),
            jnp.zeros((1, size, size, 3)),
            jnp.zeros((1, seq), jnp.int32),
        )
        b = args.batch_size
        if args.phase == "adapter":
            # 02 nb cells 28-29: frozen towers (stop_gradient eval-mode
            # forward), BCE on the 16-way Linear head — the only trained
            # params. Anchor: ~135 s/epoch over 3595 imgs = 26.6 img/s.
            from clip_for_dl_tpu.core.config import CLIP_MEAN, CLIP_STD
            from clip_for_dl_tpu.train import (
                freeze_mask,
                make_adapter_train_step,
            )

            tx = base_transform(None, 0.0)
            label_fn = make_label_fn(["adapter"])
            freeze = freeze_mask(variables["params"], ["adapter"])
            step = jax.jit(
                make_adapter_train_step(
                    model, tx, label_fn, freeze, size,
                    CLIP_MEAN, CLIP_STD, jnp.bfloat16,
                ),
                donate_argnums=(0,),
            )
            lrs = {"adapter": 1e-3, "default": 0.0}
            batch = {
                "images": jax.device_put(
                    rng.integers(0, 255, (b, size, size, 3), dtype=np.uint8)
                ),
                "labels": jax.device_put(
                    (rng.random((b, cfg.num_classes)) < 0.2).astype(
                        np.float32
                    )
                ),
            }
        else:
            tx = base_transform(
                max_grad_norm=1.0, weight_decay=1e-3,
                moment_dtype=jnp.bfloat16 if args.bf16_moments else None,
            )
            label_fn = make_label_fn(
                ["image_tower", "text_tower", "image_projector",
                 "text_projector"]
            )
            step = jax.jit(
                make_clip_pretrain_step(
                    model, tx, label_fn, "clip_self_distill",
                    temperature=2.0, image_size=size,
                    compute_dtype=jnp.bfloat16,
                ),
                donate_argnums=(0,),
            )
            lrs = {
                "image_tower": 1e-4, "text_tower": 1e-5,
                "image_projector": 1e-3, "text_projector": 1e-3,
                "default": 1e-4,
            }
            batch = {
                "images": jax.device_put(
                    rng.integers(0, 255, (b, size, size, 3), dtype=np.uint8)
                ),
                "input_ids": jax.device_put(
                    rng.integers(0, cfg.vocab_size, (b, seq)).astype(np.int32)
                ),
                "attention_mask": jax.device_put(np.ones((b, seq), np.int32)),
            }
        state = TrainState.create(variables, tx)
        compiled = step.lower(state, batch, lrs, jax.random.key(0)).compile(
            compiler_options=compiler_options
        )
        for i in range(args.warmup):
            state, metrics = compiled(state, batch, lrs, jax.random.key(i))
            float(np.asarray(metrics["loss"]))  # fence
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, metrics = compiled(state, batch, lrs, jax.random.key(i))
        float(np.asarray(metrics["loss"]))  # fence (axon: asarray, not BUR)
        dt = time.perf_counter() - t0
        img_s = b * args.iters / dt
        from clip_for_dl_tpu.utils.mfu import mfu_fields

        hbm = {}
        try:
            ma = compiled.memory_analysis()
            hbm = {
                "hbm_args_gb": round(ma.argument_size_in_bytes / 2**30, 2),
                "hbm_temp_gb": round(ma.temp_size_in_bytes / 2**30, 2),
            }
        except Exception:
            pass
        print(json.dumps({
            "metric": f"CLIP {args.phase} img/s/chip",
            "value": round(img_s, 1),
            "unit": "images/sec",
            "phase": args.phase,
            "tower": args.tower,
            "batch": b,
            "seq_len": seq,
            "remat": args.remat,
            "remat_policy": args.remat_policy if args.remat else None,
            "bf16_moments": args.bf16_moments,
            "bf16_attention_probs": args.bf16_attention_probs,
            "fused_mlp": args.fused_mlp,
            "flash_attention": args.flash_attention,
            "bert_fused_mlp": args.bert_fused_mlp,
            "vit_fused_mlp_train": args.vit_fused_mlp_train,
            "vs_baseline": round(img_s / baseline, 2),
            **mfu_fields(compiled, b, args.iters / dt),
            **hbm,
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
