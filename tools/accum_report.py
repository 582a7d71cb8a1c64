"""Measured HBM effect of GradCache gradient accumulation + local-loss.

Compiles the plain full-batch pretrain step and the accumulated step for
the same GLOBAL batch and reports XLA's own `memory_analysis()` numbers
(temp/argument/output bytes) — the auditable counterpart to VERDICT r1
item 4's "measured HBM saving at B_global >= 2048 simulated shapes".

Runs on any backend (CPU works: memory analysis is a compile-time
artifact, nothing executes unless --execute). The model is shrunk to the
text/vision geometry that matters for activation scaling, not the full
towers, unless --full is given.

Usage:
    python tools/accum_report.py --batch 2048 --accum 1 8 16
    python tools/accum_report.py --tiny          # smoke (seconds)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2048, help="global batch")
    p.add_argument("--accum", type=int, nargs="+", default=[1, 8],
                   help="accumulation factors to compare (1 = plain step)")
    p.add_argument("--seq-len", type=int, default=64)
    p.add_argument("--image", type=int, default=224)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--full", action="store_true",
                   help="full-geometry towers (slow compile)")
    p.add_argument("--cpu", action="store_true", default=True)
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from clip_for_dl_tpu.core.config import ModelConfig
    from clip_for_dl_tpu.models import CXRClip
    from clip_for_dl_tpu.train import (
        TrainState,
        base_transform,
        make_accum_clip_pretrain_step,
        make_clip_pretrain_step,
        make_label_fn,
    )

    if args.tiny:
        cfg = ModelConfig(
            image_size=32, max_text_length=16, vocab_size=64,
            text_embedding_dim=32, text_layers=2, text_heads=2,
            text_intermediate_dim=64, shared_embedding_dim=32,
            resnet_stages=(1, 1, 1, 1), resnet_width=8, dropout=0.0,
        )
        args.batch = min(args.batch, 64)
    elif args.full:
        cfg = ModelConfig(image_size=args.image, max_text_length=args.seq_len)
    else:
        # mid-size: real layer shapes, fewer layers — activation scaling
        # with batch is what we are measuring, not layer count
        cfg = ModelConfig(
            image_size=args.image, max_text_length=args.seq_len,
            text_layers=4, vit_layers=4, resnet_stages=(1, 1, 1, 1),
        )

    model = CXRClip(cfg, dtype=jnp.bfloat16)
    variables = jax.eval_shape(
        model.init,
        jax.random.key(0),
        jax.ShapeDtypeStruct(
            (1, cfg.image_size, cfg.image_size, 3), jnp.bfloat16
        ),
        jax.ShapeDtypeStruct((1, cfg.max_text_length), jnp.int32),
    )
    tx = base_transform()
    label_fn = make_label_fn([])
    state = jax.eval_shape(lambda v: TrainState.create(v, tx), variables)
    batch = {
        "images": jax.ShapeDtypeStruct(
            (args.batch, cfg.image_size, cfg.image_size, 3), jnp.uint8
        ),
        "input_ids": jax.ShapeDtypeStruct(
            (args.batch, cfg.max_text_length), jnp.int32
        ),
        "attention_mask": jax.ShapeDtypeStruct(
            (args.batch, cfg.max_text_length), jnp.int32
        ),
    }
    lrs = {"default": 1e-3}
    key = jax.random.key(0)

    rows = []
    for a in args.accum:
        if a <= 1:
            step = make_clip_pretrain_step(
                model, tx, label_fn, image_size=cfg.image_size,
            )
            name = "plain"
        else:
            step = make_accum_clip_pretrain_step(
                model, tx, label_fn, a, image_size=cfg.image_size,
            )
            name = f"accum{a}"
        compiled = (
            jax.jit(step)
            .lower(state, batch, lrs, key)
            .compile()
        )
        mem = compiled.memory_analysis()
        row = {
            "variant": name,
            "temp_mb": round(mem.temp_size_in_bytes / 2**20, 1),
            "args_mb": round(mem.argument_size_in_bytes / 2**20, 1),
            "output_mb": round(mem.output_size_in_bytes / 2**20, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    if len(rows) > 1 and rows[0]["variant"] == "plain":
        base = rows[0]["temp_mb"]
        for r in rows[1:]:
            print(json.dumps({
                "variant": r["variant"],
                "temp_saving_vs_plain": round(base / max(r["temp_mb"], 1e-9), 2),
            }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
