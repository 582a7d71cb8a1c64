"""Export a serving-optimized inference weight set.

Takes a training checkpoint (orbax dir or reference ``.pth``), folds
BatchNorm into the ResNet convs (models/resnet.fold_batchnorm), casts
parameters to the serving dtype, and writes a standalone orbax checkpoint +
a JSON manifest (config, disease labels, preprocessing statistics) that
`CXRClip(cfg, fold_bn=True)` loads directly — the production-serving
counterpart of the reference's model_best.pth.

Usage:
  python tools/export_inference.py --checkpoint ckpts --out serving/
  python tools/export_inference.py --checkpoint model_best.pth --out serving/
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--preset", default="zero_shot")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--stablehlo", action="store_true",
                   help="also serialize the zero-shot scorer + text encoder "
                        "as portable StableHLO modules (jax.export): "
                        "weights and prompt features baked in, symbolic "
                        "batch, lowered for cpu+tpu")
    p.add_argument("--source-size", type=int, default=0,
                   help="input view height/width baked into the exported "
                        "scorer's resize (default: the model image size, "
                        "i.e. pre-resized input)")
    p.add_argument("--vocab", default=None,
                   help="BERT vocab.txt for the prompt bank (synthetic dev "
                        "vocabulary when absent)")
    p.add_argument("--prompts", default="prediction",
                   choices=["prediction", "basic", "showing"],
                   help="prompt family baked into the single-view serving "
                        "scorer (matches serve's default)")
    p.add_argument("--cpu", action="store_true",
                   help="run on the CPU backend (export lowers for cpu+tpu "
                        "regardless — no chip needed to produce the "
                        "artifact)")
    args = p.parse_args(argv)

    import jax

    if args.cpu or os.environ.get("CLIP_FOR_DL_TPU_FORCE_CPU"):
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from clip_for_dl_tpu.core.config import DISEASE_LABELS, get_preset
    from clip_for_dl_tpu.inference import load_trained_model
    from clip_for_dl_tpu.models.resnet import fold_clip_image_tower

    # the tokenizer must be the SAME one the CLI builds (vocab file, or its
    # synthetic dev vocabulary) — checkpoints trained by the CLI store a
    # token-embedding table sized to it, and the exported prompt banks must
    # tokenize identically
    from clip_for_dl_tpu.cli.main import _tokenizer

    tokenizer = _tokenizer(args)
    cfg = get_preset(args.preset)
    # the CLI sizes the vocabulary to the loaded tokenizer unconditionally
    # (_apply_tiny) — mirror it, or CLI-trained checkpoints fail to restore
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, vocab_size=len(tokenizer.vocab)
    ))
    if args.tiny:
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, image_size=64, max_text_length=32,
            text_embedding_dim=64, text_layers=2, text_heads=2,
            text_intermediate_dim=128, shared_embedding_dim=64,
            resnet_stages=(1, 1, 1, 1), resnet_width=16,
            vit_layers=2, vit_hidden=64, vit_heads=2, vit_mlp_dim=128,
        ))

    model, variables = load_trained_model(
        args.checkpoint if args.checkpoint != "fresh" else None,
        cfg, compute_dtype=jnp.float32,
    )
    host_vars = jax.tree.map(np.asarray, variables)
    folded = fold_clip_image_tower(host_vars)
    dtype = np.float32 if args.dtype == "float32" else jnp.bfloat16
    folded = jax.tree.map(
        lambda a: a.astype(dtype)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else a,
        folded,
    )

    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(out, "weights"), folded, force=True)
    ckptr.wait_until_finished()

    manifest = {
        "model": dataclasses.asdict(cfg.model),
        "fold_bn": True,
        "dtype": args.dtype,
        "disease_labels": list(DISEASE_LABELS),
        "preprocess": {
            "image_size": cfg.model.image_size,
            "mean": list(cfg.augment.mean),
            "std": list(cfg.augment.std),
        },
        "zeroshot": dataclasses.asdict(cfg.zeroshot),
    }
    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    n_params = sum(
        int(np.prod(np.asarray(a).shape))
        for a in jax.tree.leaves(folded["params"])
    )
    print(f"exported {n_params/1e6:.1f}M params → {out}")

    if args.stablehlo:
        from clip_for_dl_tpu.export import (
            ADAPTER_FILE,
            SCORER_FILE,
            SINGLEVIEW_FILE,
            TEXT_ENCODER_FILE,
            export_adapter_scorer,
            export_multiview_scorer,
            export_singleview_scorer,
            export_text_encoder,
            write_artifact,
        )
        from clip_for_dl_tpu.models import CXRClip
        from clip_for_dl_tpu.zeroshot.engine import encode_prompt_bank
        from clip_for_dl_tpu.zeroshot.prompts import (
            create_basic_prompts,
            prompts_for_family,
        )

        # the artifact runs the BN-folded tower in the serving dtype — the
        # exact weight set written to <out>/weights above
        compute = jnp.float32 if args.dtype == "float32" else jnp.bfloat16
        folded_model = CXRClip(cfg.model, dtype=compute, fold_bn=True)
        fold_vars = {"params": folded["params"]}

        prompts = create_basic_prompts(DISEASE_LABELS)
        enc = tokenizer.encode(prompts, max_length=cfg.model.max_text_length)
        text_features = jax.jit(
            lambda v, i, m: folded_model.apply(
                v, i, m, normalize=True, method="encode_text"
            )
        )(fold_vars, jnp.asarray(enc["input_ids"]),
          jnp.asarray(enc["attention_mask"]))

        src = args.source_size or cfg.model.image_size
        scorer_bytes = export_multiview_scorer(
            folded_model, fold_vars, text_features,
            cfg.model.image_size, cfg.augment.mean, cfg.augment.std,
            source_hw=(src, src),
        )
        # single-view serving scorer: the serve command's prompt bank
        # (mean-pooled per-disease family, default "prediction") at the
        # preset's zero-shot temperature — serve --exported runs this
        bank = encode_prompt_bank(
            prompts_for_family(args.prompts, DISEASE_LABELS),
            DISEASE_LABELS,
            lambda ids, m: folded_model.apply(
                fold_vars, ids, m, normalize=True, method="encode_text"
            ),
            tokenizer, cfg.model.max_text_length,
        )
        single_bytes = export_singleview_scorer(
            folded_model, fold_vars, bank,
            cfg.model.image_size, cfg.augment.mean, cfg.augment.std,
            temperature=cfg.zeroshot.temperature, source_hw=(src, src),
            compute_dtype=compute,
        )
        # C-Adapter serving scorer (meaningful when --checkpoint is an
        # adapter run's output; the head exists structurally either way)
        adapter_bytes = export_adapter_scorer(
            folded_model, fold_vars,
            cfg.model.image_size, cfg.augment.mean, cfg.augment.std,
            source_hw=(src, src), compute_dtype=compute,
        )
        text_bytes = export_text_encoder(
            folded_model, fold_vars, cfg.model.max_text_length
        )
        write_artifact(out, scorer_bytes, text_bytes, manifest=None,
                       singleview_bytes=single_bytes,
                       adapter_bytes=adapter_bytes)
        # record export provenance next to the modules (the manifest body
        # was written by the weight export above — extend, don't replace)
        mpath = os.path.join(out, "manifest.json")
        with open(mpath) as f:
            m = json.load(f)
        m["stablehlo"] = {
            "jax_version": jax.__version__,
            "platforms": ["cpu", "tpu"],
            "source_hw": [src, src],
            "prompts": args.prompts,
            "temperature": cfg.zeroshot.temperature,
            "files": {
                "multiview": SCORER_FILE,
                "singleview": SINGLEVIEW_FILE,
                "adapter": ADAPTER_FILE,
                "text_encoder": TEXT_ENCODER_FILE,
            },
        }
        with open(mpath, "w") as f:
            json.dump(m, f, indent=2)
        print(
            f"stablehlo: {SCORER_FILE} ({len(scorer_bytes)/1e6:.1f} MB, "
            f"input [b,2,{src},{src},3] u8), {SINGLEVIEW_FILE} "
            f"({len(single_bytes)/1e6:.1f} MB, input [b,{src},{src},3] u8, "
            f"T={cfg.zeroshot.temperature}, prompts={args.prompts}), "
            f"{ADAPTER_FILE} ({len(adapter_bytes)/1e6:.1f} MB), "
            f"{TEXT_ENCODER_FILE} ({len(text_bytes)/1e6:.1f} MB, "
            f"L={cfg.model.max_text_length})"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
