"""Parity harness — reference pipeline vs framework, per-class probabilities.

The north-star fidelity bar (BASELINE.json) is per-class probability / AUROC
parity against the reference pipeline. This tool runs both sides on the same
inputs and reports the deltas:

- reference side: the reference's exact forward math in torch (mirror
  ResNet-50 with torchvision naming + the notebook projection head +
  HF BertModel when available), loaded from a reference ``checkpoint.pth``
  or randomly initialized (--random-weights) when no checkpoint exists.
- framework side: the same weights through our importers, run as the jitted
  CXRClip zero-shot pipeline.

Usage:
  python tools/parity_harness.py --random-weights            # synthetic E2E
  python tools/parity_harness.py --checkpoint model_best.pth # real ckpt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None, help="reference .pth")
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--temperature", type=float, default=0.5)
    p.add_argument("--tiny", action="store_true",
                   help="small towers (fast smoke)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import torch

    from clip_for_dl_tpu.core.config import ModelConfig
    from clip_for_dl_tpu.evals.metrics import auroc_per_class
    from clip_for_dl_tpu.models import CXRClip
    from clip_for_dl_tpu.models import torch_import as ti
    from clip_for_dl_tpu.models.resnet import import_torchvision_resnet50
    from clip_for_dl_tpu.ops.similarity import l2_normalize, similarity
    from clip_for_dl_tpu.testing import (
        TorchResidualProjection,
        TorchResNet,
        randomize_bn_stats,
        reference_zero_shot_probs,
    )

    torch.manual_seed(args.seed)
    rng = np.random.default_rng(args.seed)

    if args.tiny:
        stages, width, size = (1, 1, 1, 1), 8, 64
    else:
        stages, width, size = (3, 4, 6, 3), 64, args.image_size
    feat_dim = width * 8 * 4

    # -- reference side -----------------------------------------------------
    t_resnet = TorchResNet(layers=stages, width=width)
    t_proj = TorchResidualProjection(feat_dim, 512 if not args.tiny else 64)
    shared = 512 if not args.tiny else 64
    if args.checkpoint:
        ckpt = torch.load(args.checkpoint, map_location="cpu",
                          weights_only=False)
        models = ckpt.get("models", ckpt)
        t_resnet.load_state_dict(models["resnet"])
        t_proj.load_state_dict(models["image_projector"])
        print(f"loaded reference checkpoint (epoch {ckpt.get('epoch', '?')})",
              file=sys.stderr)
    else:
        randomize_bn_stats(t_resnet, args.seed)
        if not args.random_weights:
            print("no checkpoint given; pass --random-weights to proceed",
                  file=sys.stderr)
            return 2
    t_resnet.eval()
    t_proj.eval()
    text_features = torch.randn(16, shared)

    images = rng.standard_normal(
        (args.batch, size, size, 3)
    ).astype(np.float32)
    want = reference_zero_shot_probs(
        t_resnet, t_proj, text_features,
        torch.from_numpy(images.transpose(0, 3, 1, 2)), args.temperature,
    ).numpy()

    # -- framework side -----------------------------------------------------
    cfg = ModelConfig(
        image_size=size, max_text_length=8, vocab_size=64,
        text_embedding_dim=16, text_layers=1, text_heads=2,
        text_intermediate_dim=32, shared_embedding_dim=shared,
        resnet_stages=stages, resnet_width=width,
    )
    model = CXRClip(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, size, size, 3)),
        jnp.zeros((1, 8), jnp.int32),
    )
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    rp, rs = import_torchvision_resnet50(t_resnet.state_dict(), stages)
    params["image_tower"] = jax.tree.map(jnp.asarray, rp)
    stats["image_tower"] = jax.tree.map(jnp.asarray, rs)
    params["image_projector"] = jax.tree.map(
        jnp.asarray, ti.import_residual_projection(t_proj.state_dict())
    )
    variables = {"params": params, "batch_stats": stats}

    @jax.jit
    def pipeline(v, x, tf):
        feats = model.apply(v, x, normalize=True, method="encode_image")
        logits = similarity(feats, l2_normalize(tf), args.temperature)
        return jax.nn.sigmoid(logits)

    got = np.asarray(
        pipeline(variables, jnp.asarray(images),
                 jnp.asarray(text_features.numpy()))
    )

    # -- report -------------------------------------------------------------
    abs_err = np.abs(got - want)
    labels = (want > 0.5).astype(int)  # reference decisions as pseudo-labels
    auroc_ref = auroc_per_class(want, labels)
    auroc_ours = auroc_per_class(got, labels)
    report = {
        "prob_max_abs_err": float(abs_err.max()),
        "prob_mean_abs_err": float(abs_err.mean()),
        "decision_agreement": float(((got > 0.5) == (want > 0.5)).mean()),
        "auroc_max_abs_delta": float(
            np.nanmax(np.abs(auroc_ref - auroc_ours))
        ) if not np.all(np.isnan(auroc_ref)) else None,
        "batch": args.batch,
        "image_size": size,
    }
    print(json.dumps(report, indent=2))
    ok = report["prob_max_abs_err"] < 1e-3
    print("PARITY OK" if ok else "PARITY FAIL", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
