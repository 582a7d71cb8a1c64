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
  python tools/parity_harness.py --from-png --random-weights # PNG-bytes E2E

``--from-png`` is the complete day-one fidelity rehearsal minus the real
weights (VERDICT r2 item 6): both sides start from the SAME PNG bytes on
disk — including a corrupt file exercising the zero-image fallback — and
run the full chain to per-class AUROC:

  reference:  cv2.imread → cv2.resize → BGR→RGB → /255 → CLIP-normalize
              → torch ResNet mirror → projection → L2 | prompts → HF
              BertModel → CLS → projection → L2 → sigmoid(sim·4.0)
              (0425/prepare_data.py:65-90 + 0426/load_model.py:73-135)
  framework:  data.datasets.load_image (native libpng decode + cv2-parity
              resize, byte-identical host chain) → device
              preprocess_images normalize → CXRClip towers (weights
              imported from the SAME torch modules) → similarity(T=0.25)
              → sigmoid

Because the host decode+resize chains are byte-identical (tests/
test_native.py), the reported deltas are pure fp32 tower math.
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
    p.add_argument("--width", type=int, default=None,
                   help="ResNet stem width override (default 8 with "
                        "--tiny, 64 otherwise); tools/day_one.py passes "
                        "16 to match the CLI's --tiny checkpoints")
    p.add_argument("--from-png", action="store_true",
                   help="start both chains from PNG BYTES on disk "
                        "(decode + resize + normalize + both towers + "
                        "AUROC — see module docstring)")
    p.add_argument("--tower", choices=["resnet", "vit"], default="resnet",
                   help="--from-png image tower: resnet (02 nb) or the "
                        "ViT-B/16 chain (vit_vision nb cell 24 — torch "
                        "mirror of torchvision vit_b_16)")
    p.add_argument("--enhance", action="store_true",
                   help="--from-png: route both sides through the "
                        "AdditiveMultiModalAttention enhanced zero-shot "
                        "path (multimodal_attention/disease_analysis.py:"
                        "344-356: enhance -> renormalize -> sim/T=0.5)")
    p.add_argument("--n-images", type=int, default=32,
                   help="--from-png: synthetic PNGs to generate")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    if args.from_png:
        if not (args.random_weights or args.checkpoint):
            print("--from-png needs --random-weights or --checkpoint",
                  file=sys.stderr)
            return 2
        return run_from_png(args)

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
    if args.width:
        width = args.width
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


def run_from_png(args) -> int:
    """PNG-bytes → AUROC oracle diff (see module docstring)."""
    import json as _json
    import tempfile

    import cv2
    import jax
    import jax.numpy as jnp
    import torch

    from clip_for_dl_tpu.core.config import (
        CLIP_MEAN,
        CLIP_STD,
        DISEASE_LABELS,
        ModelConfig,
    )
    from clip_for_dl_tpu.data.datasets import load_image
    from clip_for_dl_tpu.evals.metrics import auroc_per_class
    from clip_for_dl_tpu.models import CXRClip
    from clip_for_dl_tpu.models import torch_import as ti
    from clip_for_dl_tpu.models.bert import import_hf_bert
    from clip_for_dl_tpu.models.resnet import import_torchvision_resnet50
    from clip_for_dl_tpu.models.vit import import_torchvision_vit_b16
    from clip_for_dl_tpu.ops.image_prep import preprocess_images
    from clip_for_dl_tpu.ops.similarity import l2_normalize, similarity
    from clip_for_dl_tpu.testing import (
        TorchAdditiveAttention,
        TorchResidualProjection,
        TorchResNet,
        TorchViT,
        randomize_bn_stats,
    )
    from clip_for_dl_tpu.text.tokenizer import BertTokenizer, build_tiny_vocab
    from transformers import BertConfig, BertModel

    torch.manual_seed(args.seed)
    rng = np.random.default_rng(args.seed)
    size = 64 if args.tiny else args.image_size

    # -- the PNG bytes both chains start from -------------------------------
    root = tempfile.mkdtemp(prefix="parity_png_")
    paths = []
    src_h, src_w = (96, 80) if args.tiny else (512, 408)
    for i in range(args.n_images):
        p = os.path.join(root, f"CXR{i}_IM.dcm.png")
        # smooth field + noise: exercises the bilinear resize tap weights
        base = np.linspace(30, 220, src_w, dtype=np.float32)[None, :]
        img = np.clip(
            base + rng.normal(0, 40, (src_h, src_w)), 0, 255
        ).astype(np.uint8)
        cv2.imwrite(p, np.repeat(img[:, :, None], 3, axis=2))
        paths.append(p)
    corrupt = os.path.join(root, "CXR_corrupt_IM.dcm.png")
    with open(corrupt, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\nnot really a png")
    paths.append(corrupt)

    # -- shared weights (torch modules are the source of truth) -------------
    if args.tiny:
        stages, width = (1, 1, 1, 1), 8
        t_hidden, t_layers, t_heads, t_inter = 32, 1, 2, 64
        v_hidden, v_layers, v_heads, v_mlp, v_patch = 64, 2, 4, 128, 8
        shared = 64
    else:
        stages, width = (3, 4, 6, 3), 64
        t_hidden, t_layers, t_heads, t_inter = 768, 12, 12, 3072
        v_hidden, v_layers, v_heads, v_mlp, v_patch = 768, 12, 12, 3072, 16
        shared = 512
    if args.tower == "vit":
        t_image_tower = TorchViT(
            image_size=size, patch=v_patch, hidden=v_hidden,
            layers=v_layers, heads=v_heads, mlp=v_mlp,
        )
        feat_dim = v_hidden
    else:
        t_image_tower = TorchResNet(layers=stages, width=width)
        randomize_bn_stats(t_image_tower, args.seed)
        feat_dim = width * 8 * 4
    t_resnet = t_image_tower  # checkpoint naming keeps the 02-nb key
    t_img_proj = TorchResidualProjection(feat_dim, shared)
    t_txt_proj = TorchResidualProjection(t_hidden, shared)
    t_enhance = TorchAdditiveAttention(shared) if args.enhance else None

    prompts = [f"a chest x-ray of {d.lower()}" for d in DISEASE_LABELS]
    vocab = build_tiny_vocab(
        [w for s in prompts for w in s.split()], do_lower_case=False
    )
    tok = BertTokenizer(vocab)
    max_len = 16
    enc = tok.encode(prompts, max_length=max_len)
    ids, mask = enc["input_ids"], enc["attention_mask"]
    t_bert = BertModel(BertConfig(
        vocab_size=len(vocab), hidden_size=t_hidden,
        num_hidden_layers=t_layers, num_attention_heads=t_heads,
        intermediate_size=t_inter, max_position_embeddings=64,
    ))
    if args.checkpoint:
        ckpt = torch.load(args.checkpoint, map_location="cpu",
                          weights_only=False)
        models = ckpt.get("models", ckpt)
        t_resnet.load_state_dict(models["resnet"])
        t_img_proj.load_state_dict(models["image_projector"])
        t_txt_proj.load_state_dict(models["text_projector"])
        t_bert.load_state_dict(models["text_model"])
        if t_enhance is not None and "multimodal_attention" in models:
            t_enhance.load_state_dict(models["multimodal_attention"])
    for m in (t_resnet, t_img_proj, t_txt_proj, t_bert):
        m.eval()
    if t_enhance is not None:
        t_enhance.eval()

    # the enhanced path scores at T=0.5 (disease_analysis.py:352); the
    # plain chain at the 02-nb zero-shot T=0.25 (sigmoid(sim·4))
    temperature = 0.5 if args.enhance else 0.25

    # -- reference chain: cv2 decode → torch towers → sigmoid(sim/T) --------
    ref_imgs = []
    zero_fallbacks = 0
    for p in paths:
        img = cv2.imread(p)
        if img is None:  # 0425/prepare_data.py:88-90
            img = np.zeros((size, size, 3), np.uint8)
            zero_fallbacks += 1
        else:
            img = cv2.resize(img, (size, size))
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        ref_imgs.append(img)
    ref_x = np.stack(ref_imgs).astype(np.float32) / 255.0
    ref_x = (ref_x - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    with torch.no_grad():
        feats = t_image_tower(torch.from_numpy(
            ref_x.transpose(0, 3, 1, 2)).float())
        feats = t_img_proj(torch.flatten(feats, 1))
        feats = torch.nn.functional.normalize(feats, dim=-1)
        tf = t_bert(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state[:, 0, :]
        tf = torch.nn.functional.normalize(t_txt_proj(tf), dim=-1)
        if t_enhance is not None:  # disease_analysis.py:344-346
            feats, _ = t_enhance(feats, tf)
            feats = torch.nn.functional.normalize(feats, dim=-1)
        want = torch.sigmoid(feats @ tf.T / temperature).numpy()

    # -- framework chain: native decode → CXRClip → sigmoid(sim/T) ----------
    cfg = ModelConfig(
        image_size=size, max_text_length=max_len, vocab_size=len(vocab),
        text_embedding_dim=t_hidden, text_layers=t_layers,
        text_heads=t_heads, text_intermediate_dim=t_inter,
        shared_embedding_dim=shared, resnet_stages=stages,
        resnet_width=width, text_max_position=64,
        use_multimodal_attention=args.enhance,
        vit_patch=v_patch, vit_hidden=v_hidden, vit_layers=v_layers,
        vit_heads=v_heads, vit_mlp_dim=v_mlp,
    )
    if args.tower == "vit":
        import dataclasses as _dc

        cfg = _dc.replace(
            cfg, image_tower="vit_b16", image_embedding_dim=v_hidden
        )
    model = CXRClip(cfg)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, size, size, 3)),
        jnp.zeros((1, max_len), jnp.int32),
    )
    variables = jax.tree.map(lambda x: x, variables)  # unfreeze-safe copy
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    if args.tower == "vit":
        params["image_tower"] = jax.tree.map(
            jnp.asarray,
            import_torchvision_vit_b16(
                t_image_tower.state_dict(), v_layers, v_hidden
            ),
        )
    else:
        rp, rs = import_torchvision_resnet50(
            t_image_tower.state_dict(), stages
        )
        params["image_tower"] = jax.tree.map(jnp.asarray, rp)
        stats["image_tower"] = jax.tree.map(jnp.asarray, rs)
    params["text_tower"] = jax.tree.map(
        jnp.asarray, import_hf_bert(t_bert.state_dict(), layers=t_layers)
    )
    params["image_projector"] = jax.tree.map(
        jnp.asarray, ti.import_residual_projection(t_img_proj.state_dict())
    )
    params["text_projector"] = jax.tree.map(
        jnp.asarray, ti.import_residual_projection(t_txt_proj.state_dict())
    )
    if args.enhance:
        params["multimodal_attention"] = jax.tree.map(
            jnp.asarray, ti.import_additive_attention(t_enhance.state_dict())
        )
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats

    # host chain: byte-identical native decode + cv2-parity resize
    our_u8 = np.stack([load_image(p, size) for p in paths])

    @jax.jit
    def pipeline(v, images_u8, ids, mask):
        x = preprocess_images(
            images_u8, size, size, CLIP_MEAN, CLIP_STD, jnp.float32
        )
        feats = model.apply(v, x, normalize=True, method="encode_image")
        tf = model.apply(v, ids, mask, normalize=True, method="encode_text")
        if args.enhance:
            feats, _ = model.apply(v, feats, tf, method="enhance")
            feats = l2_normalize(feats)
        return jax.nn.sigmoid(similarity(feats, tf, temperature=temperature))

    got = np.asarray(pipeline(
        variables, jnp.asarray(our_u8), jnp.asarray(ids), jnp.asarray(mask)
    ))

    # host chains must be byte-identical before any tower math
    host_delta = int(np.abs(
        our_u8.astype(np.int32) - np.stack(ref_imgs).astype(np.int32)
    ).max())

    labels = (rng.random(want.shape) < 0.3).astype(int)
    auroc_ref = auroc_per_class(want, labels)
    auroc_ours = auroc_per_class(got, labels)
    both = ~(np.isnan(auroc_ref) | np.isnan(auroc_ours))
    abs_err = np.abs(got - want)
    report = {
        "mode": "from_png_bytes",
        "tower": args.tower,
        "enhance": bool(args.enhance),
        "n_images": len(paths),
        "zero_fallbacks": zero_fallbacks,
        "host_chain_max_abs_delta_u8": host_delta,
        "prob_max_abs_err": float(abs_err.max()),
        "prob_mean_abs_err": float(abs_err.mean()),
        "decision_agreement": float(((got > 0.5) == (want > 0.5)).mean()),
        "auroc_max_abs_delta": float(
            np.abs(auroc_ref[both] - auroc_ours[both]).max()
        ) if both.any() else None,
        "image_size": size,
    }
    print(_json.dumps(report, indent=2))
    # AUROC gate: rank-based, so two probabilities within float tolerance
    # of each other can flip order and step AUROC by ~1/(n_pos·n_neg) even
    # when max|Δprob| ~ 1e-7 (random-weight towers cluster probs tightly,
    # so near-ties abound; with trained weights the spread makes this
    # vanish). The probability gate is the binding fidelity bar; the AUROC
    # gate only guards against systematic divergence.
    ok = (
        host_delta == 0
        and zero_fallbacks == 1
        and report["prob_max_abs_err"] < 2e-3
        and (report["auroc_max_abs_delta"] is None
             or report["auroc_max_abs_delta"] < 1e-2)
    )
    print("PARITY OK" if ok else "PARITY FAIL", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
