"""Command-line entry points.

Maps 1:1 onto the reference's runnable surfaces (SURVEY.md §1 layer 7 and
BASELINE.json configs):

  prep      01_datapreprocess: raw reports CSV → labeled CSV + unlabeled CSV
  pretrain  CLIP contrastive pretraining (notebook phase A / scripts path)
  adapter   frozen-CLIP C-Adapter training (notebook phase B)
  zeroshot  zero-shot evaluation (union-max or dynamic-threshold pipeline)
  gradcam   Grad-CAM saliency for one sample (--sample_index)
  eval      metric suite over a checkpoint on the held-out split
  serve     dynamic-batching HTTP inference server (beyond the reference:
            it has no serving surface — SURVEY.md §3.5 is a python helper)

Every command runs end-to-end on synthetic data when the Indiana images are
absent (--synthetic, auto-detected), so the pipelines stay executable in any
environment.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

import numpy as np


def _setup_logging(log_dir: str, name: str) -> None:
    os.makedirs(log_dir, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler(os.path.join(log_dir, f"{name}.log")),
        ],
    )


def _tokenizer(args):
    from ..text import BertTokenizer, build_tiny_vocab

    if args.vocab and os.path.exists(args.vocab):
        return BertTokenizer(args.vocab, do_lower_case=False)
    from ..core.config import DISEASE_LABELS

    logging.warning("no vocab file — building a synthetic dev vocabulary")
    words = (
        "this chest x-ray shows a of normal without any significant findings "
        "the radiological indicate image reveals characteristics diagnostic "
        "features are present demonstrates is typical case clear signs "
        "visible exhibits consistent with patterns suggest possible some may "
        "primary finding primarily one main evidence among other multiple "
        "conditions in no lobe lower right stable appearance compared prior "
        "exam mild associated effusion acute cardiopulmonary abnormality "
        "again noted cardiac silhouette and mediastinum size within limits"
    ).split()
    vocab = build_tiny_vocab(
        words
        + [w for d in DISEASE_LABELS for w in d.split()]
        + [w for d in DISEASE_LABELS for w in d.lower().split()]
    )
    return BertTokenizer(vocab)


def _apply_tiny(cfg, args, vocab_size: int):
    """--tiny: shrink towers for smoke runs; also size the text tower's
    vocabulary to the loaded tokenizer."""
    import dataclasses

    model = dataclasses.replace(cfg.model, vocab_size=vocab_size)
    if getattr(args, "fast_gelu", False):
        model = dataclasses.replace(model, vit_gelu_approximate=True)
    if getattr(args, "fused_mlp", False):
        if (
            (getattr(args, "tp", 1) or 1) > 1
            or (getattr(args, "pp", 0) or 0) > 1
            or (getattr(args, "ep", 1) or 1) > 1
        ):
            # opaque custom call: model-dim sharding can't partition
            # through the kernel (XLA would replicate the sharded
            # weights); the in-train eval step (deterministic=True) would
            # hit it even though the train step falls back. Row (dp)
            # sharding IS partitioned (ops/mlp_block custom_partitioning).
            raise SystemExit(
                "--fused-mlp composes with data parallelism only "
                "(not --tp/--pp/--ep)"
            )
        model = dataclasses.replace(model, vit_fused_mlp=True)
    if getattr(args, "bf16_attention_probs", False):
        model = dataclasses.replace(model, bf16_attention_probs=True)
    if getattr(args, "flash_attention", False):
        model = dataclasses.replace(model, flash_attention=True)
    if getattr(args, "bert_fused_mlp", False):
        model = dataclasses.replace(model, bert_fused_mlp=True)
    if getattr(args, "vit_fused_mlp_train", False):
        model = dataclasses.replace(model, vit_fused_mlp_train=True)
    if getattr(args, "moe_experts", 0):
        model = dataclasses.replace(
            model, text_moe_experts=args.moe_experts
        )
    if getattr(args, "learnable_temperature", False):
        loss = getattr(args, "loss", None) or cfg.train.loss
        model = dataclasses.replace(
            model, learnable_temperature=True,
            # siglip trains from the paper's operating point (s=10,
            # b=-10); the softmax losses start at the preset's fixed T
            logit_scale_init=10.0 if loss == "siglip" else None,
        )
    if getattr(args, "remat", False):
        model = dataclasses.replace(
            model, remat=True, remat_conv=True,
            remat_policy=getattr(args, "remat_policy", "full"),
        )
    if getattr(args, "tiny", False):
        model = dataclasses.replace(
            model,
            image_size=64, max_text_length=32, text_embedding_dim=64,
            text_layers=2, text_heads=2, text_intermediate_dim=128,
            shared_embedding_dim=64, resnet_stages=(1, 1, 1, 1),
            resnet_width=16, vit_layers=2, vit_hidden=64, vit_heads=2,
            vit_mlp_dim=128,
        )
    return cfg.replace(model=model)


def _model_and_state(cfg, args, tokenizer):
    import jax
    import jax.numpy as jnp

    from ..inference import load_trained_model

    compute = jnp.float32 if args.fp32 else jnp.bfloat16
    model, variables = load_trained_model(
        args.checkpoint, cfg, compute,
        allow_partial=getattr(args, "allow_partial_restore", False),
        use_ema=getattr(args, "use_ema", False),
        init_image_tower=getattr(args, "init_image_tower", None),
        init_text_tower=getattr(args, "init_text_tower", None),
    )
    return model, variables


def _apply_data_paths(cfg, args):
    """--reports-csv/--projections-csv/--image-dir override the preset."""
    import dataclasses

    updates = {}
    if getattr(args, "reports_csv", None):
        updates["reports_csv"] = args.reports_csv
    if getattr(args, "projections_csv", None):
        updates["projections_csv"] = args.projections_csv
    if getattr(args, "image_dir", None):
        updates["image_dir"] = args.image_dir
    if getattr(args, "batch_size", None):
        updates["batch_size"] = args.batch_size
    if updates:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, **updates))
    return cfg


def _loaders(cfg, args, multi_view=True):
    cfg = _apply_data_paths(cfg, args)
    from ..data import (
        ChestXrayMultiViewDataset,
        HostLoader,
        SyntheticImageTextDataset,
        SyntheticMultiViewDataset,
        build_exam_index,
        split_by_uid,
    )

    have_real = (
        not args.synthetic
        and os.path.exists(cfg.data.reports_csv)
        and os.path.exists(cfg.data.projections_csv)
        and os.path.isdir(cfg.data.image_dir)
    )
    if have_real:
        import pandas as pd

        from ..data import frame_to_image_text_dataset, merge_image_report

        cache = None
        dcache = None
        if getattr(args, "image_cache", None):
            from ..data import ImageCache

            cache = ImageCache(args.image_cache)
            logging.info(
                "image cache: %d preprocessed images from %s",
                len(cache), args.image_cache,
            )
            unsupported = [
                f for f in ("tp", "pp", "ep")
                if (getattr(args, f, 1) or 1) > 1
            ]
            import jax as _jax

            if _jax.process_count() > 1:
                # the upload would need per-process addressable shards of
                # a global mesh; multi-host keeps the streaming loader
                # (each process already feeds only its own slice)
                unsupported = unsupported or ["num-processes"]
            if getattr(args, "device_cache", False) and unsupported:
                logging.warning(
                    "--device-cache composes with dp only (got --%s) — "
                    "streaming instead", unsupported[0],
                )
            elif getattr(args, "device_cache", False):
                from ..data import DeviceCacheBudgetError, DeviceImageCache

                # dp runs need the gathers sharded over the same mesh the
                # step uses; replicating the resident array over N chips
                # costs N×225 MB — still nothing against HBM
                mesh = None
                n = _num_devices(args)
                if n > 1:
                    from ..core.mesh import create_mesh

                    mesh = create_mesh(n)
                try:
                    dcache = DeviceImageCache(cache, mesh=mesh)
                except DeviceCacheBudgetError as e:
                    logging.warning(
                        "--device-cache: %s — streaming instead", e
                    )
        elif getattr(args, "device_cache", False):
            raise SystemExit("--device-cache requires --image-cache")
        image_rows = dcache is not None
        reports = pd.read_csv(cfg.data.reports_csv)
        projections = pd.read_csv(cfg.data.projections_csv)
        merged = merge_image_report(projections, reports)
        train_f, val_f = split_by_uid(merged, cfg.data.test_size, cfg.data.seed)
        if multi_view:
            train_idx = build_exam_index(
                reports[reports.uid.isin(train_f.uid)], projections,
                cfg.data.image_dir,
            )
            val_idx = build_exam_index(
                reports[reports.uid.isin(val_f.uid)], projections,
                cfg.data.image_dir,
            )
            train_ds = ChestXrayMultiViewDataset(
                train_idx, cfg.model.image_size, cache=cache,
                image_rows=image_rows,
            )
            val_ds = ChestXrayMultiViewDataset(
                val_idx, cfg.model.image_size, cache=cache,
                image_rows=image_rows,
            )
        else:
            # CLIP pretrain: flat (image, report) pairs over every image
            # (02 nb cell 12 semantics — 4497 rows, not per-exam views)
            train_ds = frame_to_image_text_dataset(
                train_f, cfg.data.image_dir, cfg.model.image_size,
                cache=cache, image_rows=image_rows,
            )
            val_ds = frame_to_image_text_dataset(
                val_f, cfg.data.image_dir, cfg.model.image_size,
                cache=cache, image_rows=image_rows,
            )
    else:
        dcache = None
        if getattr(args, "device_cache", False):
            # same loudness as the missing --image-cache case: the user
            # asked for the device-resident feed and would otherwise get
            # silently streamed synthetic data
            raise SystemExit(
                "--device-cache requires the real dataset "
                "(reports/projections CSVs + --image-dir resolve), which "
                "was not found"
            )
        logging.warning("Indiana images unavailable — using synthetic data")
        n = args.synthetic_samples
        if multi_view:
            train_ds = SyntheticMultiViewDataset(n, cfg.model.image_size, 0)
            val_ds = SyntheticMultiViewDataset(n // 4, cfg.model.image_size, 1)
        else:
            train_ds = SyntheticImageTextDataset(n, cfg.model.image_size, 0)
            val_ds = SyntheticImageTextDataset(n // 4, cfg.model.image_size, 1)
    # train: drop the ragged final batch (a zero-padded sample would skew the
    # batch-global contrastive losses); eval: pad + mask so nothing is lost.
    import jax as _jax

    bs, shard_kwargs = cfg.data.batch_size, {}
    if _jax.process_count() > 1:
        # multi-host: each process loads its own strided shard and batches
        # at the per-process slice of the global batch
        from ..parallel.multihost import process_sharded_loader_kwargs

        shard_kwargs = process_sharded_loader_kwargs(cfg.data.batch_size)
        bs = shard_kwargs.pop("batch_size")
    train_loader = HostLoader(
        train_ds, bs, shuffle=True, seed=cfg.data.seed,
        num_threads=cfg.data.num_workers,
        drop_last=len(train_ds) > bs, pad_final=True, **shard_kwargs,
    )
    # eval keeps every sample: pad the shard (mask-0 repeats keep ranks
    # length-synchronized) instead of truncating like the train loader
    val_shard_kwargs = dict(shard_kwargs)
    if val_shard_kwargs.pop("even_shards", False):
        val_shard_kwargs["pad_shards"] = True
    val_loader = HostLoader(
        val_ds, bs, shuffle=False, seed=cfg.data.seed,
        num_threads=cfg.data.num_workers, pad_final=True,
        **val_shard_kwargs,
    )
    if dcache is not None:
        from ..data import DeviceFeedLoader

        train_loader = DeviceFeedLoader(train_loader, dcache)
        val_loader = DeviceFeedLoader(val_loader, dcache)
    return train_loader, val_loader


# ---------------------------------------------------------------------------
# commands
# ---------------------------------------------------------------------------


def _num_devices(args) -> int:
    return int(getattr(args, "num_devices", None) or 0)


def _step_images(batch, single_view: bool = False):
    """Image entry of a collated batch, ready for the jitted step. Host
    batches become contiguous numpy; batches already gathered on device
    by the --device-cache feed stay there (np.asarray here would drag the
    gathered batch BACK over the host link, defeating the cache). The
    multi-view → frontal-only select runs wherever the array lives."""
    import jax as _jax

    img = batch.get("image", batch.get("images"))
    if not isinstance(img, _jax.Array):
        img = np.asarray(img)
    if single_view and img.ndim == 5:
        img = img[:, 0]
    return img


def _effective_dp_devices(args) -> int:
    """The dp mesh size _maybe_dp will actually build: --num-devices, or
    the whole slice when running multi-process (where the mesh must cover
    every global device even if --num-devices was left unset)."""
    import jax

    n = _num_devices(args)
    if not n and jax.process_count() > 1:
        n = len(jax.devices())
    return n


def _inference_mesh(args, cfg):
    """Shared zeroshot/serve mesh setup: (data,) or (data, model) mesh per
    --num-devices/--tp, with the same TP divisibility contract the training
    paths enforce — an invalid degree dies here with a clear message
    instead of an opaque XLA uneven-sharding error at first batch."""
    if _num_devices(args) <= 1:
        return None
    tp = int(getattr(args, "tp", None) or 1)
    if tp > 1:
        from ..parallel import create_dp_tp_mesh, validate_tp

        try:
            validate_tp(
                cfg.model.text_heads, cfg.model.text_intermediate_dim, tp
            )
            if cfg.model.image_tower == "vit_b16":
                validate_tp(cfg.model.vit_heads, cfg.model.vit_mlp_dim, tp)
        except ValueError as e:
            raise SystemExit(str(e))
        return create_dp_tp_mesh(tp, num_devices=_num_devices(args))
    from ..core.mesh import create_mesh

    return create_mesh(_num_devices(args))


def _primary() -> bool:
    """True on the process that performs host-side writes (CSV/TB/logs).
    Always true single-process; process 0 on a pod."""
    import jax

    return jax.process_index() == 0


def _maybe_dp(args, cfg, raw_step, raw_eval, state, donate=False):
    """--num-devices N: wrap raw train/eval step fns in GSPMD data
    parallelism over a 1-D mesh (batches shard, params/opt state
    replicate, collectives ride ICI). N absent/1 → plain single-device
    jit, preserving each command's original behavior.

    Under ``--num-processes > 1`` the mesh covers the GLOBAL device list
    and each process's numpy batches are assembled into global arrays
    (``make_array_from_process_local_data``) before the step — the step
    function itself is unchanged between one host and a pod."""
    import jax

    multiproc = jax.process_count() > 1
    n = _num_devices(args)
    if multiproc and not n:
        n = len(jax.devices())  # a pod mesh must cover the whole slice
    if n <= 1:
        step = jax.jit(raw_step, donate_argnums=(0,) if donate else ())
        eval_step = jax.jit(raw_eval) if raw_eval is not None else None
        return step, eval_step, state
    bs = args.batch_size or cfg.data.batch_size
    if bs % n:
        raise SystemExit(
            f"--num-devices {n} must divide the batch size ({bs})"
        )
    from ..core.mesh import create_mesh
    from ..parallel import data_parallel_step, replicate_state

    mesh = create_mesh(n)
    logging.info(
        "data-parallel over %d devices (%d process%s): %s",
        n, jax.process_count(), "es" if multiproc else "", mesh,
    )
    step = data_parallel_step(raw_step, mesh, donate_state=donate)
    eval_step = (
        data_parallel_step(raw_eval, mesh, donate_state=False)
        if raw_eval is not None
        else None
    )
    if multiproc:
        from ..parallel.multihost import local_batch_to_global

        def assemble(fn):
            if fn is None:
                return None

            def wrapped(st, batch, *rest):
                return fn(
                    st, local_batch_to_global(dict(batch), mesh), *rest
                )

            return wrapped

        step, eval_step = assemble(step), assemble(eval_step)
    return step, eval_step, replicate_state(state, mesh)


def cmd_prep(args) -> int:
    from ..data.labels import prepare_labeled_csv

    df = prepare_labeled_csv(args.reports, args.out, args.unlabeled_out)
    print(f"labeled {len(df)} reports → {args.out}")
    return 0


def cmd_cache_images(args) -> int:
    """One-time decode+resize of the dataset into a memmap cache
    (data/cache.py); later runs pass --image-cache DIR to skip per-epoch
    cv2 decode entirely."""
    import time

    from ..data import build_image_cache

    if args.projections_csv and os.path.exists(args.projections_csv):
        import pandas as pd

        names = pd.read_csv(args.projections_csv)["filename"].astype(str)
        paths = [os.path.join(args.image_dir, n) for n in names]
    else:
        exts = (".png", ".jpg", ".jpeg")
        paths = sorted(
            os.path.join(root, f)
            for root, _, files in os.walk(args.image_dir)
            for f in files
            if f.lower().endswith(exts)
        )
    if not paths:
        print(f"error: no images found under {args.image_dir}",
              file=sys.stderr)
        return 2
    t0 = time.time()
    cache = build_image_cache(
        paths, args.image_size, args.out, workers=args.workers,
        channels=getattr(args, "channels", "auto"),
    )
    dt = time.time() - t0
    layout = "gray-packed (1ch)" if cache.channels == 1 else "rgb (3ch)"
    print(
        f"cached {len(cache)} images at {args.image_size}px {layout} → "
        f"{args.out} ({dt:.1f}s, {len(cache) / max(dt, 1e-9):.0f} img/s)"
    )
    return 0


def cmd_pretrain(args) -> int:
    import jax
    import jax.numpy as jnp

    from ..core.config import get_preset
    from ..core.prng import KeyChain
    from ..train import (
        TrainState,
        base_transform,
        fit,
        make_clip_eval_step,
        make_clip_pretrain_step,
        make_label_fn,
    )

    if args.lora < 0:
        print("error: --lora rank must be >= 1 (0 disables)", file=sys.stderr)
        return 2
    cfg = get_preset(args.preset)
    _setup_logging(args.log_dir, "pretrain")
    tokenizer = _tokenizer(args)
    cfg = _apply_tiny(cfg, args, len(tokenizer.vocab))
    model, variables = _model_and_state(cfg, args, tokenizer)
    compute = jnp.float32 if args.fp32 else jnp.bfloat16

    tx = base_transform(
        cfg.train.max_grad_norm, cfg.train.weight_decay,
        moment_dtype=(
            jnp.bfloat16 if getattr(args, "bf16_moments", False) else None
        ),
    )
    groups = {g.name: g.lr for g in cfg.train.groups} or {"default": cfg.train.lr}
    groups.setdefault("default", cfg.train.lr)
    label_fn = make_label_fn([g for g in groups if g != "default"])

    train_loader, val_loader = _loaders(cfg, args, multi_view=False)
    max_len = cfg.model.max_text_length

    if getattr(args, "length_grouped", False):
        if not args.bucket_text:
            raise SystemExit(
                "--length-grouped requires --bucket-text (grouping only "
                "pays off when batches pad to their own bucket)"
            )
        ds = train_loader.dataset
        texts = getattr(ds, "texts", None)
        if texts is None and hasattr(ds, "base"):  # synthetic wrapper
            # read the precomputed findings list — indexing ds itself would
            # synthesize (and discard) every image just to reach the text
            texts = ds.base.findings
        if texts is None:
            raise SystemExit("--length-grouped needs a text dataset")
        # one host-side tokenize pass; lengths key the windowed sort
        enc_lens = tokenizer.encode(
            list(texts), max_length=max_len, padding="longest"
        )["attention_mask"].sum(1)
        train_loader.set_lengths(enc_lens)
        logging.info(
            "length-grouped batching: %d samples, token length p50=%d "
            "p90=%d max=%d",
            len(enc_lens), int(np.percentile(enc_lens, 50)),
            int(np.percentile(enc_lens, 90)), int(enc_lens.max()),
        )

    def tokenize_batch(batch):
        texts = batch.get("text") or batch.get("findings")
        if args.bucket_text:
            # length bucketing: identical outputs (masked attention), but
            # short reports skip most of the 200/512-token pad compute
            enc = tokenizer.encode_bucketed(
                list(texts), max_length=max_len,
                buckets=(32, 64, 128),
            )
        else:
            enc = tokenizer.encode(list(texts), max_length=max_len)
        return {
            # multi-view → frontal only for pretrain
            "images": _step_images(batch, single_view=True),
            "input_ids": enc["input_ids"],
            "attention_mask": enc["attention_mask"],
        }

    loss_name = (
        cfg.train.loss
        if cfg.train.loss in ("clip_self_distill", "info_nce", "siglip")
        else "clip_self_distill"
    )
    if getattr(args, "loss", None):
        loss_name = args.loss
    if args.lora:
        if getattr(args, "local_loss", False):
            raise SystemExit("--local-loss does not compose with --lora")
        if getattr(args, "ema_decay", 0.0):
            raise SystemExit("--ema-decay does not compose with --lora "
                             "(adapter params train, not the towers)")
        if int(getattr(args, "accum_steps", 1) or 1) > 1:
            raise SystemExit("--accum-steps does not compose with --lora")
        if getattr(args, "learnable_temperature", False):
            raise SystemExit(
                "--learnable-temperature does not compose with --lora "
                "(the LoRA step trains adapter deltas only — the "
                "calibration scalars would receive no gradient)"
            )
        # Parameter-efficient fine-tuning: frozen towers + rank-r deltas on
        # the attention/MLP kernels (models/lora.py). The frozen base rides
        # through the jitted step as an argument, not a constant.
        from ..models import init_lora, lora_param_count
        from ..models.lora import make_lora_pretrain_step, merge_lora

        lora = init_lora(
            jax.random.key(cfg.data.seed), variables["params"],
            rank=args.lora,
        )
        frozen = jax.device_put(variables)
        logging.info(
            "LoRA rank %d: %d trainable params (%.2f%% of the model)",
            args.lora, lora_param_count(lora),
            100 * lora_param_count(lora)
            / sum(int(x.size) for x in jax.tree.leaves(variables["params"])),
        )
        lora_step = jax.jit(make_lora_pretrain_step(
            model, tx, loss_name, cfg.model.temperature, args.lora_alpha,
            cfg.model.image_size, cfg.augment.mean, cfg.augment.std, compute,
        ))

        def step(state, batch, lrs, rng):
            return lora_step(state, frozen, batch, lrs, rng)

        # validation must score the SAME objective the LoRA step trains —
        # it drives ReduceLROnPlateau, early stopping and best-ckpt choice
        base_eval = make_clip_eval_step(
            model, loss_name, cfg.model.temperature,
            cfg.model.image_size, cfg.augment.mean, cfg.augment.std, compute,
        )

        @jax.jit
        def lora_eval(lora_params, frozen_vars, batch):
            merged = TrainState(
                params=merge_lora(
                    frozen_vars["params"], lora_params, args.lora_alpha
                ),
                batch_stats=frozen_vars.get("batch_stats", {}),
                opt_state=(), step=jnp.zeros((), jnp.int32),
            )
            return base_eval(merged, batch)

        def eval_step(state, batch):
            return lora_eval(state.params, frozen, batch)

        state = TrainState(
            params=lora, batch_stats={}, opt_state=tx.init(lora),
            step=jnp.zeros((), jnp.int32),
        )
    else:
        ema_decay = float(getattr(args, "ema_decay", 0.0) or 0.0)
        if ema_decay and (getattr(args, "pp", 0) or 0) > 1:
            raise SystemExit("--ema-decay does not compose with --pp "
                             "(the stacked stage layout)")
        if ema_decay and (getattr(args, "ep", 1) or 1) > 1:
            raise SystemExit("--ema-decay does not compose with --ep")
        local_mesh = None
        if getattr(args, "local_loss", False):
            # open-CLIP local-loss block form: [b, B] similarity blocks
            # inside shard_map instead of B² on every device
            if _effective_dp_devices(args) <= 1:
                raise SystemExit(
                    "--local-loss requires a dp mesh (--num-devices > 1, "
                    "or a multi-process run whose slice has > 1 device)"
                )
            if (getattr(args, "pp", 0) or 0) > 1 or (
                getattr(args, "ep", 1) or 1
            ) > 1:
                raise SystemExit(
                    "--local-loss composes with plain --num-devices data "
                    "parallelism only (not --pp/--ep)"
                )
            from ..core.mesh import create_mesh

            local_mesh = create_mesh(_effective_dp_devices(args))
        accum = int(getattr(args, "accum_steps", 1) or 1)
        if accum > 1:
            # GradCache two-pass accumulation: microbatched towers,
            # full-batch contrastive negatives, gradient-exact
            if local_mesh is not None:
                raise SystemExit(
                    "--accum-steps does not compose with --local-loss"
                )
            if (getattr(args, "pp", 0) or 0) > 1 or (
                getattr(args, "ep", 1) or 1
            ) > 1:
                raise SystemExit(
                    "--accum-steps composes with plain dp only (not "
                    "--pp/--ep)"
                )
            if getattr(args, "learnable_temperature", False):
                raise SystemExit(
                    "--learnable-temperature does not compose with "
                    "--accum-steps (the GradCache step caches features at "
                    "a fixed temperature — the scalars would silently "
                    "train at zero gradient)"
                )
            from ..train import make_accum_clip_pretrain_step

            try:
                raw_step = make_accum_clip_pretrain_step(
                    model, tx, label_fn, accum, loss_name,
                    cfg.model.temperature, cfg.model.image_size,
                    cfg.augment.mean, cfg.augment.std, compute,
                    ema_decay=ema_decay,
                )
            except ValueError as e:  # MoE guard
                raise SystemExit(str(e))
        else:
            raw_step = make_clip_pretrain_step(
                model, tx, label_fn, loss_name,
                cfg.model.temperature, cfg.model.image_size,
                cfg.augment.mean, cfg.augment.std, compute,
                local_loss_mesh=local_mesh, ema_decay=ema_decay,
            )
        raw_eval = make_clip_eval_step(
            model, loss_name, cfg.model.temperature,
            cfg.model.image_size, cfg.augment.mean, cfg.augment.std,
            compute, use_ema=bool(ema_decay),
        )
        step = eval_step = None  # wrapped after resume (placement-aware)
        state = TrainState.create(variables, tx, ema=bool(ema_decay))
    from ..evals import MetricWriter
    from ..train import PreemptionGuard, resume_or_init

    kc = KeyChain(cfg.data.seed)

    ckpt = None
    if args.checkpoint_dir:
        from ..train import CheckpointManager

        ckpt = CheckpointManager(
            args.checkpoint_dir, cfg.train.max_checkpoints_to_keep
        )
    pp = getattr(args, "pp", 0) or 0
    if args.lora and pp > 1:
        raise SystemExit("--pp does not compose with --lora")
    if pp > 1 and getattr(args, "learnable_temperature", False):
        raise SystemExit(
            "--learnable-temperature does not compose with --pp (the "
            "staged step computes the loss at the fixed temperature)"
        )
    if args.lora:
        pp = 0
    if pp > 1:
        # pipeline parallelism: text-tower blocks staged over a
        # (data, stage) mesh; checkpoints written during the run hold the
        # stacked layout (resume requires the same --pp flags), and a
        # canonical unstacked copy is written at the end for
        # zeroshot/serve. Validations + the template restack must happen
        # BEFORE resume_or_init so orbax restores against the stacked
        # structure the in-run checkpoints actually have.
        if (getattr(args, "ep", 1) or 1) > 1:
            raise SystemExit("--pp does not compose with --ep")
        if cfg.model.text_moe_experts:
            raise SystemExit("--pp does not compose with --moe-experts")
        from ..parallel import (
            create_dp_pp_mesh,
            make_pp_clip_pretrain_step,
            pipeline_parallel_step,
            pp_train_state,
            shard_state_pp,
            unpp_params,
            validate_pp,
        )

        n = _num_devices(args) or pp
        bs = args.batch_size or cfg.data.batch_size
        if n % pp:
            raise SystemExit(f"--num-devices {n} must divide into --pp {pp}")
        try:
            validate_pp(cfg.model.text_layers, pp, args.pp_microbatches, bs)
        except ValueError as e:
            raise SystemExit(str(e))
        if (bs // args.pp_microbatches) % (n // pp):
            raise SystemExit(
                f"microbatch size {bs // args.pp_microbatches} must divide "
                f"over the data axis ({n // pp})"
            )
        # restack params AND optimizer moments (Adam mu/nu mirror the
        # param tree) into pipeline layout
        dense_state = state
        state = pp_train_state(state, pp)
    try:
        state, start_epoch = resume_or_init(ckpt, state, loader=train_loader)
    except Exception:
        if pp <= 1:
            raise
        # the checkpoint dir may hold a DENSE (non-pp) checkpoint, e.g.
        # continuing an earlier plain pretrain with --pp: restore against
        # the canonical layout, then restack
        state, start_epoch = resume_or_init(
            ckpt, dense_state, loader=train_loader
        )
        state = pp_train_state(state, pp)
    if args.lora:
        if _num_devices(args) > 1:
            raise SystemExit("--num-devices is not supported with --lora")
    elif pp > 1:
        mesh = create_dp_pp_mesh(pp, num_devices=n)
        logging.info(
            "pipeline-parallel over %s (%d microbatches)",
            mesh, args.pp_microbatches,
        )
        pp_raw = make_pp_clip_pretrain_step(
            model, tx, label_fn, mesh, args.pp_microbatches, loss_name,
            cfg.model.temperature, cfg.model.image_size,
            cfg.augment.mean, cfg.augment.std, compute,
        )
        state = shard_state_pp(state, mesh)
        _pp_step = pipeline_parallel_step(
            pp_raw, mesh, donate_state=cfg.train.donate_state
        )
        _eval_jit = jax.jit(raw_eval)
        _eval_cache = {}

        def step(s, batch, lrs_, rng_):
            # a train step means the eval pass is over — release the
            # replicated unstacked copy so it doesn't negate pp's
            # per-stage memory footprint during training
            _eval_cache.clear()
            return _pp_step(s, batch, lrs_, rng_)

        def eval_step(s, batch):
            # unstack once per eval pass (state is constant within it),
            # keyed on the step counter
            key = int(s.step)
            if _eval_cache.get("key") != key:
                _eval_cache["key"] = key
                _eval_cache["params"] = unpp_params(s.params)
            return _eval_jit(
                s.replace(params=_eval_cache["params"]), batch
            )

    elif (getattr(args, "ep", 1) or 1) > 1:
        # expert parallelism: MoE expert weights sharded over a
        # (data, expert) mesh; checkpoint layout is unchanged.
        if not cfg.model.text_moe_experts:
            raise SystemExit("--ep requires --moe-experts")
        from ..parallel import (
            create_dp_ep_mesh,
            expert_parallel_step,
            shard_state_ep,
            validate_ep,
        )

        ep_deg = args.ep
        n = _num_devices(args) or ep_deg
        if n % ep_deg:
            raise SystemExit(
                f"--num-devices {n} must divide into --ep {ep_deg}"
            )
        try:
            validate_ep(cfg.model.text_moe_experts, ep_deg)
        except ValueError as e:
            raise SystemExit(str(e))
        bs = args.batch_size or cfg.data.batch_size
        if bs % (n // ep_deg):
            raise SystemExit(
                f"batch size {bs} must divide over the data axis "
                f"({n // ep_deg})"
            )
        mesh = create_dp_ep_mesh(ep_deg, num_devices=n)
        logging.info("expert-parallel over %s", mesh)
        state = shard_state_ep(state, mesh)
        step = expert_parallel_step(
            raw_step, mesh, donate_state=cfg.train.donate_state
        )
        eval_step = expert_parallel_step(raw_eval, mesh, donate_state=False)
    else:
        step, eval_step, state = _maybe_dp(
            args, cfg, raw_step, raw_eval, state,
            donate=cfg.train.donate_state,
        )
    writer = MetricWriter(args.log_dir, "pretrain") if _primary() else None

    with PreemptionGuard() as guard:
        state, history = fit(
            state, step, eval_step,
            train_loader_fn=lambda: map(tokenize_batch, train_loader),
            val_loader_fn=lambda: map(tokenize_batch, val_loader),
            base_lrs=groups,
            num_epochs=args.epochs or cfg.train.num_epochs,
            rng_stream=kc.stream("dropout"),
            scheduler=cfg.train.scheduler,
            eta_min=cfg.train.eta_min,
            plateau_patience=cfg.train.plateau_patience,
            plateau_factor=cfg.train.plateau_factor,
            early_stop_patience=cfg.train.early_stop_patience,
            checkpointer=ckpt,
            start_epoch=start_epoch,
            log_every=cfg.train.log_every,
            preemption_guard=guard,
            metric_writer=writer,
            stateful_loader=train_loader,
            warmup_steps=int(getattr(args, "warmup_steps", 0) or 0),
        )
    if writer is not None:
        writer.close()
    if _primary():
        history.save_csv(
            os.path.join(args.log_dir, "training_history.csv")
        )
    if args.lora and args.checkpoint_dir:
        # the LoRA checkpoint holds only the factors (for resume); also
        # fold them into the frozen base and save a full-model checkpoint
        # that zeroshot/serve/eval --checkpoint can load directly
        from ..models import fold_lora
        from ..train import CheckpointManager

        folded = fold_lora(
            jax.tree.map(np.asarray, frozen), state.params, args.lora_alpha
        )
        folded_dir = os.path.join(args.checkpoint_dir, "folded")
        fm = CheckpointManager(folded_dir, max_to_keep=1)
        fm.save(0, {"params": folded["params"],
                    "batch_stats": folded.get("batch_stats", {})})
        fm.wait()
        fm.close()
        print(f"folded LoRA model saved to {folded_dir} "
              f"(servable: --checkpoint {folded_dir})")
    if pp > 1 and args.checkpoint_dir:
        # in-run checkpoints hold the stage-stacked layout (resume with
        # the same --pp); write a canonical unstacked full-model copy that
        # zeroshot/serve/eval --checkpoint can load directly
        from ..parallel import unpp_params
        from ..train import CheckpointManager

        canon = {
            "params": unpp_params(jax.tree.map(np.asarray, state.params)),
            "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
        }
        canon_dir = os.path.join(args.checkpoint_dir, "unstacked")
        fm = CheckpointManager(canon_dir, max_to_keep=1)
        fm.save(0, canon)
        fm.wait()
        fm.close()
        print(f"canonical model checkpoint saved to {canon_dir} "
              f"(servable: --checkpoint {canon_dir})")
    print(f"pretrain done: {len(history.rows)} epochs")
    return 0


def cmd_train(args) -> int:
    """Scripts-path training (0426/train.py semantics): multi-view exams,
    per-epoch prompt text features, multilabel contrastive (or asymmetric
    with cross-modal enhancement), cosine schedule."""
    import jax
    import jax.numpy as jnp

    from ..core.config import DISEASE_LABELS, get_preset
    from ..core.prng import KeyChain
    from ..evals import MetricWriter
    from ..train import (
        PreemptionGuard,
        TrainState,
        base_transform,
        fit,
        make_label_fn,
        make_multiview_eval_step,
        make_multiview_train_step,
        resume_or_init,
    )
    from ..zeroshot import prompts_for_family
    from ..zeroshot.engine import encode_prompt_bank

    cfg = get_preset(args.preset)
    _setup_logging(args.log_dir, "train")
    tokenizer = _tokenizer(args)
    cfg = _apply_tiny(cfg, args, len(tokenizer.vocab))
    model, variables = _model_and_state(cfg, args, tokenizer)
    compute = jnp.float32 if args.fp32 else jnp.bfloat16
    use_enhance = cfg.model.use_multimodal_attention

    tx = base_transform(cfg.train.max_grad_norm, cfg.train.weight_decay)
    label_fn = make_label_fn([])
    raw_step = make_multiview_train_step(
        model, tx, label_fn,
        temperature=cfg.model.temperature,
        image_size=cfg.model.image_size,
        mean=cfg.augment.mean, std=cfg.augment.std,
        compute_dtype=compute, use_enhance=use_enhance,
        # the scripts' train transform stack, on device
        # (0425/prepare_data.py:39-55; eval stays un-augmented)
        augment=cfg.augment.enabled,
        flip_prob=cfg.augment.horizontal_flip_prob,
        rotation_degrees=cfg.augment.rotation_degrees,
        translate_frac=cfg.augment.translate_frac,
    )
    raw_eval = make_multiview_eval_step(
        model, cfg.model.temperature, cfg.model.image_size,
        cfg.augment.mean, cfg.augment.std, compute,
        use_enhance=use_enhance,
    )
    train_loader, val_loader = _loaders(cfg, args, multi_view=True)
    prompts = prompts_for_family("prediction", DISEASE_LABELS)

    def epoch_text_features(state):
        # per-epoch precompute with the CURRENT text tower (0426 hoisting)
        variables = state.to_variables()
        feats = encode_prompt_bank(
            prompts, DISEASE_LABELS,
            lambda ids, mask: model.apply(
                variables, ids, mask, normalize=True, method="encode_text"
            ),
            tokenizer, cfg.model.max_text_length,
        )
        return (feats,)

    def clean(batch):
        return {
            "images": _step_images(batch),
            "labels": np.asarray(batch["labels"]),
        }

    ckpt = None
    if args.checkpoint_dir:
        from ..train import CheckpointManager

        ckpt = CheckpointManager(
            args.checkpoint_dir, cfg.train.max_checkpoints_to_keep
        )
    # NOTE: EMA stays a pretrain-only feature — the multiview loss scores
    # image features against the epoch-hoisted prompt bank, and a smoothed
    # image tower against live-tower text features would mix weight sets.
    state = TrainState.create(variables, tx)
    state, start_epoch = resume_or_init(ckpt, state, loader=train_loader)
    step, eval_step, state = _maybe_dp(args, cfg, raw_step, raw_eval, state)
    writer = MetricWriter(args.log_dir, "train") if _primary() else None
    kc = KeyChain(cfg.data.seed)
    with PreemptionGuard() as guard:
        state, history = fit(
            state, step, eval_step,
            train_loader_fn=lambda: map(clean, train_loader),
            val_loader_fn=lambda: map(clean, val_loader),
            base_lrs={"default": cfg.train.lr},
            num_epochs=args.epochs or cfg.train.num_epochs,
            rng_stream=kc.stream("dropout"),
            scheduler=cfg.train.scheduler,
            eta_min=cfg.train.eta_min,
            early_stop_patience=cfg.train.early_stop_patience,
            epoch_args_fn=epoch_text_features,
            checkpointer=ckpt,
            start_epoch=start_epoch,
            log_every=cfg.train.log_every,
            preemption_guard=guard,
            metric_writer=writer,
            stateful_loader=train_loader,
            warmup_steps=int(getattr(args, "warmup_steps", 0) or 0),
        )
    if writer is not None:
        writer.close()
    if _primary():
        history.save_csv(
            os.path.join(args.log_dir, "training_history.csv")
        )
    print(f"train done: {len(history.rows)} epochs")
    return 0


def cmd_shared_adapter(args) -> int:
    """03-notebook shared-embedding adapter: Linear over concat(img, text)."""
    import jax
    import jax.numpy as jnp

    from ..core.config import get_preset
    from ..core.prng import KeyChain
    from ..train import (
        TrainState,
        base_transform,
        fit,
        freeze_mask,
        make_label_fn,
        make_shared_adapter_train_step,
    )

    cfg = get_preset("adapter")
    _setup_logging(args.log_dir, "shared_adapter")
    tokenizer = _tokenizer(args)
    cfg = _apply_tiny(cfg, args, len(tokenizer.vocab))
    model, variables = _model_and_state(cfg, args, tokenizer)
    compute = jnp.float32 if args.fp32 else jnp.bfloat16
    tx = base_transform(None, 0.0)
    label_fn = make_label_fn(["shared_adapter"])
    freeze = freeze_mask(variables["params"], ["shared_adapter"])
    raw_step = make_shared_adapter_train_step(
        model, tx, label_fn, freeze, cfg.model.image_size,
        cfg.augment.mean, cfg.augment.std, compute,
    )
    from ..train import make_shared_adapter_eval_step

    raw_eval = make_shared_adapter_eval_step(
        model, cfg.model.image_size, cfg.augment.mean, cfg.augment.std,
        compute,
    )
    train_loader, val_loader = _loaders(cfg, args, multi_view=True)
    max_len = cfg.model.max_text_length

    def to_batch(batch):
        imgs = _step_images(batch, single_view=True)
        texts = batch.get("findings") or batch.get("text")
        if args.bucket_text:
            enc = tokenizer.encode_bucketed(
                list(texts), max_length=max_len, buckets=(32, 64, 128)
            )
        else:
            enc = tokenizer.encode(list(texts), max_length=max_len)
        return {
            "images": imgs,
            "input_ids": enc["input_ids"],
            "attention_mask": enc["attention_mask"],
            "labels": np.asarray(batch["labels"]),
        }

    ckpt = None
    if args.checkpoint_dir:
        from ..train import CheckpointManager

        ckpt = CheckpointManager(
            args.checkpoint_dir, cfg.train.max_checkpoints_to_keep
        )
    from ..train import resume_or_init

    state = TrainState.create(variables, tx)
    state, start_epoch = resume_or_init(ckpt, state)
    step, eval_step, state = _maybe_dp(args, cfg, raw_step, raw_eval, state)
    kc = KeyChain(cfg.data.seed)
    state, history = fit(
        state, step, eval_step,
        train_loader_fn=lambda: map(to_batch, train_loader),
        val_loader_fn=lambda: map(to_batch, val_loader),
        base_lrs={"shared_adapter": cfg.train.lr, "default": 0.0},
        num_epochs=args.epochs or cfg.train.num_epochs,
        rng_stream=kc.stream("dropout"),
        scheduler="none",
        early_stop_patience=None,
        checkpointer=ckpt,
        start_epoch=start_epoch,
        log_every=cfg.train.log_every,
    )
    history.save_csv(
        os.path.join(args.log_dir, "shared_adapter_history.csv")
    )
    # final test-set suite from the shared-embedding adapter logits — the
    # 03-notebook metric family (cell 30: F1 micro 0.6224 / mAP 0.2911 /
    # LRAP 0.7809 BASELINE.md rows; needs report text at inference, which
    # is why the reference abandoned it — preserved here as built)
    if _primary():
        from ..core.config import DISEASE_LABELS
        from ..evals.metrics import multilabel_metrics
        from ..train import run_eval
        from ..utils.visualization import save_predictions_csv

        val = run_eval(eval_step, state, map(to_batch, val_loader))
        metrics = multilabel_metrics(
            val["probs"], val["labels"], class_names=DISEASE_LABELS
        )
        save_predictions_csv(
            val["probs"], val["labels"], DISEASE_LABELS,
            os.path.join(args.log_dir, "shared_adapter_predictions.csv"),
        )
        with open(os.path.join(args.log_dir,
                               "shared_adapter_metrics.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        print(json.dumps(
            {k: v for k, v in metrics.items()
             if not k.startswith("auroc/")},
            indent=2,
        ))
    print(f"shared-adapter done: {len(history.rows)} epochs")
    return 0


def cmd_adapter(args) -> int:
    import jax
    import jax.numpy as jnp

    from ..core.config import DISEASE_LABELS, get_preset
    from ..core.prng import KeyChain
    from ..train import (
        TrainState,
        base_transform,
        fit,
        freeze_mask,
        make_adapter_eval_step,
        make_adapter_train_step,
        make_label_fn,
        resume_or_init,
    )

    cfg = get_preset("adapter")
    _setup_logging(args.log_dir, "adapter")
    tokenizer = _tokenizer(args)
    cfg = _apply_tiny(cfg, args, len(tokenizer.vocab))
    model, variables = _model_and_state(cfg, args, tokenizer)
    compute = jnp.float32 if args.fp32 else jnp.bfloat16

    tx = base_transform(None, 0.0)
    label_fn = make_label_fn(["adapter"])
    freeze = freeze_mask(variables["params"], ["adapter"])
    raw_step = make_adapter_train_step(
        model, tx, label_fn, freeze, cfg.model.image_size,
        cfg.augment.mean, cfg.augment.std, compute,
    )
    raw_eval = make_adapter_eval_step(
        model, cfg.model.image_size, cfg.augment.mean, cfg.augment.std,
        compute,
    )
    train_loader, val_loader = _loaders(cfg, args, multi_view=True)

    def to_single_view(batch):
        return {"images": _step_images(batch, single_view=True),
                "labels": np.asarray(batch["labels"]),
                "mask": batch.get("mask")}

    ckpt = None
    if args.checkpoint_dir:
        from ..train import CheckpointManager

        ckpt = CheckpointManager(
            args.checkpoint_dir, cfg.train.max_checkpoints_to_keep
        )
    state = TrainState.create(variables, tx)
    state, start_epoch = resume_or_init(ckpt, state)
    step, eval_step, state = _maybe_dp(args, cfg, raw_step, raw_eval, state)
    kc = KeyChain(cfg.data.seed)
    state, history = fit(
        state, step, eval_step,
        train_loader_fn=lambda: map(to_single_view, train_loader),
        val_loader_fn=lambda: map(to_single_view, val_loader),
        base_lrs={"adapter": cfg.train.lr, "default": 0.0},
        num_epochs=args.epochs or cfg.train.num_epochs,
        rng_stream=kc.stream("dropout"),
        scheduler="none",
        early_stop_patience=cfg.train.early_stop_patience,
        checkpointer=ckpt,
        start_epoch=start_epoch,
        log_every=cfg.train.log_every,
    )
    history.save_csv(os.path.join(args.log_dir, "adapter_history.csv"))
    # final test-set suite from the ADAPTER logits — the metric family the
    # reference publishes for phase B (02 nb cell 30: Jaccard / Hamming /
    # F1 / mAP / LRAP; BASELINE.md "C-Adapter" rows) plus per-class AUROC
    if _primary():
        from ..evals.metrics import multilabel_metrics
        from ..train import run_eval
        from ..utils.visualization import save_predictions_csv

        val = run_eval(
            eval_step, state, map(to_single_view, val_loader)
        )
        metrics = multilabel_metrics(
            val["probs"], val["labels"], class_names=DISEASE_LABELS
        )
        save_predictions_csv(
            val["probs"], val["labels"], DISEASE_LABELS,
            os.path.join(args.log_dir, "adapter_predictions.csv"),
        )
        with open(os.path.join(args.log_dir, "adapter_metrics.json"),
                  "w") as f:
            json.dump(metrics, f, indent=2)
        print(json.dumps(
            {k: v for k, v in metrics.items()
             if not k.startswith("auroc/")},
            indent=2,
        ))
    print(f"adapter done: {len(history.rows)} epochs")
    return 0


def cmd_zeroshot(args) -> int:
    import jax.numpy as jnp

    from ..core.config import DISEASE_LABELS, get_preset
    from ..zeroshot import (
        ZeroShotEngine,
        prompts_for_family,
        run_dynamic_threshold_eval,
        run_zero_shot_eval,
    )

    cfg = get_preset(args.preset)
    _setup_logging(args.log_dir, "zero_shot")
    tokenizer = _tokenizer(args)
    cfg = _apply_tiny(cfg, args, len(tokenizer.vocab))
    model, variables = _model_and_state(cfg, args, tokenizer)
    mesh = _inference_mesh(args, cfg)
    engine = ZeroShotEngine(
        model, variables, tokenizer, DISEASE_LABELS, cfg.zeroshot,
        cfg.augment.mean, cfg.augment.std, cfg.model.image_size,
        cfg.model.max_text_length,
        jnp.float32 if args.fp32 else jnp.bfloat16,
        use_enhance=cfg.model.use_multimodal_attention,
        mesh=mesh,
    )
    engine.build_text_features(
        prompts_for_family(args.prompts, DISEASE_LABELS)
    )
    _, val_loader = _loaders(cfg, args, multi_view=True)
    csv = os.path.join(args.log_dir, "zero_shot_results.csv")
    if args.dynamic or cfg.zeroshot.dynamic_thresholds:
        out = run_dynamic_threshold_eval(
            engine, lambda: iter(val_loader),
            cfg.zeroshot.threshold_calib_frac,
            cfg.zeroshot.threshold_grid_points,
            cfg.zeroshot.frontal_weight, cfg.zeroshot.lateral_weight,
            csv_path=csv,
        )
        print(json.dumps({"thresholds": out["thresholds"]}, indent=2))
        # persist the calibration so `serve --thresholds` / later evals can
        # reuse it without re-running the two-pass pipeline
        tpath = os.path.join(args.log_dir, "thresholds.json")
        with open(tpath, "w") as f:
            json.dump(out["thresholds"], f, indent=2)
        logging.info("calibrated thresholds → %s", tpath)
    else:
        out = run_zero_shot_eval(engine, val_loader, cfg.zeroshot.top_k, csv)
    print(json.dumps(
        {k: v for k, v in out["metrics"].items() if not k.startswith("auroc/")},
        indent=2,
    ))
    return 0


def cmd_gradcam(args) -> int:
    import jax.numpy as jnp

    from ..core.config import DISEASE_LABELS, get_preset
    from ..interpret import gradcam, overlay_cam, upsample_cam
    from ..ops.image_prep import preprocess_images
    from ..zeroshot import prompts_for_family
    from ..zeroshot.engine import encode_prompt_bank

    cfg = get_preset(args.preset)
    _setup_logging(args.log_dir, "gradcam")
    tokenizer = _tokenizer(args)
    cfg = _apply_tiny(cfg, args, len(tokenizer.vocab))
    model, variables = _model_and_state(cfg, args, tokenizer)
    _, val_loader = _loaders(cfg, args, multi_view=True)

    # find the batch containing the requested sample
    idx = args.sample_index
    for batch in val_loader:
        if idx < len(batch["labels"]):
            break
        idx -= len(batch["labels"])
    views = np.asarray(batch["images"])[idx]  # [2, H, W, 3]
    labels = np.asarray(batch["labels"])[idx]

    import jax

    text_features = encode_prompt_bank(
        prompts_for_family("prediction", DISEASE_LABELS), DISEASE_LABELS,
        lambda ids, mask: model.apply(
            variables, ids, mask, normalize=True, method="encode_text"
        ),
        tokenizer, cfg.model.max_text_length,
    )
    x = preprocess_images(
        jnp.asarray(views), cfg.model.image_size, cfg.model.image_size,
        cfg.augment.mean, cfg.augment.std, jnp.float32,
    )
    cams, scores = gradcam(model, variables, x, text_features)
    positive = [i for i, v in enumerate(labels) if v > 0] or [0]
    out_dir = os.path.join(args.log_dir, "gradcam")
    os.makedirs(out_dir, exist_ok=True)
    from ..utils.visualization import save_or_show_image

    written = []
    for c in positive:
        for v, view_name in enumerate(("frontal", "lateral")):
            cam = upsample_cam(
                cams[c, v : v + 1], cfg.model.image_size, cfg.model.image_size
            )[0]
            img01 = (np.asarray(views[v], np.float32) / 255.0)
            overlay = overlay_cam(jnp.asarray(img01), cam)
            path = os.path.join(
                out_dir,
                f"sample{args.sample_index}_{DISEASE_LABELS[c].replace(' ', '_')}"
                f"_{view_name}.png",
            )
            save_or_show_image(np.asarray(overlay), path,
                               f"{DISEASE_LABELS[c]} ({view_name})")
            written.append(path)
    print(f"wrote {len(written)} Grad-CAM overlays to {out_dir}")
    return 0


def cmd_rollout(args) -> int:
    """ViT attention-rollout saliency for one sample (vit nb cell 34)."""
    import jax.numpy as jnp

    from ..core.config import get_preset
    from ..interpret.gradcam import overlay_cam, upsample_cam
    from ..ops.image_prep import preprocess_images
    from ..utils.visualization import save_or_show_image

    cfg = get_preset("vit")
    _setup_logging(args.log_dir, "rollout")
    tokenizer = _tokenizer(args)
    cfg = _apply_tiny(cfg, args, len(tokenizer.vocab))
    model, variables = _model_and_state(cfg, args, tokenizer)
    _, val_loader = _loaders(cfg, args, multi_view=True)

    idx = args.sample_index
    for batch in val_loader:
        if idx < len(batch["labels"]):
            break
        idx -= len(batch["labels"])
    views = np.asarray(batch["images"])[idx]

    x = preprocess_images(
        jnp.asarray(views), cfg.model.image_size, cfg.model.image_size,
        cfg.augment.mean, cfg.augment.std, jnp.float32,
    )
    mask = _rollout_via_clip(model, variables, x, args)
    out_dir = os.path.join(args.log_dir, "rollout")
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for v, view_name in enumerate(("frontal", "lateral")):
        up = upsample_cam(
            mask[v : v + 1], cfg.model.image_size, cfg.model.image_size
        )[0]
        img01 = np.asarray(views[v], np.float32) / 255.0
        overlay = overlay_cam(jnp.asarray(img01), up)
        path = os.path.join(
            out_dir, f"sample{args.sample_index}_{view_name}.png"
        )
        save_or_show_image(np.asarray(overlay), path,
                           f"attention rollout ({view_name})")
        written.append(path)
    print(f"wrote {len(written)} rollout overlays to {out_dir}")
    return 0


def _rollout_via_clip(model, variables, images, args):
    """Run the composite model's ViT tower with attention sowing."""
    from ..interpret.rollout import attention_rollout

    _, inter = model.apply(
        variables, images, mutable=["intermediates"],
        method="encode_image_sowed",
    )
    tree = inter["intermediates"]["image_tower"]
    layers = sorted(
        (k for k in tree if k.startswith("layer_")),
        key=lambda s: int(s.split("_")[1]),
    )
    attns = [tree[k]["attention_weights"][0] for k in layers]
    return attention_rollout(attns, args.head_fusion, args.discard_ratio)


def cmd_eval(args) -> int:
    import jax.numpy as jnp

    from ..core.config import DISEASE_LABELS, get_preset
    from ..evals.metrics import multilabel_metrics
    from ..inference import InferenceSession

    cfg = get_preset(args.preset)
    _setup_logging(args.log_dir, "eval")
    tokenizer = _tokenizer(args)
    cfg = _apply_tiny(cfg, args, len(tokenizer.vocab))
    model, variables = _model_and_state(cfg, args, tokenizer)
    if getattr(args, "head", "zeroshot") == "adapter":
        # score from the C-ADAPTER classifier (02 nb cell 30 semantics:
        # frontal view, frozen-tower encode, sigmoid(Linear(512,16))) —
        # point it at the checkpoint written by the `adapter` command;
        # a pretrain-only checkpoint restores an UNTRAINED adapter head
        # (structurally identical), so metrics near chance mean the wrong
        # checkpoint was given
        import jax

        from ..ops.image_prep import preprocess_images

        @jax.jit
        def _adapter_probs(variables, images_u8):
            x = preprocess_images(
                images_u8, cfg.model.image_size, cfg.model.image_size,
                cfg.augment.mean, cfg.augment.std,
                jnp.float32 if args.fp32 else jnp.bfloat16,
            )
            feats = model.apply(variables, x, method="encode_image")
            logits = model.apply(variables, feats, method="adapter_logits")
            return jax.nn.sigmoid(logits.astype(jnp.float32))

        def score(images):
            if images.ndim == 5:
                images = images[:, 0]  # frontal view (the adapter's input)
            return np.asarray(_adapter_probs(variables, jnp.asarray(images)))
    else:
        session = InferenceSession(
            model, variables, tokenizer, DISEASE_LABELS,
            cfg.augment.mean, cfg.augment.std, cfg.model.image_size,
            max_text_length=cfg.model.max_text_length,
        )

        def score(images):
            _, probs = session(images)
            return probs

    _, val_loader = _loaders(cfg, args, multi_view=True)
    probs_all, labels_all = [], []
    for batch in val_loader:
        probs = score(np.asarray(batch["images"]))
        mask = np.asarray(batch.get("mask", np.ones(len(probs)))).astype(bool)
        probs_all.append(probs[mask])
        labels_all.append(np.asarray(batch["labels"])[mask])
    probs_cat = np.concatenate(probs_all)
    labels_cat = np.concatenate(labels_all)
    metrics = multilabel_metrics(
        probs_cat, labels_cat, class_names=DISEASE_LABELS
    )
    from ..utils.visualization import save_predictions_csv

    save_predictions_csv(
        probs_cat, labels_cat, DISEASE_LABELS,
        os.path.join(args.log_dir, "eval_predictions.csv"),
    )
    if getattr(args, "bootstrap", 0):
        from ..evals.metrics import bootstrap_ci

        metrics = {
            "point": metrics,
            "bootstrap_ci_95": bootstrap_ci(
                probs_cat, labels_cat, n_boot=args.bootstrap,
                class_names=DISEASE_LABELS,
                point=metrics,  # already computed above — don't redo
            ),
        }
    print(json.dumps(metrics, indent=2))
    return 0


def cmd_serve(args) -> int:
    """Dynamic-batching HTTP inference server over the zero-shot engine."""
    import jax.numpy as jnp

    from ..core.config import DISEASE_LABELS, get_preset
    from ..serving import ZeroShotService, create_server
    from ..zeroshot import ZeroShotEngine, prompts_for_family

    if min(args.buckets) < 1:
        print("error: --buckets entries must be >= 1", file=sys.stderr)
        return 2
    # parse + validate the calibration file BEFORE the (slow) engine build
    # so a bad file fails in milliseconds, not after model load + prompt
    # encoding
    threshold = args.threshold
    if getattr(args, "thresholds", None):
        with open(args.thresholds) as f:
            raw = json.load(f)
        threshold = {}
        for k, v in raw.items():
            try:
                threshold[str(k)] = float(v)
            except (TypeError, ValueError):
                print(
                    f"error: --thresholds[{k!r}] = {v!r} is not a number",
                    file=sys.stderr,
                )
                return 2
        unknown = set(threshold) - set(DISEASE_LABELS)
        if unknown:
            print(f"error: --thresholds has unknown diseases {sorted(unknown)}",
                  file=sys.stderr)
            return 2
        bad = {k: v for k, v in threshold.items() if not 0.0 <= v <= 1.0}
        if bad:
            # a threshold outside [0,1] silently pins the disease to
            # always/never predicted — refuse rather than serve garbage
            print(
                "error: --thresholds values must be probabilities in "
                f"[0, 1]; got {bad}",
                file=sys.stderr,
            )
            return 2
    cfg = get_preset(args.preset)
    _setup_logging(args.log_dir, "serve")
    if getattr(args, "exported", None):
        # StableHLO artifact serving: the scorer bytes ARE the model —
        # no checkpoint restore, no tokenizer, no prompt encoding (the
        # bank and temperature were baked at export time)
        for flag, why in (
            ("checkpoint", "the artifact carries its own weights"),
            ("use_ema", "EMA was resolved at export time"),
        ):
            if getattr(args, flag, None):
                raise SystemExit(
                    f"--{flag.replace('_', '-')} does not compose with "
                    f"--exported ({why})"
                )
        if getattr(args, "tp", 1) > 1:
            raise SystemExit(
                "--tp does not compose with --exported (the serialized "
                "module is a single-device program)"
            )
        from ..export import ADAPTER_FILE, SINGLEVIEW_FILE, ExportedEngine

        engine = ExportedEngine(
            args.exported,
            module=(ADAPTER_FILE if getattr(args, "head", "zeroshot")
                    == "adapter" else SINGLEVIEW_FILE),
        )
        image_size = engine.image_size
        labels = engine.disease_list
        checkpoint_info = args.exported
    elif getattr(args, "head", "zeroshot") == "adapter":
        # deploy a trained C-Adapter checkpoint (the `adapter` command's
        # --checkpoint-dir output): sigmoid(classifier logits), no prompt
        # bank or text tower at request time
        if getattr(args, "tp", 1) > 1:
            raise SystemExit("--tp does not compose with --head adapter")
        from ..inference import AdapterEngine

        tokenizer = _tokenizer(args)
        cfg = _apply_tiny(cfg, args, len(tokenizer.vocab))
        model, variables = _model_and_state(cfg, args, tokenizer)
        engine = AdapterEngine(
            model, variables, cfg.augment.mean, cfg.augment.std,
            cfg.model.image_size,
            jnp.float32 if args.fp32 else jnp.bfloat16,
        )
        image_size = cfg.model.image_size
        labels = DISEASE_LABELS
        checkpoint_info = args.checkpoint or "fresh"
    else:
        tokenizer = _tokenizer(args)
        cfg = _apply_tiny(cfg, args, len(tokenizer.vocab))
        model, variables = _model_and_state(cfg, args, tokenizer)
        mesh = _inference_mesh(args, cfg)
        engine = ZeroShotEngine(
            model, variables, tokenizer, DISEASE_LABELS, cfg.zeroshot,
            cfg.augment.mean, cfg.augment.std, cfg.model.image_size,
            cfg.model.max_text_length,
            jnp.float32 if args.fp32 else jnp.bfloat16,
            use_enhance=cfg.model.use_multimodal_attention,
            mesh=mesh,
        )
        engine.build_text_features(
            prompts_for_family(args.prompts, DISEASE_LABELS)
        )
        image_size = cfg.model.image_size
        labels = DISEASE_LABELS
        checkpoint_info = args.checkpoint or "fresh"
    service = ZeroShotService(
        engine, labels,
        threshold=threshold,
        buckets=tuple(sorted(args.buckets)),
        max_wait_ms=args.max_wait_ms,
        image_size=image_size,
        max_pending=args.max_pending or None,
    )
    # warm every bucket so no request pays a compile
    for b in sorted(set(args.buckets)):
        engine.probs(np.zeros((b, image_size, image_size, 3), np.uint8))
        logging.info("warmed batch bucket %d", b)
    try:
        server = create_server(
            service, args.host, args.port,
            model_info={"image_size": image_size,
                        "checkpoint": checkpoint_info,
                        "buckets": sorted(set(args.buckets))},
        )
    except OSError as exc:
        print(f"error: cannot bind {args.host}:{args.port}: {exc}",
              file=sys.stderr)
        service.close()
        return 2
    host, port = server.server_address[:2]
    logging.info("serving on http://%s:%d (POST /predict, GET /healthz, "
                 "GET /stats)", host, port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        logging.info("shutting down")
    finally:
        server.server_close()
        service.close()
    return 0


# ---------------------------------------------------------------------------


def cmd_convert(args) -> int:
    """Checkpoint interop: orbax dir / reference .pth / flat .safetensors
    → reference-layout .pth or .safetensors (the reference's
    {epoch, models:{name: state_dict}} contract, 0425/train.py:505-541)."""
    import jax.numpy as jnp

    from ..core.config import get_preset
    from ..inference import load_trained_model

    if not args.checkpoint:
        print("error: convert requires --checkpoint (orbax dir, .pth or "
              ".safetensors)", file=sys.stderr)
        return 2
    cfg = get_preset(args.preset)
    tokenizer = _tokenizer(args)
    cfg = _apply_tiny(cfg, args, len(tokenizer.vocab))
    # fp32 restore: the converted artifact should carry full-precision
    # weights regardless of the serving compute dtype
    model, variables = load_trained_model(
        args.checkpoint, cfg, jnp.float32,
        allow_partial=getattr(args, "allow_partial_restore", False),
        use_ema=getattr(args, "use_ema", False),
    )
    epoch = args.epoch
    if epoch is None:
        # default to the epoch the source checkpoint carries (ADVICE r2:
        # stamping 0 over a trained checkpoint's epoch loses provenance)
        if args.checkpoint.endswith((".pth", ".pt", ".safetensors")):
            from ..train.checkpoint import import_reference_checkpoint

            epoch = import_reference_checkpoint(args.checkpoint)["epoch"]
        else:
            from ..train.checkpoint import CheckpointManager

            mgr = CheckpointManager(args.checkpoint)
            epoch = mgr.best_epoch() or 0
            mgr.close()
    text_layers = cfg.model.text_layers
    if args.out.endswith(".safetensors"):
        from ..models.safetensors_io import (
            save_reference_checkpoint_safetensors,
        )

        save_reference_checkpoint_safetensors(
            variables, args.out, epoch=epoch, text_layers=text_layers
        )
    elif args.out.endswith((".pth", ".pt")):
        from ..models.torch_export import save_reference_checkpoint

        save_reference_checkpoint(
            variables, args.out, epoch=epoch, text_layers=text_layers
        )
    else:
        print("error: --out must end in .safetensors, .pth or .pt",
              file=sys.stderr)
        return 2
    print(f"wrote {args.out}")
    return 0


def _tower_init_args(sp) -> None:
    sp.add_argument(
        "--init-image-tower", default=None, metavar="FILE",
        help="initialize the image tower from a torchvision "
             "resnet50/vit_b_16 state_dict (.safetensors/.pth/.bin) — "
             "the reference's pretrained=True construction; a restored "
             "checkpoint still wins",
    )
    sp.add_argument(
        "--init-text-tower", default=None, metavar="FILE_OR_DIR",
        help="initialize the text tower from an HF BertModel weight file "
             "or snapshot dir (Bio_ClinicalBERT: model.safetensors / "
             "pytorch_model.bin; 'bert.'-prefixed keys accepted)",
    )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="clip_for_dl_tpu", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--preset", default="zero_shot")
        sp.add_argument("--checkpoint", default=None,
                        help="orbax dir or reference .pth")
        sp.add_argument("--checkpoint-dir", default=None)
        sp.add_argument("--vocab", default=None, help="BERT vocab.txt")
        sp.add_argument("--log-dir", default="logs")
        sp.add_argument("--epochs", type=int, default=None)
        sp.add_argument("--fp32", action="store_true")
        sp.add_argument("--synthetic", action="store_true")
        sp.add_argument("--synthetic-samples", type=int, default=64)
        sp.add_argument("--tiny", action="store_true",
                        help="shrink towers for smoke runs")
        sp.add_argument("--reports-csv", default=None,
                        help="labeled reports CSV (overrides preset)")
        sp.add_argument("--projections-csv", default=None)
        sp.add_argument("--image-dir", default=None)
        sp.add_argument("--image-cache", default=None, metavar="DIR",
                        help="preprocessed-image cache directory (built by "
                             "`cache-images`): epochs read decoded uint8 "
                             "rows from a memmap instead of cv2-decoding "
                             "every image every epoch")
        sp.add_argument("--device-cache", action="store_true",
                        help="with --image-cache: upload the WHOLE cache "
                             "to device HBM once and gather batches on "
                             "device by index — steady-state H2D is just "
                             "the index vector (the Indiana set is "
                             "~225 MB gray-packed vs 16 GB of v5e HBM). "
                             "Falls back to streaming with a warning if "
                             "the dataset exceeds the HBM budget "
                             "(CLIP_FOR_DL_TPU_HBM_BYTES overrides)")
        sp.add_argument("--batch-size", type=int, default=None)
        sp.add_argument("--num-devices", type=int, default=None,
                        help="run data-parallel over the first N visible "
                             "devices (GSPMD mesh: batches shard, params "
                             "replicate); default single-device")
        sp.add_argument("--virtual-devices", type=int, default=None,
                        metavar="N",
                        help="debug: emulate N CPU devices (XLA host-"
                             "platform trick) so --num-devices/--tp/--pp/"
                             "--ep run without real chips")
        sp.add_argument("--bucket-text", action="store_true",
                        help="length-bucket text batches (identical math, "
                             "faster text tower on short reports)")
        sp.add_argument("--length-grouped", action="store_true",
                        help="with --bucket-text: group each shuffled "
                             "epoch's batches by report length (windowed "
                             "sort, window contents stay random) so short "
                             "batches actually land in the small buckets "
                             "— on the real Indiana length distribution a "
                             "uniformly shuffled batch almost always "
                             "carries one long report")
        sp.add_argument("--fast-gelu", action="store_true",
                        help="tanh-approximate GELU in the ViT tower "
                             "(1.19x on v5e, ~1e-3 departure from the "
                             "torchvision-exact erf — not for parity runs)")
        sp.add_argument("--fused-mlp", action="store_true",
                        help="Pallas fused MLP block in the ViT layers "
                             "(exact-GELU to bf16 rounding; measured "
                             "3.5x the XLA composition on v5e — "
                             "inference-only, training falls back)")
        sp.add_argument("--flash-attention", action="store_true",
                        help="fused Pallas flash attention in both "
                             "towers: fwd AND bwd kernels, in-kernel "
                             "prob dropout, no [B,H,L,L] residual — the "
                             "training memory/bandwidth kernel "
                             "(ops/flash_attention.py; r3 trace: BERT "
                             "attention was 44%% of the pretrain step)")
        sp.add_argument("--bert-fused-mlp", action="store_true",
                        help="fused Dense-GELU-Dense Pallas TRAINING "
                             "kernel in the BERT MLPs: fwd AND bwd, the "
                             "[B,L,3072] intermediate never reaches HBM "
                             "and XLA's self-remat recompute disappears "
                             "(ops/mlp_train.py)")
        sp.add_argument("--vit-fused-mlp-train", action="store_true",
                        help="the same fused training MLP kernel in the "
                             "ViT tower (dropout-free MLPs only; the "
                             "inference --fused-mlp kernel still wins "
                             "at serving)")
        sp.add_argument("--bf16-attention-probs", action="store_true",
                        help="store attention probabilities in bf16 "
                             "(halves the backward-saved [B,H,L,L] "
                             "softmax residual + its layout copies; "
                             "forward unchanged to bf16 rounding)")
        sp.add_argument("--remat", action="store_true",
                        help="rematerialize the encoder layers (memory ↔ "
                             "recompute; lets B scale ~8x on HBM)")
        sp.add_argument("--remat-policy", default="full",
                        choices=("full", "dots", "dots_no_batch"),
                        help="with --remat: what jax.checkpoint SAVES — "
                             "'dots' keeps MXU results and recomputes only "
                             "elementwise chains (cheapest recompute), "
                             "'full' saves nothing (most memory saved)")
        sp.add_argument("--moe-experts", type=int, default=0, metavar="E",
                        help="Switch-MoE text tower: every other block's "
                             "MLP routes over E experts (0 = dense parity "
                             "path). Pass the SAME value to every command "
                             "that loads a MoE checkpoint — the geometry "
                             "is not stored in the checkpoint")
        sp.add_argument("--allow-partial-restore", action="store_true",
                        help="accept a checkpoint missing some of the "
                             "model's arrays (those stay random-init). "
                             "Default is a hard error — a geometry "
                             "mismatch would otherwise score with "
                             "untrained weights")
        sp.add_argument("--use-ema", action="store_true",
                        help="load the EMA weight slot (written by "
                             "pretrain --ema-decay) instead of the live "
                             "params — errors if the checkpoint has none")
        sp.add_argument("--coordinator", default="localhost:12321",
                        metavar="HOST:PORT",
                        help="multi-host: JAX coordination-service address "
                             "(process 0's host)")
        sp.add_argument("--num-processes", type=int, default=1,
                        help="multi-host: total process count (one per "
                             "TPU host); >1 joins jax.distributed and "
                             "shards data loading per process")
        sp.add_argument("--process-id", type=int, default=0,
                        help="multi-host: this process's rank")

    sp = sub.add_parser("prep", help="label extraction")
    sp.add_argument("--reports", required=True)
    sp.add_argument("--out", default="indiana_reports_labeled.csv")
    sp.add_argument("--unlabeled-out", default="unlabeled_samples.csv")
    sp.set_defaults(fn=cmd_prep)

    sp = sub.add_parser(
        "cache-images",
        help="decode+resize the image set once into a memmap cache "
             "(pass --image-cache to training/eval commands to use it)",
    )
    sp.add_argument("--image-dir", required=True)
    sp.add_argument("--out", required=True, help="cache directory to write")
    sp.add_argument("--projections-csv", default=None,
                    help="cache exactly this CSV's filename column "
                         "(default: recursive glob of --image-dir)")
    sp.add_argument("--image-size", type=int, default=224)
    sp.add_argument("--workers", type=int, default=8)
    sp.add_argument("--channels", choices=["auto", "rgb"], default="auto",
                    help="auto (default): pack to one uint8 channel when "
                         "every image is grayscale (3x smaller cache and "
                         "H2D; bit-identical model input — the device "
                         "broadcast reproduces the reference's gray->RGB "
                         "duplication). rgb: force 3-channel rows")
    sp.set_defaults(fn=cmd_cache_images)

    sp = sub.add_parser("pretrain", help="CLIP contrastive pretraining")
    common(sp)
    sp.add_argument("--lora", type=int, default=0, metavar="RANK",
                    help="parameter-efficient fine-tuning: freeze the "
                         "towers, train rank-RANK LoRA deltas on the "
                         "attention/MLP kernels")
    sp.add_argument("--lora-alpha", type=float, default=16.0)
    sp.add_argument("--ep", type=int, default=1,
                    help="with --num-devices and --moe-experts: expert-"
                         "parallel degree (N/ep × ep mesh, expert weights "
                         "sharded)")
    sp.add_argument("--pp", type=int, default=0, metavar="S",
                    help="with --num-devices: pipeline-parallel stages for "
                         "the text tower (GPipe microbatch schedule; text "
                         "dropout off inside the pipeline)")
    sp.add_argument("--pp-microbatches", type=int, default=2)
    sp.add_argument("--loss",
                    choices=["clip_self_distill", "info_nce", "siglip"],
                    default=None,
                    help="override the preset's contrastive loss; siglip "
                         "is the pairwise sigmoid loss (Zhai et al. 2023) "
                         "whose --local-loss form is a constant-memory "
                         "ppermute ring")
    sp.add_argument("--local-loss", action="store_true",
                    help="with --num-devices: compute the contrastive "
                         "loss in open-CLIP local-loss block form "
                         "([b, B_global] per device instead of "
                         "B_global**2 — identical math, pod-scale memory; "
                         "with --loss siglip: the ppermute ring, [b, b] "
                         "per device)")
    sp.add_argument("--accum-steps", type=int, default=1, metavar="A",
                    help="GradCache gradient accumulation: run the towers "
                         "in A microbatches while the contrastive loss "
                         "keeps FULL-batch negatives (gradient-exact; "
                         "~A x less activation memory)")
    sp.add_argument("--bf16-moments", action="store_true",
                    help="store the first Adam moment in bf16 (halves "
                         "that optimizer-state slice; second moment "
                         "stays fp32 for sqrt(nu) dynamic range)")
    sp.add_argument("--warmup-steps", type=int, default=0, metavar="N",
                    help="linear LR warmup over the first N global steps "
                         "(0 = off, the reference's behavior); composes "
                         "with the epoch scheduler and survives resume")
    sp.add_argument("--learnable-temperature", action="store_true",
                    help="train the contrastive temperature (real-CLIP/"
                         "SigLIP semantics): scalar logit_scale "
                         "(clamped s<=100) and, for siglip, logit_bias "
                         "join the params; scalars are excluded from "
                         "weight decay. Resuming such a run needs the "
                         "flag again; inference commands ignore the "
                         "extra scalars")
    sp.add_argument("--ema-decay", type=float, default=0.0, metavar="D",
                    help="keep an exponential moving average of the "
                         "params (decay D, e.g. 0.999; warmup-capped) "
                         "updated inside the jitted step; validation "
                         "and the saved checkpoints carry both the live "
                         "and the smoothed weights")
    _tower_init_args(sp)
    sp.set_defaults(fn=cmd_pretrain, preset="pretrain_clip")

    sp = sub.add_parser(
        "train", help="scripts-path multi-view training (0426 semantics)"
    )
    common(sp)
    sp.add_argument("--warmup-steps", type=int, default=0, metavar="N",
                    help="linear LR warmup over the first N global steps "
                         "(0 = off, the reference's behavior)")
    _tower_init_args(sp)
    sp.set_defaults(fn=cmd_train, preset="scripts_train")

    sp = sub.add_parser("adapter", help="frozen-CLIP C-Adapter training")
    common(sp)
    sp.set_defaults(fn=cmd_adapter, preset="adapter")

    sp = sub.add_parser(
        "shared-adapter", help="shared-embedding adapter (03-notebook variant)"
    )
    common(sp)
    sp.set_defaults(fn=cmd_shared_adapter, preset="adapter")

    sp = sub.add_parser("zeroshot", help="zero-shot evaluation")
    common(sp)
    sp.add_argument("--prompts", default="prediction",
                    choices=["prediction", "basic", "showing", "rich", "findings"])
    sp.add_argument("--dynamic", action="store_true",
                    help="two-pass dynamic-threshold pipeline")
    sp.add_argument("--tp", type=int, default=1,
                    help="with --num-devices: tensor-parallel degree for "
                         "the transformer towers (N/tp × tp mesh)")
    sp.set_defaults(fn=cmd_zeroshot)

    sp = sub.add_parser("gradcam", help="Grad-CAM saliency maps")
    common(sp)
    sp.add_argument("--sample_index", type=int, default=0)
    sp.set_defaults(fn=cmd_gradcam)

    sp = sub.add_parser("rollout", help="ViT attention-rollout saliency")
    common(sp)
    sp.add_argument("--sample_index", type=int, default=0)
    sp.add_argument("--head-fusion", default="mean",
                    choices=["mean", "max", "min"])
    sp.add_argument("--discard-ratio", type=float, default=0.0)
    sp.set_defaults(fn=cmd_rollout, preset="vit")

    sp = sub.add_parser("eval", help="metric suite over a checkpoint")
    common(sp)
    sp.add_argument("--bootstrap", type=int, default=0, metavar="B",
                    help="append percentile-bootstrap 95%% confidence "
                         "intervals over B sample resamples to every "
                         "metric (0 = point estimates only)")
    sp.add_argument("--head", default="zeroshot",
                    choices=["zeroshot", "adapter"],
                    help="scoring head: 'zeroshot' = sigmoid(sim*4) vs the "
                         "prompt bank (load_model.py contract); 'adapter' "
                         "= the trained C-Adapter classifier (02 nb cell "
                         "30 contract — use the `adapter` command's "
                         "--checkpoint-dir output)")
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser(
        "serve", help="dynamic-batching HTTP inference server"
    )
    common(sp)
    sp.add_argument("--prompts", default="prediction",
                    choices=["prediction", "basic", "showing", "rich",
                             "findings"])
    sp.add_argument("--host", default="0.0.0.0")
    sp.add_argument("--port", type=int, default=8008)
    sp.add_argument("--threshold", type=float, default=0.5)
    sp.add_argument("--thresholds", default=None, metavar="FILE",
                    help="per-disease threshold JSON (written by "
                         "`zeroshot --dynamic` as thresholds.json); "
                         "overrides --threshold per disease, 0.5 for "
                         "diseases absent from the file")
    sp.add_argument("--buckets", type=int, nargs="+", default=[1, 4, 16, 64],
                    help="pre-compiled batch sizes for the micro-batcher")
    sp.add_argument("--max-wait-ms", type=float, default=5.0,
                    help="max coalescing wait for a lone request")
    sp.add_argument("--max-pending", type=int, default=256,
                    help="admission bound on the batcher backlog: past "
                         "this many queued requests, new ones get 429 "
                         "(load shedding) instead of unbounded queueing; "
                         "0 = unbounded")
    sp.add_argument("--tp", type=int, default=1,
                    help="with --num-devices: tensor-parallel degree for "
                         "the transformer towers (N/tp × tp mesh)")
    sp.add_argument("--exported", default=None, metavar="DIR",
                    help="serve a StableHLO deployment artifact "
                         "(tools/export_inference.py --stablehlo) instead "
                         "of rebuilding the model: weights, prompt bank "
                         "and temperature are baked into the module")
    sp.add_argument("--head", default="zeroshot",
                    choices=["zeroshot", "adapter"],
                    help="'zeroshot' scores against the prompt bank; "
                         "'adapter' deploys a trained C-Adapter checkpoint "
                         "(sigmoid classifier logits, no text tower) — "
                         "with --exported it selects score_adapter"
                         ".jaxexport")
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser(
        "convert",
        help="checkpoint interop: orbax dir / .pth / .safetensors → "
             "reference-layout .pth or .safetensors",
    )
    common(sp)
    sp.add_argument("--out", required=True,
                    help="output file (.safetensors, .pth or .pt)")
    sp.add_argument("--epoch", type=int, default=None,
                    help="epoch stamp for the artifact header (default: "
                         "the epoch carried by the source checkpoint, "
                         "0 for fresh-init sources)")
    sp.set_defaults(fn=cmd_convert)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from ..core.compile_cache import enable_from_env

    enable_from_env()  # CLIP_FOR_DL_TPU_COMPILE_CACHE=<dir>: persistent
    # XLA compile cache — minutes-long training compiles become disk rehits
    if os.environ.get("CLIP_FOR_DL_TPU_FORCE_CPU"):
        # tools/real_data_dryrun.py and CI path-validation: force the CPU
        # backend. The image's sitecustomize pre-imports jax with
        # JAX_PLATFORMS=axon, so the env var alone doesn't switch —
        # flip through jax.config before any backend init.
        import jax

        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "virtual_devices", None):
        # --virtual-devices N: N virtual CPU devices so the multi-chip
        # flags (--num-devices/--tp/--pp/--ep) run without hardware
        from ..core.mesh import force_virtual_cpu_devices

        force_virtual_cpu_devices(args.virtual_devices)
    if int(getattr(args, "num_processes", 1) or 1) > 1:
        # multi-host pod runtime: join the coordination service before any
        # backend touch; jax.devices() becomes the GLOBAL device list
        from ..parallel.multihost import initialize

        initialize(
            args.coordinator, args.num_processes, args.process_id
        )
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
