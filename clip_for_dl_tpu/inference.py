"""Library inference API — the load_model.py counterpart.

`load_trained_model` (0426/load_model.py:35-71): rebuild the model, restore
the best checkpoint (orbax, or a reference ``.pth`` via the converter),
return ready-to-call apply state.

`get_model_predictions` (0426/load_model.py:73-135): multi-view batch →
per-view encode → MultiViewFusion → similarity against
"a chest x-ray of {disease}" prompt features → sigmoid(sim·4.0) > 0.5 →
(predictions, probabilities), all as one jitted program.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core.config import DISEASE_LABELS, ExperimentConfig, get_preset
from .models import CXRClip
from .ops.image_prep import preprocess_images
from .ops.similarity import l2_normalize
from .zeroshot.prompts import create_basic_prompts


def load_trained_model(
    checkpoint: Optional[str] = None,
    config: Optional[ExperimentConfig] = None,
    compute_dtype=jnp.bfloat16,
    seed: int = 0,
    allow_partial: bool = False,
    use_ema: bool = False,
    init_image_tower: Optional[str] = None,
    init_text_tower: Optional[str] = None,
):
    """Returns (model, variables). `checkpoint` may be an orbax directory,
    a reference ``.pth`` / flat ``.safetensors`` file, or None (fresh
    init). A checkpoint missing arrays the model needs is an error unless
    ``allow_partial`` (see CheckpointManager.restore_variables).
    ``use_ema``: read the EMA weight slot written by training with
    --ema-decay. ``init_image_tower`` / ``init_text_tower``: overlay
    hub-pretrained tower weight files onto the fresh init before any
    checkpoint restore (the reference's pretrained=True construction,
    0425/train.py:761-776) — a restored checkpoint still wins."""
    cfg = config or get_preset("zero_shot")
    model = CXRClip(cfg.model, dtype=compute_dtype)
    s = cfg.model.image_size
    l = cfg.model.max_text_length
    variables = jax.jit(model.init)(
        jax.random.key(seed),
        jnp.zeros((1, s, s, 3), compute_dtype),
        jnp.zeros((1, l), jnp.int32),
    )
    if init_image_tower or init_text_tower:
        from .models.pretrained import init_tower_weights

        variables = init_tower_weights(
            jax.tree.map(np.asarray, variables), cfg.model,
            image_path=init_image_tower, text_path=init_text_tower,
        )
    if not checkpoint:
        if use_ema:
            raise ValueError(
                "--use-ema requires a checkpoint (no EMA slot exists on a "
                "fresh init)"
            )
    if checkpoint:
        if checkpoint.endswith((".pth", ".pt", ".safetensors")):
            if use_ema:
                raise ValueError(
                    "--use-ema is not available for reference-layout "
                    ".pth/.safetensors checkpoints (they carry no EMA "
                    "slot) — restore an orbax checkpoint written by "
                    "pretrain --ema-decay"
                )
            from .train.checkpoint import (
                import_reference_checkpoint,
                merge_imported_params,
            )

            imported = import_reference_checkpoint(checkpoint)
            variables = dict(variables)
            variables["params"] = merge_imported_params(
                jax.tree.map(np.asarray, variables["params"]),
                imported["params"],
            )
            if imported["batch_stats"]:
                variables["batch_stats"] = merge_imported_params(
                    jax.tree.map(np.asarray, variables.get("batch_stats", {})),
                    imported["batch_stats"],
                )
        else:
            from .train.checkpoint import CheckpointManager

            mgr = CheckpointManager(checkpoint)
            epoch = mgr.best_epoch()
            restored = mgr.restore_variables(
                variables, epoch, allow_partial=allow_partial,
                use_ema=use_ema,
            )
            mgr.close()
            if restored is None:
                if use_ema:
                    raise ValueError(
                        f"--use-ema: no checkpoint found under {checkpoint} "
                        "— the fresh-init fallback has no EMA slot"
                    )
            else:
                variables = restored
    return model, variables


class InferenceSession:
    """get_model_predictions as a reusable jitted session."""

    def __init__(
        self,
        model: CXRClip,
        variables,
        tokenizer,
        disease_list: Sequence[str] = DISEASE_LABELS,
        mean: Tuple[float, ...] = (0.0, 0.0, 0.0),
        std: Tuple[float, ...] = (1.0, 1.0, 1.0),
        image_size: int = 224,
        logit_scale: float = 4.0,
        threshold: float = 0.5,
        max_text_length: int = 64,
    ):
        self.model = model
        self.variables = variables
        self.disease_list = list(disease_list)
        self.mean, self.std = tuple(mean), tuple(std)
        self.image_size = image_size
        self.logit_scale = logit_scale
        self.threshold = threshold

        prompts = create_basic_prompts(self.disease_list)
        enc = tokenizer.encode(prompts, max_length=max_text_length)
        text = jax.jit(
            lambda v, i, m: model.apply(
                v, i, m, normalize=True, method="encode_text"
            )
        )(variables, jnp.asarray(enc["input_ids"]),
          jnp.asarray(enc["attention_mask"]))
        self.text_features = jnp.asarray(np.asarray(text, np.float32))

        @jax.jit
        def _forward(variables, images_u8, text_features):
            b = images_u8.shape[0]
            flat = images_u8.reshape((b * 2, *images_u8.shape[2:]))
            x = preprocess_images(
                flat, self.image_size, self.image_size, self.mean, self.std,
                jnp.bfloat16,
            )
            fused = self.model.apply(
                variables, x.reshape((b, 2, *x.shape[1:])),
                method="encode_multiview",
            )
            sims = l2_normalize(fused.astype(jnp.float32)) @ text_features.T
            probs = jax.nn.sigmoid(sims * self.logit_scale)
            return probs

        self._forward = _forward

    def __call__(self, images_u8) -> Tuple[np.ndarray, np.ndarray]:
        """[B, 2, H, W, 3] uint8 → (binary predictions [B, C],
        probabilities [B, C])."""
        probs = np.asarray(
            self._forward(self.variables, jnp.asarray(images_u8),
                          self.text_features)
        )
        return (probs > self.threshold).astype(np.float32), probs


class AdapterEngine:
    """Serving engine for the trained C-Adapter classifier (phase-B models,
    02 nb cells 28-30): ``sigmoid(Linear(512, C))`` over frozen-tower image
    features. Duck-types the engine surface :class:`serving.ZeroShotService`
    uses (``_dispatch``/``logits``/``probs``) so ``serve --head adapter``
    deploys an adapter checkpoint exactly like a zero-shot model — no
    prompt bank, no text tower at request time."""

    def __init__(
        self,
        model: CXRClip,
        variables,
        mean: Tuple[float, ...] = (0.0, 0.0, 0.0),
        std: Tuple[float, ...] = (1.0, 1.0, 1.0),
        image_size: int = 224,
        compute_dtype=jnp.bfloat16,
    ):
        self.variables = variables
        self.image_size = image_size
        mean, std = tuple(mean), tuple(std)

        @jax.jit
        def _logits(variables, images_u8):
            x = preprocess_images(
                images_u8, image_size, image_size, mean, std, compute_dtype
            )
            feats = model.apply(variables, x, method="encode_image")
            out = model.apply(variables, feats, method="adapter_logits")
            return out.astype(jnp.float32)

        self._logits_fn = _logits

    def _dispatch(self, images_u8):
        imgs = jnp.asarray(images_u8)
        if imgs.ndim == 5:  # [B, V, ...] multi-view → flattened views
            imgs = imgs.reshape((-1, *imgs.shape[2:]))
        return self._logits_fn(self.variables, imgs), imgs.shape[0]

    def logits(self, images_u8) -> np.ndarray:
        out, n_real = self._dispatch(images_u8)
        return np.asarray(out)[:n_real]

    def probs(self, images_u8) -> np.ndarray:
        return 1.0 / (1.0 + np.exp(-self.logits(images_u8)))


def get_model_predictions(
    model,
    variables,
    images_u8,
    tokenizer,
    disease_list: Sequence[str] = DISEASE_LABELS,
    **kwargs,
) -> Tuple[np.ndarray, np.ndarray]:
    """One-shot convenience wrapper (prefer InferenceSession for loops)."""
    session = InferenceSession(
        model, variables, tokenizer, disease_list, **kwargs
    )
    return session(images_u8)
