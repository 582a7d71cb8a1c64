"""Portable compiled deployment artifacts via ``jax.export`` (StableHLO).

The reference's deployment story is "ship ``model_best.pth`` and rebuild the
whole Python model stack at serving time" (``0426/load_model.py:35-71``:
torchvision + transformers + the repo's module definitions must all be
importable and version-compatible). The TPU-native counterpart is a
serialized StableHLO module:

- the zero-shot scorer (`uint8 multi-view batch -> per-disease
  probabilities`) is exported as ONE compiled program with the folded
  weights **and** the prompt-bank text features baked in as constants,
- the batch dimension is shape-polymorphic (``jax.export.symbolic_shape``),
  so one artifact serves any batch size without retracing,
- the module is lowered for BOTH ``cpu`` and ``tpu`` backends, so the same
  bytes run on a TPU VM and in a CPU canary/integration job,
- a serving process needs jax and the artifact bytes — not the model code,
  the tokenizer, the checkpoint format, or this package.

The text encoder is exported as a second, optional artifact so prompt banks
can be rebuilt downstream (it carries the BERT tower, which the image
scorer does not need).

Everything here is pure XLA — the scorer path is ``ops/image_prep
.preprocess_images`` (matmul-based resize, no Pallas custom calls) + the
towers + the similarity head, so the exported module has no
platform-specific custom calls to invalidate portability.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jex

from .core.config import DISEASE_LABELS
from .ops.image_prep import preprocess_images
from .ops.similarity import l2_normalize, similarity_reference

SCORER_FILE = "score_multiview.jaxexport"
SINGLEVIEW_FILE = "score_image.jaxexport"
ADAPTER_FILE = "score_adapter.jaxexport"
TEXT_ENCODER_FILE = "encode_text.jaxexport"
MANIFEST_FILE = "manifest.json"

#: jax.export serialized artifacts embed a calling-convention version; pin
#: the platforms we lower for so the artifact is bit-identical across the
#: machines that produce it.
DEFAULT_PLATFORMS: Tuple[str, ...] = ("cpu", "tpu")


def make_multiview_scorer(
    model,
    variables,
    text_features,
    image_size: int,
    mean: Sequence[float],
    std: Sequence[float],
    logit_scale: float = 4.0,
):
    """The inference.InferenceSession forward with weights + prompt features
    closed over: ``images_u8 [b, 2, H, W, 3] -> probs [b, C]``.

    Mirrors ``0426/load_model.py:73-135`` (per-view encode -> fusion ->
    ``sigmoid(sim * 4.0)``); kept in exact lockstep with
    ``InferenceSession._forward`` — including its bf16 preprocess cast —
    so tests can assert equality against the live session.
    """
    variables = jax.tree.map(jnp.asarray, variables)
    text_features = jnp.asarray(np.asarray(text_features, np.float32))
    mean, std = tuple(mean), tuple(std)

    def scorer(images_u8):
        b = images_u8.shape[0]
        flat = images_u8.reshape((b * 2, *images_u8.shape[2:]))
        x = preprocess_images(
            flat, image_size, image_size, mean, std, jnp.bfloat16
        )
        fused = model.apply(
            variables, x.reshape((b, 2, *x.shape[1:])),
            method="encode_multiview",
        )
        sims = l2_normalize(fused.astype(jnp.float32)) @ text_features.T
        return jax.nn.sigmoid(sims * logit_scale)

    return scorer


def export_multiview_scorer(
    model,
    variables,
    text_features,
    image_size: int,
    mean: Sequence[float],
    std: Sequence[float],
    logit_scale: float = 4.0,
    source_hw: Optional[Tuple[int, int]] = None,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
) -> bytes:
    """Serialize the zero-shot scorer to portable StableHLO bytes.

    ``source_hw``: the (static) height/width of the incoming uint8 views —
    the resize matrices are baked for this geometry. Defaults to
    ``(image_size, image_size)`` (pre-resized input).
    """
    h, w = source_hw or (image_size, image_size)
    scorer = make_multiview_scorer(
        model, variables, text_features, image_size, mean, std, logit_scale,
    )
    (b,) = jex.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, 2, h, w, 3), jnp.uint8)
    exported = jex.export(jax.jit(scorer), platforms=tuple(platforms))(spec)
    return exported.serialize()


def make_singleview_scorer(
    model,
    variables,
    text_features,
    image_size: int,
    mean: Sequence[float],
    std: Sequence[float],
    temperature: float = 0.5,
    compute_dtype=jnp.bfloat16,
    use_enhance: bool = False,
):
    """The serving hot path (``zeroshot.engine.ZeroShotEngine._probs``) with
    weights, prompt bank and temperature closed over:
    ``images_u8 [b, H, W, 3] -> logits [b, C]``.

    Uses ``similarity_reference`` (pure XLA) rather than the TPU Pallas
    ``fused_similarity`` kernel on purpose: the exported module must carry
    no platform-specific custom calls, or the cpu lowering (and any future
    backend) would be invalid. The Pallas kernel and the reference are
    equivalence-tested in tests/test_ops.py, so live-engine and artifact
    logits agree on every platform.
    """
    variables = jax.tree.map(jnp.asarray, variables)
    text_features = jnp.asarray(text_features)
    mean, std = tuple(mean), tuple(std)

    def scorer(images_u8):
        x = preprocess_images(
            images_u8, image_size, image_size, mean, std, compute_dtype
        )
        feats = model.apply(variables, x, normalize=True,
                            method="encode_image")
        if use_enhance:
            feats, _ = model.apply(
                variables, feats, text_features, method="enhance"
            )
            feats = l2_normalize(feats)
        return similarity_reference(
            feats.astype(jnp.float32),
            text_features.astype(jnp.float32),
            temperature,
        )

    return scorer


def export_singleview_scorer(
    model,
    variables,
    text_features,
    image_size: int,
    mean: Sequence[float],
    std: Sequence[float],
    temperature: float = 0.5,
    source_hw: Optional[Tuple[int, int]] = None,
    compute_dtype=jnp.bfloat16,
    use_enhance: bool = False,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
) -> bytes:
    """Serialize the single-view serving scorer to StableHLO bytes."""
    h, w = source_hw or (image_size, image_size)
    scorer = make_singleview_scorer(
        model, variables, text_features, image_size, mean, std,
        temperature, compute_dtype, use_enhance,
    )
    (b,) = jex.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, h, w, 3), jnp.uint8)
    exported = jex.export(jax.jit(scorer), platforms=tuple(platforms))(spec)
    return exported.serialize()


def make_adapter_scorer(
    model,
    variables,
    image_size: int,
    mean: Sequence[float],
    std: Sequence[float],
    compute_dtype=jnp.bfloat16,
):
    """The C-Adapter serving path (``inference.AdapterEngine`` lockstep):
    ``images_u8 [b, H, W, 3] -> classifier logits [b, C]``."""
    variables = jax.tree.map(jnp.asarray, variables)
    mean, std = tuple(mean), tuple(std)

    def scorer(images_u8):
        x = preprocess_images(
            images_u8, image_size, image_size, mean, std, compute_dtype
        )
        feats = model.apply(variables, x, method="encode_image")
        out = model.apply(variables, feats, method="adapter_logits")
        return out.astype(jnp.float32)

    return scorer


def export_adapter_scorer(
    model,
    variables,
    image_size: int,
    mean: Sequence[float],
    std: Sequence[float],
    source_hw: Optional[Tuple[int, int]] = None,
    compute_dtype=jnp.bfloat16,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
) -> bytes:
    """Serialize the C-Adapter serving scorer to StableHLO bytes. Only
    meaningful for checkpoints whose adapter head was trained (the
    ``adapter`` command's --checkpoint-dir output) — the head always
    exists structurally, so an untrained export scores at chance."""
    h, w = source_hw or (image_size, image_size)
    scorer = make_adapter_scorer(
        model, variables, image_size, mean, std, compute_dtype
    )
    (b,) = jex.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, h, w, 3), jnp.uint8)
    exported = jex.export(jax.jit(scorer), platforms=tuple(platforms))(spec)
    return exported.serialize()


def export_text_encoder(
    model,
    variables,
    max_text_length: int,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
) -> bytes:
    """Serialize ``(input_ids, attention_mask) [b, L] -> L2-normalized text
    features [b, D]`` — the prompt-bank builder for downstream recalibration
    (new prompt families, new disease sets) without this package."""
    variables = jax.tree.map(jnp.asarray, variables)

    def encode(input_ids, attention_mask):
        feats = model.apply(
            variables, input_ids, attention_mask,
            normalize=True, method="encode_text",
        )
        return feats.astype(jnp.float32)

    (b,) = jex.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, max_text_length), jnp.int32)
    exported = jex.export(jax.jit(encode), platforms=tuple(platforms))(
        spec, spec
    )
    return exported.serialize()


def write_artifact(
    out_dir: str,
    scorer_bytes: bytes,
    text_encoder_bytes: Optional[bytes] = None,
    manifest: Optional[dict] = None,
    singleview_bytes: Optional[bytes] = None,
    adapter_bytes: Optional[bytes] = None,
) -> None:
    """Lay out the deployment directory: serialized modules + manifest."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, SCORER_FILE), "wb") as f:
        f.write(scorer_bytes)
    if singleview_bytes is not None:
        with open(os.path.join(out_dir, SINGLEVIEW_FILE), "wb") as f:
            f.write(singleview_bytes)
    if adapter_bytes is not None:
        with open(os.path.join(out_dir, ADAPTER_FILE), "wb") as f:
            f.write(adapter_bytes)
    if text_encoder_bytes is not None:
        with open(os.path.join(out_dir, TEXT_ENCODER_FILE), "wb") as f:
            f.write(text_encoder_bytes)
    if manifest is not None:
        with open(os.path.join(out_dir, MANIFEST_FILE), "w") as f:
            json.dump(manifest, f, indent=2)


class ExportedScorer:
    """Load + run a serialized scorer — the deployment-side counterpart of
    :class:`clip_for_dl_tpu.inference.InferenceSession`, with the same
    ``__call__`` contract, but no dependency on the model code.

    ``path``: the artifact directory (reads ``score_multiview.jaxexport``
    and, when present, ``manifest.json`` for labels/threshold defaults) or
    a direct path to the serialized module.
    """

    def __init__(
        self,
        path: str,
        threshold: float = 0.5,
        disease_list: Optional[Sequence[str]] = None,
    ):
        if os.path.isdir(path):
            module_path = os.path.join(path, SCORER_FILE)
            manifest_path = os.path.join(path, MANIFEST_FILE)
            if disease_list is None and os.path.exists(manifest_path):
                with open(manifest_path) as f:
                    disease_list = json.load(f).get("disease_labels")
        else:
            module_path = path
        with open(module_path, "rb") as f:
            self._exported = jex.deserialize(f.read())
        self.threshold = float(threshold)
        self.disease_list = list(disease_list or DISEASE_LABELS)
        (spec,) = self._exported.in_avals
        # [b, 2, H, W, 3] — validate caller batches against the baked
        # geometry so a mismatched resize fails with a clear message
        self.input_hw = (int(spec.shape[2]), int(spec.shape[3]))

    def __call__(self, images_u8) -> Tuple[np.ndarray, np.ndarray]:
        """[B, 2, H, W, 3] uint8 → (binary predictions, probabilities)."""
        x = np.asarray(images_u8)
        if x.ndim != 5 or x.shape[1] != 2 or x.shape[2:4] != self.input_hw:
            raise ValueError(
                f"expected [B, 2, {self.input_hw[0]}, {self.input_hw[1]}, 3] "
                f"uint8 views (the exported geometry), got {x.shape}"
            )
        probs = np.asarray(self._exported.call(x.astype(np.uint8)))
        return (probs > self.threshold).astype(np.float32), probs


class ExportedEngine:
    """Duck-typed :class:`zeroshot.engine.ZeroShotEngine` replacement built
    from a serialized single-view scorer — plugs straight into
    :class:`clip_for_dl_tpu.serving.ZeroShotService` (``serve --exported``).

    Exposes the engine surface the service uses: ``_dispatch`` (returns the
    device handle so the batcher's finalizer thread overlaps fetch with the
    next batch's compute), ``logits`` and ``probs``. The prompt bank and
    temperature are baked into the module at export time.
    """

    def __init__(
        self,
        path: str,
        disease_list: Optional[Sequence[str]] = None,
        module: str = SINGLEVIEW_FILE,
    ):
        """``module``: which scorer to load from an artifact directory —
        ``SINGLEVIEW_FILE`` (zero-shot, default) or ``ADAPTER_FILE``
        (the trained C-Adapter classifier)."""
        manifest = {}
        if os.path.isdir(path):
            module_path = os.path.join(path, module)
            manifest_path = os.path.join(path, MANIFEST_FILE)
            if os.path.exists(manifest_path):
                with open(manifest_path) as f:
                    manifest = json.load(f)
        else:
            module_path = path
        if not os.path.exists(module_path):
            raise FileNotFoundError(
                f"{module_path} not found — produce it with "
                "tools/export_inference.py --stablehlo"
            )
        with open(module_path, "rb") as f:
            self._exported = jex.deserialize(f.read())
        self.disease_list = list(
            disease_list or manifest.get("disease_labels") or DISEASE_LABELS
        )
        self.manifest = manifest
        spec = self._exported.in_avals[0]  # [b, H, W, 3]
        self.input_hw = (int(spec.shape[1]), int(spec.shape[2]))
        self.image_size = self.input_hw[0]

    def _dispatch(self, images_u8):
        imgs = np.asarray(images_u8)
        if imgs.ndim == 5:  # [B, V, H, W, 3] multi-view → flattened views
            imgs = imgs.reshape((-1, *imgs.shape[2:]))
        if imgs.shape[1:3] != self.input_hw:
            raise ValueError(
                f"expected [B, {self.input_hw[0]}, {self.input_hw[1]}, 3] "
                f"uint8 (the exported geometry), got {imgs.shape}"
            )
        return self._exported.call(imgs.astype(np.uint8)), imgs.shape[0]

    def logits(self, images_u8) -> np.ndarray:
        out, n_real = self._dispatch(images_u8)
        return np.asarray(out)[:n_real]

    def probs(self, images_u8) -> np.ndarray:
        return 1.0 / (1.0 + np.exp(-self.logits(images_u8)))


class ExportedTextEncoder:
    """Load + run a serialized text encoder (prompt-bank rebuilds)."""

    def __init__(self, path: str):
        if os.path.isdir(path):
            path = os.path.join(path, TEXT_ENCODER_FILE)
        with open(path, "rb") as f:
            self._exported = jex.deserialize(f.read())
        self.max_text_length = int(self._exported.in_avals[0].shape[1])

    def __call__(self, input_ids, attention_mask) -> np.ndarray:
        ids = np.asarray(input_ids, np.int32)
        mask = np.asarray(attention_mask, np.int32)
        if ids.shape[1] != self.max_text_length:
            raise ValueError(
                f"expected [B, {self.max_text_length}] token ids (the "
                f"exported max_text_length), got {ids.shape}"
            )
        return np.asarray(self._exported.call(ids, mask))
