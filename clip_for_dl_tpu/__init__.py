"""clip_for_dl_tpu — a TPU-native CLIP framework for multi-label chest X-ray
classification.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
CLIP-FOR-DL project (see SURVEY.md): dual-encoder CLIP (ResNet-50 / ViT-B-16
image towers, Bio_ClinicalBERT text tower) with residual projection heads into
a 512-d shared space, contrastive pretraining (self-distillation CLIP loss,
InfoNCE, sigmoid multi-label contrastive, asymmetric loss), a frozen C-Adapter
classification head, zero-shot prediction with prompt engineering, dynamic
per-disease thresholds and weighted multi-view fusion, plus Grad-CAM, ViT
attention rollout and cross-modal attention interpretability.

Layout
------
core/       mesh + sharding setup, dtype policy, PRNG discipline, configs
ops/        Pallas TPU kernels + jnp reference implementations
models/     flax.linen towers, projection heads, fusion & adapter modules
text/       WordPiece tokenizer (offline, HF-vocab compatible)
losses/     pure-function losses, incl. global-batch (all-gather) variants
data/       Indiana-CXR label extraction, datasets, host loader
zeroshot/   prompt builders, predictors, dynamic thresholds, view merging
evals/      metric suite (Jaccard/Hamming/F1/mAP/LRAP/AUROC)
train/      jitted train/eval steps, optimizers, loops, checkpointing
parallel/   device-mesh data parallelism, global-batch contrastive
interpret/  Grad-CAM, attention rollout, cross-modal attention heatmaps
cli/        command-line entrypoints (prep/pretrain/adapter/zeroshot/...)
"""

__version__ = "0.1.0"

# Top-level convenience API (submodules import lazily where heavy).
from .core.config import (  # noqa: E402
    DISEASE_LABELS,
    ExperimentConfig,
    ModelConfig,
    get_preset,
)

__all__ = [
    "DISEASE_LABELS",
    "ExperimentConfig",
    "ModelConfig",
    "get_preset",
    "__version__",
]
