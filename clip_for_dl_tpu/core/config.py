"""Frozen dataclass configuration tree.

The reference keeps its configuration in plain module-level dicts
(``0425/config.py:9-82``) whose values silently diverge from the notebook
constants that produced the published numbers (batch 16 vs 32, max_len 200 vs
512, temperature 2 vs 0.07, CLIP vs ImageNet normalization — SURVEY.md §5.6).
Here every workload pins its exact variant in an immutable preset, with no
import-time side effects.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

# The 16 label columns (15 diseases + Normal) fixed by the reference's offline
# labeling pass (01_datapreprocess.ipynb cells 5-6; 0425/prepare_data.py:216-219).
DISEASE_LABELS: Tuple[str, ...] = (
    "Cardiomegaly",
    "Pulmonary Atelectasis",
    "Pleural Effusion",
    "Nodule",
    "Infiltrate",
    "Emphysema",
    "Thickening",
    "Hernia",
    "Pulmonary Edema",
    "Pneumonia",
    "Consolidation",
    "Pneumothorax",
    "Fibrosis",
    "Mass",
    "Granuloma",
    "Normal",
)

# Channel statistics. The notebooks normalize with the OpenAI-CLIP statistics
# (02_chestxray_CLIP.ipynb cell 16); the scripts use the ImageNet statistics
# (0425/config.py:62-75). Both are preserved; each preset pins one.
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclass(frozen=True)
class ModelConfig:
    """Tower + head hyper-parameters (reference 0425/config.py:18-40)."""

    image_tower: str = "resnet50"  # "resnet50" | "vit_b16"
    image_embedding_dim: int = 2048  # ResNet-50 pooled dim; 768 for ViT-B/16
    text_embedding_dim: int = 768  # Bio_ClinicalBERT hidden size
    shared_embedding_dim: int = 512
    num_classes: int = 16
    image_size: int = 224
    max_text_length: int = 512  # scripts; notebook preset overrides to 200
    temperature: float = 0.07  # scripts; notebook preset overrides to 2.0
    dropout: float = 0.1
    num_attention_heads: int = 8
    # Text tower (Bio_ClinicalBERT architecture: bert-base uncased geometry)
    vocab_size: int = 28996
    text_layers: int = 12
    text_heads: int = 12
    text_intermediate_dim: int = 3072
    text_max_position: int = 512  # BERT position-embedding table size
    # Vision
    resnet_stages: Tuple[int, ...] = (3, 4, 6, 3)
    resnet_width: int = 64
    space_to_depth: bool = False  # MXU-efficient ResNet stem
    vit_patch: int = 16
    vit_layers: int = 12
    vit_heads: int = 12
    vit_hidden: int = 768
    vit_mlp_dim: int = 3072
    # tanh-GELU serving knob: 1.19× ViT inference on v5e, ~1e-3 relative
    # departure from torchvision's exact erf — keep False for parity runs.
    vit_gelu_approximate: bool = False
    # Pallas fused MLP block in the ViT layers (ops/mlp_block.py):
    # LN2→mlp_1→GELU→mlp_2→residual as one VMEM-resident kernel. Measured
    # r2 standalone: 4.66 ms vs XLA's 16.38 ms per layer-equivalent at
    # B=256 (3.5×, ~102 TF/s) — the trace-identified 29%-efficiency
    # GEMM+LayerNorm fusions replaced. Inference-only (no VJP; training
    # and MXU-unaligned tiny configs fall back to the XLA path in-layer).
    vit_fused_mlp: bool = False
    # Training knob: store attention probabilities in bf16 in BOTH towers'
    # transformer layers. Forward math unchanged to bf16 rounding (the PV
    # einsum already casts); the backward-saved [B, H, L, L] softmax
    # residual halves, and with it the layout copies XLA emits for the
    # softmax/dropout backward (trace-measured ~12% of the B=128 seq200
    # pretrain step — tools/trace_report.py). Opt-in, like bf16 Adam
    # moments; gradient closeness is test-guarded.
    bf16_attention_probs: bool = False
    # Flash attention in both transformer towers (ops/flash_attention.py):
    # fused Pallas forward AND backward — logits/probabilities never reach
    # HBM in either direction and the backward recomputes them from q/k,
    # so no fp32 [B, H, L, L] residual is saved per layer (4.8 GB at
    # B=128 L=256 over the 12 BERT layers; 9.7 GB at B=256, which
    # previously forced full text-tower remat). Attention-prob dropout
    # runs in-kernel (deterministic counter-hash RNG, per-batch-row
    # seeds). Attention-viz paths (sow_weights) fall back in-layer.
    flash_attention: bool = False
    # Fused Dense→GELU→Dense Pallas kernel in the BERT MLPs
    # (ops/mlp_train.py) — fwd AND bwd fused: the [B, L, 3072]
    # intermediate never reaches HBM, dW1/dW2 are two clean XLA GEMMs
    # from kernel-streamed bf16 g/dh, and XLA's self-remat recompute of
    # the first MLP GEMM disappears (post-flash trace: the MLP was ~93 ms
    # of the 203 ms B=128 pretrain step). bf16 + 128-aligned dims only
    # (falls back in-layer); checkpoint tree unchanged.
    bert_fused_mlp: bool = False
    # Same training kernel in the ViT tower's MLPs (models/vit.py
    # ViTEncoderLayer.fused_mlp_train). Distinct from vit_fused_mlp (the
    # inference-only LN-fusing kernel, which takes precedence at
    # inference); engages only while the MLP's internal dropout is
    # inactive — the CLIP ViT tower runs dropout=0.0.
    vit_fused_mlp_train: bool = False
    # Learnable contrastive temperature (real-CLIP/SigLIP training
    # semantics; the reference fixes T — 0425/train.py:126-175). When on,
    # CXRClip declares scalar params logit_scale (stored as log s, used
    # clamped to s <= 100 like open-CLIP) and logit_bias (SigLIP's b). The
    # softmax losses then run at T = 1/s; siglip at (s, b). Scalars are
    # excluded from weight decay (train/optim.py).
    learnable_temperature: bool = False
    # initial SCALE s (stored as log s). None -> 1/temperature, i.e. the
    # preset's fixed operating point; siglip runs want 10.0 (paper init).
    logit_scale_init: Optional[float] = None
    logit_bias_init: float = -10.0  # siglip's b init; unused by softmax
    use_multimodal_attention: bool = False
    remat: bool = False  # per-layer remat in the transformer towers
    remat_conv: bool = False  # per-block remat in the ResNet tower
    # Which intermediates jax.checkpoint SAVES when remat is on:
    # "full" (save nothing), "dots" (save MXU results — recompute only
    # elementwise chains), "dots_no_batch", "none". See models/remat.py.
    remat_policy: str = "full"
    # Mixture-of-experts text tower (beyond reference; Switch-Transformer
    # top-1 routing, models/moe.py). 0 experts = dense MLP everywhere.
    text_moe_experts: int = 0
    text_moe_every: int = 2  # every k-th block's MLP is MoE (Switch default)
    moe_capacity_factor: float = 1.25
    moe_aux_weight: float = 0.01  # load-balancing aux-loss weight

    def with_vit(self) -> "ModelConfig":
        return dataclasses.replace(
            self, image_tower="vit_b16", image_embedding_dim=768
        )


@dataclass(frozen=True)
class AugmentConfig:
    """Train-time augmentation (0425/prepare_data.py:39-55, 0425/config.py:62-75)."""

    horizontal_flip_prob: float = 0.5
    rotation_degrees: float = 10.0
    translate_frac: float = 0.1
    mean: Tuple[float, float, float] = IMAGENET_MEAN
    std: Tuple[float, float, float] = IMAGENET_STD
    enabled: bool = True


@dataclass(frozen=True)
class DataConfig:
    """Dataset + loader settings."""

    reports_csv: str = "data/indiana_reports_labeled.csv"
    projections_csv: str = "data/indiana_projections.csv"
    image_dir: str = "data/images"
    batch_size: int = 32
    num_workers: int = 4
    # "uid_grouped": notebook semantics — split unique uids so a patient's
    #   images never straddle the split (02 nb cells 11-12).
    # "report": script semantics — train_test_split on the reports dataframe
    #   (0425/prepare_data.py:224-228).
    split_policy: str = "uid_grouped"
    test_size: float = 0.2
    seed: int = 42
    multi_view: bool = True  # (frontal, lateral) pairs vs single images


@dataclass(frozen=True)
class OptimGroup:
    """Per-module learning rate (notebook per-param-group AdamW, 02 nb cell 25)."""

    name: str
    lr: float


@dataclass(frozen=True)
class TrainConfig:
    num_epochs: int = 100
    lr: float = 1e-4
    weight_decay: float = 0.01
    warmup_steps: int = 1000
    max_grad_norm: float = 1.0
    early_stop_patience: int = 5
    scheduler: str = "cosine"  # "cosine" | "plateau" | "none"
    plateau_patience: int = 1
    plateau_factor: float = 0.8
    eta_min: float = 1e-6
    loss: str = "multilabel_contrastive"
    # Per-module lr groups; empty = single group at `lr`.
    groups: Tuple[OptimGroup, ...] = ()
    checkpoint_dir: str = "checkpoints"
    max_checkpoints_to_keep: int = 3
    save_every_epoch: bool = True
    log_every: int = 10
    # dtype policy
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    remat: bool = False
    donate_state: bool = True


@dataclass(frozen=True)
class ZeroShotConfig:
    """Zero-shot prediction settings (0425/config.py:77-82 + multimodal variant)."""

    threshold: float = 0.5
    top_k: int = 3
    temperature: float = 0.5  # multimodal predict_zero_shot fixed T
    inference_logit_scale: float = 4.0  # load_model.py sigmoid(sim*4.0)
    prompt_family: str = "rich"  # "rich" | "basic" | "findings"
    predictor: str = "sigmoid"  # "sigmoid" | "softmax_topk"
    dynamic_thresholds: bool = False
    threshold_calib_frac: float = 0.25
    threshold_grid_points: int = 20
    frontal_weight: float = 1.0
    lateral_weight: float = 0.8


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. The workload's parallelism is pure DP over a 1-D
    ``data`` axis with global-batch contrastive all-gather (SURVEY.md §5.8)."""

    data_axis: str = "data"
    num_devices: Optional[int] = None  # None = all available


@dataclass(frozen=True)
class ExperimentConfig:
    name: str = "default"
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    augment: AugmentConfig = field(default_factory=AugmentConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    zeroshot: ZeroShotConfig = field(default_factory=ZeroShotConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Presets — one per reference workload (SURVEY.md §5.6). The notebook presets
# pin the constants that produced the published numbers in BASELINE.md.
# ---------------------------------------------------------------------------


def preset_pretrain_clip() -> ExperimentConfig:
    """Notebook phase-A CLIP contrastive pretrain (02 nb cells 16, 22, 24-25):
    batch 16, max_len 200, temperature 2 self-distill loss, CLIP channel
    statistics, no augmentation, per-module lrs, plateau scheduler."""
    return ExperimentConfig(
        name="pretrain_clip",
        model=ModelConfig(max_text_length=200, temperature=2.0),
        data=DataConfig(batch_size=16, multi_view=False),
        augment=AugmentConfig(enabled=False, mean=CLIP_MEAN, std=CLIP_STD),
        train=TrainConfig(
            num_epochs=10,
            scheduler="plateau",
            weight_decay=1e-3,
            loss="clip_self_distill",
            groups=(
                OptimGroup("image_tower", 1e-4),
                OptimGroup("text_tower", 1e-5),
                OptimGroup("image_projector", 1e-3),
                OptimGroup("text_projector", 1e-3),
            ),
        ),
    )


def preset_adapter() -> ExperimentConfig:
    """Notebook phase-B C-Adapter (02 nb cells 28-29): frozen CLIP + Linear
    classifier, BCE, Adam lr 1e-3, 15 epochs."""
    base = preset_pretrain_clip()
    return base.replace(
        name="adapter",
        train=dataclasses.replace(
            base.train,
            num_epochs=15,
            lr=1e-3,
            weight_decay=0.0,
            scheduler="none",
            loss="bce",
            groups=(OptimGroup("adapter", 1e-3),),
        ),
    )


def preset_scripts_train() -> ExperimentConfig:
    """Script training path (0425/config.py + 0426/train.py): batch 32,
    max_len 512, T 0.07, ImageNet stats, augmentation, multi-view fusion,
    cosine schedule, multilabel contrastive loss."""
    return ExperimentConfig(name="scripts_train")


def preset_zero_shot() -> ExperimentConfig:
    """Zero-shot eval (02 nb cells 41-44 + 0425/zero_shot_predict.py)."""
    base = preset_pretrain_clip()
    return base.replace(name="zero_shot")


def preset_vit() -> ExperimentConfig:
    """ViT-B/16 vision variant (vit_vision notebook cells 24-25): contrastive
    lr 1e-5 for the vision tower."""
    base = preset_pretrain_clip()
    return base.replace(
        name="vit",
        model=base.model.with_vit(),
        train=dataclasses.replace(
            base.train,
            groups=(
                OptimGroup("image_tower", 1e-5),
                OptimGroup("text_tower", 1e-5),
                OptimGroup("image_projector", 1e-3),
                OptimGroup("text_projector", 1e-3),
            ),
        ),
    )


def preset_multimodal_attention() -> ExperimentConfig:
    """Cross-modal additive-attention fusion variant with asymmetric loss and
    dynamic per-disease thresholds (multimodal_attention/train.py:951-995,
    zero_shot_predict.py:65-208)."""
    base = preset_scripts_train()
    return base.replace(
        name="multimodal_attention",
        model=dataclasses.replace(base.model, use_multimodal_attention=True),
        train=dataclasses.replace(base.train, loss="asymmetric"),
        zeroshot=dataclasses.replace(
            base.zeroshot, dynamic_thresholds=True, predictor="sigmoid"
        ),
    )


PRESETS = {
    "pretrain_clip": preset_pretrain_clip,
    "adapter": preset_adapter,
    "scripts_train": preset_scripts_train,
    "zero_shot": preset_zero_shot,
    "vit": preset_vit,
    "multimodal_attention": preset_multimodal_attention,
}


def get_preset(name: str) -> ExperimentConfig:
    try:
        return PRESETS[name]()
    except KeyError:
        raise KeyError(f"unknown preset {name!r}; available: {sorted(PRESETS)}")
