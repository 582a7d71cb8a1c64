from .torch_mirrors import (
    TorchAdditiveAttention,
    TorchMultiViewFusion,
    TorchResidualProjection,
    TorchResNet,
    TorchViT,
    TorchViTLayer,
    randomize_bn_stats,
    reference_zero_shot_probs,
)

__all__ = [
    "TorchAdditiveAttention",
    "TorchMultiViewFusion",
    "TorchResidualProjection",
    "TorchResNet",
    "TorchViT",
    "TorchViTLayer",
    "randomize_bn_stats",
    "reference_zero_shot_probs",
]
