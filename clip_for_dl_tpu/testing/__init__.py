from .torch_mirrors import (
    TorchMultiViewFusion,
    TorchResidualProjection,
    TorchResNet,
    randomize_bn_stats,
    reference_zero_shot_probs,
)

__all__ = [
    "TorchMultiViewFusion",
    "TorchResidualProjection",
    "TorchResNet",
    "randomize_bn_stats",
    "reference_zero_shot_probs",
]
