from .image_prep import (
    fused_resize_normalize,
    preprocess_images,
    resize_bilinear,
)
from .similarity import (
    fused_similarity,
    l2_normalize,
    similarity,
    similarity_reference,
)

__all__ = [
    "fused_resize_normalize",
    "preprocess_images",
    "resize_bilinear",
    "fused_similarity",
    "l2_normalize",
    "similarity",
    "similarity_reference",
]
