from .bindings import (
    batch_resize_normalize,
    batch_resize_u8,
    is_available,
    load_library,
    resize_u8,
)

__all__ = [
    "batch_resize_normalize",
    "batch_resize_u8",
    "is_available",
    "load_library",
    "resize_u8",
]
