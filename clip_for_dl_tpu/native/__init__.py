from .bindings import (
    batch_load_resize_u8,
    batch_resize_normalize,
    batch_resize_u8,
    decode_png,
    is_available,
    load_library,
    resize_u8,
)

__all__ = [
    "batch_load_resize_u8",
    "batch_resize_normalize",
    "batch_resize_u8",
    "decode_png",
    "is_available",
    "load_library",
    "resize_u8",
]
