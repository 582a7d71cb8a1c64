"""ctypes bindings for the native host-preprocessing runtime.

Builds ``native/libcxr_native.so`` on first use (g++, no pybind11) and
exposes the batched cv2-parity resize / fused normalize entry points. Every
function has a pure-numpy fallback so the package works without a compiler;
`is_available()` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_REPO_NATIVE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_REPO_NATIVE, "libcxr_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


_EXPECTED_VERSION = 2  # bump when cxr_native.cpp's ABI grows


def _build() -> bool:
    src = os.path.join(_REPO_NATIVE, "src", "cxr_native.cpp")
    if not os.path.exists(src):
        return False
    # Build to a per-process temp name then rename: overwriting a
    # dlopen'd path in place keeps the old inode (a re-dlopen would
    # return the stale handle), and a shared temp name would let two
    # concurrent builders (pytest workers, multi-host shared FS) publish
    # interleaved output. os.replace is atomic per publisher.
    tmp = f"{_LIB_PATH}.build.{os.getpid()}"
    # distros that ship only libpng.so (no png16 alias) need -lpng; try
    # both so the native path doesn't silently degrade to the cv2 fallback
    last_err: Optional[subprocess.CalledProcessError] = None
    for png_lib in ("-lpng16", "-lpng"):
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-fPIC", "-pthread",
                 "-shared", src, "-o", tmp, png_lib, "-lz"],
                check=True, capture_output=True,
            )
            break
        except subprocess.CalledProcessError as e:
            last_err = e
    else:
        import logging

        logging.getLogger(__name__).debug(
            "native build failed (falling back to numpy/cv2 paths): %s",
            (last_err.stderr or b"").decode(errors="replace")[-2000:]
            if last_err else "unknown",
        )
        raise last_err  # caller's except keeps the fallback contract
    os.replace(tmp, _LIB_PATH)
    return True


def _bind(lib: ctypes.CDLL) -> None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.cxr_resize_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        u8p, ctypes.c_int, ctypes.c_int,
    ]
    lib.cxr_batch_resize_normalize.argtypes = [
        ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.cxr_batch_resize_u8.argtypes = [
        ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int,
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.cxr_png_info.argtypes = [
        u8p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.cxr_png_info.restype = ctypes.c_int
    lib.cxr_decode_png_rgb.argtypes = [u8p, ctypes.c_size_t, u8p]
    lib.cxr_decode_png_rgb.restype = ctypes.c_int
    lib.cxr_batch_load_resize_u8.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p,
    ]
    lib.cxr_version.restype = ctypes.c_int


def load_library(rebuild: bool = False) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure.
    A stale on-disk .so (older ABI version) is rebuilt from source once."""
    global _lib, _tried
    with _lock:
        if _lib is not None and not rebuild:
            return _lib
        if _tried and not rebuild:
            return _lib
        _tried = True
        try:
            if rebuild or not os.path.exists(_LIB_PATH):
                if not _build():
                    return None
            lib = ctypes.CDLL(_LIB_PATH)
            lib.cxr_version.restype = ctypes.c_int
            if lib.cxr_version() != _EXPECTED_VERSION:
                if not _build():
                    return None
                lib = ctypes.CDLL(_LIB_PATH)
                lib.cxr_version.restype = ctypes.c_int
                assert lib.cxr_version() == _EXPECTED_VERSION
            _bind(lib)
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def is_available() -> bool:
    return load_library() is not None


def _np_resize_u8(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """Numpy fallback (float path + round-half-up; ≤1 LSB off cv2)."""
    sh, sw, c = src.shape
    from ..ops.image_prep import _resize_weights

    wh = _resize_weights(sh, dh)
    ww = _resize_weights(sw, dw)
    out = np.einsum("Hh,hwc->Hwc", wh, src.astype(np.float32))
    out = np.einsum("Ww,hwc->hWc", ww, out)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def resize_u8(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """cv2.resize(INTER_LINEAR)-parity uint8 HWC resize."""
    src = np.ascontiguousarray(src, np.uint8)
    sh, sw, c = src.shape
    lib = load_library()
    if lib is None:
        return _np_resize_u8(src, dh, dw)
    dst = np.empty((dh, dw, c), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.cxr_resize_u8(
        src.ctypes.data_as(u8p), sh, sw, c,
        dst.ctypes.data_as(u8p), dh, dw,
    )
    return dst


def _pack_ptrs(images: Sequence[np.ndarray]):
    u8p = ctypes.POINTER(ctypes.c_uint8)
    arr = (u8p * len(images))()
    shapes = np.empty(2 * len(images), np.int32)
    keepalive = []
    for i, img in enumerate(images):
        img = np.ascontiguousarray(img, np.uint8)
        keepalive.append(img)
        arr[i] = img.ctypes.data_as(u8p)
        shapes[2 * i], shapes[2 * i + 1] = img.shape[0], img.shape[1]
    return arr, shapes, keepalive


def batch_resize_u8(
    images: Sequence[np.ndarray], dh: int, dw: int, threads: int = 0
) -> np.ndarray:
    """Variable-size uint8 HWC images → NHWC uint8 batch (threaded)."""
    c = images[0].shape[2]
    lib = load_library()
    if lib is None:
        return np.stack([_np_resize_u8(np.asarray(im), dh, dw) for im in images])
    ptrs, shapes, keep = _pack_ptrs(images)
    dst = np.empty((len(images), dh, dw, c), np.uint8)
    lib.cxr_batch_resize_u8(
        ptrs, shapes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        len(images), c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dh, dw, threads,
    )
    return dst


def batch_resize_normalize(
    images: Sequence[np.ndarray],
    dh: int,
    dw: int,
    mean: Tuple[float, ...] = (0.0, 0.0, 0.0),
    std: Tuple[float, ...] = (1.0, 1.0, 1.0),
    threads: int = 0,
) -> np.ndarray:
    """Variable-size uint8 images → normalized float32 NHWC batch:
    (x/255 - mean)/std fused into the resize pass."""
    c = images[0].shape[2]
    scale = (1.0 / 255.0) / np.asarray(std, np.float32)
    bias = -np.asarray(mean, np.float32) / np.asarray(std, np.float32)
    lib = load_library()
    if lib is None:
        u8 = np.stack([_np_resize_u8(np.asarray(im), dh, dw) for im in images])
        return u8.astype(np.float32) * scale + bias
    ptrs, shapes, keep = _pack_ptrs(images)
    dst = np.empty((len(images), dh, dw, c), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.cxr_batch_resize_normalize(
        ptrs, shapes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        len(images), c,
        dst.ctypes.data_as(f32p), dh, dw,
        scale.ctypes.data_as(f32p), bias.ctypes.data_as(f32p), threads,
    )
    return dst


# ---------------------------------------------------------------------------
# PNG decode + whole-batch native loading (libpng, cv2.imread parity)
# ---------------------------------------------------------------------------


def decode_png(data: bytes) -> Optional[np.ndarray]:
    """PNG bytes → RGB uint8 HWC with cv2.imread conversion semantics
    (16-bit high-byte strip, palette/sub-8-bit expansion, alpha strip,
    gray→RGB). None when the native library is unavailable, the buffer is
    not a PNG, or decode fails — caller falls back to cv2."""
    lib = load_library()
    if lib is None or len(data) < 8:
        return None
    buf = np.frombuffer(data, np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.cxr_png_info(
        buf.ctypes.data_as(u8p), len(data), ctypes.byref(h), ctypes.byref(w)
    ) != 0:
        return None
    if h.value <= 0 or w.value <= 0:
        return None
    dst = np.empty((h.value, w.value, 3), np.uint8)
    if lib.cxr_decode_png_rgb(
        buf.ctypes.data_as(u8p), len(data), dst.ctypes.data_as(u8p)
    ) != 0:
        return None
    return dst


def batch_load_resize_u8(
    paths: Sequence[str], dh: int, dw: int, threads: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """File paths → (NHWC RGB uint8 batch resized to dh×dw, ok flags).

    The whole read→decode→resize pipeline runs in native threads with one
    Python-boundary crossing per batch. Failed slots (missing file,
    non-PNG, corrupt data) come back zero-filled with ok=False — retry
    those through `data.datasets.load_image` (cv2) for non-PNG formats.
    Returns (None, None)-equivalent by raising only on programmer error;
    when the native library is unavailable every slot is ok=False.
    """
    n = len(paths)
    dst = np.zeros((n, dh, dw, 3), np.uint8)
    ok = np.zeros(n, np.uint8)
    lib = load_library()
    if lib is None or n == 0:
        return dst, ok.astype(bool)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.cxr_batch_load_resize_u8(
        arr, n, dst.ctypes.data_as(u8p), dh, dw, threads,
        ok.ctypes.data_as(u8p),
    )
    return dst, ok.astype(bool)
