"""Preprocessed image cache: decode once, read at disk bandwidth forever.

The reference decodes + resizes every image with cv2 on every epoch of every
run (0425/prepare_data.py:65-90 runs inside Dataset.__getitem__). On a TPU
host that host-side decode is the pipeline bottleneck — this container's
measured decode rate is ~52-86 img/s against >12k img/s of device compute
(tools/host_pipeline_bench.py). The cache amortizes the decode to a one-time
pass: a flat uint8 memmap of [N, S, S, 3] preprocessed images plus a JSON
index keyed by filename, so every later epoch is a pread of 150 KB/row with
zero decode work.

Semantics are byte-identical to the live path: rows carry the exact
datasets.load_image bytes (native libpng decode + cv2-parity resize, cv2
fallback, same zero-image fallback on decode failure), so a cached run and
an uncached run feed the model the same bytes (tests/test_cache.py,
tests/test_native.py pin this).

Grayscale packing (channels=1): chest X-ray sources are grayscale PNGs that
the reference triplicates to RGB at decode (0425/prepare_data.py:65-90 —
cv2.imread returns three identical channels for gray sources). Shipping
those 3 identical bytes per pixel through the cache and over H2D is pure
waste, and H2D is the e2e bottleneck in tunnel-bound environments. The
builder therefore checks EVERY image at build time; when all three channels
are identical for every row, the cache stores one uint8 channel per pixel
([N, S, S, 1], 3x smaller on disk and over the wire) and the on-device
preprocess broadcasts back to 3 channels after the resize
(ops/image_prep.py preprocess_images handles C==1 input) — bit-identical
model input, since identical channels resize identically. Any genuinely
color image at build time keeps the full RGB layout for the whole cache
(per-file gate, cache-level layout: a memmap needs one row stride).

Layout (directory):
  cache_meta.json  — {"version", "image_size", "channels", "keys": [...]}
  images.u8        — C-order uint8 [len(keys), S, S, channels] raw memmap
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Optional, Sequence

import numpy as np

META_NAME = "cache_meta.json"
DATA_NAME = "images.u8"
# v1: [N,S,S,3] RGB rows. v2: adds "channels" (1 for grayscale-packed
# caches, 3 for RGB). v1 caches still open (channels defaults to 3).
_VERSION = 2
_READABLE_VERSIONS = (1, 2)


def _key(path: str) -> str:
    """Rows are keyed by filename: datasets join image_dir at load time, so
    the same cache serves any --image-dir mount point. Collisions are
    rejected at build time (Indiana filenames are globally unique)."""
    return os.path.basename(path)


class ImageCache:
    """Read-only view of a built cache; get() returns the preprocessed
    uint8 [S, S, channels] row (channels is 1 for grayscale-packed caches,
    3 for RGB) or None for an unknown filename (callers fall back to the
    live decode path, so a partial cache degrades gracefully)."""

    def __init__(self, directory: str):
        meta_path = os.path.join(directory, META_NAME)
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("version") not in _READABLE_VERSIONS:
            raise ValueError(
                f"image cache {directory} has version {meta.get('version')}, "
                f"expected one of {_READABLE_VERSIONS} — rebuild with "
                f"`cache-images`"
            )
        self.directory = directory
        self.image_size = int(meta["image_size"])
        self.channels = int(meta.get("channels", 3))
        if self.channels not in (1, 3):
            raise ValueError(
                f"image cache {directory} has channels={self.channels}, "
                f"expected 1 or 3"
            )
        keys = meta["keys"]
        self._rows: Dict[str, int] = {k: i for i, k in enumerate(keys)}
        s, c = self.image_size, self.channels
        expected = len(keys) * s * s * c
        data_path = os.path.join(directory, DATA_NAME)
        actual = os.path.getsize(data_path)
        if actual != expected:
            raise ValueError(
                f"image cache {directory} is truncated or stale: "
                f"{DATA_NAME} is {actual} bytes, metadata implies {expected} "
                f"— rebuild with `cache-images`"
            )
        self._arr = np.memmap(
            data_path, dtype=np.uint8, mode="r", shape=(len(keys), s, s, c)
        )

    def __len__(self) -> int:
        return len(self._rows)

    def __contains__(self, path: str) -> bool:
        return _key(path) in self._rows

    def row(self, path: str) -> Optional[int]:
        """Row index of `path` in the memmap (the device-resident cache
        gathers by these indices — data/device_cache.py), or None."""
        return self._rows.get(_key(path))

    def get(self, path: str) -> Optional[np.ndarray]:
        row = self._rows.get(_key(path))
        if row is None:
            return None
        # copy out of the memmap: downstream code mutates/stacks batches and
        # must not pin the file mapping
        return np.array(self._arr[row])


def build_image_cache(
    paths: Sequence[str],
    image_size: int,
    directory: str,
    workers: int = 8,
    channels: str = "auto",
) -> "ImageCache":
    """One-time pass: decode + host-resize every path into the memmap.

    PNGs run through the native batch loader (read→decode→resize in C++
    threads, one Python call per chunk — byte-identical to
    datasets.load_image, tests/test_native.py); failed or non-PNG slots
    retry through load_image (cv2), whose zero-image fallback matches the
    native loader's zero-fill.

    channels="auto" (default): after the decode pass, every row is checked
    for grayscale (three identical channels — what the reference's gray→RGB
    duplication produces for CXR sources); if ALL rows are gray the cache
    is compacted to one channel per pixel (3x smaller rows, 3x less H2D).
    channels="rgb" forces the full RGB layout."""
    if channels not in ("auto", "rgb"):
        raise ValueError(f"channels must be 'auto' or 'rgb', got {channels!r}")
    from .datasets import load_image
    from ..native import bindings as native

    keys, first_path, unique_paths = [], {}, []
    for p in paths:
        k = _key(p)
        prev = first_path.get(k)
        if prev is not None:
            # duplicate filename: fine when it is the same file repeated in
            # the frame (multi-label rows share images); a different path
            # with the same basename would silently alias — reject it.
            if os.path.abspath(prev) != os.path.abspath(p):
                raise ValueError(
                    f"filename collision in image cache: {prev!r} and "
                    f"{p!r} share basename {k!r}"
                )
            continue
        first_path[k] = p
        keys.append(k)
        unique_paths.append(p)

    os.makedirs(directory, exist_ok=True)
    s = image_size
    arr = np.memmap(
        os.path.join(directory, DATA_NAME),
        dtype=np.uint8,
        mode="w+",
        shape=(len(keys), s, s, 3),
    )

    retry: list = []
    if native.is_available():
        chunk = 256  # bounds peak native buffer memory at ~chunk·S²·3 bytes
        for start in range(0, len(keys), chunk):
            chunk_paths = unique_paths[start : start + chunk]
            batch, ok = native.batch_load_resize_u8(
                chunk_paths, s, s, threads=max(1, workers)
            )
            arr[start : start + len(chunk_paths)] = batch
            retry.extend(start + int(j) for j in np.nonzero(~ok)[0])
    else:
        retry = list(range(len(keys)))

    if retry:
        # non-PNG / failed slots go through the cv2 path with the same
        # thread fan-out the pre-native builder used (cv2 releases the GIL)
        def _fill(i: int) -> None:
            arr[i] = load_image(unique_paths[i], s)

        with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
            list(pool.map(_fill, retry))
    arr.flush()

    # Grayscale gate: one streaming pass over the just-written rows (page
    # cache still warm — memory bandwidth, not re-decode). Per-file check;
    # one color file keeps the whole cache RGB.
    n_channels = 3
    if channels == "auto" and len(keys):
        all_gray = True
        scan = 512
        for start in range(0, len(keys), scan):
            block = arr[start : start + scan]
            if not (block[..., :1] == block[..., 1:]).all():
                all_gray = False
                break
        if all_gray:
            n_channels = 1
    del arr

    if n_channels == 1:
        # Compact in place: channel 0 IS the gray value for every row.
        src = np.memmap(
            os.path.join(directory, DATA_NAME), dtype=np.uint8, mode="r",
            shape=(len(keys), s, s, 3),
        )
        packed_path = os.path.join(directory, DATA_NAME + ".tmp1")
        dst = np.memmap(
            packed_path, dtype=np.uint8, mode="w+", shape=(len(keys), s, s, 1)
        )
        chunk_rows = 512
        for start in range(0, len(keys), chunk_rows):
            dst[start : start + chunk_rows] = (
                src[start : start + chunk_rows, :, :, :1]
            )
        dst.flush()
        del src, dst
        os.replace(packed_path, os.path.join(directory, DATA_NAME))

    meta = {
        "version": _VERSION,
        "image_size": s,
        "channels": n_channels,
        "keys": keys,
    }
    tmp = os.path.join(directory, META_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(directory, META_NAME))
    return ImageCache(directory)
