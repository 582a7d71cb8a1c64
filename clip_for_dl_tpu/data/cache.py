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

Layout (directory):
  cache_meta.json  — {"version", "image_size", "keys": [filename, ...]}
  images.u8        — C-order uint8 [len(keys), S, S, 3] raw memmap
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Optional, Sequence

import numpy as np

META_NAME = "cache_meta.json"
DATA_NAME = "images.u8"
_VERSION = 1


def _key(path: str) -> str:
    """Rows are keyed by filename: datasets join image_dir at load time, so
    the same cache serves any --image-dir mount point. Collisions are
    rejected at build time (Indiana filenames are globally unique)."""
    return os.path.basename(path)


class ImageCache:
    """Read-only view of a built cache; get() returns the preprocessed
    uint8 [S, S, 3] row or None for an unknown filename (callers fall back
    to the live decode path, so a partial cache degrades gracefully)."""

    def __init__(self, directory: str):
        meta_path = os.path.join(directory, META_NAME)
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("version") != _VERSION:
            raise ValueError(
                f"image cache {directory} has version {meta.get('version')}, "
                f"expected {_VERSION} — rebuild with `cache-images`"
            )
        self.directory = directory
        self.image_size = int(meta["image_size"])
        keys = meta["keys"]
        self._rows: Dict[str, int] = {k: i for i, k in enumerate(keys)}
        s = self.image_size
        expected = len(keys) * s * s * 3
        data_path = os.path.join(directory, DATA_NAME)
        actual = os.path.getsize(data_path)
        if actual != expected:
            raise ValueError(
                f"image cache {directory} is truncated or stale: "
                f"{DATA_NAME} is {actual} bytes, metadata implies {expected} "
                f"— rebuild with `cache-images`"
            )
        self._arr = np.memmap(
            data_path, dtype=np.uint8, mode="r", shape=(len(keys), s, s, 3)
        )

    def __len__(self) -> int:
        return len(self._rows)

    def __contains__(self, path: str) -> bool:
        return _key(path) in self._rows

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
) -> "ImageCache":
    """One-time pass: decode + host-resize every path into the memmap.

    PNGs run through the native batch loader (read→decode→resize in C++
    threads, one Python call per chunk — byte-identical to
    datasets.load_image, tests/test_native.py); failed or non-PNG slots
    retry through load_image (cv2), whose zero-image fallback matches the
    native loader's zero-fill."""
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
    del arr

    meta = {"version": _VERSION, "image_size": s, "keys": keys}
    tmp = os.path.join(directory, META_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(directory, META_NAME))
    return ImageCache(directory)
