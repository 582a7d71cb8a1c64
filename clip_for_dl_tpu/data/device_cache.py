"""Device-resident dataset cache: the whole image set lives in HBM.

The reference re-decodes every image on every epoch and ships it to the
GPU per batch (0425/prepare_data.py:65-90 inside Dataset.__getitem__).
The disk `ImageCache` (data/cache.py) already kills the decode; this
module kills the per-batch host→device transfer too. The entire Indiana
dataset is ~225 MB as the gray-packed uint8 cache (4,497 × 224×224×1)
against 16 GB of v5e HBM — streaming it over the host link every epoch
is pure waste, and in tunnel-bound environments (~40 MB/s H2D) it leaves
the device >95% idle (BENCH_r04 e2e device_busy_frac 0.04).

Design:
  * Upload the cache memmap ONCE (`jax.device_put` of the [N,S,S,C]
    uint8 array — one bulk transfer at open).
  * Steady-state H2D per batch is the int32 index vector (KBs): batches
    are gathered ON DEVICE (`jnp.take(arr, idx, axis=0)`), yielding the
    exact cache rows — bit-identical to the streamed path by
    construction (and asserted per run in bench.py).
  * HBM budget gate at open: datasets that exceed `budget_frac` of the
    device's memory raise `DeviceCacheBudgetError`; callers fall back to
    the streaming `ImageCache` path (the CLI does this with a warning).
  * Multi-chip: pass a `jax.sharding.Mesh` — the resident array is
    replicated over the mesh and gathers shard along the leading batch
    axis of the index vector, so dp training feeds sharded device
    batches with no collectives.

Training integration: datasets constructed with ``image_rows=True``
yield the cache ROW INDEX in place of decoded pixels; the loader
collates those ints for free and `device_image_feed` swaps them for the
on-device gather right before the jitted step (cli/main.py
--device-cache).
"""

from __future__ import annotations

import logging
import os
from typing import Iterable, Iterator, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .cache import DATA_NAME, ImageCache

logger = logging.getLogger("clip_for_dl_tpu.data")

# Conservative default when the backend doesn't report a byte limit
# (the axon tunnel backend may not): v5e HBM.
_DEFAULT_HBM_BYTES = 16 * 1024**3
ENV_BUDGET = "CLIP_FOR_DL_TPU_HBM_BYTES"


class DeviceCacheBudgetError(RuntimeError):
    """The dataset does not fit the HBM budget — stream instead."""


def device_memory_budget(device=None) -> int:
    """Best-effort HBM byte limit for `device` (default: first device).
    Order: CLIP_FOR_DL_TPU_HBM_BYTES env override → backend memory_stats
    → 16 GB (v5e)."""
    env = os.environ.get(ENV_BUDGET)
    if env:
        return int(float(env))
    if device is None:
        device = jax.local_devices()[0]
    try:
        stats = device.memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if limit:
            return int(limit)
    except Exception:  # backends without memory_stats (axon, cpu)
        pass
    return _DEFAULT_HBM_BYTES


class DeviceImageCache:
    """HBM-resident view of a built `ImageCache`.

    `gather(rows)` returns the uint8 [B, S, S, C] batch for int row
    indices — one tiny H2D (the indices) per call, zero image bytes over
    the host link."""

    def __init__(
        self,
        cache: ImageCache,
        *,
        budget_frac: float = 0.5,
        mesh: Optional[jax.sharding.Mesh] = None,
        data_axis: str = "data",
    ):
        self.image_size = cache.image_size
        self.channels = cache.channels
        self._cache = cache  # row()/__contains__ delegate: ONE key scheme
        s, c = self.image_size, self.channels
        n = len(cache)
        nbytes = n * s * s * c
        budget = int(budget_frac * device_memory_budget())
        if nbytes > budget:
            raise DeviceCacheBudgetError(
                f"device cache needs {nbytes / 2**20:.0f} MB for {n} images "
                f"but the HBM budget is {budget / 2**20:.0f} MB "
                f"({budget_frac:.0%} of the device limit) — use the "
                f"streaming ImageCache path"
            )
        arr = np.memmap(
            os.path.join(cache.directory, DATA_NAME), dtype=np.uint8,
            mode="r", shape=(n, s, s, c),
        )
        self._sharding = None
        out_spec = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # replicate the dataset over the mesh; gathers shard the
            # batch axis over the data axis
            self._sharding = NamedSharding(mesh, P())
            out_spec = NamedSharding(mesh, P(data_axis))
        # one bulk H2D at open (np.asarray: memmap → real host buffer so
        # the transfer streams at link speed, not page-fault granularity).
        # Row n is all-zeros: the "missing view" slot multi-view exams
        # reference with row index -1 (datasets emit the zero image there
        # on the streaming path, data/datasets.py).
        host = np.zeros((n + 1, s, s, c), np.uint8)
        host[:n] = arr
        self.array = (
            jax.device_put(host, self._sharding)
            if self._sharding is not None
            else jax.device_put(host)
        )
        del host
        self.nbytes = nbytes
        self._zero_row = n

        def _take(a, idx):
            idx = jnp.where(idx < 0, self._zero_row, idx)
            # "fill" would mask OOB with a fill value; indices are
            # host-produced row ids, in bounds by construction — "clip"
            # avoids the extra OOB-select XLA would emit for "fill"
            return jnp.take(a, idx, axis=0, mode="clip")

        self._gather = (
            jax.jit(_take, out_shardings=out_spec)
            if out_spec is not None else jax.jit(_take)
        )
        logger.info(
            "device cache resident: %d images, %.0f MB in HBM",
            n, nbytes / 2**20,
        )

    def __len__(self) -> int:
        return len(self._cache)

    def __contains__(self, path: str) -> bool:
        return path in self._cache

    def row(self, path: str) -> Optional[int]:
        return self._cache.row(path)

    def gather(self, rows: np.ndarray) -> jax.Array:
        """uint8 [*rows.shape, S, S, C] device batch for int row indices.
        Multi-dim indices gather per element ([B, V] views → [B, V, ...]);
        index -1 yields the all-zero "missing view" image."""
        return self._gather(self.array, jnp.asarray(rows, jnp.int32))


class DeviceFeedLoader:
    """Wraps a HostLoader built over ``image_rows=True`` datasets so
    iteration swaps the collated row indices for on-device gathered image
    batches — a drop-in for the streaming loader at every call site
    (len / state_dict / load_state_dict delegate, so mid-epoch preemption
    resume works unchanged)."""

    def __init__(self, loader, dcache: "DeviceImageCache",
                 keys: Sequence[str] = ("image", "images")):
        self.loader = loader
        self.dcache = dcache
        self.keys = keys

    def __iter__(self) -> Iterator[dict]:
        return device_image_feed(iter(self.loader), self.dcache, self.keys)

    def __len__(self) -> int:
        return len(self.loader)

    @property
    def dataset(self):
        return self.loader.dataset

    def state_dict(self):
        return self.loader.state_dict()

    def load_state_dict(self, state) -> None:
        self.loader.load_state_dict(state)

    def set_lengths(self, lengths) -> None:
        self.loader.set_lengths(lengths)


def device_image_feed(
    batches: Iterable[Mapping],
    dcache: DeviceImageCache,
    keys: Sequence[str] = ("image", "images"),
) -> Iterator[dict]:
    """Swap collated `<key>_rows` int vectors for on-device gathered
    image batches right before the jitted step — the step sees the same
    `image`/`images` entry it always did, already device-resident."""
    for batch in batches:
        out = dict(batch)
        for key in keys:
            rows = out.pop(key + "_rows", None)
            if rows is not None:
                out[key] = dcache.gather(np.asarray(rows))
        yield out
