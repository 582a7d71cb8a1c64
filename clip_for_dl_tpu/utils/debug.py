"""Debug / sanitizer subsystem (SURVEY.md §5.2-5.3).

The reference's runtime guards — NaN/Inf checks with loss fallback
(0425/train.py:197-227), per-batch try/except skip (:401-403), zero-image
decode fallback — become explicit, switchable tools here:

- `debug_mode()`: jax_debug_nans + optional jit disable for a scope.
- `assert_finite`: fail fast with the offending leaf path (instead of the
  reference's silent fallback).
- `validate_batch`: checkify-style input-pipeline validation (shapes,
  dtypes, label range, mask consistency).
- `deterministic_run`: one switch to pin every PRNG stream.
- `FaultInjector`: wraps a loader and drops / corrupts chosen batches to
  test the pipeline's error surface (SURVEY.md §5.3 fault-injection hook).
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Dict, Iterable, Iterator, Optional, Sequence

import jax
import numpy as np


@contextlib.contextmanager
def debug_mode(nans: bool = True, disable_jit: bool = False):
    """Scope with NaN debugging (and optionally interpreted execution)."""
    ctxs = []
    if nans:
        ctxs.append(jax.debug_nans(True))
    if disable_jit:
        ctxs.append(jax.disable_jit())
    with contextlib.ExitStack() as stack:
        for c in ctxs:
            stack.enter_context(c)
        yield


def assert_finite(tree: Any, name: str = "tree") -> None:
    """Host-side finite check naming the bad leaf (debug cadence only —
    fetches)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            keys = "/".join(str(getattr(p, "key", p)) for p in path)
            raise FloatingPointError(
                f"non-finite values in {name}:{keys} "
                f"(nan={np.isnan(arr).sum()}, inf={np.isinf(arr).sum()})"
            )


def validate_batch(
    batch: Dict[str, Any],
    batch_size: Optional[int] = None,
    num_classes: int = 16,
) -> None:
    """Input-pipeline contract checks (the checkify pass for host batches)."""
    if "images" in batch:
        imgs = np.asarray(batch["images"])
        if batch_size is not None and imgs.shape[0] != batch_size:
            raise ValueError(
                f"batch size {imgs.shape[0]} != expected {batch_size}"
            )
        if imgs.dtype == np.uint8:
            pass
        elif not np.isfinite(imgs).all():
            raise ValueError("non-finite image values")
    if "labels" in batch:
        lbl = np.asarray(batch["labels"])
        if lbl.shape[-1] != num_classes:
            raise ValueError(f"label dim {lbl.shape[-1]} != {num_classes}")
        if ((lbl != 0) & (lbl != 1)).any():
            raise ValueError("labels must be binary")
    if "mask" in batch and "images" in batch:
        if len(batch["mask"]) != len(batch["images"]):
            raise ValueError("mask/images length mismatch")


@contextlib.contextmanager
def deterministic_run(seed: int = 0):
    """Pin partitionable threefry + numpy global seed for a scope."""
    np_state = np.random.get_state()
    np.random.seed(seed)
    try:
        yield jax.random.key(seed)
    finally:
        np.random.set_state(np_state)


class FaultInjector:
    """Wrap a batch iterator; drop or corrupt selected batches.

    modes: "drop" (skip the batch — the reference's try/except-continue),
    "nan" (poison image floats), "zero" (the zero-image decode fallback).
    """

    def __init__(
        self,
        loader: Iterable[Dict[str, Any]],
        fault_batches: Sequence[int] = (),
        mode: str = "drop",
        on_fault: Optional[Callable[[int, str], None]] = None,
    ):
        self.loader = loader
        self.fault_batches = set(fault_batches)
        self.mode = mode
        self.on_fault = on_fault
        self.faults_injected = 0

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        for i, batch in enumerate(self.loader):
            if i in self.fault_batches:
                self.faults_injected += 1
                if self.on_fault:
                    self.on_fault(i, self.mode)
                if self.mode == "drop":
                    continue
                batch = dict(batch)
                imgs = np.array(batch["images"], copy=True)
                if self.mode == "nan":
                    imgs = imgs.astype(np.float32)
                    imgs[0] = np.nan
                elif self.mode == "zero":
                    imgs[0] = 0
                batch["images"] = imgs
            yield batch


def count_params(tree: Any) -> int:
    return sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(tree)
        if hasattr(x, "shape")
    )
