"""Global-batch contrastive losses over a device mesh.

The reference's contrastive negatives are limited to the local batch of
16/32 because it is single-device (SURVEY.md §5.8). TPU-native scaling:
inside `shard_map` over the ``data`` mesh axis, `jax.lax.all_gather` the
(L2-normalized) per-device embeddings over ICI, compute the full
B_global×B_global loss, and `pmean` it.

Gradient correctness (the "hard part" in SURVEY.md §7): every device
computes the identical global loss, so each of the N devices contributes
(1/N)·∂loss/∂local through the all_gather transpose (a reduce-scatter);
the N identical contributions sum back to exactly ∂loss/∂local — no
double-counting and no stop-gradient tricks needed. Verified against the
single-device loss on an 8-way virtual mesh in tests/test_losses.py.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax

from .contrastive import (
    clip_self_distill_loss,
    info_nce_loss,
    multilabel_contrastive_loss,
)


def _gather(x: jax.Array, axis_name: str) -> jax.Array:
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


def global_clip_self_distill_loss(
    text_features: jax.Array,
    image_features: jax.Array,
    temperature: float = 2.0,
    axis_name: str = "data",
) -> jax.Array:
    txt = _gather(text_features, axis_name)
    img = _gather(image_features, axis_name)
    loss = clip_self_distill_loss(txt, img, temperature)
    return jax.lax.pmean(loss, axis_name)


def global_info_nce_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    temperature: float = 1.0,
    axis_name: str = "data",
) -> jax.Array:
    img = _gather(image_features, axis_name)
    txt = _gather(text_features, axis_name)
    loss = info_nce_loss(img, txt, temperature)
    return jax.lax.pmean(loss, axis_name)


def global_multilabel_contrastive_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    labels: jax.Array,
    temperature: float = 1.0,
    axis_name: str = "data",
) -> jax.Array:
    """Image rows are batch-sharded; the per-class text matrix is replicated,
    so only images and labels gather."""
    img = _gather(image_features, axis_name)
    lbl = _gather(labels, axis_name)
    loss = multilabel_contrastive_loss(img, text_features, lbl, temperature)
    return jax.lax.pmean(loss, axis_name)


def make_global(
    loss_fn: Callable[..., jax.Array], axis_name: str = "data", n_gather: int = 2
) -> Callable[..., jax.Array]:
    """Lift any local loss(a, b, ...) to its global-batch form by gathering
    the first `n_gather` array arguments over `axis_name`."""

    @functools.wraps(loss_fn)
    def wrapped(*args, **kwargs):
        gathered = tuple(
            _gather(a, axis_name) if i < n_gather else a
            for i, a in enumerate(args)
        )
        return jax.lax.pmean(loss_fn(*gathered, **kwargs), axis_name)

    return wrapped
