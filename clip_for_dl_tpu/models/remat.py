"""Rematerialization policy resolution for the encoder towers.

The reference has no memory/FLOPs trade-off machinery (its batches fit a
24 GB GPU at bs 16/32 — 02 nb cell 25); on TPU the remat policy is a
first-class training knob because the [B, H, L, L] attention tensors and
conv activations dominate HBM at large batch. ``remat=True`` on a tower
wraps each layer in ``jax.checkpoint``; the *policy* decides which
intermediates are saved instead of recomputed:

- ``"full"``       — save nothing (maximum memory saving, maximum recompute).
- ``"dots"``       — save matmul/conv outputs (``checkpoint_dots``): the
                     backward pass reuses every MXU result and only
                     recomputes cheap elementwise chains. Best default on
                     TPU when the batch still fits — recompute cost drops
                     to ~0 while the big attention logits are still freed.
- ``"dots_no_batch"`` — save only matmul outputs with no batch dimension
                     (weight-gradient operands); activations recomputed.
                     Middle ground: less HBM than "dots".
- ``"none"``       — ignore the remat flag entirely (debug escape hatch).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax

REMAT_POLICIES = ("full", "dots", "dots_no_batch", "none")


def resolve_remat_policy(name: str) -> Optional[Callable[..., Any]]:
    """Map a policy name to a ``jax.checkpoint_policies`` callable.

    Returns None for "full" (jax.checkpoint's default: save nothing).
    "none" is handled by the caller (skip wrapping entirely).
    """
    if name in ("full", "none"):
        return None
    if name == "dots":
        return jax.checkpoint_policies.checkpoint_dots
    if name == "dots_no_batch":
        return jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims
    raise ValueError(
        f"unknown remat policy {name!r}; expected one of {REMAT_POLICIES}"
    )


def remat_wrap(layer_cls, enabled: bool, policy: str, static_argnums):
    """Wrap `layer_cls` in nn.remat per (enabled, policy); identity if off."""
    import flax.linen as nn

    if not enabled or policy == "none":
        return layer_cls
    return nn.remat(
        layer_cls,
        static_argnums=static_argnums,
        policy=resolve_remat_policy(policy),
    )
