"""ViT attention rollout — from sown attention weights, no hooks.

The reference hooks every ``encoder.layers[*].self_attention`` and folds
attentions as R ← (A + I)·R with mean/max/min head fusion, reading the
CLS→patch row as a 14×14 saliency mask (vit nb cell 34 AttentionRollout).
Here the ViT tower sows its per-layer attention probabilities into the
``intermediates`` collection (models/vit.py sow_weights) and the rollout is
a scan over the stacked [L, B, H, N, N] tensor.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def fuse_heads(attn: jnp.ndarray, head_fusion: str = "mean") -> jnp.ndarray:
    """[.., H, N, N] → [.., N, N]."""
    if head_fusion == "mean":
        return attn.mean(axis=-3)
    if head_fusion == "max":
        return attn.max(axis=-3)
    if head_fusion == "min":
        return attn.min(axis=-3)
    raise ValueError(f"unknown head fusion {head_fusion!r}")


def attention_rollout(
    attentions: Sequence[jnp.ndarray],
    head_fusion: str = "mean",
    discard_ratio: float = 0.0,
) -> jnp.ndarray:
    """Per-layer attention [B, H, N, N] list → CLS→patch mask [B, g, g].

    discard_ratio drops the lowest attention entries (excluding CLS) before
    folding, as in the reference implementation.
    """
    stacked = jnp.stack(
        [fuse_heads(a.astype(jnp.float32), head_fusion) for a in attentions]
    )  # [L, B, N, N]
    L, B, N, _ = stacked.shape

    if discard_ratio > 0.0:
        k = int((N - 1) * discard_ratio)
        if k > 0:
            flat = stacked.reshape(L, B, N, N)
            # zero the k smallest entries per row, never the CLS column
            thresh = jnp.sort(flat[..., 1:], axis=-1)[..., k - 1 : k]
            keep = flat >= jnp.concatenate(
                [jnp.full((L, B, N, 1), -jnp.inf), thresh], axis=-1
            )
            keep = keep.at[..., 0].set(True)
            stacked = jnp.where(keep, flat, 0.0)

    eye = jnp.eye(N)
    aug = stacked + eye  # (A + I)
    aug = aug / aug.sum(axis=-1, keepdims=True)

    def fold(rollout, layer_attn):
        return jnp.einsum("bij,bjk->bik", layer_attn, rollout), None

    rollout, _ = jax.lax.scan(fold, jnp.broadcast_to(eye, (B, N, N)), aug)
    mask = rollout[:, 0, 1:]  # CLS → patches
    g = int(math.sqrt(N - 1))
    mask = mask.reshape(B, g, g)
    mx = mask.max(axis=(1, 2), keepdims=True)
    return mask / jnp.maximum(mx, 1e-8)


def vit_rollout(model, variables, images, head_fusion: str = "mean",
                discard_ratio: float = 0.0) -> jnp.ndarray:
    """Run the ViT tower with attention sowing and fold the rollout."""
    _, inter = model.apply(
        variables, images, sow_weights=True, mutable=["intermediates"]
    )
    tree = inter["intermediates"]
    layers = sorted(
        (k for k in tree if k.startswith("layer_")),
        key=lambda s: int(s.split("_")[1]),
    )
    attns = [tree[k]["attention_weights"][0] for k in layers]
    return attention_rollout(attns, head_fusion, discard_ratio)
