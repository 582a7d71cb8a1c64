"""Optimizers and schedules.

The reference uses torch AdamW with per-module parameter groups (notebook:
resnet 1e-4 / bert 1e-5 / projectors 1e-3, 02 nb cell 25; scripts: one group
at 1e-4, 0425/train.py:645-650), CosineAnnealingLR stepped per epoch
(0425/train.py:664), ReduceLROnPlateau(patience 1, factor 0.8) (02 nb cell
25), grad-norm clipping at 1.0 and early stopping patience 5.

Design: the gradient transformation is lr-free (clip → Adam moments →
decoupled weight decay); the per-group learning rates are applied as a
final leaf-wise scale from a host-computed ``{group: lr}`` dict traced into
the jitted train step each epoch. Both schedulers therefore live on host in
plain Python (they step per epoch), and the compiled step never retraces.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

DEFAULT_GROUP = "default"


def make_label_fn(
    group_names: Sequence[str],
) -> Callable[[Tuple], str]:
    """Maps a param path to its group by top-level module name; unknown
    modules fall into DEFAULT_GROUP."""
    names = set(group_names)

    def label(path: Tuple) -> str:
        if path:
            key = getattr(path[0], "key", str(path[0]))
            if key in names:
                return key
        return DEFAULT_GROUP

    return label


def base_transform(
    max_grad_norm: Optional[float] = 1.0,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    moment_dtype=None,
) -> optax.GradientTransformation:
    """clip → Adam moments → decoupled weight decay (torch-AdamW semantics:
    decay applies to every parameter, matching the reference's default —
    except 0-dim scalars, which the reference model doesn't have: the
    learnable logit_scale/logit_bias calibration params must not be pulled
    toward 0 by decay, the same exclusion open-CLIP applies).

    ``moment_dtype=jnp.bfloat16`` stores the FIRST Adam moment (mu) in
    bf16 — halves that slice of optimizer HBM. The second moment stays
    fp32: ``sqrt(nu)`` spans many orders of magnitude and bf16's 8 mantissa
    bits there measurably perturb small updates, while mu enters linearly
    (standard mixed-precision-optimizer practice; parity guard in
    tests/test_train.py::TestOptimizerParity)."""
    parts = []
    if max_grad_norm is not None:
        parts.append(optax.clip_by_global_norm(max_grad_norm))
    parts.append(
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps, mu_dtype=moment_dtype)
    )
    if weight_decay:
        parts.append(optax.add_decayed_weights(
            weight_decay,
            mask=lambda params: jax.tree.map(lambda p: p.ndim > 0, params),
        ))
    return optax.chain(*parts)


def apply_group_lrs(
    updates,
    params,
    lrs: Mapping[str, jax.Array | float],
    label_fn: Callable[[Tuple], str],
):
    """updates ← -lr[group(path)] · updates (the final optax.scale(-lr))."""
    del params

    def scale(path, u):
        return u * (-1.0) * jnp.asarray(lrs[label_fn(path)], u.dtype)

    return jax.tree_util.tree_map_with_path(scale, updates)


def freeze_mask(
    params, trainable: Sequence[str]
) -> "jax.tree_util.PyTreeDef | dict":
    """Boolean mask pytree: True where the top-level module is trainable
    (the adapter phase freezes all four CLIP modules, 02 nb cell 28)."""
    allowed = set(trainable)

    def mark(path, x):
        key = getattr(path[0], "key", str(path[0])) if path else ""
        return key in allowed

    return jax.tree_util.tree_map_with_path(mark, params)


def mask_updates(updates, mask):
    return jax.tree.map(
        lambda u, m: u if m else jnp.zeros_like(u), updates, mask
    )


# ---------------------------------------------------------------------------
# host-side per-epoch schedules
# ---------------------------------------------------------------------------


def cosine_annealing_lr(
    epoch: int, base_lr: float, t_max: int, eta_min: float = 0.0
) -> float:
    """torch CosineAnnealingLR closed form (stepped per epoch)."""
    return eta_min + (base_lr - eta_min) * (
        1.0 + math.cos(math.pi * epoch / t_max)
    ) / 2.0


def warmup_scale(step: int, warmup_steps: int) -> float:
    """Linear warmup multiplier over the first `warmup_steps` steps."""
    if warmup_steps <= 0:
        return 1.0
    return min(1.0, (step + 1) / warmup_steps)


class ReduceLROnPlateau:
    """torch ReduceLROnPlateau (mode=min) over a {group: lr} dict."""

    def __init__(
        self,
        lrs: Dict[str, float],
        factor: float = 0.8,
        patience: int = 1,
        min_lr: float = 0.0,
    ):
        self.lrs = dict(lrs)
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0

    def step(self, metric: float) -> Dict[str, float]:
        if metric < self.best:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lrs = {
                    k: max(v * self.factor, self.min_lr)
                    for k, v in self.lrs.items()
                }
                self.num_bad = 0
        return dict(self.lrs)


class CosineSchedule:
    """Per-epoch cosine over a {group: lr} dict (CosineAnnealingLR)."""

    def __init__(self, lrs: Dict[str, float], t_max: int, eta_min: float = 0.0):
        self.base = dict(lrs)
        self.t_max = t_max
        self.eta_min = eta_min

    def at_epoch(self, epoch: int) -> Dict[str, float]:
        return {
            k: cosine_annealing_lr(epoch, v, self.t_max, self.eta_min)
            for k, v in self.base.items()
        }


class EarlyStopping:
    """Patience-based early stop on a min-metric (0425/train.py:700-720)."""

    def __init__(self, patience: int = 5, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.best = float("inf")
        self.num_bad = 0
        self.should_stop = False

    def step(self, metric: float) -> bool:
        if metric < self.best - self.min_delta:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad >= self.patience:
                self.should_stop = True
        return self.should_stop
