"""Contrastive and classification losses — pure jnp functions.

Behavioral parity targets (each is re-derived, tested against hand-computed /
torch values in tests/test_losses.py):

- `soft_cross_entropy`          0425/train.py:117-124
- `clip_self_distill_loss`      0425/train.py:126-151 (notebook T=2 variant:
                                 02 nb cell 22)
- `info_nce_loss`               0425/train.py:153-175
- `multilabel_contrastive_loss` 0425/train.py:177-229 (clamp ±50, eps 1e-8,
                                 count-normalized pos/neg terms)
- `asymmetric_loss`             multimodal_attention/train.py:233-268
                                 (γ⁺=0, γ⁻=4, clip 0.05)
- `bce_with_logits_loss`        02 nb cell 28 criterion
- `focal_loss`                  02 nb cell 33 (explored variant, γ=2, α=0.25)

All reductions are computed in fp32 regardless of input dtype. The NaN/Inf
guard-and-fallback of the reference's multilabel loss (a runtime band-aid,
SURVEY.md §2.9) is replaced by the numerically safe formulation
log(sigmoid(x)) = -softplus(-x); a `debug.check_numerics`-style assertion
lives in utils/debug.py instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _f32(*xs):
    return tuple(x.astype(jnp.float32) for x in xs)


def soft_cross_entropy(
    logits: jax.Array, targets: jax.Array, reduction: str = "none"
) -> jax.Array:
    """CE against soft target rows: (-targets * log_softmax(logits)).sum(-1)."""
    logits, targets = _f32(logits, targets)
    loss = -(targets * jax.nn.log_softmax(logits, axis=-1)).sum(-1)
    return loss.mean() if reduction == "mean" else loss


def clip_self_distill_loss(
    text_features: jax.Array,
    image_features: jax.Array,
    temperature: float = 2.0,
    mode: str = "train",
) -> jax.Array:
    """CLIP loss with self-distillation targets:
    targets = softmax((img@imgᵀ + txt@txtᵀ)/2 · T); symmetric soft-CE on
    (txt@imgᵀ)/T. `mode="eval"` returns the logits."""
    txt, img = _f32(text_features, image_features)
    logits = (txt @ img.T) / temperature
    if mode == "eval":
        return logits
    img_sim = img @ img.T
    txt_sim = txt @ txt.T
    targets = jax.nn.softmax((img_sim + txt_sim) / 2.0 * temperature, axis=-1)
    texts_loss = soft_cross_entropy(logits, targets)
    images_loss = soft_cross_entropy(logits.T, targets.T)
    return ((texts_loss + images_loss) / 2.0).mean()


def info_nce_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    temperature: float = 1.0,
    labels: jax.Array | None = None,
) -> jax.Array:
    """Standard symmetric InfoNCE with arange labels."""
    img, txt = _f32(image_features, text_features)
    logits = (img @ txt.T) / temperature
    n = logits.shape[0]
    if labels is None:
        labels = jnp.arange(n)
    one_hot = jax.nn.one_hot(labels, logits.shape[1], dtype=jnp.float32)
    loss_i = soft_cross_entropy(logits, one_hot).mean()
    loss_t = soft_cross_entropy(logits.T, one_hot.T).mean()
    return (loss_i + loss_t) / 2.0


def siglip_loss(
    text_features: jax.Array,
    image_features: jax.Array,
    logit_scale: float | jax.Array = 10.0,
    logit_bias: float | jax.Array = -10.0,
) -> jax.Array:
    """SigLIP pairwise sigmoid contrastive loss (Zhai et al. 2023).

    ``-1/B · Σᵢ Σⱼ log σ(zᵢⱼ (s·xᵢ·yⱼ + b))`` with ``zᵢⱼ = +1`` on the
    diagonal and ``-1`` off it. Beyond the reference's softmax losses
    (0425/train.py:126-175, whose normalizers couple every row to the full
    batch): each pair is independent, so the global-batch form needs no
    full-row gathers — see :func:`losses.global_batch.ring_siglip_loss`
    for the constant-memory ppermute ring this enables on a TPU mesh.
    Defaults follow the paper's init (s=10 ⇔ t'=log 10, b=-10). Inputs
    are L2-normalized here (paper semantics; like
    :func:`multilabel_contrastive_loss`, and unlike the raw-feature
    self-distill loss). Numerically safe: log σ(x) = -softplus(-x)."""
    from ..ops.similarity import l2_normalize

    txt, img = _f32(text_features, image_features)
    txt, img = l2_normalize(txt), l2_normalize(img)
    logits = img @ txt.T * logit_scale + logit_bias
    n = logits.shape[0]
    z = 2.0 * jnp.eye(n, dtype=jnp.float32) - 1.0
    return jax.nn.softplus(-z * logits).sum() / n


def multilabel_contrastive_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    labels: jax.Array,
    temperature: float = 1.0,
    eps: float = 1e-8,
    clamp: float = 50.0,
) -> jax.Array:
    """Sigmoid multi-label contrastive: L2-normalize both, sims/T clamped to
    ±clamp, positive/negative log-prob sums normalized by label counts."""
    from ..ops.similarity import l2_normalize

    img = l2_normalize(image_features.astype(jnp.float32))
    txt = l2_normalize(text_features.astype(jnp.float32))
    labels = labels.astype(jnp.float32)
    sims = jnp.clip((img @ txt.T) / temperature, -clamp, clamp)
    pos_probs = jax.nn.sigmoid(sims)
    # log(p + eps) exactly as the reference computes it (not log-sigmoid),
    # so values match bit-for-bit at the clamp boundaries too.
    pos_loss = -(jnp.log(pos_probs + eps) * labels).sum() / (labels.sum() + eps)
    neg_loss = -(jnp.log(1.0 - pos_probs + eps) * (1.0 - labels)).sum() / (
        (1.0 - labels).sum() + eps
    )
    return (pos_loss + neg_loss) / 2.0


def asymmetric_loss(
    logits: jax.Array,
    targets: jax.Array,
    gamma_pos: float = 0.0,
    gamma_neg: float = 4.0,
    clip: float = 0.05,
    eps: float = 1e-8,
    reduction: str = "mean",
) -> jax.Array:
    """ASL for multi-label: shifted negative probabilities and asymmetric
    focusing (down-weights easy negatives)."""
    logits, targets = _f32(logits, targets)
    probs = jax.nn.sigmoid(logits)
    probs_neg = 1.0 - probs
    if clip and clip > 0:
        probs_neg = jnp.minimum(probs_neg + clip, 1.0)
    pos_loss = targets * jnp.log(jnp.maximum(probs, eps))
    neg_loss = (1.0 - targets) * jnp.log(jnp.maximum(probs_neg, eps))
    if gamma_pos > 0:
        pos_loss = pos_loss * (1.0 - probs) ** gamma_pos
    if gamma_neg > 0:
        neg_loss = neg_loss * probs**gamma_neg
    loss = -(pos_loss + neg_loss)
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def bce_with_logits_loss(
    logits: jax.Array, targets: jax.Array, reduction: str = "mean"
) -> jax.Array:
    """torch BCEWithLogitsLoss semantics (numerically safe log-sigmoid)."""
    logits, targets = _f32(logits, targets)
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def focal_loss(
    logits: jax.Array,
    targets: jax.Array,
    gamma: float = 2.0,
    alpha: float = 0.25,
    reduction: str = "mean",
) -> jax.Array:
    """Binary focal loss on sigmoid probabilities."""
    logits, targets = _f32(logits, targets)
    p = jax.nn.sigmoid(logits)
    ce = bce_with_logits_loss(logits, targets, reduction="none")
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    loss = alpha_t * (1.0 - p_t) ** gamma * ce
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss
