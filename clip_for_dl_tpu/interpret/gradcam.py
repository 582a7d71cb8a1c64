"""Grad-CAM — functional, hook-free, vmapped over diseases.

The reference registers forward/backward hooks on ``resnet.layer4[-1]`` and
backprops a one-hot "category" over the 2048 channels of the pooled encoder
output (0425/gradcam.py:14-85) — the notebook versions backprop a proper
scalar: the similarity to a disease prompt (02 nb cell 47) or the adapter
logit (02 nb cell 49). We implement the correct notebook formulation (the
scripts' channel-one-hot variant is a defect noted in SURVEY.md §3.4/§2.9).

TPU-native shape: the image tower exposes stage-4 activations as an explicit
output (models/resnet.py capture_stage4), the scalar head (pool → projector
→ normalize → similarity, or → adapter logit) is an explicit function of
those activations, and one `jax.vjp` per disease gives batched gradients —
all C backward passes run as one compiled program over the tiny head, the
conv tower runs forward once.

CAM math (identical to the reference): w_k = mean_{hw} ∂score/∂A_k;
CAM = ReLU(Σ_k w_k·A_k), min-max normalized per image.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.similarity import l2_normalize


def _cam_from_grads(stage4: jnp.ndarray, grads: jnp.ndarray) -> jnp.ndarray:
    """stage4/grads [B, h, w, K] → normalized CAM [B, h, w]."""
    weights = grads.mean(axis=(1, 2), keepdims=True)  # [B,1,1,K]
    cam = jax.nn.relu((weights * stage4).sum(-1))  # [B,h,w]
    lo = cam.min(axis=(1, 2), keepdims=True)
    hi = cam.max(axis=(1, 2), keepdims=True)
    return (cam - lo) / jnp.maximum(hi - lo, 1e-8)


def _head_scores(model, variables, stage4, text_features, temperature, mode):
    """stage-4 activations → per-class scalar scores [B, C]."""
    pooled = stage4.astype(jnp.float32).mean(axis=(1, 2))
    feats = model.apply(variables, pooled, method="project_image_features")
    if mode == "similarity":
        feats = l2_normalize(feats)
        return feats @ l2_normalize(
            text_features.astype(jnp.float32)
        ).T / temperature
    if mode == "adapter":
        return model.apply(variables, feats, method="adapter_logits")
    raise ValueError(mode)


@functools.partial(
    jax.jit, static_argnames=("model", "mode", "temperature")
)
def gradcam(
    model,
    variables,
    images: jnp.ndarray,
    text_features: Optional[jnp.ndarray] = None,
    mode: str = "similarity",
    temperature: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (cams [C, B, h, w], scores [B, C]).

    images: [B, H, W, 3] preprocessed floats. `mode`:
    - "similarity": score = cos-sim to each disease text feature (02 nb 47)
    - "adapter":    score = adapter logit per class (02 nb 49)
    """
    _, stage4 = model.apply(
        variables, images, method="encode_image_with_stage4"
    )
    stage4 = stage4.astype(jnp.float32)

    def head(s4):
        return _head_scores(
            model, variables, s4, text_features, temperature, mode
        )

    scores, vjp = jax.vjp(head, stage4)
    num_classes = scores.shape[1]

    def one_class(c):
        cot = jax.nn.one_hot(c, num_classes, dtype=scores.dtype)
        cot = jnp.broadcast_to(cot, scores.shape)  # score[b, c] for all b
        (grads,) = vjp(cot)
        return _cam_from_grads(stage4, grads)

    cams = jax.vmap(one_class)(jnp.arange(num_classes))  # [C, B, h, w]
    return cams, scores


def upsample_cam(cam: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear CAM upsampling to image resolution (the cv2.resize of
    show_cam_on_image), via the same MXU interpolation matrices."""
    from ..ops.image_prep import resize_bilinear

    return resize_bilinear(cam[..., None], height, width)[..., 0]


def overlay_cam(
    image_01: jnp.ndarray, cam: jnp.ndarray, alpha: float = 0.5
) -> jnp.ndarray:
    """JET-colormapped CAM blended over the de-normalized image [H,W,3] in
    [0,1] (gradcam.py:101-141 show_cam_on_image semantics)."""
    heat = jet_colormap(cam)
    out = alpha * heat + (1 - alpha) * image_01
    return jnp.clip(out, 0.0, 1.0)


def jet_colormap(x: jnp.ndarray) -> jnp.ndarray:
    """OpenCV-style JET colormap for x in [0,1] → [..., 3] RGB."""
    x = jnp.clip(x, 0.0, 1.0)
    four = 4.0 * x
    r = jnp.clip(jnp.minimum(four - 1.5, -four + 4.5), 0.0, 1.0)
    g = jnp.clip(jnp.minimum(four - 0.5, -four + 3.5), 0.0, 1.0)
    b = jnp.clip(jnp.minimum(four + 0.5, -four + 2.5), 0.0, 1.0)
    return jnp.stack([r, g, b], axis=-1)
