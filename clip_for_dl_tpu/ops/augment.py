"""On-device train-time augmentation.

The reference augments on host workers with torchvision transforms:
RandomHorizontalFlip(0.5), RandomRotation(10°), RandomAffine(translate 0.1)
(0425/prepare_data.py:39-55). Here the whole batch augments on device in the
jitted train step: one inverse affine warp per image (rotation ∘ translation
composed into a single 2×3 matrix) sampled from the same distributions,
bilinear-sampled via gather — batched, fused, and keyed by the step PRNG so
runs are exactly reproducible.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def random_horizontal_flip(
    images: jax.Array, key: jax.Array, prob: float = 0.5
) -> jax.Array:
    """[B, H, W, C]: per-image flip with probability `prob`."""
    flip = jax.random.bernoulli(key, prob, (images.shape[0], 1, 1, 1))
    return jnp.where(flip, images[:, :, ::-1, :], images)


def _affine_matrices(
    key: jax.Array,
    batch: int,
    degrees: float,
    translate: float,
    height: int,
    width: int,
) -> Tuple[jax.Array, jax.Array]:
    """Per-image inverse rotation matrix [B,2,2] and offset [B,2] about the
    image center (torchvision convention: angle ~ U(-d, d), translation ~
    U(-t, t)·size per axis)."""
    k1, k2 = jax.random.split(key)
    angles = jax.random.uniform(
        k1, (batch,), minval=-degrees, maxval=degrees
    ) * (jnp.pi / 180.0)
    trans = jax.random.uniform(
        k2, (batch, 2), minval=-translate, maxval=translate
    ) * jnp.asarray([height, width])
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    # inverse rotation (output coord → input coord)
    inv = jnp.stack(
        [jnp.stack([cos, sin], -1), jnp.stack([-sin, cos], -1)], -2
    )  # [B,2,2]
    return inv, trans


@functools.partial(jax.jit, static_argnames=("degrees", "translate"))
def random_rotate_translate(
    images: jax.Array,
    key: jax.Array,
    degrees: float = 10.0,
    translate: float = 0.1,
) -> jax.Array:
    """Batched inverse-warp with bilinear sampling, zero padding outside."""
    b, h, w, c = images.shape
    inv, trans = _affine_matrices(key, b, degrees, translate, h, w)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32) - cy
    xs = jnp.arange(w, dtype=jnp.float32) - cx
    grid = jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), -1)  # [H,W,2]
    # src = inv @ (dst - t_c) ; translation applied in output space
    coords = (
        jnp.einsum("bij,hwj->bhwi", inv, grid)
        - jnp.einsum("bij,bj->bi", inv, trans)[:, None, None, :]
    )
    src_y = coords[..., 0] + cy
    src_x = coords[..., 1] + cx

    y0 = jnp.floor(src_y)
    x0 = jnp.floor(src_x)
    wy = src_y - y0
    wx = src_x - x0

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = jax.vmap(lambda img, yy, xx: img[yy, xx])(images, yc, xc)
        return jnp.where(valid[..., None], vals, 0.0)

    out = (
        gather(y0, x0) * ((1 - wy) * (1 - wx))[..., None]
        + gather(y0, x0 + 1) * ((1 - wy) * wx)[..., None]
        + gather(y0 + 1, x0) * (wy * (1 - wx))[..., None]
        + gather(y0 + 1, x0 + 1) * (wy * wx)[..., None]
    )
    return out.astype(images.dtype)


@functools.partial(
    jax.jit, static_argnames=("flip_prob", "degrees", "translate")
)
def augment_batch(
    images: jax.Array,
    key: jax.Array,
    flip_prob: float = 0.5,
    degrees: float = 10.0,
    translate: float = 0.1,
) -> jax.Array:
    """The reference's train transform stack, fused on device. Apply AFTER
    normalization (float images)."""
    k1, k2 = jax.random.split(key)
    images = images.astype(jnp.float32)
    images = random_horizontal_flip(images, k1, flip_prob)
    return random_rotate_translate(images, k2, degrees, translate)
