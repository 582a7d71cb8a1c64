"""Cross-modal attention fusion modules.

Three variants, mirroring the reference's design space:

- `AdditiveMultiModalAttention` — the variant actually wired into training and
  zero-shot prediction (multimodal_attention/train.py:1069-1110, applied at
  :417-422 and disease_analysis.py:344-346): additive (Bahdanau-style)
  attention of each image over the 16 per-class text features.
- `CrossModalTransformerFusion` — the standalone nn.MultiheadAttention-based
  module the reference defines but never imports
  (multimodal_attention/multimodal_attention.py:6-82); kept as an alternative.
  (Its torch original declares the fusion projection as Linear(dim*2, dim),
  which only type-checks when image_dim == dim; here the Dense infers the
  actual concat width image_dim + dim — a latent defect not replicated, per
  SURVEY.md §2.9.)
- `MLDAdapterBlock` — the commented-out multi-label-decoder head
  (02_chestxray_CLIP.ipynb cell 36): per-label text queries cross-attend into
  image features, one logit per label.

All attention here is over tiny class axes (16), so the math is plain batched
matmuls that XLA fuses; no Pallas needed.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class AdditiveMultiModalAttention(nn.Module):
    """enhanced = W_o(W_i·img + Σ_c softmax_c(v·tanh(W_i·img + W_t·txt_c))·W_t·txt_c)"""

    dim: int = 512
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, image_features: jnp.ndarray, text_features: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """image_features [B, D], text_features [C, D] →
        (enhanced [B, D], attn_weights [B, C])."""
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        img = nn.Dense(self.dim, name="image_proj", **kw)(
            image_features.astype(self.dtype)
        )
        txt = nn.Dense(self.dim, name="text_proj", **kw)(
            text_features.astype(self.dtype)
        )
        # [B, 1, D] + [1, C, D] → additive scores [B, C]
        scores = nn.Dense(1, name="attention", **kw)(
            jnp.tanh(img[:, None, :] + txt[None, :, :])
        )[..., 0]
        weights = nn.softmax(scores.astype(jnp.float32), axis=-1)
        attended = jnp.einsum(
            "bc,cd->bd", weights.astype(self.dtype), txt,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        enhanced = nn.Dense(self.dim, name="output_proj", **kw)(img + attended)
        return enhanced, weights


class TorchStyleMHA(nn.Module):
    """Multi-head attention with torch.nn.MultiheadAttention semantics:
    packed qkv projections, averaged attention weights over heads."""

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Lq, D]
        key: jnp.ndarray,  # [B, Lk, D]
        value: jnp.ndarray,  # [B, Lk, D]
        *,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d, h = self.dim, self.num_heads
        hd = d // h
        q = nn.Dense(d, name="q_proj", **kw)(query.astype(self.dtype))
        k = nn.Dense(d, name="k_proj", **kw)(key.astype(self.dtype))
        v = nn.Dense(d, name="v_proj", **kw)(value.astype(self.dtype))

        def split(x):  # [B, L, D] → [B, h, L, hd]
            return x.reshape(*x.shape[:-1], h, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(hd))
        probs = nn.softmax(logits, axis=-1)
        probs = nn.Dropout(self.dropout, deterministic=deterministic)(probs)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(self.dtype), vh,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(*query.shape[:-1], d)
        out = nn.Dense(d, name="out_proj", **kw)(out)
        # torch returns head-averaged weights by default
        return out, probs.mean(axis=1)


class CrossModalTransformerFusion(nn.Module):
    """Image-query / text-key-value transformer block + concat fusion."""

    image_dim: int = 2048
    text_dim: int = 768
    dim: int = 512
    num_heads: int = 8
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_features: jnp.ndarray,  # [B, image_dim]
        text_features: jnp.ndarray,  # [C, text_dim]
        *,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        img = nn.Dense(self.dim, name="image_projection", **kw)(
            image_features.astype(self.dtype)
        )
        txt = nn.Dense(self.dim, name="text_projection", **kw)(
            text_features.astype(self.dtype)
        )
        b = img.shape[0]
        q = img[:, None, :]  # [B, 1, D]
        kv = jnp.broadcast_to(txt[None, :, :], (b, *txt.shape))
        attn_out, attn_w = TorchStyleMHA(
            self.dim, self.num_heads, self.dropout, name="multihead_attn", **kw
        )(q, kv, kv, deterministic=deterministic)
        x = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype,
            name="layer_norm1",
        )((q + attn_out).astype(jnp.float32)).astype(self.dtype)
        x = x[:, 0, :]
        h = nn.Dense(self.dim * 4, name="ff1", **kw)(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.dim, name="ff2", **kw)(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        x = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype,
            name="layer_norm2",
        )((x + h).astype(jnp.float32)).astype(self.dtype)
        fused = jnp.concatenate([image_features.astype(self.dtype), x], axis=-1)
        out = nn.Dense(self.dim, name="output_projection", **kw)(fused)
        return out, attn_w


class MLDAdapterBlock(nn.Module):
    """Multi-label decoder: per-label text queries attend into image tokens."""

    dim: int = 512
    num_heads: int = 8
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        text_embeddings: jnp.ndarray,  # [B, num_labels, D]
        image_embeddings: jnp.ndarray,  # [B, tokens, D]
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        attn_out, _ = TorchStyleMHA(
            self.dim, self.num_heads, name="cross_attn", **kw
        )(
            text_embeddings.astype(self.dtype),
            image_embeddings.astype(self.dtype),
            image_embeddings.astype(self.dtype),
            deterministic=deterministic,
        )
        x = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype,
            name="norm",
        )((attn_out + text_embeddings).astype(jnp.float32)).astype(self.dtype)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        logits = nn.Dense(1, name="fc", **kw)(x)[..., 0]  # [B, num_labels]
        return logits
