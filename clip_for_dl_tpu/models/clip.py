"""CXRClip — the composite dual-encoder model.

The reference's de-facto model API is a plain dict
``{resnet, image_projector, view_fusion, tokenizer, text_model,
text_projector[, multimodal_attention]}`` assembled by ``initialize_models``
(0425/train.py:751-791; multimodal_attention/train.py:951-995). Here the same
surface is one flax module with method-based entry points, so each pipeline
(image encode, text encode, multi-view fusion, adapter logits) jits into a
single fused XLA program.

Apply with the method kwarg, e.g.::

    model.apply(vars, images, method="encode_image")
    model.apply(vars, ids, mask, method="encode_text")
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..ops.similarity import l2_normalize
from .attention_fusion import AdditiveMultiModalAttention
from .bert import BertEncoder
from .heads import (
    CAdapter,
    ImageProjection,
    MultiViewFusion,
    SharedEmbeddingAdapter,
    TextProjection,
)
from .resnet import ResNet
from .vit import ViT

Dtype = Any


class CXRClip(nn.Module):
    """Dual-encoder CLIP with optional multi-view fusion, cross-modal
    attention enhancement and classification adapter."""

    config: ModelConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    fold_bn: bool = False  # inference-only: BN pre-folded into conv weights

    def setup(self):
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if getattr(cfg, "learnable_temperature", False):
            # Scalar loss-calibration params (real-CLIP/SigLIP semantics;
            # the reference fixes T). Stored as log s so the optimizer
            # walks it multiplicatively; the steps clamp s <= 100
            # (open-CLIP's guard). Declared here so they live in the
            # params tree and receive gradients through the loss.
            import math

            s0 = cfg.logit_scale_init or 1.0 / cfg.temperature
            self.logit_scale = self.param(
                "logit_scale",
                lambda rng: jnp.asarray(math.log(s0), jnp.float32),
            )
            self.logit_bias = self.param(
                "logit_bias",
                lambda rng: jnp.asarray(cfg.logit_bias_init, jnp.float32),
            )
        if cfg.image_tower == "resnet50":
            self.image_tower = ResNet(
                stage_sizes=cfg.resnet_stages, width=cfg.resnet_width,
                fold_bn=self.fold_bn, remat=cfg.remat_conv,
                remat_policy=cfg.remat_policy,
                space_to_depth=cfg.space_to_depth, **kw,
            )
        elif cfg.image_tower == "vit_b16":
            self.image_tower = ViT(
                image_size=cfg.image_size, patch=cfg.vit_patch,
                hidden=cfg.vit_hidden, layers=cfg.vit_layers,
                heads=cfg.vit_heads, mlp_dim=cfg.vit_mlp_dim,
                remat=cfg.remat, remat_policy=cfg.remat_policy,
                gelu_approximate=cfg.vit_gelu_approximate,
                fused_mlp=getattr(cfg, "vit_fused_mlp", False),
                fused_mlp_train=getattr(cfg, "vit_fused_mlp_train", False),
                bf16_probs=getattr(cfg, "bf16_attention_probs", False),
                flash=getattr(cfg, "flash_attention", False),
                **kw,
            )
        else:
            raise ValueError(f"unknown image tower {cfg.image_tower!r}")
        self.text_tower = BertEncoder(
            vocab_size=cfg.vocab_size, hidden=cfg.text_embedding_dim,
            layers=cfg.text_layers, heads=cfg.text_heads,
            intermediate=cfg.text_intermediate_dim,
            max_position=cfg.text_max_position,
            dropout=cfg.dropout, remat=cfg.remat,
            remat_policy=cfg.remat_policy,
            moe_experts=cfg.text_moe_experts, moe_every=cfg.text_moe_every,
            moe_capacity_factor=cfg.moe_capacity_factor,
            bf16_probs=getattr(cfg, "bf16_attention_probs", False),
            flash=getattr(cfg, "flash_attention", False),
            fused_mlp=getattr(cfg, "bert_fused_mlp", False), **kw,
        )
        self.image_projector = ImageProjection(
            out_dim=cfg.shared_embedding_dim, dropout=cfg.dropout, **kw
        )
        self.text_projector = TextProjection(
            out_dim=cfg.shared_embedding_dim, dropout=cfg.dropout, **kw
        )
        self.view_fusion = MultiViewFusion(
            out_dim=cfg.shared_embedding_dim, **kw
        )
        self.adapter = CAdapter(num_classes=cfg.num_classes, **kw)
        self.shared_adapter = SharedEmbeddingAdapter(
            num_classes=cfg.num_classes, **kw
        )
        if cfg.use_multimodal_attention:
            self.multimodal_attention = AdditiveMultiModalAttention(
                dim=cfg.shared_embedding_dim, **kw
            )

    # -- towers -------------------------------------------------------------

    def encode_image(
        self, images: jnp.ndarray, *, train: bool = False, normalize: bool = False
    ) -> jnp.ndarray:
        """NHWC images [B, H, W, 3] → shared-space features [B, D]."""
        if self.config.image_tower == "resnet50":
            emb = self.image_tower(images, train=train)
        else:
            emb = self.image_tower(images, deterministic=not train)
        feats = self.image_projector(emb, deterministic=not train)
        return l2_normalize(feats) if normalize else feats

    def encode_image_with_stage4(
        self, images: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Grad-CAM path: also return stage-4 activations (ResNet only)."""
        emb, stage4 = self.image_tower(images, capture_stage4=True)
        return self.image_projector(emb), stage4

    def encode_image_sowed(self, images: jnp.ndarray) -> jnp.ndarray:
        """ViT tower forward with attention weights sown into
        ``intermediates`` (rollout path; ViT tower only)."""
        return self.image_tower(images, sow_weights=True)

    def project_image_features(self, pooled: jnp.ndarray) -> jnp.ndarray:
        """Tower-pooled embeddings → shared space (Grad-CAM head path)."""
        return self.image_projector(pooled)

    def encode_text(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
        normalize: bool = False,
    ) -> jnp.ndarray:
        """Token ids [B, L] → CLS-pooled shared-space features [B, D]."""
        hidden = self.text_tower(
            input_ids, attention_mask, deterministic=not train
        )
        feats = self.text_projector(hidden[:, 0, :], deterministic=not train)
        return l2_normalize(feats) if normalize else feats

    # -- composition --------------------------------------------------------

    def encode_multiview(
        self, images: jnp.ndarray, *, train: bool = False
    ) -> jnp.ndarray:
        """[B, 2, H, W, 3] (frontal, lateral) → fused features [B, D]
        (0426/train.py per-view encode + MultiViewFusion)."""
        b = images.shape[0]
        flat = images.reshape((b * 2, *images.shape[2:]))
        feats = self.encode_image(flat, train=train)
        feats = feats.reshape(b, 2, -1)
        return self.view_fusion(
            feats[:, 0], feats[:, 1], deterministic=not train
        )

    def enhance(
        self, image_features: jnp.ndarray, text_features: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Cross-modal attention enhancement (multimodal variant)."""
        return self.multimodal_attention(image_features, text_features)

    def adapter_logits(self, image_features: jnp.ndarray) -> jnp.ndarray:
        """C-Adapter classification logits over (frozen) image features."""
        return self.adapter(image_features)

    def shared_adapter_logits(
        self, image_features: jnp.ndarray, text_features: jnp.ndarray
    ) -> jnp.ndarray:
        """Shared-embedding adapter over concat(img, text) (03 nb variant)."""
        return self.shared_adapter(image_features, text_features)

    def __call__(
        self,
        images: jnp.ndarray,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Joint forward (used for init): (image_feats, text_feats)."""
        img = self.encode_image(images, train=train)
        txt = self.encode_text(input_ids, attention_mask, train=train)
        # Touch remaining heads so init creates their params.
        self.view_fusion(img, img, deterministic=True)
        self.adapter(img)
        self.shared_adapter(img, txt)
        if self.config.use_multimodal_attention:
            self.multimodal_attention(img, txt)
        return img, txt
