"""PyTorch state_dict → flax params converters.

Gates every parity claim (SURVEY.md §7 "hard parts"): torchvision ResNet
(NCHW→NHWC, BN running stats), HF BERT, and the reference's own heads must
import to float tolerance. Works on any torch ``state_dict``-shaped mapping
of numpy arrays or torch tensors — no torch import required at call time, so
checkpoint conversion runs in pure-JAX environments too.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def to_np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def linear(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch nn.Linear [out,in] → flax Dense kernel [in,out]."""
    out = {"kernel": to_np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = to_np(sd[f"{prefix}.bias"])
    return out


def layernorm(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": to_np(sd[f"{prefix}.weight"]),
        "bias": to_np(sd[f"{prefix}.bias"]),
    }


def conv(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch nn.Conv2d OIHW → flax Conv HWIO."""
    out = {"kernel": to_np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = to_np(sd[f"{prefix}.bias"])
    return out


def embedding(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"embedding": to_np(sd[f"{prefix}.weight"])}


def batchnorm(
    sd: Mapping[str, Any], prefix: str
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Returns (params, batch_stats) for flax BatchNorm."""
    params = {
        "scale": to_np(sd[f"{prefix}.weight"]),
        "bias": to_np(sd[f"{prefix}.bias"]),
    }
    stats = {
        "mean": to_np(sd[f"{prefix}.running_mean"]),
        "var": to_np(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def torch_mha(sd: Mapping[str, Any], prefix: str, dim: int) -> Dict[str, Any]:
    """torch nn.MultiheadAttention (packed in_proj) → TorchStyleMHA params."""
    w = to_np(sd[f"{prefix}.in_proj_weight"])
    b = to_np(sd[f"{prefix}.in_proj_bias"])
    qw, kw, vw = w[:dim], w[dim : 2 * dim], w[2 * dim :]
    qb, kb, vb = b[:dim], b[dim : 2 * dim], b[2 * dim :]
    return {
        "q_proj": {"kernel": qw.T, "bias": qb},
        "k_proj": {"kernel": kw.T, "bias": kb},
        "v_proj": {"kernel": vw.T, "bias": vb},
        "out_proj": linear(sd, f"{prefix}.out_proj"),
    }


# ---------------------------------------------------------------------------
# Reference-module importers (torch attribute names per 02 nb cell 20 /
# 0425/train.py:72-115 / multimodal_attention/train.py:1069-1110)
# ---------------------------------------------------------------------------


def import_residual_projection(
    sd: Mapping[str, Any], proj_attr: str = "image_projection"
) -> Dict[str, Any]:
    """ImageProjection/TextProjection: torch attrs {image|text}_projection,
    fc, layer_norm → our names projection/fc/layer_norm."""
    return {
        "projection": linear(sd, proj_attr),
        "fc": linear(sd, "fc"),
        "layer_norm": layernorm(sd, "layer_norm"),
    }


def import_multiview_fusion(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """MultiViewFusion: torch Sequential fusion.0 / fusion.3 → fc1/fc2."""
    return {"fc1": linear(sd, "fusion.0"), "fc2": linear(sd, "fusion.3")}


def import_additive_attention(sd: Mapping[str, Any]) -> Dict[str, Any]:
    return {
        "image_proj": linear(sd, "image_proj"),
        "text_proj": linear(sd, "text_proj"),
        "attention": linear(sd, "attention"),
        "output_proj": linear(sd, "output_proj"),
    }


def import_cross_modal_fusion(sd: Mapping[str, Any], dim: int = 512) -> Dict[str, Any]:
    return {
        "image_projection": linear(sd, "image_projection"),
        "text_projection": linear(sd, "text_projection"),
        "multihead_attn": torch_mha(sd, "multihead_attn", dim),
        "layer_norm1": layernorm(sd, "layer_norm1"),
        "layer_norm2": layernorm(sd, "layer_norm2"),
        "ff1": linear(sd, "feed_forward.0"),
        "ff2": linear(sd, "feed_forward.3"),
        "output_projection": linear(sd, "output_projection"),
    }


def import_mld_adapter(sd: Mapping[str, Any], dim: int = 512) -> Dict[str, Any]:
    return {
        "cross_attn": torch_mha(sd, "cross_attn", dim),
        "norm": layernorm(sd, "norm"),
        "fc": linear(sd, "fc"),
    }


def import_linear_classifier(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """C-Adapter nn.Linear state dict (keys 'weight','bias')."""
    key = "weight" if "weight" in sd else "classifier.weight"
    prefix = key.rsplit(".", 1)[0] if "." in key else ""
    return {"classifier": linear(sd, prefix) if prefix else
            {"kernel": to_np(sd["weight"]).T, "bias": to_np(sd["bias"])}}
