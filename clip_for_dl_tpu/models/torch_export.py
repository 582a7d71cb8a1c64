"""flax params → PyTorch state_dict export (the reverse of torch_import).

Lets models trained in this framework be loaded by the reference's torch
pipeline (0425/train.py load_checkpoint expects {models: {name:
state_dict}}) — the bidirectional half of the parity bridge. Pure
numpy-dict output; `save_reference_checkpoint` serializes with torch when
available.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x)


def linear(params: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {f"{prefix}.weight": _np(params["kernel"]).T}
    if "bias" in params:
        out[f"{prefix}.bias"] = _np(params["bias"])
    return out


def layernorm(params: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        f"{prefix}.weight": _np(params["scale"]),
        f"{prefix}.bias": _np(params["bias"]),
    }


def conv(params: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {f"{prefix}.weight": _np(params["kernel"]).transpose(3, 2, 0, 1)}
    if "bias" in params:
        out[f"{prefix}.bias"] = _np(params["bias"])
    return out


def batchnorm(
    params: Mapping[str, Any], stats: Mapping[str, Any], prefix: str
) -> Dict[str, np.ndarray]:
    return {
        f"{prefix}.weight": _np(params["scale"]),
        f"{prefix}.bias": _np(params["bias"]),
        f"{prefix}.running_mean": _np(stats["mean"]),
        f"{prefix}.running_var": _np(stats["var"]),
        f"{prefix}.num_batches_tracked": np.asarray(0, np.int64),
    }


def export_resnet(params, stats) -> Dict[str, np.ndarray]:
    """ResNet params/batch_stats → torchvision state_dict naming."""
    sd: Dict[str, np.ndarray] = {}
    sd.update(conv(params["conv1"], "conv1"))
    sd.update(batchnorm(params["bn1"], stats["bn1"], "bn1"))
    for name in sorted(k for k in params if k.startswith("layer")):
        stage, block = name[len("layer"):].split("_")
        dst = f"layer{stage}.{block}"
        p, s = params[name], stats[name]
        for i in (1, 2, 3):
            sd.update(conv(p[f"conv{i}"], f"{dst}.conv{i}"))
            sd.update(batchnorm(p[f"bn{i}"], s[f"bn{i}"], f"{dst}.bn{i}"))
        if "downsample_conv" in p:
            sd.update(conv(p["downsample_conv"], f"{dst}.downsample.0"))
            sd.update(batchnorm(
                p["downsample_bn"], s["downsample_bn"], f"{dst}.downsample.1"
            ))
    return sd


def export_residual_projection(
    params, proj_attr: str = "image_projection"
) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    sd.update(linear(params["projection"], proj_attr))
    sd.update(linear(params["fc"], "fc"))
    sd.update(layernorm(params["layer_norm"], "layer_norm"))
    return sd


def export_multiview_fusion(params) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    sd.update(linear(params["fc1"], "fusion.0"))
    sd.update(linear(params["fc2"], "fusion.3"))
    return sd


def export_additive_attention(params) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    for name in ("image_proj", "text_proj", "attention", "output_proj"):
        sd.update(linear(params[name], name))
    return sd


def export_bert(params, layers: int = 12) -> Dict[str, np.ndarray]:
    """BertEncoder params → HF BertModel state_dict naming."""
    sd: Dict[str, np.ndarray] = {}
    emb = params["embeddings"]
    for name in ("word_embeddings", "position_embeddings",
                 "token_type_embeddings"):
        sd[f"embeddings.{name}.weight"] = _np(emb[name]["embedding"])
    sd.update(layernorm(emb["layer_norm"], "embeddings.LayerNorm"))
    for i in range(layers):
        p = params[f"layer_{i}"]
        dst = f"encoder.layer.{i}"
        for name in ("query", "key", "value"):
            sd.update(linear(p["attention"][name],
                             f"{dst}.attention.self.{name}"))
        sd.update(linear(p["attention_output"], f"{dst}.attention.output.dense"))
        sd.update(layernorm(p["attention_layer_norm"],
                            f"{dst}.attention.output.LayerNorm"))
        sd.update(linear(p["intermediate"], f"{dst}.intermediate.dense"))
        sd.update(linear(p["output"], f"{dst}.output.dense"))
        sd.update(layernorm(p["output_layer_norm"], f"{dst}.output.LayerNorm"))
    return sd


def export_reference_checkpoint(
    variables: Mapping[str, Any],
    epoch: int = 0,
    text_layers: int = 12,
) -> Dict[str, Any]:
    """CXRClip variables → the reference's checkpoint dict layout
    {epoch, models: {name: state_dict}}."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    models: Dict[str, Dict[str, np.ndarray]] = {}
    if "image_tower" in params and "conv1" in params["image_tower"]:
        models["resnet"] = export_resnet(
            params["image_tower"], stats.get("image_tower", {})
        )
    if "image_projector" in params:
        models["image_projector"] = export_residual_projection(
            params["image_projector"], "image_projection"
        )
    if "text_projector" in params:
        models["text_projector"] = export_residual_projection(
            params["text_projector"], "text_projection"
        )
    if "view_fusion" in params:
        models["view_fusion"] = export_multiview_fusion(params["view_fusion"])
    if "multimodal_attention" in params:
        models["multimodal_attention"] = export_additive_attention(
            params["multimodal_attention"]
        )
    if "text_tower" in params:
        models["text_model"] = export_bert(params["text_tower"], text_layers)
    if "adapter" in params:
        models["classifier"] = {
            "weight": _np(params["adapter"]["classifier"]["kernel"]).T,
            "bias": _np(params["adapter"]["classifier"]["bias"]),
        }
    return {"epoch": int(epoch), "models": models}


def save_reference_checkpoint(
    variables: Mapping[str, Any], path: str, epoch: int = 0,
    text_layers: int = 12,
) -> str:
    import torch

    ckpt = export_reference_checkpoint(variables, epoch, text_layers)
    ckpt["models"] = {
        name: {k: torch.from_numpy(np.array(v, np.float32))
               if np.issubdtype(np.asarray(v).dtype, np.floating)
               else torch.from_numpy(np.array(v))
               for k, v in sd.items()}
        for name, sd in ckpt["models"].items()
    }
    torch.save(ckpt, path)
    return path
