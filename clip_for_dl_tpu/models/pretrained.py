"""Hub-pretrained tower initialization.

The reference never trains from scratch: both towers start from
hub-pretrained weights at model construction
(`/root/reference/0425/train.py:761-776` — torchvision
``resnet50(pretrained=True)`` / ``vit_b_16(weights=...)`` and HF
``AutoModel.from_pretrained('emilyalsentzer/Bio_ClinicalBERT')``), and the
published metric rows depend on that. This container has no hub access, so
the TPU-native equivalent is file-based: point
``pretrain --init-image-tower / --init-text-tower`` at weight files a
real-data user downloads once (``.safetensors``, ``.pth``/``.bin``, or an
HF snapshot directory), and the towers are overlaid onto the fresh-init
variables before training starts. A restored checkpoint still wins —
resume semantics are unchanged.

Every overlay is strict: the imported tree must match the initialized
tower key-for-key and shape-for-shape, so a config/weights mismatch is a
clear error instead of silently training on garbage.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from .safetensors_io import load_state_dict


def check_tree_matches(name: str, got: Any, want: Any, path: str = "") -> None:
    """Raise ValueError at the first key or leaf-shape mismatch between an
    imported tree and the initialized target tree."""
    if isinstance(want, Mapping) or isinstance(got, Mapping):
        got_keys = set(got.keys()) if isinstance(got, Mapping) else set()
        want_keys = set(want.keys()) if isinstance(want, Mapping) else set()
        if got_keys != want_keys:
            missing = sorted(want_keys - got_keys)
            extra = sorted(got_keys - want_keys)
            raise ValueError(
                f"{name}: imported weights do not match the model config at "
                f"'{path or '<root>'}' — missing keys {missing[:5]}, "
                f"unexpected keys {extra[:5]} (check --preset / tower "
                "geometry against the weight file)"
            )
        for k in want_keys:
            check_tree_matches(name, got[k], want[k], f"{path}/{k}")
        return
    got_shape = tuple(np.shape(got))
    want_shape = tuple(np.shape(want))
    if got_shape != want_shape:
        raise ValueError(
            f"{name}: shape mismatch at '{path}': weight file has "
            f"{got_shape}, model expects {want_shape} (check --preset / "
            "tower geometry against the weight file)"
        )


def cast_tree_like(got: Any, want: Any) -> Any:
    """Cast every imported leaf to the dtype of the matching initialized
    leaf. Hub re-uploads commonly ship float16/bfloat16 tensors; overlaying
    those raw onto an fp32 param tree would silently change training
    numerics — the module contract is 'clear error instead of silently
    training on garbage', and a silent precision downgrade is the same
    failure dressed as success. Shapes were already validated by
    check_tree_matches."""
    if isinstance(want, Mapping):
        return {k: cast_tree_like(got[k], want[k]) for k in want}
    want_dtype = np.asarray(want).dtype
    got_arr = np.asarray(got)
    return got_arr if got_arr.dtype == want_dtype else got_arr.astype(want_dtype)


def load_image_tower_weights(
    path: str, cfg
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Weight file → (params, batch_stats) for the configured image tower.

    ``resnet50``: a torchvision ``resnet50`` state_dict (the trailing
    ``fc.*`` head is ignored — the reference drops it too,
    `02_chestxray_CLIP.ipynb` cell 24). ``vit_b16``: a torchvision
    ``vit_b_16`` state_dict (``heads.*`` ignored likewise).
    """
    sd = load_state_dict(path)
    if cfg.image_tower == "resnet50":
        from .resnet import import_torchvision_resnet50

        sd = {k: v for k, v in sd.items() if not k.startswith("fc.")}
        return import_torchvision_resnet50(sd)
    if cfg.image_tower == "vit_b16":
        from .vit import import_torchvision_vit_b16

        sd = {k: v for k, v in sd.items() if not k.startswith("heads.")}
        return (
            import_torchvision_vit_b16(
                sd, layers=cfg.vit_layers, hidden=cfg.vit_hidden
            ),
            {},
        )
    raise ValueError(f"unknown image tower {cfg.image_tower!r}")


def load_text_tower_weights(path: str) -> Dict[str, Any]:
    """Weight file or HF snapshot dir → BertEncoder params.

    Accepts BertModel layouts bare (``embeddings...``) or prefixed
    (``bert.embeddings...``, the Bio_ClinicalBERT hub layout); MLM heads
    (``cls.*``) are dropped.
    """
    from .bert import import_hf_bert

    sd = load_state_dict(path)
    sd = {k: v for k, v in sd.items() if not k.startswith("cls.")}
    return import_hf_bert(sd)


def init_tower_weights(
    variables: Mapping[str, Any],
    cfg,
    image_path: Optional[str] = None,
    text_path: Optional[str] = None,
) -> Dict[str, Any]:
    """Overlay hub-pretrained tower weights onto fresh-init variables.

    Returns a new variables dict; projection heads / adapters keep their
    initialization (the reference trains those from scratch on top of the
    pretrained towers). Strict key/shape validation per tower.
    """
    if not image_path and not text_path:
        return dict(variables)
    variables = dict(variables)
    params = dict(variables["params"])
    if image_path:
        tower_params, tower_stats = load_image_tower_weights(image_path, cfg)
        check_tree_matches(
            f"--init-image-tower {image_path}",
            tower_params, params["image_tower"],
        )
        params["image_tower"] = cast_tree_like(
            tower_params, params["image_tower"]
        )
        if tower_stats:
            stats = dict(variables.get("batch_stats", {}))
            check_tree_matches(
                f"--init-image-tower {image_path} (batch_stats)",
                tower_stats, stats.get("image_tower", {}),
            )
            stats["image_tower"] = cast_tree_like(
                tower_stats, stats.get("image_tower", {})
            )
            variables["batch_stats"] = stats
    if text_path:
        tower_params = load_text_tower_weights(text_path)
        check_tree_matches(
            f"--init-text-tower {text_path}",
            tower_params, params["text_tower"],
        )
        params["text_tower"] = cast_tree_like(
            tower_params, params["text_tower"]
        )
    variables["params"] = params
    return variables
