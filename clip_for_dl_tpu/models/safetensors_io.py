"""safetensors ↔ params bridge.

The reference builds its towers from hub-pretrained weights at model
construction (`/root/reference/0425/train.py:761-776`: torchvision
``resnet50(pretrained=True)`` and HF ``AutoModel.from_pretrained``).
HuggingFace now ships those weights as ``model.safetensors`` by default,
and torch>=2.6's ``weights_only`` default makes raw ``.bin`` pickles
awkward — so the framework speaks safetensors natively:

- ``load_state_dict`` reads any weight file a real-data user will have on
  day one (``.safetensors``, ``.pth``/``.bin``, or an HF snapshot
  directory) into a plain ``{name: np.ndarray}`` mapping, which is exactly
  what the converters in :mod:`torch_import` / :mod:`resnet` / :mod:`bert`
  / :mod:`vit` consume.
- ``save_reference_checkpoint_safetensors`` /
  ``load_reference_checkpoint_safetensors`` mirror the reference's
  ``{epoch, models: {name: state_dict}}`` ``.pth`` layout
  (`0425/train.py:505-541`) as a flat, torch-free artifact: keys are
  ``"{module}.{param_path}"`` (module names never contain dots), epoch
  rides the metadata block.

No torch import is required on the load path unless the file itself is a
torch pickle or stores bf16 (numpy has no native bfloat16; those tensors
hop through torch and land as float32).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

# Metadata keys for the flat reference-checkpoint layout.
_FORMAT_KEY = "clip_for_dl_tpu.format"
_FORMAT = "reference-checkpoint-v1"
_EPOCH_KEY = "clip_for_dl_tpu.epoch"

# HF snapshot directories: preferred file order.
_HF_WEIGHT_FILES = ("model.safetensors", "pytorch_model.bin")


def _load_safetensors_file(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, str]]:
    """Load a .safetensors file → (tensors, metadata).

    Uses the numpy backend; tensors in dtypes numpy can't represent
    (bfloat16) are read through torch and upcast to float32.
    """
    from safetensors import safe_open

    tensors: Dict[str, np.ndarray] = {}
    fallback_keys = []
    with safe_open(path, framework="numpy") as f:
        meta = dict(f.metadata() or {})
        for k in f.keys():
            try:
                tensors[k] = f.get_tensor(k)
            except (TypeError, ValueError):  # e.g. bfloat16 under numpy
                fallback_keys.append(k)
    if fallback_keys:
        with safe_open(path, framework="pt") as f:
            for k in fallback_keys:
                t = f.get_tensor(k)
                tensors[k] = t.float().numpy()
    return tensors, meta


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Weight file → flat ``{name: np.ndarray}`` state dict.

    Accepts:
    - ``*.safetensors`` (no torch needed),
    - ``*.pth`` / ``*.bin`` / ``*.pt`` (torch pickle; nested reference
      checkpoints are NOT unwrapped here — use
      ``train.checkpoint.import_reference_checkpoint`` for those),
    - a directory (HF snapshot): picks ``model.safetensors`` then
      ``pytorch_model.bin``.
    """
    if os.path.isdir(path):
        for name in _HF_WEIGHT_FILES:
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                return load_state_dict(cand)
        raise FileNotFoundError(
            f"{path} is a directory but contains none of {_HF_WEIGHT_FILES} "
            "(expected an HF model snapshot)"
        )
    if path.endswith(".safetensors"):
        tensors, _ = _load_safetensors_file(path)
        return tensors
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:  # torch refuses arbitrary pickles (nn.Module etc.)
        raise ValueError(
            f"{path} is not a plain tensor state_dict (torch weights_only "
            f"load failed: {e}) — if a whole nn.Module was pickled, save "
            "its .state_dict() instead and retry"
        ) from e
    out = {
        k: (v.detach().cpu().float().numpy()
            if v.dtype == torch.bfloat16 else v.detach().cpu().numpy())
        for k, v in sd.items()
        if hasattr(v, "detach")
    }
    skipped = sorted(set(sd) - set(out))
    if skipped:
        import warnings

        warnings.warn(
            f"{path}: skipped {len(skipped)} non-tensor entries "
            f"({skipped[:5]}{'...' if len(skipped) > 5 else ''})",
            stacklevel=2,
        )
    return out


def save_safetensors(
    tensors: Mapping[str, np.ndarray],
    path: str,
    metadata: Optional[Mapping[str, str]] = None,
) -> str:
    """Flat ``{name: array}`` → ``.safetensors`` file (contiguous copies)."""
    from safetensors.numpy import save_file

    flat = {k: np.ascontiguousarray(np.asarray(v)) for k, v in tensors.items()}
    save_file(flat, path, metadata=dict(metadata) if metadata else None)
    return path


def save_reference_checkpoint_safetensors(
    variables: Mapping[str, Any], path: str, epoch: int = 0,
    text_layers: int = 12,
) -> str:
    """CXRClip variables → flat safetensors in the reference's module
    layout (``{epoch, models:{resnet, text_model, ...}}``,
    `0425/train.py:505-541`) — keys ``"{module}.{param}"``, epoch in
    metadata. Torch-free counterpart of
    :func:`torch_export.save_reference_checkpoint`."""
    from .torch_export import export_reference_checkpoint

    ckpt = export_reference_checkpoint(variables, epoch, text_layers)
    flat: Dict[str, np.ndarray] = {}
    for module, sd in ckpt["models"].items():
        for k, v in sd.items():
            flat[f"{module}.{k}"] = np.asarray(v)
    return save_safetensors(
        flat, path,
        metadata={_FORMAT_KEY: _FORMAT, _EPOCH_KEY: str(ckpt["epoch"])},
    )


def load_reference_checkpoint_safetensors(
    path: str,
) -> Tuple[Dict[str, Dict[str, np.ndarray]], int]:
    """Flat reference-layout safetensors → (``{module: state_dict}``,
    epoch). Module is the first dotted component (module names are
    dot-free by construction).

    The format metadata written by :func:`save_reference_checkpoint_
    safetensors` is required — a hub weight file (e.g. Bio_ClinicalBERT's
    ``model.safetensors``) passed as ``--checkpoint`` would otherwise
    partition into unknown module groups, import nothing, and silently
    score with fresh-init weights."""
    tensors, meta = _load_safetensors_file(path)
    if meta.get(_FORMAT_KEY) != _FORMAT:
        raise ValueError(
            f"{path} is not a {_FORMAT} checkpoint (metadata "
            f"{_FORMAT_KEY!r} missing) — hub tower weight files load via "
            "--init-image-tower/--init-text-tower, not --checkpoint; "
            "write checkpoints with the `convert` command"
        )
    models: Dict[str, Dict[str, np.ndarray]] = {}
    for key, v in tensors.items():
        module, _, param = key.partition(".")
        if not param:
            raise ValueError(
                f"{path}: key {key!r} has no module prefix — not a "
                "reference-layout checkpoint (expected 'module.param.path')"
            )
        models.setdefault(module, {})[param] = v
    epoch = int(meta.get(_EPOCH_KEY, 0))
    return models, epoch
