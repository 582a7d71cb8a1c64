"""Checkpointing: orbax manager + reference .pth importer.

Replaces the reference's torch.save dict {epoch, models:{name: state_dict},
optimizer, loss, accuracy} with latest/best copies
(0425/train.py:492-541, 0426/train.py:622-641): an orbax CheckpointManager
with async save, `max_to_keep`, best-metric retention and auto-resume
(SURVEY.md §5.3/§5.4 → orbax + preemption-safe restart).

`import_reference_checkpoint` converts a reference ``.pth`` into our params
pytree (via the per-module torch importers) for parity testing.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import numpy as np

logger = logging.getLogger("clip_for_dl_tpu.checkpoint")


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


# Preemption-slot keys are epoch * base + batch_step: monotone across
# repeated preemptions, so a new save never reuses (= never deletes) the
# key of the copy it replaces — retention prunes the old one only after
# the new one is committed.
_PREEMPT_BASE = 1_000_000


class CheckpointManager:
    """Train-state checkpoints keyed by epoch, best tracked by metric.

    Mid-epoch preemption saves live in a separate single-slot manager
    (``<directory>/preempt``) rather than under the epoch keys: the main
    manager ranks checkpoints by ``metric_name`` for best-k retention, and
    a mid-epoch save has no metric — parking it at ``val_loss=inf`` inside
    the same manager would make orbax garbage-collect it as the
    worst-ranked checkpoint the moment ``max_to_keep`` is exceeded
    (verified on orbax 0.11), silently breaking step-granular resume after
    epoch ``max_to_keep``."""

    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        best_mode: str = "min",
        metric_name: str = "val_loss",
    ):
        ocp = _ocp()
        self.directory = os.path.abspath(directory)
        self.metric_name = metric_name
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=lambda m: m[metric_name],
            best_mode=best_mode,
            create=True,
            enable_async_checkpointing=True,
        )
        self.manager = ocp.CheckpointManager(self.directory, options=options)
        self._preempt_manager = None

    @property
    def _preempt(self):
        if self._preempt_manager is None:
            ocp = _ocp()
            self._preempt_manager = ocp.CheckpointManager(
                os.path.join(self.directory, "preempt"),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=1,
                    create=True,
                    # synchronous: a preemption save must be durable before
                    # the process exits on the termination signal
                    enable_async_checkpointing=False,
                ),
            )
        return self._preempt_manager

    def save(self, epoch: int, state, extra: Optional[Dict[str, Any]] = None,
             metrics: Optional[Dict[str, float]] = None) -> None:
        ocp = _ocp()
        if epoch in (self.manager.all_steps() or ()):
            # legacy layouts only (pre-preempt-slot mid-epoch saves used
            # the epoch key): replace, don't collide. New mid-epoch saves
            # go through save_preempt and never reuse an epoch key.
            self.manager.wait_until_finished()
            self.manager.delete(epoch)
        self.manager.save(
            epoch,
            args=ocp.args.StandardSave({"state": state}),
            metrics=metrics or {self.metric_name: float("inf")},
        )
        extra_path = os.path.join(self.directory, f"extra_{epoch}.json")
        if jax.process_index() != 0:
            return  # sidecar writes are primary-host-only (orbax handles
            # the checkpoint itself with its own multihost coordination)
        if extra:
            import json

            with open(extra_path, "w") as f:
                json.dump(extra, f)
        elif os.path.exists(extra_path):
            # completed-epoch save supersedes a stale mid-epoch marker
            os.remove(extra_path)

    def restore(self, state_template, epoch: Optional[int] = None):
        """Restore (state, extra) at `epoch` (default: latest)."""
        ocp = _ocp()
        step = epoch if epoch is not None else self.manager.latest_step()
        if step is None:
            return None, None
        restored = self.manager.restore(
            step,
            args=ocp.args.StandardRestore({"state": state_template}),
        )
        extra = None
        path = os.path.join(self.directory, f"extra_{step}.json")
        if os.path.exists(path):
            import json

            with open(path) as f:
                extra = json.load(f)
        return restored["state"], extra

    def restore_variables(
        self,
        variables_template,
        epoch: Optional[int] = None,
        allow_partial: bool = False,
        use_ema: bool = False,
    ):
        """Restore only params/batch_stats (inference path) — independent of
        the optimizer structure the checkpoint was trained with.
        ``use_ema=True`` reads the EMA slot (state.ema_params, written by
        training with --ema-decay) as the params.

        By default an array present in the template but absent from the
        checkpoint is an **error**: orbax's partial restore silently keeps
        the (random-init) template values, so a geometry mismatch — a MoE
        checkpoint loaded without ``--moe-experts``, a pp run's stacked
        in-run checkpoint fed to zeroshot/serve — would otherwise score
        with untrained weights and produce plausible-looking garbage.
        Pass ``allow_partial=True`` (CLI ``--allow-partial-restore``) to
        opt into the reference's tolerant-load behavior
        (0425/train.py:523-541) when that is genuinely what you want.
        """
        ocp = _ocp()
        step = epoch if epoch is not None else self.manager.latest_step()
        if step is None:
            return None
        self.manager.wait_until_finished()
        key = "ema_params" if use_ema else "params"
        template = {"state": {key: variables_template["params"]}}
        if variables_template.get("batch_stats"):
            template["state"]["batch_stats"] = variables_template["batch_stats"]
        # Standalone checkpointer against the step dir: independent of this
        # manager's registered save handler AND of the optimizer structure
        # the checkpoint was trained with.
        path = os.path.join(self.directory, str(step), "default")
        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
            # partial_restore leaves template entries that are absent from
            # the checkpoint at their (random-init) template values — fail
            # fast (verified on orbax 0.11: the restore itself is silent).
            missing: list = []
            try:
                saved_tree = ckptr.metadata(path).item_metadata.tree
                saved = {
                    jax.tree_util.keystr(p)
                    for p, _ in jax.tree_util.tree_flatten_with_path(
                        saved_tree
                    )[0]
                }
                missing = [
                    jax.tree_util.keystr(p)
                    for p, _ in jax.tree_util.tree_flatten_with_path(
                        template
                    )[0]
                    if jax.tree_util.keystr(p) not in saved
                ]
            except Exception:  # structure probing must never break restore
                logger.debug("checkpoint metadata probe failed", exc_info=True)
            if missing:
                msg = (
                    f"checkpoint {path} lacks {len(missing)} of the "
                    f"model's arrays (e.g. {missing[:4]}) — those would "
                    "stay at template (random-init) values. Rebuild with "
                    "the flags the checkpoint was trained with "
                    "(--moe-experts / --tiny / tower geometry), or pass "
                    "--allow-partial-restore to accept partial weights."
                )
                if not allow_partial:
                    raise ValueError(msg)
                logger.warning(msg)
            # Explicit target shardings from the template: a checkpoint
            # saved on an N-device mesh (dp training) must restore onto
            # THIS process's placement — without restore_args orbax falls
            # back to the saved shardings, whose mesh doesn't exist in a
            # single-device serving process.
            restore_args = ocp.checkpoint_utils.construct_restore_args(
                template
            )
            restored = ckptr.restore(
                path, args=ocp.args.PyTreeRestore(
                    template, restore_args=restore_args,
                    partial_restore=True,
                )
            )
        out = {"params": restored["state"][key]}
        if "batch_stats" in restored["state"]:
            out["batch_stats"] = restored["state"]["batch_stats"]
        return out

    def latest_epoch(self) -> Optional[int]:
        return self.manager.latest_step()

    def best_epoch(self) -> Optional[int]:
        return self.manager.best_step()

    # -- mid-epoch preemption slot (see class docstring) -------------------

    def save_preempt(self, epoch: int, state,
                     extra: Optional[Dict[str, Any]] = None) -> None:
        """Durable mid-epoch save, outside best-k retention. `extra` is the
        resume payload ({mid_epoch, loader, num_batches})."""
        ocp = _ocp()
        step = 0
        if extra and isinstance(extra.get("loader"), dict):
            step = int(extra["loader"].get("step", 0))
        key = epoch * _PREEMPT_BASE + min(max(step, 0), _PREEMPT_BASE - 1)
        self._preempt.save(key, args=ocp.args.StandardSave({"state": state}))
        self._preempt.wait_until_finished()
        if jax.process_index() != 0:
            return
        if extra:
            import json

            path = os.path.join(self.directory, "preempt",
                                 f"extra_{key}.json")
            with open(path, "w") as f:
                json.dump(extra, f)

    def preempt_latest(self) -> Optional[int]:
        """Epoch of the newest preemption save, or None."""
        if not os.path.isdir(os.path.join(self.directory, "preempt")):
            return None  # don't create the slot dir just by probing
        key = self._preempt.latest_step()
        return None if key is None else key // _PREEMPT_BASE

    def restore_preempt(self, state_template):
        """Restore (state, extra) from the newest preemption save."""
        ocp = _ocp()
        key = self._preempt.latest_step()
        if key is None:
            return None, None
        restored = self._preempt.restore(
            key, args=ocp.args.StandardRestore({"state": state_template})
        )
        extra = None
        path = os.path.join(self.directory, "preempt", f"extra_{key}.json")
        if os.path.exists(path):
            import json

            with open(path) as f:
                extra = json.load(f)
        return restored["state"], extra

    def prune_preempt(self) -> None:
        """Drop preemption saves superseded by a committed completed-epoch
        checkpoint. Called after wait() so the completed save is durable
        first — never inside save(), where deleting the only other copy
        would reopen the lose-both-on-crash window."""
        if self._preempt_manager is None and not os.path.isdir(
            os.path.join(self.directory, "preempt")
        ):
            return
        latest = self.manager.latest_step()
        if latest is None:
            return
        for key in list(self._preempt.all_steps() or ()):
            if key // _PREEMPT_BASE <= latest:
                self._preempt.delete(key)
                if jax.process_index() == 0:
                    path = os.path.join(self.directory, "preempt",
                                        f"extra_{key}.json")
                    if os.path.exists(path):
                        os.remove(path)

    def wait(self) -> None:
        self.manager.wait_until_finished()
        self.prune_preempt()

    def close(self) -> None:
        if self._preempt_manager is not None:
            self._preempt_manager.close()
        self.manager.close()


# ---------------------------------------------------------------------------
# reference .pth import (parity bridge)
# ---------------------------------------------------------------------------

# reference module name → (our params key, importer)
_MODULE_IMPORTERS = {
    "resnet": "image_tower",
    "image_projector": "image_projector",
    "text_projector": "text_projector",
    "text_model": "text_tower",
    "view_fusion": "view_fusion",
    "multimodal_attention": "multimodal_attention",
    "classifier": "adapter",
}


def import_reference_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference checkpoint {epoch, models:{name: state_dict}, ...}
    — a torch ``.pth`` pickle or its flat ``.safetensors`` mirror (written
    by :func:`models.safetensors_io.save_reference_checkpoint_safetensors`
    or the ``convert`` CLI command) — and convert each module's weights
    into our params tree keys.

    Returns {"params": {...converted modules...}, "batch_stats": {...},
    "epoch": int}. Missing modules are simply absent (the reference's own
    tolerant-load behavior, 0425/train.py:523-541).
    """
    if path.endswith(".safetensors"):
        from ..models.safetensors_io import (
            load_reference_checkpoint_safetensors,
        )

        models, epoch = load_reference_checkpoint_safetensors(path)
        params, stats = convert_reference_models(models)
        return {"params": params, "batch_stats": stats, "epoch": epoch}

    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    models = ckpt.get("models", ckpt)
    params, stats = convert_reference_models(models)
    return {
        "params": params,
        "batch_stats": stats,
        "epoch": int(ckpt.get("epoch", 0)) if isinstance(ckpt, dict) else 0,
    }


def convert_reference_models(
    models: Mapping[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """{reference module name: state_dict} → (params, batch_stats) trees."""
    from ..models.bert import import_hf_bert
    from ..models.resnet import import_torchvision_resnet50
    from ..models import torch_import as ti

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for name, sd in models.items():
        if not isinstance(sd, dict):
            continue
        sd = {k: v for k, v in sd.items()}
        if name == "resnet":
            p, s = import_torchvision_resnet50(sd)
            params["image_tower"], stats["image_tower"] = p, s
        elif name == "text_model":
            params["text_tower"] = import_hf_bert(sd)
        elif name == "image_projector":
            params["image_projector"] = ti.import_residual_projection(
                sd, "image_projection"
            )
        elif name == "text_projector":
            params["text_projector"] = ti.import_residual_projection(
                sd, "text_projection"
            )
        elif name == "view_fusion":
            params["view_fusion"] = ti.import_multiview_fusion(sd)
        elif name == "multimodal_attention":
            params["multimodal_attention"] = ti.import_additive_attention(sd)
        elif name == "classifier":
            params["adapter"] = ti.import_linear_classifier(sd)
    return params, stats


def merge_imported_params(target_params, imported) -> Any:
    """Overlay imported modules onto an initialized params tree, leaving
    modules absent from the checkpoint at their initialized values."""
    out = jax.tree_util.tree_map(lambda x: x, target_params)  # shallow copy

    def overlay(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and k in dst and isinstance(dst[k], dict):
                overlay(dst[k], v)
            else:
                dst[k] = np.asarray(v)

    overlay(out, imported)
    return out
