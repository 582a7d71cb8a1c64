from .checkpoint import (
    CheckpointManager,
    import_reference_checkpoint,
    merge_imported_params,
)
from .loop import History, fit, resume_or_init, run_epoch, run_eval
from .preemption import PreemptionGuard
from .optim import (
    CosineSchedule,
    EarlyStopping,
    ReduceLROnPlateau,
    apply_group_lrs,
    base_transform,
    cosine_annealing_lr,
    freeze_mask,
    make_label_fn,
    mask_updates,
    warmup_scale,
)
from .accum import make_accum_clip_pretrain_step
from .state import TrainState
from .steps import (
    make_adapter_eval_step,
    make_adapter_train_step,
    make_clip_eval_step,
    make_clip_pretrain_step,
    make_multiview_eval_step,
    make_multiview_train_step,
    make_shared_adapter_eval_step,
    make_shared_adapter_train_step,
)

__all__ = [
    "CheckpointManager",
    "import_reference_checkpoint",
    "merge_imported_params",
    "History",
    "fit",
    "resume_or_init",
    "PreemptionGuard",
    "run_epoch",
    "run_eval",
    "CosineSchedule",
    "EarlyStopping",
    "ReduceLROnPlateau",
    "apply_group_lrs",
    "base_transform",
    "cosine_annealing_lr",
    "freeze_mask",
    "make_label_fn",
    "mask_updates",
    "warmup_scale",
    "TrainState",
    "make_accum_clip_pretrain_step",
    "make_adapter_eval_step",
    "make_adapter_train_step",
    "make_clip_eval_step",
    "make_clip_pretrain_step",
    "make_multiview_eval_step",
    "make_multiview_train_step",
    "make_shared_adapter_eval_step",
    "make_shared_adapter_train_step",
]
