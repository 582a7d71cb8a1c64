from .dp import data_parallel_step, replicate_state, shard_batch
from .sp import sequence_sharded_fn
from .tp import (
    MODEL_AXIS,
    create_dp_tp_mesh,
    shard_state_tp,
    tensor_parallel_step,
    tp_shardings,
    tp_spec,
    validate_tp,
)

__all__ = [
    "data_parallel_step",
    "replicate_state",
    "shard_batch",
    "sequence_sharded_fn",
    "MODEL_AXIS",
    "create_dp_tp_mesh",
    "shard_state_tp",
    "tensor_parallel_step",
    "tp_shardings",
    "tp_spec",
    "validate_tp",
]
