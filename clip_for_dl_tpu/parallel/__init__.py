from .dp import data_parallel_step, replicate_state, shard_batch

__all__ = ["data_parallel_step", "replicate_state", "shard_batch"]
