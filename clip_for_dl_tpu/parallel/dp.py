"""Data-parallel execution over the device mesh.

The parallelism this workload needs (SURVEY.md §5.8): batch arrays sharded
over a 1-D ``data`` axis, parameters/optimizer state replicated, XLA/GSPMD
inserting the gather for the B_global×B_global contrastive similarity —
collectives ride ICI. The explicit shard_map losses
(losses/global_batch.py) remain available for hand-scheduled variants.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS
from ..train.state import TrainState


def data_parallel_step(
    step_fn: Callable,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
    donate_state: bool = True,
    batch_arg_index: int = 1,
    sharded_batch_keys: Optional[Sequence[str]] = None,
):
    """jit a ``step(state, batch, ...)`` with state replicated and the batch
    sharded along the data axis. Extra args are replicated."""
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis_name))

    def batch_sharding(batch):
        return {
            k: shard
            if (sharded_batch_keys is None or k in sharded_batch_keys)
            else repl
            for k in batch
        }

    compiled = {}

    def wrapped(state, batch, *rest):
        key = tuple(sorted(batch))
        if key not in compiled:
            in_shardings = (
                jax.tree.map(lambda _: repl, state),
                batch_sharding(batch),
                *[jax.tree.map(lambda _: repl, r) for r in rest],
            )
            compiled[key] = jax.jit(
                step_fn,
                in_shardings=in_shardings,
                donate_argnums=(0,) if donate_state else (),
            )
        return compiled[key](state, batch, *rest)

    return wrapped


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, repl), state)


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    shard = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, shard), batch)
