"""Expert parallelism: the `expert` mesh axis for MoE text towers.

Companion to ``models/moe.py`` (Switch-style top-1 MoE MLP). The stacked
expert weights (``wi/bi/wo/bo`` under a ``moe_mlp`` module, leading dim
``[E, ...]``) shard ``P('expert')``; everything else — router, dense
layers, towers — stays replicated. GSPMD then partitions the expert
einsums so each device materializes and computes only its ``E/ep``
experts, and inserts the one all-reduce over ``expert`` at the combine
step. The same path rules shard Adam moments automatically (their tree
paths end with the same leaf names), mirroring ``parallel/tp.py``.

Composes with data parallelism on a 2-D ``(data, expert)`` mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax.tree_util import DictKey, GetAttrKey

from ..core.mesh import DATA_AXIS
from .common import create_2d_mesh, shard_tree, spec_parallel_step, tree_shardings

EXPERT_AXIS = "expert"

_EXPERT_MODULE = "moe_mlp"
_EXPERT_LEAVES = frozenset({"wi", "bi", "wo", "bo"})


def create_dp_ep_mesh(
    ep: int,
    num_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, str] = (DATA_AXIS, EXPERT_AXIS),
) -> Mesh:
    """2-D ``(data, expert)`` mesh; ``expert`` innermost so the combine
    all-reduce rides the shortest ICI hops."""
    return create_2d_mesh(ep, axis_names, num_devices, devices)


def validate_ep(num_experts: int, ep: int) -> None:
    if ep < 1 or num_experts % ep:
        raise ValueError(
            f"ep={ep} must divide the expert count ({num_experts})"
        )


def _path_names(path) -> list:
    names = []
    for part in path:
        if isinstance(part, DictKey):
            names.append(str(part.key))
        elif isinstance(part, GetAttrKey):
            names.append(part.name)
    return names


def ep_spec(path, value, axis_name: str = EXPERT_AXIS) -> P:
    """P('expert') on the leading [E, ...] dim of stacked expert weights;
    replicated elsewhere (router included — it runs on every device)."""
    names = _path_names(path)
    if (
        len(names) >= 2
        and names[-1] in _EXPERT_LEAVES
        and _EXPERT_MODULE in names
    ):
        return P(axis_name, *([None] * (value.ndim - 1)))
    return P()


def ep_shardings(tree, mesh: Mesh, axis_name: str = EXPERT_AXIS):
    """NamedShardings for params / opt-state / TrainState pytrees."""
    return tree_shardings(tree, mesh, ep_spec, axis_name)


def shard_state_ep(state, mesh: Mesh, axis_name: str = EXPERT_AXIS):
    """Place a TrainState (or any pytree) on a (data, expert) mesh with
    expert weights/moments sharded, everything else replicated."""
    return shard_tree(state, mesh, ep_spec, axis_name)


def expert_parallel_step(
    step_fn,
    mesh: Mesh,
    data_axis: str = DATA_AXIS,
    expert_axis: str = EXPERT_AXIS,
    donate_state: bool = True,
):
    """jit a ``step(state, batch, *rest)`` over a (data, expert) mesh:
    batch sharded on ``data``, expert weights sharded on ``expert``
    (in- and out-pinned — see ``common.spec_parallel_step``)."""
    return spec_parallel_step(
        step_fn, mesh, ep_spec, expert_axis, data_axis, donate_state
    )
