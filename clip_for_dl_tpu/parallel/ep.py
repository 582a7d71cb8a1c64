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
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey, GetAttrKey

from ..core.mesh import DATA_AXIS

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
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        if len(devs) < num_devices:
            raise ValueError(
                f"requested {num_devices} devices, {len(devs)} visible"
            )
        devs = devs[:num_devices]
    if ep < 1 or len(devs) % ep:
        raise ValueError(f"{len(devs)} devices do not split into ep={ep}")
    grid = np.array(devs).reshape(len(devs) // ep, ep)
    return Mesh(grid, axis_names)


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
    return jax.tree_util.tree_map_with_path(
        lambda path, v: NamedSharding(mesh, ep_spec(path, v, axis_name)), tree
    )


def shard_state_ep(state, mesh: Mesh, axis_name: str = EXPERT_AXIS):
    """Place a TrainState (or any pytree) on a (data, expert) mesh with
    expert weights/moments sharded, everything else replicated."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(
            x, NamedSharding(mesh, ep_spec(path, x, axis_name))
        ),
        state,
    )


def expert_parallel_step(
    step_fn,
    mesh: Mesh,
    data_axis: str = DATA_AXIS,
    expert_axis: str = EXPERT_AXIS,
    donate_state: bool = True,
):
    """jit a ``step(state, batch, *rest)`` over a (data, expert) mesh:
    batch sharded on ``data``, expert weights sharded on ``expert``."""
    repl = NamedSharding(mesh, P())
    batch_shard = NamedSharding(mesh, P(data_axis))
    compiled = {}

    def wrapped(state, batch, *rest):
        key = tuple(sorted(batch))
        if key not in compiled:
            in_shardings = (
                ep_shardings(state, mesh, expert_axis),
                {k: batch_shard for k in batch},
                *[jax.tree.map(lambda _: repl, r) for r in rest],
            )
            # pin outputs too: without this GSPMD may emit e.g. an
            # expert-sharded router bias in the updated state, which then
            # mismatches the next call's replicated in_sharding
            out_shardings = ep_shardings(
                jax.eval_shape(step_fn, state, batch, *rest),
                mesh, expert_axis,
            )
            compiled[key] = jax.jit(
                step_fn,
                in_shardings=in_shardings,
                out_shardings=out_shardings,
                donate_argnums=(0,) if donate_state else (),
            )
        return compiled[key](state, batch, *rest)

    return wrapped
