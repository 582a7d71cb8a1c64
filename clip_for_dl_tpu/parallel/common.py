"""Shared machinery for the 2-D (data, X) parallelism wrappers.

tp/pp/ep all follow the same recipe: a 2-D mesh with ``data`` outermost
and the regime axis innermost (shortest ICI hops for the per-step
collectives), plus a jit wrapper that pins the TrainState's shardings on
the way IN and OUT of the step via a path-based spec function. One
implementation here so a fix (e.g. the out-sharding pin) lands once.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS

# spec_fn(path, value_or_shape_struct, axis_name) -> PartitionSpec
SpecFn = Callable[..., P]


def create_2d_mesh(
    degree: int,
    axis_names: Tuple[str, str],
    num_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(data, <axis>) mesh with the regime axis innermost."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        if len(devs) < num_devices:
            raise ValueError(
                f"requested {num_devices} devices, {len(devs)} visible"
            )
        devs = devs[:num_devices]
    name = axis_names[1]
    if degree < 1 or len(devs) % degree:
        raise ValueError(
            f"{len(devs)} devices do not split into {name}={degree}"
        )
    grid = np.array(devs).reshape(len(devs) // degree, degree)
    return Mesh(grid, axis_names)


def tree_shardings(tree, mesh: Mesh, spec_fn: SpecFn, axis_name: str):
    """NamedShardings for any pytree (params / opt-state / TrainState /
    eval_shape structs) under a path-based spec rule."""
    return jax.tree_util.tree_map_with_path(
        lambda path, v: NamedSharding(mesh, spec_fn(path, v, axis_name)), tree
    )


def shard_tree(tree, mesh: Mesh, spec_fn: SpecFn, axis_name: str):
    """device_put every leaf under the spec rule."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(
            x, NamedSharding(mesh, spec_fn(path, x, axis_name))
        ),
        tree,
    )


def spec_parallel_step(
    step_fn,
    mesh: Mesh,
    spec_fn: SpecFn,
    axis_name: str,
    data_axis: str = DATA_AXIS,
    donate_state: bool = True,
):
    """jit a ``step(state, batch, *rest)``: batch sharded on ``data``,
    state sharded per ``spec_fn`` on the way in AND out (without the
    output pin, GSPMD may emit a different output layout — e.g. an
    axis-sharded bias — that mismatches the next call's in_shardings),
    extra args replicated."""
    repl = NamedSharding(mesh, P())
    batch_shard = NamedSharding(mesh, P(data_axis))
    compiled = {}

    def wrapped(state, batch, *rest):
        key = tuple(sorted(batch))
        if key not in compiled:
            in_shardings = (
                tree_shardings(state, mesh, spec_fn, axis_name),
                {k: batch_shard for k in batch},
                *[jax.tree.map(lambda _: repl, r) for r in rest],
            )
            out_shardings = tree_shardings(
                jax.eval_shape(step_fn, state, batch, *rest),
                mesh, spec_fn, axis_name,
            )
            compiled[key] = jax.jit(
                step_fn,
                in_shardings=in_shardings,
                out_shardings=out_shardings,
                donate_argnums=(0,) if donate_state else (),
            )
        return compiled[key](state, batch, *rest)

    return wrapped
