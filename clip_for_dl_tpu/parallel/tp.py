"""Tensor parallelism (Megatron-style) as a second mesh axis, via GSPMD.

The reference is strictly single-device (SURVEY.md §5.8) and this
framework's primary scaling mode is data parallelism (``parallel/dp.py``)
— the right parallelism at reference scale. This module adds the
composable ``model`` axis for deployments whose per-chip memory or
serving-latency budget wants the transformer towers themselves sharded:

- **column-parallel** Dense layers (BERT ``query``/``key``/``value``/
  ``intermediate``, ViT ``q_proj``/``k_proj``/``v_proj``/``mlp_1``) shard
  their *output* features — attention heads and the MLP hidden — over the
  ``model`` axis;
- **row-parallel** Dense layers (BERT ``attention_output``/``output``,
  ViT ``out_proj``/``mlp_2``) shard their *input* features, and XLA
  inserts the partial-sum all-reduce after the matmul.

TPU-native: no model-code changes, no hand-written collectives — the
param ``PartitionSpec``s alone drive GSPMD's propagation, and the
resulting all-reduces ride ICI. The rules key off param-tree paths, so
the same function shards a bare params tree, the Adam moments inside an
``optax`` state, or a whole ``TrainState`` (opt-state paths end with the
same module names).

Scope guard: only subtrees under a transformer layer (a ``layer_<i>``
path component — BERT/ViT block naming) are sharded; ResNet blocks
(``layer1_0`` style), heads, and fusion modules stay replicated. Convs
are left to XLA's spatial tiling — at 224 px input their per-chip FLOPs
don't warrant weight sharding.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax.tree_util import DictKey, GetAttrKey

from ..core.mesh import DATA_AXIS
from .common import create_2d_mesh, shard_tree, spec_parallel_step, tree_shardings

MODEL_AXIS = "model"

# Dense module names whose kernel's OUTPUT features shard over `model`.
_COLUMN_PARALLEL = frozenset(
    {"query", "key", "value", "intermediate", "q_proj", "k_proj", "v_proj",
     "mlp_1"}
)
# Dense module names whose kernel's INPUT features shard over `model`
# (all-reduce of partial sums after the matmul).
_ROW_PARALLEL = frozenset({"attention_output", "output", "out_proj", "mlp_2"})

_TRANSFORMER_LAYER = re.compile(r"^layer_\d+$")


def create_dp_tp_mesh(
    tp: int,
    num_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """2-D ``(data, model)`` mesh: ``model`` innermost (fastest-varying
    device order) so the per-layer TP all-reduces ride the shortest ICI
    hops; ``data`` outermost for the once-per-step gradient reduction."""
    return create_2d_mesh(tp, axis_names, num_devices, devices)


def _path_names(path) -> list:
    names = []
    for part in path:
        if isinstance(part, DictKey):
            names.append(str(part.key))
        elif isinstance(part, GetAttrKey):
            names.append(part.name)
    return names


def tp_spec(path, value, axis_name: str = MODEL_AXIS) -> P:
    """PartitionSpec for one param-tree leaf under Megatron TP rules."""
    names = _path_names(path)
    if len(names) < 2 or not any(_TRANSFORMER_LAYER.match(n) for n in names):
        return P()
    parent, leaf = names[-2], names[-1]
    if parent in _COLUMN_PARALLEL:
        if leaf == "kernel" and value.ndim == 2:
            return P(None, axis_name)
        if leaf == "bias" and value.ndim == 1:
            return P(axis_name)
    elif parent in _ROW_PARALLEL:
        if leaf == "kernel" and value.ndim == 2:
            return P(axis_name, None)
        # row-parallel bias stays replicated (added after the all-reduce)
    return P()


def tp_shardings(tree, mesh: Mesh, axis_name: str = MODEL_AXIS):
    """NamedShardings for any pytree (params / TrainState / opt_state):
    TP specs on transformer-layer Dense kernels+biases, replicated
    elsewhere. Adam moments shard like their params automatically because
    their tree paths end with the same module names."""
    return tree_shardings(tree, mesh, tp_spec, axis_name)


def validate_tp(heads: int, intermediate: int, tp: int) -> None:
    """TP degree must divide the attention heads and the MLP hidden."""
    if heads % tp or intermediate % tp:
        raise ValueError(
            f"tp={tp} must divide attention heads ({heads}) and MLP "
            f"intermediate ({intermediate})"
        )


def shard_state_tp(state, mesh: Mesh, axis_name: str = MODEL_AXIS):
    """Place a TrainState (or any pytree) on a (data, model) mesh with TP
    param/opt-state shardings; everything else replicated."""
    return shard_tree(state, mesh, tp_spec, axis_name)


def tensor_parallel_step(
    step_fn,
    mesh: Mesh,
    data_axis: str = DATA_AXIS,
    model_axis: str = MODEL_AXIS,
    donate_state: bool = True,
):
    """jit a ``step(state, batch, *rest)`` over a (data, model) mesh:
    batch sharded on ``data``, state TP-sharded on ``model`` per
    :func:`tp_shardings` in and out, extra args replicated. GSPMD
    propagates the activation shardings and inserts the TP all-reduces +
    DP gradient reduction."""
    return spec_parallel_step(
        step_fn, mesh, tp_spec, model_axis, data_axis, donate_state
    )
