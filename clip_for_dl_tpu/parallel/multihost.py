"""Multi-host (multi-process) runtime — SURVEY.md §5.8 completed.

The reference is strictly single-device (`/root/reference/0425/config.py:56`
pins one ``DEVICE``; no torch.distributed anywhere). A real TPU pod slice
(v5e-16 and up) is *multi-process by construction*: one Python process per
host, each seeing only its local chips, with XLA collectives riding ICI
between them. This module is the runtime glue that turns the single-process
GSPMD programs in this package into pod-ready ones:

- :func:`initialize` — ``jax.distributed.initialize`` bootstrap (JAX's
  coordination service: process 0 is the coordinator, all others dial in).
  After this, ``jax.devices()`` is the *global* device list and every jit
  over a global mesh runs SPMD across hosts.
- :func:`process_sharded_loader_kwargs` — each host feeds only its own
  strided shard of the dataset (HostLoader's ``shard_index/num_shards``),
  so host-side decode bandwidth scales with the number of hosts.
- :func:`local_batch_to_global` — assembles the per-process numpy batches
  into global jax.Arrays via ``jax.make_array_from_process_local_data``;
  the training step then sees one logical global batch sharded over the
  ``data`` axis exactly as in the single-process path.
- :func:`multihost_step` / :func:`wrap_loader` — drop-in wrappers used by
  the CLI so every existing command gains ``--coordinator/--num-processes/
  --process-id`` without touching the step functions.
- :func:`is_primary` / :func:`sync` — rank gating for host-side writes
  (CSV/JSON/log files) and barriers around checkpoint IO. Orbax itself is
  multihost-aware once ``jax.distributed`` is initialized (primary-host
  metadata writes + internal barriers); our CheckpointManager only needs
  its *extra* sidecar file gated to the primary.

Equivalence proof: ``tests/test_multihost.py`` launches 2 subprocesses x 4
virtual CPU devices each and checks train-step losses against the 8-device
single-process run (same global batch, same seeds).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Mapping, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger("clip_for_dl_tpu.multihost")

DATA_AXIS = "data"


def initialize(
    coordinator: str,
    num_processes: int,
    process_id: int,
    local_device_ids: Optional[list] = None,
) -> None:
    """Join the JAX coordination service (idempotent; no-op for 1 process).

    Must run before any other JAX call touches a backend. On TPU pods the
    three arguments are usually inferred from the TPU metadata server and
    plain ``jax.distributed.initialize()`` suffices — pass them explicitly
    for CPU testing or non-standard launchers (SLURM, k8s indexed jobs).
    """
    if num_processes <= 1:
        return
    kwargs: Dict[str, Any] = {}
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    logger.info(
        "joined coordination service %s as process %d/%d — %d global / %d "
        "local devices",
        coordinator, process_id, num_processes,
        len(jax.devices()), len(jax.local_devices()),
    )


def is_distributed() -> bool:
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that should perform host-side writes."""
    return jax.process_index() == 0


def sync(name: str = "barrier") -> None:
    """Cross-process barrier (no-op single-process). Use around checkpoint
    directory mutations so no process races ahead of a save/delete."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def process_sharded_loader_kwargs(
    global_batch_size: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> Dict[str, int]:
    """HostLoader kwargs for this process's shard of the dataset.

    Each host loads ``1/process_count`` of the samples (strided, so the
    per-host batches interleave into the global shuffle order) and batches
    them at ``global_batch_size / process_count`` — the per-process slice
    of the global batch that :func:`local_batch_to_global` reassembles.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if global_batch_size % pc:
        raise ValueError(
            f"global batch size {global_batch_size} must divide over "
            f"{pc} processes"
        )
    return {
        "batch_size": global_batch_size // pc,
        "shard_index": pi,
        "num_shards": pc,
        # equal per-shard batch counts — a skew would deadlock collectives
        "even_shards": True,
    }


def fetch_global(x):
    """np.asarray that works on multi-process (non-fully-addressable)
    arrays by all-gathering the remote shards first."""
    import numpy as np

    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def gather_host(x):
    """All-gather HOST-side (numpy) per-process data into the global row
    order (process-major, matching a global device array's block layout).

    Distinct from :func:`fetch_global`, which gathers only when given a
    non-fully-addressable ``jax.Array`` and passes numpy through untouched
    — host-side batch fields (labels, masks) are plain numpy on every
    process and must ALWAYS be gathered to line up with gathered device
    outputs."""
    import numpy as np

    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(np.asarray(x), tiled=True)
    )


def local_batch_to_global(
    batch: Mapping[str, Any],
    mesh: Mesh,
    data_axis: str = DATA_AXIS,
) -> Dict[str, Any]:
    """Per-process numpy batch → global jax.Arrays sharded over ``data``.

    Every ndarray entry becomes a global array whose leading dim is the sum
    of the per-process batch dims (``jax.make_array_from_process_local_data``
    places each host's rows on its own devices — zero cross-host transfer).
    Non-array entries (strings, lists) stay process-local.
    """
    sharding = NamedSharding(mesh, P(data_axis))
    out: Dict[str, Any] = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            out[k] = jax.make_array_from_process_local_data(sharding, v)
        else:
            out[k] = v
    return out


def wrap_loader(loader, mesh: Mesh, data_axis: str = DATA_AXIS):
    """Iterate a host loader, assembling each batch into global arrays."""
    for batch in loader:
        yield local_batch_to_global(batch, mesh, data_axis)


def global_mesh(num_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data mesh over the *global* device list (all hosts)."""
    devs = jax.devices()
    if num_devices is not None:
        if len(devs) != num_devices:
            raise ValueError(
                f"--num-devices {num_devices} != {len(devs)} global devices "
                "visible after jax.distributed.initialize — on a pod the "
                "mesh must cover every chip of the slice"
            )
    return Mesh(np.asarray(devs), (axis,))


def assert_same_across_processes(value: float, name: str, atol: float = 0.0):
    """Debug guard: checks a host-side scalar is identical on all processes
    (e.g. a loss after a step — catches desynchronized data feeding)."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    arr = np.asarray([value], np.float64)
    gathered = multihost_utils.process_allgather(arr)
    if not np.allclose(gathered, gathered[0], atol=atol):
        raise AssertionError(
            f"{name} differs across processes: {gathered.ravel().tolist()}"
        )
