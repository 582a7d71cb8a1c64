"""Device mesh + sharding helpers.

The reference is strictly single-device (SURVEY.md §5.8: a single ``DEVICE``
constant, no torch.distributed / NCCL anywhere). Scaling here is TPU-native:
a `jax.sharding.Mesh` over the ICI-connected chips with a 1-D ``data`` axis,
batch arrays sharded along it, parameters replicated, and global-batch
contrastive negatives gathered with XLA collectives (losses/global_batch.py).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import MeshConfig

DATA_AXIS = "data"


def force_virtual_cpu_devices(n: int) -> None:
    """Switch this process to ≥ ``n`` virtual CPU devices (the XLA
    host-platform trick) so multi-chip code paths run without hardware.

    XLA parses ``XLA_FLAGS`` ONCE per process, at the first backend
    creation — raising the device count later is impossible (verified:
    ``clear_backends`` does not re-read the env). So this helper never
    LOWERS a pre-existing count (an n-device mesh slices a bigger device
    set just fine), only raises it, and fails loudly when the process
    already initialized with fewer than ``n``. It also flips the platform
    through ``jax.config`` because a pre-imported jax (e.g. a
    sitecustomize) ignores late env changes. Callers holding live device
    arrays must not call this: ``clear_backends`` invalidates them.
    """
    import re

    flags = os.environ.get("XLA_FLAGS", "")
    flag = f"--xla_force_host_platform_device_count={n}"
    m = re.search(r"--xla_force_host_platform_device_count=(\d+)", flags)
    if m is None:
        flags = (flags + " " + flag).strip()
    elif int(m.group(1)) < n:
        flags = re.sub(
            r"--xla_force_host_platform_device_count=\d+", flag, flags
        )
    os.environ["XLA_FLAGS"] = flags
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < n:
        from jax.extend import backend as _backend

        _backend.clear_backends()
        if len(jax.devices()) < n:
            raise RuntimeError(
                f"this process already initialized XLA with "
                f"{len(jax.devices())} host devices and the count cannot "
                f"be raised mid-process — restart with "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={n}"
            )


def create_mesh(
    num_devices: Optional[int] = None,
    axis_name: str = DATA_AXIS,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 1-D data-parallel mesh over the available devices.

    ICI topology note: `jax.devices()` returns devices in an order for which a
    1-D mesh rides the torus links; for multi-slice (DCN) deployments the data
    axis should be the outermost (slowest-varying) axis so per-step collectives
    stay on ICI.
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        if len(devs) < num_devices:
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devs)} devices are visible"
            )
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis_name,))


def create_hybrid_mesh(
    num_slices: int,
    axis_names: tuple = ("dcn", DATA_AXIS),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2-D mesh for multi-slice deployments: outer axis over slices (DCN),
    inner axis over each slice's chips (ICI). Batches shard over BOTH axes
    (pure DP); per-step all-gathers ride ICI within a slice, and only the
    final psum'd scalars cross DCN. Slice assignment uses each device's
    ``slice_index`` when the runtime exposes it, else a contiguous split."""
    devs = list(devices if devices is not None else jax.devices())
    if len(devs) % num_slices:
        raise ValueError(
            f"{len(devs)} devices do not split into {num_slices} slices"
        )
    per_slice = len(devs) // num_slices
    if all(getattr(d, "slice_index", None) is not None for d in devs):
        devs = sorted(devs, key=lambda d: (d.slice_index, d.id))
    grid = np.array(devs).reshape(num_slices, per_slice)
    return Mesh(grid, axis_names)


def mesh_from_config(cfg: MeshConfig) -> Mesh:
    return create_mesh(cfg.num_devices, cfg.data_axis)


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a host pytree of arrays onto the mesh, batch-dim sharded."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Place a pytree onto the mesh fully replicated (params, opt state)."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def local_device_count(mesh: Mesh) -> int:
    return int(np.prod(mesh.devices.shape))
