"""Device-mesh utilities for element-parallel execution.

The reference has no multi-device code (SURVEY.md section 2.2); cmad_tpu
makes the element/Gauss-point batch a first-class sharded dimension:

- a 1-D ``elem`` mesh axis over all local (or virtual) devices
- point-state arrays ``(n_points, nxi)`` sharded on axis 0
- parameters replicated
- objective reductions via ``psum`` along ``elem``

Works identically on a real TPU pod slice and on
``--xla_force_host_platform_device_count=N`` virtual CPU devices.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def element_mesh(n_devices: int | None = None,
                 axis_name: str = "elem",
                 devices=None) -> Mesh:
    """1-D device mesh over the element batch.

    ``devices`` lets callers pin an explicit device list (e.g.
    ``jax.devices("cpu")`` for the virtual multi-chip dryrun, so the
    default — possibly TPU — platform is never touched).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_points(mesh: Mesh, axis_name: str = "elem") -> NamedSharding:
    """Sharding for (n_points, ...) arrays: leading axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
