"""Device mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "d",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices (default: all).

    Matrix factorization's scaling axis is the solve-row axis (users/items),
    so a single data axis suffices; the item axis rides the same devices for
    the Gramian reduce (see sharded_wals.sharded_gramian).
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devs)} available"
            )
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis_name: str = "d") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))
