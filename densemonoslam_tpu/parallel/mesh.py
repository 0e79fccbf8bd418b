"""Device-mesh helpers for collaborative multi-camera SLAM.

The reference scales to N cameras by multiplexing all contexts through one
GPU in a single thread (`GUI/src/MainController.cpp:262-400`) and one LCM
multicast channel; here cameras are an SPMD axis on a `jax.sharding.Mesh`
("one camera stream per host/chip", BASELINE north star), and map blocks can
be sharded over a second axis for distributed fusion/BA.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_cams: Optional[int] = None,
    n_map: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh with a leading `cam` axis (data-parallel camera streams) and a
    `map` axis (surfel-block sharding).  Defaults to all devices on `cam`."""
    devices = list(devices if devices is not None else jax.devices())
    if n_cams is None:
        n_cams = len(devices) // n_map
    used = devices[: n_cams * n_map]
    arr = np.array(used).reshape(n_cams, n_map)
    return Mesh(arr, axis_names=("cam", "map"))


def cam_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a [B, ...] batch over the camera axis."""
    return NamedSharding(mesh, P("cam"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
