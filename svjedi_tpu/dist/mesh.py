"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data_shards: Optional[int] = None,
    graph_shards: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, graph) mesh over the available devices.

    ``data`` carries read-batch parallelism (ICI-adjacent shards), ``graph``
    carries SV-table/panel sharding. Defaults to all devices on ``data``.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_shards is None:
        data_shards = n // graph_shards
    if data_shards * graph_shards != n:
        raise ValueError(
            f"mesh {data_shards}x{graph_shards} != {n} devices"
        )
    arr = np.array(devices).reshape(data_shards, graph_shards)
    return Mesh(arr, axis_names=("data", "graph"))
