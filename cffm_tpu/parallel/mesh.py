"""Device mesh construction (SURVEY.md L0).

One flat axis carries both parallelism roles (SURVEY.md §3.1): the
batch is data-parallel over "data" AND embedding-table rows are
mod-sharded over the same devices (DLRM-style model-parallel tables +
DP dense tower). Multi-host: the axis spans all processes' devices;
XLA routes the all-to-all over ICI within a host and DCN across.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def table_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Rows split over the flat axis; columns replicated."""
    return NamedSharding(mesh, P(axis, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
