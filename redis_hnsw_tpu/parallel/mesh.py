"""Device mesh helpers.

The reference has no distributed anything (SURVEY.md section 2: in-process
locks only, one query at a time on one core). Scaling is a first-class new
axis here: indexes shard across a 1-D ``data`` mesh (vector table +
adjacency rows per shard), queries replicate, and per-shard top-k merges
ride ICI via XLA collectives inserted by GSPMD -- no hand-written NCCL/MPI
equivalent exists or is needed.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devs)}"
            )
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (DATA_AXIS,))


def shard_leading(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
