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
SLICE_AXIS = "slice"


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


def make_mesh2d(n_slices: int, chips_per_slice: int) -> Mesh:
    """Two-level mesh for multi-slice topologies: axis ``slice`` is the
    slow (DCN) axis, axis ``data`` the fast (ICI) axis within a slice.

    The sharded engines merge top-k hierarchically over such a mesh:
    first an all-gather along ``data`` (ICI, cheap) reduces each slice
    to one k-list, then the only DCN collective carries k candidates
    per SLICE instead of k per CHIP -- a ``chips_per_slice``-fold cut
    in cross-slice bytes. On a single-slice machine the same code runs
    with any 2-D factorization (validated on the CPU mesh in tests).
    """
    devs = jax.devices()
    need = n_slices * chips_per_slice
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    import numpy as np

    return Mesh(
        np.array(devs[:need]).reshape(n_slices, chips_per_slice),
        (SLICE_AXIS, DATA_AXIS),
    )


def shard_leading(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
