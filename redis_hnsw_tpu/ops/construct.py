"""Batched index construction.

The reference inserts one node at a time through a strictly sequential
pointer-graph path (src/hnsw/core.rs:489-599); on TPU the win is to score
whole insert batches against the device snapshot (descent + ef beams as in
ops/search.py) and apply the cheap link surgery on the host. This module
currently provides the correct sequential fallback; the device-scored bulk
builder lands on top of the same entry point.
"""

from __future__ import annotations

import numpy as np


def add_batch(index, names, data, batch_size: int = 1024) -> None:
    data = np.atleast_2d(np.asarray(data, dtype=index._vectors.dtype))
    if len(names) != data.shape[0]:
        raise ValueError(
            f"{len(names)} names for {data.shape[0]} data rows"
        )
    for name, row in zip(names, data):
        index.add_node(name, row)
