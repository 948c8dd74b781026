"""Versioned checkpoint save/restore.

TPU-native replacement for the reference's RDB binary persistence: the
per-type C-ABI save/load callbacks (zhao-lang/redis_hnsw
src/types.rs:157-284 index, :354-428 node, version-gated at :181, :378)
plus the lazy 3-pass pointer-graph reconstruction on first touch
(src/lib.rs:229-315). Here the whole index is a handful of dense arrays, so
a checkpoint is one `.npz` with a version gate, and restore is O(1) array
loads -- the graph needs no rewiring because edges are row ids, and the
device snapshot re-uploads straight to HBM on first use.

The reference's per-mutation write-through (update_fn plumbing,
core.rs:580-584 / lib.rs:446-460) becomes `save()` on demand; incremental
checkpointing can layer on the same format.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..config import IndexConfig
from ..errors import HNSWError

FORMAT_VERSION = 1


def _config_meta(index) -> dict:
    return {
        "dim": index.config.dim,
        "m": index.config.m,
        "ef_construction": index.config.ef_construction,
        "metric": index.config.metric,
        "capacity": index.config.capacity,
        "fixed_capacity": index.config.fixed_capacity,
        "seed": index.config.seed,
    }


def _names_array(index, h: int):
    return np.array(
        [
            index._names._name_of[r]
            if index._names._name_of[r] is not None else ""
            for r in range(h)
        ],
        dtype="U",
    )


def save_flat_index(index, path: str, compress: bool = True) -> None:
    """Serialize a FlatIndex to ``path`` (npz, atomic rename): the
    same version-gated envelope as the graph checkpoint with
    ``kind="flat"`` and (vectors, valid) instead of the adjacency --
    the flat kind has no graph to persist (models/flat.py). Restores
    through the same :func:`load_index` / client ``restore_index``."""
    h = index._names.high_water
    meta = {
        "format_version": FORMAT_VERSION,
        "kind": "flat",
        "name": index.name,
        "config": _config_meta(index),
        "node_count": index.node_count,
    }
    tmp = path + ".tmp"
    writer = np.savez_compressed if compress else np.savez
    with open(tmp, "wb") as f:
        writer(
            f,
            meta=np.frombuffer(
                json.dumps(meta).encode("utf-8"), dtype=np.uint8
            ),
            names=_names_array(index, h),
            vectors=index._vectors[:h],
            valid=index._valid[:h],
        )
    os.replace(tmp, path)


def _load_flat(meta: dict, z) -> "object":
    from ..models.flat import FlatIndex

    names = z["names"]
    vectors = z["vectors"]
    valid = z["valid"]
    cfg = IndexConfig(**meta["config"])
    index = FlatIndex(meta["name"], cfg)
    h = len(names)
    if h > index._vectors.shape[0]:
        # checkpoint larger than the config capacity: adopt its arrays
        index._vectors = np.ascontiguousarray(vectors)
        index._valid = np.ascontiguousarray(valid)
    else:
        index._vectors[:h] = vectors
        index._valid[:h] = valid
    nt = index._names
    for row in range(h):
        live = bool(valid[row])
        name = str(names[row])
        nt._name_of.append(name if live else None)
        if live:
            nt._id_of[name] = row
        else:
            nt._free.append(row)
    index._epoch += 1
    return index


def save_index(index, path: str, compress: bool = True) -> None:
    """Serialize a host HNSWIndex to ``path`` (npz, atomic rename).

    ``compress=False`` trades file size for speed (large indexes,
    staged builds). FlatIndexes route to :func:`save_flat_index`
    (same envelope, ``kind="flat"``)."""
    from ..models.flat import FlatIndex

    if isinstance(index, FlatIndex):
        return save_flat_index(index, path, compress=compress)
    h = index._names.high_water
    n_layers = index.max_layer + 1

    names = _names_array(index, h)
    if index._native is not None:
        counts, flat = index._native.export_all(h, n_layers)
    else:
        counts = np.zeros((h, n_layers), np.int32)
        flat_l: list[int] = []
        for row in range(h):
            lists = index._neighbors[row]
            if lists is None:
                continue
            for lc, layer in enumerate(lists):
                counts[row, lc] = len(layer)
                flat_l.extend(layer)
        flat = np.asarray(flat_l, np.int32)

    meta = {
        "format_version": FORMAT_VERSION,
        "kind": "hnsw",
        "name": index.name,
        "config": _config_meta(index),
        "node_count": index.node_count,
        "max_layer": index.max_layer,
        "enterpoint": int(index.enterpoint),
        # persisted so a restored index keeps hint-exact snapshot
        # shapes (ops/snapshot.py) instead of re-padding to pow2
        "capacity_hint": int(getattr(index, "_capacity_hint", 0)),
    }
    tmp = path + ".tmp"
    writer = np.savez_compressed if compress else np.savez
    with open(tmp, "wb") as f:
        writer(
            f,
            meta=np.frombuffer(
                json.dumps(meta).encode("utf-8"), dtype=np.uint8
            ),
            names=names,
            vectors=index._vectors[:h],
            levels=index._levels[:h],
            adj_counts=counts,
            adj_flat=np.asarray(flat, np.int32),
        )
    os.replace(tmp, path)


def load_index(path: str):
    """Restore an index from a checkpoint; inverse of save_index.

    The version gate mirrors the reference's encver check
    (types.rs:181-182: unknown versions are refused, not migrated).
    """
    from ..models.hnsw import HNSWIndex

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z["meta"].tobytes()).decode("utf-8"))
        if meta["format_version"] != FORMAT_VERSION:
            raise HNSWError(
                f"cannot load checkpoint format version "
                f"{meta['format_version']} (supported: {FORMAT_VERSION})"
            )
        # pre-"kind" checkpoints (same format version) are all hnsw
        if meta.get("kind", "hnsw") == "flat":
            return _load_flat(meta, z)
        names = z["names"]
        vectors = z["vectors"]
        levels = z["levels"]
        counts = z["adj_counts"]
        flat = z["adj_flat"]

    cfg = IndexConfig(**meta["config"])
    index = HNSWIndex(meta["name"], cfg)
    h = len(names)
    index._grow(max(h, 1))
    index._vectors[:h] = vectors
    index._levels[:h] = levels

    # Rebuild name table preserving row ids (free rows -> free list).
    # Liveness comes from levels[row] >= 0 (delete stamps -1), never from
    # name truthiness: a checkpoint from a version that allowed ""-named
    # nodes must not push a live row onto the free list (ADVICE r1).
    nt = index._names
    for row in range(h):
        live = int(levels[row]) >= 0
        name = str(names[row])
        nt._name_of.append(name if live else None)
        if live:
            nt._id_of[name] = row
        else:
            nt._free.append(row)

    # Rebuild adjacency lists and layer sets.
    pos = 0
    max_layer = int(meta["max_layer"])
    while len(index._layer_sets) < max_layer + 1:
        index._layer_sets.append(set())
    for row in range(h):
        if levels[row] < 0:
            # free row: skip its (empty) count block
            continue
        lists = []
        for lc in range(counts.shape[1]):
            c = int(counts[row, lc])
            lists.append([int(x) for x in flat[pos : pos + c]])
            pos += c
        # trim trailing empty layers beyond the row's level
        lvl = int(levels[row])
        while len(lists) > lvl + 1 and not lists[-1]:
            lists.pop()
        if index._native is not None:
            index._native.alloc_node(row, lvl)
            for lc, layer in enumerate(lists):
                if layer:
                    index._native.set_neighbors(row, lc, layer)
        else:
            index._neighbors[row] = lists
        if lvl >= 1:
            index._upper_slot[row] = index._upper_next
            index._upper_next += 1
        index._layer_sets[lvl].add(row)
    # drop trailing empty layer sets the reference would have popped
    while len(index._layer_sets) > max_layer + 1:
        index._layer_sets.pop()

    index.node_count = int(meta["node_count"])
    index.max_layer = max_layer
    index.enterpoint = int(meta["enterpoint"])
    # older checkpoints (same format version) simply lack the key
    index._capacity_hint = max(
        int(getattr(index, "_capacity_hint", 0)),
        int(meta.get("capacity_hint", 0)),
    )
    index._bump()
    return index
