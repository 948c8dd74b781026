"""Host API -- the command surface.

TPU-native replacement for the reference's Redis module command layer
(zhao-lang/redis_hnsw src/lib.rs): the seven ``HNSW.*`` commands
(src/lib.rs:498-514) become methods on a client object holding a registry
of device-resident indexes (the equivalent of the global ``INDICES`` map,
src/lib.rs:32-35 -- no server, no RESP, no lazy rehydration needed because
indexes live in process and snapshots upload in O(1)).

Command mapping:

    HNSW.NEW       -> create_index        (src/lib.rs:131-171)
    HNSW.GET       -> get_index / info    (src/lib.rs:173-190)
    HNSW.DEL       -> delete_index        (src/lib.rs:192-227)
    HNSW.NODE.ADD  -> add_node            (src/lib.rs:334-368)
    HNSW.NODE.GET  -> get_node            (src/lib.rs:425-444)
    HNSW.NODE.DEL  -> delete_node         (src/lib.rs:370-407)
    HNSW.SEARCH    -> search              (src/lib.rs:462-496)

Defaults mirror the reference: m=5, ef_construction=200, k=5
(src/lib.rs:48, :53, :120). Error strings mirror the reference's
(errors.py). Batched extensions (add_batch / search_batch) are the TPU-side
additions -- the reference has no batching anywhere.
"""

from __future__ import annotations

import threading

from .config import IndexConfig
from .errors import HNSWError, IndexExists, IndexNotFound
from .models.flat import FlatIndex
from .models.hnsw import HNSWIndex, SearchResult

DEFAULT_K = 5  # src/lib.rs:120


class HNSW:
    """A registry of named indexes -- the module-level INDICES equivalent."""

    def __init__(self) -> None:
        self._indices: dict[str, HNSWIndex | FlatIndex] = {}
        # The reference serializes all commands under Redis's event loop and
        # errors on lock contention (src/lib.rs:349, :474). Here the
        # registry lock guards the name->index map only, and every index
        # carries its OWN lock serializing its mutations and device
        # searches -- operations on *different* indexes run concurrently
        # (the reference's per-index Arc<RwLock>, src/lib.rs:32-35, allows
        # the same; a single global lock would be stricter than either).
        self._lock = threading.RLock()
        self._index_locks: dict[str, threading.RLock] = {}

    def _entry(self, name: str):
        """Resolve (index, its lock) under the registry lock."""
        with self._lock:
            idx = self._indices.get(name)
            if idx is None:
                raise IndexNotFound(name)
            return idx, self._index_locks[name]

    # -- index lifecycle ------------------------------------------------------

    def create_index(
        self,
        name: str,
        dim: int,
        m: int = 5,
        ef_construction: int = 200,
        metric: str = "euclidean",
        capacity: int = 1024,
        fixed_capacity: bool = False,
        seed: int | None = None,
        kind: str = "hnsw",
        backend: str = "auto",
        n_shards: int | None = None,
    ):
        """HNSW.NEW. Returns the index handle (reference returns "OK").

        ``kind="sharded"`` partitions the corpus over the device mesh
        (``n_shards`` defaults to every visible device) -- the multi-chip
        scale-out axis the reference lacks; same command surface.
        """
        with self._lock:
            if name in self._indices:
                raise IndexExists(name)
            cfg = IndexConfig(
                dim=dim,
                m=m,
                ef_construction=ef_construction,
                metric=metric,
                capacity=capacity,
                fixed_capacity=fixed_capacity,
                seed=seed,
                backend=backend,
            )
            if kind == "hnsw":
                idx = HNSWIndex(name, cfg)
            elif kind == "flat":
                idx = FlatIndex(name, cfg)
            elif kind == "sharded":
                from .parallel.sharded import ShardedHNSW

                idx = ShardedHNSW(name, cfg, n_shards=n_shards)
            else:
                raise ValueError(f"unknown index kind: {kind!r}")
            self._indices[name] = idx
            self._index_locks[name] = threading.RLock()
            return idx

    def index(self, name: str):
        with self._lock:
            idx = self._indices.get(name)
            if idx is None:
                raise IndexNotFound(name)
            return idx

    def get_index(self, name: str) -> dict:
        """HNSW.GET -- index metadata reply (src/types.rs:122-155).

        All three kinds return the reference's full 9-field shape;
        FlatIndex.info() fills graph-only fields with honest nulls."""
        return self.index(name).info()

    def delete_index(self, name: str) -> int:
        """HNSW.DEL -- drops the index and all nodes; returns 1."""
        with self._lock:
            if name not in self._indices:
                raise IndexNotFound(name)
            del self._indices[name]
            del self._index_locks[name]
            return 1

    def list_indices(self) -> list[str]:
        with self._lock:
            return sorted(self._indices)

    # -- node ops -------------------------------------------------------------

    def add_node(self, index: str, node: str, data) -> None:
        idx, lk = self._entry(index)
        with lk:
            idx.add_node(node, data)

    def get_node(self, index: str, node: str) -> dict:
        idx, lk = self._entry(index)
        with lk:
            return idx.get_node(node)

    def delete_node(self, index: str, node: str) -> int:
        idx, lk = self._entry(index)
        with lk:
            idx.delete_node(node)
            return 1

    # -- search ---------------------------------------------------------------

    def search(
        self,
        index: str,
        query,
        k: int = DEFAULT_K,
        ef_search: int | None = None,
    ) -> list[SearchResult]:
        """HNSW.SEARCH -- single query, reference-parity semantics.

        Reads take the index's own lock (not the registry lock): the
        host graph backends assume no concurrent mutation during a read,
        but searches on *different* indexes proceed concurrently.
        """
        idx, lk = self._entry(index)
        with lk:
            if isinstance(idx, FlatIndex):
                return idx.search_knn(query, k)
            return idx.search_knn(query, k, ef_search=ef_search)

    # -- persistence (checkpoint/restore; reference: RDB callbacks) ------------

    def save_index(self, index: str, path: str) -> None:
        """Checkpoint an index to disk (reference: RDB save callbacks,
        src/types.rs:157-284). HNSW and flat indexes save to one npz
        file (same version-gated envelope, utils/checkpoint.py);
        sharded indexes save to a directory (one npz per shard +
        manifest)."""
        from .models.flat import FlatIndex
        from .parallel.sharded import ShardedHNSW
        from .utils.checkpoint import save_index as _save

        idx, lk = self._entry(index)
        with lk:
            if isinstance(idx, ShardedHNSW):
                idx.save(path)
            elif isinstance(idx, (HNSWIndex, FlatIndex)):
                _save(idx, path)
            else:
                raise HNSWError(
                    f"index kind {type(idx).__name__} does not support "
                    f"checkpointing"
                )

    def restore_index(self, path: str, name: str | None = None):
        """Restore an index from a checkpoint and register it (reference:
        RDB load + make_index rehydration, src/lib.rs:229-315). A
        directory containing ``manifest.json`` restores as sharded."""
        import os

        from .utils.checkpoint import load_index as _load

        if os.path.isdir(path):
            from .parallel.sharded import ShardedHNSW

            idx = ShardedHNSW.restore(path)
        else:
            idx = _load(path)
        if name is not None:
            idx.name = name
        with self._lock:
            if idx.name in self._indices:
                raise IndexExists(idx.name)
            self._indices[idx.name] = idx
            self._index_locks[idx.name] = threading.RLock()
        return idx

    # -- batched TPU extensions -------------------------------------------------

    def add_batch(self, index: str, names, data, batch_size: int = 1024):
        idx, lk = self._entry(index)
        with lk:
            if isinstance(idx, FlatIndex):
                idx.add_batch(names, data)
            else:
                idx.add_batch(names, data, batch_size=batch_size)

    def delete_batch(self, index: str, nodes) -> int:
        """Bulk delete (the delete-side counterpart of ``add_batch``;
        the reference only deletes one node per HNSW.NODE.DEL call).
        Validates every name before mutating; survivors are repaired
        once per layer with the whole delete set excluded."""
        nodes = list(nodes)
        idx, lk = self._entry(index)
        with lk:
            idx.delete_batch(nodes)
        return len(nodes)

    def search_batch(
        self,
        index: str,
        queries,
        k: int = DEFAULT_K,
        ef_search: int | None = None,
        expand: int = 1,
        iters: int | None = None,
        engine: str = "auto",
        reply: str = "objects",
        seeds: int = 0,
        recall_target: float | None = None,
        host_qs=None,
    ) -> list[list[SearchResult]]:
        """Batched device search. ``engine`` routes between the exact
        MXU scan and the graph traversal ("auto" picks by the measured
        crossover, ops/scan.py); ``expand``/``iters`` tune the graph
        traversal (candidates expanded per step / step cap); ``seeds``
        adds per-lane pivot entrypoints to the graph beam (recall lever
        for hard data; scan engines ignore it); ``recall_target``
        turns "auto" into a guarantee (exact scan above the approx
        tier's measured floor, the tier at or below it)."""
        idx, lk = self._entry(index)
        with lk:
            if isinstance(idx, FlatIndex):
                # Flat indexes have no graph: "auto"/"scan" are the
                # exact scan, "scan-approx" the oversampled tier;
                # "graph" is a user error, not a silent fallback.
                if engine not in ("auto", "scan", "scan-approx"):
                    raise ValueError(
                        f"engine {engine!r} unavailable on flat indexes"
                    )
                return idx.search_batch(
                    queries, k, approx=engine == "scan-approx",
                    recall_target=recall_target, host_qs=host_qs,
                )
            return idx.search_batch(
                queries, k, ef_search=ef_search, expand=expand,
                iters=iters, engine=engine, reply=reply, seeds=seeds,
                recall_target=recall_target, host_qs=host_qs,
            )


# Module-level default client, mirroring the reference's process-global
# INDICES registry (src/lib.rs:32-35).
default_client = HNSW()
