"""Streaming mixed insert+query workloads (BASELINE.json config 4).

The reference serializes every command under Redis's event loop, so a
"concurrent" 50/50 insert+query mix is an interleaved sequential stream
(src/lib.rs:349, :474 error on lock contention rather than overlap).
The TPU-native equivalent interleaves *batched* phases: an insert wave
(device-scored bulk construction, ops/construct.py) followed by a query
batch (batched traversal, ops/search.py), with the device snapshot
refreshed incrementally between phases (ops/snapshot.py delta path).

This module is the harness: it drives a mixed stream against one index
and reports sustained throughput + per-phase latency percentiles.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np


@dataclasses.dataclass
class MixedStats:
    """Outcome of one run_mixed stream."""

    inserts: int
    queries: int
    elapsed_s: float
    inserts_per_s: float
    qps: float
    insert_ms: list[float]          # per insert-phase latency
    query_ms: list[float]           # per query-phase latency

    def percentile(self, series: str, p: float) -> float:
        data = getattr(self, series)
        return float(np.percentile(data, p)) if data else 0.0

    def summary(self) -> dict:
        return {
            "inserts": self.inserts,
            "queries": self.queries,
            "elapsed_s": round(self.elapsed_s, 3),
            "inserts_per_s": round(self.inserts_per_s, 1),
            "qps": round(self.qps, 1),
            "insert_p50_ms": round(self.percentile("insert_ms", 50), 2),
            "insert_p95_ms": round(self.percentile("insert_ms", 95), 2),
            "query_p50_ms": round(self.percentile("query_ms", 50), 2),
            "query_p95_ms": round(self.percentile("query_ms", 95), 2),
        }


def run_mixed(
    index,
    names,
    data,
    queries,
    k: int = 10,
    insert_wave: int = 256,
    query_batch: int = 256,
    ef_search: int | None = None,
    expand: int = 1,
    iters: int | None = None,
    validate_every: int = 0,
    capacity_hint: int | None = None,
    engine: str = "auto",
) -> MixedStats:
    """Interleave insert waves and query batches 50/50 until ``data`` is
    exhausted; queries cycle through ``queries``. Each query batch runs
    against the index state as of the preceding insert wave (the
    reference's serialized interleave gives the same visibility).

    ``validate_every`` > 0 asserts every Nth query batch returns the
    freshly-inserted wave's own vectors as top-1 self-hits (sanity that
    search really sees the new writes).

    ``engine`` picks the serving engine for the stream's query batches
    (ops/search.py search_batch). The default "auto" routes to the
    exact MXU scan below the crossover -- at config-4 scale (<= 2M
    rows) that serves every query at recall 1.0, while the graph beam
    at the stream's tight ef budget measured 0.81-0.86 (r3
    streaming1m.jsonl); pass "graph" to exercise the traversal
    under mutation instead.
    """
    data = np.atleast_2d(np.asarray(data, dtype=index._vectors.dtype))
    n_total = data.shape[0]
    # presize device tables for the whole stream: without this, every
    # power-of-two growth of the snapshot recompiles the engines
    # mid-stream and shows up as multi-second latency spikes
    index._capacity_hint = max(
        int(getattr(index, "_capacity_hint", 0)),
        capacity_hint
        if capacity_hint is not None
        else index._names.high_water + n_total,
    )
    q_pool = np.atleast_2d(np.asarray(queries, dtype=data.dtype))
    insert_ms: list[float] = []
    query_ms: list[float] = []
    n_queries = 0
    q_off = 0
    phase = 0

    t_start = time.perf_counter()
    for lo in range(0, n_total, insert_wave):
        hi = min(lo + insert_wave, n_total)
        t0 = time.perf_counter()
        index.add_batch(names[lo:hi], data[lo:hi], batch_size=insert_wave)
        insert_ms.append((time.perf_counter() - t0) * 1e3)

        qb = np.take(
            q_pool,
            range(q_off, q_off + query_batch),
            axis=0,
            mode="wrap",
        )
        q_off += query_batch
        t0 = time.perf_counter()
        res = index.search_batch(
            qb, k, ef_search=ef_search, expand=expand, iters=iters,
            engine=engine,
        )
        query_ms.append((time.perf_counter() - t0) * 1e3)
        n_queries += len(res)

        phase += 1
        if validate_every and phase % validate_every == 0:
            # Visibility probe, not a perf probe: use a generous beam
            # (the stream's operating ef/iters can be too tight for
            # guaranteed self-hits at large N -- iters caps the slowest
            # lane; a 230k-row graph needs more steps than a 30k one).
            self_res = index.search_batch(
                data[lo:hi][:8], 1, ef_search=max(256, ef_search or 0),
                expand=expand, iters=None, engine="graph",
            )
            hits = sum(
                1
                for i, r in enumerate(self_res)
                if r and r[0].name == names[lo + i]
            )
            assert hits >= 7, (
                f"stream visibility: only {hits}/8 self-hits after wave "
                f"at {lo}"
            )

    elapsed = time.perf_counter() - t_start
    return MixedStats(
        inserts=n_total,
        queries=n_queries,
        elapsed_s=elapsed,
        inserts_per_s=n_total / elapsed,
        qps=n_queries / elapsed,
        insert_ms=insert_ms,
        query_ms=query_ms,
    )
