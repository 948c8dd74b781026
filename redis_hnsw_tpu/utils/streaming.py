"""Streaming mixed insert+query workloads (BASELINE.json config 4).

The reference serializes every command under Redis's event loop, so a
"concurrent" 50/50 insert+query mix is an interleaved sequential stream
(src/lib.rs:349, :474 error on lock contention rather than overlap).
The TPU-native equivalent interleaves *batched* phases: an insert wave
(device-scored bulk construction, ops/construct.py) followed by a query
batch (batched traversal, ops/search.py), with the device snapshot
refreshed incrementally between phases (ops/snapshot.py delta path).

Two interleave shapes:

* serial (default) -- insert wave, then query batch, strictly
  alternating. Query batches see every preceding insert (the
  reference's visibility). The wave's full latency (device beam +
  host surgery + snapshot delta) sits between query batches, so query
  p95 tracks the wave wall time.
* overlap=True -- each wave is sliced into ``slices`` sub-waves, and
  query batches are served BEFORE the wave's sub-waves, against the
  bounded-stale device view (search_batch staleness=wave; see
  models/hnsw.py device_snapshot). The query is dispatched before the
  wave's dirty-row delta or beam exist on the device FIFO, so its
  latency is its own scan + one fetch round trip -- NOT the delta's
  host->device upload (measured 0.6-1.4s of serial mode's query path
  at 1M) and NOT the wave's device pass. Queries see the state as of
  the previous completed wave -- one wave staler than serial.
  Sub-waves still serialize beam -> surgery -> beam so graph semantics
  are IDENTICAL to add_batch at batch_size = wave/slices.

  Query batches stay FULL-WIDTH (``query_batch``, not wave/slices):
  the r5 overlap run served 512-wide batches (one per sub-wave) and
  paid the ~28ms fetch round trip plus reply assembly 4x per wave --
  query_total 742s of the 2403s wall at 1M. One 2048-wide batch per
  wave serves the same 50/50 query count at a quarter the fixed
  costs; the 50/50 mix is maintained by an owed-queries counter so
  any query_batch/insert_wave ratio keeps count parity.

The harness reports sustained throughput, per-phase latency
percentiles/maxima, and a wall-clock decomposition (insert / query /
validate / other) so stalls outside the timed phases are visible
rather than silently eaten (the r4 1M run lost ~85% of its wall to a
gap the old two-bucket stats could not localize).
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
    insert_total_s: float = 0.0
    query_total_s: float = 0.0
    validate_total_s: float = 0.0
    other_total_s: float = 0.0

    def percentile(self, series: str, p: float) -> float:
        data = getattr(self, series)
        return float(np.percentile(data, p)) if data else 0.0

    def steady(self) -> dict:
        """Sustained rate with compile-spike waves excluded.

        On this box each fresh process pays 100s+ first-wave compiles
        (server-side; the persistent cache only covers repeated shapes)
        that are one-time costs, not the serving-regime rate. A wave is
        a compile spike when it exceeds max(10 x median wave, 30s);
        both the raw sustained rate and this steady rate are reported
        so neither hides the other.
        """
        ins = np.asarray(self.insert_ms, dtype=np.float64) / 1e3
        if not len(ins):
            return {}
        thr = max(10.0 * float(np.median(ins)), 30.0)
        spike = ins > thr
        n_spike = int(spike.sum())
        spike_s = float(ins[spike].sum())
        per_wave = self.inserts / len(ins)
        steady_inserts = self.inserts - n_spike * per_wave
        steady_elapsed = max(self.elapsed_s - spike_s, 1e-9)
        return {
            "inserts_per_s_steady": round(steady_inserts / steady_elapsed, 1),
            "compile_spike_waves": n_spike,
            "compile_spike_s": round(spike_s, 1),
        }

    def summary(self) -> dict:
        return {
            "inserts": self.inserts,
            "queries": self.queries,
            "elapsed_s": round(self.elapsed_s, 3),
            "inserts_per_s": round(self.inserts_per_s, 1),
            **self.steady(),
            "qps": round(self.qps, 1),
            "insert_p50_ms": round(self.percentile("insert_ms", 50), 2),
            "insert_p95_ms": round(self.percentile("insert_ms", 95), 2),
            "query_p50_ms": round(self.percentile("query_ms", 50), 2),
            "query_p95_ms": round(self.percentile("query_ms", 95), 2),
            "insert_max_ms": round(max(self.insert_ms, default=0.0), 1),
            "query_max_ms": round(max(self.query_ms, default=0.0), 1),
            "insert_total_s": round(self.insert_total_s, 1),
            "query_total_s": round(self.query_total_s, 1),
            "validate_total_s": round(self.validate_total_s, 1),
            "other_total_s": round(self.other_total_s, 1),
        }


def _device_query_batches(q_pool: np.ndarray, chunk: int):
    """Upload the query pool ONCE and serve per-phase batches as
    device-resident slices. Every separate host->device transfer on
    the dev tunnel pays ~0.5-1s of latency (CLAUDE.md); the old
    per-phase np.take + implicit upload charged that to every query
    batch. Falls back to None (host path) when the pool does not
    divide evenly."""
    if chunk <= 0 or q_pool.shape[0] % chunk:
        return None
    import jax.numpy as jnp

    pool_dev = jnp.asarray(q_pool)
    return [
        pool_dev[i:i + chunk]
        for i in range(0, q_pool.shape[0], chunk)
    ]


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
    overlap: bool = False,
    slices: int = 1,
    progress=None,
) -> MixedStats:
    """Interleave insert waves and query batches 50/50 until ``data`` is
    exhausted; queries cycle through ``queries``.

    Serial mode: each query batch runs against the index state as of
    the preceding insert wave (the reference's serialized interleave
    gives the same visibility). ``overlap=True``: full-width query
    batches dispatch BEFORE each wave's sub-waves against the
    bounded-stale view, count parity kept by an owed-queries counter
    (see module docstring for the visibility/latency trade).

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
    slices = max(1, int(slices))
    q_chunk = query_batch
    dev_batches = _device_query_batches(q_pool, q_chunk)
    insert_ms: list[float] = []
    query_ms: list[float] = []
    t_ins = t_q = t_val = 0.0
    n_queries = 0
    q_i = 0
    phase = 0

    def next_batch():
        nonlocal q_i
        if dev_batches is not None:
            qb = dev_batches[q_i % len(dev_batches)]
        else:
            qb = np.take(
                q_pool,
                range(q_i * q_chunk, (q_i + 1) * q_chunk),
                axis=0,
                mode="wrap",
            )
        q_i += 1
        return qb

    def serve(qb, staleness: int = 0):
        nonlocal n_queries, t_q
        t0 = time.perf_counter()
        res = index.search_batch(
            qb, k, ef_search=ef_search, expand=expand, iters=iters,
            engine=engine, staleness=staleness,
        )
        dt = time.perf_counter() - t0
        query_ms.append(dt * 1e3)
        t_q += dt
        n_queries += len(res)

    def validate(lo, hi):
        nonlocal t_val
        t0 = time.perf_counter()
        # Visibility probe on the SERVING path: an exact-scan self-query
        # must return itself top-1 (sim 0 is the unique max up to exact
        # duplicates -- one miss allowed). Plus a host-side linkage
        # invariant: every probed row has layer-0 neighbors -- STRONGER
        # graph evidence than a beam self-hit (which can succeed through
        # the entrypoint alone) at O(1) host cost. The old generous
        # graph-beam probe paid a fresh iteration-count compile
        # mid-stream (338s of the r5 overlap run's stage 4, artifacts/
        # streaming1m_overlap.jsonl); the scan probe reuses the serving
        # program.
        probe_n = min(8, hi - lo)
        self_res = index.search_batch(
            data[lo:hi][:probe_n], 1, engine="scan",
        )
        hits = sum(
            1
            for i, r in enumerate(self_res)
            if r and r[0].name == names[lo + i]
        )
        assert hits >= probe_n - 1, (
            f"stream visibility: only {hits}/{probe_n} self-hits after "
            f"wave at {lo}"
        )
        if index.node_count > 1:
            for i in range(probe_n):
                row = index._names.get(names[lo + i])
                assert row is not None and index._nbrs(row, 0), (
                    f"stream linkage: row for {names[lo + i]} has no "
                    f"layer-0 neighbors after wave at {lo}"
                )
        t_val += time.perf_counter() - t0

    if overlap:
        from ..ops import construct as C

        ef_con = index.config.ef_construction

    t_start = time.perf_counter()
    q_owed = 0  # queries owed to keep the 50/50 count at any q_chunk
    for lo in range(0, n_total, insert_wave):
        hi = min(lo + insert_wave, n_total)
        if not overlap:
            t0 = time.perf_counter()
            index.add_batch(
                names[lo:hi], data[lo:hi], batch_size=insert_wave
            )
            dt = time.perf_counter() - t0
            insert_ms.append(dt * 1e3)
            t_ins += dt
            serve(next_batch())
        else:
            # Serve FIRST, against the bounded-stale device view:
            # dispatched before this wave's dirty-row delta or beams
            # exist, the query waits only for its own scan -- never
            # the delta's host->device upload (measured 0.6-1.4s of
            # the query path in serial mode) nor the wave's device
            # pass. Staleness bound = one wave (epochs bump at most
            # once per insert). Full-width batches: the owed counter
            # keeps queries == inserts at any q_chunk.
            q_owed += hi - lo
            while q_owed >= q_chunk:
                serve(next_batch(), staleness=insert_wave)
                q_owed -= q_chunk
            step = max(1, (hi - lo + slices - 1) // slices)
            for sl in range(lo, hi, step):
                sh = min(sl + step, hi)
                t0 = time.perf_counter()
                if index.node_count == 0:
                    # seed node: the wave machinery needs an enterpoint
                    index.add_node(names[sl], data[sl])
                    wave = C.dispatch_wave(
                        index, names[sl + 1:sh], data[sl + 1:sh],
                        ef_con,
                    ) if sh - sl > 1 else None
                else:
                    wave = C.dispatch_wave(
                        index, names[sl:sh], data[sl:sh], ef_con
                    )
                if wave is not None:
                    C.complete_wave(index, wave)
                dt = time.perf_counter() - t0
                insert_ms.append(dt * 1e3)
                t_ins += dt

        phase += 1
        if validate_every and phase % validate_every == 0:
            validate(lo, hi)
        if progress is not None:
            # hook for harness-level liveness logging: (wave phase,
            # rows inserted so far, wall so far)
            progress(phase, hi, time.perf_counter() - t_start)

    elapsed = time.perf_counter() - t_start
    return MixedStats(
        inserts=n_total,
        queries=n_queries,
        elapsed_s=elapsed,
        inserts_per_s=n_total / elapsed,
        qps=n_queries / elapsed,
        insert_ms=insert_ms,
        query_ms=query_ms,
        insert_total_s=t_ins,
        query_total_s=t_q,
        validate_total_s=t_val,
        other_total_s=elapsed - t_ins - t_q - t_val,
    )
