"""Streaming 50/50 insert+query mix (BASELINE.json config 4)."""

import numpy as np
import pytest

from redis_hnsw_tpu import HNSWIndex, IndexConfig
from redis_hnsw_tpu.models.flat import FlatIndex
from redis_hnsw_tpu.utils.streaming import run_mixed


@pytest.mark.slow
def test_mixed_stream_visibility_and_recall(rng):
    n, dim, k = 1200, 16, 5
    data = rng.standard_normal((n, dim)).astype(np.float32)
    queries = rng.standard_normal((64, dim)).astype(np.float32)
    names = [f"n{i}" for i in range(n)]

    idx = HNSWIndex(
        "s", IndexConfig(dim=dim, m=6, ef_construction=48, seed=4)
    )
    stats = run_mixed(
        idx,
        names,
        data,
        queries,
        k=k,
        insert_wave=128,
        query_batch=64,
        expand=4,
        validate_every=2,  # asserts fresh inserts are searchable
    )
    assert stats.inserts == n
    assert idx.node_count == n
    assert stats.queries > 0
    s = stats.summary()
    assert s["inserts_per_s"] > 0 and s["qps"] > 0
    assert s["query_p95_ms"] >= s["query_p50_ms"]

    # final recall vs oracle on the fully-built index
    oracle = FlatIndex("o", IndexConfig(dim=dim))
    oracle.add_batch(names, data)
    truth = [
        {r.name for r in t} for t in oracle.search_batch(queries, k)
    ]
    res = idx.search_batch(
        queries, k, ef_search=64, expand=4, engine="graph"
    )
    hits = sum(
        len({r.name for r in rr} & truth[b]) for b, rr in enumerate(res)
    )
    assert hits / (k * len(queries)) >= 0.9


def test_staleness_serves_pre_wave_view(rng):
    """search_batch(staleness=N) serves the bounded-stale device view:
    rows inserted after the materialized snapshot are invisible and no
    dirty-row delta is dispatched; a fresh search afterwards sees them.
    The stale reply must be BYTE-IDENTICAL to a fresh search on a twin
    index frozen at the pre-wave state (same engine)."""
    n0, nw, dim, k = 300, 64, 16, 5
    data = rng.standard_normal((n0 + nw, dim)).astype(np.float32)
    queries = rng.standard_normal((16, dim)).astype(np.float32)
    names = [f"n{i}" for i in range(n0 + nw)]
    cfg = dict(dim=dim, m=6, ef_construction=48, seed=4)

    idx = HNSWIndex("st", IndexConfig(**cfg))
    idx._capacity_hint = n0 + nw
    idx.add_batch(names[:n0], data[:n0], batch_size=64)
    idx.search_batch(queries, k)  # materialize snapshot + scan state

    twin = HNSWIndex("tw0", IndexConfig(**cfg))
    twin._capacity_hint = n0 + nw
    twin.add_batch(names[:n0], data[:n0], batch_size=64)

    # mutate: one wave lands; the snapshot has NOT been refreshed
    idx.add_batch(names[n0:], data[n0:], batch_size=nw)
    epoch_before = idx._snapshot_epoch

    for eng in ("scan", "graph"):
        stale = idx.search_batch(
            queries, k, staleness=10 * nw, engine=eng,
            ef_search=64, expand=4,
        )
        want = twin.search_batch(
            queries, k, engine=eng, ef_search=64, expand=4
        )
        assert [[(r.name, r.sim) for r in rr] for rr in stale] == \
            [[(r.name, r.sim) for r in rr] for rr in want], eng
        # stale serving must not have refreshed the snapshot
        assert idx._snapshot_epoch == epoch_before, eng
        new_names = {nm for rr in stale for r in rr for nm in [r.name]}
        assert not (new_names & set(names[n0:])), eng

    # a fresh search refreshes and sees the wave
    fresh = idx.search_batch(queries, 2 * k, engine="scan")
    assert idx._snapshot_epoch != epoch_before
    seen = {r.name for rr in fresh for r in rr}
    full = HNSWIndex("tw1", IndexConfig(**cfg))
    full.add_batch(names, data, batch_size=64)
    want_full = full.search_batch(queries, 2 * k, engine="scan")
    assert [[(r.name, r.sim) for r in rr] for rr in fresh] == \
        [[(r.name, r.sim) for r in rr] for rr in want_full]
    assert seen & set(names[n0:])  # wave rows rank for some query


@pytest.mark.slow
def test_mixed_stream_overlap_mode(rng):
    """overlap=True: query batches served BEFORE each wave's sub-waves
    on the bounded-stale view (staleness=wave), full-width with the
    owed-queries counter keeping count parity. Graph semantics must
    equal add_batch at the slice size (beam -> surgery -> beam
    serialization is preserved); all nodes inserted and searchable;
    validate probes (post-complete visibility) pass; wall decomposition
    buckets cover the elapsed time."""
    n, dim, k = 900, 16, 5
    data = rng.standard_normal((n, dim)).astype(np.float32)
    queries = rng.standard_normal((64, dim)).astype(np.float32)
    names = [f"n{i}" for i in range(n)]

    idx = HNSWIndex(
        "ov", IndexConfig(dim=dim, m=6, ef_construction=48, seed=4)
    )
    stats = run_mixed(
        idx, names, data, queries, k=k,
        insert_wave=128, query_batch=64, expand=4,
        validate_every=2, overlap=True, slices=4,
    )
    assert stats.inserts == n
    assert idx.node_count == n
    # owed-queries counter: 50/50 parity at q_chunk-granularity --
    # serves exactly floor(cumulative inserts / q_chunk) batches
    assert stats.queries == (n // 64) * 64
    s = stats.summary()
    # decomposition: buckets + other == elapsed (other can be small
    # positive or zero; never hugely negative)
    total = (s["insert_total_s"] + s["query_total_s"]
             + s["validate_total_s"] + s["other_total_s"])
    assert abs(total - s["elapsed_s"]) < 0.05
    assert s["insert_max_ms"] >= s["insert_p95_ms"] - 1e-6

    # graph identity vs add_batch at the slice size: overlap's
    # beam->surgery->beam serialization is exactly batch_size=32 waves
    twin = HNSWIndex(
        "tw", IndexConfig(dim=dim, m=6, ef_construction=48, seed=4)
    )
    twin.add_batch(names, data, batch_size=32)
    assert idx.node_count == twin.node_count
    for nm in (names[0], names[17], names[313], names[-1]):
        a, b = idx.get_node(nm), twin.get_node(nm)
        assert a["neighbors"] == b["neighbors"], nm


def test_steady_rate_excludes_compile_spikes():
    """MixedStats.steady: a wave > max(10x median, 30s) is a one-time
    compile spike; the steady rate excludes it while the raw sustained
    rate keeps it (both reported, neither hides the other)."""
    from redis_hnsw_tpu.utils.streaming import MixedStats

    # 99 normal 1s waves + one 400s compile wave; 100 inserts/wave
    stats = MixedStats(
        inserts=10_000, queries=0, elapsed_s=499.0,
        inserts_per_s=10_000 / 499.0, qps=0.0,
        insert_ms=[1_000.0] * 99 + [400_000.0], query_ms=[],
    )
    s = stats.summary()
    assert s["compile_spike_waves"] == 1
    assert s["compile_spike_s"] == 400.0
    # 9900 inserts over 99s
    assert abs(s["inserts_per_s_steady"] - 100.0) < 1.0
    assert s["inserts_per_s"] < 25.0  # raw rate keeps the spike

    # all-equal waves: nothing excluded, steady == raw
    flat = MixedStats(
        inserts=1_000, queries=0, elapsed_s=10.0, inserts_per_s=100.0,
        qps=0.0, insert_ms=[1_000.0] * 10, query_ms=[],
    )
    f = flat.summary()
    assert f["compile_spike_waves"] == 0
    assert f["inserts_per_s_steady"] == f["inserts_per_s"]

    # no insert waves at all: steady fields absent, summary still forms
    empty = MixedStats(
        inserts=0, queries=5, elapsed_s=1.0, inserts_per_s=0.0,
        qps=5.0, insert_ms=[], query_ms=[1.0] * 5,
    )
    assert "inserts_per_s_steady" not in empty.summary()
