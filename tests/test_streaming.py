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


@pytest.mark.slow
def test_mixed_stream_overlap_mode(rng):
    """overlap=True: sliced waves with async-dispatched beams and
    queries riding the device FIFO behind them. Graph semantics must
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
    assert stats.queries > 0
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
