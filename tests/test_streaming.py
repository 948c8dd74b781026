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
