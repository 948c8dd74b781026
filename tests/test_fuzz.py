"""Randomized differential testing: py vs native vs exact oracle.

A randomized interleaving of adds, bulk waves, deletes, and searches runs
against both graph backends; graphs must stay structurally valid, results
must match between backends at every probe (identical tie-break rules;
random floats make exact ties vanishingly rare), and final recall is
checked against the exact oracle. This generalizes the reference's
fixed-scenario end-to-end test (src/hnsw/core_tests.rs) into a property
test.
"""

import numpy as np
import pytest

from redis_hnsw_tpu import HNSWIndex, IndexConfig
from redis_hnsw_tpu import native_core
from redis_hnsw_tpu.models.flat import FlatIndex
from tests.test_core import graph_invariants

pytestmark = pytest.mark.skipif(
    native_core.load() is None, reason="native core unavailable"
)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.slow
def test_randomized_op_sequence_differential(seed):
    rng = np.random.default_rng(seed)
    dim, m, efcon = 12, 5, 40
    pool = rng.standard_normal((2000, dim)).astype(np.float32)

    idxs = {
        b: HNSWIndex(
            f"f-{b}",
            IndexConfig(
                dim=dim, m=m, ef_construction=efcon, seed=7, backend=b
            ),
        )
        for b in ("py", "native")
    }
    oracle = FlatIndex("o", IndexConfig(dim=dim))

    live: list[int] = []
    next_id = 0

    def probe():
        q = rng.standard_normal(dim).astype(np.float32)
        got = {
            b: [(r.name, round(r.sim, 3)) for r in ix.search_knn(q, 5)]
            for b, ix in idxs.items()
        }
        assert got["py"] == got["native"], got

    for step in range(60):
        op = rng.random()
        if op < 0.45 or not live:  # bulk wave
            w = int(rng.integers(5, 40))
            names = [f"v{next_id + j}" for j in range(w)]
            rows = pool[next_id : next_id + w]
            for ix in idxs.values():
                ix.add_batch(names, rows, batch_size=16)
            oracle.add_batch(names, rows)
            live.extend(range(next_id, next_id + w))
            next_id += w
        elif op < 0.65:  # single adds
            names = [f"v{next_id}"]
            for ix in idxs.values():
                ix.add_node(names[0], pool[next_id])
            oracle.add_batch(names, pool[next_id : next_id + 1])
            live.append(next_id)
            next_id += 1
        elif op < 0.9 and len(live) > 5:  # deletes
            for _ in range(int(rng.integers(1, 6))):
                vid = live.pop(int(rng.integers(0, len(live))))
                for ix in idxs.values():
                    ix.delete_node(f"v{vid}")
                oracle.delete_node(f"v{vid}")
        else:
            probe()

    for ix in idxs.values():
        graph_invariants(ix)
        assert ix.node_count == len(live)
    probe()

    # final recall vs oracle (same settings both backends)
    queries = rng.standard_normal((32, dim)).astype(np.float32)
    truth = [
        {r.name for r in t} for t in oracle.search_batch(queries, 5)
    ]
    for b, ix in idxs.items():
        res = ix.search_batch(
            queries, 5, ef_search=64, expand=4, engine="graph"
        )
        hits = sum(
            len({r.name for r in rr} & truth[q])
            for q, rr in enumerate(res)
        )
        assert hits / (5 * len(queries)) >= 0.85, b


@pytest.mark.slow
def test_hamming_bulk_build_and_batched_search(rng):
    """Hamming end to end through the bulk wave engine + device search
    (the reference only declares Hamming, Readme.md:8)."""
    n, words, k = 600, 8, 5
    data = rng.integers(0, 2**32, (n, words), dtype=np.uint32)
    names = [f"h{i}" for i in range(n)]
    idx = HNSWIndex(
        "hb",
        IndexConfig(dim=256, metric="hamming", m=8,
                    ef_construction=60, seed=3),
    )
    idx.add_batch(names, data, batch_size=128)
    assert idx.node_count == n

    oracle = FlatIndex("o", IndexConfig(dim=256, metric="hamming"))
    oracle.add_batch(names, data)
    queries = data[:32]
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
    assert res[0][0].name == "h0" and res[0][0].sim == 0.0
