"""Batched device search vs host reference search and exact oracle."""

import numpy as np
import pytest

from redis_hnsw_tpu import HNSWIndex, IndexConfig
from redis_hnsw_tpu.models.flat import FlatIndex


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(42)
    n, dim = 1500, 24
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = HNSWIndex(
        "dev", IndexConfig(dim=dim, m=8, ef_construction=64, seed=5)
    )
    oracle = FlatIndex("o", IndexConfig(dim=dim))
    names = [f"n{i}" for i in range(n)]
    for i in range(n):
        idx.add_node(names[i], data[i])
    oracle.add_batch(names, data)
    queries = rng.standard_normal((32, dim)).astype(np.float32)
    return idx, oracle, data, queries


def test_device_matches_host_result_sets(built):
    """The batched engine must find the same neighbors as the host
    reference-parity engine (same graph, same ef)."""
    idx, _, _, queries = built
    k = 10
    dev = idx.search_batch(queries, k, engine="graph")
    for b, q in enumerate(queries):
        host = idx.search_knn(q, k)
        got = [r.name for r in dev[b]]
        want = [r.name for r in host]
        # identical graphs + identical ef -> identical expansion frontier;
        # allow tie-order differences only.
        assert set(got) == set(want), f"query {b}: {got} vs {want}"
        got_sims = np.array([r.sim for r in dev[b]])
        want_sims = np.array([r.sim for r in host])
        np.testing.assert_allclose(got_sims, want_sims, rtol=1e-4)
        # nearest-first ordering
        assert (np.diff(got_sims) <= 1e-6).all()


def test_device_recall_vs_oracle(built):
    idx, oracle, _, queries = built
    k = 10
    dev = idx.search_batch(queries, k, engine="graph")
    want = oracle.search_batch(queries, k)
    hits = total = 0
    for b in range(len(queries)):
        hits += len(
            {r.name for r in dev[b]} & {r.name for r in want[b]}
        )
        total += k
    assert hits / total >= 0.95


def test_device_single_query_and_padding(built):
    idx, _, data, _ = built
    res = idx.search_batch(data[7][None], k=1)
    assert res[0][0].name == "n7"
    assert res[0][0].sim == 0.0
    # odd batch size exercises lane padding
    res = idx.search_batch(data[:5], k=1)
    assert [r[0].name for r in res] == [f"n{i}" for i in range(5)]


def test_device_empty_and_tiny_index():
    idx = HNSWIndex("t", IndexConfig(dim=8, m=4, ef_construction=16, seed=0))
    q = np.zeros((2, 8), np.float32)
    assert idx.search_batch(q, 3) == [[], []]
    idx.add_node("only", np.ones(8, np.float32))
    res = idx.search_batch(q, 3)
    assert [r.name for r in res[0]] == ["only"]
    assert res[0][0].sim == -8.0


def test_device_ef_search_knob(built):
    """ef_search=1 degrades recall vs ef_search=ef_construction -- the knob
    the reference lacks (search ef hardwired at core.rs:485)."""
    idx, oracle, _, queries = built
    k = 10
    lo = idx.search_batch(queries, k, ef_search=k, engine="graph")
    hi = idx.search_batch(queries, k, ef_search=128, engine="graph")
    want = oracle.search_batch(queries, k)

    def recall(res):
        hits = sum(
            len({r.name for r in res[b]} & {r.name for r in want[b]})
            for b in range(len(queries))
        )
        return hits / (k * len(queries))

    assert recall(hi) >= recall(lo)
    assert recall(hi) >= 0.97


def test_device_search_after_deletes(built):
    rng = np.random.default_rng(3)
    n, dim = 300, 12
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = HNSWIndex("d2", IndexConfig(dim=dim, m=4, ef_construction=32, seed=9))
    for i in range(n):
        idx.add_node(f"n{i}", data[i])
    for i in range(0, n, 2):
        idx.delete_node(f"n{i}")
    res = idx.search_batch(data[:8], k=3)
    surviving = {f"n{i}" for i in range(1, n, 2)}
    for r in res:
        assert r, "search returned nothing after deletes"
        for item in r:
            assert item.name in surviving


def test_device_hamming_no_duplicates_and_recall():
    """Integer hamming sims collide constantly; the beam's dedup must key
    the merge sort on (-sim, id), not sim alone, or duplicated replies
    crater recall (regression: 0.54 observed from sim-only keys)."""
    rng = np.random.default_rng(3)
    n, words, k = 400, 8, 10
    data = rng.integers(0, 2**32, (n, words), dtype=np.uint32)
    queries = rng.integers(0, 2**32, (48, words), dtype=np.uint32)
    names = [f"n{i}" for i in range(n)]
    idx = HNSWIndex(
        "hd",
        IndexConfig(dim=256, m=8, ef_construction=48,
                    metric="hamming", seed=7),
    )
    idx.add_batch(names, data, batch_size=256)
    oracle = FlatIndex("o", IndexConfig(dim=256, metric="hamming"))
    oracle.add_batch(names, data)
    truth = [{r.name for r in t} for t in oracle.search_batch(queries, k)]
    res = idx.search_batch(
        queries, k, ef_search=64, expand=16, iters=12, engine="graph"
    )
    hits = 0
    for b, rr in enumerate(res):
        got = [r.name for r in rr]
        assert len(got) == len(set(got)), f"duplicate reply: {got}"
        hits += len(set(got) & truth[b])
    assert hits / (k * len(queries)) >= 0.95


@pytest.mark.slow
def test_quantized_high_dim_path(monkeypatch, built=None):
    """int8 coarse scoring (byte-bound high-D regime) forced on via
    REDIS_HNSW_TPU_QUANT=1: recall stays high and reported sims remain
    exact-form (rescored), matching the f32 path's results."""
    monkeypatch.setenv("REDIS_HNSW_TPU_QUANT", "1")
    rng = np.random.default_rng(9)
    n, dim, k = 600, 48, 10
    data = rng.standard_normal((n, dim)).astype(np.float32)
    queries = rng.standard_normal((32, dim)).astype(np.float32)
    names = [f"n{i}" for i in range(n)]
    idx = HNSWIndex(
        "q8", IndexConfig(dim=dim, m=8, ef_construction=48, seed=5)
    )
    idx.add_batch(names, data, batch_size=256)
    snap = idx.device_snapshot()
    assert snap.qrows is not None and snap.nbrvec is None
    oracle = FlatIndex("o", IndexConfig(dim=dim))
    oracle.add_batch(names, data)
    truth = oracle.search_batch(queries, k)
    res = idx.search_batch(
        queries, k, ef_search=64, expand=8, iters=12, engine="graph"
    )
    hits = 0
    for b in range(len(queries)):
        hits += len(
            {r.name for r in res[b]} & {r.name for r in truth[b]}
        )
        for r in res[b]:
            # reported sims are exact f32 (rescored), not quantized
            row = oracle._names.get(r.name)
            exact = -float(np.sum((queries[b] - data[row]) ** 2))
            assert abs(r.sim - exact) < 1e-3 * (1 + abs(exact))
    assert hits / (k * len(queries)) >= 0.93


@pytest.mark.slow
def test_int8_blocked_tier(monkeypatch):
    """Forced int8 nbrvec blocks (the over-budget low-D tier): recall
    matches the f32 blocked path within noise, reported sims exact."""
    monkeypatch.setenv("REDIS_HNSW_TPU_NBRVEC_DTYPE", "i8")
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    n, dim, k = 800, 24, 10
    data = rng.standard_normal((n, dim)).astype(np.float32)
    queries = rng.standard_normal((32, dim)).astype(np.float32)
    names = [f"n{i}" for i in range(n)]
    idx = HNSWIndex(
        "i8b", IndexConfig(dim=dim, m=8, ef_construction=48, seed=5)
    )
    idx.add_batch(names, data, batch_size=256)
    snap = idx.device_snapshot()
    assert snap.nbrvec is not None and snap.nbrvec.dtype == jnp.int8
    # int8 tier: bare [N, F, D] blocks + [N, 2F] f32 scale/sqn meta
    assert snap.nbrvec.shape[-1] == dim
    assert snap.nbrsqn is not None
    assert snap.nbrsqn.shape == (snap.n_pad, 2 * snap.nbrvec.shape[1])
    oracle = FlatIndex("o", IndexConfig(dim=dim))
    oracle.add_batch(names, data)
    truth = oracle.search_batch(queries, k)
    res = idx.search_batch(
        queries, k, ef_search=64, expand=8, iters=12, engine="graph"
    )
    hits = 0
    for b in range(len(queries)):
        hits += len({r.name for r in res[b]} & {r.name for r in truth[b]})
        for r in res[b]:
            row = oracle._names.get(r.name)
            exact = -float(np.sum((queries[b] - data[row]) ** 2))
            assert abs(r.sim - exact) < 1e-3 * (1 + abs(exact))
    assert hits / (k * len(queries)) >= 0.93
    # mutations keep the packed blocks fresh through the delta path
    idx.delete_node("n5")
    idx.add_node("n5b", data[5] * 0.5)
    res = idx.search_batch(data[5][None] * 0.5, 1, engine="graph")
    assert res[0][0].name == "n5b"


def test_nbrvec_over_budget_fallback(monkeypatch):
    """With the nbrvec budget too small for any tier, the snapshot
    carries no blocked table and the beam falls back to row gathers --
    results unchanged."""
    monkeypatch.setenv("REDIS_HNSW_TPU_NBRVEC_BYTES", "1024")
    rng = np.random.default_rng(4)
    n, dim, k = 400, 16, 5
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = HNSWIndex(
        "nb", IndexConfig(dim=dim, m=8, ef_construction=48, seed=2)
    )
    idx.add_batch([f"n{i}" for i in range(n)], data, batch_size=256)
    snap = idx.device_snapshot()
    assert snap.nbrvec is None and snap.nbrsqn is None
    res = idx.search_batch(
        data[:8], k, ef_search=64, expand=8, iters=12, engine="graph"
    )
    assert [r[0].name for r in res] == [f"n{i}" for i in range(8)]


def test_seeded_beam_lifts_recall(built):
    """seeds>0 adds per-lane pivot entrypoints to the graph beam: at a
    deliberately starved operating point (tiny ef / few iters) recall
    must improve, replies must stay duplicate-free and nearest-first,
    and a second call (pivot pool cached per epoch) must agree."""
    idx, oracle, _, queries = built
    k = 10
    want = oracle.search_batch(queries, k)
    want_sets = [{r.name for r in w} for w in want]

    def recall(res):
        return sum(
            len({r.name for r in res[b]} & want_sets[b])
            for b in range(len(queries))
        ) / (k * len(queries))

    kw = dict(ef_search=16, expand=4, iters=4, engine="graph")
    base = recall(idx.search_batch(queries, k, **kw))
    seeded = idx.search_batch(queries, k, seeds=8, **kw)
    assert recall(seeded) > base
    for res in seeded:
        names = [r.name for r in res]
        assert len(names) == len(set(names))
        sims = [r.sim for r in res]
        assert sims == sorted(sims, reverse=True)
    again = idx.search_batch(queries, k, seeds=8, **kw)
    assert [[r.name for r in res] for res in again] == [
        [r.name for r in res] for res in seeded
    ]


@pytest.mark.slow
def test_seeded_beam_hamming(built):
    """Seeds work for the hamming metric (pm1 pivot scan) and the
    self-query still ranks first."""
    rng = np.random.default_rng(11)
    n, w = 600, 4
    data = rng.integers(0, 2**32, (n, w), dtype=np.uint32)
    idx = HNSWIndex(
        "seedham",
        IndexConfig(dim=w * 32, m=5, ef_construction=48,
                    metric="hamming", seed=3),
    )
    idx.add_batch([f"h{i}" for i in range(n)], data, batch_size=256)
    res = idx.search_batch(
        data[:16], 5, ef_search=32, expand=8, engine="graph", seeds=8
    )
    for b in range(16):
        names = [r.name for r in res[b]]
        assert names[0] == f"h{b}"
        assert len(names) == len(set(names))
