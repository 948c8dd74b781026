"""Multi-chip sharded index tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from redis_hnsw_tpu import IndexConfig, NodeNotFound
from redis_hnsw_tpu.models.flat import FlatIndex
from redis_hnsw_tpu.parallel import ShardedHNSW, make_mesh
from tests.test_core import graph_invariants


@pytest.fixture(scope="module")
def sharded_built():
    rng = np.random.default_rng(1)
    n, dim = 800, 16
    data = rng.standard_normal((n, dim)).astype(np.float32)
    names = [f"n{i}" for i in range(n)]
    mesh = make_mesh(8)
    idx = ShardedHNSW(
        "sh", IndexConfig(dim=dim, m=8, ef_construction=48, seed=0), mesh=mesh
    )
    idx.add_batch(names, data)
    oracle = FlatIndex("o", IndexConfig(dim=dim))
    oracle.add_batch(names, data)
    return idx, oracle, data, rng


def test_sharded_recall(sharded_built):
    idx, oracle, data, rng = sharded_built
    k = 10
    queries = rng.standard_normal((16, 16)).astype(np.float32)
    got = idx.search_batch(queries, k)
    want = oracle.search_batch(queries, k)
    hits = sum(
        len({r.name for r in got[b]} & {r.name for r in want[b]})
        for b in range(len(queries))
    )
    assert hits / (k * len(queries)) >= 0.95


def test_sharded_exact_self_lookup(sharded_built):
    idx, _, data, _ = sharded_built
    res = idx.search_batch(data[:8], k=1)
    assert [r[0].name for r in res] == [f"n{i}" for i in range(8)]
    assert all(abs(r[0].sim) < 1e-5 for r in res)


def test_sharded_node_ops(sharded_built):
    idx, _, data, _ = sharded_built
    node = idx.get_node("n5")
    np.testing.assert_array_equal(node["data"], data[5])
    idx.delete_node("n5")
    assert idx.node_count == 799
    res = idx.search_batch(data[5][None], k=3)
    assert all(r.name != "n5" for r in res[0])
    idx.add_node("n5", data[5])
    assert idx.node_count == 800


def test_sharded_results_sorted(sharded_built):
    idx, _, data, rng = sharded_built
    queries = rng.standard_normal((4, 16)).astype(np.float32)
    for r in idx.search_batch(queries, 8):
        sims = [x.sim for x in r]
        assert sims == sorted(sims, reverse=True)


def test_empty_sharded():
    mesh = make_mesh(8)
    idx = ShardedHNSW("e", IndexConfig(dim=8, m=4), mesh=mesh)
    assert idx.search_batch(np.zeros((2, 8), np.float32), 3) == [[], []]
    # one node on one shard; other shards empty -> must be masked
    idx.add_node("solo", np.ones(8, np.float32))
    res = idx.search_batch(np.zeros((2, 8), np.float32), 3)
    assert [r.name for r in res[0]] == ["solo"]
    assert len(res[0]) == 1


def test_sharded_checkpoint_roundtrip(tmp_path, sharded_built):
    from redis_hnsw_tpu.parallel.sharded import ShardedHNSW

    sharded, oracle, data, rng = sharded_built
    queries = data[:4] + 0.01
    want = sharded.search_batch(queries, k=3)
    d = str(tmp_path / "ck")
    sharded.save(d)
    back = ShardedHNSW.restore(d, mesh=sharded.mesh)
    assert back.node_count == sharded.node_count
    got = back.search_batch(queries, k=3)
    assert [[r.name for r in rr] for rr in got] == [
        [r.name for r in rr] for rr in want
    ]
    # restored index stays mutable
    import numpy as np

    back.add_node("fresh", np.asarray(data[0]) * 0.5)
    assert back.node_count == sharded.node_count + 1


@pytest.mark.slow
def test_sharded_hamming():
    """Hamming metric across the mesh: per-shard blocked XOR+popcount
    beams + the all-gather merge."""
    rng = np.random.default_rng(5)
    n, words, k = 400, 8, 5
    data = rng.integers(0, 2**32, (n, words), dtype=np.uint32)
    names = [f"h{i}" for i in range(n)]
    mesh = make_mesh(8)
    idx = ShardedHNSW(
        "shh",
        IndexConfig(dim=256, m=8, ef_construction=48,
                    metric="hamming", seed=2),
        mesh=mesh,
    )
    idx.add_batch(names, data, batch_size=128)
    oracle = FlatIndex("o", IndexConfig(dim=256, metric="hamming"))
    oracle.add_batch(names, data)
    queries = rng.integers(0, 2**32, (16, words), dtype=np.uint32)
    got = idx.search_batch(queries, k, ef_search=64, expand=8, iters=12)
    want = oracle.search_batch(queries, k)
    hits = sum(
        len({r.name for r in got[b]} & {r.name for r in want[b]})
        for b in range(len(queries))
    )
    assert hits / (k * len(queries)) >= 0.9
    for rr in got:
        names_list = [r.name for r in rr]
        assert len(names_list) == len(set(names_list))


@pytest.mark.slow
def test_sharded_autosave(tmp_path):
    """Per-shard autosave: a crash loses at most every_ops mutations
    per shard; shards restore individually."""
    from redis_hnsw_tpu.utils.checkpoint import load_index

    rng = np.random.default_rng(6)
    n, dim = 300, 12
    data = rng.standard_normal((n, dim)).astype(np.float32)
    names = [f"a{i}" for i in range(n)]
    mesh = make_mesh(8)
    idx = ShardedHNSW(
        "sa", IndexConfig(dim=dim, m=6, ef_construction=32, seed=4),
        mesh=mesh,
    )
    d = str(tmp_path / "auto")
    idx.enable_autosave(d, every_ops=8)
    idx.add_batch(names, data, batch_size=64)
    import os

    total = 0
    for s in range(idx.n_shards):
        p = os.path.join(d, f"shard{s}.npz")
        assert os.path.exists(p)
        total += load_index(p).node_count
    # every shard saved within every_ops of its final size
    assert total >= n - 8 * idx.n_shards


def test_interleaved_build_identical_graphs(rng):
    """Interleaved wave dispatch (shard s+1's device pass in flight
    during shard s's host surgery) must build graphs IDENTICAL to
    strictly sequential per-shard builds: waves within a shard stay
    ordered, and shards are independent."""
    dim, n = 16, 600
    mesh = make_mesh(8)
    data = rng.standard_normal((n, dim)).astype(np.float32)
    names = [f"n{i}" for i in range(n)]

    a = ShardedHNSW(
        "il", IndexConfig(dim=dim, m=6, ef_construction=48, seed=3),
        mesh=mesh,
    )
    a.add_batch(names, data, batch_size=128, interleave=True)
    b = ShardedHNSW(
        "sq", IndexConfig(dim=dim, m=6, ef_construction=48, seed=3),
        mesh=mesh,
    )
    b.add_batch(names, data, batch_size=128, interleave=False)

    assert a.node_count == b.node_count == n
    for name in names:
        na, nb = a.get_node(name), b.get_node(name)
        assert [sorted(l) for l in na["neighbors"]] == [
            sorted(l) for l in nb["neighbors"]
        ], name
    # and the merged search agrees
    q = data[17]
    ra = [(r.name, round(r.sim, 4)) for r in a.search_knn(q, 5)]
    rb = [(r.name, round(r.sim, 4)) for r in b.search_knn(q, 5)]
    assert ra == rb


def test_sharded_scan_engine_exact(rng):
    """Per-shard exact MXU scan under shard_map + all-gather merge:
    results equal the flat oracle exactly; auto routes to it at these
    shard sizes."""
    dim, n, k = 16, 900, 8
    mesh = make_mesh(8)
    data = rng.standard_normal((n, dim)).astype(np.float32)
    names = [f"n{i}" for i in range(n)]
    idx = ShardedHNSW(
        "sc", IndexConfig(dim=dim, m=6, ef_construction=48, seed=1),
        mesh=mesh,
    )
    idx.add_batch(names, data, batch_size=256)
    oracle = FlatIndex("o", IndexConfig(dim=dim))
    oracle.add_batch(names, data)
    queries = rng.standard_normal((16, dim)).astype(np.float32)
    want = oracle.search_batch(queries, k)
    got = idx.search_batch(queries, k, engine="scan")
    auto = idx.search_batch(queries, k)  # routes to scan here
    for b in range(16):
        assert {r.name for r in got[b]} == {r.name for r in want[b]}
        assert {r.name for r in auto[b]} == {r.name for r in want[b]}
        np.testing.assert_allclose(
            sorted(r.sim for r in got[b]),
            sorted(r.sim for r in want[b]), rtol=1e-5,
        )
    # deletes respected across shards
    for i in range(0, n, 3):
        idx.delete_node(f"n{i}")
    got = idx.search_batch(data[:6], 5, engine="scan")
    for rr in got:
        assert all(int(r.name[1:]) % 3 != 0 for r in rr)
    # graph engine still reachable
    g = idx.search_batch(queries, k, engine="graph", ef_search=64,
                         expand=8, iters=12)
    assert len(g) == 16 and all(len(r) == k for r in g)


def test_sharded_scan_tiers(rng, monkeypatch):
    """scan-approx and the bf16 selection tier ride the sharded scan
    identically to one chip: near-exact names, exact reported sims."""
    dim, n, k = 16, 700, 8
    mesh = make_mesh(8)
    data = rng.standard_normal((n, dim)).astype(np.float32)
    names = [f"n{i}" for i in range(n)]
    idx = ShardedHNSW(
        "st", IndexConfig(dim=dim, m=6, ef_construction=48, seed=1),
        mesh=mesh,
    )
    idx.add_batch(names, data, batch_size=256)
    oracle = FlatIndex("o", IndexConfig(dim=dim))
    oracle.add_batch(names, data)
    queries = rng.standard_normal((16, dim)).astype(np.float32)
    want = oracle.search_batch(queries, k)
    for env, engine in (
        (None, "scan-approx"), ("bf16", "scan"), ("bf16", "scan-approx"),
        ("int8", "scan"), ("int8", "scan-approx"),
    ):
        if env:
            monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_DTYPE", env)
        else:
            monkeypatch.delenv("REDIS_HNSW_TPU_SCAN_DTYPE",
                               raising=False)
        got = idx.search_batch(queries, k, engine=engine)
        hits = sum(
            len({r.name for r in got[b]} & {r.name for r in want[b]})
            for b in range(16)
        )
        assert hits / (16 * k) >= 0.97, (env, engine)
        for b in range(16):
            by_name = {r.name: r.sim for r in want[b]}
            for r in got[b]:
                if r.name in by_name:  # sims are exact where comparable
                    assert abs(r.sim - by_name[r.name]) <= 1e-5 * (
                        1 + abs(by_name[r.name])
                    ), (env, engine)


def test_sharded_columnar_reply(sharded_built):
    sharded, oracle, data, rng = sharded_built
    queries = rng.standard_normal((4, 16)).astype(np.float32)
    names, sims = sharded.search_batch(queries, 5, reply="columnar")
    want = sharded.search_batch(queries, 5)
    assert names.shape == (4, 5)
    for b in range(4):
        assert list(names[b]) == [r.name for r in want[b]]
        np.testing.assert_allclose(
            sims[b], [r.sim for r in want[b]], rtol=1e-5
        )


def test_sharded_seeded_beam(sharded_built):
    """seeds>0 on the sharded graph engine seeds every shard's beam
    with per-lane pivot entrypoints: at a starved operating point
    recall must improve (or at worst tie while staying valid), replies
    stay duplicate-free and nearest-first, and a repeat call (pivot
    stack cached per epoch tuple) agrees."""
    sharded, oracle, data, rng = sharded_built
    k = 10
    queries = rng.standard_normal((16, 16)).astype(np.float32)
    want = oracle.search_batch(queries, k)
    want_sets = [{r.name for r in w} for w in want]

    def recall(res):
        return sum(
            len({r.name for r in res[b]} & want_sets[b])
            for b in range(len(queries))
        ) / (k * len(queries))

    kw = dict(ef_search=12, expand=2, iters=3, engine="graph")
    base = recall(sharded.search_batch(queries, k, **kw))
    seeded = sharded.search_batch(queries, k, seeds=8, **kw)
    assert recall(seeded) >= base
    assert recall(seeded) >= 0.5  # seeds alone nearly solve 800 rows
    for res in seeded:
        names = [r.name for r in res]
        assert len(names) == len(set(names))
        sims = [r.sim for r in res]
        assert sims == sorted(sims, reverse=True)
    again = sharded.search_batch(queries, k, seeds=8, **kw)
    assert [[r.name for r in res] for res in again] == [
        [r.name for r in res] for res in seeded
    ]


@pytest.mark.slow
def test_hierarchical_2d_mesh_matches_1d(rng):
    """A (slice, data) 2-D mesh (make_mesh2d) runs the SAME stacked
    tables with the hierarchical in-shard_map merge (intra-slice ICI
    all-gather first, then the cross-slice axis) and must return
    byte-identical results to the 1-D mesh's single all-gather merge,
    for the graph beam and both scan tiers. Same shard count + seeds =>
    identical shard graphs, so any difference is the merge itself."""
    from redis_hnsw_tpu.parallel import make_mesh2d

    n, dim, k = 320, 16, 10
    data = rng.standard_normal((n, dim)).astype(np.float32)
    names = [f"n{i}" for i in range(n)]
    queries = rng.standard_normal((16, dim)).astype(np.float32)

    cfg = dict(dim=dim, m=6, ef_construction=32, seed=3)
    flat = ShardedHNSW("h1", IndexConfig(**cfg), mesh=make_mesh(8))
    hier = ShardedHNSW(
        "h2", IndexConfig(**cfg), mesh=make_mesh2d(2, 4)
    )
    assert hier.n_shards == flat.n_shards == 8
    flat.add_batch(names, data)
    hier.add_batch(names, data)

    for kw in (
        dict(engine="graph", ef_search=32),
        dict(engine="scan"),
        dict(engine="scan-approx"),
    ):
        a = flat.search_batch(queries, k, **kw)
        b = hier.search_batch(queries, k, **kw)
        assert [[(r.name, r.sim) for r in row] for row in a] == [
            [(r.name, r.sim) for r in row] for row in b
        ], kw

    # columnar decode uses the row-major global-id encoding; pin it
    an, asim = flat.search_batch(queries, k, reply="columnar")
    bn, bsim = hier.search_batch(queries, k, reply="columnar")
    assert an.tolist() == bn.tolist()
    np.testing.assert_array_equal(asim, bsim)


def test_sharded_certified_scan(rng, monkeypatch):
    """Certified-exact sharded scan (REDIS_HNSW_TPU_SCAN_CERT=1):
    byte-identical to the exact sharded scan on 1-D and 2-D meshes;
    per-query certificate ANDed across shards; tie-heavy queries fall
    back through the exact sharded path and still match."""
    import redis_hnsw_tpu.ops.scan as S
    from redis_hnsw_tpu.parallel import make_mesh2d

    dim, n, k = 16, 840, 10
    data = rng.standard_normal((n, dim)).astype(np.float32)
    # duplicate a slab 6x so some queries truncate a tie class
    data[300:600] = np.repeat(data[300:350], 6, axis=0)
    names = [f"n{i}" for i in range(n)]
    cfg = dict(dim=dim, m=6, ef_construction=48, seed=1)
    queries = np.concatenate(
        [rng.standard_normal((12, dim)).astype(np.float32),
         data[310:314]]  # dead-center on the duplicated slab
    )
    for mesh in (make_mesh(8), make_mesh2d(2, 4)):
        idx = ShardedHNSW("cs", IndexConfig(**cfg), mesh=mesh)
        idx.add_batch(names, data, batch_size=256)
        monkeypatch.delenv("REDIS_HNSW_TPU_SCAN_CERT", raising=False)
        want = idx.search_batch(queries, k, engine="scan")
        monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
        before = dict(S.CERT_STATS)
        got = idx.search_batch(queries, k, engine="scan")
        assert S.CERT_STATS["batches"] == before["batches"] + 1
        assert S.CERT_STATS["queries"] == before["queries"] + 16
        for b in range(16):
            assert [(r.sim, r.name) for r in got[b]] == [
                (r.sim, r.name) for r in want[b]
            ], b
        # recall_target=1.0 routes through the same certified path
        got_rt = idx.search_batch(queries, k, recall_target=1.0)
        for b in range(16):
            assert [r.name for r in got_rt[b]] == [
                r.name for r in want[b]
            ]
    # the duplicated-slab queries truncate a 6-member tie class ->
    # at least those must have been re-served by the exact fallback
    assert S.CERT_STATS["fallback_queries"] > 0


def test_sharded_ids_reply_mode(rng, monkeypatch):
    """REDIS_HNSW_TPU_REPLY=ids on the sharded index: only the merged
    gid block crosses the link; sims recompute host-side from the
    per-shard row tables. Same names/order as the full reply for both
    engines, sims exact, columnar decode unchanged."""
    dim, n, k = 16, 600, 8
    mesh = make_mesh(8)
    data = rng.standard_normal((n, dim)).astype(np.float32)
    names = [f"n{i}" for i in range(n)]
    idx = ShardedHNSW(
        "ir", IndexConfig(dim=dim, m=6, ef_construction=48, seed=2),
        mesh=mesh,
    )
    idx.add_batch(names, data, batch_size=256)
    queries = rng.standard_normal((12, dim)).astype(np.float32)
    for kw in (dict(engine="scan"), dict(engine="graph", ef_search=48)):
        monkeypatch.delenv("REDIS_HNSW_TPU_REPLY", raising=False)
        want = idx.search_batch(queries, k, **kw)
        monkeypatch.setenv("REDIS_HNSW_TPU_REPLY", "ids-force")
        got = idx.search_batch(queries, k, **kw)
        for b in range(12):
            assert [r.name for r in got[b]] == [
                r.name for r in want[b]
            ], kw
            np.testing.assert_allclose(
                [r.sim for r in got[b]], [r.sim for r in want[b]],
                rtol=1e-6, atol=1e-5,
            )
        nm, sims = idx.search_batch(queries, k, reply="columnar", **kw)
        assert nm.shape == sims.shape == (12, k)


def test_sharded_delete_batch(sharded_built):
    idx, _, data, _ = sharded_built
    victims = [f"n{i}" for i in range(0, 100, 2)]
    with pytest.raises(NodeNotFound):
        idx.delete_batch(victims + ["ghost"])
    assert idx.node_count == 800  # validate-first: nothing mutated
    idx.delete_batch(victims)
    assert idx.node_count == 750
    res = idx.search_batch(data[:4], k=5)
    assert not {r.name for row in res for r in row} & set(victims)
    assert res[1][0].name == "n1"  # odd survivors still exact
    for s in idx.shards:
        graph_invariants(s)


def test_sharded_pipelined_multichunk_matches_serial(
    sharded_built, monkeypatch
):
    """The sharded chunked pipelined drain must reproduce the
    single-chunk reply element-for-element on every engine, certified
    and ids-reply modes included (chunk cap shrunk so a small query
    set spans several shard_map programs + an odd tail)."""
    import redis_hnsw_tpu.ops.scan as S
    import redis_hnsw_tpu.ops.search as SE

    idx, oracle, data, rng = sharded_built
    queries = rng.standard_normal((100, 16)).astype(np.float32)
    want = {}
    for engine in ("scan", "scan-approx", "graph"):
        want[engine] = idx.search_batch(
            queries, 7, engine=engine, reply="columnar"
        )
    monkeypatch.setattr(SE, "MAX_LANES", 32)
    monkeypatch.setenv("REDIS_HNSW_TPU_PIPELINE", "3")
    for engine in ("scan", "scan-approx", "graph"):
        got = idx.search_batch(queries, 7, engine=engine, reply="columnar")
        assert (got[0] == want[engine][0]).all(), engine
        assert np.array_equal(got[1], want[engine][1]), engine
    # certified chunked (forced): byte-identical to the exact sharded
    # scan, with chunk-level CERT_STATS accounting
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    before = dict(S.CERT_STATS)
    got = idx.search_batch(queries, 7, engine="scan", reply="columnar")
    assert S.CERT_STATS["batches"] == before["batches"] + 4  # ceil(100/32)
    assert (got[0] == want["scan"][0]).all()
    assert np.array_equal(got[1], want["scan"][1])
    # ids-reply chunked: same names, host-exact sims
    monkeypatch.setenv("REDIS_HNSW_TPU_REPLY", "ids-force")
    got = idx.search_batch(queries, 7, engine="scan", reply="columnar")
    assert (got[0] == want["scan"][0]).all()
    np.testing.assert_allclose(got[1], want["scan"][1], rtol=2e-6)


def test_sharded_empty_query_batch(sharded_built):
    idx, _, _, _ = sharded_built
    empty = np.zeros((0, 16), np.float32)
    assert idx.search_batch(empty, 5) == []
    nm, sims = idx.search_batch(empty, 5, reply="columnar")
    assert nm.shape == (0, 5) and sims.shape == (0, 5)


def test_sharded_certified_hamming_scan(rng, monkeypatch):
    """Certified-exact sharded HAMMING scan (the deep-certificate twin,
    _sharded_scan_cert_hamming_jit): byte-identical to the exact
    sharded scan on 1-D and 2-D meshes; straddling tie classes that
    fit the oversampled selection certify, oversized duplicate slabs
    fall back through the exact sharded path and still match."""
    import redis_hnsw_tpu.ops.scan as S
    from redis_hnsw_tpu.parallel import make_mesh2d

    n, words, k = 840, 8, 10
    data = rng.integers(0, 2**32, (n, words), dtype=np.uint32)
    # a 48x-duplicated slab: its tie class exceeds the 4k=40-deep
    # selection, so dead-center queries cannot certify
    data[300:588] = np.repeat(data[300:306], 48, axis=0)
    names = [f"h{i}" for i in range(n)]
    cfg = dict(dim=256, m=6, ef_construction=48, metric="hamming",
               seed=1)
    queries = np.concatenate(
        [rng.integers(0, 2**32, (12, words), dtype=np.uint32),
         data[310:314]]  # dead-center on the duplicated slab
    )
    for mesh in (make_mesh(8), make_mesh2d(2, 4)):
        idx = ShardedHNSW("csh", IndexConfig(**cfg), mesh=mesh)
        idx.add_batch(names, data, batch_size=256)
        monkeypatch.delenv("REDIS_HNSW_TPU_SCAN_CERT", raising=False)
        want = idx.search_batch(queries, k, engine="scan")
        monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
        before = dict(S.CERT_STATS)
        got = idx.search_batch(queries, k, engine="scan")
        assert S.CERT_STATS["batches"] == before["batches"] + 1
        assert S.CERT_STATS["queries"] == before["queries"] + 16
        for b in range(16):
            assert [(r.sim, r.name) for r in got[b]] == [
                (r.sim, r.name) for r in want[b]
            ], b
        # recall_target=1.0 routes through the same certified path
        got_rt = idx.search_batch(queries, k, recall_target=1.0)
        for b in range(16):
            assert [r.name for r in got_rt[b]] == [
                r.name for r in want[b]
            ]
    assert S.CERT_STATS["fallback_queries"] > 0
