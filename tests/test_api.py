"""API-surface tests: the seven commands + error semantics + reply shapes.

The reference has no command-layer tests (SURVEY.md section 4); its manual
smoke script cmd.sh (new -> 100 adds -> get -> node.get -> search -> 100
dels -> del) is reproduced here as an automated test.
"""

import numpy as np
import pytest

from redis_hnsw_tpu import (
    HNSW,
    DimensionMismatch,
    IndexExists,
    IndexNotFound,
    NodeNotFound,
)


def test_cmd_sh_smoke():
    """cmd.sh:4-25, scaled: DIM 128 M 5, 100 adds, get, search, dels, del."""
    client = HNSW()
    client.create_index("test1", dim=128, m=5)
    for i in range(1, 101):
        client.add_node("test1", f"node{i}", np.full(128, float(i), np.float32))

    info = client.get_index("test1")
    assert info["name"] == "test1"
    assert info["metric"] == "Euclidean"
    assert info["data_dim"] == 128
    assert info["m"] == 5
    assert info["ef_construction"] == 200
    assert info["node_count"] == 100
    np.testing.assert_allclose(info["level_mult"], 1.0 / np.log(5.0))
    assert info["enterpoint"] is not None
    assert info["max_layer"] >= 0

    node = client.get_node("test1", "node1")
    np.testing.assert_array_equal(node["data"], np.full(128, 1.0, np.float32))
    assert len(node["neighbors"]) >= 1
    assert all(
        isinstance(n, str) and n.startswith("node")
        for layer in node["neighbors"]
        for n in layer
    )

    res = client.search("test1", np.full(128, 2.0, np.float32), k=5)
    assert len(res) == 5
    assert res[0].name == "node2"
    assert res[0].sim == 0.0
    # next nearest: node1 and node3 at distance 128 each
    assert {res[1].name, res[2].name} == {"node1", "node3"}
    assert res[1].sim == -128.0

    for i in range(1, 101):
        assert client.delete_node("test1", f"node{i}") == 1
    assert client.get_index("test1")["node_count"] == 0
    assert client.delete_index("test1") == 1
    with pytest.raises(IndexNotFound):
        client.get_index("test1")


def test_index_lifecycle_errors():
    client = HNSW()
    client.create_index("a", dim=8)
    with pytest.raises(IndexExists):
        client.create_index("a", dim=8)
    with pytest.raises(IndexNotFound):
        client.search("missing", np.zeros(8, np.float32))
    with pytest.raises(IndexNotFound):
        client.delete_index("missing")
    with pytest.raises(NodeNotFound):
        client.get_node("a", "nope")
    with pytest.raises(NodeNotFound):
        client.delete_node("a", "nope")
    with pytest.raises(DimensionMismatch):
        client.add_node("a", "x", np.zeros(9, np.float32))


def test_search_default_k_is_5():
    client = HNSW()
    client.create_index("a", dim=4, ef_construction=16)
    for i in range(20):
        client.add_node("a", f"n{i}", np.full(4, float(i), np.float32))
    res = client.search("a", np.zeros(4, np.float32))
    assert len(res) == 5  # src/lib.rs:120 default K=5


def test_search_k_larger_than_count():
    client = HNSW()
    client.create_index("a", dim=4)
    for i in range(3):
        client.add_node("a", f"n{i}", np.full(4, float(i), np.float32))
    res = client.search("a", np.zeros(4, np.float32), k=10)
    assert len(res) == 3


def test_flat_index_kind():
    client = HNSW()
    client.create_index("f", dim=16, kind="flat")
    data = np.eye(16, dtype=np.float32)
    for i in range(16):
        client.add_node("f", f"e{i}", data[i])
    res = client.search("f", data[3], k=2)
    assert res[0].name == "e3"
    assert res[0].sim == 0.0
    assert res[1].sim == -2.0
    client.delete_node("f", "e3")
    res = client.search("f", data[3], k=1)
    assert res[0].name != "e3"
    # single-query replies carry the vector; NODE.GET works on flat
    np.testing.assert_array_equal(res[0].data, data[int(res[0].name[1:])])
    node = client.get_node("f", "e5")
    np.testing.assert_array_equal(node["data"], data[5])
    assert node["neighbors"] == []
    # engine routing: scan engines work, graph is an explicit error
    res = client.search_batch("f", data[:3], k=1, engine="scan")
    assert [r[0].name for r in res] == ["e0", "e1", "e2"]
    res = client.search_batch("f", data[:3], k=1, engine="scan-approx")
    assert [r[0].name for r in res] == ["e0", "e1", "e2"]
    with pytest.raises(ValueError, match="unavailable on flat"):
        client.search_batch("f", data[:3], k=1, engine="graph")


def test_batched_api():
    client = HNSW()
    client.create_index("b", dim=8, m=4, ef_construction=32, seed=1)
    rng = np.random.default_rng(0)
    data = rng.standard_normal((64, 8)).astype(np.float32)
    names = [f"n{i}" for i in range(64)]
    client.add_batch("b", names, data)
    assert client.get_index("b")["node_count"] == 64
    res = client.search_batch("b", data[:4], k=1)
    assert [r[0].name for r in res] == names[:4]


def test_sharded_index_kind(tmp_path, rng):
    """kind="sharded" participates in the full client surface: node ops,
    single + batched search, save/restore (VERDICT r1 item 9)."""
    client = HNSW()
    idx = client.create_index(
        "s", dim=16, m=8, ef_construction=48, seed=3,
        kind="sharded", n_shards=4,
    )
    assert idx.n_shards == 4
    n = 300
    data = rng.standard_normal((n, 16)).astype(np.float32)
    names = [f"n{i}" for i in range(n)]
    client.add_batch("s", names, data)

    info = client.get_index("s")
    assert info["node_count"] == n and info["n_shards"] == 4

    # single-query scatter-gather (host parity per shard)
    res = client.search("s", data[7], k=3)
    assert res[0].name == "n7" and abs(res[0].sim) < 1e-5
    sims = [r.sim for r in res]
    assert sims == sorted(sims, reverse=True)

    # batched device path through the client
    bres = client.search_batch("s", data[:4], k=1)
    assert [r[0].name for r in bres] == names[:4]

    # node ops route to the owning shard
    node = client.get_node("s", "n5")
    np.testing.assert_array_equal(node["data"], data[5])
    client.delete_node("s", "n5")
    assert client.get_index("s")["node_count"] == n - 1
    client.add_node("s", "n5", data[5])

    # save -> restore under a fresh client (directory checkpoint)
    d = str(tmp_path / "shck")
    client.save_index("s", d)
    other = HNSW()
    back = other.restore_index(d, name="s2")
    assert back.node_count == n
    res2 = other.search("s2", data[7], k=3)
    assert [r.name for r in res2] == [r.name for r in res]


@pytest.mark.slow
def test_high_dim_gist_style(rng):
    """960-d vectors (GIST regime, BASELINE config 3): distance-bound
    shapes must work through build and batched search."""
    from redis_hnsw_tpu import HNSWIndex, IndexConfig
    from redis_hnsw_tpu.models.flat import FlatIndex
    import numpy as np

    n, dim, k = 400, 960, 5
    data = rng.standard_normal((n, dim)).astype(np.float32)
    queries = rng.standard_normal((16, dim)).astype(np.float32)
    names = [f"g{i}" for i in range(n)]
    idx = HNSWIndex(
        "g", IndexConfig(dim=dim, m=8, ef_construction=60, seed=6)
    )
    idx.add_batch(names, data, batch_size=128)
    oracle = FlatIndex("o", IndexConfig(dim=dim))
    oracle.add_batch(names, data)
    truth = [
        {r.name for r in t} for t in oracle.search_batch(queries, k)
    ]
    res = idx.search_batch(
        queries, k, ef_search=60, expand=4, engine="graph"
    )
    hits = sum(
        len({r.name for r in rr} & truth[b]) for b, rr in enumerate(res)
    )
    assert hits / (k * len(queries)) >= 0.9


def test_autotune_meets_target(rng):
    """tune() finds knobs meeting the recall target via the in-process
    exact oracle, and the knobs plug into search_batch."""
    import numpy as np
    from redis_hnsw_tpu import HNSWIndex, IndexConfig
    from redis_hnsw_tpu.utils.autotune import tune

    n, dim, k = 1000, 16, 5
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = HNSWIndex(
        "a", IndexConfig(dim=dim, m=8, ef_construction=64, seed=2)
    )
    idx.add_batch([f"n{i}" for i in range(n)], data, batch_size=512)
    queries = rng.standard_normal((64, dim)).astype(np.float32)
    knobs = tune(idx, queries, k=k, target_recall=0.9)
    assert knobs["recall"] >= 0.9
    res = idx.search_batch(
        queries, k, ef_search=knobs["ef_search"],
        expand=knobs["expand"], iters=knobs["iters"],
    )
    assert len(res) == 64 and all(len(r) == k for r in res)


def test_per_index_locking_concurrent_ops(rng):
    """Operations on different indexes run under different locks
    (VERDICT r2 weak 6): hammer two indexes from threads; both stay
    consistent and no deadlock occurs. (The registry lock covers only
    the name->index map.)"""
    import threading

    import numpy as np

    from redis_hnsw_tpu import HNSW

    c = HNSW()
    dim = 16
    c.create_index("a", dim=dim, m=5, seed=1)
    c.create_index("b", dim=dim, m=5, seed=2)
    data = rng.standard_normal((80, dim)).astype(np.float32)
    errs = []

    def work(name, lo):
        try:
            for i in range(lo, lo + 40):
                c.add_node(name, f"n{i}", data[i % len(data)])
                if i % 7 == 0:
                    c.search(name, data[0], k=3)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [
        threading.Thread(target=work, args=("a", 0)),
        threading.Thread(target=work, args=("b", 40)),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert c.get_index("a")["node_count"] == 40
    assert c.get_index("b")["node_count"] == 40
    res = c.search("a", data[0], k=5)
    assert len(res) == 5


def test_delete_batch_client_all_kinds(rng):
    """delete_batch on every index kind through the client API:
    validate-first (nothing mutates on error), survivors searchable,
    deleted names gone."""
    client = HNSW()
    data = rng.standard_normal((60, 8)).astype(np.float32)
    names = [f"n{i}" for i in range(60)]
    victims = names[::3]
    for kind in ("hnsw", "flat"):
        iname = f"bd-{kind}"
        client.create_index(iname, dim=8, m=4, ef_construction=32,
                            kind=kind)
        client.add_batch(iname, names, data)
        with pytest.raises(NodeNotFound):
            client.delete_batch(iname, ["n1", "nope"])
        assert client.get_index(iname)["node_count"] == 60
        assert client.delete_batch(iname, victims) == len(victims)
        assert client.get_index(iname)["node_count"] == 40
        res = client.search(iname, data[1], k=5)
        assert res[0].name == "n1"
        assert not {r.name for r in res} & set(victims)
        with pytest.raises(NodeNotFound):
            client.get_node(iname, victims[0])
