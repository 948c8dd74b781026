"""Checkpoint/restore round-trip tests.

The reference's checkpoint mechanism is RDB save/load callbacks + lazy
pointer-graph reconstruction (src/types.rs:157-284, src/lib.rs:229-315);
the invariant tested here is the same: a restored index is operationally
identical to the one saved (same search results, same graph, mutable).
"""

import os
import numpy as np
import pytest

from redis_hnsw_tpu import HNSW, HNSWError, HNSWIndex, IndexConfig
from redis_hnsw_tpu.utils.checkpoint import load_index, save_index


def build(n=300, dim=12, seed=4):
    rng = np.random.default_rng(seed)
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = HNSWIndex(
        "ck", IndexConfig(dim=dim, m=4, ef_construction=32, seed=1)
    )
    for i in range(n):
        idx.add_node(f"n{i}", data[i])
    # leave some holes so the free list round-trips
    for i in range(0, n, 7):
        idx.delete_node(f"n{i}")
    return idx, data, rng


def test_roundtrip_identical_graph(tmp_path):
    idx, data, rng = build()
    path = str(tmp_path / "ck.npz")
    save_index(idx, path)
    idx2 = load_index(path)

    assert idx2.name == idx.name
    assert idx2.config == idx.config
    assert idx2.node_count == idx.node_count
    assert idx2.max_layer == idx.max_layer
    assert idx2.enterpoint == idx.enterpoint
    assert idx2._names._id_of == idx._names._id_of
    np.testing.assert_array_equal(
        idx2._levels[: idx._names.high_water],
        idx._levels[: idx._names.high_water],
    )
    for row in range(idx._names.high_water):
        assert idx2._neighbors[row] == idx._neighbors[row]
    assert idx2._layer_sets == idx._layer_sets

    # identical search behavior, host and device paths
    qs = rng.standard_normal((8, 12)).astype(np.float32)
    for q in qs:
        a = idx.search_knn(q, 5)
        b = idx2.search_knn(q, 5)
        assert [r.name for r in a] == [r.name for r in b]
        np.testing.assert_allclose(
            [r.sim for r in a], [r.sim for r in b]
        )
    dev_a = idx.search_batch(qs, 5, engine="graph")
    dev_b = idx2.search_batch(qs, 5, engine="graph")
    for ra, rb in zip(dev_a, dev_b):
        assert [r.name for r in ra] == [r.name for r in rb]


def test_restored_index_is_mutable(tmp_path):
    idx, data, _ = build(n=100)
    path = str(tmp_path / "ck.npz")
    save_index(idx, path)
    idx2 = load_index(path)
    idx2.add_node("extra", np.zeros(12, np.float32))
    res = idx2.search_knn(np.zeros(12, np.float32), 1)
    assert res[0].name == "extra"
    idx2.delete_node("extra")
    assert "extra" not in idx2


def test_version_gate(tmp_path):
    idx, _, _ = build(n=20)
    path = str(tmp_path / "ck.npz")
    save_index(idx, path)
    # corrupt the version
    import json

    with np.load(path) as z:
        arrs = {k: z[k] for k in z.files}
    meta = json.loads(bytes(arrs["meta"].tobytes()).decode())
    meta["format_version"] = 999
    arrs["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **arrs)
    with pytest.raises(HNSWError):
        load_index(path)


def test_client_save_restore(tmp_path):
    client = HNSW()
    client.create_index("a", dim=8, m=4, ef_construction=16, seed=0)
    for i in range(50):
        client.add_node("a", f"n{i}", np.full(8, float(i), np.float32))
    path = str(tmp_path / "a.npz")
    client.save_index("a", path)
    client.delete_index("a")
    client.restore_index(path)
    assert client.get_index("a")["node_count"] == 50
    res = client.search("a", np.full(8, 3.0, np.float32), k=1)
    assert res[0].name == "n3"


def test_snapshot_delta_matches_full(rng):
    """Incremental (dirty-row) snapshot refresh must produce arrays
    identical to a from-scratch rebuild, through inserts, bulk waves,
    and deletes, on both graph backends."""
    import numpy as np
    from redis_hnsw_tpu import HNSWIndex, IndexConfig
    from redis_hnsw_tpu.ops.snapshot import build_snapshot

    for backend in ("py", "native"):
        try:
            idx = HNSWIndex(
                "d",
                IndexConfig(
                    dim=8, m=4, ef_construction=24, seed=2, backend=backend
                ),
            )
        except Exception:
            continue  # native unavailable
        idx._capacity_hint = 512  # pin shapes so deltas apply
        data = rng.standard_normal((300, 8)).astype(np.float32)
        idx.add_batch([f"n{i}" for i in range(120)], data[:120])
        s1 = idx.device_snapshot()  # full build + drains dirty

        from redis_hnsw_tpu.ops import snapshot as S

        deltas = []
        orig_delta = S._delta_snapshot
        S._delta_snapshot = lambda *a: deltas.append(1) or orig_delta(*a)
        for i in range(120, 180):
            idx.add_node(f"n{i}", data[i])
        for i in range(0, 60, 5):
            idx.delete_node(f"n{i}")
        idx.add_batch([f"n{i}" for i in range(180, 300)], data[180:])
        s_delta = idx.device_snapshot()  # should take the delta path
        S._delta_snapshot = orig_delta
        assert deltas, "delta path never taken"
        # force a fresh index state for a from-scratch snapshot
        idx._snapshot = None
        idx._dirty_vec = set(range(idx._names.high_water))
        if idx._native is None:
            idx._dirty_adj = set(range(idx._names.high_water))
        s_full = build_snapshot(idx, prev=None)

        def norm(x, like):
            """Trim/compare up to the fresh build's (possibly smaller)
            padding; the delta keeps sticky dims whose extra tail must
            be pure -1/0 padding."""
            x = np.asarray(x)
            like = np.asarray(like)
            sl = tuple(slice(0, s) for s in like.shape)
            trimmed = x[sl]
            rest = x.copy()
            rest[sl] = -1 if x.dtype == np.int32 else 0
            pad_ok = (
                (rest == -1).all()
                if x.dtype == np.int32
                else (rest == 0).all()
            )
            return trimmed, pad_ok

        for a, b in zip(s_delta.arrays, s_full.arrays):
            trimmed, pad_ok = norm(a, b)
            assert pad_ok, "delta snapshot has non-padding data in tail"
            np.testing.assert_array_equal(trimmed, np.asarray(b))


def test_delta_refresh_after_upper_slot_reuse():
    """Delete upper-level nodes, then insert new nodes that reuse their
    freed upper slots, all within one delta window: the new node's
    upper-layer adjacency must survive the freed-slot wipe (ADVICE r1
    high: the wipe ran after the dirty scatter and erased it).

    A churn phase first grows the repaired-degree columns so the later
    refresh stays on the delta path (shape growth would force a full
    rebuild and mask the bug)."""
    import numpy as np
    from redis_hnsw_tpu import HNSWIndex, IndexConfig
    from redis_hnsw_tpu.ops import snapshot as S

    for backend in ("py", "native"):
        try:
            idx = HNSWIndex(
                "reuse",
                IndexConfig(
                    dim=8, m=4, ef_construction=24, seed=0, backend=backend
                ),
            )
        except Exception:
            continue
        idx._capacity_hint = 512
        data = (
            np.random.default_rng(0)
            .standard_normal((400, 8))
            .astype(np.float32)
        )
        idx.add_batch([f"n{i}" for i in range(200)], data[:200])
        # churn: a few deletes + inserts grow the sticky padded dims
        for r in list(idx._upper_slot.keys())[:4]:
            idx.delete_node(idx._names.name(r))
        for i in range(200, 260):
            idx.add_node(f"n{i}", data[i])
        idx.device_snapshot()  # prev, with post-repair shapes

        # targeted: free upper slots, insert until some are reused
        for r in list(idx._upper_slot.keys())[:3]:
            idx.delete_node(idx._names.name(r))
        freed = set(idx._freed_slots_pending)
        assert freed, "deletes freed no upper slots; tune the seed"
        reused = []
        for i in range(260, 340):
            idx.add_node(f"n{i}", data[i])
            row = idx._names.get(f"n{i}")
            if idx._upper_slot.get(row) in freed:
                reused.append((row, idx._upper_slot[row]))
        assert reused, "no freed upper slot was reused; tune the seed"

        deltas = []
        orig = S._delta_snapshot
        S._delta_snapshot = lambda *a: deltas.append(1) or orig(*a)
        try:
            snap = idx.device_snapshot()
        finally:
            S._delta_snapshot = orig
        assert deltas, "refresh took the full-rebuild path, not the delta"
        adj_up = np.asarray(snap.adj_up)
        nonempty = 0
        for row, slot in reused:
            if idx._native is not None:
                exported = idx._native.export_layer(
                    1, np.array([row], np.int32), 1, adj_up.shape[2]
                )
                host_nbrs = [int(x) for x in exported[0] if x >= 0]
            else:
                nl = idx._neighbors[row]
                host_nbrs = list(nl[1]) if nl and len(nl) > 1 else []
            nonempty += bool(host_nbrs)
            dev_nbrs = [int(x) for x in adj_up[0, slot] if x >= 0]
            assert sorted(dev_nbrs) == sorted(host_nbrs), (
                f"backend={backend} row={row} slot={slot}: "
                f"device {dev_nbrs} != host {host_nbrs}"
            )
        assert nonempty, "all reused rows had empty adjacency (vacuous)"


@pytest.mark.slow
def test_restore_then_continue_bulk_build(tmp_path, rng):
    """Staged builds: checkpoint mid-build, restore, keep bulk-building
    (benchmarks/million.py's loop), ending at full recall health."""
    import numpy as np
    from redis_hnsw_tpu import HNSWIndex, IndexConfig
    from redis_hnsw_tpu.models.flat import FlatIndex
    from redis_hnsw_tpu.utils.checkpoint import load_index, save_index
    from tests.test_core import graph_invariants

    n, dim, k = 800, 16, 5
    data = rng.standard_normal((n, dim)).astype(np.float32)
    names = [f"n{i}" for i in range(n)]
    idx = HNSWIndex(
        "st", IndexConfig(dim=dim, m=6, ef_construction=48, seed=9)
    )
    idx.add_batch(names[: n // 2], data[: n // 2], batch_size=128)
    p = str(tmp_path / "stage.npz")
    save_index(idx, p, compress=False)

    back = load_index(p)
    assert back.node_count == n // 2
    back.add_batch(names[n // 2 :], data[n // 2 :], batch_size=128)
    assert back.node_count == n
    graph_invariants(back)

    oracle = FlatIndex("o", IndexConfig(dim=dim))
    oracle.add_batch(names, data)
    queries = rng.standard_normal((48, dim)).astype(np.float32)
    truth = [
        {r.name for r in t} for t in oracle.search_batch(queries, k)
    ]
    res = back.search_batch(
        queries, k, ef_search=64, expand=4, engine="graph"
    )
    hits = sum(
        len({r.name for r in rr} & truth[b]) for b, rr in enumerate(res)
    )
    assert hits / (k * len(queries)) >= 0.9


@pytest.mark.slow
def test_autosave_crash_restore_continue(tmp_path, rng):
    """Incremental durability (VERDICT r1 item 6): autosave lands
    periodic atomic checkpoints during a bulk build; after a "crash"
    (the process state is simply dropped), the autosave restores to a
    consistent recent state, the build continues with the missing rows,
    and the final node set matches a straight-through build."""
    from tests.test_core import graph_invariants

    n, dim = 600, 12
    data = rng.standard_normal((n, dim)).astype(np.float32)
    names = [f"n{i}" for i in range(n)]
    p = str(tmp_path / "auto.npz")

    idx = HNSWIndex(
        "au", IndexConfig(dim=dim, m=6, ef_construction=48, seed=11)
    )
    idx.enable_autosave(p, every_ops=128)
    idx.add_batch(names[:500], data[:500], batch_size=128)
    # deletes count as mutations toward the autosave cadence too
    for i in range(10):
        idx.delete_node(f"n{i}")
    assert os.path.exists(p)
    del idx  # crash: everything since the last autosave is gone

    back = load_index(p)
    # the autosave is a consistent prefix: every present node has a
    # healthy graph, and at most every_ops mutations are missing
    graph_invariants(back)
    have = set(back.node_names())
    missing = [m for m in names if m not in have]
    assert len(missing) <= 500  # lost at most the tail
    back.add_batch(missing, data[[names.index(m) for m in missing]],
                   batch_size=128)
    for i in range(10):
        if f"n{i}" in back:
            back.delete_node(f"n{i}")
    graph_invariants(back)
    want = set(names) - {f"n{i}" for i in range(10)}
    assert set(back.node_names()) == want

    # autosave loss bound: a fresh build saves at least every every_ops
    idx2 = HNSWIndex(
        "au2", IndexConfig(dim=dim, m=6, ef_construction=48, seed=11)
    )
    p2 = str(tmp_path / "auto2.npz")
    idx2.enable_autosave(p2, every_ops=64)
    idx2.add_batch(names[:200], data[:200], batch_size=128)
    snap = load_index(p2)
    assert idx2.node_count - snap.node_count <= 128  # one wave behind


def test_flat_checkpoint_roundtrip(tmp_path, rng):
    """kind=flat checkpoints share the versioned envelope
    (kind="flat", vectors+valid instead of adjacency) and restore
    byte-identically through the same load path -- deletes (free-list
    holes), post-restore mutation, and hamming included."""
    from redis_hnsw_tpu.models.flat import FlatIndex

    c = HNSW()
    c.create_index("f", dim=16, kind="flat")
    data = rng.standard_normal((60, 16)).astype(np.float32)
    c.add_batch("f", [f"n{i}" for i in range(60)], data)
    for i in range(0, 60, 3):
        c.delete_node("f", f"n{i}")
    ref = c.search_batch("f", data[:8], k=5)
    p = str(tmp_path / "f.npz")
    c.save_index("f", p)
    c.delete_index("f")
    idx = c.restore_index(p)
    assert isinstance(idx, FlatIndex) and idx.node_count == 40
    got = c.search_batch("f", data[:8], k=5)
    for a, b in zip(ref, got):
        assert [(r.sim, r.name) for r in a] == [(r.sim, r.name) for r in b]
    # restored free list reuses holes; the new row is searchable
    c.add_node("f", "fresh", data[0])
    assert c.search_batch("f", data[:1], k=1)[0][0].name == "fresh"

    c.create_index("hf", dim=256, metric="hamming", kind="flat")
    hd = rng.integers(0, 2**32, (30, 8), dtype=np.uint32)
    c.add_batch("hf", [f"h{i}" for i in range(30)], hd)
    href = c.search_batch("hf", hd[:4], k=3)
    hp = str(tmp_path / "hf.npz")
    c.save_index("hf", hp)
    c.delete_index("hf")
    c.restore_index(hp)
    hgot = c.search_batch("hf", hd[:4], k=3)
    for a, b in zip(href, hgot):
        assert [(r.sim, r.name) for r in a] == [(r.sim, r.name) for r in b]
