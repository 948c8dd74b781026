"""Exact MXU scan engine (ops/scan.py) + auto routing tests."""

import numpy as np
import pytest

from redis_hnsw_tpu import HNSWIndex, IndexConfig
from redis_hnsw_tpu.models.flat import FlatIndex


def _build(rng, n=700, dim=24, metric="euclidean"):
    if metric == "hamming":
        data = rng.integers(0, 2**32, (n, dim // 32), dtype=np.uint32)
    else:
        data = rng.standard_normal((n, dim)).astype(np.float32)
    names = [f"n{i}" for i in range(n)]
    idx = HNSWIndex(
        "s", IndexConfig(dim=dim, m=8, ef_construction=48,
                         metric=metric, seed=5),
    )
    idx.add_batch(names, data, batch_size=256)
    oracle = FlatIndex("o", IndexConfig(dim=dim, metric=metric))
    oracle.add_batch(names, data)
    return idx, oracle, data, names


def test_scan_matches_oracle_euclidean(rng):
    idx, oracle, data, _ = _build(rng)
    queries = rng.standard_normal((32, 24)).astype(np.float32)
    got = idx.search_batch(queries, 10, engine="scan")
    want = oracle.search_batch(queries, 10)
    for b in range(len(queries)):
        assert [r.name for r in got[b]] == [r.name for r in want[b]]
        np.testing.assert_allclose(
            [r.sim for r in got[b]], [r.sim for r in want[b]], rtol=1e-5
        )
        sims = [r.sim for r in got[b]]
        assert sims == sorted(sims, reverse=True)


@pytest.mark.slow
def test_scan_matches_oracle_hamming(rng):
    """The int8 +-1 matmul formulation must reproduce popcount hamming
    EXACTLY: hamming(a, b) = (D - dot(pm1(a), pm1(b))) / 2."""
    idx, oracle, data, _ = _build(rng, dim=256, metric="hamming")
    queries = rng.integers(0, 2**32, (32, 8), dtype=np.uint32)
    got = idx.search_batch(queries, 10, engine="scan")
    want = oracle.search_batch(queries, 10)
    for b in range(len(queries)):
        # integer sims tie heavily; compare the (sim multiset, id set
        # per sim class) via the sorted (sim, name) pairs
        assert [(r.sim, r.name) for r in got[b]] == [
            (r.sim, r.name) for r in want[b]
        ]


@pytest.mark.slow
def test_scan_respects_deletes(rng):
    idx, _, data, names = _build(rng, n=300)
    for i in range(0, 300, 2):
        idx.delete_node(f"n{i}")
    res = idx.search_batch(data[:8], 5, engine="scan")
    surviving = {f"n{i}" for i in range(1, 300, 2)}
    for r in res:
        assert len(r) == 5
        assert all(item.name in surviving for item in r)
    # delete-then-search caches per epoch: another delete must refresh
    idx.delete_node("n1")
    res = idx.search_batch(data[1][None], 3, engine="scan")
    assert all(item.name != "n1" for item in res[0])


@pytest.mark.slow
def test_scan_k_exceeds_live_rows(rng):
    idx, _, data, _ = _build(rng, n=12)
    res = idx.search_batch(data[:2], 40, engine="scan")
    for r in res:
        assert len(r) == 12


def test_auto_routes_small_to_scan_and_exact(rng):
    """auto on a small index = exact results (scan), identical to the
    flat oracle even where the graph engine would miss."""
    idx, oracle, data, _ = _build(rng)
    queries = rng.standard_normal((16, 24)).astype(np.float32)
    got = idx.search_batch(queries, 10)  # default engine="auto"
    want = oracle.search_batch(queries, 10)
    for b in range(len(queries)):
        assert {r.name for r in got[b]} == {r.name for r in want[b]}


def test_engine_arg_validated(rng):
    idx, _, data, _ = _build(rng, n=20)
    with pytest.raises(ValueError, match="unknown search engine"):
        idx.search_batch(data[:2], 3, engine="warp")


def test_columnar_reply(rng):
    idx, oracle, data, _ = _build(rng, n=100)
    queries = rng.standard_normal((8, 24)).astype(np.float32)
    names, sims = idx.search_batch(queries, 5, reply="columnar")
    assert names.shape == (8, 5) and sims.shape == (8, 5)
    want = oracle.search_batch(queries, 5)
    for b in range(8):
        assert list(names[b]) == [r.name for r in want[b]]
        np.testing.assert_allclose(
            sims[b], [r.sim for r in want[b]], rtol=1e-5
        )
    # invalid slots carry None / -inf (k > live rows; k clamps to the
    # padded table width)
    names, sims = idx.search_batch(queries[:2], 200, reply="columnar")
    k_eff = names.shape[1]
    assert k_eff >= 100
    assert (names[0] == None).sum() == k_eff - 100  # noqa: E711
    assert np.isneginf(sims[0]).sum() == k_eff - 100
    assert set(names[0][:100]) == {f"n{i}" for i in range(100)}
    # empty index
    e = HNSWIndex("e", IndexConfig(dim=24, m=4, seed=0))
    names, sims = e.search_batch(queries[:2], 3, reply="columnar")
    assert names.shape == (2, 3) and (names == None).all()  # noqa: E711
    with pytest.raises(ValueError, match="unknown reply mode"):
        idx.search_batch(queries, 5, reply="rows")


def test_hamming_packed_reply_roundtrip(rng):
    """The one-word hamming reply (dist << id_bits | id) must decode to
    exactly the generic reply's results."""
    idx, oracle, data, _ = _build(rng, dim=256, metric="hamming")
    queries = rng.integers(0, 2**32, (16, 8), dtype=np.uint32)
    got = idx.search_batch(queries, 10, engine="scan")
    want = oracle.search_batch(queries, 10)
    for b in range(16):
        assert [(r.sim, r.name) for r in got[b]] == [
            (r.sim, r.name) for r in want[b]
        ]
    # with deletes: -1/-inf slots decode safely
    for i in range(0, 700, 3):
        idx.delete_node(f"n{i}")
    got = idx.search_batch(queries[:4], 10, engine="scan")
    for rr in got:
        assert all("n" in r.name for r in rr)
        assert all(int(r.name[1:]) % 3 != 0 for r in rr)


def test_columnar_reply_graph_engine(rng):
    """Columnar replies work for the graph engine too (not just scan)."""
    idx, oracle, data, _ = _build(rng, n=400)
    queries = rng.standard_normal((8, 24)).astype(np.float32)
    names, sims = idx.search_batch(
        queries, 5, ef_search=64, expand=8, iters=12,
        engine="graph", reply="columnar",
    )
    objs = idx.search_batch(
        queries, 5, ef_search=64, expand=8, iters=12, engine="graph",
    )
    assert names.shape == (8, 5)
    for b in range(8):
        assert list(names[b]) == [r.name for r in objs[b]]
        np.testing.assert_allclose(
            sims[b], [r.sim for r in objs[b]], rtol=1e-6
        )


def test_scan_after_checkpoint_restore(rng, tmp_path):
    """Restore -> scan engine: the per-epoch scan state rebuilds from
    the restored snapshot (no stale caches)."""
    from redis_hnsw_tpu.utils.checkpoint import load_index, save_index

    idx, oracle, data, _ = _build(rng, n=200)
    p = str(tmp_path / "s.npz")
    save_index(idx, p)
    back = load_index(p)
    queries = rng.standard_normal((8, 24)).astype(np.float32)
    got = back.search_batch(queries, 5, engine="scan")
    want = oracle.search_batch(queries, 5)
    for b in range(8):
        assert [r.name for r in got[b]] == [r.name for r in want[b]]


@pytest.mark.slow
def test_scan_approx_mode(rng):
    """scan-approx: near-exact results (here, small N: usually exactly
    equal), exact reported sims, both metrics."""
    idx, oracle, data, _ = _build(rng, n=600)
    queries = rng.standard_normal((32, 24)).astype(np.float32)
    got = idx.search_batch(queries, 10, engine="scan-approx")
    want = oracle.search_batch(queries, 10)
    hits = sum(
        len({r.name for r in got[b]} & {r.name for r in want[b]})
        for b in range(32)
    )
    assert hits / 320 >= 0.98
    # sims of returned results are exact
    for b in range(32):
        for r in got[b]:
            row = oracle._names.get(r.name)
            exact = -float(np.sum(
                (queries[b].astype(np.float64)
                 - data[row].astype(np.float64)) ** 2))
            assert abs(r.sim - exact) < 1e-3 * (1 + abs(exact))

    ih, oh, dh, _ = _build(rng, dim=256, metric="hamming")
    qh = rng.integers(0, 2**32, (16, 8), dtype=np.uint32)
    got = ih.search_batch(qh, 10, engine="scan-approx")
    want = oh.search_batch(qh, 10)
    hits = sum(
        len({r.name for r in got[b]} & {r.name for r in want[b]})
        for b in range(16)
    )
    assert hits / 160 >= 0.98


def test_scan_bf16_tier(rng, monkeypatch):
    """REDIS_HNSW_TPU_SCAN_DTYPE=bf16: selection rides a bfloat16 copy
    of the table, reported sims stay f32-exact (rescored from the f32
    snapshot), and near-duplicate rows that bf16 cannot separate are
    still ranked correctly by the exact rescore."""
    idx, oracle, data, _ = _build(rng, n=500)
    queries = rng.standard_normal((24, 24)).astype(np.float32)
    want = oracle.search_batch(queries, 10)
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_DTYPE", "bf16")
    got = idx.search_batch(queries, 10, engine="scan")
    hits = sum(
        len({r.name for r in got[b]} & {r.name for r in want[b]})
        for b in range(24)
    )
    assert hits / 240 >= 0.97  # bf16 selection: near-exact
    for b in range(24):
        sims = [r.sim for r in got[b]]
        assert sims == sorted(sims, reverse=True)
        for r in got[b]:
            row = oracle._names.get(r.name)
            exact = -float(np.sum(
                (queries[b].astype(np.float64)
                 - data[row].astype(np.float64)) ** 2))
            assert abs(r.sim - exact) < 1e-4 * (1 + abs(exact))
    # tier switch invalidates the per-epoch cache (same epoch, new dt)
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_DTYPE", "f32")
    got32 = idx.search_batch(queries, 10, engine="scan")
    for b in range(24):
        assert [r.name for r in got32[b]] == [r.name for r in want[b]]
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_DTYPE", "tf32")
    with pytest.raises(ValueError, match="SCAN_DTYPE"):
        idx.search_batch(queries, 10, engine="scan")


def test_scan_int8_tier(rng, monkeypatch):
    """REDIS_HNSW_TPU_SCAN_DTYPE=int8: selection rides a per-row
    symmetrically quantized int8 copy (quarter the f32 bytes -- the
    capacity tier), reported sims stay f32-exact (rescored from the
    f32 snapshot), on both the HNSW scan engine and the flat index."""
    from redis_hnsw_tpu.models.flat import FlatIndex

    idx, oracle, data, _ = _build(rng, n=500)
    queries = rng.standard_normal((24, 24)).astype(np.float32)
    want = oracle.search_batch(queries, 10)
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_DTYPE", "int8")
    for got in (
        idx.search_batch(queries, 10, engine="scan"),
        idx.search_batch(queries, 10, engine="scan-approx"),
    ):
        hits = sum(
            len({r.name for r in got[b]} & {r.name for r in want[b]})
            for b in range(24)
        )
        assert hits / 240 >= 0.95  # int8 selection: near-exact
        for b in range(24):
            sims = [r.sim for r in got[b]]
            assert sims == sorted(sims, reverse=True)
            for r in got[b]:
                row = oracle._names.get(r.name)
                exact = -float(np.sum(
                    (queries[b].astype(np.float64)
                     - data[row].astype(np.float64)) ** 2))
                assert abs(r.sim - exact) < 1e-4 * (1 + abs(exact))
    # flat kind: int8 is the RESIDENT mode -- the device table is the
    # int8 copy (quarter bytes; capacity tier), rescore runs host-side
    flat = FlatIndex("f8", idx.config)
    flat.add_batch([f"n{i}" for i in range(500)], data)
    for fgot in (
        flat.search_batch(queries, 10),
        flat.search_batch(queries, 10, approx=True),
    ):
        hits = sum(
            len({r.name for r in fgot[b]} & {r.name for r in want[b]})
            for b in range(24)
        )
        assert hits / 240 >= 0.95
        for b in range(24):
            sims = [r.sim for r in fgot[b]]
            assert sims == sorted(sims, reverse=True)
            for r in fgot[b]:
                row = oracle._names.get(r.name)
                exact = -float(np.sum(
                    (queries[b].astype(np.float64)
                     - data[row].astype(np.float64)) ** 2))
                assert abs(r.sim - exact) < 1e-4 * (1 + abs(exact))
    import jax.numpy as jnp

    table = flat._device()[0]
    assert table.dtype == jnp.int8
    # deletes stay masked through the resident path
    flat.delete_node("n0")
    fgot = flat.search_batch(data[:4], 3)
    assert all("n0" not in {r.name for r in rr} for rr in fgot)


def test_flat_approx_and_device_queries(rng):
    """FlatIndex: approx=True opt-in tier + device-resident query
    batches (no host round-trip) both reproduce the exact oracle at
    small N; the default path stays exactly exact."""
    import jax.numpy as jnp

    idx, oracle, data, _ = _build(rng, n=400)
    queries = rng.standard_normal((16, 24)).astype(np.float32)
    want = oracle.search_batch(queries, 10)
    got_dev = oracle.search_batch(jnp.asarray(queries), 10)
    for b in range(16):
        assert [r.name for r in got_dev[b]] == [r.name for r in want[b]]
    got_ap = oracle.search_batch(queries, 10, approx=True)
    hits = sum(
        len({r.name for r in got_ap[b]} & {r.name for r in want[b]})
        for b in range(16)
    )
    assert hits / 160 >= 0.98


def test_scan_chunk_loop_lax_scan(rng):
    """At >= SCAN_LOOP_MIN_CHUNKS full chunks the chunk loop compiles
    to one lax.scan (program size constant in N -- the capacity-scale
    path); results must be IDENTICAL to the unrolled form, on the
    exact, approx, int8-tier and hamming formulations, including a
    non-multiple remainder chunk and dead rows."""
    import jax.numpy as jnp

    import redis_hnsw_tpu.ops.scan as S

    N, D, B, K = 1100, 32, 16, 10
    vecs = rng.standard_normal((N, D)).astype(np.float32)
    sqn = np.einsum("nd,nd->n", vecs, vecs).astype(np.float32)
    live = np.ones(N, bool)
    live[[17, 512, 1099]] = False
    qs = rng.standard_normal((B, D)).astype(np.float32)
    args = (jnp.asarray(vecs), jnp.asarray(sqn), jnp.asarray(live),
            jnp.asarray(qs))

    def run(approx=False):
        ids, sims = S.scan_topk_exact_l2(*args, k=K, approx=approx)
        return np.asarray(ids), np.asarray(sims)

    ref_ids, ref_sims = run()  # N << CHUNK_N: single unrolled chunk
    old = S.CHUNK_N
    S.CHUNK_N = 128  # 8 full chunks + remainder 76 -> lax.scan path
    S.scan_topk.clear_cache()
    S.scan_topk_exact_l2.clear_cache()
    try:
        got_ids, got_sims = run()
        assert np.array_equal(ref_ids, got_ids)
        assert np.array_equal(ref_sims, got_sims)
        ids_a, _ = run(approx=True)
        ov = np.mean([
            len(set(map(int, a)) & set(map(int, b))) / K
            for a, b in zip(ids_a, ref_ids)
        ])
        assert ov >= 0.99
        q8, sc = S._to_int8(jnp.asarray(vecs))
        ids8, _ = S.scan_topk(
            q8, args[1], args[2], args[3], k=K, metric="euclidean",
            tscale=sc,
        )
        ov8 = np.mean([
            len(set(map(int, a)) & set(map(int, b))) / K
            for a, b in zip(np.asarray(ids8), ref_ids)
        ])
        assert ov8 >= 0.9
        pk = rng.integers(0, 2**32, (N, 8)).astype(np.uint32)
        pm = S._build_pm1(jnp.asarray(pk))
        idh, simh = S.scan_topk(
            pm, jnp.zeros(N, np.float32), jnp.asarray(np.ones(N, bool)),
            jnp.asarray(pk[:B]), k=5, metric="hamming",
        )
        idh, simh = np.asarray(idh), np.asarray(simh)
        assert all(
            idh[i, 0] == i and simh[i, 0] == 0 for i in range(B)
        )
    finally:
        S.CHUNK_N = old
        S.scan_topk.clear_cache()
        S.scan_topk_exact_l2.clear_cache()


def test_scan_certified_matches_exact(rng, monkeypatch):
    """Certified-exact select (REDIS_HNSW_TPU_SCAN_CERT=1): results are
    byte-identical to the exact top_k path -- certified queries by the
    counting proof, uncertified ones via the exact fallback rerun --
    and the stats counters record the batch."""
    import redis_hnsw_tpu.ops.scan as S

    idx, oracle, data, _ = _build(rng, n=900)
    queries = rng.standard_normal((32, 24)).astype(np.float32)
    want = idx.search_batch(queries, 10, engine="scan")  # auto: cert off at 900 rows
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    before = dict(S.CERT_STATS)
    got = idx.search_batch(queries, 10, engine="scan")
    assert S.CERT_STATS["batches"] == before["batches"] + 1
    assert S.CERT_STATS["queries"] == before["queries"] + 32
    for b in range(32):
        assert [(r.sim, r.name) for r in got[b]] == [
            (r.sim, r.name) for r in want[b]
        ]
    # recall_target=1.0 rides the same certified path
    got_rt = idx.search_batch(queries, 10, recall_target=1.0)
    for b in range(32):
        assert [r.name for r in got_rt[b]] == [r.name for r in want[b]]
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "2")
    with pytest.raises(ValueError, match="SCAN_CERT"):
        idx.search_batch(queries, 10, engine="scan")


def test_scan_certified_fused_matches_exact(rng, monkeypatch):
    """REDIS_HNSW_TPU_CERT_FUSE=1 routes through the one-program
    certified scan (_scan_certified_fused); results stay byte-identical
    to the exact path and to the two-program split. (On TPU the fused
    form engages automatically with the count kernel; this pins the
    fused trace's semantics with the XLA count pass at small N, where
    the r3 OOM condition does not apply.)"""
    import redis_hnsw_tpu.ops.scan as S

    idx, oracle, data, _ = _build(rng, n=700)
    queries = rng.standard_normal((16, 24)).astype(np.float32)
    want = idx.search_batch(queries, 10, engine="scan")
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    monkeypatch.setenv("REDIS_HNSW_TPU_CERT_FUSE", "1")
    S.scan_certified_l2.clear_cache()
    try:
        got = idx.search_batch(queries, 10, engine="scan")
    finally:
        S.scan_certified_l2.clear_cache()
    for b in range(16):
        assert [(r.sim, r.name) for r in got[b]] == [
            (r.sim, r.name) for r in want[b]
        ]
    monkeypatch.setenv("REDIS_HNSW_TPU_CERT_FUSE", "2")
    with pytest.raises(ValueError, match="CERT_FUSE"):
        idx.search_batch(queries, 10, engine="scan")


def test_scan_certified_tie_fallback(rng, monkeypatch):
    """Adversarial ties (every row duplicated 8x): the tie-class count
    in the certificate must refuse to certify truncated tie classes and
    fall back to the exact path -- results identical to exact top_k
    (same tie members, lowest ids)."""
    import redis_hnsw_tpu.ops.scan as S

    base = rng.standard_normal((60, 24)).astype(np.float32)
    data = np.repeat(base, 8, axis=0)
    names = [f"n{i}" for i in range(480)]
    idx = HNSWIndex(
        "ct", IndexConfig(dim=24, m=8, ef_construction=48, seed=5)
    )
    idx.add_batch(names, data, batch_size=256)
    queries = rng.standard_normal((16, 24)).astype(np.float32)
    want = idx.search_batch(queries, 10, engine="scan")
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    before = S.CERT_STATS["fallback_queries"]
    got = idx.search_batch(queries, 10, engine="scan")
    # top-10 always truncates an 8-member tie class -> every query
    # must have been re-served by the exact fallback
    assert S.CERT_STATS["fallback_queries"] >= before + 16
    for b in range(16):
        assert [(r.sim, r.name) for r in got[b]] == [
            (r.sim, r.name) for r in want[b]
        ]


def test_scan_certified_deletes_and_edges(rng, monkeypatch):
    """Certified path: deletes stay masked; k > live rows certifies
    trivially (t = -inf); the flat index rides the same path; the
    chunked lax.scan count pass is byte-identical to unrolled."""
    import redis_hnsw_tpu.ops.scan as S

    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    idx, oracle, data, names = _build(rng, n=300)
    for i in range(0, 300, 2):
        idx.delete_node(f"n{i}")
    res = idx.search_batch(data[:8], 5, engine="scan")
    surviving = {f"n{i}" for i in range(1, 300, 2)}
    for r in res:
        assert len(r) == 5
        assert all(item.name in surviving for item in r)
    small, _, sdata, _ = _build(rng, n=12)
    for r in small.search_batch(sdata[:2], 40, engine="scan"):
        assert len(r) == 12
    queries = rng.standard_normal((8, 24)).astype(np.float32)
    want = oracle.search_batch(queries, 10)
    got = oracle.search_batch(queries, 10)  # flat: certified path
    for b in range(8):
        assert [(r.sim, r.name) for r in got[b]] == [
            (r.sim, r.name) for r in want[b]
        ]
    # capacity-scale shape: the count pass lowers to one lax.scan
    old = S.CHUNK_N
    S.CHUNK_N = 128
    for f in (S.scan_topk, S.scan_topk_exact_l2, S.scan_certified_l2):
        f.clear_cache()
    try:
        got2 = oracle.search_batch(queries, 10)
        for b in range(8):
            assert [(r.sim, r.name) for r in got2[b]] == [
                (r.sim, r.name) for r in want[b]
            ]
    finally:
        S.CHUNK_N = old
        for f in (S.scan_topk, S.scan_topk_exact_l2,
                  S.scan_certified_l2):
            f.clear_cache()


def test_recall_target_routing(rng):
    """recall_target is a guarantee: above the approx tier's measured
    floor "auto" pins the exact scan (even past the auto crossover);
    at/below the floor it rides the tier; the graph engine refuses it;
    explicit engine choices are honored."""
    from redis_hnsw_tpu.ops.search import (
        APPROX_TIER_FLOOR,
        resolve_engine,
    )

    assert resolve_engine("auto", None) == "auto"
    assert resolve_engine("auto", 1.0) == "scan"
    assert resolve_engine("auto", APPROX_TIER_FLOOR + 1e-4) == "scan"
    assert resolve_engine("auto", APPROX_TIER_FLOOR) == "scan-approx"
    assert resolve_engine("auto", 0.95) == "scan-approx"
    assert resolve_engine("scan", 0.5) == "scan"  # explicit wins
    assert resolve_engine("scan-approx", 1.0) == "scan-approx"
    with pytest.raises(ValueError, match="tune"):
        resolve_engine("graph", 0.95)
    with pytest.raises(ValueError, match="in \\(0, 1\\]"):
        resolve_engine("auto", 1.5)
    with pytest.raises(ValueError, match="unknown search engine"):
        resolve_engine("warp", 0.95)

    idx, oracle, data, _ = _build(rng, n=400)
    queries = rng.standard_normal((16, 24)).astype(np.float32)
    want = oracle.search_batch(queries, 10)
    # exact guarantee: identical to the oracle, and pinned to the scan
    # even when the crossover would hand "auto" to the graph beam
    import redis_hnsw_tpu.ops.search as S

    old = S.SCAN_MAX_ROWS
    S.SCAN_MAX_ROWS = {"euclidean": 0, "hamming": 0}
    try:
        got = idx.search_batch(queries, 10, recall_target=1.0)
    finally:
        S.SCAN_MAX_ROWS = old
    for b in range(len(queries)):
        assert [r.name for r in got[b]] == [r.name for r in want[b]]
    # tier route returns high-recall results end-to-end
    got = idx.search_batch(queries, 10, recall_target=0.95)
    hits = sum(
        len({r.name for r in got[b]} & {r.name for r in want[b]})
        for b in range(len(queries))
    )
    assert hits / 160 >= 0.95
    with pytest.raises(ValueError, match="tune"):
        idx.search_batch(queries, 10, engine="graph", recall_target=0.9)


def test_recall_target_flat_and_api(rng):
    """recall_target reaches FlatIndex and the client API unchanged."""
    from redis_hnsw_tpu import HNSW

    data = rng.standard_normal((200, 16)).astype(np.float32)
    c = HNSW()
    c.create_index("f", dim=16, kind="flat")
    c.add_batch("f", [f"n{i}" for i in range(200)], data)
    res = c.search_batch("f", data[:8], k=3, recall_target=0.95)
    assert [r[0].name for r in res] == [f"n{i}" for i in range(8)]
    c.create_index("h", dim=16, m=8)
    c.add_batch("h", [f"m{i}" for i in range(200)], data)
    res = c.search_batch("h", data[:8], k=3, recall_target=1.0)
    assert [r[0].name for r in res] == [f"m{i}" for i in range(8)]


def test_ids_reply_mode(rng, monkeypatch):
    """REDIS_HNSW_TPU_REPLY=ids: euclidean scan replies transfer only
    the id block; sims are recomputed host-side in exact direct form.
    Same names in the same order as the full reply, sims equal to f32
    rounding, -inf slots preserved; works with numpy queries, with a
    host_qs mirror for device-resident queries, through the certified
    path, and on the approx tier."""
    import jax.numpy as jnp

    import redis_hnsw_tpu.ops.scan as S

    idx, oracle, data, _ = _build(rng, n=400)
    queries = rng.standard_normal((16, 24)).astype(np.float32)
    want = idx.search_batch(queries, 10, engine="scan")
    monkeypatch.setenv("REDIS_HNSW_TPU_REPLY", "ids-force")
    got = idx.search_batch(queries, 10, engine="scan")
    for b in range(16):
        assert [r.name for r in got[b]] == [r.name for r in want[b]]
        np.testing.assert_allclose(
            [r.sim for r in got[b]], [r.sim for r in want[b]],
            rtol=1e-6, atol=1e-5,
        )
    # device-resident queries + host mirror
    qd = jnp.asarray(queries)
    got2 = idx.search_batch(qd, 10, engine="scan", host_qs=queries)
    for b in range(16):
        assert [r.name for r in got2[b]] == [r.name for r in want[b]]
    # columnar reply shape unchanged
    names, sims = idx.search_batch(
        queries, 10, engine="scan", reply="columnar"
    )
    assert names.shape == sims.shape == (16, 10)
    # k > live rows: -inf padding slots survive the host rescore
    small, _, sdata, _ = _build(rng, n=6)
    rows = small.search_batch(sdata[:2], 9, engine="scan")
    assert all(len(r) == 6 for r in rows)
    # certified + ids compose
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    got3 = idx.search_batch(queries, 10, engine="scan")
    for b in range(16):
        assert [r.name for r in got3[b]] == [r.name for r in want[b]]
    monkeypatch.delenv("REDIS_HNSW_TPU_SCAN_CERT")
    # approx tier rides it too (names may differ at the floor; sims of
    # shared names must match the exact oracle's)
    gotap = idx.search_batch(queries, 10, engine="scan-approx")
    by_name = [
        {r.name: r.sim for r in want[b]} for b in range(16)
    ]
    for b in range(16):
        for r in gotap[b]:
            if r.name in by_name[b]:
                assert abs(r.sim - by_name[b][r.name]) <= 1e-5 * (
                    1 + abs(by_name[b][r.name])
                )
    monkeypatch.setenv("REDIS_HNSW_TPU_REPLY", "nope")
    with pytest.raises(ValueError, match="REPLY"):
        idx.search_batch(queries, 10, engine="scan")


def test_ids_reply_graph_engine(rng, monkeypatch):
    """REDIS_HNSW_TPU_REPLY=ids applies to the graph beam too: ids-only
    transfer, host exact rescore, device beam order preserved."""
    idx, oracle, data, _ = _build(rng, n=500)
    queries = rng.standard_normal((16, 24)).astype(np.float32)
    want = idx.search_batch(queries, 10, engine="graph", ef_search=96)
    monkeypatch.setenv("REDIS_HNSW_TPU_REPLY", "ids-force")
    got = idx.search_batch(queries, 10, engine="graph", ef_search=96)
    for b in range(16):
        assert [r.name for r in got[b]] == [r.name for r in want[b]]
        np.testing.assert_allclose(
            [r.sim for r in got[b]], [r.sim for r in want[b]],
            rtol=1e-6, atol=1e-5,
        )
    # k > live rows: short rows keep identical shape to the full reply
    small, _, sdata, _ = _build(rng, n=7)
    a = small.search_batch(sdata[:2], 12, engine="graph", ef_search=32)
    monkeypatch.delenv("REDIS_HNSW_TPU_REPLY")
    b = small.search_batch(sdata[:2], 12, engine="graph", ef_search=32)
    assert [[r.name for r in row] for row in a] == [
        [r.name for r in row] for row in b
    ]


def test_scan_certified_short_selection_not_certified(rng, monkeypatch):
    """Soundness regression: on real TPUs approx_max_k is a bin
    reduction and can return FEWER than k finite candidates while live
    rows were missed (sparse-live capacity tables). The certificate
    must not certify through the empty-k-th-slot (t == -inf) case
    unless every live row really was selected: simulate the miss by
    truncating the selection, and require the exact fallback to repair
    every query."""
    import redis_hnsw_tpu.ops.scan as S

    idx, oracle, data, _ = _build(rng, n=300)
    queries = rng.standard_normal((8, 24)).astype(np.float32)
    want = idx.search_batch(queries, 10, engine="scan")

    real_scan_topk = S.scan_topk

    def truncating(table, sqn, live, qs, *, k, metric, approx=False,
                   **kw):
        ids, sims = real_scan_topk(
            table, sqn, live, qs, k=k, metric=metric, approx=approx,
            **kw,
        )
        if approx:  # the certified select: drop the tail, like a
            ids = ids.at[:, k - 4:].set(-1)     # TPU bin-miss would
            sims = sims.at[:, k - 4:].set(S.NEG_INF)
        return ids, sims

    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    monkeypatch.setattr(S, "scan_topk", truncating)
    S.scan_certified_l2.clear_cache()
    before = S.CERT_STATS["fallback_queries"]
    try:
        got = idx.search_batch(queries, 10, engine="scan")
    finally:
        S.scan_certified_l2.clear_cache()
    # every query lost real candidates -> none may certify
    assert S.CERT_STATS["fallback_queries"] >= before + 8
    for b in range(8):
        assert [(r.sim, r.name) for r in got[b]] == [
            (r.sim, r.name) for r in want[b]
        ]


def test_scan_certified_audit(rng, monkeypatch):
    """Every CERT_AUDIT_EVERY-th certified batch is re-served through
    the exact path and byte-compared (drift paranoia -> a counted
    signal instead of silent wrongness)."""
    import redis_hnsw_tpu.ops.scan as S

    idx, oracle, data, _ = _build(rng, n=400)
    queries = rng.standard_normal((8, 24)).astype(np.float32)
    want = idx.search_batch(queries, 10, engine="scan")
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    monkeypatch.setattr(S, "CERT_AUDIT_EVERY", 1)
    audits = S.CERT_STATS.get("audits", 0)
    got = idx.search_batch(queries, 10, engine="scan")
    assert S.CERT_STATS["audits"] == audits + 1
    assert S.CERT_STATS.get("audit_mismatches", 0) == 0
    for b in range(8):
        assert [(r.sim, r.name) for r in got[b]] == [
            (r.sim, r.name) for r in want[b]
        ]


def test_cert_enabled_auto_threshold(monkeypatch):
    """cert_enabled: auto engages exactly at CERT_MIN_ROWS and only up
    to CERT_MAX_DIM (the count pass's extra matmul is D-scaled while
    the top_k it saves is not -- measured a LOSS at 960d even at 1M,
    artifacts/flat_highd.json); 0/1 force regardless."""
    import redis_hnsw_tpu.ops.scan as S

    monkeypatch.delenv("REDIS_HNSW_TPU_SCAN_CERT", raising=False)
    monkeypatch.delenv("REDIS_HNSW_TPU_SCAN_CERT_MAX_DIM", raising=False)
    assert not S.cert_enabled(S.CERT_MIN_ROWS - 1)
    assert S.cert_enabled(S.CERT_MIN_ROWS)
    # dim gate: 128d engages, 960d does not, dim<=0 skips the gate
    assert S.cert_enabled(S.CERT_MIN_ROWS, 128)
    assert S.cert_enabled(S.CERT_MIN_ROWS, S.CERT_MAX_DIM)
    assert not S.cert_enabled(S.CERT_MIN_ROWS, 960)
    assert S.cert_enabled(S.CERT_MIN_ROWS, 0)
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT_MAX_DIM", "1024")
    assert S.cert_enabled(S.CERT_MIN_ROWS, 960)
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT_MAX_DIM", "junk")
    assert not S.cert_enabled(S.CERT_MIN_ROWS, 960)
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "0")
    assert not S.cert_enabled(1 << 30)
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    assert S.cert_enabled(8, 4096)


def test_ids_reply_guard(rng, monkeypatch, caplog):
    """reply_ids_engaged: REPLY=ids is GUARDED -- it auto-disables
    (with a logged reason) when the calibrated host-rescore estimate
    exceeds the estimated bytes saved, and the verdict is
    dim-dependent (the r3 pathology: ids mode cost 100x at 960d).
    ids-force bypasses the guard; full never engages."""
    import logging

    import redis_hnsw_tpu.ops.scan as S

    monkeypatch.delenv("REDIS_HNSW_TPU_REPLY", raising=False)
    assert S.reply_ids_engaged(128) is False
    monkeypatch.setenv("REDIS_HNSW_TPU_REPLY", "ids-force")
    assert S.reply_ids_engaged(960) is True  # no calibration needed
    monkeypatch.setenv("REDIS_HNSW_TPU_REPLY", "bogus")
    with pytest.raises(ValueError, match="REPLY"):
        S.reply_ids_engaged(128)

    monkeypatch.setenv("REDIS_HNSW_TPU_REPLY", "ids")
    # injected calibration: 1us/byte link, 10ns/elem host rescore
    # -> engage iff 4 * 1e-6 > dim * 1e-8, i.e. dim < 400
    monkeypatch.setattr(S, "_IDS_GUARD", {"cal": (1e-6, 1e-8)})
    assert S.reply_ids_engaged(128) is True
    with caplog.at_level(logging.WARNING, "redis_hnsw_tpu"):
        assert S.reply_ids_engaged(960) is False
    assert "auto-disabled at dim=960" in caplog.text
    assert "ids-force" in caplog.text
    # verdicts cache per dim
    assert S._IDS_GUARD[128] is True and S._IDS_GUARD[960] is False

    # latency-bound link (zero marginal D2H): always declines, and the
    # ids path is genuinely not taken end-to-end
    monkeypatch.setattr(S, "_IDS_GUARD", {"cal": (0.0, 1e-8)})
    assert S.reply_ids_engaged(2) is False

    def boom(*a, **kw):  # the ids path would call this
        raise AssertionError("ids path taken despite guard")

    monkeypatch.setattr(S, "host_exact_sims", boom)
    idx, _, data, _ = _build(rng, n=64)
    res = idx.search_batch(data[:4], 3, engine="scan")
    assert [r.name for r in res[0]][0] == "n0"


def test_pipelined_multichunk_matches_serial(rng, monkeypatch):
    """The pipelined chunk loop (REDIS_HNSW_TPU_PIPELINE in-flight
    dispatches, ops/search.py) must return byte-identical replies to
    the serialized loop (depth 0) on every engine, including an odd
    tail chunk. MAX_LANES is shrunk so a small query set spans many
    chunks."""
    import redis_hnsw_tpu.ops.search as SE

    idx, oracle, data, _ = _build(rng, n=500)
    monkeypatch.setattr(SE, "MAX_LANES", 64)
    queries = rng.standard_normal((210, 24)).astype(np.float32)  # 3 full + 1 odd chunk
    for engine in ("scan", "scan-approx", "graph"):
        monkeypatch.setenv("REDIS_HNSW_TPU_PIPELINE", "3")
        n_pipe, s_pipe = idx.search_batch(
            queries, 10, engine=engine, reply="columnar"
        )
        monkeypatch.setenv("REDIS_HNSW_TPU_PIPELINE", "0")
        n_ser, s_ser = idx.search_batch(
            queries, 10, engine=engine, reply="columnar"
        )
        assert (n_pipe == n_ser).all(), engine
        assert np.array_equal(s_pipe, s_ser), engine
    # exact-scan replies also match the oracle
    monkeypatch.setenv("REDIS_HNSW_TPU_PIPELINE", "2")
    got = idx.search_batch(queries, 10, engine="scan")
    want = oracle.search_batch(queries, 10)
    for b in range(len(queries)):
        assert [(r.sim, r.name) for r in got[b]] == [
            (r.sim, r.name) for r in want[b]
        ]


def test_pipelined_certified_with_fallback(rng, monkeypatch):
    """Certified scan under the pipelined loop: adversarial ties force
    per-batch exact fallbacks INSIDE finish() while later batches are
    already dispatched -- results must stay byte-identical to the
    exact path, and CERT_STATS must count every chunk."""
    import redis_hnsw_tpu.ops.scan as S
    import redis_hnsw_tpu.ops.search as SE

    base = rng.standard_normal((40, 24)).astype(np.float32)
    data = np.repeat(base, 8, axis=0)  # heavy tie classes
    names = [f"n{i}" for i in range(len(data))]
    idx = HNSWIndex(
        "p", IndexConfig(dim=24, m=8, ef_construction=48, seed=5)
    )
    idx.add_batch(names, data, batch_size=256)
    queries = np.repeat(base[:10], 13, axis=0)  # 130 tie-heavy queries
    want = idx.search_batch(queries, 12, engine="scan", reply="columnar")
    monkeypatch.setattr(SE, "MAX_LANES", 32)
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    monkeypatch.setenv("REDIS_HNSW_TPU_PIPELINE", "4")
    before = dict(S.CERT_STATS)
    got = idx.search_batch(queries, 12, engine="scan", reply="columnar")
    assert S.CERT_STATS["batches"] == before["batches"] + 5  # ceil(130/32)
    assert S.CERT_STATS["queries"] == before["queries"] + 130
    assert (got[0] == want[0]).all()
    assert np.array_equal(got[1], want[1])


def test_pipeline_depth_env(monkeypatch):
    from redis_hnsw_tpu.ops.scan import pipeline_depth

    monkeypatch.delenv("REDIS_HNSW_TPU_PIPELINE", raising=False)
    assert pipeline_depth() == 2
    monkeypatch.setenv("REDIS_HNSW_TPU_PIPELINE", "0")
    assert pipeline_depth() == 0
    monkeypatch.setenv("REDIS_HNSW_TPU_PIPELINE", "-3")
    assert pipeline_depth() == 0
    monkeypatch.setenv("REDIS_HNSW_TPU_PIPELINE", "7")
    assert pipeline_depth() == 7
    # empty string (shell-style unset) falls back to the default
    monkeypatch.setenv("REDIS_HNSW_TPU_PIPELINE", "")
    assert pipeline_depth() == 2


def test_cert_rerun_sink_coalesces(rng, monkeypatch):
    """With the pipelined loop, per-chunk certified fallbacks must
    coalesce into ONE exact rerun program (CertRerunSink) instead of
    one per chunk, and the spliced results must stay byte-identical
    to the exact path. Spurious uncertified verdicts are injected so
    every chunk has a (correct) selection that fails its proof."""
    import redis_hnsw_tpu.ops.scan as S
    import redis_hnsw_tpu.ops.search as SE

    idx, oracle, data, _ = _build(rng, n=400)
    queries = rng.standard_normal((128, 24)).astype(np.float32)
    want = idx.search_batch(queries, 5, engine="scan", reply="columnar")
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    monkeypatch.setattr(SE, "MAX_LANES", 32)
    monkeypatch.setattr(S, "CERT_AUDIT_EVERY", 0)
    real_cert = S.scan_certified_l2

    def spoiled(vecs, sqn, live, qd, *, k, ids_only=False):
        block = np.array(
            real_cert(vecs, sqn, live, qd, k=k, ids_only=ids_only)
        )
        block[::17, -1] = 0  # a few spurious "uncertified" rows/chunk
        return block

    monkeypatch.setattr(S, "scan_certified_l2", spoiled)
    calls = []
    real_exact = S.scan_topk_exact_l2

    def counting_exact(vecs, sqn, live, qd, **kw):
        calls.append(int(qd.shape[0]))
        return real_exact(vecs, sqn, live, qd, **kw)

    monkeypatch.setattr(S, "scan_topk_exact_l2", counting_exact)
    before = dict(S.CERT_STATS)
    got = idx.search_batch(queries, 5, engine="scan", reply="columnar")
    assert calls and len(calls) == 1  # ONE coalesced rerun, 4 chunks
    assert S.CERT_STATS["fallback_queries"] - before[
        "fallback_queries"
    ] == 8  # ceil(32/17)=2 per chunk x 4 chunks
    assert (got[0] == want[0]).all()
    assert np.array_equal(got[1], want[1])


def test_flat_pipelined_multichunk_matches_serial(rng, monkeypatch):
    """FlatIndex's chunked pipelined drain (every tier: f32 exact,
    certified, int8-resident, hamming packed) must match the
    single-chunk reply element-for-element, odd tail included."""
    import redis_hnsw_tpu.ops.search as SE

    def pairs(res):
        return [[(r.sim, r.name) for r in row] for row in res]

    data = rng.standard_normal((500, 24)).astype(np.float32)
    idx = FlatIndex("fp", IndexConfig(dim=24))
    idx.add_batch([f"n{i}" for i in range(500)], data)
    queries = rng.standard_normal((210, 24)).astype(np.float32)
    want = pairs(idx.search_batch(queries, 7))
    monkeypatch.setattr(SE, "MAX_LANES", 64)
    monkeypatch.setenv("REDIS_HNSW_TPU_PIPELINE", "3")
    assert pairs(idx.search_batch(queries, 7)) == want
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    assert pairs(idx.search_batch(queries, 7)) == want
    monkeypatch.delenv("REDIS_HNSW_TPU_SCAN_CERT")
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_DTYPE", "int8")
    i8_chunked = pairs(idx.search_batch(queries, 7))
    monkeypatch.setattr(SE, "MAX_LANES", 2048)
    assert pairs(idx.search_batch(queries, 7)) == i8_chunked

    hdata = rng.integers(0, 2**32, (300, 8), dtype=np.uint32)
    hidx = FlatIndex("fph", IndexConfig(dim=256, metric="hamming"))
    hidx.add_batch([f"h{i}" for i in range(300)], hdata)
    hq = rng.integers(0, 2**32, (130, 8), dtype=np.uint32)
    hwant = pairs(hidx.search_batch(hq, 6))
    monkeypatch.setattr(SE, "MAX_LANES", 32)
    assert pairs(hidx.search_batch(hq, 6)) == hwant


def test_empty_query_batch_all_kinds(rng):
    """A [0, D] query batch returns empty replies (no crash) on every
    index kind and engine -- the chunked drain must not reach
    np.concatenate([]) (r4 review regression)."""
    idx, oracle, data, _ = _build(rng, n=64)
    empty = np.zeros((0, 24), np.float32)
    for engine in ("scan", "graph", "auto"):
        assert idx.search_batch(empty, 5, engine=engine) == []
    nm, sims = idx.search_batch(empty, 5, reply="columnar")
    assert nm.shape == (0, 5) and sims.shape == (0, 5)
    assert oracle.search_batch(empty, 5) == []


def test_fetch_group_roundtrip():
    """FetchGroup: mixed dtype/shape device arrays come back from the
    one coalesced transfer byte-identical and WRITABLE (the certified
    path splices fallback rows into its block in place)."""
    import jax.numpy as jnp

    from redis_hnsw_tpu.ops.scan import FetchGroup

    g = FetchGroup()
    a = jnp.arange(24, dtype=jnp.int32).reshape(4, 6)
    b = jnp.linspace(-3.0, 9.0, 10, dtype=jnp.float32).reshape(5, 2)
    c = jnp.array([[1, -2], [3, 4]], dtype=jnp.int8)
    ga, gb, gc = g.add(a), g.add(b), g.add(c)
    ha, hb, hc = ga(), gb(), gc()
    assert np.array_equal(ha, np.asarray(a))
    assert np.array_equal(hb, np.asarray(b)) and hb.dtype == np.float32
    assert np.array_equal(hc, np.asarray(c)) and hc.dtype == np.int8
    ha[0, 0] = -7  # writable
    hb[0, 0] = 1.5
    # single-part group skips the concat but still copies writable
    g1 = FetchGroup()
    h = g1.add(b)()
    h[0, 0] = 2.5
    import pytest

    with pytest.raises(RuntimeError):
        g1.add(a)  # already materialized


def test_fetch_window_env(monkeypatch):
    from redis_hnsw_tpu.ops.scan import fetch_window

    monkeypatch.delenv("REDIS_HNSW_TPU_FETCH_WINDOW", raising=False)
    assert fetch_window() == 1
    # caller's engine-aware default applies when the env is unset
    assert fetch_window(8) == 8
    monkeypatch.setenv("REDIS_HNSW_TPU_FETCH_WINDOW", "8")
    assert fetch_window() == 8
    monkeypatch.setenv("REDIS_HNSW_TPU_FETCH_WINDOW", "0")
    assert fetch_window() == 1
    # the env overrides the default in BOTH directions
    monkeypatch.setenv("REDIS_HNSW_TPU_FETCH_WINDOW", "1")
    assert fetch_window(8) == 1
    monkeypatch.setenv("REDIS_HNSW_TPU_FETCH_WINDOW", "")
    assert fetch_window() == 1
    assert fetch_window(4) == 4
    monkeypatch.setenv("REDIS_HNSW_TPU_FETCH_WINDOW", "junk")
    assert fetch_window() == 1
    assert fetch_window(4) == 4


def test_fetch_window_matches_serial(rng, monkeypatch):
    """A fetch window > 1 coalesces several chunks' replies into ONE
    D2H transfer (ops/scan.py FetchGroup); replies must stay
    byte-identical to the one-fetch-per-chunk loop on every engine,
    odd tail chunk and odd tail window included."""
    import redis_hnsw_tpu.ops.search as SE

    idx, oracle, data, _ = _build(rng, n=500)
    monkeypatch.setattr(SE, "MAX_LANES", 64)
    queries = rng.standard_normal((210, 24)).astype(np.float32)
    for engine in ("scan", "scan-approx", "graph"):
        monkeypatch.setenv("REDIS_HNSW_TPU_FETCH_WINDOW", "3")
        n_w, s_w = idx.search_batch(
            queries, 10, engine=engine, reply="columnar"
        )
        monkeypatch.setenv("REDIS_HNSW_TPU_FETCH_WINDOW", "1")
        n_1, s_1 = idx.search_batch(
            queries, 10, engine=engine, reply="columnar"
        )
        assert (n_w == n_1).all(), engine
        assert np.array_equal(s_w, s_1), engine
    # the hamming packed-word reply rides the same group
    hidx, horacle, hdata, _ = _build(rng, n=300, dim=256, metric="hamming")
    hq = rng.integers(0, 2**32, (130, 8), dtype=np.uint32)
    monkeypatch.setattr(SE, "MAX_LANES", 32)
    monkeypatch.setenv("REDIS_HNSW_TPU_FETCH_WINDOW", "4")
    got = hidx.search_batch(hq, 6, engine="scan", reply="columnar")
    monkeypatch.setenv("REDIS_HNSW_TPU_FETCH_WINDOW", "1")
    want = hidx.search_batch(hq, 6, engine="scan", reply="columnar")
    assert (got[0] == want[0]).all()
    assert np.array_equal(got[1], want[1])


def test_fetch_window_certified_with_fallback(rng, monkeypatch):
    """Certified scan under a fetch window: adversarial ties force
    exact fallbacks whose reruns coalesce through the sink while the
    window's block transfers stay coalesced too -- results must stay
    byte-identical to the exact path."""
    import redis_hnsw_tpu.ops.scan as S
    import redis_hnsw_tpu.ops.search as SE

    base = rng.standard_normal((40, 24)).astype(np.float32)
    data = np.repeat(base, 8, axis=0)  # heavy tie classes
    names = [f"n{i}" for i in range(len(data))]
    idx = HNSWIndex(
        "fw", IndexConfig(dim=24, m=8, ef_construction=48, seed=5)
    )
    idx.add_batch(names, data, batch_size=256)
    queries = np.repeat(base[:10], 13, axis=0)  # 130 tie-heavy queries
    want = idx.search_batch(queries, 12, engine="scan", reply="columnar")
    monkeypatch.setattr(SE, "MAX_LANES", 32)
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    monkeypatch.setenv("REDIS_HNSW_TPU_FETCH_WINDOW", "3")
    before = dict(S.CERT_STATS)
    got = idx.search_batch(queries, 12, engine="scan", reply="columnar")
    assert S.CERT_STATS["batches"] == before["batches"] + 5
    assert S.CERT_STATS["queries"] == before["queries"] + 130
    assert (got[0] == want[0]).all()
    assert np.array_equal(got[1], want[1])
    # env unset: the engine-aware default (FETCH_WINDOW_FAST, one
    # window over all 5 chunks here) engages for the certified path
    monkeypatch.delenv("REDIS_HNSW_TPU_FETCH_WINDOW")
    got = idx.search_batch(queries, 12, engine="scan", reply="columnar")
    assert (got[0] == want[0]).all()
    assert np.array_equal(got[1], want[1])


def test_fetch_window_flat_tiers(rng, monkeypatch):
    """FlatIndex under a fetch window: f32 exact, certified and the
    int8-resident tier (whose finish rescores host-side from the
    grouped id block) all match the window-1 replies."""
    import redis_hnsw_tpu.ops.search as SE

    def pairs(res):
        return [[(r.sim, r.name) for r in row] for row in res]

    data = rng.standard_normal((500, 24)).astype(np.float32)
    idx = FlatIndex("fwf", IndexConfig(dim=24))
    idx.add_batch([f"n{i}" for i in range(500)], data)
    queries = rng.standard_normal((210, 24)).astype(np.float32)
    want = pairs(idx.search_batch(queries, 7))
    monkeypatch.setattr(SE, "MAX_LANES", 64)
    monkeypatch.setenv("REDIS_HNSW_TPU_FETCH_WINDOW", "3")
    assert pairs(idx.search_batch(queries, 7)) == want
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    assert pairs(idx.search_batch(queries, 7)) == want
    monkeypatch.delenv("REDIS_HNSW_TPU_SCAN_CERT")
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_DTYPE", "int8")
    i8_windowed = pairs(idx.search_batch(queries, 7))
    monkeypatch.setenv("REDIS_HNSW_TPU_FETCH_WINDOW", "1")
    assert pairs(idx.search_batch(queries, 7)) == i8_windowed


def test_scan_certified_hamming_matches_exact(rng, monkeypatch):
    """Certified-exact hamming (REDIS_HNSW_TPU_SCAN_CERT=1): the deep
    certificate (scan.py scan_certified_hamming) must return replies
    byte-identical to the exact int8-matmul scan on the HNSW scan path
    AND the FlatIndex path, and the stats counters record the batch."""
    import redis_hnsw_tpu.ops.scan as S

    idx, oracle, data, _ = _build(rng, n=600, dim=256, metric="hamming")
    queries = rng.integers(0, 2**32, (32, 8), dtype=np.uint32)
    want = idx.search_batch(queries, 10, engine="scan")
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    before = dict(S.CERT_STATS)
    got = idx.search_batch(queries, 10, engine="scan")
    assert S.CERT_STATS["batches"] == before["batches"] + 1
    assert S.CERT_STATS["queries"] == before["queries"] + 32
    for b in range(32):
        assert [(r.sim, r.name) for r in got[b]] == [
            (r.sim, r.name) for r in want[b]
        ]
    gotf = oracle.search_batch(queries, 10)
    for b in range(32):
        assert [(r.sim, r.name) for r in gotf[b]] == [
            (r.sim, r.name) for r in want[b]
        ]
    # recall_target=1.0 rides the same certified path
    got_rt = idx.search_batch(queries, 10, recall_target=1.0)
    for b in range(32):
        assert [r.name for r in got_rt[b]] == [r.name for r in want[b]]


def test_scan_certified_hamming_straddling_ties_certify(rng, monkeypatch):
    """The DEEP certificate's reason to exist: integer tie classes that
    straddle the k boundary (here: every row duplicated 8x, k=10)
    CERTIFY -- no exact fallback -- because the whole class fits inside
    the 4k-oversampled selection. (The euclidean k-slot certificate
    falls back on every such query, test_scan_certified_tie_fallback.)
    Results stay byte-identical to the exact path."""
    import redis_hnsw_tpu.ops.scan as S

    base = rng.integers(0, 2**32, (60, 8), dtype=np.uint32)
    data = np.repeat(base, 8, axis=0)  # tie classes of 8
    names = [f"n{i}" for i in range(len(data))]
    idx = HNSWIndex(
        "hct", IndexConfig(dim=256, m=8, ef_construction=48,
                           metric="hamming", seed=5),
    )
    idx.add_batch(names, data, batch_size=256)
    queries = rng.integers(0, 2**32, (16, 8), dtype=np.uint32)
    want = idx.search_batch(queries, 10, engine="scan")
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    before = S.CERT_STATS["fallback_queries"]
    got = idx.search_batch(queries, 10, engine="scan")
    assert S.CERT_STATS["fallback_queries"] == before  # all certified
    for b in range(16):
        assert [(r.sim, r.name) for r in got[b]] == [
            (r.sim, r.name) for r in want[b]
        ]


def test_scan_certified_hamming_oversized_tie_fallback(rng, monkeypatch):
    """A tie class BIGGER than the whole oversampled selection (48
    copies vs the 4k=40-deep selection at k=10) cannot be proven
    captured: the certificate must refuse and the exact fallback must
    repair every query -- results identical to exact top_k (same tie
    members, lowest ids)."""
    import redis_hnsw_tpu.ops.scan as S

    base = rng.integers(0, 2**32, (12, 8), dtype=np.uint32)
    data = np.repeat(base, 48, axis=0)
    names = [f"n{i}" for i in range(len(data))]
    idx = HNSWIndex(
        "hbt", IndexConfig(dim=256, m=8, ef_construction=48,
                           metric="hamming", seed=5),
    )
    idx.add_batch(names, data, batch_size=256)
    queries = np.asarray(base[:8])  # each query's 48 exact copies tie at 0
    want = idx.search_batch(queries, 10, engine="scan")
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    before = S.CERT_STATS["fallback_queries"]
    got = idx.search_batch(queries, 10, engine="scan")
    assert S.CERT_STATS["fallback_queries"] >= before + 8
    for b in range(8):
        assert [(r.sim, r.name) for r in got[b]] == [
            (r.sim, r.name) for r in want[b]
        ]


def test_scan_certified_hamming_short_selection_not_certified(
    rng, monkeypatch
):
    """Soundness twin of the euclidean regression test: a truncated
    approx selection (simulating a real-TPU approx_max_k bin miss)
    must NOT certify through the empty-k-th-slot (t == -inf) escape --
    c_gt == s_gt must fail unless every live row really was selected."""
    import redis_hnsw_tpu.ops.scan as S

    idx, oracle, data, _ = _build(rng, n=300, dim=256, metric="hamming")
    queries = rng.integers(0, 2**32, (8, 8), dtype=np.uint32)
    want = idx.search_batch(queries, 10, engine="scan")

    real_scan_topk = S.scan_topk

    def truncating(table, sqn, live, qs, *, k, **kw):
        out = real_scan_topk(table, sqn, live, qs, k=k, **kw)
        if not (kw.get("approx") and kw.get("full_sel")):
            return out  # the exact fallback's packed word call
        ids, sims = out
        ids = ids.at[:, k - 4:].set(-1)
        sims = sims.at[:, k - 4:].set(S.NEG_INF)
        return ids, sims

    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    monkeypatch.setattr(S, "scan_topk", truncating)
    S.scan_certified_hamming.clear_cache()
    before = S.CERT_STATS["fallback_queries"]
    try:
        got = idx.search_batch(queries, 10, engine="scan")
    finally:
        S.scan_certified_hamming.clear_cache()
    assert S.CERT_STATS["fallback_queries"] >= before + 8
    for b in range(8):
        assert [(r.sim, r.name) for r in got[b]] == [
            (r.sim, r.name) for r in want[b]
        ]


def test_scan_certified_hamming_deletes_and_edges(rng, monkeypatch):
    """Certified hamming: deletes stay masked; k > live rows certifies
    through the c_gt equality (t == -inf, every live row selected)."""
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    idx, oracle, data, names = _build(
        rng, n=300, dim=256, metric="hamming"
    )
    for i in range(0, 300, 2):
        idx.delete_node(f"n{i}")
    res = idx.search_batch(data[:8], 5, engine="scan")
    surviving = {f"n{i}" for i in range(1, 300, 2)}
    for r in res:
        assert len(r) == 5
        assert all(item.name in surviving for item in r)
    small, _, sdata, _ = _build(rng, n=12, dim=256, metric="hamming")
    for r in small.search_batch(sdata[:2], 40, engine="scan"):
        assert len(r) == 12


def test_fetch_window_certified_hamming_with_fallback(rng, monkeypatch):
    """Certified hamming under the chunked pipelined drain + fetch
    window: oversized tie classes force exact fallbacks that coalesce
    through the (hamming-rerun) sink while the window's block
    transfers stay coalesced -- byte-identical to the exact path,
    with the engine-aware default window too."""
    import redis_hnsw_tpu.ops.scan as S
    import redis_hnsw_tpu.ops.search as SE

    base = rng.integers(0, 2**32, (12, 8), dtype=np.uint32)
    data = np.repeat(base, 48, axis=0)
    names = [f"n{i}" for i in range(len(data))]
    idx = HNSWIndex(
        "hfw", IndexConfig(dim=256, m=8, ef_construction=48,
                           metric="hamming", seed=5),
    )
    idx.add_batch(names, data, batch_size=256)
    queries = np.repeat(base[:10], 13, axis=0)  # 130 tie-heavy queries
    want = idx.search_batch(queries, 10, engine="scan", reply="columnar")
    monkeypatch.setattr(SE, "MAX_LANES", 32)
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    monkeypatch.setenv("REDIS_HNSW_TPU_FETCH_WINDOW", "3")
    before = dict(S.CERT_STATS)
    got = idx.search_batch(queries, 10, engine="scan", reply="columnar")
    assert S.CERT_STATS["batches"] == before["batches"] + 5
    assert S.CERT_STATS["queries"] == before["queries"] + 130
    assert S.CERT_STATS["fallback_queries"] > before["fallback_queries"]
    assert (got[0] == want[0]).all()
    assert np.array_equal(got[1], want[1])
    # env unset: the engine-aware default window engages for certified
    # hamming (ops/search.py) -- replies unchanged
    monkeypatch.delenv("REDIS_HNSW_TPU_FETCH_WINDOW")
    got = idx.search_batch(queries, 10, engine="scan", reply="columnar")
    assert (got[0] == want[0]).all()
    assert np.array_equal(got[1], want[1])


def test_fetch_group_stack_is_thread_local():
    """The ambient FetchGroup stack is per-thread (r4 advisor): a
    second thread's fetch_handle() during another thread's drain
    window must NOT register into that thread's FetchGroup -- it gets
    its own immediate fetch."""
    import threading

    import jax.numpy as jnp

    from redis_hnsw_tpu.ops.scan import (
        _ACTIVE_GROUPS,
        FetchGroup,
        fetch_handle,
    )

    g = FetchGroup()
    _ACTIVE_GROUPS.stack.append(g)
    try:
        arr = jnp.arange(6, dtype=jnp.int32)
        err, out = [], []

        def worker():
            try:
                # fresh thread: sees an EMPTY stack, not main's group
                assert _ACTIVE_GROUPS.stack == []
                out.append(fetch_handle(arr)())
            except BaseException as e:  # pragma: no cover
                err.append(e)

        t = threading.Thread(target=worker)
        t.start()
        t.join()
        assert not err
        assert np.array_equal(out[0], np.arange(6, dtype=np.int32))
        # main thread's group saw nothing from the worker
        assert g._parts == []
        # ... while the main thread's own handle does join the group
        fetch_handle(arr)
        assert len(g._parts) == 1
    finally:
        _ACTIVE_GROUPS.stack.pop()


def test_concurrent_search_batch_two_indexes(rng):
    """Two threads draining chunked search_batch loops on DIFFERENT
    indexes concurrently (api.py's per-index locks allow this) get
    byte-identical replies to the serial run -- the per-thread fetch
    windows must not cross (r4 advisor, medium)."""
    import threading

    import redis_hnsw_tpu.ops.search as SE

    idx_a, _, _, _ = _build(rng, n=300)
    idx_b, _, _, _ = _build(rng, n=280)
    qa = rng.standard_normal((130, 24)).astype(np.float32)
    qb = rng.standard_normal((140, 24)).astype(np.float32)
    want_a = idx_a.search_batch(qa, 7, engine="scan", reply="columnar")
    want_b = idx_b.search_batch(qb, 7, engine="scan", reply="columnar")
    old = SE.MAX_LANES
    SE.MAX_LANES = 32  # force the chunked drain path in both threads
    try:
        got, err = {}, []
        barrier = threading.Barrier(2)

        def run(name, idx, qs):
            try:
                barrier.wait(timeout=30)
                got[name] = idx.search_batch(
                    qs, 7, engine="scan", reply="columnar"
                )
            except BaseException as e:
                err.append(e)

        ts = [
            threading.Thread(target=run, args=("a", idx_a, qa)),
            threading.Thread(target=run, args=("b", idx_b, qb)),
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
    finally:
        SE.MAX_LANES = old
    assert not err, err
    assert (got["a"][0] == want_a[0]).all()
    assert np.array_equal(got["a"][1], want_a[1])
    assert (got["b"][0] == want_b[0]).all()
    assert np.array_equal(got["b"][1], want_b[1])


def test_flat_empty_query_columnar(rng):
    """FlatIndex with rows + an EMPTY query batch: columnar reply
    returns the (0, k) array pair, not [] (r4 advisor, low)."""
    flat = FlatIndex("fe", IndexConfig(dim=16))
    data = rng.standard_normal((40, 16)).astype(np.float32)
    flat.add_batch([f"n{i}" for i in range(40)], data)
    empty = np.zeros((0, 16), np.float32)
    nm, sims = flat.search_batch(empty, 5, reply="columnar")
    assert nm.shape == (0, 5) and sims.shape == (0, 5)
    assert sims.dtype == np.float32
    assert flat.search_batch(empty, 5) == []


def test_hamming_cert_ready_word_pack_gate(monkeypatch):
    """hamming_cert_ready mirrors BOTH dispatcher gates: even with the
    cert forced on, a table whose (dist << id_bits) | id reply cannot
    fit 31 bits is not certified-served -- the engine-aware window
    predicate must say so (r4 advisor, low)."""
    from redis_hnsw_tpu.ops.scan import cert_enabled, hamming_cert_ready

    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    words = 8  # 256 bits -> d_bits.bit_length() = 9 -> id_bits <= 22
    assert hamming_cert_ready(2**22, words)  # id_bits = 22: fits
    assert cert_enabled(2**23, 16 * words)  # cert alone would say yes
    assert not hamming_cert_ready(2**23, words)  # id_bits = 23: no
    # the cert gate itself still applies when the pack fits
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "0")
    assert not hamming_cert_ready(2**22, words)


def test_scan_certified_onepass_matches_exact(rng, monkeypatch):
    """One-pass certified select (REDIS_HNSW_TPU_CERT_ONEPASS=1, the
    pallas_select bin-max kernel in interpret mode): queries whose true
    top-k spreads across distinct bins certify with NO fallback, and
    results stay byte-identical to the exact path."""
    import redis_hnsw_tpu.ops.scan as S
    from redis_hnsw_tpu.ops.pallas_select import BIN_L

    n, dim, k, n_q = 2600, 24, 10, 8
    data = (10 * rng.standard_normal((n, dim))).astype(np.float32)
    queries = (10 * rng.standard_normal((n_q, dim))).astype(np.float32)
    # plant each query's true top-k in DISTINCT bins (rows j*2*BIN_L+i)
    for i in range(n_q):
        for j in range(k):
            row = j * 2 * BIN_L + i
            data[row] = queries[i] + 0.01 * rng.standard_normal(dim)
    names = [f"n{i}" for i in range(n)]
    idx = HNSWIndex(
        "op", IndexConfig(dim=dim, m=8, ef_construction=48, seed=5)
    )
    idx.add_batch(names, data, batch_size=512)
    want = idx.search_batch(queries, k, engine="scan")  # cert off: exact
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    monkeypatch.setenv("REDIS_HNSW_TPU_CERT_ONEPASS", "1")
    S.scan_certified_l2.clear_cache()
    before = dict(S.CERT_STATS)
    try:
        got = idx.search_batch(queries, k, engine="scan")
        assert S.CERT_STATS["batches"] == before["batches"] + 1
        # planted spread -> every query certified, zero fallbacks
        assert (
            S.CERT_STATS["fallback_queries"]
            == before["fallback_queries"]
        )
        for b in range(n_q):
            assert [(r.sim, r.name) for r in got[b]] == [
                (r.sim, r.name) for r in want[b]
            ]
        # deletes stay masked through the one-pass kernel
        idx.delete_node("n0")  # a planted top-1 for query 0
        want_d = idx.search_batch(queries, k, engine="scan")
        monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
        got_d = idx.search_batch(queries, k, engine="scan")
        for b in range(n_q):
            assert [(r.sim, r.name) for r in got_d[b]] == [
                (r.sim, r.name) for r in want_d[b]
            ]
    finally:
        S.scan_certified_l2.clear_cache()


def test_scan_certified_onepass_bin_collision_falls_back(
    rng, monkeypatch
):
    """Two true-top-k rows in ONE bin defeat the bin-max selection; the
    m2 >= t certificate must refuse and the exact fallback must serve
    the query -- byte-identical results, counted fallbacks. Also pins
    the adjacent-duplicate case (max2 == max1 ties inside a bin)."""
    import redis_hnsw_tpu.ops.scan as S

    base = (10 * rng.standard_normal((60, 24))).astype(np.float32)
    data = np.repeat(base, 8, axis=0)  # 8 CONSECUTIVE copies: same bin
    names = [f"n{i}" for i in range(480)]
    idx = HNSWIndex(
        "opc", IndexConfig(dim=24, m=8, ef_construction=48, seed=5)
    )
    idx.add_batch(names, data, batch_size=256)
    queries = (10 * rng.standard_normal((16, 24))).astype(np.float32)
    want = idx.search_batch(queries, 10, engine="scan")
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_CERT", "1")
    monkeypatch.setenv("REDIS_HNSW_TPU_CERT_ONEPASS", "1")
    S.scan_certified_l2.clear_cache()
    before = S.CERT_STATS["fallback_queries"]
    try:
        got = idx.search_batch(queries, 10, engine="scan")
        assert S.CERT_STATS["fallback_queries"] >= before + 16
        for b in range(16):
            assert [(r.sim, r.name) for r in got[b]] == [
                (r.sim, r.name) for r in want[b]
            ]
    finally:
        S.scan_certified_l2.clear_cache()


def test_cert_onepass_env_grammar(monkeypatch):
    import jax

    from redis_hnsw_tpu.ops.pallas_select import onepass_enabled

    monkeypatch.setenv("REDIS_HNSW_TPU_CERT_ONEPASS", "0")
    assert onepass_enabled() is False
    monkeypatch.setenv("REDIS_HNSW_TPU_CERT_ONEPASS", "1")
    assert onepass_enabled() is True
    # auto = OFF until a kernel geometry beats the two-pass form
    # (measured slower r5, see onepass_enabled's docstring)
    monkeypatch.setenv("REDIS_HNSW_TPU_CERT_ONEPASS", "auto")
    assert onepass_enabled() is False
    monkeypatch.setenv("REDIS_HNSW_TPU_CERT_ONEPASS", "junk")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="CERT_ONEPASS"):
        onepass_enabled()


def test_int8_rescore_mult_ladder(rng, monkeypatch):
    """REDIS_HNSW_TPU_INT8_RESCORE=mult widens the int8-resident flat
    tier's device selection to mult*k before the exact host rescore
    (the 32M recall ladder, artifacts/flat_capacity.json). Pins: the
    reply stays [B, k] and exactly sorted, mult*k > node_count clamps,
    recall at a wide mult dominates mult=1 on a quantization-hostile
    table, and the grammar is hardened."""
    from redis_hnsw_tpu.models.flat import FlatIndex
    from redis_hnsw_tpu.ops import scan as S

    # quantization-hostile: one huge-norm row per 50 stretches the
    # symmetric int8 scale so fine distinctions collapse
    n, dim = 400, 24
    data = rng.standard_normal((n, dim)).astype(np.float32)
    data[::50] *= 64.0
    names = [f"n{i}" for i in range(n)]
    cfg = IndexConfig(dim=dim)
    exact = FlatIndex("ex", cfg)
    exact.add_batch(names, data)
    queries = rng.standard_normal((16, dim)).astype(np.float32)
    want = exact.search_batch(queries, 10)

    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_DTYPE", "int8")
    flat = FlatIndex("f8l", cfg)
    flat.add_batch(names, data)

    def run(mult):
        monkeypatch.setenv("REDIS_HNSW_TPU_INT8_RESCORE", str(mult))
        got = flat.search_batch(queries, 10, approx=True)
        assert all(len(rr) == 10 for rr in got)
        for rr in got:
            sims = [r.sim for r in rr]
            assert sims == sorted(sims, reverse=True)
        return sum(
            len({r.name for r in got[b]} & {r.name for r in want[b]})
            for b in range(16)
        )

    # mult=64 covers 640 >= n rows: selection is exhaustive, so the
    # host f32 rescore makes the result EXACT; mult=1 is the floor
    assert run(64) == 160
    assert run(1) <= 160
    monkeypatch.setenv("REDIS_HNSW_TPU_INT8_RESCORE", "zero")
    with pytest.raises(ValueError, match="INT8_RESCORE"):
        S.int8_rescore_mult()


def test_scan_oversample_knob(rng, monkeypatch):
    """REDIS_HNSW_TPU_SCAN_OVERSAMPLE scales the approx tier's
    per-chunk keep width. A full-width oversample makes scan-approx
    byte-identical to the exact scan (the union re-reduce is exact);
    the grammar is hardened."""
    from redis_hnsw_tpu.ops import scan as S

    idx, oracle, data, _ = _build(rng, n=300)
    queries = rng.standard_normal((8, 24)).astype(np.float32)
    want = idx.search_batch(queries, 10, engine="scan")
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_OVERSAMPLE", "1000")
    got = idx.search_batch(queries, 10, engine="scan-approx")
    assert [[(r.name, r.sim) for r in rr] for rr in got] == \
        [[(r.name, r.sim) for r in rr] for rr in want]
    monkeypatch.setenv("REDIS_HNSW_TPU_SCAN_OVERSAMPLE", "4.5")
    with pytest.raises(ValueError, match="SCAN_OVERSAMPLE"):
        S.scan_oversample()
