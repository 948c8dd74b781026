"""Million-vector capability run (BASELINE.json config-2 scale), staged.

Builds an n x 128d index via device-scored waves in resumable stages
(checkpoint between invocations, so a bounded-walltime runner can drive
it), then measures batched search throughput, the native sequential
baseline on the same graph, and checkpoint save/restore time.

Two corpora (no dataset egress on this box):

* ``clustered`` (default) -- a SIFT-like mixture of gaussians: 4096
  cluster centers in 128d, point = center + 0.8 * noise. Real feature
  corpora (SIFT/GIST/deep descriptors) are strongly clustered; this is
  the honest stand-in for BASELINE config 2 and the north-star
  measurement (recall@10 >= 0.95 at >= 10x the sequential baseline).
  Queries are *held-out* samples from the same mixture (fresh noise,
  same centers), the planted-neighbor workload of a lookup service.
* ``random`` -- iid gaussians, the known-hardest case for graph recall
  (distances concentrate; public hnswlib numbers on random-128 are
  equally poor, ~0.4 at ef=256). Kept as the adversarial floor.

    python benchmarks/million.py build  N STAGE CKPT [KIND] [DIM]
    python benchmarks/million.py search N CKPT [KIND] [DIM]

DIM defaults to 128 (config 2); DIM=960 runs the GIST regime (config 3)
at scale with the same clustered generator.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

DIM, K, M, EFCON = 128, 10, 16, 200
N_CENTERS, SIGMA = 4096, 0.8


def set_dim(dim: int) -> None:
    global DIM
    DIM = dim


def log(*a):
    print(*a, flush=True)


def dataset(n: int, kind: str = "clustered") -> np.ndarray:
    rng = np.random.default_rng(0)
    if kind.startswith(("fvecs:", "bvecs:")):
        # real artifact: kind = fvecs:<base>:<query> (utils/datasets.py)
        from redis_hnsw_tpu.utils.datasets import load_pair

        base, _ = load_pair(kind, count=n)
        if base.shape[0] < n:
            raise SystemExit(
                f"{kind}: only {base.shape[0]} rows, need {n}"
            )
        set_dim(base.shape[1])
        return base[:n]
    if kind == "random":
        return rng.standard_normal((n, DIM)).astype(np.float32)
    if kind != "clustered":
        raise SystemExit(f"unknown dataset kind {kind!r}")
    centers = rng.standard_normal((N_CENTERS, DIM)).astype(np.float32)
    assign = rng.integers(0, N_CENTERS, n)
    out = centers[assign]
    out += SIGMA * rng.standard_normal((n, DIM)).astype(np.float32)
    return out


def query_set(n_q: int, kind: str = "clustered") -> np.ndarray:
    """Held-out queries: same mixture, fresh noise (clustered), fresh
    iid gaussians (random), or the artifact's query file (fvecs/bvecs)."""
    rng = np.random.default_rng(1)
    if kind.startswith(("fvecs:", "bvecs:")):
        from redis_hnsw_tpu.utils.datasets import load_pair

        _, queries = load_pair(kind, count=0)
        set_dim(queries.shape[1])
        return queries[:n_q]
    if kind == "random":
        return rng.standard_normal((n_q, DIM)).astype(np.float32)
    # re-derive the SAME centers as dataset() (seed 0), then sample
    centers = (
        np.random.default_rng(0)
        .standard_normal((N_CENTERS, DIM))
        .astype(np.float32)
    )
    assign = rng.integers(0, N_CENTERS, n_q)
    out = centers[assign]
    out += SIGMA * rng.standard_normal((n_q, DIM)).astype(np.float32)
    return out


def build_stage(n: int, stage: int, ckpt: str, kind: str = "clustered") -> None:
    from redis_hnsw_tpu import HNSWIndex, IndexConfig
    from redis_hnsw_tpu.utils.checkpoint import load_index, save_index

    data = dataset(n, kind)
    if os.path.exists(ckpt):
        t0 = time.perf_counter()
        idx = load_index(ckpt)
        log(f"resume: {idx.node_count} nodes ({time.perf_counter()-t0:.1f}s load)")
    else:
        idx = HNSWIndex(
            "m1", IndexConfig(dim=DIM, m=M, ef_construction=EFCON, seed=7)
        )
    start = idx.node_count
    if start >= n:
        log("build complete")
        return
    hi = min(start + stage, n)
    idx._capacity_hint = n  # stable shapes across all stages
    t0 = time.perf_counter()
    idx.add_batch(
        [f"n{i}" for i in range(start, hi)], data[start:hi],
        batch_size=2048,
    )
    dt = time.perf_counter() - t0
    log(f"stage: +{hi-start} nodes in {dt:.0f}s ({(hi-start)/dt:.0f} adds/s), total {idx.node_count}")
    t0 = time.perf_counter()
    save_index(idx, ckpt, compress=False)
    log(f"checkpoint save: {time.perf_counter()-t0:.1f}s")


def snapshot_truth(idx, queries, k) -> list[set]:
    """Exact top-k ground truth computed against the index's OWN
    device-resident vector table (a separate flat-oracle upload costs
    minutes on the dev tunnel at GIST scale -- the vectors are already
    in HBM)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from redis_hnsw_tpu.ops.distance import pairwise_neg_sq_l2

    snap = idx.device_snapshot()
    live = np.zeros(snap.n_pad, bool)
    h = min(len(idx._levels), snap.n_pad)
    live[:h] = idx._levels[:h] >= 0

    @jax.jit
    def scan(vecs, sqn, live, q):
        scores = pairwise_neg_sq_l2(q, vecs, sqn)
        scores = jnp.where(live[None, :], scores, -jnp.inf)
        sims, ids = jax.lax.top_k(scores, k)
        return sims, ids

    sims, ids = scan(snap.vecs, snap.sqnorms, jnp.asarray(live),
                     jnp.asarray(queries))
    sims, ids = np.asarray(sims), np.asarray(ids)
    # -inf slots are padded/dead rows whose ids may exceed the name
    # table's high water -- drop them before name resolution.
    names = idx._names.names_array()
    return [
        {names[r] for r, s in zip(row, srow) if not np.isneginf(s)}
        for row, srow in zip(ids, sims)
    ]


def search_phase(
    n: int, ckpt: str, kind: str = "clustered",
    full_sweep: bool = False, out: str | None = None,
) -> None:
    import statistics

    import jax.numpy as jnp

    from redis_hnsw_tpu.utils.checkpoint import load_index

    t0 = time.perf_counter()
    idx = load_index(ckpt)
    load_s = time.perf_counter() - t0
    assert idx.node_count == n, idx.node_count
    queries = query_set(2048, kind)

    t0 = time.perf_counter()
    truth_sets = snapshot_truth(idx, queries[:256], K)
    oracle_s = time.perf_counter() - t0

    qd = jnp.asarray(queries)
    results = {"n": n, "kind": kind, "restore_s": round(load_s, 1),
               "oracle_scan_256q_s": round(oracle_s, 1),
               # provenance: which wave mode built the restored graph is
               # not recorded in the ckpt; record at least the CURRENT
               # env so runs are labeled (ops/construct.py scan-l0)
               "build_l0_env": os.environ.get(
                   "REDIS_HNSW_TPU_BUILD_L0", "beam")}

    # Sweep the GRAPH engine's recall/qps frontier bottom-up (pinned
    # engine="graph": under auto routing the scan engine would answer
    # instead at this scale); the operating point is the cheapest graph
    # setting with recall@10 >= 0.95 (the reference has no such knobs:
    # it always pays ef = efcon = 200, core.rs:485).
    frontier = []
    operating = None
    for ef, ex, it in (
        (32, 8, 8), (48, 8, 10), (64, 8, 12), (96, 16, 10), (128, 16, 12),
        (192, 16, 18), (256, 16, 24), (384, 16, 32), (512, 16, 40),
    ):
        res = idx.search_batch(qd[:256], K, ef_search=ef, expand=ex,
                               iters=it, engine="graph")
        rec = sum(
            len({r.name for r in rr} & truth_sets[b])
            for b, rr in enumerate(res)
        ) / (K * len(res))
        idx.search_batch(qd, K, ef_search=ef, expand=ex, iters=it,
                         engine="graph")  # warm B
        t0 = time.perf_counter()
        for _ in range(3):
            idx.search_batch(qd, K, ef_search=ef, expand=ex, iters=it,
                             engine="graph")
        dt = (time.perf_counter() - t0) / 3
        qps = 2048 / dt
        log(f"ef={ef} expand={ex} iters={it}: recall@{K}={rec:.4f} "
            f"qps={qps:.0f}")
        frontier.append({"ef": ef, "expand": ex, "iters": it,
                         "recall": round(rec, 4), "qps": round(qps, 1)})
        if operating is None and rec >= 0.95:
            operating = frontier[-1]
            if kind == "clustered" and not full_sweep:
                break  # north-star point found; stop paying sweep time
    results["frontier"] = frontier
    results["operating"] = operating

    # The exact MXU scan engine at the same scale (ops/scan.py): at 1M
    # rows the scan is still ~4x the graph beam on this chip AND exact,
    # so it is the auto engine's pick; record it alongside the graph
    # frontier (columnar serving reply).
    try:
        nm, _ = idx.search_batch(qd[:256], K, engine="scan",
                                 reply="columnar")
        scan_rec = sum(
            len(set(nm[b]) & truth_sets[b]) for b in range(len(nm))
        ) / (K * len(nm))
        idx.search_batch(qd, K, engine="scan", reply="columnar")
        t0 = time.perf_counter()
        for _ in range(3):
            idx.search_batch(qd, K, engine="scan", reply="columnar")
        dt = (time.perf_counter() - t0) / 3
        results["scan_engine"] = {
            "recall": round(scan_rec, 4), "qps": round(2048 / dt, 1),
        }
        log(f"scan engine: recall@{K}={scan_rec:.4f} qps={2048/dt:.0f}")
        # ids-only reply variant, ids-force so the sweep measures the
        # path even where the serving guard would decline it (the
        # sweep's job is to characterize, ops/scan.py reply_ids_engaged)
        os.environ["REDIS_HNSW_TPU_REPLY"] = "ids-force"
        try:
            idx.search_batch(qd, K, engine="scan", reply="columnar",
                             host_qs=queries)
            t0 = time.perf_counter()
            for _ in range(3):
                idx.search_batch(qd, K, engine="scan",
                                 reply="columnar", host_qs=queries)
            dt = (time.perf_counter() - t0) / 3
            results["scan_engine"]["ids_reply_qps"] = round(2048 / dt, 1)
            log(f"scan engine, ids reply: qps={2048/dt:.0f}")
        finally:
            os.environ.pop("REDIS_HNSW_TPU_REPLY", None)
        # and the approx-select tier (oversampled approx_max_k,
        # exactly re-reduced): 2.4-3.9x the exact scan at >= 1M rows
        # for ~0.999 recall (artifacts/scan_tiers.json)
        nm, _ = idx.search_batch(qd[:256], K, engine="scan-approx",
                                 reply="columnar")
        a_rec = sum(
            len(set(nm[b]) & truth_sets[b]) for b in range(len(nm))
        ) / (K * len(nm))
        idx.search_batch(qd, K, engine="scan-approx", reply="columnar")
        t0 = time.perf_counter()
        for _ in range(3):
            idx.search_batch(qd, K, engine="scan-approx",
                             reply="columnar")
        dt = (time.perf_counter() - t0) / 3
        results["scan_approx_engine"] = {
            "recall": round(a_rec, 4), "qps": round(2048 / dt, 1),
        }
        log(f"scan-approx: recall@{K}={a_rec:.4f} qps={2048/dt:.0f}")
        os.environ["REDIS_HNSW_TPU_REPLY"] = "ids-force"
        try:
            idx.search_batch(qd, K, engine="scan-approx",
                             reply="columnar", host_qs=queries)
            t0 = time.perf_counter()
            for _ in range(3):
                idx.search_batch(qd, K, engine="scan-approx",
                                 reply="columnar", host_qs=queries)
            dt = (time.perf_counter() - t0) / 3
            results["scan_approx_engine"]["ids_reply_qps"] = round(
                2048 / dt, 1
            )
            log(f"scan-approx, ids reply: qps={2048/dt:.0f}")
        finally:
            os.environ.pop("REDIS_HNSW_TPU_REPLY", None)
    except Exception as e:  # pragma: no cover - HBM-bound at huge N
        results.setdefault("scan_engine", {"error": repr(e)})
        results["scan_approx_engine"] = {"error": repr(e)}
        log(f"scan engine unavailable at this scale: {e!r}")

    # Sequential-native baselines (median of 3 reps, bench.py
    # methodology), measured two ways:
    #  * parity: the reference's hardwired ef = efcon = 200
    #    (core.rs:485) -- with its RECALL, which at million scale falls
    #    well short of 0.95 (measured 0.883 at 1M clustered): the
    #    reference cannot reach the north-star recall at all;
    #  * matched: the same ef the batched engine needed for >= 0.95, so
    #    the ratio compares equal-quality answers.
    def host_qps(ef, n_q):
        vals = []
        for _ in range(3):
            t0 = time.perf_counter()
            for q in queries[:n_q]:
                idx.search_knn(q, K, ef_search=ef)
            vals.append(n_q / (time.perf_counter() - t0))
        return statistics.median(vals), vals

    for q in queries[:50]:
        idx.search_knn(q, K)
    hits = 0
    for b in range(128):
        res = idx.search_knn(queries[b], K, ef_search=EFCON)
        hits += len({r.name for r in res} & truth_sets[b])
    base, reps = host_qps(EFCON, 500)
    results["baseline_parity"] = {
        "ef": EFCON, "qps": round(base, 1),
        "recall": round(hits / (K * 128), 4),
        "reps": [round(v, 1) for v in reps],
    }
    if operating is not None:
        base_m, reps_m = host_qps(operating["ef"], 300)
        results["baseline_matched"] = {
            "ef": operating["ef"], "qps": round(base_m, 1),
            "reps": [round(v, 1) for v in reps_m],
        }
        results["ratio_vs_parity"] = round(operating["qps"] / base, 2)
        results["ratio_matched_recall"] = round(
            operating["qps"] / base_m, 2
        )
    log(json.dumps(results))
    if out:
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
        log(f"curve written to {out}")


def seed_sweep(
    n: int, ckpt: str, kind: str = "random", out: str | None = None,
) -> None:
    """Seeded-beam ladder: does entrypoint diversity (seeds=s pivot
    entrypoints per lane, ops/search.py) lift graph recall at scale,
    and does seeded-low-ef dominate unseeded-high-ef on the
    recall/qps frontier? Run on the adversarial random corpus where
    the r2 floor was 0.433 @ ef=256 (VERDICT weak #3)."""
    import jax.numpy as jnp

    from redis_hnsw_tpu.utils.checkpoint import load_index

    idx = load_index(ckpt)
    assert idx.node_count == n, idx.node_count
    queries = query_set(2048, kind)
    truth_sets = snapshot_truth(idx, queries[:256], K)
    qd = jnp.asarray(queries)

    rows = []
    for ef, ex, it in (
        (64, 8, 12), (128, 16, 12), (256, 16, 24), (512, 16, 40),
    ):
        for seeds in (0, 8, 32):
            res = idx.search_batch(
                qd[:256], K, ef_search=ef, expand=ex, iters=it,
                engine="graph", seeds=seeds,
            )
            rec = sum(
                len({r.name for r in rr} & truth_sets[b])
                for b, rr in enumerate(res)
            ) / (K * len(res))
            idx.search_batch(qd, K, ef_search=ef, expand=ex, iters=it,
                             engine="graph", seeds=seeds)  # warm B
            t0 = time.perf_counter()
            for _ in range(3):
                idx.search_batch(qd, K, ef_search=ef, expand=ex,
                                 iters=it, engine="graph", seeds=seeds)
            qps = 2048 / ((time.perf_counter() - t0) / 3)
            log(f"ef={ef} expand={ex} iters={it} seeds={seeds}: "
                f"recall@{K}={rec:.4f} qps={qps:.0f}")
            rows.append({"ef": ef, "expand": ex, "iters": it,
                         "seeds": seeds, "recall": round(rec, 4),
                         "qps": round(qps, 1)})
    result = {"n": n, "kind": kind, "ladder": rows}
    log(json.dumps(result))
    if out:
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
        log(f"curve written to {out}")


def profile_build(n: int) -> None:
    """Phase breakdown of a bulk build: snapshot-delta upload vs device
    pass vs result fetch vs host graph surgery (VERDICT r1 weak#4)."""
    from redis_hnsw_tpu import HNSWIndex, IndexConfig
    from redis_hnsw_tpu.ops import construct
    from redis_hnsw_tpu.utils.profiling import PhaseTimer

    data = dataset(n)
    idx = HNSWIndex(
        "prof", IndexConfig(dim=DIM, m=M, ef_construction=EFCON, seed=7)
    )
    idx._capacity_hint = n
    # warm wave (compile) outside the timer
    idx.add_batch([f"n{i}" for i in range(2048)], data[:2048],
                  batch_size=2048)
    construct.BUILD_TIMER = timer = PhaseTimer()
    t0 = time.perf_counter()
    idx.add_batch([f"n{i}" for i in range(2048, n)], data[2048:n],
                  batch_size=2048)
    dt = time.perf_counter() - t0
    construct.BUILD_TIMER = None
    log(f"warm build: {n-2048} adds in {dt:.1f}s ({(n-2048)/dt:.0f} adds/s)")
    log(json.dumps(timer.summary(), indent=1))


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "build":
        if len(sys.argv) > 6:
            set_dim(int(sys.argv[6]))
        build_stage(
            int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
            sys.argv[5] if len(sys.argv) > 5 else "clustered",
        )
    elif mode in ("search", "sweep"):
        # sweep = search with the FULL ef ladder (no early break at the
        # first >=0.95 point) + the curve written to a JSON artifact:
        #   python benchmarks/million.py sweep N CKPT [KIND] [DIM] [OUT]
        # KIND may be fvecs:<base>:<query> for real SIFT1M/GIST1M files.
        if len(sys.argv) > 5:
            set_dim(int(sys.argv[5]))
        search_phase(
            int(sys.argv[2]), sys.argv[3],
            sys.argv[4] if len(sys.argv) > 4 else "clustered",
            full_sweep=(mode == "sweep"),
            out=(
                sys.argv[6] if len(sys.argv) > 6
                else (f"sweep_{sys.argv[2]}.json" if mode == "sweep" else None)
            ),
        )
    elif mode == "seedsweep":
        #   python benchmarks/million.py seedsweep N CKPT [KIND] [DIM] [OUT]
        if len(sys.argv) > 5:
            set_dim(int(sys.argv[5]))
        seed_sweep(
            int(sys.argv[2]), sys.argv[3],
            sys.argv[4] if len(sys.argv) > 4 else "random",
            out=(sys.argv[6] if len(sys.argv) > 6
                 else f"seedsweep_{sys.argv[2]}.json"),
        )
    elif mode == "profile":
        profile_build(int(sys.argv[2]))
    else:
        raise SystemExit(f"unknown mode {mode!r}")
