"""Million-vector capability run (BASELINE.json config-2 scale), staged.

Builds an n x 128d index via device-scored waves in resumable stages
(checkpoint between invocations, so a bounded-walltime runner can drive
it), then measures batched search throughput, the native sequential
baseline on the same graph, and checkpoint save/restore time. Random
vectors stand in for SIFT1M (no dataset egress on this box); random
128-d data is the *hardest* case for graph recall, so treat recall here
as a floor, not a ceiling.

    python benchmarks/million.py build  N STAGE CKPT   # one stage
    python benchmarks/million.py search N CKPT         # measurements
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


def log(*a):
    print(*a, flush=True)


def dataset(n: int) -> np.ndarray:
    return (
        np.random.default_rng(0)
        .standard_normal((n, DIM))
        .astype(np.float32)
    )


def build_stage(n: int, stage: int, ckpt: str) -> None:
    from redis_hnsw_tpu import HNSWIndex, IndexConfig
    from redis_hnsw_tpu.utils.checkpoint import load_index, save_index

    data = dataset(n)
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


def search_phase(n: int, ckpt: str) -> None:
    import jax.numpy as jnp

    from redis_hnsw_tpu import IndexConfig
    from redis_hnsw_tpu.models.flat import FlatIndex
    from redis_hnsw_tpu.utils.checkpoint import load_index

    t0 = time.perf_counter()
    idx = load_index(ckpt)
    load_s = time.perf_counter() - t0
    assert idx.node_count == n, idx.node_count
    data = dataset(n)
    rng = np.random.default_rng(1)
    queries = rng.standard_normal((1024, DIM)).astype(np.float32)

    oracle = FlatIndex("o", IndexConfig(dim=DIM))
    oracle.add_batch([f"n{i}" for i in range(n)], data)
    t0 = time.perf_counter()
    truth = oracle.search_batch(queries[:256], K)
    oracle_s = time.perf_counter() - t0
    truth_sets = [{r.name for r in t} for t in truth]

    qd = jnp.asarray(queries)
    results = {"n": n, "restore_s": round(load_s, 1),
               "oracle_scan_256q_s": round(oracle_s, 1)}
    for ef, ex, it in ((256, 16, 24), (512, 16, 40)):
        res = idx.search_batch(qd[:256], K, ef_search=ef, expand=ex, iters=it)
        rec = sum(
            len({r.name for r in rr} & truth_sets[b])
            for b, rr in enumerate(res)
        ) / (K * len(res))
        idx.search_batch(qd, K, ef_search=ef, expand=ex, iters=it)  # warm B
        t0 = time.perf_counter()
        for _ in range(3):
            idx.search_batch(qd, K, ef_search=ef, expand=ex, iters=it)
        dt = (time.perf_counter() - t0) / 3
        log(f"ef={ef}: recall@{K}={rec:.4f} qps={1024/dt:.0f}")
        results[f"ef{ef}"] = {
            "recall": round(rec, 4), "qps": round(1024 / dt, 1)
        }

    t0 = time.perf_counter()
    for q in queries[:50]:
        idx.search_knn(q, K)
    results["baseline_qps"] = round(50 / (time.perf_counter() - t0), 1)
    log(json.dumps(results))


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
        build_stage(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    elif mode == "search":
        search_phase(int(sys.argv[2]), sys.argv[3])
    elif mode == "profile":
        profile_build(int(sys.argv[2]))
    else:
        raise SystemExit(f"unknown mode {mode!r}")
