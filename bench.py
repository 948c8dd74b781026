"""Benchmark: batched TPU query throughput vs reference-style sequential QPS.

The reference publishes no numbers (BASELINE.md), so the baseline is
measured in-process: the host engine's one-query-at-a-time search is an
algorithmically faithful stand-in for the reference's single-core loop
(same graph, same ef, same expansion order -- src/hnsw/core.rs:607-675).
The benchmark metric is batched device QPS at recall@10 >= 0.95 against a
brute-force oracle, on the config-1-style workload (BASELINE.json: random
128-d, M -> 16 for the recall target, EFCON=200).

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps/chip", "vs_baseline": ratio}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from redis_hnsw_tpu import HNSWIndex, IndexConfig
    from redis_hnsw_tpu.models.flat import FlatIndex

    n, dim, k = 10_000, 128, 10
    m, efcon = 16, 200
    n_queries = 1024
    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, dim)).astype(np.float32)
    queries = rng.standard_normal((n_queries, dim)).astype(np.float32)
    names = [f"n{i}" for i in range(n)]

    log(f"devices: {jax.devices()}")
    idx = HNSWIndex(
        "bench", IndexConfig(dim=dim, m=m, ef_construction=efcon, seed=7)
    )
    t0 = time.perf_counter()
    idx.add_batch(names, data, batch_size=1024)
    build_s = time.perf_counter() - t0
    log(f"build: {n} nodes in {build_s:.1f}s ({n / build_s:.0f} adds/s)")

    # ground truth
    oracle = FlatIndex("o", IndexConfig(dim=dim))
    oracle.add_batch(names, data)
    truth = oracle.search_batch(queries, k)
    truth_sets = [{r.name for r in t} for t in truth]

    def recall(results):
        hits = sum(
            len({r.name for r in res} & truth_sets[b])
            for b, res in enumerate(results)
        )
        return hits / (k * len(results))

    # pick the smallest ef_search hitting recall >= 0.95 (TPU knob; the
    # reference hardwires ef=efcon)
    ef = None
    for cand in (32, 48, 64, 96, 128, 200, 256, 320, 400, 512):
        res = idx.search_batch(queries[:256], k, ef_search=cand)
        r = recall(res)
        log(f"ef_search={cand}: recall@{k}={r:.4f} (256-query probe)")
        if r >= 0.953:
            ef = cand
            break
    if ef is None:
        ef = 512

    # timed batched run (warmup first -- compile excluded)
    res = idx.search_batch(queries, k, ef_search=ef)
    full_recall = recall(res)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        idx.search_batch(queries, k, ef_search=ef)
    dt = (time.perf_counter() - t0) / reps
    qps = n_queries / dt
    log(
        f"batched: ef={ef} recall@{k}={full_recall:.4f} "
        f"{qps:.0f} qps ({dt * 1e3:.1f} ms / {n_queries} queries)"
    )

    # baseline: sequential host engine (reference-equivalent algorithm),
    # at its parity setting ef = ef_construction
    n_base = 40
    t0 = time.perf_counter()
    for q in queries[:n_base]:
        idx.search_knn(q, k)
    base_dt = (time.perf_counter() - t0) / n_base
    base_qps = 1.0 / base_dt
    log(f"baseline sequential host: {base_qps:.1f} qps")

    print(
        json.dumps(
            {
                "metric": (
                    f"batched qps/chip at recall@10>={full_recall:.3f} "
                    f"(10k x 128d, M={m}, efcon={efcon}, ef={ef})"
                ),
                "value": round(qps, 1),
                "unit": "qps/chip",
                "vs_baseline": round(qps / base_qps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
