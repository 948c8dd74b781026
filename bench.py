"""Benchmark: batched TPU query throughput vs the reference-equivalent
single-core baseline.

The reference publishes no numbers (BASELINE.md), so the baseline is
measured in-process: the native C++ sequential engine
(native/hnsw_core.cpp) is an algorithmically faithful stand-in for the
reference's single-core Rust loop (same graph, same ef, same expansion
order, compiler-vectorized distance kernel ~ the reference's AVX2,
src/hnsw/metrics.rs:48-77). The metric is batched device QPS at
recall@10 >= 0.95 against a brute-force oracle on the config-1 workload
(BASELINE.json: random 128-d, M=16 for the recall target, EFCON=200).

Queries are uploaded to HBM once and reused -- on this dev setup
host->device goes through a tunnel at ~3MB/s (154ms for 512KB, measured),
which no production TPU topology has; serving systems keep query batches
device-resident anyway.

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
    import jax.numpy as jnp

    from redis_hnsw_tpu import HNSWIndex, IndexConfig
    from redis_hnsw_tpu.models.flat import FlatIndex

    n, dim, k = 10_000, 128, 10
    m, efcon = 16, 200
    n_queries = 2048
    expand = 16
    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, dim)).astype(np.float32)
    queries = rng.standard_normal((n_queries, dim)).astype(np.float32)
    names = [f"n{i}" for i in range(n)]

    log(f"devices: {jax.devices()}")
    idx = HNSWIndex(
        "bench", IndexConfig(dim=dim, m=m, ef_construction=efcon, seed=7)
    )
    log(f"native host core: {idx._native is not None}")
    t0 = time.perf_counter()
    idx.add_batch(names, data, batch_size=2048)
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

    q_dev = jnp.asarray(queries)  # one upload, reused

    # operating point: smallest work hitting recall >= 0.95 on the full
    # batch (the reference hardwires ef = efcon and has no such knobs)
    chosen = None
    for ef, iters in (
        (256, 16), (256, 20), (256, 24), (320, 24), (400, 28), (512, 36),
    ):
        res = idx.search_batch(
            q_dev, k, ef_search=ef, expand=expand, iters=iters
        )
        r = recall(res)
        log(f"ef={ef} iters={iters} expand={expand}: recall@{k}={r:.4f}")
        if r >= 0.95:
            chosen = (ef, iters, r)
            break
    if chosen is None:
        chosen = (512, 36, r)
    ef, iters, full_recall = chosen

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        idx.search_batch(q_dev, k, ef_search=ef, expand=expand, iters=iters)
    dt = (time.perf_counter() - t0) / reps
    qps = n_queries / dt
    log(
        f"batched: ef={ef} iters={iters} recall@{k}={full_recall:.4f} "
        f"{qps:.0f} qps ({dt * 1e3:.1f} ms / {n_queries} queries)"
    )

    # baseline: native sequential engine (reference-equivalent single
    # core) on the same graph at its parity setting ef = ef_construction
    n_base = 300
    t0 = time.perf_counter()
    for q in queries[:n_base]:
        idx.search_knn(q, k)
    base_dt = (time.perf_counter() - t0) / n_base
    base_qps = 1.0 / base_dt
    log(f"baseline sequential native: {base_qps:.1f} qps")

    print(
        json.dumps(
            {
                "metric": (
                    f"batched qps/chip at recall@10={full_recall:.3f} "
                    f"(10k x 128d, M={m}, efcon={efcon}, ef={ef}, "
                    f"expand={expand}, iters={iters}; build {build_s:.0f}s; "
                    f"baseline=native single-core search_knn)"
                ),
                "value": round(qps, 1),
                "unit": "qps/chip",
                "vs_baseline": round(qps / base_qps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
