"""Million-vector capability run (BASELINE.json config-2 scale).

Builds a 1M x 128d index via device-scored waves, then measures batched
search throughput, the native sequential baseline on the same graph, and
checkpoint save/restore time. Random vectors stand in for SIFT1M (no
dataset egress on this box); random 128-d data is the *hardest* case for
graph recall, so treat recall here as a floor, not a ceiling.

    python benchmarks/million.py [n]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def main(n: int = 1_000_000) -> None:
    import jax
    import jax.numpy as jnp

    from redis_hnsw_tpu import HNSWIndex, IndexConfig
    from redis_hnsw_tpu.models.flat import FlatIndex

    dim, k, m, efcon = 128, 10, 16, 200
    n_queries = 1024
    rng = np.random.default_rng(0)
    log(f"devices: {jax.devices()}; n={n}")
    data = rng.standard_normal((n, dim)).astype(np.float32)
    queries = rng.standard_normal((n_queries, dim)).astype(np.float32)
    names = [f"n{i}" for i in range(n)]

    idx = HNSWIndex(
        "m1", IndexConfig(dim=dim, m=m, ef_construction=efcon, seed=7)
    )
    t0 = time.perf_counter()
    done = [0]

    from redis_hnsw_tpu.ops import construct as C

    orig = C._insert_wave

    def progress_wave(index, wn, wd, ef):
        orig(index, wn, wd, ef)
        done[0] += len(wn)
        if done[0] % 65536 < len(wn):
            el = time.perf_counter() - t0
            log(
                f"  built {done[0]}/{n} in {el:.0f}s "
                f"({done[0]/el:.0f} adds/s)"
            )

    C._insert_wave = progress_wave
    idx.add_batch(names, data, batch_size=2048)
    build_s = time.perf_counter() - t0
    log(f"build: {n} in {build_s:.0f}s ({n/build_s:.0f} adds/s)")

    # exact ground truth on a query subset via the flat MXU scan
    oracle = FlatIndex("o", IndexConfig(dim=dim))
    oracle.add_batch(names, data)
    t0 = time.perf_counter()
    truth = oracle.search_batch(queries[:256], k)
    log(f"oracle scan 256q: {time.perf_counter()-t0:.1f}s")
    truth_sets = [{r.name for r in t} for t in truth]

    qd = jnp.asarray(queries)
    results = {"n": n, "build_s": round(build_s, 1)}
    for ef, ex, it in ((256, 16, 24), (512, 16, 40)):
        res = idx.search_batch(qd[:256], k, ef_search=ef, expand=ex, iters=it)
        rec = sum(
            len({r.name for r in rr} & truth_sets[b])
            for b, rr in enumerate(res)
        ) / (k * len(res))
        t0 = time.perf_counter()
        for _ in range(3):
            idx.search_batch(qd, k, ef_search=ef, expand=ex, iters=it)
        dt = (time.perf_counter() - t0) / 3
        log(
            f"ef={ef} ex={ex} it={it}: recall@{k}={rec:.4f} "
            f"qps={n_queries/dt:.0f}"
        )
        results[f"ef{ef}"] = {
            "recall": round(rec, 4), "qps": round(n_queries / dt, 1)
        }

    t0 = time.perf_counter()
    for q in queries[:50]:
        idx.search_knn(q, k)
    base_qps = 50 / (time.perf_counter() - t0)
    log(f"native sequential baseline: {base_qps:.0f} qps")
    results["baseline_qps"] = round(base_qps, 1)

    t0 = time.perf_counter()
    from redis_hnsw_tpu.utils.checkpoint import load_index, save_index

    save_index(idx, "/tmp/m1.npz")
    results["checkpoint_save_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    back = load_index("/tmp/m1.npz")
    results["checkpoint_load_s"] = round(time.perf_counter() - t0, 1)
    assert back.node_count == n
    log(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
