"""4M-rows-on-one-chip flat (scan-only) capacity demo.

The graph index's per-chip ceiling is ~1.9M rows (the int8 nbrvec tier
budget, benchmarks/capacity19.py). Vector serving without a graph has
no such ceiling until the raw f32 table fills HBM: this demo builds a
4,000,000 x 128d FlatIndex (2GB device table), runs the exact MXU scan
(recall 1.0 by construction) and the opt-in approx-select tier, and
emits one JSON line appended to artifacts/flat4m.json.

    python benchmarks/flat4m.py [N] [DIM]

Uses the clustered mixture from benchmarks/million.py (held-out
queries) so recall of the approx tier is measured against the exact
scan on the same index.
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

from benchmarks.million import dataset, query_set, set_dim  # noqa: E402

K, B, REPS = 10, 2048, 3


def main() -> None:
    from redis_hnsw_tpu import IndexConfig
    from redis_hnsw_tpu.models.flat import FlatIndex

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    set_dim(dim)

    t0 = time.perf_counter()
    data = dataset(n)
    gen_s = time.perf_counter() - t0
    idx = FlatIndex(
        "flat4m", IndexConfig(dim=dim, capacity=n, fixed_capacity=True)
    )
    t0 = time.perf_counter()
    idx.add_batch([f"n{i}" for i in range(n)], data)
    build_s = time.perf_counter() - t0
    del data
    print(f"built {n} rows in {build_s:.1f}s (datagen {gen_s:.1f}s)",
          flush=True)

    import jax.numpy as jnp

    queries = jnp.asarray(query_set(B, "clustered"))  # one upload
    out = {"n": n, "dim": dim, "b": B, "k": K,
           "build_s": round(build_s, 1),
           "table_gb": round(n * dim * 4 / 2**30, 2)}

    # exact scan (includes the one-time 2GB table upload + compiles in
    # the first call; steady reps timed after)
    t0 = time.perf_counter()
    res = idx.search_batch(queries, K)
    out["first_call_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    for _ in range(REPS):
        idx.search_batch(queries, K)
    dt = (time.perf_counter() - t0) / REPS
    out["exact"] = {"recall": 1.0, "qps": round(B / dt, 1)}
    print(f"exact: {out['exact']}", flush=True)

    truth = [{r.name for r in rr} for rr in res]
    ares = idx.search_batch(queries, K, approx=True)
    rec = sum(
        len({r.name for r in ares[b]} & truth[b]) for b in range(B)
    ) / (K * B)
    t0 = time.perf_counter()
    for _ in range(REPS):
        idx.search_batch(queries, K, approx=True)
    dt = (time.perf_counter() - t0) / REPS
    out["approx"] = {"recall": round(rec, 4), "qps": round(B / dt, 1)}
    print(f"approx: {out['approx']}", flush=True)

    line = json.dumps(out)
    print(line, flush=True)
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "artifacts", "flat4m.json")
    with open(art, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
