"""Graph-engine recall/qps frontier push at 1M (VERDICT r4 next#6).

The committed sweep (artifacts/sweep_1m.json) walks a fixed
(ef, expand=16, iters) ladder and lands 0.944@5.7k / 0.973@4.6k around
the 0.95 bar. This probe searches the NEIGHBORHOOD of that bar over
the axes the ladder never moved:

* expand width (wider multi-expand = fewer, wider sort steps: the beam
  is sort-bound, and sort cost grows sub-linearly with width on the
  VPU -- measured [2048, 464/928/1456] multi-operand sorts within
  0.82-1.24x of each other, PLAN.md r3),
* iters right-sizing (the ladder tied iters to ef/expand; the recall
  tail may converge earlier),
* lazy-dedup on the WIDE-expand points (its one-dropped-sort economics
  change with expand; the 1M measurements that parked it opt-in were
  at expand=16).

Emits one JSON line per point, appends the full grid to
artifacts/graph_frontier_1m.json, and reports the best point with
recall >= 0.95 (the north-star bar) by qps.

    python benchmarks/graph_frontier.py /tmp/m1.ckpt.npz

Reference frame: core.rs:607-675 (search_level) is the engine this
frontier characterizes; the reference itself has no knobs -- it always
pays ef = ef_construction (core.rs:485).
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

from benchmarks.million import query_set, snapshot_truth  # noqa: E402

K = 10
REPS = 3

GRID = [
    # (ef, expand, iters, lazy, seeds)
    (256, 16, 24, False, 0),   # committed sweep point (re-measure anchor)
    (256, 16, 28, False, 0),
    (288, 16, 26, False, 0),
    (256, 24, 18, False, 0),
    (320, 24, 18, False, 0),
    (256, 32, 14, False, 0),
    (320, 32, 14, False, 0),
    (384, 32, 16, False, 0),
    (320, 32, 14, True, 0),
    (384, 32, 16, True, 0),
    # seeded multi-entrypoint beams (VERDICT r4 next#6): on clustered
    # data the planted neighbor lives in a specific cluster; per-lane
    # pivot entrypoints may land the beam there cheaper than more iters
    (256, 16, 24, False, 8),
    (256, 24, 18, False, 8),
    (320, 32, 14, False, 8),
    (256, 16, 20, False, 16),
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax.numpy as jnp

    from redis_hnsw_tpu.utils.checkpoint import load_index

    ckpt = sys.argv[1] if len(sys.argv) > 1 else "/tmp/m1.ckpt.npz"
    t0 = time.perf_counter()
    idx = load_index(ckpt)
    log(f"restored {idx.node_count} rows in {time.perf_counter()-t0:.1f}s")
    idx._capacity_hint = max(
        int(getattr(idx, "_capacity_hint", 0)), idx.node_count
    )

    queries = query_set(2048, "clustered")
    qd = jnp.asarray(queries)
    truth = snapshot_truth(idx, queries[:256], K)

    from redis_hnsw_tpu.ops.search import search_batch_jit

    rows = []
    best = None
    prev_lazy = False
    for ef, ex, it, lazy, seeds in GRID:
        os.environ["REDIS_HNSW_TPU_LAZY_DEDUP"] = "1" if lazy else "0"
        if lazy != prev_lazy:
            # the flag is read at trace time and is NOT part of the jit
            # key: an (ef, expand, iters) repeat across the flip would
            # silently reuse the other mode's program
            search_batch_jit.clear_cache()
        prev_lazy = lazy
        res = idx.search_batch(
            qd[:256], K, ef_search=ef, expand=ex, iters=it,
            engine="graph", seeds=seeds,
        )
        rec = sum(
            len({r.name for r in rr} & truth[b])
            for b, rr in enumerate(res)
        ) / (K * len(res))
        idx.search_batch(qd, K, ef_search=ef, expand=ex, iters=it,
                         engine="graph", seeds=seeds)  # warm B=2048
        t0 = time.perf_counter()
        for _ in range(REPS):
            idx.search_batch(qd, K, ef_search=ef, expand=ex, iters=it,
                             engine="graph", seeds=seeds)
        dt = (time.perf_counter() - t0) / REPS
        row = {"ef": ef, "expand": ex, "iters": it, "lazy": lazy,
               "seeds": seeds,
               "recall": round(rec, 4), "qps": round(2048 / dt, 1)}
        rows.append(row)
        log(f"point {row}")
        if rec >= 0.95 and (best is None or row["qps"] > best["qps"]):
            best = row
    os.environ.pop("REDIS_HNSW_TPU_LAZY_DEDUP", None)

    out = {"n": idx.node_count, "kind": "clustered", "b": 2048, "k": K,
           "build_l0_env": os.environ.get(
               "REDIS_HNSW_TPU_BUILD_L0", "auto"),
           "grid": rows, "best_at_95": best}
    line = json.dumps(out)
    print(line, flush=True)
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "artifacts", "graph_frontier_1m.json")
    with open(art, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
