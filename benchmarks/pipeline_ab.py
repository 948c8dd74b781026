"""Pipelined serving A/B: dispatch-ahead depth vs the serialized loop.

search_batch splits query sets larger than MAX_LANES (2048) into
chunks; r4's pipelined drain (ops/search.py) keeps up to
REDIS_HNSW_TPU_PIPELINE chunks dispatched-but-unfetched so each
chunk's ~28ms dispatch+D2H round trip (the latency-bound tunnel,
CLAUDE.md) hides behind the following chunks' device compute instead
of serializing with it. This harness restores a staged checkpoint
(benchmarks/million.py build) and measures the SAME large query set
at depth 0 (the pre-r4 behavior) and pipelined depths, per engine.

Fairness: every arm performs one fetch per 2048-query chunk -- equal
fetch counts, the only timing-comparability rule on this box
(CLAUDE.md). Replies are asserted byte-identical across depths.

    python benchmarks/pipeline_ab.py /path/ckpt.npz [NBATCH] [DIM]

Emits one JSON line and appends it to artifacts/pipeline_ab.json.
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

from benchmarks.million import query_set, set_dim  # noqa: E402

K = 10
REPS = 3
DEPTHS = (0, 1, 2, 4)


def measure(idx, qd, engine: str, depth: int) -> dict:
    os.environ["REDIS_HNSW_TPU_PIPELINE"] = str(depth)
    nm, sims = idx.search_batch(qd, K, engine=engine, reply="columnar")
    t0 = time.perf_counter()
    for _ in range(REPS):
        idx.search_batch(qd, K, engine=engine, reply="columnar")
    dt = (time.perf_counter() - t0) / REPS
    return {
        "qps": round(qd.shape[0] / dt, 1),
        "wall_ms": round(dt * 1e3, 1),
    }, (nm, sims)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from redis_hnsw_tpu.utils.checkpoint import load_index

    ckpt = sys.argv[1]
    nbatch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    set_dim(int(sys.argv[3]) if len(sys.argv) > 3 else 128)
    t0 = time.perf_counter()
    idx = load_index(ckpt)
    print(f"restored {idx.node_count} rows in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    idx._capacity_hint = max(
        int(getattr(idx, "_capacity_hint", 0)), idx.node_count
    )

    queries = query_set(2048 * nbatch, "clustered")
    qd = jnp.asarray(queries)
    np.asarray(qd[0])  # force the one H2D before timing

    out = {
        "n": idx.node_count, "dim": queries.shape[1],
        "b": 2048, "nbatch": nbatch, "k": K,
        "platform": jax.devices()[0].platform,
    }
    for label, engine, cert in (
        ("exact", "scan", "0"),
        ("certified", "scan", "1"),
        ("approx", "scan-approx", "0"),
    ):
        os.environ["REDIS_HNSW_TPU_SCAN_CERT"] = cert
        row, ref = {}, None
        try:
            for depth in DEPTHS:
                row[f"d{depth}"], reply = measure(idx, qd, engine, depth)
                if ref is None:
                    ref = reply
                else:
                    assert (ref[0] == reply[0]).all(), (label, depth)
                    assert np.array_equal(ref[1], reply[1]), (label, depth)
                print(f"{label} depth={depth}: {row[f'd{depth}']}",
                      flush=True)
            base = row["d0"]["qps"]
            row["best_speedup"] = round(
                max(row[f"d{d}"]["qps"] for d in DEPTHS) / base, 2
            )
        except Exception as e:  # noqa: BLE001 -- a finding, not a crash
            row["error"] = repr(e)
            print(f"{label}: {e!r}", flush=True)
        out[label] = row
    os.environ.pop("REDIS_HNSW_TPU_SCAN_CERT", None)
    os.environ.pop("REDIS_HNSW_TPU_PIPELINE", None)

    line = json.dumps(out)
    print(line, flush=True)
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "artifacts", "pipeline_ab.json")
    with open(art, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
