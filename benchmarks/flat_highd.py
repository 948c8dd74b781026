"""GIST1M-shaped flat tier ladder: 1M x 960d on one chip.

The 200k x 960d graph-index row (artifacts/scan_tiers.json) showed the
counting certificate LOSING to plain exact below the auto gate at high
D: the count pass re-pays a D-scaled matmul while the top_k it saves is
D-independent. This benchmark asks the question the gate actually
decides — does the certificate still pay ABOVE CERT_MIN_ROWS (2^19
rows) when D is large? A FlatIndex needs no graph build, so the
1M x 960d operating point (the GIST1M shape, 3.6GB f32 table) is cheap
to stand up. Measures exact (CERT=0), certified (CERT=1 == the auto
default at 1M) and approx single-batch qps, plus pipelined 8-batch
serving for the two recall-1.0 contenders.

    python benchmarks/flat_highd.py [N] [DIM]

Emits one JSON line appended to artifacts/flat_highd.json.
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

K, B, NBATCH, REPS = 10, 2048, 8, 3


def _recall(res, truth) -> float:
    return sum(
        len({r.name for r in res[b]} & truth[b]) for b in range(len(truth))
    ) / (K * len(truth))


def main() -> None:
    from redis_hnsw_tpu import IndexConfig
    from redis_hnsw_tpu.models.flat import FlatIndex
    from redis_hnsw_tpu.ops import scan as SC

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 960
    set_dim(dim)

    t0 = time.perf_counter()
    data = dataset(n)
    gen_s = time.perf_counter() - t0
    idx = FlatIndex(
        "flat_highd", IndexConfig(dim=dim, capacity=n, fixed_capacity=True)
    )
    t0 = time.perf_counter()
    idx.add_batch([f"n{i}" for i in range(n)], data)
    build_s = time.perf_counter() - t0
    del data
    print(f"built {n} x {dim}d in {build_s:.1f}s (datagen {gen_s:.1f}s)",
          flush=True)

    import jax

    import jax.numpy as jnp

    queries = query_set(B * NBATCH, "clustered")
    qd = jnp.asarray(queries)  # one H2D for the whole serve block
    q1 = qd[:B]

    out = {
        "n": n, "dim": dim, "b": B, "k": K,
        "platform": jax.devices()[0].platform,
        "table_gb": round(n * dim * 4 / 2**30, 2),
        "build_s": round(build_s, 1),
    }

    os.environ["REDIS_HNSW_TPU_SCAN_CERT"] = "0"
    t0 = time.perf_counter()
    res = idx.search_batch(q1, K)
    out["first_call_s"] = round(time.perf_counter() - t0, 1)
    truth = [{r.name for r in rr} for rr in res[:256]]

    for label, cert, approx in (
        ("exact", "0", False),
        ("certified", "1", False),
        ("approx", "0", True),
    ):
        os.environ["REDIS_HNSW_TPU_SCAN_CERT"] = cert
        q0, f0 = SC.CERT_STATS["queries"], SC.CERT_STATS["fallback_queries"]
        res = idx.search_batch(q1, K, approx=approx)  # warm compile
        rec = _recall(res, truth)
        t0 = time.perf_counter()
        for _ in range(REPS):
            idx.search_batch(q1, K, approx=approx)
        dt = (time.perf_counter() - t0) / REPS
        row = {"recall": round(rec, 4), "qps": round(B / dt, 1)}
        if cert == "1":
            row["cert_fallback_pct"] = round(
                100.0
                * (SC.CERT_STATS["fallback_queries"] - f0)
                / max(SC.CERT_STATS["queries"] - q0, 1),
                3,
            )
        out[label] = row
        print(f"{label}: {row}", flush=True)

    # pipelined 8-batch serving for the recall-1.0 contenders + approx
    for label, cert, approx in (
        ("exact_serve", "0", False),
        ("certified_serve", "1", False),
        ("approx_serve", "0", True),
    ):
        os.environ["REDIS_HNSW_TPU_SCAN_CERT"] = cert
        idx.search_batch(qd, K, approx=approx)  # warm
        t0 = time.perf_counter()
        idx.search_batch(qd, K, approx=approx)
        dt = time.perf_counter() - t0
        out[label] = {"qps": round(B * NBATCH / dt, 1)}
        print(f"{label}: {out[label]}", flush=True)
    os.environ.pop("REDIS_HNSW_TPU_SCAN_CERT", None)

    line = json.dumps(out)
    print(line, flush=True)
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "artifacts", "flat_highd.json")
    with open(art, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
