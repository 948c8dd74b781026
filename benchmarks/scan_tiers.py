"""Scan-engine tier ladder at scale: exact / approx / bf16 on one chip.

Restores a staged checkpoint (benchmarks/million.py build) and measures
the four scan-engine operating points at B=2048, k=10:

    exact        f32 selection + exact top_k          (recall 1.0)
    certified    approx select + counting certificate (recall 1.0,
                 byte-identical to exact; fallback %% recorded)
    approx       f32 selection + oversampled approx_max_k
    bf16         bf16 selection + exact top_k
    bf16+approx  bf16 selection + oversampled approx_max_k

Recall is against the exact scan oracle on 256 held-out queries;
reported sims are f32-exact in every tier (ops/scan.py rescore).
Emits one JSON line and appends it to artifacts/scan_tiers.json.

    python benchmarks/scan_tiers.py /path/ckpt.npz [DIM]
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

from benchmarks.million import query_set, set_dim, snapshot_truth  # noqa: E402

K = 10
REPS = 3


def measure(idx, qd, engine: str, truth, **kw) -> dict:
    nm, _ = idx.search_batch(qd, K, engine=engine, reply="columnar", **kw)
    rec = sum(
        len(set(nm[b]) & truth[b]) for b in range(256)
    ) / (K * 256)
    t0 = time.perf_counter()
    for _ in range(REPS):
        idx.search_batch(qd, K, engine=engine, reply="columnar", **kw)
    dt = (time.perf_counter() - t0) / REPS
    return {"recall": round(rec, 4), "qps": round(qd.shape[0] / dt, 1)}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from redis_hnsw_tpu.utils.checkpoint import load_index

    ckpt = sys.argv[1]
    set_dim(int(sys.argv[2]) if len(sys.argv) > 2 else 128)
    t0 = time.perf_counter()
    idx = load_index(ckpt)
    load_s = time.perf_counter() - t0
    n = idx.node_count
    idx._capacity_hint = max(int(getattr(idx, "_capacity_hint", 0)), n)
    print(f"restored {n} rows in {load_s:.1f}s", flush=True)

    queries = query_set(2048, "clustered")
    qd = jnp.asarray(queries)
    truth = snapshot_truth(idx, queries[:256], K)

    from redis_hnsw_tpu.ops import scan as SC

    out = {
        "n": n, "dim": queries.shape[1], "b": 2048, "k": K,
        # self-labeling (cpu rows = smoke runs, not tier economics:
        # top_k is cheap on cpu so the select-bound analysis inverts)
        "platform": jax.devices()[0].platform,
    }
    # SCAN_TIERS_ONLY=exact,approx,... trims the ladder (each tier pays
    # a cold compile on a wiped cache -- a lean run keeps a bounded
    # measurement window honest).
    only = os.environ.get("SCAN_TIERS_ONLY", "")
    only_set = {s.strip() for s in only.split(",") if s.strip()}
    for label, engine, dt_env, cert in (
        ("exact", "scan", "f32", "0"),
        ("certified", "scan", "f32", "1"),
        ("approx", "scan-approx", "f32", "0"),
        ("bf16", "scan", "bf16", "0"),
        ("bf16_approx", "scan-approx", "bf16", "0"),
        ("int8", "scan", "int8", "0"),
        ("int8_approx", "scan-approx", "int8", "0"),
    ):
        if only_set and label not in only_set:
            continue
        os.environ["REDIS_HNSW_TPU_SCAN_DTYPE"] = dt_env
        os.environ["REDIS_HNSW_TPU_SCAN_CERT"] = cert
        q0, f0 = SC.CERT_STATS["queries"], SC.CERT_STATS["fallback_queries"]
        try:
            out[label] = measure(idx, qd, engine, truth)
            if cert == "1":
                out[label]["cert_fallback_pct"] = round(
                    100.0
                    * (SC.CERT_STATS["fallback_queries"] - f0)
                    / max(SC.CERT_STATS["queries"] - q0, 1),
                    3,
                )
            print(f"{label}: {out[label]}", flush=True)
        except Exception as e:  # OOM at this scale is a finding too
            out[label] = {"error": repr(e)}
            print(f"{label}: {e!r}", flush=True)
    os.environ.pop("REDIS_HNSW_TPU_SCAN_DTYPE", None)
    os.environ.pop("REDIS_HNSW_TPU_SCAN_CERT", None)

    # graph-beam rows at the same N (the >2M crossover comparison the
    # auto routing rests on, VERDICT r4 next#2): the sweep_1m operating
    # points, re-measured on THIS index so graph-vs-scan rows share a
    # build, a query set, and a window. Past the nbrvec HBM budget
    # (~1.9M rows int8) the beam runs its row-gather fallback -- that
    # cost is part of the regime, not an artifact.
    if hasattr(idx, "max_layer"):  # graph kinds only (not flat)
        for label, kw in (
            ("graph_ef256", dict(ef_search=256, expand=16, iters=24)),
            ("graph_ef512", dict(ef_search=512, expand=16, iters=40)),
        ):
            if only_set and label not in only_set:
                continue
            try:
                out[label] = measure(idx, qd, "graph", truth, **kw)
                print(f"{label}: {out[label]}", flush=True)
            except Exception as e:  # OOM at scale is a finding too
                out[label] = {"error": repr(e)}
                print(f"{label}: {e!r}", flush=True)

    line = json.dumps(out)
    print(line, flush=True)
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "artifacts", "scan_tiers.json")
    with open(art, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
