"""Config-4 at scale: streaming 50/50 insert+query to >= 1M rows, staged.

BASELINE.json config 4 is "Deep10M 96-d with streaming 50/50
insert+query mix". This driver runs the mixed stream
(utils/streaming.py) to N rows of 96-d clustered vectors in resumable
stages (bounded wall-clock per invocation; checkpoint + stats carried
between stages), so a runner can drive it to any N:

    python benchmarks/streaming1m.py 1000000 200000 /path/ckpt.npz /path/stats.jsonl

arguments: N_total, stage_size, checkpoint path, stats path. Each
invocation streams one stage (insert waves interleaved with query
batches on the serving engine, incremental snapshot deltas), appends the
stage's stats as one JSON line, checkpoints, and exits. When the index
reaches N_total it prints the aggregate summary JSON and exits 0.
"""

from __future__ import annotations

import faulthandler
import json
import os
import signal
import sys
import time

import numpy as np

# kill -USR1 <pid> dumps all Python stacks to stderr (diagnosing a
# wedged tunnel RPC without a debugger on this box)
faulthandler.register(signal.SIGUSR1)

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

DIM, K = 96, 10
N_CENTERS, SIGMA = 4096, 0.8
EF, EXPAND, ITERS = 128, 16, 20
WAVE = 2048
# Serving engine for the stream's query batches. "auto" routes to the
# exact MXU scan at config-4 scale (recall 1.0 -- the r3 harness
# served the graph beam at ef=128 and measured 0.81-0.86, below the
# north star's 0.95 serving bar); REDIS_HNSW_TPU_STREAM_ENGINE=graph
# re-runs the traversal-under-mutation variant.
ENGINE = os.environ.get("REDIS_HNSW_TPU_STREAM_ENGINE", "auto")
# Overlapped interleave (utils/streaming.py): full-width query batches
# dispatched BEFORE each wave against the bounded-stale view. Since
# queries no longer ride between sub-waves (r5), slicing the wave only
# adds per-dispatch overhead (~2 fetch round trips per extra slice);
# default 1. slices > 1 remains the add_batch-equivalence-at-smaller-
# batch knob.
OVERLAP = os.environ.get("REDIS_HNSW_TPU_STREAM_OVERLAP", "0") == "1"
SLICES = int(os.environ.get("REDIS_HNSW_TPU_STREAM_SLICES", "1"))


def log(*a):
    print(*a, flush=True)


def dataset(n: int) -> np.ndarray:
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((N_CENTERS, DIM)).astype(np.float32)
    assign = rng.integers(0, N_CENTERS, n)
    out = centers[assign]
    out += SIGMA * rng.standard_normal((n, DIM)).astype(np.float32)
    return out


def query_pool(n_q: int) -> np.ndarray:
    rng = np.random.default_rng(1)
    centers = (
        np.random.default_rng(0)
        .standard_normal((N_CENTERS, DIM))
        .astype(np.float32)
    )
    assign = rng.integers(0, N_CENTERS, n_q)
    return (
        centers[assign]
        + SIGMA * rng.standard_normal((n_q, DIM)).astype(np.float32)
    )


def main() -> None:
    from redis_hnsw_tpu import HNSWIndex, IndexConfig
    from redis_hnsw_tpu.utils.checkpoint import load_index, save_index
    from redis_hnsw_tpu.utils.streaming import run_mixed

    n_total, stage = int(sys.argv[1]), int(sys.argv[2])
    ckpt, stats_path = sys.argv[3], sys.argv[4]

    if os.path.exists(ckpt):
        t0 = time.perf_counter()
        idx = load_index(ckpt)
        log(f"resume: {idx.node_count} rows "
            f"({time.perf_counter()-t0:.1f}s load)")
    else:
        idx = HNSWIndex(
            "s1m",
            IndexConfig(dim=DIM, m=16, ef_construction=200, seed=7),
        )
    start = idx.node_count
    if start >= n_total:
        summarize(stats_path, n_total)
        return

    hi = min(start + stage, n_total)
    data = dataset(n_total)[start:hi]
    names = [f"n{i}" for i in range(start, hi)]
    queries = query_pool(4096)
    idx._capacity_hint = n_total

    stats = run_mixed(
        idx, names, data, queries, k=K,
        insert_wave=WAVE, query_batch=WAVE,
        ef_search=EF, expand=EXPAND, iters=ITERS,
        validate_every=16, capacity_hint=n_total, engine=ENGINE,
        overlap=OVERLAP, slices=SLICES,
        progress=lambda ph, at, el: (
            log(f"wave {ph}: {at} rows, {el:.0f}s, "
                f"{(at - start) / max(el, 1e-9):.0f}/s")
            if ph % 16 == 0 else None
        ),
    )
    s = stats.summary()
    s["start"], s["end"] = start, hi
    s["engine"] = ENGINE
    if OVERLAP:
        s["overlap"], s["slices"] = True, SLICES
    # recall of the stream's serving path vs the exact scan engine
    try:
        probe = queries[:256]
        nm, _ = idx.search_batch(probe, K, engine="scan",
                                 reply="columnar")
        truth = [set(r) for r in nm]
        res = idx.search_batch(probe, K, ef_search=EF, expand=EXPAND,
                               iters=ITERS, engine=ENGINE)
        s["recall"] = round(sum(
            len({r.name for r in rr} & truth[b])
            for b, rr in enumerate(res)
        ) / (K * len(res)), 4)
        # the graph's recall at the stream ef budget, for context
        res_g = idx.search_batch(probe, K, ef_search=EF, expand=EXPAND,
                                 iters=ITERS, engine="graph")
        s["graph_recall_at_ef"] = round(sum(
            len({r.name for r in rr} & truth[b])
            for b, rr in enumerate(res_g)
        ) / (K * len(res_g)), 4)
    except Exception as e:  # pragma: no cover
        s["recall_error"] = repr(e)
    with open(stats_path, "a") as f:
        f.write(json.dumps(s) + "\n")
    log(f"stage {start}..{hi}: {s}")

    t0 = time.perf_counter()
    save_index(idx, ckpt, compress=False)
    log(f"checkpoint save: {time.perf_counter()-t0:.1f}s")
    if hi >= n_total:
        summarize(stats_path, n_total)


def summarize(stats_path: str, n_total: int) -> None:
    """Aggregate all stages into the config-4 record."""
    rows = [json.loads(l) for l in open(stats_path)]
    el = sum(r["elapsed_s"] for r in rows)
    ins = sum(r["inserts"] for r in rows)
    qs = sum(r["queries"] for r in rows)
    out = {
        "config": "4-streaming-50-50",
        "dim": DIM, "n": n_total, "stages": len(rows),
        "engine": rows[-1].get("engine", "graph"),
        "elapsed_s": round(el, 1),
        "inserts_per_s": round(ins / el, 1),
        "qps": round(qs / el, 1),
        "ef_search": EF,
        "insert_p95_ms": max(r["insert_p95_ms"] for r in rows),
        "query_p95_ms": max(r["query_p95_ms"] for r in rows),
        "first_stage_inserts_per_s": rows[0]["inserts_per_s"],
        # steady = compile-spike waves excluded (MixedStats.steady);
        # per-stage values weighted by stage elapsed time
        "inserts_per_s_steady": (
            round(
                sum(
                    r["inserts_per_s_steady"]
                    * (r["elapsed_s"] - r.get("compile_spike_s", 0.0))
                    for r in rows
                    if "inserts_per_s_steady" in r
                )
                / max(
                    sum(
                        r["elapsed_s"] - r.get("compile_spike_s", 0.0)
                        for r in rows
                        if "inserts_per_s_steady" in r
                    ),
                    1e-9,
                ),
                1,
            )
            if any("inserts_per_s_steady" in r for r in rows)
            else None
        ),
        "last_stage_inserts_per_s": rows[-1]["inserts_per_s"],
        "last_stage_qps": rows[-1]["qps"],
        "recall_min": min(
            (r["recall"] for r in rows if "recall" in r), default=None
        ),
        "graph_recall_at_ef_last": rows[-1].get("graph_recall_at_ef"),
    }
    if rows[-1].get("overlap"):
        out["overlap"], out["slices"] = True, rows[-1].get("slices")
    for key in ("insert_total_s", "query_total_s", "validate_total_s",
                "other_total_s"):
        if key in rows[-1]:
            out[key] = round(
                sum(r.get(key, 0.0) for r in rows), 1
            )
    log("AGGREGATE " + json.dumps(out))
    agg = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "artifacts", "streaming1m_aggregate.json",
    )
    # append: serial and overlap records coexist (one line each run)
    with open(agg, "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
