"""Fetch-window A/B: coalesced multi-batch D2H vs one fetch per batch.

The tunnel's D2H cost is per-TRANSFER (~28ms round trip whether the
reply is 80KB or 1.3MB -- CLAUDE.md, artifacts/cert_breakdown.json).
r4's pipelined drain already HIDES that round trip behind the next
chunks' device compute; REDIS_HNSW_TPU_FETCH_WINDOW=W goes further and
REMOVES W-1 of every W transfers by concatenating W batches' packed
replies device-side (ops/scan.py FetchGroup) and fetching the blob
once. This harness restores a staged checkpoint (million.py build) and
serves the SAME large query set at window 1 (the r4 pipelined
baseline) and windows 2/4/8, per engine, at the default pipeline
depth. Replies are asserted byte-identical across windows.

    python benchmarks/fetch_window_ab.py /path/ckpt.npz [NBATCH] [DIM]
    python benchmarks/fetch_window_ab.py synth:N [NBATCH] [DIM]

The ``synth:N`` form builds a fresh N-row clustered index in-process
(cheap at bench scale) instead of restoring a checkpoint — the
small-N regime is where even the EXACT scan's per-batch device time
is tiny next to the ~28ms round trip, so the window should pay on
every engine there (at 1M it pays only on the cheap-select engines).
The graph engine is measured too in synth mode (it is compute-bound
at capacity scale but cheap at 10k).

Emits one JSON line and appends it to artifacts/fetch_window_ab.json.
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
WINDOWS = (1, 2, 4, 8)


def measure(idx, qd, engine: str, window: int) -> dict:
    os.environ["REDIS_HNSW_TPU_FETCH_WINDOW"] = str(window)
    nm, sims = idx.search_batch(qd, K, engine=engine, reply="columnar")
    t0 = time.perf_counter()
    for _ in range(REPS):
        idx.search_batch(qd, K, engine=engine, reply="columnar")
    dt = (time.perf_counter() - t0) / REPS
    return {
        "qps": round(qd.shape[0] / dt, 1),
        "wall_ms": round(dt * 1e3, 1),
    }, (nm, sims)


def build_synth(n: int, dim: int):
    from redis_hnsw_tpu import HNSWIndex, IndexConfig

    from benchmarks.million import dataset

    data = dataset(n)
    idx = HNSWIndex(
        "fw_synth",
        IndexConfig(dim=dim, m=16, ef_construction=200, seed=7,
                    capacity=n, fixed_capacity=True),
    )
    t0 = time.perf_counter()
    idx.add_batch([f"n{i}" for i in range(n)], data, batch_size=2048)
    print(f"built {n} rows in {time.perf_counter() - t0:.1f}s",
          flush=True)
    return idx


def main() -> None:
    import jax
    import jax.numpy as jnp

    from redis_hnsw_tpu.utils.checkpoint import load_index

    ckpt = sys.argv[1]
    nbatch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    set_dim(int(sys.argv[3]) if len(sys.argv) > 3 else 128)
    if ckpt.startswith("synth:"):
        idx = build_synth(int(ckpt.split(":", 1)[1]),
                          int(sys.argv[3]) if len(sys.argv) > 3 else 128)
    else:
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
        "pipeline_depth": int(
            os.environ.get("REDIS_HNSW_TPU_PIPELINE", "2") or 2
        ),
        "platform": jax.devices()[0].platform,
    }
    arms = [
        ("exact", "scan", "0"),
        ("certified", "scan", "1"),
        ("approx", "scan-approx", "0"),
    ]
    if ckpt.startswith("synth:"):
        arms.append(("graph", "graph", "0"))
    for label, engine, cert in arms:
        os.environ["REDIS_HNSW_TPU_SCAN_CERT"] = cert
        row, ref = {}, None
        try:
            for window in WINDOWS:
                row[f"w{window}"], reply = measure(idx, qd, engine, window)
                if ref is None:
                    ref = reply
                else:
                    assert (ref[0] == reply[0]).all(), (label, window)
                    assert np.array_equal(ref[1], reply[1]), (label, window)
                print(f"{label} window={window}: {row[f'w{window}']}",
                      flush=True)
            base = row["w1"]["qps"]
            row["best_speedup"] = round(
                max(row[f"w{w}"]["qps"] for w in WINDOWS) / base, 2
            )
        except Exception as e:  # noqa: BLE001 -- a finding, not a crash
            row["error"] = repr(e)
            print(f"{label}: {e!r}", flush=True)
        out[label] = row
    os.environ.pop("REDIS_HNSW_TPU_SCAN_CERT", None)
    os.environ.pop("REDIS_HNSW_TPU_FETCH_WINDOW", None)

    line = json.dumps(out)
    print(line, flush=True)
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "artifacts", "fetch_window_ab.json")
    with open(art, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
