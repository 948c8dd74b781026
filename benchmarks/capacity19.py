"""1.9M-rows-on-one-chip capacity demo (int8 nbrvec tier).

Loads the staged 1.9M checkpoint, verifies the snapshot landed on the
int8 tier with hint-exact (non-pow2) row padding, runs both engines
(auto = exact MXU scan at this scale; graph beam at ef=512), and
re-checkpoints. Emits one JSON line.

    python benchmarks/capacity19.py /path/ckpt.npz
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


def main() -> None:
    import jax.numpy as jnp

    from redis_hnsw_tpu.utils.checkpoint import load_index, save_index

    ckpt = sys.argv[1]
    set_dim(128)
    t0 = time.perf_counter()
    idx = load_index(ckpt)
    load_s = time.perf_counter() - t0
    n = idx.node_count
    # checkpoints now persist the capacity hint; older ones (like a
    # build driven before that change) restore without it -- re-declare
    # so the snapshot pads hint-exact instead of pow2
    idx._capacity_hint = max(int(getattr(idx, "_capacity_hint", 0)), n)
    print(f"restored {n} rows in {load_s:.1f}s", flush=True)

    snap = idx.device_snapshot()
    out = {
        "n": n,
        "restore_s": round(load_s, 1),
        "n_pad": snap.n_pad,
        "pow2_pad_would_be": 1 << (snap.n_pad - 1).bit_length(),
        "nbrvec_dtype": str(snap.nbrvec.dtype)
        if snap.nbrvec is not None else None,
    }

    queries = query_set(2048, "clustered")
    qd = jnp.asarray(queries)
    truth = snapshot_truth(idx, queries[:256], K)

    # auto engine (exact scan at 1.9M < the crossover)
    nm, _ = idx.search_batch(qd, K, reply="columnar")
    rec = sum(
        len(set(nm[b]) & truth[b]) for b in range(256)
    ) / (K * 256)
    t0 = time.perf_counter()
    for _ in range(3):
        idx.search_batch(qd, K, reply="columnar")
    dt = (time.perf_counter() - t0) / 3
    out["scan"] = {"recall": round(rec, 4), "qps": round(2048 / dt, 1)}
    print(f"scan: recall={rec:.4f} qps={2048/dt:.0f}", flush=True)
    # at 1.9M the default exact scan rides the certified selector
    # (ops/scan.py cert_enabled); record the fallback economics
    from redis_hnsw_tpu.ops.scan import CERT_STATS

    out["cert_stats"] = dict(CERT_STATS)

    # pipelined serving: 8 batches through the chunked loop -- the
    # per-batch fetch round trip hides behind the next chunks'
    # compute and certified fallbacks coalesce into one rerun
    # (ops/search.py; artifacts/pipeline_ab.json)
    qs8 = jnp.asarray(query_set(2048 * 8, "clustered"))
    np.asarray(qs8[0])  # force the H2D before timing
    idx.search_batch(qs8, K, reply="columnar")
    t0 = time.perf_counter()
    for _ in range(3):
        idx.search_batch(qs8, K, reply="columnar")
    dt = (time.perf_counter() - t0) / 3
    # qps-only: recall is a property of the engine, measured on the
    # truth-covered qd set above (the serve set has no exact truth)
    out["scan_serve_8batch"] = {"qps": round(2048 * 8 / dt, 1)}
    print(f"scan serve 8-batch: qps={2048 * 8 / dt:.0f}", flush=True)

    # approx tier, single + pipelined
    nm_a, _ = idx.search_batch(
        qd, K, engine="scan-approx", reply="columnar"
    )
    rec_a = sum(
        len(set(nm_a[b]) & truth[b]) for b in range(256)
    ) / (K * 256)
    t0 = time.perf_counter()
    for _ in range(3):
        idx.search_batch(qd, K, engine="scan-approx", reply="columnar")
    dt = (time.perf_counter() - t0) / 3
    out["scan_approx"] = {
        "recall": round(rec_a, 4), "qps": round(2048 / dt, 1),
    }
    idx.search_batch(qs8, K, engine="scan-approx", reply="columnar")
    t0 = time.perf_counter()
    for _ in range(3):
        idx.search_batch(qs8, K, engine="scan-approx", reply="columnar")
    dt = (time.perf_counter() - t0) / 3
    out["scan_approx_serve_8batch"] = {"qps": round(2048 * 8 / dt, 1)}
    print(f"approx: {out['scan_approx']} / serve "
          f"{out['scan_approx_serve_8batch']}", flush=True)

    # graph beam on the int8 blocked tier
    res = idx.search_batch(
        qd[:256], K, ef_search=512, expand=16, iters=40, engine="graph"
    )
    grec = sum(
        len({r.name for r in rr} & truth[b])
        for b, rr in enumerate(res)
    ) / (K * 256)
    idx.search_batch(qd, K, ef_search=512, expand=16, iters=40,
                     engine="graph")
    t0 = time.perf_counter()
    for _ in range(3):
        idx.search_batch(qd, K, ef_search=512, expand=16, iters=40,
                         engine="graph")
    dt = (time.perf_counter() - t0) / 3
    out["graph_ef512"] = {
        "recall": round(grec, 4), "qps": round(2048 / dt, 1),
    }
    print(f"graph ef=512: recall={grec:.4f} qps={2048/dt:.0f}",
          flush=True)

    t0 = time.perf_counter()
    save_index(idx, ckpt + ".resaved", compress=False)
    out["checkpoint_save_s"] = round(time.perf_counter() - t0, 1)
    os.remove(ckpt + ".resaved")
    line = json.dumps(out)
    print(line, flush=True)
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "artifacts", "capacity_1900k.json")
    with open(art, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
