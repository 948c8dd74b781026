"""Sharded-search merge scaling: cost of the [S, B, k] top-k merge.

The sharded engines (parallel/sharded.py) do ALL cross-chip
communication in one place: each shard returns its local top-k, and a
single all-gather + top_k merges [S, B, k] candidates. This benchmark
characterizes that merge as the shard count grows, on the one real
chip available (the merge COMPUTATION is what is measured; on real
multi-chip the preceding all-gather is the only collective and its
cost is analytic: S*B*k*8 bytes over ICI).

For each S it times:
  * the merge program alone (transpose + reshape + top_k +
    take_along_axis -- byte-identical to _sharded_search_jit's tail);
  * a per-shard scan of (1M / S) rows for context ("the merge is X%
    of one shard's local work").

Emits one JSON line appended to artifacts/merge_scaling.json. Run:

    python benchmarks/merge_scaling.py [B] [K]
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

REPS = 20
N_TOTAL = 1 << 20
DIM = 128

# v5e ICI: ~45 GB/s per direction per link (public spec figure used
# for the analytic all-gather estimate only; nothing here depends on
# it at runtime).
ICI_GBPS = 45.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from redis_hnsw_tpu.ops.scan import scan_topk_exact_l2

    @partial(jax.jit, static_argnames=("k",))
    def merge_topk(gids, sims, *, k: int):
        S, B, _ = gids.shape
        flat_sims = jnp.transpose(sims, (1, 0, 2)).reshape(B, S * k)
        flat_gids = jnp.transpose(gids, (1, 0, 2)).reshape(B, S * k)
        top_sims, idx = jax.lax.top_k(flat_sims, k)
        top_gids = jnp.take_along_axis(flat_gids, idx, axis=1)
        return top_gids, top_sims

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rng = np.random.default_rng(0)
    out = {
        "b": B, "k": K, "n_total": N_TOTAL, "dim": DIM,
        # records are self-labeling: CPU-backend rows characterize the
        # merge's SHAPE scaling only; absolute ms are only meaningful
        # on the tpu platform rows
        "platform": jax.devices()[0].platform,
        "device": jax.devices()[0].device_kind,
        "rows": [],
    }

    queries = jnp.asarray(
        rng.standard_normal((B, DIM)).astype(np.float32)
    )
    for S in (2, 4, 8, 16):
        sims = jnp.asarray(
            -rng.random((S, B, K), np.float32).cumsum(axis=2)
        )
        gids = jnp.asarray(
            rng.integers(0, N_TOTAL, (S, B, K), dtype=np.int32)
        )
        g, s = merge_topk(gids, sims, k=K)  # compile
        np.asarray(g)
        t0 = time.perf_counter()
        for _ in range(REPS):
            g, s = merge_topk(gids, sims, k=K)
        np.asarray(g), np.asarray(s)
        merge_ms = (time.perf_counter() - t0) / REPS * 1e3

        # one shard's local work at this S (1M rows hash-split S ways)
        n_shard = N_TOTAL // S
        vecs = jnp.asarray(
            rng.standard_normal((n_shard, DIM)).astype(np.float32)
        )
        sqn = jnp.sum(vecs * vecs, axis=1)
        live = jnp.ones(n_shard, bool)
        ids, ss = scan_topk_exact_l2(
            vecs, sqn, live, queries, k=K, approx=True
        )  # compile
        np.asarray(ids)
        t0 = time.perf_counter()
        for _ in range(REPS):
            ids, ss = scan_topk_exact_l2(
                vecs, sqn, live, queries, k=K, approx=True
            )
        np.asarray(ids), np.asarray(ss)
        shard_ms = (time.perf_counter() - t0) / REPS * 1e3
        del vecs, sqn

        gather_bytes = S * B * K * 8  # ids int32 + sims f32
        ici_us = gather_bytes / (ICI_GBPS * 1e9) * 1e6
        row = {
            "s": S,
            "merge_ms": round(merge_ms, 3),
            "shard_scan_ms": round(shard_ms, 2),
            "merge_pct_of_shard": round(100 * merge_ms / shard_ms, 2),
            "allgather_bytes": gather_bytes,
            "ici_est_us": round(ici_us, 1),
        }
        out["rows"].append(row)
        print(row, flush=True)

    line = json.dumps(out)
    print(line, flush=True)
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "artifacts", "merge_scaling.json")
    with open(art, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
