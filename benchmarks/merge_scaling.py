"""Sharded-search merge scaling: cost of the [S, B, k] top-k merge.

The sharded engines (parallel/sharded.py) do ALL cross-chip
communication in one place: each shard returns its local top-k, and a
single all-gather + top_k merges [S, B, k] candidates. This benchmark
characterizes that merge as the shard count grows, on the one real
chip available (the merge COMPUTATION is what is measured; on real
multi-chip the preceding all-gather is the only collective and its
cost is analytic: S*B*k*8 bytes over ICI).

Methodology notes (r4, after the r3 artifact proved misleading):

* The merge runs INSIDE the same program as the shard scan in the real
  engine (_sharded_scan_jit's tail) -- it is never a separate dispatch.
  Timing it as its own jit call over this box's tunnel measures the
  per-dispatch round trip (~1-5ms), not the merge: the r3 artifact's
  "merge = 52-69% of shard scan" was exactly that artifact. The merge
  device-time is therefore measured here by running the merge body
  LOOPS times inside one program (lax.fori_loop, carry-dependent so
  XLA cannot hoist it) and dividing.
* Every wall-clock is the MEDIAN of individually-timed reps: the
  tunnel spikes 2-3x on ~30% of reps (artifacts/
  graph_regression_bisect.json), which is what made r3's S=4 row
  (mean-of-20 with one spike) internally implausible.

For each S it reports:
  * merge_device_us -- amortized in-program merge cost;
  * merge_dispatch_ms -- the merge as its own dispatch (tunnel round
    trip floor, for honesty about what the old number was);
  * shard_scan_ms -- one shard's local scan of (1M / S) rows.

Emits one JSON line appended to artifacts/merge_scaling.json. Run:

    python benchmarks/merge_scaling.py [B] [K]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

REPS = 15
LOOPS = 64  # in-program merge repeats for the device-time measurement
N_TOTAL = 1 << 20
DIM = 128

# v5e ICI: ~45 GB/s per direction per link (public spec figure used
# for the analytic all-gather estimate only; nothing here depends on
# it at runtime).
ICI_GBPS = 45.0


def _med_ms(fn, reps=REPS):
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        vals.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(vals)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from redis_hnsw_tpu.ops.scan import scan_topk_exact_l2

    def merge_body(gids, sims, k):
        S, B, kk = gids.shape
        flat_sims = jnp.transpose(sims, (1, 0, 2)).reshape(B, S * kk)
        flat_gids = jnp.transpose(gids, (1, 0, 2)).reshape(B, S * kk)
        top_sims, idx = jax.lax.top_k(flat_sims, k)
        top_gids = jnp.take_along_axis(flat_gids, idx, axis=1)
        return top_gids, top_sims

    @partial(jax.jit, static_argnames=("k",))
    def merge_once(gids, sims, *, k: int):
        return merge_body(gids, sims, k)

    @partial(jax.jit, static_argnames=("k",))
    def merge_looped(gids, sims, *, k: int):
        # carry-dependent repeat: each iteration's output feeds the
        # next input's top-k slots, so XLA cannot hoist or dedup it
        S = gids.shape[0]

        def body(_, c):
            g, s = c
            mg, ms = merge_body(g, s, k)
            g = g.at[:, :, :1].set(mg[None, :, :1] % N_TOTAL)
            s = s.at[:, :, :1].set(ms[None, :, :1] - 1e-6)
            return g, s

        g, s = jax.lax.fori_loop(0, LOOPS, body, (gids, sims))
        return merge_body(g, s, k)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rng = np.random.default_rng(0)
    out = {
        "b": B, "k": K, "n_total": N_TOTAL, "dim": DIM,
        "loops": LOOPS, "reps": REPS,
        # records are self-labeling: CPU-backend rows characterize the
        # merge's SHAPE scaling only; absolute times are only
        # meaningful on the tpu platform rows
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
        # amortized device time of the merge body
        np.asarray(merge_looped(gids, sims, k=K)[0])  # compile
        loop_ms = _med_ms(
            lambda: np.asarray(merge_looped(gids, sims, k=K)[0])
        )
        # the same merge as its own dispatch: tunnel round-trip floor
        np.asarray(merge_once(gids, sims, k=K)[0])  # compile
        disp_ms = _med_ms(
            lambda: np.asarray(merge_once(gids, sims, k=K)[0])
        )
        merge_us = (loop_ms - disp_ms) / LOOPS * 1e3
        merge_us = max(merge_us, 0.0)

        # one shard's local work at this S (1M rows hash-split S ways)
        n_shard = N_TOTAL // S
        vecs = jnp.asarray(
            rng.standard_normal((n_shard, DIM)).astype(np.float32)
        )
        sqn = jnp.sum(vecs * vecs, axis=1)
        live = jnp.ones(n_shard, bool)

        def scan_once():
            ids, ss = scan_topk_exact_l2(
                vecs, sqn, live, queries, k=K, approx=True
            )
            np.asarray(ids)

        scan_once()  # compile
        shard_ms = _med_ms(scan_once)
        del vecs, sqn

        gather_bytes = S * B * K * 8  # ids int32 + sims f32
        ici_us = gather_bytes / (ICI_GBPS * 1e9) * 1e6
        row = {
            "s": S,
            "merge_device_us": round(merge_us, 1),
            "merge_dispatch_ms": round(disp_ms, 3),
            "shard_scan_ms": round(shard_ms, 2),
            "merge_pct_of_shard": round(
                100 * (merge_us / 1e3) / shard_ms, 2
            ),
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
