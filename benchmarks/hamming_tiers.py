"""Hamming scan-tier ladder at scale on one chip: exact / certified /
approx through the real FlatIndex serving path.

The r3 hamming row in artifacts/scan_tiers.json was a scan_topk
micro-ladder; this measures the full serving stack (chunked pipelined
drain, engine-aware fetch window, certified fallback sink) the way the
euclidean tiers are measured. The certified row is the r4 addition:
the DEEP counting certificate (ops/scan.py scan_certified_hamming)
serves the EXACT top-k contract -- byte-identical to the exact
int8-matmul scan, asserted on every run -- at approx-select cost.

    python benchmarks/hamming_tiers.py [N] [BITS]

Emits one JSON line and appends it to artifacts/hamming_tiers.json.
Timing hygiene (CLAUDE.md): device-resident query batches, MEDIAN of
reps (the tunnel spikes 2-3x on ~30% of reps), rows compared at equal
fetch counts (each search_batch call materializes its numpy reply).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

K = 10
B = 2048
SERVE_BATCHES = 8
REPS = 5


def timed_med(fn, reps=REPS):
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        vals.append(time.perf_counter() - t0)
    return statistics.median(vals), vals


def main() -> None:
    import jax
    import jax.numpy as jnp

    import redis_hnsw_tpu.ops.scan as S
    from redis_hnsw_tpu import IndexConfig
    from redis_hnsw_tpu.models.flat import FlatIndex

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    bits = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    words = bits // 32
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(7)
    data = rng.integers(0, 2**32, (n, words), dtype=np.uint32)
    idx = FlatIndex(
        "ht", IndexConfig(dim=bits, metric="hamming", capacity=n)
    )
    idx.add_batch([f"n{i}" for i in range(n)], data)
    queries = rng.integers(
        0, 2**32, (B * SERVE_BATCHES, words), dtype=np.uint32
    )
    qd = jnp.asarray(queries)          # one H2D, reused
    q1 = qd[:B]

    out = {
        "n": n, "bits": bits, "b": B, "k": K,
        "serve_batches": SERVE_BATCHES,
        "platform": jax.devices()[0].platform,
    }

    def run(approx):
        return idx.search_batch(q1, K, approx=approx, reply="columnar")

    def serve(approx):
        return idx.search_batch(qd, K, approx=approx, reply="columnar")

    rows = {}
    for label, approx, cert in (
        ("exact", False, "0"),
        ("certified", False, "1"),
        ("approx", True, "0"),
    ):
        os.environ["REDIS_HNSW_TPU_SCAN_CERT"] = cert
        nm, sims = run(approx)  # warm/compile + correctness sample
        before = dict(S.CERT_STATS)
        dt1, v1 = timed_med(lambda: run(approx))
        dts, vs = timed_med(lambda: serve(approx))
        row = {
            "qps": round(B / dt1, 1),
            "serve_qps": round(B * SERVE_BATCHES / dts, 1),
            "rep_ms": [round(v * 1e3, 1) for v in v1],
            "serve_rep_ms": [round(v * 1e3, 1) for v in vs],
        }
        if cert == "1":
            dq = S.CERT_STATS["queries"] - before["queries"]
            df = (
                S.CERT_STATS["fallback_queries"]
                - before["fallback_queries"]
            )
            row["cert_fallback_pct"] = round(100.0 * df / max(dq, 1), 3)
        rows[label] = row
        if label == "exact":
            want = (nm, sims)
        elif label == "certified":
            # the exact contract, asserted: byte-identical replies
            assert (nm == want[0]).all(), "certified names != exact"
            assert np.array_equal(sims, want[1]), "certified sims != exact"
            row["byte_identical_to_exact"] = True
        else:
            same = float((sims == want[1]).mean())
            gap = float(np.abs(sims - want[1]).max())
            row["dist_exact_match_pct"] = round(100 * same, 2)
            row["max_dist_gap_bits"] = int(gap)
        print(f"[{label}] {row}", file=sys.stderr, flush=True)
    os.environ.pop("REDIS_HNSW_TPU_SCAN_CERT", None)

    out.update(rows)
    line = json.dumps(out)
    print(line)
    art = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "hamming_tiers.json",
    )
    with open(art, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
