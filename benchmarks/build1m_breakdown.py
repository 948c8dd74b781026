"""Construction at 1M: the sequential anchor + per-phase wave breakdown.

VERDICT r4 weak#1: the wave build's sustained rate at 1M (183/s in the
r4 streaming run) had no committed (a) native *sequential* insert anchor
(the reference's own regime, src/hnsw/core.rs:489-599 one insert at a
time) and (b) per-phase breakdown of a 1M-row wave (snapshot delta /
device beam / fetch / native surgery). This script measures both against
an existing 1M checkpoint (benchmarks/million.py build), then an
UNTIMED run of the same waves for the honest throughput number (the
PhaseTimer syncs the device per phase, ~28ms a round trip on this
tunnel, which both adds wall and serializes async dispatch -- the
equal-fetch-count rule from CLAUDE.md).

    python benchmarks/build1m_breakdown.py /tmp/m1.ckpt.npz [N_WAVES]

Writes artifacts/build1m_breakdown.json.
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

from million import dataset  # noqa: E402  (same clustered corpus)

WAVE = 2048


def log(*a):
    print(*a, flush=True)


def main() -> None:
    from redis_hnsw_tpu.ops import construct
    from redis_hnsw_tpu.utils.checkpoint import load_index
    from redis_hnsw_tpu.utils.profiling import PhaseTimer

    ckpt = sys.argv[1] if len(sys.argv) > 1 else "/tmp/m1.ckpt.npz"
    n_waves = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    t0 = time.perf_counter()
    idx = load_index(ckpt)
    n0 = idx.node_count
    log(f"loaded {n0} rows in {time.perf_counter()-t0:.1f}s")
    out = {"n": n0, "wave": WAVE, "m": idx.config.m,
           "efcon": idx.config.ef_construction,
           "dim": int(idx._vectors.shape[1])}

    # Fresh rows drawn PAST the built prefix of the same clustered
    # corpus (same distribution the index was built from).
    need = 256 + (2 + 2 * n_waves) * WAVE
    fresh = dataset(n0 + need)[n0:]

    # --- (b) the sequential anchor: native add_node, one at a time ----
    # (measure BEFORE any device work so the snapshot tables are not in
    # play; this is pure host C++, the reference's own insert regime)
    n_seq = 192
    t0 = time.perf_counter()
    for i in range(n_seq):
        idx.add_node(f"seq{i}", fresh[i])
    dt = time.perf_counter() - t0
    out["sequential"] = {
        "inserts": n_seq,
        "inserts_per_s": round(n_seq / dt, 1),
        "mean_ms": round(dt / n_seq * 1e3, 2),
    }
    log(f"sequential native: {n_seq/dt:.1f} inserts/s "
        f"({dt/n_seq*1e3:.1f} ms/insert)")
    off = 256  # unused gap keeps wave rows disjoint from seq rows

    # --- warm wave: pays the full snapshot rebuild (the capacity grew
    # past the old pad) + wave-engine compile, outside every timer ----
    idx._capacity_hint = n0 + need
    t0 = time.perf_counter()
    idx.add_batch(
        [f"w{off+i}" for i in range(WAVE)],
        fresh[off : off + WAVE], batch_size=WAVE,
    )
    out["warm_wave_s"] = round(time.perf_counter() - t0, 1)
    log(f"warm wave (rebuild+compile): {out['warm_wave_s']}s")
    off += WAVE
    # second warm wave = first delta-path wave (compiles _apply_delta)
    t0 = time.perf_counter()
    idx.add_batch(
        [f"w{off+i}" for i in range(WAVE)],
        fresh[off : off + WAVE], batch_size=WAVE,
    )
    out["warm_delta_wave_s"] = round(time.perf_counter() - t0, 1)
    log(f"warm delta wave: {out['warm_delta_wave_s']}s")
    off += WAVE

    # --- (a) timed waves: per-phase breakdown -------------------------
    construct.BUILD_TIMER = timer = PhaseTimer()
    t0 = time.perf_counter()
    for _ in range(n_waves):
        idx.add_batch(
            [f"w{off+i}" for i in range(WAVE)],
            fresh[off : off + WAVE], batch_size=WAVE,
        )
        off += WAVE
    dt = time.perf_counter() - t0
    construct.BUILD_TIMER = None
    out["timed"] = {
        "waves": n_waves,
        "inserts_per_s": round(n_waves * WAVE / dt, 1),
        "phases": timer.summary(),
        "note": "PhaseTimer syncs per phase (~28ms round trip each on "
                "this tunnel) and serializes async dispatch; use the "
                "untimed block for throughput",
    }
    log(json.dumps(timer.summary(), indent=1))
    log(f"timed: {n_waves*WAVE/dt:.0f} inserts/s")

    # --- untimed waves: the honest sustained rate ----------------------
    t0 = time.perf_counter()
    for _ in range(n_waves):
        idx.add_batch(
            [f"w{off+i}" for i in range(WAVE)],
            fresh[off : off + WAVE], batch_size=WAVE,
        )
        off += WAVE
    dt = time.perf_counter() - t0
    out["untimed"] = {
        "waves": n_waves,
        "inserts_per_s": round(n_waves * WAVE / dt, 1),
        "wave_mean_s": round(dt / n_waves, 3),
    }
    log(f"untimed: {n_waves*WAVE/dt:.0f} inserts/s "
        f"({dt/n_waves:.2f} s/wave)")
    out["vs_sequential"] = round(
        out["untimed"]["inserts_per_s"]
        / out["sequential"]["inserts_per_s"], 2,
    )

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "artifacts", "build1m_breakdown.json",
    )
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    log("WROTE " + json.dumps(out))


if __name__ == "__main__":
    main()
