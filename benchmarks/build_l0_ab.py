"""Alternating A/B of the scan-l0 vs beam wave pass at scale.

Measures the construction mode switch (ops/construct.py _build_l0_scan:
layer-0 insert candidates from the exact MXU scan vs the ef-wide graph
beam) the same way wave_split_ab.py measured the split-wave pass:
interleaved IN ONE PROCESS (A=beam B=scan A B ...) with per-wave
wall-clocks and medians, because run-to-run tunnel drift is 20-30% on
this box (CLAUDE.md). Works on any euclidean checkpoint (fresh rows are
iid gaussians at the checkpoint's dim -- wave cost depends on N and the
program shapes, not the data distribution).

    python benchmarks/build_l0_ab.py /tmp/ckpt.npz [PAIRS]

Appends one JSON line to artifacts/build_l0_ab.json.
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

WAVE = 2048


def log(*a):
    print(*a, flush=True)


def main() -> None:
    from redis_hnsw_tpu.utils.checkpoint import load_index

    ckpt = sys.argv[1] if len(sys.argv) > 1 else "/tmp/m1.ckpt.npz"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    idx = load_index(ckpt)
    n0 = idx.node_count
    dim = idx.config.dim
    log(f"loaded {n0} rows x {dim}d")
    need = (4 + 2 * pairs + 2) * WAVE
    rng = np.random.default_rng(99)
    fresh = rng.standard_normal((need, dim)).astype(np.float32)
    idx._capacity_hint = n0 + need
    off = 0

    def wave(mode: str) -> float:
        nonlocal off
        os.environ["REDIS_HNSW_TPU_BUILD_L0"] = mode
        t0 = time.perf_counter()
        idx.add_batch(
            [f"ab{off+i}" for i in range(WAVE)],
            fresh[off : off + WAVE], batch_size=WAVE,
        )
        off += WAVE
        return time.perf_counter() - t0

    # warm both forms (absorbs the capacity rebuild + any compiles)
    w_beam = wave("beam")
    w_scan = wave("scan")
    log(f"warm: beam {w_beam:.1f}s, scan {w_scan:.1f}s")
    w_beam = wave("beam")
    w_scan = wave("scan")
    log(f"warm delta: beam {w_beam:.1f}s, scan {w_scan:.1f}s")

    beams, scans = [], []
    for p in range(pairs):
        beams.append(wave("beam"))
        scans.append(wave("scan"))
        log(f"pair {p}: beam {beams[-1]:.2f}s scan {scans[-1]:.2f}s")
    mb, ms = statistics.median(beams), statistics.median(scans)
    os.environ.pop("REDIS_HNSW_TPU_BUILD_L0", None)

    # candidate-quality probe: the scan-sourced graph region must serve
    # its own fresh rows back (self-recall over the appended block)
    probe = fresh[: 256]
    res = idx.search_batch(probe, 1, engine="scan", reply="columnar")
    hits = sum(1 for b in range(256) if res[0][b][0] == f"ab{b}")
    log(f"self-recall probe (exact scan oracle): {hits}/256")

    out = {
        "n": n0, "dim": dim, "wave": WAVE, "pairs": pairs,
        "beam_median_s": round(mb, 3), "scan_median_s": round(ms, 3),
        "speedup": round(mb / ms, 3),
        "beam_inserts_per_s": round(WAVE / mb, 1),
        "scan_inserts_per_s": round(WAVE / ms, 1),
        "self_recall_probe": hits / 256,
    }
    line = json.dumps(out)
    log(line)
    art = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "artifacts", "build_l0_ab.json",
    )
    with open(art, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
