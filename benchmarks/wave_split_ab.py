"""Alternating A/B of the split vs full-width wave pass at 1M.

Run-to-run tunnel drift is 20-30%% on this box (CLAUDE.md), so the two
forms are interleaved IN ONE PROCESS: A(old) B(split) A B ... with per-
wave wall-clocks, reporting medians. Both program shapes come from the
persistent compile cache after a warm wave each.

    python benchmarks/wave_split_ab.py /tmp/m1.ckpt.npz [PAIRS]

Appends one JSON line to artifacts/wave_split_ab.json.
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

from million import dataset  # noqa: E402

WAVE = 2048


def log(*a):
    print(*a, flush=True)


def main() -> None:
    from redis_hnsw_tpu.utils.checkpoint import load_index

    ckpt = sys.argv[1] if len(sys.argv) > 1 else "/tmp/m1.ckpt.npz"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    idx = load_index(ckpt)
    n0 = idx.node_count
    log(f"loaded {n0} rows")
    # same capacity hint as benchmarks/build1m_breakdown.py (256 +
    # 14*2048) so both wave programs and the delta program replay from
    # the persistent compile cache at identical shapes
    need = 256 + 14 * WAVE
    assert (4 + 2 * pairs) * WAVE <= need, "raise need for more pairs"
    fresh = dataset(n0 + need)[n0:]
    idx._capacity_hint = n0 + need
    off = 0

    def wave(split: str) -> float:
        nonlocal off
        os.environ["REDIS_HNSW_TPU_WAVE_SPLIT"] = split
        t0 = time.perf_counter()
        idx.add_batch(
            [f"ab{off+i}" for i in range(WAVE)],
            fresh[off : off + WAVE], batch_size=WAVE,
        )
        off += WAVE
        return time.perf_counter() - t0

    # warm both forms (absorbs the capacity rebuild + any compiles)
    w_old = wave("0")
    w_new = wave("1")
    log(f"warm: old {w_old:.1f}s, split {w_new:.1f}s")
    # one more warm pair (the first delta wave of each form)
    w_old = wave("0")
    w_new = wave("1")
    log(f"warm delta: old {w_old:.1f}s, split {w_new:.1f}s")

    olds, news = [], []
    for p in range(pairs):
        olds.append(wave("0"))
        news.append(wave("1"))
        log(f"pair {p}: old {olds[-1]:.2f}s split {news[-1]:.2f}s")
    mo, mn = statistics.median(olds), statistics.median(news)
    out = {
        "n": n0, "wave": WAVE, "pairs": pairs,
        "old_s": [round(v, 2) for v in olds],
        "split_s": [round(v, 2) for v in news],
        "old_median_s": round(mo, 2),
        "split_median_s": round(mn, 2),
        "old_inserts_per_s": round(WAVE / mo, 1),
        "split_inserts_per_s": round(WAVE / mn, 1),
        "speedup": round(mo / mn, 3),
    }
    os.environ.pop("REDIS_HNSW_TPU_WAVE_SPLIT", None)
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "artifacts", "wave_split_ab.json",
    )
    with open(path, "a") as f:
        f.write(json.dumps(out) + "\n")
    log("WROTE " + json.dumps(out))


if __name__ == "__main__":
    main()
