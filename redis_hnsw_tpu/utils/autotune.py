"""Search-knob auto-tuning.

The reference hardwires its search beam to ef_construction
(src/hnsw/core.rs:485) -- recall is coupled to a build-time parameter and
unmeasurable without an external oracle. Here the framework carries its
own exact oracle (the flat MXU scan), so an index can tune its own
batched-search knobs: probe (ef_search, expand, iters) ladders against
exact ground truth on a query sample, keep configs that meet the recall
target, and return the fastest.
"""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np


def _exact_topk(index, queries, k):
    """Ground truth from the index's own device snapshot (flat scan)."""
    import jax

    from ..ops import distance as D

    snap = index.device_snapshot()
    n_pad = snap.vecs.shape[0]
    valid = np.zeros(n_pad, bool)
    hw = index._names.high_water
    valid[:hw] = np.asarray(index._levels[:hw]) >= 0

    @jax.jit
    def scan(q):
        if snap.metric == "hamming":
            scores = D.pairwise_hamming(q, snap.vecs)
        else:
            scores = D.pairwise_neg_sq_l2(q, snap.vecs, snap.sqnorms)
        scores = jnp.where(jnp.asarray(valid)[None, :], scores, -jnp.inf)
        return jax.lax.top_k(scores, k)[1]

    return np.asarray(scan(jnp.asarray(queries)))


DEFAULT_LADDER = (64, 96, 128, 192, 256, 320, 448, 640)


def tune(
    index,
    queries,
    k: int = 10,
    target_recall: float = 0.95,
    expand: int = 16,
    ef_ladder=DEFAULT_LADDER,
    iter_slack: int = 4,
    time_reps: int = 3,
) -> dict:
    """Return the fastest ``{ef_search, expand, iters}`` meeting
    ``target_recall`` on ``queries`` (exact oracle computed in-process).
    If nothing on the ladder reaches the target, returns the most
    accurate config found. Pass the result straight to search_batch:

        knobs = tune(idx, sample_queries, k=10, target_recall=0.95)
        idx.search_batch(batch, k=10, **knobs)
    """
    qs = np.atleast_2d(np.asarray(queries, dtype=index._vectors.dtype))
    truth = _exact_topk(index, qs, k)
    truth_sets = [set(row.tolist()) for row in truth]
    name_row = index._names.get

    def recall_of(res):
        hits = 0
        for b, rr in enumerate(res):
            rows = {name_row(r.name) for r in rr}
            hits += len(rows & truth_sets[b])
        return hits / (k * len(res))

    passing = []
    best = None
    for ef in ef_ladder:
        ex = min(expand, ef)
        iters = (ef + ex - 1) // ex + iter_slack
        res = index.search_batch(
            qs, k, ef_search=ef, expand=ex, iters=iters, engine="graph"
        )
        rec = recall_of(res)
        cfg = {"ef_search": ef, "expand": ex, "iters": iters}
        if best is None or rec > best[0]:
            best = (rec, cfg)
        if rec >= target_recall:
            passing.append((rec, cfg))
            break  # the ladder is monotone in work; first hit is cheapest

    if not passing:
        rec, cfg = best
        return {**cfg, "recall": rec, "qps": None}

    rec, cfg = passing[0]
    t0 = time.perf_counter()
    for _ in range(time_reps):
        index.search_batch(
            qs, k, ef_search=cfg["ef_search"], expand=cfg["expand"],
            iters=cfg["iters"], engine="graph",
        )
    dt = (time.perf_counter() - t0) / time_reps
    return {**cfg, "recall": rec, "qps": len(qs) / dt}
