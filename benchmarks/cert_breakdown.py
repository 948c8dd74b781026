"""Certified-scan cost breakdown at 1M rows (VERDICT r3 weak#2).

Times each component of the certified path separately on the live
backend so the optimization target is measured, not guessed:

  * approx select program alone (scan_topk approx=True)
  * certificate+rescore program alone (_cert_verify_l2)
  * exact top_k scan (the floor the cert path must beat)
  * certified_topk_l2 end-to-end (includes the fallback rerun)

Usage: python benchmarks/cert_breakdown.py [N] [B] [REPS]
Appends one JSON line to artifacts/cert_breakdown.json.
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

from benchmarks.million import dataset, query_set  # noqa: E402


def med_ms(fn, reps):
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        jtree_block(r)
        vals.append((time.perf_counter() - t0) * 1e3)
    return round(statistics.median(vals), 1), [round(v, 1) for v in vals]


def jtree_block(r):
    import jax

    for leaf in jax.tree_util.tree_leaves(r):
        if isinstance(leaf, jax.Array):
            leaf.block_until_ready()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    k = 10

    import jax
    import jax.numpy as jnp

    from redis_hnsw_tpu.ops import scan as S

    data = dataset(n)
    qs = query_set(b, "clustered")
    n_pad = S.pad_pow2(n)
    vecs = jnp.zeros((n_pad, data.shape[1]), jnp.float32)
    vecs = vecs.at[:n].set(jnp.asarray(data))
    del data
    sqn = jnp.sum(vecs * vecs, axis=-1)
    live = (jnp.arange(n_pad) < n)
    qd = jnp.asarray(qs)

    out = {"n": n, "n_pad": n_pad, "b": b, "k": k, "reps": reps,
           "platform": jax.devices()[0].platform,
           "cert_kernel": os.environ.get(
               "REDIS_HNSW_TPU_CERT_KERNEL", "auto"),
           "cert_fuse": os.environ.get(
               "REDIS_HNSW_TPU_CERT_FUSE", "auto"),
           "cert_onepass": os.environ.get(
               "REDIS_HNSW_TPU_CERT_ONEPASS", "auto")}

    # warm every program first (shared compile server; cache persists)
    sel = S.scan_topk(vecs, sqn, live, qd, k=k, metric="euclidean",
                      approx=True)
    S._cert_verify_l2(vecs, sqn, live, qd, *sel)
    S.scan_topk_exact_l2(vecs, sqn, live, qd, k=k, pack=True)
    S.certified_topk_l2(vecs, sqn, live, qd, k=k, n_q=b)

    out["approx_select_ms"], reps_l = med_ms(
        lambda: S.scan_topk(vecs, sqn, live, qd, k=k,
                            metric="euclidean", approx=True), reps)
    out["approx_select_reps"] = reps_l
    ids, sims = sel
    out["cert_verify_ms"], reps_l = med_ms(
        lambda: S._cert_verify_l2(vecs, sqn, live, qd, ids, sims), reps)
    out["cert_verify_reps"] = reps_l
    out["exact_scan_ms"], reps_l = med_ms(
        lambda: S.scan_topk_exact_l2(vecs, sqn, live, qd, k=k,
                                     pack=True), reps)
    out["exact_scan_reps"] = reps_l
    out["certified_e2e_ms"], reps_l = med_ms(
        lambda: S.certified_topk_l2(vecs, sqn, live, qd, k=k, n_q=b),
        reps)
    out["certified_e2e_reps"] = reps_l
    # the certified select program alone (one dispatch; under
    # CERT_ONEPASS this is the single-table-read pallas_select form)
    out["cert_select_program_ms"], reps_l = med_ms(
        lambda: S.scan_certified_l2(vecs, sqn, live, qd, k=k), reps)
    out["cert_select_program_reps"] = reps_l
    out["cert_stats"] = dict(S.CERT_STATS)

    line = json.dumps(out)
    print(line, flush=True)
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "artifacts", "cert_breakdown.json")
    with open(art, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
