"""TPU validation of the fused cert count kernel (ops/pallas_count.py).

Three checks on the live backend, 1M-row clustered table:

1. **Bitwise counts**: count_gt_eq vs the XLA _count_vs_threshold on
   the same inputs (thresholds taken from a real approx selection).
   Any mismatch = the kernel's dot rounds differently from XLA's here,
   and the kernel must stay off (the gate is reported).
2. **Forced-audit serving**: certified_topk_l2 with the kernel ON and
   CERT_AUDIT_EVERY=1 (every batch byte-compared against the exact
   path) over several batches, including an adversarial all-duplicate
   tie block. Reports CERT_STATS.
3. **Timing**: _cert_verify_l2 median ms with kernel OFF vs ON.

Appends one JSON line to artifacts/cert_kernel_check.json.
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

os.environ["REDIS_HNSW_TPU_SCAN_CERT_AUDIT"] = "1"

from benchmarks.million import dataset, query_set  # noqa: E402


def med_ms(fn, reps=7):
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        import jax

        for leaf in jax.tree_util.tree_leaves(r):
            if isinstance(leaf, jax.Array):
                leaf.block_until_ready()
        vals.append((time.perf_counter() - t0) * 1e3)
    return round(statistics.median(vals), 1), [round(v, 1) for v in vals]


def main() -> None:
    n, b, k = 1_000_000, 2048, 10

    import jax
    import jax.numpy as jnp

    from redis_hnsw_tpu.ops import scan as S
    from redis_hnsw_tpu.ops.pallas_count import (
        TILE_N, cert_kernel_enabled, count_gt_eq,
    )

    out = {"n": n, "b": b, "k": k,
           "platform": jax.devices()[0].platform,
           "kernel_gate": cert_kernel_enabled()}

    data = dataset(n)
    # adversarial tie block: 64 copies of one row (an exact tie class
    # wider than k), placed mid-table
    data[500_000:500_064] = data[123_456]
    qs = query_set(b, "clustered")
    n_pad = S.pad_pow2(n)
    vecs = jnp.zeros((n_pad, data.shape[1]), jnp.float32)
    vecs = vecs.at[:n].set(jnp.asarray(data))
    del data
    sqn = jnp.sum(vecs * vecs, axis=-1)
    live = jnp.arange(n_pad) < n
    qd = jnp.asarray(qs)

    # -- 1. bitwise counts, kernel vs XLA pass
    ids, sims = S.scan_topk(
        vecs, sqn, live, qd, k=k, metric="euclidean", approx=True
    )
    t = sims[:, -1]
    qq = jnp.sum(qd * qd, axis=-1, keepdims=True)
    want_gt, want_eq = jax.jit(S._count_vs_threshold)(
        vecs, sqn, live, qd, qq, t
    )
    got_gt, got_eq = count_gt_eq(
        vecs, jnp.where(live, sqn, jnp.inf), qd, qq[:, 0], t
    )
    gt_mism = int(jnp.sum(want_gt != got_gt))
    eq_mism = int(jnp.sum(want_eq != got_eq))
    out["count_mismatches"] = {"gt": gt_mism, "eq": eq_mism}
    print(f"bitwise counts: gt mismatches {gt_mism}, eq {eq_mism}",
          flush=True)

    # -- 2. forced-audit serving with the count kernel on (one-pass
    # pinned OFF so this section really exercises the two-pass form)
    os.environ["REDIS_HNSW_TPU_CERT_KERNEL"] = "1"
    os.environ["REDIS_HNSW_TPU_CERT_ONEPASS"] = "0"
    S._scan_certified_clear_cache()
    S.CERT_STATS.clear()
    S.CERT_STATS.update(batches=0, queries=0, fallback_queries=0)
    for rep in range(4):
        i1, s1 = S.certified_topk_l2(vecs, sqn, live, qd, k=k, n_q=b)
    # tie-targeted batch: queries at the duplicated row
    q_tie = jnp.asarray(
        np.repeat(qs[:1] * 0, b, axis=0)
        + np.asarray(vecs[123_456])[None, :]
    )
    S.certified_topk_l2(vecs, sqn, live, q_tie, k=k, n_q=b)
    out["cert_stats_kernel_on"] = dict(S.CERT_STATS)
    print("forced-audit stats (kernel on):", S.CERT_STATS, flush=True)
    os.environ.pop("REDIS_HNSW_TPU_CERT_ONEPASS", None)

    # -- 2b. one-pass select kernel (ops/pallas_select.py): bitwise vs
    # the XLA reference at 2^18 rows (full-score ref fits HBM there;
    # the 1M case is covered by the forced-audit serving below), then
    # forced-audit serving at 1M with the one-pass path on.
    from redis_hnsw_tpu.ops import pallas_select as PS

    n_small = 1 << 18
    sq_small = jnp.where(live[:n_small], sqn[:n_small], jnp.inf)
    qq1 = qq[:, 0]
    want_b = PS.select_bins_ref(vecs[:n_small], sq_small, qd, qq1)
    got_b = PS.select_bins(vecs[:n_small], sq_small, qd, qq1)
    out["onepass_mismatches"] = {
        name: int(jnp.sum(g != w))
        for name, g, w in zip(("sims", "ids", "m2"), got_b, want_b)
    }
    print("one-pass bitwise vs ref (2^18):",
          out["onepass_mismatches"], flush=True)

    os.environ["REDIS_HNSW_TPU_CERT_ONEPASS"] = "1"
    S._scan_certified_clear_cache()
    S.CERT_STATS.clear()
    S.CERT_STATS.update(batches=0, queries=0, fallback_queries=0)
    for rep in range(4):
        S.certified_topk_l2(vecs, sqn, live, qd, k=k, n_q=b)
    S.certified_topk_l2(vecs, sqn, live, q_tie, k=k, n_q=b)
    out["cert_stats_onepass_on"] = dict(S.CERT_STATS)
    print("forced-audit stats (one-pass on):", S.CERT_STATS, flush=True)
    ms_op, reps_op = med_ms(
        lambda: S.scan_certified_l2(vecs, sqn, live, qd, k=k)
    )
    out["onepass_select_ms"] = {"ms": ms_op, "reps": reps_op}
    print(f"one-pass select program: {ms_op}ms", flush=True)
    os.environ.pop("REDIS_HNSW_TPU_CERT_ONEPASS", None)
    S._scan_certified_clear_cache()

    # -- 3. timing: cert pass with kernel off vs on
    os.environ["REDIS_HNSW_TPU_CERT_KERNEL"] = "0"
    S._scan_certified_clear_cache()
    ms_off, reps_off = med_ms(
        lambda: S._cert_verify_l2(vecs, sqn, live, qd, ids, sims)
    )
    os.environ["REDIS_HNSW_TPU_CERT_KERNEL"] = "1"
    S._scan_certified_clear_cache()
    ms_on, reps_on = med_ms(
        lambda: S._cert_verify_l2(vecs, sqn, live, qd, ids, sims)
    )
    os.environ.pop("REDIS_HNSW_TPU_CERT_KERNEL", None)
    out["cert_verify_ms"] = {"xla": ms_off, "kernel": ms_on,
                             "xla_reps": reps_off,
                             "kernel_reps": reps_on}
    print(f"cert pass: xla {ms_off}ms vs kernel {ms_on}ms", flush=True)

    line = json.dumps(out)
    print(line, flush=True)
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "artifacts", "cert_kernel_check.json")
    with open(art, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
