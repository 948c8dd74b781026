"""Benchmark: batched TPU query throughput vs the reference-equivalent
single-core baseline.

The reference publishes no numbers (BASELINE.md), so the baseline is
measured in-process: the native C++ sequential engine
(native/hnsw_core.cpp) is an algorithmically faithful stand-in for the
reference's single-core Rust loop (same graph, same ef, same expansion
order, compiler-vectorized distance kernel ~ the reference's AVX2,
src/hnsw/metrics.rs:48-77). The baseline is the MEDIAN of 5 reps of
>=1000 sequential queries with a warmup rep discarded (the r1 number
was a single 300-query rep taken right after heavy device work and
swung 5.5x between runs); the per-rep spread is reported on stderr.

The headline metric is batched device QPS at recall@10 >= 0.95 against
a brute-force oracle on the config-1 workload (BASELINE.json: random
128-d, M=16 for the recall target, EFCON=200). Both device engines are
measured: the graph traversal (with its ef/expand/iters operating-point
sweep) and the ``auto`` engine, which at these index sizes routes to
the exact MXU scan (ops/scan.py; recall 1.0 by construction) with the
columnar serving reply -- the headline value. BASELINE configs 3
(960-d GIST regime) and 5 (256-bit Hamming) are also measured and
logged to stderr (the driver records it) -- run a single config with
``python bench.py --config 3``.

Queries are uploaded to HBM once and reused -- on this dev setup
host->device goes through a tunnel at ~3MB/s (154ms for 512KB, measured),
which no production TPU topology has; serving systems keep query batches
device-resident anyway.

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps/chip", "vs_baseline": ratio}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time

import numpy as np

# Device-init watchdog: jax.devices() blocks FOREVER when the TPU
# tunnel is down (observed: a multi-hour outage where device init hung
# >5min indefinitely). The driver runs this script unattended, so a
# dead tunnel must produce a terminating, honest record instead of a
# wedged process. 20min covers the slowest healthy init observed
# (noisy compile server + tunnel) with a wide margin.
DEVICE_INIT_TIMEOUT_S = float(
    os.environ.get("REDIS_HNSW_TPU_BENCH_DEVICE_TIMEOUT", 1200)
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _init_devices_or_die():
    """Return jax.devices(), or print an explicit failure JSON line and
    exit non-zero if device init doesn't complete in time."""
    import jax

    ready = threading.Event()

    def watchdog():
        if not ready.wait(DEVICE_INIT_TIMEOUT_S):
            print(json.dumps({
                "metric": (
                    "BENCH NOT RUN: TPU device init timed out after "
                    f"{DEVICE_INIT_TIMEOUT_S:.0f}s (tunnel down); no "
                    "measurement taken"
                ),
                "value": 0.0,
                "unit": "qps/chip",
                "vs_baseline": 0.0,
            }), flush=True)
            os._exit(17)

    threading.Thread(target=watchdog, daemon=True).start()
    devs = jax.devices()
    ready.set()
    return devs


def _tunnel_probe() -> float:
    """32MB upload-then-fetch wall seconds (the CLAUDE.md degraded-window
    signature: healthy <5s, degraded minutes). Carried in the bench JSON
    so a reading taken inside a degraded window is self-labeling —
    qps measured while this is >10s is transport fiction, not engine
    performance."""
    import jax.numpy as jnp

    x = np.random.default_rng(0).standard_normal((8_000_000,)).astype(
        np.float32
    )
    t0 = time.perf_counter()
    xd = jnp.asarray(x)
    _ = float(xd[0])
    dt = time.perf_counter() - t0
    log(f"tunnel probe (32MB upload+fetch): {dt:.2f}s")
    return round(dt, 2)


def _timed_med(fn, reps: int, label: str):
    """Median seconds per call over ``reps`` calls, per-rep list logged.

    The tunnel's device wall has heavy one-sided spikes (measured r4:
    back-to-back reps of the SAME compiled search alternate ~125ms and
    ~235-400ms -- a 2-3x hiccup on ~30% of reps). A mean over a single
    timed block lets two spiked reps halve the reported qps: that is
    exactly the r2->r3 "graph regression" (12.8k -> 6.7k qps), which
    bisection showed was no code change at all (r2 and r3 code measure
    126.4ms vs 127.4ms MEDIAN back-to-back;
    artifacts/graph_regression_bisect.json). Every engine timing here
    therefore reports the median rep, with the rep list on stderr."""
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        vals.append(time.perf_counter() - t0)
    med = statistics.median(vals)
    spread = (max(vals) - min(vals)) / med
    log(f"    [{label}] rep ms: "
        f"{[round(v * 1e3, 1) for v in vals]} (spread {spread:.2f}x)")
    return med


def _recall_fn(truth, k):
    truth_sets = [{r.name for r in t} for t in truth]

    def recall(results):
        hits = sum(
            len({r.name for r in res} & truth_sets[b])
            for b, res in enumerate(results)
        )
        return hits / (k * len(results))

    return recall


def _recall_tie_fn(truth, k):
    """Tie-aware recall: a result counts if its (exact) sim reaches the
    oracle's k-th sim. Identical to name-set recall when sims are
    distinct; under heavy ties (hamming: integer distances on random
    bits) name-set recall under-reports engines whose tie ORDER differs
    from the oracle's (-sim, id) rule -- the approx-select tier keeps
    exact sims but not tie order, so this is its correct metric."""
    kth = [min((r.sim for r in t), default=np.inf) for t in truth]

    def recall(results):
        hits = sum(
            sum(1 for r in res if r.sim >= kth[b])
            for b, res in enumerate(results)
        )
        return hits / (k * len(results))

    return recall


def _baseline_qps(idx, queries, n_q: int = 1000, reps: int = 5) -> float:
    """Median sequential-native qps over ``reps`` timed reps (plus one
    discarded warmup rep), single query at a time at parity ef."""
    k = 10
    for q in queries[:200]:  # warmup: page in tables, settle the box
        idx.search_knn(q, k)
    vals = []
    for r in range(reps):
        t0 = time.perf_counter()
        for i in range(n_q):
            idx.search_knn(queries[i % len(queries)], k)
        vals.append(n_q / (time.perf_counter() - t0))
    med = statistics.median(vals)
    spread = (max(vals) - min(vals)) / med
    log(
        f"baseline sequential native: median {med:.1f} qps over {reps}x"
        f"{n_q} queries (reps: {[round(v, 1) for v in vals]}, "
        f"spread {spread * 100:.0f}%)"
    )
    return med


def _bench_one(
    name: str,
    *,
    dim: int,
    metric: str = "euclidean",
    n: int = 10_000,
    k: int = 10,
    m: int = 16,
    efcon: int = 200,
    n_queries: int = 2048,
    expand: int = 16,
    sweep=((256, 16), (256, 20), (256, 24), (320, 24), (400, 28), (512, 36)),
    base_n: int = 1000,
):
    """Build + oracle + operating-point sweep + timed run + baseline for
    one workload. Returns (qps, recall, ef, iters, build_s, base_qps)."""
    import jax.numpy as jnp

    from redis_hnsw_tpu import HNSWIndex, IndexConfig
    from redis_hnsw_tpu.models.flat import FlatIndex

    rng = np.random.default_rng(0)
    if metric == "hamming":
        words = dim // 32
        data = rng.integers(0, 2**32, (n, words), dtype=np.uint32)
        queries = rng.integers(0, 2**32, (n_queries, words), dtype=np.uint32)
    else:
        data = rng.standard_normal((n, dim)).astype(np.float32)
        queries = rng.standard_normal((n_queries, dim)).astype(np.float32)
    names = [f"n{i}" for i in range(n)]

    cfg_kw = dict(
        dim=dim, m=m, ef_construction=efcon, metric=metric, seed=7
    )
    # Warm pass: compile every engine shape first (the shared compile
    # server is noisy, 30s-5min per program on a cold cache; BENCH_r02
    # recorded 818.9s for a build that is ~55s steady-state). The timed
    # pass then measures the steady build the persistent cache delivers
    # to every later process. Both wall-clocks are reported.
    t0 = time.perf_counter()
    warm = HNSWIndex("warm-" + name, IndexConfig(**cfg_kw))
    warm.add_batch(names, data, batch_size=2048)
    build_warm_s = time.perf_counter() - t0
    del warm

    idx = HNSWIndex(name, IndexConfig(**cfg_kw))
    t0 = time.perf_counter()
    idx.add_batch(names, data, batch_size=2048)
    build_s = time.perf_counter() - t0
    log(f"[{name}] build: {n} nodes in {build_s:.1f}s "
        f"({n / build_s:.0f} adds/s; first pass incl. compile "
        f"{build_warm_s:.1f}s)")

    oracle = FlatIndex("o" + name, IndexConfig(dim=dim, metric=metric))
    oracle.add_batch(names, data)
    truth = oracle.search_batch(queries, k)
    recall = _recall_fn(truth, k)
    recall_tie = _recall_tie_fn(truth, k)

    q_dev = jnp.asarray(queries)  # one upload, reused
    # 9 reps/engine: the median tolerates 4 tunnel-spiked reps (spike
    # rate measured ~30%, see _timed_med); each rep is 30-400ms so the
    # extra reps cost ~2s per engine.
    reps = 9

    # -- graph engine: smallest work hitting recall >= 0.95 on the full
    # batch (the reference hardwires ef = efcon and has no such knobs)
    chosen = None
    for ef, iters in sweep:
        res = idx.search_batch(
            q_dev, k, ef_search=ef, expand=expand, iters=iters,
            engine="graph",
        )
        r = recall(res)
        log(f"[{name}] graph ef={ef} iters={iters} expand={expand}: "
            f"recall@{k}={r:.4f}")
        if r >= 0.95:
            chosen = (ef, iters, r)
            break
    if chosen is None:
        chosen = (*sweep[-1], r)
    ef, iters, graph_recall = chosen

    dt = _timed_med(
        lambda: idx.search_batch(
            q_dev, k, ef_search=ef, expand=expand, iters=iters,
            engine="graph",
        ),
        reps, "graph",
    )
    graph_qps = n_queries / dt
    log(
        f"[{name}] graph engine: ef={ef} iters={iters} "
        f"recall@{k}={graph_recall:.4f} {graph_qps:.0f} qps "
        f"({dt * 1e3:.1f} ms / {n_queries} queries)"
    )
    hbm_gbps, pct_peak = _roofline(
        idx, n_queries, expand=expand, iters=iters, dt=dt
    )
    log(f"[{name}] graph beam gather traffic: {hbm_gbps:.0f} GB/s "
        f"achieved ({pct_peak:.0f}% of HBM peak; analytic, "
        f"full-iters bound)")

    # -- auto engine (routes to the exact MXU scan at these sizes,
    # ops/scan.py) with the columnar serving reply
    auto_recall = recall(idx.search_batch(q_dev, k))
    idx.search_batch(q_dev, k, reply="columnar")
    dt_auto = _timed_med(
        lambda: idx.search_batch(q_dev, k, reply="columnar"),
        reps, "auto",
    )
    auto_qps = n_queries / dt_auto
    snap = idx.device_snapshot()
    table_bytes = (
        snap.n_pad * snap.vecs.shape[1] * snap.vecs.dtype.itemsize
    )
    scan_gbps = table_bytes / dt_auto / 1e9
    log(
        f"[{name}] auto engine (exact scan, columnar reply): "
        f"recall@{k}={auto_recall:.4f} {auto_qps:.0f} qps "
        f"({dt_auto * 1e3:.1f} ms / {n_queries} queries; table scan "
        f"{scan_gbps:.0f} GB/s)"
    )

    # -- pipelined serving: one 8x-batch query set through
    # search_batch's chunked loop (2048-lane chunks, up to
    # REDIS_HNSW_TPU_PIPELINE dispatched-but-unfetched): each chunk's
    # ~28ms fetch round trip hides behind the next chunks' compute
    # (ops/search.py; measured 1.3-1.5x at 1M rows,
    # artifacts/pipeline_ab.json). Serving systems drain result
    # streams exactly this way; reported alongside the single-batch
    # number, which pays one full round trip per call.
    n_serve = n_queries * 8
    if metric == "hamming":
        sq = rng.integers(
            0, 2**32, (n_serve, dim // 32), dtype=np.uint32
        )
    else:
        sq = rng.standard_normal((n_serve, dim)).astype(np.float32)
    sq_dev = jnp.asarray(sq)  # one upload, reused
    idx.search_batch(sq_dev, k, reply="columnar")
    dt_serve = _timed_med(
        lambda: idx.search_batch(sq_dev, k, reply="columnar"),
        5, "auto-serve-8batch",
    )
    serve_qps = n_serve / dt_serve
    log(
        f"[{name}] auto engine, pipelined serving ({n_serve} queries "
        f"in 2048-lane chunks): {serve_qps:.0f} qps "
        f"({serve_qps / auto_qps:.2f}x the single-batch rate)"
    )

    # -- ids-only reply (REDIS_HNSW_TPU_REPLY=ids): transfer the [B, k]
    # id block alone, rescore sims host-side in exact direct form --
    # the euclidean analog of the hamming one-word reply, aimed at the
    # measured reply-D2H share of the batch wall (ops/scan.py). Same
    # results; measured separately so the delta is the wire bytes.
    ids_qps = None
    if idx.config.metric == "euclidean":
        from redis_hnsw_tpu.ops.scan import reply_ids_engaged

        os.environ["REDIS_HNSW_TPU_REPLY"] = "ids"
        try:
            if not reply_ids_engaged(idx.config.dim):
                # guarded mode declined (est. host rescore > est.
                # bytes saved on this link); nothing to measure --
                # the reply path is the full one above.
                log(f"[{name}] ids-only reply: guard auto-disabled "
                    f"at dim={idx.config.dim} (host rescore > bytes "
                    f"saved; ids-force overrides)")
            else:
                idx.search_batch(q_dev, k, reply="columnar",
                                 host_qs=queries)
                dt_ids = _timed_med(
                    lambda: idx.search_batch(
                        q_dev, k, reply="columnar", host_qs=queries
                    ),
                    reps, "ids-reply",
                )
                ids_qps = n_queries / dt_ids
                log(f"[{name}] auto engine, ids-only reply: "
                    f"{ids_qps:.0f} qps "
                    f"({ids_qps / auto_qps:.2f}x the full reply)")
        finally:
            os.environ.pop("REDIS_HNSW_TPU_REPLY", None)

    # -- approx-select tier (oversampled approx_max_k, exact re-reduce;
    # the 2.4-3.9x lever at >=1M rows, artifacts/scan_tiers.json --
    # recorded here at bench scale for the trend)
    ap_recall = recall_tie(
        idx.search_batch(q_dev, k, engine="scan-approx")
    )
    idx.search_batch(q_dev, k, engine="scan-approx", reply="columnar")
    ap_qps = n_queries / _timed_med(
        lambda: idx.search_batch(q_dev, k, engine="scan-approx",
                                 reply="columnar"),
        reps, "scan-approx",
    )
    log(f"[{name}] scan-approx tier: tie-aware recall@{k}="
        f"{ap_recall:.4f} {ap_qps:.0f} qps (big-N tier: at bench "
        f"scale the exact scan already wins; see artifacts/"
        f"scan_tiers.json for the >=1M operating points)")

    base_qps = _baseline_qps(idx, queries, n_q=base_n)
    log(f"[{name}] ratio vs sequential baseline: auto "
        f"{auto_qps / base_qps:.2f}x, graph {graph_qps / base_qps:.2f}x")
    return {
        "qps": auto_qps, "recall": auto_recall,
        "serve_qps": serve_qps,
        "graph_qps": graph_qps, "graph_recall": graph_recall,
        "ids_reply_qps": ids_qps,
        "scan_approx_qps": ap_qps, "scan_approx_recall": ap_recall,
        "ef": ef, "iters": iters,
        "build_s": build_s, "build_warm_s": build_warm_s,
        "base_qps": base_qps, "hbm_gbps": hbm_gbps, "pct_peak": pct_peak,
    }


def _hbm_peak_gbps() -> float:
    """HBM peak bandwidth of the attached chip (GB/s)."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 819.0
    if "v5p" in kind or "v5" in kind:
        return 2765.0
    if "v4" in kind:
        return 1228.0
    if "v6" in kind or "trillium" in kind:
        return 1640.0
    return 819.0  # conservative default


def _roofline(idx, n_queries: int, *, expand: int, iters: int, dt: float):
    """Achieved HBM GB/s for the beam step's frontier gathers.

    Analytic per-step gather bytes at the chosen operating point (the
    beam's dominant HBM traffic -- PLAN.md: the step is gather-bound),
    assuming all ``iters`` steps run (the while_loop may exit earlier,
    so this is an upper bound on bytes; sort traffic is excluded, so it
    is simultaneously a lower bound on total traffic -- treat as the
    order-of-magnitude roofline position, not an exact counter).
    """
    from redis_hnsw_tpu.ops.search import MAX_LANES

    snap = idx.device_snapshot()
    B = min(n_queries, MAX_LANES)
    n_calls = (n_queries + B - 1) // B
    F = int(snap.adj0.shape[1])
    if snap.nbrvec is not None:
        step_bytes = (
            B * expand * int(snap.nbrvec.shape[1])
            * int(snap.nbrvec.shape[2]) * snap.nbrvec.dtype.itemsize
        )
    elif snap.qrows is not None:
        step_bytes = B * expand * F * int(snap.qrows.shape[1])
    else:
        step_bytes = (
            B * expand * F * int(snap.vecs.shape[1])
            * snap.vecs.dtype.itemsize
        )
    total = step_bytes * iters * n_calls
    gbps = total / dt / 1e9
    peak = _hbm_peak_gbps()
    return gbps, 100.0 * gbps / peak


def config1():
    return _bench_one("cfg1-sift-regime", dim=128)


def config3():
    # GIST regime: distance-bound 960-d (BASELINE.md config 3)
    return _bench_one(
        "cfg3-gist-regime", dim=960, base_n=1000,
        sweep=((256, 20), (320, 24), (400, 28), (512, 36)),
    )


def config5():
    # 256-bit binary Hamming (declared-but-unimplemented upstream,
    # Readme.md:8; fully implemented here end-to-end)
    return _bench_one(
        "cfg5-hamming-256b", dim=256, metric="hamming", base_n=1000,
        sweep=((256, 20), (320, 24), (400, 28), (512, 36)),
    )


def config1_parity():
    """BASELINE config 1 EXACTLY as specified: M=5, EFCON=200 -- the
    reference's own defaults (src/lib.rs:48,53; m_max_0=2m=10,
    core.rs:335-338). The headline cfg1 runs M=16 for the recall@10
    >= 0.95 bar; this row measures the true parity workload (VERDICT
    r4 weak#6) at the reference's hardwired operating point
    (ef_search = ef_construction, core.rs:485): graph + auto engines
    vs the sequential native baseline on the SAME M=5 graph."""
    import jax.numpy as jnp

    from redis_hnsw_tpu import HNSWIndex, IndexConfig
    from redis_hnsw_tpu.models.flat import FlatIndex

    rng = np.random.default_rng(0)
    n, dim, k, n_queries = 10_000, 128, 10, 2048
    data = rng.standard_normal((n, dim)).astype(np.float32)
    queries = rng.standard_normal((n_queries, dim)).astype(np.float32)
    names = [f"n{i}" for i in range(n)]
    idx = HNSWIndex(
        "cfg1-parity",
        IndexConfig(dim=dim, m=5, ef_construction=200, seed=7),
    )
    t0 = time.perf_counter()
    idx.add_batch(names, data, batch_size=2048)
    build_s = time.perf_counter() - t0
    oracle = FlatIndex("o-parity", IndexConfig(dim=dim))
    oracle.add_batch(names, data)
    recall = _recall_fn(oracle.search_batch(queries, k), k)
    q_dev = jnp.asarray(queries)

    # graph engine at the parity beam width (ef_search defaults to
    # ef_construction, reproducing core.rs:485)
    res = idx.search_batch(q_dev, k, expand=16, engine="graph")
    g_recall = recall(res)
    dt = _timed_med(
        lambda: idx.search_batch(q_dev, k, expand=16, engine="graph"),
        7, "parity-graph",
    )
    g_qps = n_queries / dt
    a_recall = recall(idx.search_batch(q_dev, k))
    idx.search_batch(q_dev, k, reply="columnar")
    dt_a = _timed_med(
        lambda: idx.search_batch(q_dev, k, reply="columnar"),
        7, "parity-auto",
    )
    a_qps = n_queries / dt_a
    base = _baseline_qps(idx, queries, n_q=1000)
    log(f"[cfg1-parity M=5] graph ef=200(default): recall@{k}="
        f"{g_recall:.4f} {g_qps:.0f} qps ({g_qps / base:.1f}x seq); "
        f"auto: recall {a_recall:.4f} {a_qps:.0f} qps "
        f"({a_qps / base:.1f}x seq); build {build_s:.1f}s")
    return {
        "m": 5, "efcon": 200,
        "graph_qps": round(g_qps, 1), "graph_recall": round(g_recall, 4),
        "auto_qps": round(a_qps, 1), "auto_recall": round(a_recall, 4),
        "base_qps": round(base, 1),
        "vs_baseline_auto": round(a_qps / base, 2),
        "vs_baseline_graph": round(g_qps / base, 2),
        "build_s": round(build_s, 1),
    }


def main():
    only = None
    if "--config" in sys.argv:
        only = int(sys.argv[sys.argv.index("--config") + 1])
    log(f"devices: {_init_devices_or_die()}")
    try:
        probe_s = _tunnel_probe()
    except Exception as e:  # the probe must never break the bench
        log(f"tunnel probe failed: {e!r}")
        probe_s = None

    if only in (3, 5):
        fn = config3 if only == 3 else config5
        r = fn()
        print(json.dumps({
            "metric": f"config-{only} qps/chip at recall@10={r['recall']:.3f}",
            "value": round(r["qps"], 1),
            "unit": "qps/chip",
            "vs_baseline": round(r["qps"] / r["base_qps"], 2),
            "serve_qps": round(r["serve_qps"], 1),
            "graph_qps": round(r["graph_qps"], 1),
            "graph_recall": round(r["graph_recall"], 4),
            "scan_approx_qps": round(r["scan_approx_qps"], 1),
            "scan_approx_recall": round(r["scan_approx_recall"], 4),
            "ids_reply_qps": (
                None if r["ids_reply_qps"] is None
                else round(r["ids_reply_qps"], 1)
            ),
            "hbm_gbps": round(r["hbm_gbps"], 1),
            "pct_peak": round(r["pct_peak"], 1),
            "build_s": round(r["build_s"], 1),
            "build_warm_s": round(r["build_warm_s"], 1),
            "tunnel_probe_s": probe_s,
        }))
        return

    r = config1()

    # the true parity workload (M=5, the reference's defaults): carried
    # in the headline JSON as parity_m5
    parity = None
    try:
        parity = config1_parity()
    except Exception as e:  # never break the bench
        log(f"parity-config measurement failed: {e!r}")

    # side measurements for the record (stderr only, cheap): BASELINE
    # configs 3 and 5
    if only is None:
        try:
            config3()
            config5()
        except Exception as e:  # side configs must never break the bench
            log(f"side-config measurement failed: {e!r}")

    print(
        json.dumps(
            {
                "metric": (
                    f"batched qps/chip at recall@10={r['recall']:.3f} "
                    f"(10k x 128d, M=16, efcon=200; auto engine = exact "
                    f"MXU scan, columnar reply; pipelined 8-batch "
                    f"serving {r['serve_qps']:.0f} qps; graph engine "
                    f"{r['graph_qps']:.0f} qps at "
                    f"recall {r['graph_recall']:.3f} ef={r['ef']}; "
                    f"steady build {r['build_s']:.0f}s, first-compile "
                    f"pass {r['build_warm_s']:.0f}s; baseline=median-of-"
                    f"5x1000 native single-core search_knn)"
                ),
                "value": round(r["qps"], 1),
                "unit": "qps/chip",
                "vs_baseline": round(r["qps"] / r["base_qps"], 2),
                "serve_qps": round(r["serve_qps"], 1),
                "graph_qps": round(r["graph_qps"], 1),
                "graph_recall": round(r["graph_recall"], 4),
                "scan_approx_qps": round(r["scan_approx_qps"], 1),
                "scan_approx_recall": round(r["scan_approx_recall"], 4),
                "ids_reply_qps": (
                    None if r["ids_reply_qps"] is None
                    else round(r["ids_reply_qps"], 1)
                ),
                "hbm_gbps": round(r["hbm_gbps"], 1),
                "pct_peak": round(r["pct_peak"], 1),
                "build_s": round(r["build_s"], 1),
                "build_warm_s": round(r["build_warm_s"], 1),
                "parity_m5": parity,
                "tunnel_probe_s": probe_s,
            }
        )
    )


if __name__ == "__main__":
    main()
