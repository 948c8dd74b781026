"""Exact MXU scan engine: brute-force k-NN over the index snapshot.

The measured TPU reality (v5e, B=2048, this box): one [B, D] x [D, N]
MXU matmul + top_k beats the batched HNSW graph traversal by an order
of magnitude until N reaches the millions --

    euclid 128d  N=10k   213k qps   (graph engine: ~13k)
    euclid 128d  N=131k  117k qps   (graph engine: ~4.3k)
    euclid 128d  N=1M    21.3k qps  (graph engine: ~5.1k at recall .973)

-- and the scan is EXACT (recall 1.0). The graph engine's sequential
beam steps pay ~30 sorts of [B, ~1k] each; the scan pays one matmul
that the MXU was built for. This is the inverse of the CPU economics
the reference is designed around (its pointer graph exists to avoid
the O(N) scan its single core cannot afford, src/hnsw/core.rs), and
the reason this framework routes small-to-mid indexes to the scan by
default (``engine="auto"`` in ops/search.py) and keeps the graph for
the regime where O(N) finally loses.

Hamming rides the MXU too: packed uint32 rows unpack once per epoch to
an int8 {-1,+1} table, and hamming(a, b) = (D - a.b) / 2 -- an int8
matmul instead of the VPU popcount scan that collapses past ~100k rows
(measured 84k qps at 10k but 4.9k at 131k; the xor+popcount tile is
bandwidth/VPU-bound while the MXU path stays matmul-bound).

Scoring is chunked over rows (CHUNK_N) so the [B, N] score tile never
exceeds ~2GB; per-chunk top-k merges via concat + top_k on device.
Final euclidean sims are rescored in exact direct form and re-sorted,
identical to the graph engine's reply contract (ops/search.py).
"""

from __future__ import annotations

import os
import threading
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import distance as D

NEG_INF = float("-inf")

# Rows scored per chunk: [2048, 2^19] f32 scores = 4GB peak per chunk
# intermediate (scores + top_k working set) -- safe alongside the
# snapshot tables on a 16GB chip. REDIS_HNSW_TPU_SCAN_CHUNK overrides
# (log2): capacity-edge tables (e.g. the 32M int8-resident demo, where
# the int8 chunk path holds int32 dots AND f32 scores at once) can
# halve the chunk to trade a few % of throughput for HBM headroom.
CHUNK_N = 1 << 19
if os.environ.get("REDIS_HNSW_TPU_SCAN_CHUNK"):
    CHUNK_N = 1 << int(os.environ["REDIS_HNSW_TPU_SCAN_CHUNK"])

# Below this many full chunks the chunk loop unrolls (XLA overlaps the
# next chunk's matmul with the current chunk's select); at/above it the
# loop compiles to ONE lax.scan so program size stays constant in N
# (a 32M-row capacity table is 64 chunks -- unrolled, that is 64
# matmul+top_k segments and multi-minute compiles).
SCAN_LOOP_MIN_CHUNKS = 8


def scan_oversample() -> int:
    """Approx-select oversampling factor: per chunk the approx tier
    keeps k_sel = factor*k approx_max_k candidates before the exact
    re-reduce (default 4, measured ~0.999 recall at 1M x 128d). The
    capacity regime trades it against recall -- at 32M rows the int8
    selection's recall floor moves with it (the flat_capacity.py
    ladder, artifacts/flat_capacity.json). Read at trace time like the
    other scan gates; benchmarks flipping it mid-process must clear
    the scan caches."""
    v = os.environ.get("REDIS_HNSW_TPU_SCAN_OVERSAMPLE", "4")
    try:
        return max(1, int(v))
    except ValueError:
        raise ValueError(f"REDIS_HNSW_TPU_SCAN_OVERSAMPLE={v!r}")


def int8_rescore_mult() -> int:
    """Selection width multiplier for the int8-RESIDENT flat tier:
    the device selects mult*k candidates on the quantized table and
    the host f32-rescore keeps the exact-best k of them. Buys recall
    lost to int8 scoring error (the capacity ladder,
    artifacts/flat_capacity.json) for one slightly wider id transfer
    plus a tiny host gemm. REDIS_HNSW_TPU_INT8_RESCORE, default 8;
    the 32M ladder (artifacts/flat_capacity.json) records the
    recall/qps tradeoff per width."""
    v = os.environ.get("REDIS_HNSW_TPU_INT8_RESCORE", "8")
    try:
        return max(1, int(v))
    except ValueError:
        raise ValueError(f"REDIS_HNSW_TPU_INT8_RESCORE={v!r}")


def scan_dtype() -> str:
    """Euclidean scan-table tier: REDIS_HNSW_TPU_SCAN_DTYPE.

    * ``f32`` (default) -- score in f32; selection is exactly exact.
    * ``bf16`` -- keep the scan copy of the vector table in bfloat16:
      the MXU's native input width, so the [B, D] x [D, N] score
      matmul runs at full systolic rate instead of the multi-pass f32
      emulation, and the scan copy is half the bytes. Selection order
      can differ from f32 only where two rows' scores agree to ~3
      decimal digits; the selected k are ALWAYS rescored in exact f32
      direct form from the f32 snapshot (scan_topk_exact_l2), so
      reported sims stay reference-exact either way.
    * ``int8`` -- per-row symmetric quantization (scale = max|v|/127,
      one f32 scale per row): the selection table is a QUARTER the f32
      bytes and the score matmul is an int8 x int8 -> int32 MXU op
      (2x bf16 systolic rate). Selection is approximate (~0.4%/component
      rounding); the final k are rescored exact-f32 like bf16. The
      capacity tier: ~8M rows of 128d selection table per 16GB chip.
    """
    v = os.environ.get("REDIS_HNSW_TPU_SCAN_DTYPE", "f32")
    if v not in ("f32", "bf16", "int8"):
        raise ValueError(f"REDIS_HNSW_TPU_SCAN_DTYPE={v!r}")
    return v


@jax.jit
def _to_bf16(vecs):
    return vecs.astype(jnp.bfloat16)


@jax.jit
def _to_int8(vecs):
    """Per-row symmetric int8 quantization -> (q8 [N, D], scale [N]).

    scale maps int8 back to f32 (v ~ q8 * scale); all-zero rows get
    scale 1 so the descale stays finite."""
    amax = jnp.max(jnp.abs(vecs), axis=1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q8 = jnp.clip(
        jnp.round(vecs / scale[:, None]), -127, 127
    ).astype(jnp.int8)
    return q8, scale.astype(jnp.float32)


def pm1_table(vecs_packed: jnp.ndarray) -> jnp.ndarray:
    """[N, W] uint32 packed bits -> [N, 32W] int8 in {-1, +1}.

    Built on device once per snapshot epoch (no host round-trip);
    hamming distance then becomes (D - dot)/2 over this table.
    """
    shifts = np.arange(32, dtype=np.uint32)[None, None, :]
    bits = (vecs_packed[:, :, None] >> shifts) & jnp.uint32(1)
    n = vecs_packed.shape[0]
    return (2 * bits.astype(jnp.int8) - 1).reshape(n, -1)


@jax.jit
def _build_pm1(vecs_packed):
    return pm1_table(vecs_packed)


def _chunk_scores(q, rows, sq, ts, *, metric, d_bits, qq, qscale):
    """Score one row chunk against the (pre-transformed) query block.

    Shared by the unrolled tail and the lax.scan body below so the
    three metric formulations stay byte-identical between them."""
    if metric == "hamming":
        dots = jnp.dot(q, rows.T, preferred_element_type=jnp.int32)
        return (dots.astype(jnp.float32) - d_bits) * 0.5
    if ts is not None:
        dots = jnp.dot(q, rows.T, preferred_element_type=jnp.int32)
        dequant = dots.astype(jnp.float32) * (
            qscale[:, None] * ts[None, :]
        )
        return 2.0 * dequant - qq - sq[None, :]
    dots = jnp.dot(q, rows.T, preferred_element_type=jnp.float32)
    return 2.0 * dots - qq - sq[None, :]


def _select_merge(top_sims, top_ids, scores, lv, lo, *, k_sel, approx):
    """Per-chunk select (exact top_k or oversampled approx_max_k) and
    running-top-k merge. ``lo`` is the chunk's global row offset
    (python int in the unrolled tail, traced int32 under lax.scan)."""
    scores = jnp.where(lv[None, :], scores, NEG_INF)
    kc = min(k_sel, scores.shape[1])
    if approx:
        c_sims, c_idx = jax.lax.approx_max_k(
            scores, kc, recall_target=0.99
        )
    else:
        c_sims, c_idx = jax.lax.top_k(scores, kc)
    c_ids = (c_idx + lo).astype(jnp.int32)
    c_ids = jnp.where(c_sims == NEG_INF, -1, c_ids)
    merged_sims = jnp.concatenate([top_sims, c_sims], axis=1)
    merged_ids = jnp.concatenate([top_ids, c_ids], axis=1)
    top_sims, pos = jax.lax.top_k(merged_sims, k_sel)
    top_ids = jnp.take_along_axis(merged_ids, pos, axis=1)
    return top_sims, top_ids


@partial(
    jax.jit,
    static_argnames=("k", "metric", "pack", "pack_bits", "approx",
                     "full_sel"),
)
def scan_topk(
    table, sqn, live, queries, *, k: int, metric: str,
    pack: bool = False, pack_bits: int | None = None,
    approx: bool = False, tscale=None, full_sel: bool = False,
):
    """Exact top-k of every query against every live row.

    ``table`` is [N, D] f32 (euclidean; = snapshot vecs) or [N, 32W]
    int8 +-1 (hamming; from :func:`pm1_table`). ``live`` masks real,
    undeleted rows. Returns (ids, sims) sorted descending by
    (sim, -id), or the packed [B, 2k] int32 reply when ``pack``; with
    ``pack_bits`` (hamming only) the reply is [B, k] int32 words
    ``(dist << pack_bits) | id`` (-1 for empty slots) -- half the
    device->host bytes. ``tscale`` [N] f32 marks the euclidean int8
    tier: ``table`` is per-row-quantized int8 (from :func:`_to_int8`)
    and the dot runs int8 x int8 -> int32 on the MXU, descaled by the
    row/query scales before selection.

    Full chunks run under ONE lax.scan (program size constant in N --
    a 32M-row capacity table is 64 chunks, which would otherwise
    unroll into 64 matmul+top_k segments and multi-minute compiles);
    the remainder chunk is a single unrolled step of the same helpers.

    ``full_sel`` returns the ENTIRE merged selection ([B, k_sel] --
    4k-wide under ``approx``) sorted by (-sim, id) instead of trimming
    to k: the deep-certificate paths verify tie classes against the
    whole selection so a tie class straddling the k boundary (the
    common case for hamming's integer distances) still certifies when
    it fits inside the oversampled selection.
    """
    B = queries.shape[0]
    N = table.shape[0]
    n_chunk = min(CHUNK_N, N)
    # approx mode: per-chunk jax.lax.approx_max_k with 4x oversampling
    # instead of exact top_k -- measured 6.3x faster at 2^19 rows
    # (fused dot+select 8.3ms vs 51.9ms; the select, not the matmul,
    # dominates the exact scan). The oversampled union is re-reduced
    # exactly below, so only true neighbors ranked outside a chunk's
    # approx top-4k can be missed (measured recall ~0.999).
    k_sel = (
        min(scan_oversample() * k, n_chunk)
        if approx
        else min(k, n_chunk)
    )
    top_sims = np.full((B, k_sel), NEG_INF, np.float32)
    top_ids = np.full((B, k_sel), -1, np.int32)
    d_bits = qq = qscale = None
    if metric == "hamming":
        d_bits = table.shape[1]
        q = pm1_table(queries)
    elif tscale is not None:
        # int8 tier: quantize the query side per-row the same way
        q, qscale = _to_int8(queries.astype(jnp.float32))
        qf = queries.astype(jnp.float32)
        qq = jnp.sum(qf * qf, axis=-1, keepdims=True)
    else:
        # bf16 tier: cast the query side to match the table so the dot
        # is a native bf16 x bf16 -> f32 MXU matmul (scan_dtype()).
        q = queries.astype(table.dtype)
        qf = queries.astype(jnp.float32)
        qq = jnp.sum(qf * qf, axis=-1, keepdims=True)
    score_kw = dict(metric=metric, d_bits=d_bits, qq=qq, qscale=qscale)
    n_full, rem = divmod(N, n_chunk)
    if n_full >= SCAN_LOOP_MIN_CHUNKS:
        # row-major reshapes of the resident tables are free views
        nc = n_full * n_chunk
        xs = (
            table[:nc].reshape(n_full, n_chunk, table.shape[1]),
            sqn[:nc].reshape(n_full, n_chunk),
            live[:nc].reshape(n_full, n_chunk),
            None if tscale is None else tscale[:nc].reshape(
                n_full, n_chunk
            ),
            np.arange(n_full, dtype=np.int32) * n_chunk,
        )

        def body(carry, x):
            rows, sq, lv, ts, lo = x
            scores = _chunk_scores(q, rows, sq, ts, **score_kw)
            return _select_merge(
                carry[0], carry[1], scores, lv, lo,
                k_sel=k_sel, approx=approx,
            ), None

        (top_sims, top_ids), _ = jax.lax.scan(
            body, (top_sims, top_ids), xs
        )
        tail = [(nc, N)] if rem else []
    else:
        tail = [
            (lo, min(lo + n_chunk, N)) for lo in range(0, N, n_chunk)
        ]
    for lo, hi in tail:
        scores = _chunk_scores(
            q, table[lo:hi], sqn[lo:hi],
            None if tscale is None else tscale[lo:hi], **score_kw,
        )
        top_sims, top_ids = _select_merge(
            top_sims, top_ids, scores, live[lo:hi], lo,
            k_sel=k_sel, approx=approx,
        )
    if full_sel:
        return D.resort_desc(top_ids, top_sims)
    ids, sims = top_ids[:, :k], top_sims[:, :k]
    ids, sims = D.resort_desc(ids, sims)
    if pack and pack_bits is not None:
        dist = (-sims).astype(jnp.int32)
        word = (dist << pack_bits) | ids
        return jnp.where(ids < 0, -1, word)
    if pack:
        return jnp.concatenate(
            [ids, jax.lax.bitcast_convert_type(sims, jnp.int32)], axis=1
        )
    return ids, sims


@partial(jax.jit, static_argnames=("k", "pack", "approx"))
def scan_topk_exact_l2(
    vecs, sqn, live, queries, *, k: int, pack=False, approx=False,
    table=None, tscale=None,
):
    """Euclidean scan + exact direct-form rescore of the final k (the
    matmul form loses ~1e-3 relative to cancellation; reported sims
    must match the reference kernel to f32 rounding, metrics.rs:79-84).

    ``table`` optionally supplies a lower-precision copy of ``vecs``
    (the bf16 scan tier, or the int8 tier with its per-row ``tscale``)
    used only for SELECTION; the rescore always reads the exact f32
    ``vecs``.
    """
    ids, sims = scan_topk(
        vecs if table is None else table,
        sqn, live, queries, k=k, metric="euclidean", approx=approx,
        tscale=tscale,
    )
    sims = D.exact_neg_sq_l2(
        queries, vecs, jnp.maximum(ids, 0), sims != NEG_INF
    )
    ids, sims = D.resort_desc(ids, sims)
    if pack:
        return jnp.concatenate(
            [ids, jax.lax.bitcast_convert_type(sims, jnp.int32)], axis=1
        )
    return ids, sims


# -- certified-exact selection ------------------------------------------------
#
# The exact scan is SELECT-bound: per chunk, lax.top_k over [2048, 2^19]
# f32 is ~52ms while the fused approx_max_k dot+select is 8.3ms (PLAN.md,
# measured on the v5e). The certified path buys back most of that gap
# WITHOUT giving up the exact contract: it selects with the oversampled
# approx pass, then PROVES per query that the true top-k was captured
# with a cheap counting pass (recompute the chunk scores -- the matmul is
# ~2ms, the select was the cost -- and count rows scoring above the k-th
# selected score; masked sums, no top_k). A query is certified exact iff
#
#     count_all(score >  t) == count_selected(score >  t)   and
#     count_all(score == t) == count_selected(score == t)
#
# where t is its k-th selected (matmul-form) score: the first equality
# proves no unselected row beats t, the second that the whole tie class
# at t was captured (so tie membership matches the stable exact top_k).
# Uncertified queries (measured ~1% of a batch at 1M rows: the approx
# tier's ~0.999 recall floor, per result) fall back to the exact top_k
# path host-side in a small bucket-padded rerun. Selection "exact" means
# exact over the SAME matmul-form scores the plain exact path selects
# by; both passes run the identical dot_general shape, so the recomputed
# scores are bit-identical on TPU (fixed tiling => fixed accumulation
# order). REDIS_HNSW_TPU_SCAN_CERT=0 kills the path; =1 forces it at any
# size (default: engage at >= CERT_MIN_ROWS, where top_k starts to
# dominate). The bf16/int8 tiers stay uncertified: approximate by
# declaration.
#
# HAMMING certifies too, via a DEEP certificate (scan_certified_hamming
# below): integer distances tie so heavily that a k-th-slot tie class
# almost always straddles the k boundary, so certifying at the reply's
# k-th score would fall back on nearly every query -- instead the tie
# counts are checked against the ENTIRE 4k-oversampled selection
# (full_sel=True), which certifies whenever the straddling class fits
# inside the selection (on random bits the whole >=t population is a
# few dozen rows -- the k-th score sits in the binomial tail, where
# per-distance counts shrink ~1.7x per step -- vs the 4k-deep
# selection).
# Integer scores make the counting pass exactly representable in f32
# (|score| <= d_bits), so the hamming certificate has no cross-program
# ulp surface at all.

CERT_MIN_ROWS = 1 << 19

# The certificate trades the exact path's D-INDEPENDENT lax.top_k for a
# D-SCALED second matmul (the count pass re-scores every chunk), so its
# win shrinks with D -- but NOT linearly (TPU tiling regimes shift).
# Measured bracket on the v5e at 1M rows, B=2048, cert-vs-exact qps
# (artifacts/flat_highd.json + scan_tiers.json): 128d 1.31x, 384d
# 1.17x, 512d 1.04x, 768d 1.01x (serving 1.08x), 960d 0.69x LOSS.
# Auto therefore also gates on the PADDED table dim (the matmul pays
# the padded width): engage through the measured break-even at 768,
# stay off at 960 where the count pass clearly re-pays more than the
# top_k it saves.
CERT_MAX_DIM = 768

# Observability for tests and benchmarks: batches served by the
# certified path, and how many queries needed the exact fallback.
CERT_STATS = {"batches": 0, "queries": 0, "fallback_queries": 0}


def cert_enabled(n_rows: int, dim: int = 0) -> bool:
    """Should the certified-exact selector serve this scan? 0/1 force;
    auto engages where it measures a win: at >= CERT_MIN_ROWS rows
    (below, plain top_k is already cheap) AND <= CERT_MAX_DIM padded
    columns (above, the count pass's extra matmul outweighs the top_k
    it replaces -- see the model above). ``dim`` <= 0 skips the dim
    gate (callers that predate it)."""
    v = os.environ.get("REDIS_HNSW_TPU_SCAN_CERT", "auto")
    if v == "0":
        return False
    if v == "1":
        return True
    if v == "auto":
        try:
            max_dim = int(
                os.environ.get("REDIS_HNSW_TPU_SCAN_CERT_MAX_DIM")
                or CERT_MAX_DIM
            )
        except ValueError:
            max_dim = CERT_MAX_DIM
        return n_rows >= CERT_MIN_ROWS and (dim <= 0 or dim <= max_dim)
    raise ValueError(f"REDIS_HNSW_TPU_SCAN_CERT={v!r}")


def hamming_cert_ready(n_rows: int, words: int) -> bool:
    """True iff the certified-exact hamming branch will actually run
    for an ``n_rows`` table of ``words`` packed 32-bit words. Mirrors
    BOTH gates of the dispatchers (scan_dispatch, models/flat.
    _dispatch_flat): the word-packed reply ``(dist << id_bits) | id``
    must fit 31 bits, and the count pass's int8 dim gate must admit
    the table (cert_enabled at d_bits/2 = 16*words). Engine-aware
    fetch-window predicates use this so the wide-window default only
    engages where the certified path is really taken -- very large
    hamming tables fail the 31-bit pack and serve the compute-bound
    exact top_k, where the wide window measured no win."""
    d_bits = 32 * int(words)
    id_bits = max((int(n_rows) - 1).bit_length(), 1)
    if d_bits.bit_length() + id_bits > 31:
        return False
    return cert_enabled(int(n_rows), 16 * int(words))


def _count_vs_threshold(vecs, sqn, live, q, qq, t):
    """Per-query counts of live rows scoring (>, ==) threshold ``t``
    in matmul form -- the certificate's second pass. Mirrors
    scan_topk's chunk structure (one lax.scan at capacity scale) and
    shares _chunk_scores so the score formulation is identical."""
    B, N = q.shape[0], vecs.shape[0]
    n_chunk = min(CHUNK_N, N)
    kw = dict(metric="euclidean", d_bits=None, qq=qq, qscale=None)

    def acc(c_gt, c_eq, rows, sq, lv):
        scores = _chunk_scores(q, rows, sq, None, **kw)
        scores = jnp.where(lv[None, :], scores, NEG_INF)
        c_gt = c_gt + jnp.sum(
            scores > t[:, None], axis=1, dtype=jnp.int32
        )
        c_eq = c_eq + jnp.sum(
            scores == t[:, None], axis=1, dtype=jnp.int32
        )
        return c_gt, c_eq

    c_gt = np.zeros((B,), np.int32)
    c_eq = np.zeros((B,), np.int32)
    n_full, rem = divmod(N, n_chunk)
    if n_full >= SCAN_LOOP_MIN_CHUNKS:
        nc = n_full * n_chunk
        xs = (
            vecs[:nc].reshape(n_full, n_chunk, vecs.shape[1]),
            sqn[:nc].reshape(n_full, n_chunk),
            live[:nc].reshape(n_full, n_chunk),
        )

        def body(carry, x):
            return acc(carry[0], carry[1], *x), None

        (c_gt, c_eq), _ = jax.lax.scan(body, (c_gt, c_eq), xs)
        tail = [(nc, N)] if rem else []
    else:
        tail = [
            (lo, min(lo + n_chunk, N)) for lo in range(0, N, n_chunk)
        ]
    for lo, hi in tail:
        c_gt, c_eq = acc(
            c_gt, c_eq, vecs[lo:hi], sqn[lo:hi], live[lo:hi]
        )
    return c_gt, c_eq


def certified_local(vecs, sqn, live, queries, *, k: int):
    """Traced core of the certified path. Returns ``(ids, sims, ok)``
    with the rescored (-sim, id)-ordered reply and the [B] bool
    certificate verdicts. Used per shard under ``shard_map``
    (parallel/sharded.py:_sharded_scan_cert_jit), where each shard's
    table is 1/S of the rows so the one-program peak is fine; the
    single-chip path below splits the two passes into two programs
    instead (see :func:`scan_certified_l2`).

    Two forms, same contract: the ONE-PASS bin-max kernel
    (ops/pallas_select.py -- select and certificate from a single
    table read; default on TPU) or the two-pass approx select +
    counting certificate (the XLA form, and the fallback everywhere
    the kernel is off)."""
    from .pallas_select import BIN_L, onepass_enabled

    if onepass_enabled() and k <= max(1, vecs.shape[0] // BIN_L):
        return _certified_onepass_local(vecs, sqn, live, queries, k=k)
    ids, sims = scan_topk(
        vecs, sqn, live, queries, k=k, metric="euclidean", approx=True
    )
    return _cert_verify(vecs, sqn, live, queries, ids, sims)


def _certified_onepass_local(vecs, sqn, live, queries, *, k: int):
    """One-pass certified select (traced): the pallas_select kernel
    emits per-bin (best score, row id) plus the global second-best
    bound m2; the stable top-k over the bin maxes is PROVABLY the
    exact top-k whenever m2 < t (see ops/pallas_select.py for the
    argument, including tie classes at t). Same (ids, sims, ok)
    contract as the two-pass form; uncertified queries fall back
    through the shared machinery (certified_finish)."""
    from .pallas_select import onepass_interpret, select_bins

    qf = queries.astype(jnp.float32)
    qq = jnp.sum(qf * qf, axis=-1)
    sq_masked = jnp.where(live, sqn, jnp.inf)
    sims_c, ids_c, m2 = select_bins(
        vecs, sq_masked, qf, qq, interpret=onepass_interpret()
    )
    # stable top-k over the candidate set: lax.top_k prefers lower
    # indices on ties, and ids_c ascends with the column index, so tie
    # resolution is by lowest row id -- the exact path's order.
    top_sims, pos = jax.lax.top_k(sims_c, k)
    top_ids = jnp.take_along_axis(ids_c, pos, axis=1)
    top_ids = jnp.where(top_sims == NEG_INF, -1, top_ids)
    t = top_sims[:, -1]
    # strict: t == -inf (fewer than k live rows / empty bins) never
    # certifies -- the exact fallback serves those queries.
    ok = m2 < t
    sims = D.exact_neg_sq_l2(
        queries, vecs, jnp.maximum(top_ids, 0), top_sims != NEG_INF
    )
    ids, sims = D.resort_desc(top_ids, sims)
    return ids, sims, ok


def _cert_verify(vecs, sqn, live, queries, ids, sims):
    """Certificate + exact rescore over an approx selection (traced)."""
    t = sims[:, -1]
    s_gt = jnp.sum(sims > t[:, None], axis=1, dtype=jnp.int32)
    s_eq = jnp.sum(sims == t[:, None], axis=1, dtype=jnp.int32)
    qf = queries.astype(jnp.float32)
    qq = jnp.sum(qf * qf, axis=-1, keepdims=True)
    from .pallas_count import cert_kernel_enabled, count_gt_eq

    if cert_kernel_enabled():
        # fused matmul+count kernel: the [B, chunk] score tile stays in
        # VMEM instead of round-tripping HBM (pallas_count.py; self-
        # pads non-panel-aligned tables with +inf-sqnorm dead rows)
        sq_masked = jnp.where(live, sqn, jnp.inf)
        c_gt, c_eq = count_gt_eq(vecs, sq_masked, qf, qq[:, 0], t)
    else:
        c_gt, c_eq = _count_vs_threshold(vecs, sqn, live, qf, qq, t)
    # c_gt == s_gt must hold even when t == -inf: there it asserts that
    # EVERY live row (all score finite, so all > -inf) is among the
    # selected -- i.e. the k-th slot is empty because fewer than k live
    # rows exist, not because the approx selection returned short (on
    # real TPUs approx_max_k is a bin reduction and CAN return fewer
    # than k finite candidates while live rows were missed). Only the
    # tie-class equality is escaped at t == -inf, where c_eq would
    # count dead rows.
    ok = (c_gt == s_gt) & ((t == NEG_INF) | (c_eq == s_eq))
    sims = D.exact_neg_sq_l2(
        queries, vecs, jnp.maximum(ids, 0), sims != NEG_INF
    )
    ids, sims = D.resort_desc(ids, sims)
    return ids, sims, ok


@partial(jax.jit, static_argnames=("ids_only",))
def _cert_verify_l2(vecs, sqn, live, queries, ids, sims,
                    *, ids_only: bool = False):
    """The certificate/rescore pass as its OWN program (packed reply).

    Kept separate from the approx-select program deliberately: at 1M
    rows each pass's chunk score tiles peak at ~8GB ([2048, 2^19] f32
    x 2 overlapped unrolled chunks), and the fused one-program form
    OOMed the 16GB chip (measured, artifacts/scan_tiers.json r3 run)
    while the exact-scan program of the same peak fits. Two programs
    executed back-to-back never have both passes' tiles co-resident
    in one buffer assignment.

    The per-query certificate verdict rides the reply as a trailing
    int32 column instead of its own output array: the tunnel's D2H is
    LATENCY-bound (~28ms per transfer regardless of bytes, CLAUDE.md),
    so a second [B] bool fetch would cost as much as the whole reply --
    measured, it was ~45%% of the certified path's end-to-end wall at
    1M rows (artifacts/cert_breakdown.json)."""
    ids, sims, ok = _cert_verify(vecs, sqn, live, queries, ids, sims)
    okcol = ok.astype(jnp.int32)[:, None]
    if ids_only:
        return jnp.concatenate([ids, okcol], axis=1)
    return jnp.concatenate(
        [ids, jax.lax.bitcast_convert_type(sims, jnp.int32), okcol],
        axis=1,
    )


@partial(jax.jit, static_argnames=("k", "ids_only"))
def _scan_certified_fused(vecs, sqn, live, queries, *, k: int,
                          ids_only: bool = False):
    """Select + certificate + rescore as ONE device program.

    Only safe when the count pass runs the fused Pallas kernel
    (pallas_count.py): with the XLA count pass, select and count each
    peak ~8GB of [2048, 2^19] score tiles and the one-program buffer
    assignment OOMed a 16GB chip at 1M rows (r3, scan_tiers.json);
    the kernel's score panels live in VMEM, so the fused program
    peaks like the select program alone. Saves one dispatch round
    trip per batch over the two-program split."""
    ids, sims, ok = certified_local(vecs, sqn, live, queries, k=k)
    okcol = ok.astype(jnp.int32)[:, None]
    if ids_only:
        return jnp.concatenate([ids, okcol], axis=1)
    return jnp.concatenate(
        [ids, jax.lax.bitcast_convert_type(sims, jnp.int32), okcol],
        axis=1,
    )


def _cert_fuse_enabled(n_rows: int) -> bool:
    """REDIS_HNSW_TPU_CERT_FUSE=0/1/auto: one-program certified scan.

    auto = exactly when the count kernel is engaged -- the
    memory-safety condition in :func:`_scan_certified_fused`'s
    docstring (the kernel self-pads non-panel-aligned tables)."""
    from .pallas_count import cert_kernel_enabled

    v = os.environ.get("REDIS_HNSW_TPU_CERT_FUSE", "auto")
    if v == "0":
        return False
    if v == "1":
        return True
    if v == "auto":
        return cert_kernel_enabled()
    raise ValueError(f"REDIS_HNSW_TPU_CERT_FUSE={v!r}")


def scan_certified_l2(vecs, sqn, live, queries, *, k: int,
                      ids_only: bool = False):
    """Approx-selected, certificate-checked euclidean top-k.

    Returns a [B, 2k+1] int32 block: :func:`scan_topk_exact_l2`'s
    packed reply contract (exact direct-form rescored sims, (-sim, id)
    order) with the certificate verdict appended as the last column
    (1 = that query's selection is PROVABLY the exact matmul-form
    top-k, see the certificate above; 0 = the caller must rerun it
    through the exact path). ``ids_only`` narrows the block to
    [B, k+1] (ids + verdict; the ids-reply mode's host rescore
    recomputes sims). Queries with fewer than k live rows certify
    through the c_gt equality (every live row selected).

    One fused device program when the one-pass select kernel or the
    Pallas count kernel is engaged (:func:`_scan_certified_fused`);
    otherwise a host-level composition of two programs (approx select,
    then certificate+rescore) -- see :func:`_cert_verify_l2` for why
    the XLA-count form must not fuse. ``scan_topk`` is looked up at
    call time so tests can monkeypatch the selection."""
    from .pallas_select import BIN_L, onepass_enabled

    if onepass_enabled() and k <= max(1, vecs.shape[0] // BIN_L):
        # one-pass form: the only full-table op is the pallas_select
        # kernel (score panels in VMEM), so the fused program's peak
        # is the bin outputs -- always safe to run as one program
        return _scan_certified_fused(
            vecs, sqn, live, queries, k=k, ids_only=ids_only
        )
    if _cert_fuse_enabled(vecs.shape[0]):
        return _scan_certified_fused(
            vecs, sqn, live, queries, k=k, ids_only=ids_only
        )
    ids, sims = scan_topk(
        vecs, sqn, live, queries, k=k, metric="euclidean", approx=True
    )
    return _cert_verify_l2(
        vecs, sqn, live, queries, ids, sims, ids_only=ids_only
    )


def _scan_certified_clear_cache() -> None:
    _cert_verify_l2.clear_cache()
    _scan_certified_fused.clear_cache()


# jit-like cache control for tests that reshape CHUNK_N mid-run
scan_certified_l2.clear_cache = _scan_certified_clear_cache


def pad_pow2(n: int, floor: int = 8) -> int:
    """Smallest power of two >= n (and >= floor): the batch-padding
    rule shared by every device entry so program shapes stay few."""
    p = floor
    while p < n:
        p *= 2
    return p


# Every CERT_AUDIT_EVERY-th certified batch is re-served through the
# exact path and byte-compared (REDIS_HNSW_TPU_SCAN_CERT_AUDIT
# overrides; 0 disables). The certificate's soundness rests on the
# count pass recomputing the SAME matmul-form scores as the selection
# pass -- identical _chunk_scores shapes, which fixes the MXU tiling
# and accumulation order -- but XLA does not contractually promise
# bit-equality across differently-fused consumers, so the audit turns
# a hypothetical drift from silent wrongness into a counted, repaired
# signal (CERT_STATS audits/audit_mismatches; mismatched batches are
# served the exact result).
CERT_AUDIT_EVERY = int(
    os.environ.get("REDIS_HNSW_TPU_SCAN_CERT_AUDIT", "256") or 0
)


def certified_topk_l2(vecs, sqn, live, qd, *, k: int, n_q: int,
                      ids_only: bool = False):
    """Host wrapper around :func:`scan_certified_l2`: runs the
    certified pass, then re-serves any uncertified queries through the
    exact top_k path (bucket-padded so rerun program shapes stay few).
    The result is byte-identical to scan_topk_exact_l2 on every query.
    ``qd`` is the (padded) device query block; ``n_q`` the real query
    count. Returns ``(ids, sims)`` numpy arrays, or just the [n_q, k]
    ids (``ids_only`` -- the ids-reply mode: half the D2H bytes,
    caller rescores sims host-side via :func:`host_exact_sims`)."""
    block = scan_certified_l2(
        vecs, sqn, live, qd, k=k, ids_only=ids_only
    )
    return certified_finish(
        vecs, sqn, live, qd, block, k=k, n_q=n_q, ids_only=ids_only
    )


def certified_finish(vecs, sqn, live, qd, block, *, k: int, n_q: int,
                     ids_only: bool = False, rerun_sink=None):
    """Host half of :func:`certified_topk_l2`: fetch the packed
    reply+verdict block of an already-dispatched
    :func:`scan_certified_l2` program, then re-serve any uncertified
    queries through the exact path. Split from the dispatch so a
    pipelined serving loop (ops/search.py) can enqueue the next
    batches' device programs before paying this batch's D2H round
    trip.

    ``rerun_sink`` (a :class:`CertRerunSink`) defers the per-batch
    exact fallback rerun: uncertified rows are registered with the
    sink and patched when the caller flushes it, so a multi-batch
    window pays ONE rerun round trip instead of one per batch (at
    ~1%% uncertified queries nearly every 2048-query batch has at
    least one). Audit batches and the pathological whole-batch
    fallback stay immediate; ids-only replies never defer (the host
    rescore needs final ids at return time).

    ``block`` is the dispatched device block, or a zero-arg getter
    over its [:n_q] slice (a :func:`fetch_handle`, so a fetch-window
    drain loop coalesces this batch's transfer with its neighbors')."""
    # ONE device->host transfer: reply + verdict column together (the
    # link is latency-bound; a separate ok fetch doubles the wall).
    # Writable host copy either way: the fallback below splices rows
    # in place, and zero-copy views of device buffers are read-only.
    block = block() if callable(block) else np.array(block[:n_q])
    packed, okh = block[:, :-1], block[:, -1] != 0
    CERT_STATS["batches"] += 1
    CERT_STATS["queries"] += n_q
    audit = (
        CERT_AUDIT_EVERY > 0
        and CERT_STATS["batches"] % CERT_AUDIT_EVERY == 0
    )
    deferred_bad = None
    if not okh.all() or audit:
        bad = np.flatnonzero(~okh)
        CERT_STATS["fallback_queries"] += len(bad)
        if audit or len(bad) * 4 > n_q:
            # audit pass, or pathological (tie-heavy / adversarial)
            # data where the whole batch beats many bucketed reruns
            full = scan_topk_exact_l2(vecs, sqn, live, qd, k=k, pack=True)
            full = np.asarray(
                full[:n_q, :k] if ids_only else full[:n_q]
            )
            if audit:
                CERT_STATS["audits"] = CERT_STATS.get("audits", 0) + 1
                if not np.array_equal(packed[okh], full[okh]):
                    CERT_STATS["audit_mismatches"] = (
                        CERT_STATS.get("audit_mismatches", 0) + 1
                    )
            packed = full
        elif rerun_sink is not None and not ids_only and len(bad):
            deferred_bad = bad
        elif len(bad):
            b_pad = pad_pow2(len(bad))
            sel = np.zeros(b_pad, np.int32)
            sel[: len(bad)] = bad
            q_bad = jnp.take(qd, jnp.asarray(sel), axis=0)
            pb = scan_topk_exact_l2(
                vecs, sqn, live, q_bad, k=k, pack=True
            )
            nb = len(bad)
            packed[bad] = np.asarray(pb[:nb, :k] if ids_only else pb[:nb])
    if ids_only:
        return packed
    ids = packed[:, :k]
    sims = np.ascontiguousarray(packed[:, k:]).view(np.float32)
    if deferred_bad is not None:
        rerun_sink.add(
            (vecs, sqn, live), qd, deferred_bad, ids, sims, k
        )
    return ids, sims


class CertRerunSink:
    """Coalesces certified-scan fallback reruns across a serving loop.

    Each registered batch contributes its uncertified rows; ``flush``
    serves the union in ONE exact program + ONE fetch and splices the
    rows back into the already-returned (ids, sims) arrays in place.
    Callers MUST flush before reading the replies (ops/search.py
    flushes after the pipelined drain, before assembly). Per-item
    gathers and the combined rerun block bucket-pad to pow2 so device
    program shapes stay few."""

    def __init__(self) -> None:
        self._tables = None
        self._rerun = None
        self._items: list = []

    def add(self, tables, qd, bad, ids, sims, k: int,
            rerun=None) -> None:
        """``rerun(q_bad, k) -> (ids, sims)`` numpy arrays overrides
        the default exact-L2 rerun (the hamming certified path passes
        its exact word-reply scan); one sink serves one engine, so the
        first registration pins it."""
        if self._tables is None:
            self._tables = tables
            self._rerun = rerun
        self._items.append((qd, np.asarray(bad), ids, sims, int(k)))

    def flush(self) -> None:
        if not self._items:
            return
        k = self._items[0][4]
        parts, spans, off = [], [], 0
        for qd, bad, _ids, _sims, _k in self._items:
            p = pad_pow2(len(bad))
            sel = np.zeros(p, np.int32)
            sel[: len(bad)] = bad
            parts.append(jnp.take(qd, jnp.asarray(sel), axis=0))
            spans.append((off, len(bad)))
            off += p
        q_bad = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        t_pad = pad_pow2(off)
        if t_pad != off:
            q_bad = jnp.concatenate([
                q_bad,
                jnp.zeros((t_pad - off, q_bad.shape[1]), q_bad.dtype),
            ])
        if self._rerun is not None:
            ids_all, sims_all = self._rerun(q_bad, k)
        else:
            vecs, sqn, live = self._tables
            pb = np.asarray(
                scan_topk_exact_l2(vecs, sqn, live, q_bad, k=k, pack=True)
            )
            ids_all = pb[:, :k]
            sims_all = np.ascontiguousarray(pb[:, k:]).view(np.float32)
        for (qd, bad, ids, sims, kk), (lo, nb) in zip(self._items, spans):
            ids[bad] = ids_all[lo : lo + nb, :kk]
            sims[bad] = sims_all[lo : lo + nb, :kk]
        self._items.clear()
        self._tables = None
        self._rerun = None


# -- certified-exact hamming (deep certificate) --------------------------------
#
# Same counting proof as the euclidean certificate, with two
# hamming-specific twists (see the certificate block comment above):
# the tie counts are verified against the ENTIRE 4k-oversampled
# selection (integer distances tie so heavily that the reply's k-th
# tie class almost always straddles the k boundary -- the deep check
# certifies whenever the class fits in the selection), and the scores
# are small integers exactly representable in f32, so the select and
# count passes agree bit-for-bit by arithmetic, not by tiling luck.


def _count_vs_threshold_hamming(table, live, q, t):
    """Per-query counts of live rows scoring (>, ==) threshold ``t``
    over the +-1 int8 table -- the hamming certificate's second pass.
    ``q`` is the +-1 expansion of the query block. Mirrors scan_topk's
    chunk structure and shares _chunk_scores so the integer score
    formulation is identical to the selection pass's."""
    B, N = q.shape[0], table.shape[0]
    n_chunk = min(CHUNK_N, N)
    kw = dict(
        metric="hamming", d_bits=table.shape[1], qq=None, qscale=None
    )

    def acc(c_gt, c_eq, rows, lv):
        scores = _chunk_scores(q, rows, None, None, **kw)
        scores = jnp.where(lv[None, :], scores, NEG_INF)
        c_gt = c_gt + jnp.sum(
            scores > t[:, None], axis=1, dtype=jnp.int32
        )
        c_eq = c_eq + jnp.sum(
            scores == t[:, None], axis=1, dtype=jnp.int32
        )
        return c_gt, c_eq

    c_gt = np.zeros((B,), np.int32)
    c_eq = np.zeros((B,), np.int32)
    n_full, rem = divmod(N, n_chunk)
    if n_full >= SCAN_LOOP_MIN_CHUNKS:
        nc = n_full * n_chunk
        xs = (
            table[:nc].reshape(n_full, n_chunk, table.shape[1]),
            live[:nc].reshape(n_full, n_chunk),
        )

        def body(carry, x):
            return acc(carry[0], carry[1], *x), None

        (c_gt, c_eq), _ = jax.lax.scan(body, (c_gt, c_eq), xs)
        tail = [(nc, N)] if rem else []
    else:
        tail = [
            (lo, min(lo + n_chunk, N)) for lo in range(0, N, n_chunk)
        ]
    for lo, hi in tail:
        c_gt, c_eq = acc(c_gt, c_eq, table[lo:hi], live[lo:hi])
    return c_gt, c_eq


@partial(jax.jit, static_argnames=("k", "id_bits"))
def _cert_verify_hamming(table, live, queries, sel_ids, sel_sims,
                         *, k: int, id_bits: int):
    """Deep certificate + word-packed reply over a full hamming
    selection ([B, k_sel], already (-sim, id)-sorted by scan_topk's
    full_sel path). ``t`` is the k-th best score; the counts over the
    WHOLE selection prove it holds every row scoring > t and the whole
    tie class at t, so its first k entries are byte-identical to the
    exact scan's (-sim, id)-ordered reply. The verdict rides the reply
    as a trailing int32 column: one D2H per certified batch (the link
    is latency-bound, see _cert_verify_l2)."""
    t = sel_sims[:, k - 1]
    s_gt = jnp.sum(sel_sims > t[:, None], axis=1, dtype=jnp.int32)
    s_eq = jnp.sum(sel_sims == t[:, None], axis=1, dtype=jnp.int32)
    q = pm1_table(queries)
    c_gt, c_eq = _count_vs_threshold_hamming(table, live, q, t)
    # identical escape logic to the euclidean certificate: c_gt == s_gt
    # is required unconditionally (at t == -inf it asserts every live
    # row was selected -- a short approx selection must not certify);
    # only the tie-class equality is escaped at t == -inf, where c_eq
    # would count dead rows.
    ok = (c_gt == s_gt) & ((t == NEG_INF) | (c_eq == s_eq))
    ids, sims = sel_ids[:, :k], sel_sims[:, :k]
    dist = (-sims).astype(jnp.int32)
    word = jnp.where(ids < 0, -1, (dist << id_bits) | ids)
    return jnp.concatenate(
        [word, ok.astype(jnp.int32)[:, None]], axis=1
    )


def scan_certified_hamming(table, sqn, live, queries, *, k: int,
                           id_bits: int):
    """Approx-selected, deep-certificate-checked hamming top-k.

    Returns a [B, k+1] int32 block: the one-word-per-result packed
    reply ``(dist << id_bits) | id`` in exact (-sim, id) order, with
    the certificate verdict appended (1 = provably the exact top-k
    including tie membership; 0 = the caller reruns that query through
    the exact path). Two device programs (select, then count+pack),
    composed host-side like the unfused euclidean path -- each pass's
    [B, CHUNK_N] score tiles peak separately. ``scan_topk`` is looked
    up at call time so tests can monkeypatch the selection."""
    sel_ids, sel_sims = scan_topk(
        table, sqn, live, queries, k=k, metric="hamming", approx=True,
        full_sel=True,
    )
    return _cert_verify_hamming(
        table, live, queries, sel_ids, sel_sims, k=k, id_bits=id_bits
    )


scan_certified_hamming.clear_cache = _cert_verify_hamming.clear_cache


def _decode_hamming_words(w, id_bits: int):
    """[.., k] packed words -> (ids, sims) with -1/-inf empty slots."""
    ids = (w & ((1 << id_bits) - 1)).astype(np.int32)
    sims = -(w >> id_bits).astype(np.float32)
    ids[w < 0] = -1
    sims[w < 0] = NEG_INF
    return ids, sims


def certified_finish_hamming(table, sqn, live, qd, block, *, k: int,
                             n_q: int, id_bits: int, rerun_sink=None):
    """Host half of the certified hamming path: fetch the packed
    word+verdict block of an already-dispatched
    :func:`scan_certified_hamming` program, decode, and re-serve any
    uncertified queries through the exact word scan (deferred to
    ``rerun_sink`` when given, like :func:`certified_finish`). Every
    CERT_AUDIT_EVERY-th batch byte-compares against the exact path --
    the integer scores leave no ulp surface, so this audits program
    plumbing (packing, splicing), not arithmetic."""
    block = block() if callable(block) else np.array(block[:n_q])
    words, okh = block[:, :-1], block[:, -1] != 0
    CERT_STATS["batches"] += 1
    CERT_STATS["queries"] += n_q
    audit = (
        CERT_AUDIT_EVERY > 0
        and CERT_STATS["batches"] % CERT_AUDIT_EVERY == 0
    )

    def exact_words(q):
        return np.asarray(scan_topk(
            table, sqn, live, q, k=k, metric="hamming", pack=True,
            pack_bits=id_bits,
        ))

    ids, sims = _decode_hamming_words(words, id_bits)
    deferred_bad = None
    if not okh.all() or audit:
        bad = np.flatnonzero(~okh)
        CERT_STATS["fallback_queries"] += len(bad)
        if audit or len(bad) * 4 > n_q:
            full = exact_words(qd)[:n_q]
            if audit:
                CERT_STATS["audits"] = CERT_STATS.get("audits", 0) + 1
                if not np.array_equal(words[okh], full[okh]):
                    CERT_STATS["audit_mismatches"] = (
                        CERT_STATS.get("audit_mismatches", 0) + 1
                    )
            ids, sims = _decode_hamming_words(full, id_bits)
        elif rerun_sink is not None and len(bad):
            deferred_bad = bad
        elif len(bad):
            b_pad = pad_pow2(len(bad))
            sel = np.zeros(b_pad, np.int32)
            sel[: len(bad)] = bad
            wb = exact_words(jnp.take(qd, jnp.asarray(sel), axis=0))
            ib, sb = _decode_hamming_words(wb[: len(bad)], id_bits)
            ids[bad], sims[bad] = ib, sb
    if deferred_bad is not None:
        rerun_sink.add(
            (table, sqn, live), qd, deferred_bad, ids, sims, k,
            rerun=lambda q, kk: _decode_hamming_words(
                exact_words(q), id_bits
            ),
        )
    return ids, sims


# -- ids-only replies (host exact rescore) ------------------------------------
#
# Transfer ONLY the [B, k] id block and recompute the k sims on the
# host in exact direct form -- the reference's own kernel formulation
# (metrics.rs:79-84) over the f32 rows the host already holds
# (index._vectors). Result ORDER is still decided by the device's
# exact rescore (unchanged); only the sims bytes drop off the wire.
# Hamming already packs one int32 per result because its distance is a
# small integer; this is the euclidean analog.
#
# MEASURED A LOSS on this box and kept opt-in-off: the dev tunnel's
# D2H turns out to be LATENCY-bound, not bandwidth-bound, at reply
# sizes -- halving the [2048, 2k] packed reply saves only ~2.3ms
# (ids-D2H 27.9ms vs full-D2H 30.2ms, measured uncontended) while the
# host gather+rescore+resort costs ~9.3ms at 128d (more at 960d: the
# row gather is 78MB), so ids mode is 0.58x the full reply end-to-end
# (59.2ms vs 34.4ms at B=2048, 10k rows). The mode remains for
# genuinely bandwidth-starved links where reply bytes, not round
# trips, dominate. Opt-in: REDIS_HNSW_TPU_REPLY=ids, honored when the
# caller can supply host-resident queries for free (numpy input, or
# the host_qs mirror serving paths hold anyway).


def reply_ids_only() -> bool:
    v = os.environ.get("REDIS_HNSW_TPU_REPLY", "full")
    if v not in ("full", "ids", "ids-force"):
        raise ValueError(f"REDIS_HNSW_TPU_REPLY={v!r}")
    return v != "full"


# -- ids-reply guard ----------------------------------------------------------
#
# The r3 measurement above showed "halve the reply bytes" can be a
# LOSS (0.58x here) when the link is latency-bound, and at high D the
# host gather+rescore grows with dim while the bytes saved do not: at
# 960d the ids path measured a 100x pathology (73 qps vs 46.8k full,
# BENCH_r03). A knob that can silently cost 100x needs a guard, not a
# doc note: REDIS_HNSW_TPU_REPLY=ids now auto-disables (once-logged)
# when the estimated host-rescore time exceeds the estimated bytes
# saved. Both sides of the estimate are calibrated once per process on
# the live link/host:
#
#   saved   = (n_q * k * 4 bytes of sims dropped) * d2h_sec_per_byte
#   rescore = (n_q * k * dim elements)            * host_sec_per_elem
#
# n_q * k cancels, so the verdict depends only on dim: engage iff
# 4 * d2h_sec_per_byte > dim * host_sec_per_elem. d2h_sec_per_byte is
# the MARGINAL transfer cost (slope between a 64KB and a 4MB D2H --
# fixed per-transfer latency, the thing that fooled the original
# estimate, cancels out). REDIS_HNSW_TPU_REPLY=ids-force skips the
# guard entirely (tests pin the path with it; operators of genuinely
# bandwidth-starved links may too).

_IDS_GUARD: dict = {}  # "cal": (d2h_sec_per_byte, host_sec_per_elem)


def _ids_guard_calibrate() -> tuple[float, float]:
    if "cal" in _IDS_GUARD:
        return _IDS_GUARD["cal"]
    import time

    base_s = jnp.zeros((2048, 8), jnp.int32)    # 64KB reply-sized
    base_b = jnp.zeros((2048, 512), jnp.int32)  # 4MB

    def best_d2h(base) -> float:
        best = float("inf")
        for i in range(1, 4):
            # fresh result each rep: jax.Array caches its first host
            # copy (_npy_value), so re-converting the same array would
            # time a no-op. Same program every i (device scalar).
            a = base + jnp.int32(i)
            np_t0 = time.perf_counter()
            np.asarray(a)
            best = min(best, time.perf_counter() - np_t0)
        return best

    np.asarray(base_s + jnp.int32(0))  # warm compile + first transfer
    np.asarray(base_b + jnp.int32(0))
    spb = max(
        (best_d2h(base_b) - best_d2h(base_s))
        / (base_b.nbytes - base_s.nbytes),
        0.0,
    )
    v = np.random.default_rng(0).standard_normal(
        (1024, 10, 128)
    ).astype(np.float32)
    q = np.zeros((1024, 128), np.float32)
    t0 = time.perf_counter()
    neg_sq_rows(v, q)
    spe = (time.perf_counter() - t0) / v.size
    _IDS_GUARD["cal"] = (spb, spe)
    return _IDS_GUARD["cal"]


def reply_ids_engaged(dim: int) -> bool:
    """Should this reply use ids-only transfer + host rescore? False
    unless REDIS_HNSW_TPU_REPLY opts in; "ids" is guarded by the
    calibrated estimate above, "ids-force" is unconditional."""
    v = os.environ.get("REDIS_HNSW_TPU_REPLY", "full")
    if v not in ("full", "ids", "ids-force"):
        raise ValueError(f"REDIS_HNSW_TPU_REPLY={v!r}")
    if v == "full":
        return False
    if v == "ids-force":
        return True
    verdict = _IDS_GUARD.get(dim)
    if verdict is None:
        spb, spe = _ids_guard_calibrate()
        verdict = 4.0 * spb > dim * spe
        _IDS_GUARD[dim] = verdict
        if not verdict:
            import logging

            logging.getLogger("redis_hnsw_tpu").warning(
                "REDIS_HNSW_TPU_REPLY=ids auto-disabled at dim=%d: "
                "est. host rescore %.1f ns/result-row > est. bytes "
                "saved %.1f ns/result-row on this link (marginal D2H "
                "%.3g s/byte, host rescore %.3g s/elem). Use "
                "REDIS_HNSW_TPU_REPLY=ids-force to override.",
                dim, dim * spe * 1e9, 4.0 * spb * 1e9, spb, spe,
            )
    return verdict


def neg_sq_rows(v, q):
    """-||q - v||^2 for prefetched rows ``v`` [B, k, D] vs ``q``
    [B, D] f32, on the host. torch when available (this box's numpy
    has no tuned BLAS; torch is ~4x faster even for the elementwise
    form), numpy otherwise."""
    try:
        import torch

        d = torch.from_numpy(np.ascontiguousarray(v))
        d = d - torch.from_numpy(q)[:, None, :]
        return -(d * d).sum(-1).numpy()
    except ImportError:  # pragma: no cover - torch is baked in here
        d = v - q[:, None, :]
        return -np.einsum("bkd,bkd->bk", d, d)


def host_exact_sims(vecs_host, qs_host, ids):
    """Exact direct-form sims of ``ids`` [B, k] rows vs ``qs_host``
    [B, D], computed on the host from the f32 row table. Invalid ids
    (< 0) get -inf."""
    q = np.atleast_2d(np.asarray(qs_host, np.float32))
    v = vecs_host[np.clip(ids, 0, len(vecs_host) - 1)]
    sims = neg_sq_rows(v, q)
    return np.where(ids >= 0, sims, NEG_INF).astype(np.float32)


def sort_reply(ids, sims):
    """Re-impose the (-sim, id) reply order host-side. The ids-reply
    mode recomputes sims on the host, whose accumulation order can
    differ from the device's exact rescore by ~1 ulp -- enough to
    leave a near-tied reply non-monotonic if the device's order were
    kept verbatim. -inf (invalid) slots keep trailing."""
    order = np.lexsort((ids, -sims), axis=-1)
    return (
        np.take_along_axis(ids, order, -1),
        np.take_along_axis(sims, order, -1),
    )


# -- host-side engine wrapper -------------------------------------------------

def _scan_state(index, max_staleness: int = 0):
    """Per-epoch device state for the scan engine:
    (table, vecs, sqn, live, metric, tscale) -- ``table`` is the
    selection table (f32 vecs, the bf16/int8 tier copy, or the hamming
    +-1 int8 expansion), ``vecs`` the exact f32 rescore table (None
    for hamming, whose int32 distances are already exact), ``tscale``
    the int8 tier's per-row scales (None otherwise).

    Cached on the index keyed by (SNAPSHOT epoch, scan dtype) -- the
    epoch the underlying tables actually hold, which lags the index's
    mutation epoch under bounded-staleness serving. ``live`` rides up
    once per build (a [N] bool is small); derived tables are built
    device-side from the snapshot (no host round-trip).

    ``max_staleness`` passes through to ``device_snapshot``: with a
    stale snapshot the live mask is truncated at the snapshot's row
    high-water (``live_hw``) so rows allocated after it -- whose
    vectors the stale table does not hold -- can never score.
    """
    snap = index.device_snapshot(max_staleness)
    snap_epoch = index._snapshot_epoch
    dt = scan_dtype()
    cached = getattr(index, "_scan_cache", None)
    if cached is not None and cached[0] == (snap_epoch, dt):
        return cached[1]
    live_np = np.zeros(snap.n_pad, bool)
    h = min(len(index._levels), snap.n_pad, snap.live_hw)
    live_np[:h] = index._levels[:h] >= 0
    live = jnp.asarray(live_np)
    tscale = None
    if snap.metric == "hamming":
        table, vecs = _build_pm1(snap.vecs), None
    elif dt == "bf16":
        table, vecs = _to_bf16(snap.vecs), snap.vecs
    elif dt == "int8":
        (table, tscale), vecs = _to_int8(snap.vecs), snap.vecs
    else:
        table = vecs = snap.vecs
    state = (table, vecs, snap.sqnorms, live, snap.metric, tscale)
    index._scan_cache = ((snap_epoch, dt), state)
    return state


def pipeline_depth() -> int:
    """REDIS_HNSW_TPU_PIPELINE: how many dispatched-but-unfetched
    batches a multi-batch serving loop may keep in flight (0
    serializes every batch -- the pre-r4 behavior). TPU programs
    execute one at a time, so in-flight batches only queue (their
    buffers are a few MB of queries + a [B, ~2k] reply each); what
    pipelining buys is that the ~28ms-per-fetch dispatch+D2H round
    trip of this latency-bound tunnel (CLAUDE.md) overlaps the next
    batches' device compute instead of serializing with it."""
    return max(
        0, int(os.environ.get("REDIS_HNSW_TPU_PIPELINE") or "2")
    )


# Measured default for the cheap-select engines (certified + approx):
# at 1M x 128d x 8 batches the window is worth 1.24x on certified
# (40.8k -> 50.7k qps) and 1.38x on approx (51.9k -> 71.4k), while the
# compute-bound plain-exact scan shows no win (1.0x within noise) --
# artifacts/fetch_window_ab.json. Callers pass 8 where it measured a
# win and 1 elsewhere; the env var always overrides.
FETCH_WINDOW_FAST = 8


def fetch_window(default: int = 1) -> int:
    """REDIS_HNSW_TPU_FETCH_WINDOW: how many batches' replies share
    ONE device->host transfer in a multi-batch serving loop. The
    tunnel's D2H cost is per-TRANSFER, not per-byte (~28ms round trip
    whether the reply is 80KB or 1.3MB -- CLAUDE.md), so a window of W
    batches concatenates their packed replies device-side and fetches
    the blob once, paying ~28ms/W per batch instead of ~28ms. Window 1
    keeps one fetch per batch (the r4 pipelined baseline). When the
    env var is unset the caller's ``default`` applies (engine-aware:
    FETCH_WINDOW_FAST for the measured-win engines)."""
    v = os.environ.get("REDIS_HNSW_TPU_FETCH_WINDOW")
    if not v:
        return max(1, int(default))
    try:
        return max(1, int(v))
    except ValueError:
        return max(1, int(default))


# Ambient FetchGroup stack: drain_pipelined pushes one group per fetch
# window around its dispatch calls; fetch_handle() inside a dispatcher
# registers with the innermost group. Single-batch calls (no drain
# loop) see an empty stack and keep their own immediate fetch.
# Thread-LOCAL: api.py's per-index locks allow concurrent search_batch
# calls on different indexes, and a shared stack would let one thread's
# dispatcher register its reply into another thread's fetch window.
class _ActiveGroups(threading.local):
    def __init__(self) -> None:
        self.stack: list = []


_ACTIVE_GROUPS = _ActiveGroups()


class FetchGroup:
    """Coalesces many device-array fetches into ONE D2H transfer.

    Dispatchers register their (already dispatched) device reply
    arrays with :func:`fetch_handle` at dispatch time; the first
    handle call materializes the group -- every registered array is
    bitcast to a flat uint8 view, concatenated device-side (a few MB
    of copies, trivial next to the scan programs already queued) and
    fetched in one transfer. Each handle then returns a WRITABLE host
    copy of its slice (the certified path splices fallback rows in
    place). One transfer per window is the whole point: on this
    latency-bound link every separate fetch costs a full ~28ms round
    trip regardless of bytes (CLAUDE.md, artifacts/cert_breakdown)."""

    def __init__(self) -> None:
        self._parts: list = []
        self._host: list | None = None

    def add(self, arr):
        if self._host is not None:
            raise RuntimeError("FetchGroup already materialized")
        if np.dtype(arr.dtype) == np.bool_:
            raise TypeError("FetchGroup: bitcast of bool replies")
        i = len(self._parts)
        self._parts.append(arr)

        def get():
            self.materialize()
            return self._host[i]

        return get

    def materialize(self) -> None:
        if self._host is not None:
            return
        if len(self._parts) == 1:
            self._host = [np.array(self._parts[0])]
            return
        flats = []
        for a in self._parts:
            if np.dtype(a.dtype) != np.uint8:
                # always to uint8 (same-width bitcast for int8 too):
                # jnp.concatenate would silently PROMOTE a mixed
                # int8/uint8 list and double every byte offset
                a = jax.lax.bitcast_convert_type(a, jnp.uint8)
            flats.append(a.reshape(-1))
        blob = np.asarray(jnp.concatenate(flats))
        host, off = [], 0
        for a in self._parts:
            nb = a.size * np.dtype(a.dtype).itemsize
            host.append(
                np.array(blob[off : off + nb].view(a.dtype)).reshape(
                    a.shape
                )
            )
            off += nb
        self._host = host


def fetch_handle(arr):
    """Register a dispatched device array for fetching. Inside a
    drain loop's fetch window this joins the window's one coalesced
    transfer (:class:`FetchGroup`); otherwise the returned zero-arg
    getter pays its own (deferred) fetch, preserving the dispatch/
    finish async split. Always returns a WRITABLE numpy array."""
    stack = _ACTIVE_GROUPS.stack
    if stack:
        return stack[-1].add(arr)
    return lambda: np.array(arr)


def drain_pipelined(parts, dispatch, *, sink=None, default_window=1):
    """The pipelined serving loop shared by the single-chip, flat and
    sharded engines: call ``dispatch(*args)`` for each tuple in
    ``parts`` (each returns a zero-arg finish), keep up to
    :func:`pipeline_depth` fetch windows dispatched-but-unfetched,
    finish in order, and flush ``sink`` (deferred certified fallback
    reruns) BEFORE returning -- callers assemble replies only from
    the returned, already-patched parts. Batches are grouped into
    fetch windows of :func:`fetch_window` batches whose replies share
    ONE coalesced D2H transfer (:class:`FetchGroup`); window 1
    reproduces the one-fetch-per-batch loop exactly. Returns
    (id_parts, sim_parts)."""
    from collections import deque

    depth = pipeline_depth()
    window = fetch_window(default_window)
    pending: deque = deque()  # (FetchGroup, [finish, ...]) per window
    id_parts, sim_parts = [], []

    def drain_window():
        group, fins = pending.popleft()
        group.materialize()  # the window's single fetch
        for fin in fins:
            i_p, s_p = fin()
            id_parts.append(i_p)
            sim_parts.append(s_p)

    group, fins = FetchGroup(), []
    for args in parts:
        _ACTIVE_GROUPS.stack.append(group)
        try:
            fins.append(dispatch(*args))
        finally:
            _ACTIVE_GROUPS.stack.pop()
        if len(fins) >= window:
            pending.append((group, fins))
            group, fins = FetchGroup(), []
            while len(pending) > depth:
                drain_window()
    if fins:
        pending.append((group, fins))
    while pending:
        drain_window()
    if sink is not None:
        sink.flush()  # patches id_parts/sim_parts rows in place
    return id_parts, sim_parts


def scan_dispatch(index, qs, k: int, approx: bool = False, host_qs=None,
                  cert_sink=None, staleness: int = 0):
    """Enqueue one scan batch; returns a zero-arg ``finish()`` that
    yields the (ids, sims) numpy reply. All device work is dispatched
    (asynchronously) before this returns; ``finish()`` pays the single
    device->host fetch plus any host-side rescore / certified
    fallback. A serving loop over many batches dispatches ahead and
    finishes in order (ops/search.py), hiding each batch's fetch
    round trip behind the following batches' compute. ``cert_sink``
    (a :class:`CertRerunSink` the caller later flushes) coalesces the
    certified path's fallback reruns across the loop.

    ``approx=True`` swaps the per-chunk exact top_k for oversampled
    jax.lax.approx_max_k (measured ~0.999 recall, several-fold faster
    at big N); reported sims stay exact either way.

    With REDIS_HNSW_TPU_REPLY=ids and host-resident queries available
    (numpy ``qs``, or a ``host_qs`` mirror from the caller), euclidean
    replies transfer only the [B, k] id block and sims are recomputed
    host-side in exact direct form (see reply_ids_only above).

    ``staleness`` > 0 serves from the bounded-stale snapshot view
    (see models/hnsw.py device_snapshot): the query never waits on a
    pending dirty-row delta."""
    table, vecs, sqn, live, metric, tscale = _scan_state(
        index, max_staleness=staleness
    )
    if host_qs is None and not isinstance(qs, jax.Array):
        host_qs = qs
    ids_mode = (
        metric == "euclidean" and host_qs is not None
        and reply_ids_engaged(int(qs.shape[1]))
    )
    n_q = qs.shape[0]
    b_pad = pad_pow2(n_q)
    qd = qs if isinstance(qs, jax.Array) else jnp.asarray(qs)
    if b_pad != n_q:
        qd = jnp.concatenate(
            [qd, jnp.zeros((b_pad - n_q, qd.shape[1]), qd.dtype)], axis=0
        )
    k_eff = min(int(k), int(table.shape[0]))
    if metric == "hamming":
        d_bits = int(table.shape[1])
        id_bits = max(int(table.shape[0] - 1).bit_length(), 1)
        if d_bits.bit_length() + id_bits <= 31:
            if not approx and cert_enabled(
                # dim gate at d_bits/2: the count pass re-pays an int8
                # matmul, which runs ~2x the f32 rate the euclidean
                # CERT_MAX_DIM break-even was measured at
                int(table.shape[0]), d_bits // 2
            ):
                # certified-exact hamming: deep certificate over the
                # oversampled selection (see scan_certified_hamming)
                block = scan_certified_hamming(
                    table, sqn, live, qd, k=k_eff, id_bits=id_bits
                )
                get_block = fetch_handle(block[:n_q])

                def finish_hamming_cert():
                    return certified_finish_hamming(
                        table, sqn, live, qd, get_block, k=k_eff,
                        n_q=n_q, id_bits=id_bits, rerun_sink=cert_sink,
                    )

                return finish_hamming_cert
            # one-int32-per-result reply: (dist << id_bits) | id. The
            # reply transfer is half the generic [B, 2k] form -- on
            # high-latency links the reply D2H is a third of the whole
            # search wall (measured 53ms of 109ms at B=2048, k=10).
            word = scan_topk(
                table, sqn, live, qd, k=k_eff, metric="hamming",
                pack=True, pack_bits=id_bits, approx=approx,
            )
            get_word = fetch_handle(word[:n_q])

            def finish_word():
                w = get_word()
                ids = (w & ((1 << id_bits) - 1)).astype(np.int32)
                sims = -(w >> id_bits).astype(np.float32)
                ids[w < 0] = -1
                sims[w < 0] = NEG_INF
                return ids, sims

            return finish_word
        packed = scan_topk(
            table, sqn, live, qd, k=k_eff, metric="hamming", pack=True,
            approx=approx,
        )
    elif (
        not approx and tscale is None and table is vecs
        and cert_enabled(int(vecs.shape[0]), int(vecs.shape[1]))
    ):
        # certified-exact: approx select + counting certificate + exact
        # fallback for uncertified queries -- byte-identical results,
        # several-fold cheaper select at capacity scale (see above)
        block = scan_certified_l2(
            vecs, sqn, live, qd, k=k_eff, ids_only=ids_mode
        )
        get_block = fetch_handle(block[:n_q])

        def finish_cert():
            out = certified_finish(
                vecs, sqn, live, qd, get_block, k=k_eff, n_q=n_q,
                ids_only=ids_mode, rerun_sink=cert_sink,
            )
            if ids_mode:
                return sort_reply(
                    out, host_exact_sims(index._vectors, host_qs, out)
                )
            return out

        return finish_cert
    else:
        packed = scan_topk_exact_l2(
            vecs, sqn, live, qd, k=k_eff, pack=True, approx=approx,
            table=None if table is vecs else table, tscale=tscale,
        )

    get_packed = fetch_handle(
        packed[:n_q, :k_eff] if ids_mode else packed[:n_q]
    )

    def finish_packed():
        if ids_mode:
            ids = get_packed()
            return sort_reply(
                ids, host_exact_sims(index._vectors, host_qs, ids)
            )
        p = get_packed()
        ids = p[:, :k_eff]
        sims = np.ascontiguousarray(p[:, k_eff:]).view(np.float32)
        return ids, sims

    return finish_packed


def scan_batch(index, qs, k: int, approx: bool = False, host_qs=None):
    """Batched k-NN via the scan engine; same (ids, sims) numpy
    contract as ops/search._run_search. One dispatch + one fetch --
    see :func:`scan_dispatch` for the pipelined multi-batch form."""
    return scan_dispatch(index, qs, k, approx=approx, host_qs=host_qs)()
