"""One-pass fused select+certify kernel for the certified scan.

The certified-exact path (ops/scan.py) historically ran TWO full passes
over the row table: an oversampled ``approx_max_k`` selection (~60ms at
1M x 128d, B=2048 on the v5e -- the [B, chunk] score tile round-trips
HBM between the dot and the select) and the counting certificate
(~30ms with the fused pallas_count kernel). This kernel collapses both
into ONE pass by restructuring the certificate itself:

Partition the table's rows into fixed bins of ``BIN_L`` consecutive
rows. Per grid step the kernel computes one [B, TILE_N] score panel in
VMEM (single MXU dot + broadcast adds -- identical formulation to
``ops/scan._chunk_scores``) and emits, per bin,

* ``max1``  -- the bin's best score,
* ``id1``   -- its row id (lowest row id on ties),

and accumulates per query

* ``m2`` -- the max over ALL bins of the bin's SECOND-best score.

The candidate set C (one entry per bin) plus the scalar ``m2`` replace
the counting pass entirely: let S = the stable (-sim, id) top-k over C
and t = S's k-th score. Every row not in C is bounded by its own bin's
second-best, hence by ``m2``. Therefore when

    m2 < t                                             (the certificate)

every row scoring >= t is in C (a non-C row x has score <= m2 < t), so
the stable top-k over C IS the stable top-k over the whole table --
including the complete tie class at t, and with the same lowest-id tie
resolution (bins are ascending row ranges; ``jax.lax.top_k`` prefers
lower indices on ties). Queries with m2 >= t (two true-top-k rows in
one bin, or a tie at the boundary -- measured rare, the same ~1%%
regime as the approx tier's recall floor) fall back to the exact path
through the existing machinery (ops/scan.certified_finish), so served
results stay byte-identical to the exact scan on EVERY query.

Within-bin ties at max1 cannot corrupt a certified result: if the tied
score >= t then max2 == max1 >= t and the query is uncertified by
construction; ties below t never enter the top-k.

Soundness of the scores themselves has the same epistemic status as
pallas_count (see that module's docstring): the kernel's dot runs the
same single-K-tile f32 accumulation as the XLA scan's at D <= 128-pad,
``benchmarks/cert_kernel_check.py`` pins bitwise equality on the live
backend, tests/test_pallas.py pins interpret-mode semantics, and the
every-256th-batch exact audit in ops/scan.py converts any residual
drift into a counted, repaired signal.

Reference frame: this is the rebuild's answer to the reference's
hand-tuned AVX2 hot kernel (src/hnsw/metrics.rs:48-77) -- the one pass
over the data that the whole serving rate hangs off -- except here the
pass also PROVES its result exact.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

# Rows per grid step. The bin epilogue materializes several
# [B_TILE, TILE_N] intermediates (scores, iota, tie masks), so the
# query axis is blocked and the kernel raises the scoped-VMEM limit
# (default 16MB; the v5e has 128MB): B=2048 with a one-dot panel
# measured 33.6MB of scoped demand -- compile-OOM at the default
# limit. Per-step cost is OVERHEAD-dominated at small tiles (65us/step
# measured at bt=1024/TILE_N=1024 vs ~6us of roofline compute), so the
# product bt*TILE_N should be as large as the scoped budget admits.
TILE_N = int(os.environ.get("REDIS_HNSW_TPU_SELECT_TILEN", "1024"))
# Output-block grouping. One grid step produces J_BINS = 8 bin values
# per query, but Mosaic requires output block minor dims 128-divisible
# (or full width): a [B_TILE, 8] store is neither, and the first cut's
# workaround -- transposed [8, B_TILE] blocks -- measured 133-145ms at
# 1M x 128d (10x the arithmetic cost: a per-step relayout + 8-lane
# store). Instead each [B_TILE, 128] output block stays RESIDENT
# across GROUP = 16 consecutive row steps (index_map j -> j // GROUP)
# and each step rolls its 8 fresh bins in with a static 8-lane shift;
# after 16 shifts the block is fully displaced in ascending-bin order
# and Mosaic flushes it on the block-index change. (A fully-unrolled
# 16-dot variant writing the 128-bin block in one step was tried
# first: the unrolled intermediates' liveness blew the scoped-VMEM
# budget at any useful B_TILE.)
GROUP = max(1, 2048 // TILE_N) * int(
    os.environ.get("REDIS_HNSW_TPU_SELECT_GROUP", "8")
)
PANEL = GROUP * TILE_N
B_TILE = int(os.environ.get("REDIS_HNSW_TPU_SELECT_BTILE", "1024"))
_VMEM_LIMIT = 100 * 1024 * 1024
# Rows per certificate bin. 128 keeps the in-kernel reshape
# [B, TILE_N] -> [B, TILE_N//BIN_L, BIN_L] lane-aligned (the minor dim
# stays a 128-lane multiple) and makes the candidate set N/128 wide --
# 8192 candidates per query at 1M rows, whose exact top-k costs ~64x
# less than the full table's.
BIN_L = 128
J_BINS = TILE_N // BIN_L

try:  # pallas import kept lazy-tolerant like ops/pallas_count.py
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _bin_reduce(scores):
    """[B, TILE_N] score tile -> per-bin (max1, idx-in-bin, max2).

    ``idx`` is the lowest in-bin column among ties (= lowest row id;
    rows ascend within a bin); ``max2`` is the bin max with the argmax
    ELEMENT removed (a duplicate of max1 elsewhere in the bin still
    counts -- it is a distinct row at the same score)."""
    b = scores.shape[0]
    s3 = scores.reshape(b, J_BINS, BIN_L)
    max1 = jnp.max(s3, axis=2)                    # [B, J]
    col = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 2)
    idx = jnp.min(
        jnp.where(s3 == max1[:, :, None], col, BIN_L), axis=2
    )                                             # [B, J]
    masked = jnp.where(col == idx[:, :, None], -jnp.inf, s3)
    max2 = jnp.max(masked, axis=2)                # [B, J]
    return max1, idx, max2


def _select_kernel(q_ref, x_ref, sq_ref, qq_ref,
                   sims_ref, ids_ref, m2_ref):
    # Grid = (query blocks, row steps), row steps INNERMOST so the m2
    # accumulator block and the 128-bin rolling output blocks stay
    # VMEM-resident across one query block's whole sweep. Each step
    # rolls its J_BINS fresh bin values into the resident output block
    # with a static 8-lane shift (see the GROUP comment above); the
    # block's pre-roll content is fully displaced by the time its
    # index advances, so no initialization is needed.
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m2_ref[...] = jnp.full_like(m2_ref, -jnp.inf)

    dots = jax.lax.dot_general(
        q_ref[...], x_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                             # [B, TILE_N]
    scores = 2.0 * dots - qq_ref[...] - sq_ref[...]
    max1, idx, max2 = _bin_reduce(scores)
    base = j * TILE_N + jax.lax.broadcasted_iota(
        jnp.int32, (1, J_BINS), 1
    ) * BIN_L
    sims_ref[...] = jnp.concatenate(
        [sims_ref[:, J_BINS:], max1], axis=1
    )
    ids_ref[...] = jnp.concatenate(
        [ids_ref[:, J_BINS:], base + idx], axis=1
    )
    m2_ref[...] = jnp.maximum(
        m2_ref[...], jnp.max(max2, axis=1)[:, None]
    )


@partial(jax.jit, static_argnames=("interpret",))
def select_bins(vecs, sq_masked, q, qq, *, interpret: bool = False):
    """Per-bin best (score, row id) + the global second-best bound.

    ``vecs`` [N, D] f32 row table; ``sq_masked`` [N] f32 row sqnorms
    with +inf on dead rows (their score is exactly -inf, the same
    dead-row encoding as pallas_count); ``q`` [B, D] f32 queries;
    ``qq`` [B] query sqnorms. Returns ``(sims [B, N'/BIN_L] f32,
    ids [B, N'/BIN_L] int32, m2 [B] f32)`` where N' is N padded to the
    panel width with dead rows (padding bins surface as -inf / some
    dead id; they can never certify or rank)."""
    B, D = q.shape
    N = vecs.shape[0]
    pad = -N % PANEL
    if pad:
        vecs = jnp.pad(vecs, ((0, pad), (0, 0)))
        sq_masked = jnp.pad(
            sq_masked, (0, pad), constant_values=jnp.inf
        )
        N += pad
    bt = min(B_TILE, B)
    grid = (B // bt, N // TILE_N)
    nbins = N // BIN_L
    bins_blk = PANEL // BIN_L                     # 128-bin out blocks
    sims, ids, m2 = pl.pallas_call(
        _select_kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            # query blocks write disjoint output slabs; row steps are
            # sequential (m2 + the rolling bin blocks accumulate)
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        in_specs=[
            pl.BlockSpec((bt, D), lambda bq, j: (bq, 0)),      # q
            pl.BlockSpec((TILE_N, D), lambda bq, j: (j, 0)),   # rows
            pl.BlockSpec((1, TILE_N), lambda bq, j: (0, j)),   # sq
            pl.BlockSpec((bt, 1), lambda bq, j: (bq, 0)),      # qq
        ],
        out_specs=(
            pl.BlockSpec(
                (bt, bins_blk), lambda bq, j: (bq, j // GROUP)
            ),
            pl.BlockSpec(
                (bt, bins_blk), lambda bq, j: (bq, j // GROUP)
            ),
            pl.BlockSpec((bt, 1), lambda bq, j: (bq, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nbins), jnp.float32),
            jax.ShapeDtypeStruct((B, nbins), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ),
        interpret=interpret,
    )(
        q,
        vecs,
        sq_masked.reshape(1, N),
        qq.reshape(B, 1),
    )
    return sims, ids, m2[:, 0]


def select_bins_ref(vecs, sq_masked, q, qq):
    """Pure-XLA reference of :func:`select_bins` (tests pin the kernel
    against this bitwise, mirroring pallas_count's equality tests)."""
    N = vecs.shape[0]
    pad = -N % PANEL
    if pad:
        vecs = jnp.pad(vecs, ((0, pad), (0, 0)))
        sq_masked = jnp.pad(
            sq_masked, (0, pad), constant_values=jnp.inf
        )
        N += pad
    dots = jax.lax.dot_general(
        q, vecs,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = 2.0 * dots - qq[:, None] - sq_masked[None, :]
    B = q.shape[0]
    s3 = scores.reshape(B, N // BIN_L, BIN_L)
    max1 = jnp.max(s3, axis=2)
    col = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 2)
    idx = jnp.min(
        jnp.where(s3 == max1[:, :, None], col, BIN_L), axis=2
    )
    masked = jnp.where(col == idx[:, :, None], -jnp.inf, s3)
    m2 = jnp.max(jnp.max(masked, axis=2), axis=1)
    base = jnp.arange(N // BIN_L, dtype=jnp.int32)[None, :] * BIN_L
    return max1, base + idx, m2


def onepass_interpret() -> bool:
    """Interpret-mode pallas off the TPU backend (CPU tests force the
    one-pass path with REDIS_HNSW_TPU_CERT_ONEPASS=1)."""
    return jax.default_backend() != "tpu"


def onepass_enabled() -> bool:
    """Trace-time gate for the one-pass certified select.

    REDIS_HNSW_TPU_CERT_ONEPASS=0 keeps the two-pass form (approx
    select + count certificate), =1 forces the one-pass kernel
    (interpret mode off-TPU, for tests). Default auto = OFF: the
    kernel is bitwise-correct but measured SLOWER than the two-pass
    form it replaces (145ms vs ~103ms e2e at 1M x 128d B=2048 on the
    v5e, artifacts/cert_kernel_check.json r5 line) -- per-grid-step
    overhead dominates at the VMEM-safe tile sizes (65us/step vs ~6us
    roofline). It stays as an opt-in experiment until a geometry
    beats the two-pass numbers."""
    v = os.environ.get("REDIS_HNSW_TPU_CERT_ONEPASS", "auto")
    if v == "0" or not _HAVE_PALLAS:
        return False
    if v == "1":
        return True
    if v == "auto":
        return False
    raise ValueError(f"REDIS_HNSW_TPU_CERT_ONEPASS={v!r}")
