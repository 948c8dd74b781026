"""Batched HNSW search on TPU -- the query hot path.

TPU-native redesign of the reference's one-query-at-a-time search
(zhao-lang/redis_hnsw src/hnsw/core.rs:607-675 ``search_level``,
:865-892 ``search_knn_internal``). Instead of a pointer-chasing loop with
heaps and a HashSet, a whole batch of queries traverses the dense adjacency
snapshot together:

* **Greedy descent** (reference ef=1 descent, core.rs:869-874) becomes a
  vectorized hill-climb: per step, gather every lane's upper-layer neighbor
  row, score the [B, deg] tile, move lanes that improved, mask lanes that
  converged.
* **Layer-0 beam** (reference ef-wide search_level) becomes a fixed-shape
  frontier loop: each lane keeps a top-ef beam (ids, sims, expanded
  flags); per step the top-``expand`` unexpanded candidates of every lane
  are expanded at once -- one [B, expand*deg0] neighbor gather + one
  distance tile + a sort-based merge (no visited state and no scatters;
  see ``beam_search`` for the equivalence argument and measurements).

Equivalences to the reference worth noting:
* accept-if ``sim > worst or |W| < ef`` (core.rs:657) == top-ef merge with
  -inf padding; ties break toward incumbents in both.
* candidates evicted from W are never expanded in the reference either
  (pop-best < worst-of-W implies the break fires first), except exact-tie
  corner cases, so the single sorted beam is faithful.
* ef defaults to ef_construction (core.rs:485); ``ef_search`` is exposed
  as a TPU-side extension knob.

Reported similarities for the final k are rescored in direct -(q-x)^2 form
so they match the reference kernel to f32 rounding (the matmul form used
inside the loop loses ~1e-3 to cancellation, fine for ordering).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import distance as D

NEG_INF = jnp.float32(-jnp.inf)


def _score(metric, q, qn, vecs, vn, ids, mask):
    if metric == "hamming":
        return D.frontier_hamming(q, vecs, ids, mask)
    return D.frontier_neg_sq_l2(q, qn, vecs, vn, ids, mask)


def _query_sqnorms(metric, q):
    if metric == "hamming":
        # zeros_like-of-a-tracer, NOT np/jnp.zeros: downstream code
        # indexes qn with traced ids, and a trace-time jnp.zeros would
        # be a concrete device array whose lowering fetch can deadlock
        # the tunnel (see ops/construct.py layer scan comment)
        return jnp.zeros_like(q[:, 0], dtype=jnp.float32)
    return jnp.sum(q * q, axis=-1)


def _point_sims(metric, q, qn, vecs, vn, ids):
    mask = np.ones((ids.shape[0], 1), bool)
    return _score(metric, q, qn, vecs, vn, ids[:, None], mask)[:, 0]


# ---------------------------------------------------------------------------
# Greedy descent over upper layers (vectorized core.rs:869-874).
# ---------------------------------------------------------------------------

def hill_climb_layer(
    metric, q, qn, vecs, vn, adj_l, upper_of, ids, sims, active=None
):
    """ef=1 greedy step loop at one upper layer (core.rs:511-520 descent).

    Per iteration every live lane gathers its current node's neighbor row,
    scores the [B, degU] tile, and moves if the best neighbor improves.
    ``active=None`` means all lanes; with a mask, inactive lanes pass
    through unchanged (used by batched construction where lanes stop
    descending at their sampled level).
    """
    # note: the initial mask derives from traced inputs (not a constant)
    # so its "varying manual axes" match the body outputs under shard_map
    # (see parallel/sharded.py).
    live0 = (ids == ids) if active is None else active

    def cond(c):
        return jnp.any(c[2])

    def body(c):
        ids, sims, live = c
        u = upper_of[ids]
        nbrs = adj_l[jnp.maximum(u, 0)]                  # [B, degU]
        valid = (nbrs >= 0) & (u >= 0)[:, None] & live[:, None]
        nb_safe = jnp.maximum(nbrs, 0)
        nsims = _score(metric, q, qn, vecs, vn, nb_safe, valid)
        j = jnp.argmax(nsims, axis=1)
        bsim = jnp.take_along_axis(nsims, j[:, None], 1)[:, 0]
        bid = jnp.take_along_axis(nb_safe, j[:, None], 1)[:, 0]
        improved = bsim > sims
        return (
            jnp.where(improved, bid, ids),
            jnp.where(improved, bsim, sims),
            live & improved,
        )

    ids, sims, _ = jax.lax.while_loop(cond, body, (ids, sims, live0))
    return ids, sims


def greedy_descent(metric, q, qn, vecs, vn, adj_up, upper_of, ep, max_layer):
    B = q.shape[0]
    ids = jnp.full((B,), ep, jnp.int32)
    sims = _point_sims(metric, q, qn, vecs, vn, ids)

    def layer_body(i, carry):
        ids, sims = carry
        # layer l = max_layer - i, stored at adj_up[l - 1]
        adj_l = jax.lax.dynamic_index_in_dim(
            adj_up, max_layer - 1 - i, axis=0, keepdims=False
        )
        return hill_climb_layer(
            metric, q, qn, vecs, vn, adj_l, upper_of, ids, sims
        )

    return jax.lax.fori_loop(0, max_layer, layer_body, (ids, sims))


def _use_pallas_gather(batch: int) -> bool:
    """Trace-time switch for the fused DMA gather+score kernel.

    OPT-IN (REDIS_HNSW_TPU_PALLAS_GATHER=1), TPU backend only. The
    kernel beats the XLA blocked path 1.3x when benchmarked in
    isolation (3.04 vs 3.95 ms/op at the 1M shapes -- see
    ops/pallas_gather.py) but measures a wash end-to-end (4379 vs 4353
    qps at the 1M operating point): inside the fused search program XLA
    already overlaps the block gather with the step's sort/merge work,
    so shaving the op in isolation buys nothing. Kept as a measured
    result + a base for future step-level fusion (gather+score+merge in
    one kernel would dodge the overlap argument)."""
    import os

    from .pallas_gather import TILE_B

    return (
        os.environ.get("REDIS_HNSW_TPU_PALLAS_GATHER") == "1"
        and jax.default_backend() == "tpu"
        and batch % TILE_B == 0
    )


# Extra beam slots carried in lazy-dedup mode (see beam_search): room
# for one step's dup-marked dead entries to sit in the beam window
# without displacing live tail entries.
LAZY_SLACK = 64


def _lazy_dedup() -> bool:
    """Opt-in: measured on the v5e at 131k rows / B=2048 / expand=16 it
    is +10% at ef=256 (11.1k vs 10.0k qps) and a wash at ef=512 (7.0k
    vs 7.1k) with identical recall -- the wider merge window eats the
    dropped sort's saving as ef grows. At the 1M operating point it is
    a wash-to-LOSS (ef=256: 6.3k vs 7.0k; ef=384: 6.2k vs 6.4k;
    ef=512: 4.7k vs 4.6k): the bigger frontier tiles there amortize the
    sorts and the wider window costs more than the dropped sort saves.
    Stays opt-in; parity mode (expand=1) always runs eager
    regardless."""
    import os

    return os.environ.get("REDIS_HNSW_TPU_LAZY_DEDUP", "0") != "0"


# ---------------------------------------------------------------------------
# Fixed-shape beam search over one adjacency table (vectorized search_level).
# ---------------------------------------------------------------------------

def beam_search(
    metric, q, qn, vecs, vn, adj, ep_ids, ep_sims, ef: int,
    row_map=None, active=None, expand: int = 1, iters: int | None = None,
    nbrvec=None, nbrsqn=None, qrows=None, seed_ids=None, seed_sims=None,
):
    """Run the ef-wide beam for every lane; returns sorted (ids, sims).

    ``adj`` is any [R, F] adjacency table (layer 0 for queries; upper
    layers reuse this for batched construction, with ``row_map`` mapping
    global row ids to the compact upper-layer row space, -1 = absent).
    Lanes where ``active`` is False return their entrypoint untouched.
    Beams are sorted descending by sim; -inf/-1 marks empty slots.

    ``expand`` is the TPU-native departure from the reference's strictly
    sequential pop-best loop (core.rs:630-668): the top-``expand``
    unexpanded candidates are expanded *per step*, cutting the sequential
    step count ~expand-fold and widening every gather/score tile to
    [B, expand*F] (bigger work per step, fewer steps). expand=1
    reproduces the reference expansion order exactly.

    ``iters`` caps the step count (default: generous, parity-safe). The
    batch runs at the pace of its slowest lane, and a handful of
    pathological lanes can otherwise drag hundreds of steps; converged
    lanes self-stabilize (their candidate picks are -inf, their frontier
    masks out), so the cap only truncates stragglers' tails.

    **TPU shape of the step (measured on a v5e, B=1024):** every
    per-element scatter or unfused gather is catastrophic on TPU
    (scatter of [B,E] flags: 1.3ms; take_along_axis on [B,768]: up to
    9ms) while stable variadic sorts are ~20us. So the step does:
    candidate pick and merge as two-operand ``lax.sort``s over (sim,
    packed id|flag) -- no gathers, no scatters -- with dedup as an
    equal-adjacent mask over the fully sorted merge window (re-proposed
    copies carry bit-identical sims, so the (-sim, pid) sort lands them
    next to their incumbent, which sorts first and survives; see the
    packed-state comment in the function body).

    **No visited set.** The reference's per-query HashSet (core.rs:614)
    is redundant: the beam's worst similarity is monotonically
    non-decreasing, so a rejected/evicted node can never re-enter, and
    re-proposals of current members die in the dedup -- every node is
    expanded at most once, like the reference. Off-beam nodes may be
    re-*scored*; that is pure dataflow and costs ~nothing next to a
    [B, N] visited map (5.1ms scatter per step + forced query chunking).
    Corner case: an exact sim tie between distinct nodes can interleave
    the sorted copies so one survives a step; it wastes a beam slot and
    never corrupts results.
    """
    B = q.shape[0]
    F = adj.shape[1]
    E = max(1, min(expand, ef))
    if iters is None:
        iters = 4 * ((ef + E - 1) // E) + 16
    # Lazy dedup (opt-out REDIS_HNSW_TPU_LAZY_DEDUP=0): instead of a
    # second full-width sort pushing dup-marked entries out every step,
    # carry the beam ``LAZY_SLACK`` slots wider and leave dead slots in
    # place -- each step's merge sort re-compacts them to the tail
    # (key=+inf sorts last). Saves one of the two widest sorts per step
    # for one slightly wider merge; a single cleanup sort runs after
    # the loop. Dead slots can transiently displace entries past the
    # window tail, so results are not bit-identical to the eager beam
    # (measured recall-identical at bench settings, but the k-th result
    # can differ on tie-heavy queries); parity mode (expand=1, the
    # reference's expansion order) therefore always runs eager.
    lazy = E > 1 and _lazy_dedup()
    wb = ef + (min(LAZY_SLACK, E * F) if lazy else 0)
    slots = np.arange(wb, dtype=np.int32)
    quant_blocks = nbrvec is not None and nbrvec.dtype == jnp.int8
    if qrows is not None or quant_blocks:
        q8, qs8 = D.quantize_query(q)  # once per call, reused every step

    # Beam state is TWO sort operands: sims [B, ef] f32 and a PACKED
    # int32 ``pid = id << 1 | unexpanded_bit``. Sort cost scales with
    # operand count (measured [2048, 1024] merge on the v5e: 3 operands
    # 3.36ms, 2 operands 2.55ms), and packing the expanded flag into the
    # id's low bit both drops the third operand and replaces the whole
    # flag-marking machinery: within a (sim, id) tie class an
    # expanded-marked copy (low bit 0) sorts FIRST and survives the
    # adjacent-equal dedup, so marking = injecting E flagged copies into
    # the merge window. -1 sentinels are fixed points of the encoding
    # ((-1 << 1) | 1 == -1, and -1 >> 1 == -1 arithmetically).
    #
    # All initial carries derive from traced inputs (never bare
    # constants) so their "varying manual axes" match the loop body
    # outputs under shard_map (see parallel/sharded.py).
    no_b = ep_ids != ep_ids  # all-False [B], varying with inputs
    if active is None:
        unexp0 = jnp.ones_like(ep_ids)
    else:
        # inactive lanes: entrypoint pre-expanded -> inert for the loop
        unexp0 = active.astype(jnp.int32)
    if seed_ids is not None:
        # Entrypoint diversity (a pure extension; the reference starts
        # every layer-0 beam from the single descent entrypoint,
        # core.rs:876): seed the beam with extra unexpanded entries so
        # lanes explore several basins. Seeds duplicating the descent
        # entrypoint are dropped here (a same-id copy with a
        # differently-computed sim could otherwise survive the
        # adjacent-equal dedup and duplicate an id in the reply);
        # seeds are distinct among themselves by construction
        # (_pivot_pool rows are unique, scan top-k picks are unique).
        S = seed_ids.shape[1]
        ok = (seed_ids >= 0) & (seed_ids != ep_ids[:, None])
        s_pid = jnp.where(ok, (seed_ids << 1) | 1, -1).astype(jnp.int32)
        s_sims = jnp.where(ok, seed_sims, NEG_INF)
        head_pid = jnp.concatenate(
            [
                ((ep_ids[:, None] << 1) | unexp0[:, None]).astype(
                    jnp.int32
                ),
                s_pid,
            ],
            axis=1,
        )
        head_sims = jnp.concatenate([ep_sims[:, None], s_sims], axis=1)
        pad = wb - (S + 1)
        beam_pid = jnp.concatenate(
            [head_pid, np.full((B, pad), -1, np.int32)], axis=1
        )
        beam_sims = jnp.concatenate(
            [head_sims, np.full((B, pad), NEG_INF, np.float32)], axis=1
        )
    else:
        beam_pid = jnp.where(
            slots[None, :] == 0,
            (ep_ids[:, None] << 1) | unexp0[:, None],
            -1,
        ).astype(jnp.int32)
        beam_sims = jnp.where(
            slots[None, :] == 0, ep_sims[:, None], NEG_INF
        )
    step0 = jnp.sum(no_b).astype(jnp.int32)  # traced zero

    def cond(c):
        step, beam_pid, beam_sims = c
        frontier_open = jnp.any(
            ((beam_pid & 1) == 1) & (beam_sims != NEG_INF)
        )
        return (step < iters) & frontier_open

    def body(c):
        step, beam_pid, beam_sims = c
        # Top-E unexpanded candidates per lane (c.pop() of core.rs:631),
        # picked with one variadic sort: key = -sim, +inf when expanded
        # (empty slots carry sim=-inf, so their key is +inf already).
        pick_key = jnp.where((beam_pid & 1) == 1, -beam_sims, jnp.inf)
        k_sorted, pid_sorted = jax.lax.sort(
            (pick_key, beam_pid), dimension=1, is_stable=True, num_keys=2
        )
        picked = k_sorted[:, :E] != jnp.inf
        cids = jnp.where(picked, pid_sorted[:, :E] >> 1, -1)

        crow = cids if row_map is None else row_map[jnp.maximum(cids, 0)]
        crow = jnp.where(cids >= 0, crow, -1)
        nbrs = adj[jnp.maximum(crow, 0)]               # [B, E, F]
        nbrs = jnp.where((crow >= 0)[:, :, None], nbrs, -1)
        nbrs = nbrs.reshape(B, E * F)
        fresh = nbrs >= 0
        if nbrvec is not None:
            # Blocked frontier scoring: [B, E] contiguous block gathers
            # instead of [B, E*F] row gathers (per-row issue cost
            # dominates TPU gathers -- ops/distance.py block_neg_sq_l2).
            csafe = jnp.maximum(crow, 0)
            if metric == "hamming":
                nsims = D.block_hamming(q, nbrvec, csafe, fresh)
            elif quant_blocks:
                nsims = D.block_int8_neg_sq_l2(
                    q8, qs8, qn, nbrvec, nbrsqn, csafe, fresh
                )
            elif _use_pallas_gather(B):
                from .pallas_gather import fused_block_score

                nsims = jnp.where(
                    fresh,
                    fused_block_score(q, qn, nbrvec, csafe),
                    NEG_INF,
                )
            else:
                nsims = D.block_neg_sq_l2(
                    q, qn, nbrvec, nbrsqn, csafe, fresh
                )
        elif qrows is not None:
            # Quantized row gathers for the byte-bound high-D regime
            # (ops/distance.py frontier_int8_neg_sq_l2): 4x fewer HBM
            # bytes per frontier; final k rescored exactly downstream.
            nsims = D.frontier_int8_neg_sq_l2(
                q8, qs8, qn, qrows, jnp.maximum(nbrs, 0), fresh
            )
        else:
            nb_safe = jnp.maximum(nbrs, 0)
            nsims = _score(metric, q, qn, vecs, vn, nb_safe, fresh)

        # Merge beam U frontier U expanded-marked copies of the picked
        # entries: one stable sort on the compound key (-sim, pid),
        # equal-adjacent dedup on id = pid >> 1, then a second sort
        # pushes the dups out and the slice truncates to ef. The id must
        # participate in the key: with sim-only keys two copies of node
        # X can straddle a sim-tied node Y and both survive the
        # adjacent-equal dedup -- vanishingly rare for f32 euclidean
        # sims, pervasive for integer hamming sims (measured recall@10
        # 0.54 from duplicated replies). A picked entry's flagged copy
        # (unexp bit 0) sorts first within its (sim, id) class, so the
        # dedup atomically flips that beam entry to expanded; fresh
        # re-proposals (bit 1) die against either incumbent form.
        frontier_pid = (nbrs << 1) | 1          # -1 stays -1
        copy_pid = jnp.where(picked, cids << 1, -2)  # -2 >> 1 == -1
        copy_key = jnp.where(picked, k_sorted[:, :E], jnp.inf)
        all_key = jnp.concatenate([-beam_sims, -nsims, copy_key], axis=1)
        all_pid = jnp.concatenate(
            [beam_pid, frontier_pid, copy_pid], axis=1
        )
        k1, p1 = jax.lax.sort(
            (all_key, all_pid), dimension=1, is_stable=True, num_keys=2
        )
        ids1 = p1 >> 1
        dup = jnp.concatenate(
            [
                np.zeros((B, 1), bool),
                (ids1[:, 1:] == ids1[:, :-1]) & (ids1[:, 1:] >= 0),
            ],
            axis=1,
        )
        k1 = jnp.where(dup, jnp.inf, k1)
        p1 = jnp.where(dup, -1, p1)
        if lazy:
            # dead slots stay in place; next step's merge sort pushes
            # them past the live entries again
            return (step + 1, p1[:, :wb], -k1[:, :wb])
        k2, p2 = jax.lax.sort(
            (k1, p1), dimension=1, is_stable=True, num_keys=1
        )
        return (
            step + 1,
            p2[:, :wb],
            -k2[:, :wb],
        )

    _, beam_pid, beam_sims = jax.lax.while_loop(
        cond, body, (step0, beam_pid, beam_sims)
    )
    if lazy:
        # one cleanup sort compacts the dead slots out before slicing
        kf, beam_pid = jax.lax.sort(
            (-beam_sims, beam_pid), dimension=1, is_stable=True,
            num_keys=2,
        )
        beam_sims = -kf
        return beam_pid[:, :ef] >> 1, beam_sims[:, :ef]
    return beam_pid >> 1, beam_sims


# ---------------------------------------------------------------------------
# Full pipeline, jitted per (shapes, ef, k, metric).
# ---------------------------------------------------------------------------

def search_pipeline(
    vecs, sqn, adj0, adj_up, upper_of, ep, max_layer, queries,
    *, ef: int, k: int, metric: str, expand: int = 1,
    iters: int | None = None, nbrvec=None, nbrsqn=None,
    qrows=None, pack: bool = False, seed_ids=None,
):
    qn = _query_sqnorms(metric, queries)
    ep_ids, ep_sims = greedy_descent(
        metric, queries, qn, vecs, sqn, adj_up, upper_of, ep, max_layer
    )
    seed_sims = None
    if seed_ids is not None:
        # score seeds through the SAME gather path as every other beam
        # entry so re-proposals during traversal carry bit-identical
        # sims (the adjacent-equal dedup depends on it, see beam_search)
        seed_sims = _score(
            metric, queries, qn, vecs, sqn,
            jnp.maximum(seed_ids, 0), seed_ids >= 0,
        )
    beam_ids, beam_sims = beam_search(
        metric, queries, qn, vecs, sqn, adj0, ep_ids, ep_sims, ef,
        expand=expand, iters=iters, nbrvec=nbrvec, nbrsqn=nbrsqn,
        qrows=qrows, seed_ids=seed_ids, seed_sims=seed_sims,
    )
    k_eff = min(k, ef)
    k_ids = beam_ids[:, :k_eff]
    k_raw = beam_sims[:, :k_eff]
    valid = k_raw != NEG_INF
    if metric == "euclidean":
        k_sims = D.exact_neg_sq_l2(
            queries, vecs, jnp.maximum(k_ids, 0), valid
        )
        # exact rescoring can reorder near-ties vs the matmul-form beam;
        # the reply contract is descending by (sim, -id)
        k_ids, k_sims = D.resort_desc(k_ids, k_sims)
    else:
        k_sims = jnp.where(valid, k_raw, NEG_INF)
    if pack:
        # One [B, 2k] int32 buffer (sims bitcast) -> ONE device->host
        # transfer instead of two; each D2H pays a full link round trip
        # on high-latency transports (same trick as ops/construct.py).
        return jnp.concatenate(
            [k_ids, jax.lax.bitcast_convert_type(k_sims, jnp.int32)],
            axis=1,
        )
    return k_ids, k_sims


search_batch_jit = jax.jit(
    search_pipeline,
    static_argnames=("ef", "k", "metric", "expand", "iters", "pack"),
)


def _pad_batch(n: int) -> int:
    b = 8
    while b < n:
        b *= 2
    return b


# Lane cap per device call: per-step tiles scale with B (frontier gather
# [B, E*F, D], dedup matrices [B, E*F, ef]) but not with N, so a fixed cap
# suffices; larger batches chunk.
MAX_LANES = 2048


def max_lanes_for(n_pad: int) -> int:
    return MAX_LANES


# Pivot pool size for seeded search: P rows strided over the live id
# space, refreshed per mutation epoch. The per-call cost of seeding is
# one [B, P] scan matmul + a [B, seeds] gather -- trivial next to the
# beam itself.
PIVOT_POOL = 1024


def _pivot_pool(index, snap):
    """Per-epoch cache of (global_ids [P] i32 dev, score_table, sqn).

    The pool is a strided sample of live rows; seeded search scans it
    to hand each lane its ``seeds`` closest pivots as extra beam
    entrypoints (entrypoint diversity -- an extension knob; the
    reference always starts from the single enterpoint, core.rs:876).
    """
    cached = getattr(index, "_pivot_cache", None)
    if cached is not None and cached[0] == index.epoch:
        return cached[1]
    h = min(len(index._levels), snap.n_pad)
    live_rows = np.flatnonzero(index._levels[:h] >= 0)
    p = min(PIVOT_POOL, len(live_rows))
    pick = np.unique(
        live_rows[np.linspace(0, len(live_rows) - 1, p).astype(np.int64)]
    ).astype(np.int32)
    ids_dev = jnp.asarray(pick)
    rows = snap.vecs[ids_dev]
    if snap.metric == "hamming":
        from .scan import _build_pm1

        table = _build_pm1(rows)
        sqn = jnp.zeros(len(pick), jnp.float32)
    else:
        table = rows
        sqn = snap.sqnorms[ids_dev]
    pool = (ids_dev, table, sqn)
    index._pivot_cache = (index.epoch, pool)
    return pool


def _seed_ids_for(pool, qd, seeds: int):
    """Top-``seeds`` pivots per lane as global row ids [B, seeds]."""
    from .scan import scan_topk

    ids_dev, table, sqn = pool
    s = min(int(seeds), int(table.shape[0]))
    live = jnp.ones(table.shape[0], bool)
    local, _ = scan_topk(
        table, sqn, live, qd, k=s,
        metric="hamming" if table.dtype == jnp.int8 else "euclidean",
    )
    return jnp.where(local >= 0, ids_dev[jnp.maximum(local, 0)], -1)


def _dispatch_search(
    snap, qs, ef: int, k: int, expand: int, iters=None,
    seeds: int = 0, pool=None, ids_only: bool = False,
):
    """Enqueue one padded beam-traversal program; returns a zero-arg
    ``finish()`` yielding trimmed (ids, sims) numpy. The beam is a
    single device program (search_batch_jit), so like the scan engines
    it dispatches asynchronously and only ``finish()`` pays the D2H
    round trip -- the pipelined chunk loop in :func:`search_batch`
    relies on that split.

    ``qs`` may already live on device (jax.Array): callers that reuse a
    query batch should upload once with jnp.asarray and pass the device
    array -- host->device transfer otherwise re-pays per call.

    ``ids_only`` transfers just the [B, k] id block and returns
    ``(ids, None)``; the caller rescores sims host-side (the ids-reply
    mode, ops/scan.py reply_ids_only -- empty slots carry id -1).
    """
    n_q = qs.shape[0]
    b_pad = _pad_batch(n_q)
    qd = qs if isinstance(qs, jax.Array) else jnp.asarray(qs)
    if b_pad != n_q:
        qd = jnp.concatenate(
            [qd, jnp.zeros((b_pad - n_q, qd.shape[1]), qd.dtype)], axis=0
        )
    seed_ids = None
    if seeds > 0 and ef > 1 and pool is not None:
        seed_ids = _seed_ids_for(pool, qd, min(seeds, ef - 1))
    packed = search_batch_jit(
        *snap.arrays, qd, ef=ef, k=int(k), metric=snap.metric,
        expand=expand, iters=iters,
        nbrvec=snap.nbrvec, nbrsqn=snap.nbrsqn,
        qrows=snap.qrows, pack=True, seed_ids=seed_ids,
    )
    from .scan import fetch_handle

    k_eff = packed.shape[1] // 2
    get_packed = fetch_handle(
        packed[:n_q, :k_eff] if ids_only else packed[:n_q]
    )

    def finish():
        if ids_only:
            return get_packed(), None
        p = get_packed()
        sims = np.ascontiguousarray(p[:, k_eff:]).view(np.float32)
        return p[:, :k_eff], sims

    return finish


def _run_search(
    snap, qs, ef: int, k: int, expand: int, iters=None,
    seeds: int = 0, pool=None, ids_only: bool = False,
):
    """One padded device call; returns trimmed (ids, sims) numpy.
    Dispatch + immediate fetch -- see :func:`_dispatch_search`."""
    return _dispatch_search(
        snap, qs, ef, k, expand, iters, seeds=seeds, pool=pool,
        ids_only=ids_only,
    )()


# Auto-engine crossover: below this many (padded) rows the exact MXU
# scan (ops/scan.py) beats the graph traversal outright -- measured on
# the v5e: euclid 128d scan wins by 16x at 10k, 27x at 131k and 4x at
# 1M (exact, recall 1.0), and the int8 +-1 matmul keeps hamming on the
# MXU. Past the threshold the O(N) scan finally loses to the O(log N)
# beam and the graph engine takes over.
SCAN_MAX_ROWS = {"euclidean": 1 << 21, "hamming": 1 << 21}

# Measured recall floor of the scan-approx tier at >=1M rows (0.9992 at
# 1M, 0.9996 at 1.9M -- artifacts/scan_tiers.json; smaller indexes are
# strictly better because the per-chunk oversample covers more of the
# chunk). recall_target above this floor must be served exactly.
APPROX_TIER_FLOOR = 0.999


def resolve_engine(engine: str, recall_target: float | None) -> str:
    """Apply the ``recall_target`` routing rule to an engine choice.

    ``recall_target`` is a guarantee, not a hint, so it only ever
    routes between engines with *known* recall: the exact scan (1.0 by
    construction) and the approx-select tier (measured >= 0.999,
    APPROX_TIER_FLOOR). With ``engine="auto"`` a target above the tier
    floor pins the EXACT scan -- even past the auto crossover where the
    (approximate, unguaranteed) graph beam would normally take over --
    and a target at or below the floor picks the tier, which outruns
    the graph beam at every index size that fits a chip (38.4k vs 5.1k
    qps at 1.9M rows). An explicit engine choice is always honored;
    asking the graph engine for a recall_target is an error -- its
    recall is data-dependent, tune (ef_search, expand, iters) against
    the in-process oracle with redis_hnsw_tpu.tune() instead.
    """
    if engine not in ("auto", "graph", "scan", "scan-approx"):
        raise ValueError(f"unknown search engine {engine!r}")
    if recall_target is None:
        return engine
    rt = float(recall_target)
    if not 0.0 < rt <= 1.0:
        raise ValueError(
            f"recall_target must be in (0, 1], got {recall_target!r}"
        )
    if engine == "graph":
        raise ValueError(
            "recall_target routes the scan engines; graph-engine "
            "knobs are tuned with redis_hnsw_tpu.tune()"
        )
    if engine == "auto":
        return "scan" if rt > APPROX_TIER_FLOOR else "scan-approx"
    return engine


def search_batch(
    index, queries, k: int, ef_search: int | None = None,
    expand: int = 1, iters: int | None = None, engine: str = "auto",
    reply: str = "objects", seeds: int = 0,
    recall_target: float | None = None, host_qs=None,
    staleness: int = 0,
):
    """Host entry: batched k-NN over an index. Returns per-query result
    lists of models.hnsw.SearchResult, nearest first -- or, with
    ``reply="columnar"``, the pair ``(names, sims)`` of [B, k] arrays
    (object / float32; empty slots None / -inf). Columnar replies skip
    per-result Python object construction: at B=2048, k=10 the 20k
    SearchResult allocations cost ~30ms on a single-core host -- more
    than the device search itself under the scan engine. Serving paths
    should prefer columnar; the object form matches the reference's
    per-query reply shape (src/types.rs:445-457).

    ``engine`` selects the device engine:

    * ``"graph"`` -- the batched HNSW beam traversal (approximate;
      ``ef_search``/``expand``/``iters`` tune it).
    * ``"scan"`` -- the exact MXU scan (ops/scan.py); the tuning knobs
      are moot (recall is 1.0 by construction).
    * ``"scan-approx"`` -- the scan with per-chunk oversampled
      jax.lax.approx_max_k selection: several-fold faster at big N for
      ~0.999 recall (reported sims stay exact).
    * ``"auto"`` (default) -- scan below the measured crossover
      (SCAN_MAX_ROWS), graph above it: on TPU the matmul scan
      dominates graph traversal until the index reaches millions of
      rows, the inverse of the CPU economics the reference's pointer
      graph is built around.

    ``recall_target`` turns the route into a guarantee: with "auto",
    a target above APPROX_TIER_FLOOR pins the exact scan and a target
    at or below it picks the approx tier (see resolve_engine).

    ``staleness`` > 0 serves from the bounded-stale snapshot view (at
    most that many mutation epochs behind; models/hnsw.py
    device_snapshot): queries never wait on a pending dirty-row delta,
    at the cost of not seeing the most recent wave(s). The
    mutation/serve-overlap mode of utils/streaming.py is built on it.
    """
    from ..models.hnsw import SearchResult

    cfg = index.config
    engine = resolve_engine(engine, recall_target)
    if (
        isinstance(queries, jax.Array)
        and queries.ndim == 2
        and queries.dtype == index._vectors.dtype
    ):
        qs = queries  # device-resident: no host round-trip
    else:
        qs = np.atleast_2d(
            np.asarray(queries, dtype=index._vectors.dtype)
        )
    want = index._vectors.shape[1]
    if qs.shape[1] != want:
        got = qs.shape[1] * (32 if cfg.metric == "hamming" else 1)
        from ..errors import DimensionMismatch

        raise DimensionMismatch(got)
    n_q = qs.shape[0]
    if reply not in ("objects", "columnar"):
        raise ValueError(f"unknown reply mode {reply!r}")
    if index.enterpoint < 0 or index.node_count == 0:
        if reply == "columnar":
            return (
                np.full((n_q, int(k)), None, object),
                np.full((n_q, int(k)), NEG_INF, np.float32),
            )
        return [[] for _ in range(n_q)]

    ef = cfg.ef_construction if ef_search is None else int(ef_search)
    ef = max(ef, 1)
    snap = index.device_snapshot(max_staleness=staleness)
    use_scan = engine in ("scan", "scan-approx") or (
        engine == "auto"
        and snap.n_pad <= SCAN_MAX_ROWS.get(cfg.metric, 0)
    )
    hq = host_qs if isinstance(qs, jax.Array) else qs
    if use_scan:
        from .scan import scan_dispatch

        approx = engine == "scan-approx"

        def dispatch(part, hpart=None, sink=None):
            return scan_dispatch(
                index, part, k, approx=approx, host_qs=hpart,
                cert_sink=sink, staleness=staleness,
            )
    else:
        from .scan import host_exact_sims, reply_ids_engaged, sort_reply

        pool = _pivot_pool(index, snap) if seeds > 0 else None
        graph_ids_mode = (
            cfg.metric == "euclidean" and hq is not None
            and reply_ids_engaged(cfg.dim)
        )

        def dispatch(part, hpart=None, sink=None):
            only = graph_ids_mode and hpart is not None
            fin = _dispatch_search(
                snap, part, ef, k, expand, iters, seeds=seeds,
                pool=pool, ids_only=only,
            )

            def finish():
                ids, sims = fin()
                if sims is None:
                    # ids-reply mode: sims host-rescored in exact
                    # direct form, then the (-sim, id) order
                    # re-imposed (host accumulation can differ from
                    # the device rescore by ~1 ulp; the reply must
                    # stay monotonic)
                    ids, sims = sort_reply(
                        ids, host_exact_sims(index._vectors, hpart, ids)
                    )
                return ids, sims

            return finish
    chunk = max_lanes_for(snap.n_pad)
    if n_q > chunk:
        # Pipelined drain (ops/scan.py drain_pipelined): up to
        # pipeline_depth() chunks stay dispatched-but-unfetched, so
        # each chunk's dispatch+D2H round trip (~28ms on this
        # latency-bound tunnel, CLAUDE.md) hides behind the following
        # chunks' device compute. TPU programs execute serially, so
        # in-flight chunks only QUEUE -- device peak memory is
        # per-program, unchanged. Certified-path fallback reruns
        # coalesce across the whole loop into ONE exact program +
        # fetch (CertRerunSink): with ~1% of queries uncertified
        # nearly every 2048-query chunk has a fallback, and an
        # immediate per-chunk rerun would re-serialize a round trip
        # into every finish().
        from .scan import (
            FETCH_WINDOW_FAST,
            CertRerunSink,
            cert_enabled,
            drain_pipelined,
            hamming_cert_ready,
            scan_dtype,
        )

        sink = CertRerunSink() if use_scan else None
        # Engine-aware fetch-window default: the coalesced multi-batch
        # D2H (FetchGroup) measured a win only where per-batch device
        # compute is small next to the ~28ms transfer round trip --
        # the approx and certified selectors (1.24-1.38x at 1M,
        # artifacts/fetch_window_ab.json); the compute-bound exact
        # top_k and the graph beam showed none. Env always overrides.
        default_window = 1
        if use_scan and (
            approx
            or (
                cfg.metric == "euclidean"
                and scan_dtype() == "f32"
                and cert_enabled(snap.n_pad, int(snap.vecs.shape[1]))
            )
            or (
                cfg.metric == "hamming"
                # both dispatcher gates: 31-bit word pack + int8 dim
                # gate (scan_dispatch's certified-hamming branch)
                and hamming_cert_ready(snap.n_pad, int(snap.vecs.shape[1]))
            )
        ):
            default_window = FETCH_WINDOW_FAST
        if not isinstance(qs, jax.Array):
            # one H2D for the whole block (H2D pays ~0.5-1s of
            # per-transfer latency on this tunnel); chunks below are
            # then free device-side slices. hq already mirrors the
            # host copy for the ids-reply mode.
            qs = jnp.asarray(qs)
        parts = (
            (
                qs[lo : lo + chunk],
                None if hq is None else hq[lo : lo + chunk],
                sink,
            )
            for lo in range(0, n_q, chunk)
        )
        id_parts, sim_parts = drain_pipelined(
            parts, dispatch, sink=sink, default_window=default_window
        )
        ids = np.concatenate(id_parts)
        sims = np.concatenate(sim_parts)
    else:
        ids, sims = dispatch(qs, hq)()

    # Assemble replies. Like the reference's search reply (src/lib.rs:
    # 484-495, types.rs:445-457) batch results carry (similarity, name)
    # only -- vectors are fetched via get_node when needed. data=None
    # keeps result-object assembly cheap, names resolve through ONE
    # object-array fancy-index (a [2048, 10] reply assembled row-by-row
    # off a python list measured 63ms on a 1-core host; this path ~2x
    # less), and the common all-slots-valid case skips the per-element
    # validity test.
    names = index._names.names_array()[np.maximum(ids, 0)]
    if reply == "columnar":
        invalid = (ids < 0) | np.isneginf(sims)
        if invalid.any():
            names = names.copy()
            names[invalid] = None
            sims = np.where(invalid, NEG_INF, sims).astype(np.float32)
        return names, np.asarray(sims, np.float32)
    ids_l = ids.tolist()
    sims_l = sims.tolist()
    names_l = names.tolist()
    if (ids >= 0).all() and not np.isneginf(sims).any():
        return [
            [
                SearchResult(s, n)
                for n, s in zip(brow_names, bsim)
            ]
            for brow_names, bsim in zip(names_l, sims_l)
        ]
    neg_inf = float("-inf")
    out = []
    for brow, bsim, bnames in zip(ids_l, sims_l, names_l):
        res = [
            SearchResult(s, n)
            for row, s, n in zip(brow, bsim, bnames)
            if row >= 0 and s != neg_inf
        ]
        out.append(res)
    return out
