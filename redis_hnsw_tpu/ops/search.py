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
  frontier loop: each lane keeps a top-ef beam (ids, sims, expanded flags)
  and a visited bitmap; per step the best unexpanded candidate of every
  lane is expanded at once -- one [B, deg0] gather + one MXU-form distance
  tile + one top-k merge. A lane is done when its best unexpanded candidate
  scores below its worst beam entry (the reference's early-exit,
  core.rs:630-637).

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

from functools import partial

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
        return jnp.zeros(q.shape[0], jnp.float32)
    return jnp.sum(q * q, axis=-1)


def _point_sims(metric, q, qn, vecs, vn, ids):
    mask = jnp.ones((ids.shape[0], 1), bool)
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


# ---------------------------------------------------------------------------
# Fixed-shape beam search over one adjacency table (vectorized search_level).
# ---------------------------------------------------------------------------

def beam_search(
    metric, q, qn, vecs, vn, adj, ep_ids, ep_sims, ef: int,
    row_map=None, active=None, expand: int = 1,
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
    [B, expand*F] (bigger, MXU-friendlier work per step). expand=1
    reproduces the reference expansion order exactly; expand>1 explores a
    superset of the reference's frontier per step (termination still fires
    only when the single best unexpanded candidate falls below the worst
    beam entry, so result quality is never below the expand=1 beam).
    """
    B = q.shape[0]
    F = adj.shape[1]
    E = max(1, min(expand, ef))
    N = vecs.shape[0]
    rows = jnp.arange(B)

    # All initial carries derive from traced inputs (never bare constants)
    # so their "varying manual axes" match the loop body outputs under
    # shard_map (see parallel/sharded.py).
    no_b = ep_ids != ep_ids  # all-False [B], varying with inputs
    beam_ids = jnp.where(
        jnp.arange(ef)[None, :] == 0, ep_ids[:, None], -1
    ).astype(jnp.int32)
    beam_sims = jnp.where(
        jnp.arange(ef)[None, :] == 0, ep_sims[:, None], NEG_INF
    )
    expanded = jnp.broadcast_to(no_b[:, None], (B, ef))
    # Visited set: one bool per (lane, node). A byte map beats a packed
    # bitmap here because marking a frontier becomes ONE scatter per step
    # (vs one read-modify-write per frontier column); large-N memory is
    # handled by query chunking in the host wrapper.
    visited = jnp.broadcast_to(no_b[:, None], (B, N))
    visited = visited.at[rows, ep_ids].set(True)
    done = no_b if active is None else ~active

    def cond(c):
        return jnp.any(~c[4])

    def body(c):
        beam_ids, beam_sims, expanded, visited, done = c
        # Top-E unexpanded candidates per lane (c.pop() of core.rs:631).
        cand = jnp.where(expanded, NEG_INF, beam_sims)
        if E == 1:
            j = jnp.argmax(cand, axis=1)[:, None]            # [B, 1]
            csims = jnp.take_along_axis(cand, j, 1)
        else:
            csims, j = jax.lax.top_k(cand, E)                # [B, E]
        worst = jnp.min(beam_sims, axis=1)   # -inf while beam underfull
        best = csims[:, 0]
        newly_done = (best == NEG_INF) | (best < worst)
        done = done | newly_done
        act = ~done

        # Mark the expanded slots; empty picks (csim == -inf) redirect to
        # column 0 so duplicate scatter indices all write True.
        mark_j = jnp.where(csims > NEG_INF, j, j[:, :1])
        exp_marked = expanded.at[rows[:, None], mark_j].set(True)
        cids = jnp.take_along_axis(beam_ids, j, 1)           # [B, E]
        cids = jnp.where(csims > NEG_INF, cids, -1)
        crow = cids if row_map is None else row_map[jnp.maximum(cids, 0)]
        crow = jnp.where(cids >= 0, crow, -1)
        nbrs = adj[jnp.maximum(crow, 0)]                     # [B, E, F]
        nbrs = jnp.where((crow >= 0)[:, :, None], nbrs, -1)
        nbrs = nbrs.reshape(B, E * F)
        if E > 1:
            # Intra-step dedupe: two expanded candidates may share a
            # neighbor. Sort ids and kill equal-adjacent duplicates
            # (order is irrelevant -- everything merges through top-k).
            nbrs = jnp.sort(nbrs, axis=1)
            dup = jnp.concatenate(
                [jnp.zeros((B, 1), bool), nbrs[:, 1:] == nbrs[:, :-1]],
                axis=1,
            )
            nbrs = jnp.where(dup, -1, nbrs)
        nb_safe = jnp.maximum(nbrs, 0)
        seen = visited[rows[:, None], nb_safe]
        fresh = (nbrs >= 0) & ~seen & act[:, None]
        # Mark in one scatter. Every entry writes True: masked-out entries
        # are redirected to the lane's entrypoint (already visited), so
        # duplicate scatter indices never carry conflicting values.
        mark_at = jnp.where(fresh, nb_safe, jnp.maximum(ep_ids, 0)[:, None])
        visited = visited.at[rows[:, None], mark_at].set(True)

        nsims = _score(metric, q, qn, vecs, vn, nb_safe, fresh)

        # Merge: top-ef of beam U frontier. Ties keep incumbents (lower
        # concat index), matching the reference's strict-> accept test.
        all_ids = jnp.concatenate([beam_ids, nbrs], axis=1)
        all_sims = jnp.concatenate([beam_sims, nsims], axis=1)
        all_exp = jnp.concatenate(
            [exp_marked, jnp.zeros((B, E * F), bool)], axis=1
        )
        top_sims, idx = jax.lax.top_k(all_sims, ef)
        top_ids = jnp.take_along_axis(all_ids, idx, 1)
        top_exp = jnp.take_along_axis(all_exp, idx, 1)

        keep = act[:, None]
        return (
            jnp.where(keep, top_ids, beam_ids),
            jnp.where(keep, top_sims, beam_sims),
            jnp.where(keep, top_exp, expanded),
            visited,
            done,
        )

    beam_ids, beam_sims, _, _, _ = jax.lax.while_loop(
        cond, body, (beam_ids, beam_sims, expanded, visited, done)
    )
    return beam_ids, beam_sims


# ---------------------------------------------------------------------------
# Full pipeline, jitted per (shapes, ef, k, metric).
# ---------------------------------------------------------------------------

def search_pipeline(
    vecs, sqn, adj0, adj_up, upper_of, ep, max_layer, queries,
    *, ef: int, k: int, metric: str, expand: int = 1,
):
    qn = _query_sqnorms(metric, queries)
    ep_ids, ep_sims = greedy_descent(
        metric, queries, qn, vecs, sqn, adj_up, upper_of, ep, max_layer
    )
    beam_ids, beam_sims = beam_search(
        metric, queries, qn, vecs, sqn, adj0, ep_ids, ep_sims, ef,
        expand=expand,
    )
    k_eff = min(k, ef)
    k_ids = beam_ids[:, :k_eff]
    k_raw = beam_sims[:, :k_eff]
    valid = k_raw != NEG_INF
    if metric == "euclidean":
        k_sims = D.exact_neg_sq_l2(
            queries, vecs, jnp.maximum(k_ids, 0), valid
        )
    else:
        k_sims = jnp.where(valid, k_raw, NEG_INF)
    return k_ids, k_sims


search_batch_jit = jax.jit(
    search_pipeline, static_argnames=("ef", "k", "metric", "expand")
)


def _pad_batch(n: int) -> int:
    b = 8
    while b < n:
        b *= 2
    return b


# Per-lane visited maps are n_pad bytes; cap a single device call's maps
# at ~1GB (of ~16GB HBM) and chunk the query batch above that.
VISITED_BUDGET_BYTES = 1024 * 1024 * 1024


def max_lanes_for(n_pad: int) -> int:
    lanes = 8
    while lanes * 2 * n_pad <= VISITED_BUDGET_BYTES:
        lanes *= 2
    return lanes


def _run_search(snap, qs, ef: int, k: int, expand: int):
    """One padded device call; returns trimmed (ids, sims) numpy."""
    n_q = qs.shape[0]
    b_pad = _pad_batch(n_q)
    if b_pad != n_q:
        qs = np.concatenate(
            [qs, np.zeros((b_pad - n_q, qs.shape[1]), qs.dtype)], axis=0
        )
    ids, sims = search_batch_jit(
        *snap.arrays, jnp.asarray(qs), ef=ef, k=int(k), metric=snap.metric,
        expand=expand,
    )
    return np.asarray(ids[:n_q]), np.asarray(sims[:n_q])


def search_batch(
    index, queries, k: int, ef_search: int | None = None,
    expand: int = 1,
):
    """Host entry: batched k-NN over an index. Returns per-query result
    lists of models.hnsw.SearchResult, nearest first."""
    from ..models.hnsw import SearchResult

    cfg = index.config
    qs = np.atleast_2d(
        np.asarray(queries, dtype=index._vectors.dtype)
    )
    want = index._vectors.shape[1]
    if qs.shape[1] != want:
        got = qs.shape[1] * (32 if cfg.metric == "hamming" else 1)
        from ..errors import DimensionMismatch

        raise DimensionMismatch(got)
    n_q = qs.shape[0]
    if index.enterpoint < 0 or index.node_count == 0:
        return [[] for _ in range(n_q)]

    ef = cfg.ef_construction if ef_search is None else int(ef_search)
    ef = max(ef, 1)
    snap = index.device_snapshot()
    chunk = max_lanes_for(snap.n_pad)
    if n_q > chunk:
        id_parts, sim_parts = [], []
        for lo in range(0, n_q, chunk):
            part = qs[lo : lo + chunk]
            i_p, s_p = _run_search(snap, part, ef, k, expand)
            id_parts.append(i_p)
            sim_parts.append(s_p)
        ids = np.concatenate(id_parts)
        sims = np.concatenate(sim_parts)
    else:
        ids, sims = _run_search(snap, qs, ef, k, expand)

    out = []
    for b in range(n_q):
        res = []
        for col in range(ids.shape[1]):
            row = int(ids[b, col])
            s = float(sims[b, col])
            if row < 0 or s == float("-inf"):
                continue
            res.append(
                SearchResult(
                    sim=s,
                    name=index._names.name(row),
                    data=index._vectors[row].copy(),
                )
            )
        out.append(res)
    return out
