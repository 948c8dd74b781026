"""Batched index construction -- the TPU bulk-build engine.

The reference inserts one node at a time through a strictly sequential
pointer-graph path (src/hnsw/core.rs:489-599): per insert, a greedy
descent plus an ef_construction-wide beam per layer, each scoring one
neighbor at a time. On TPU the expensive part of that path -- candidate
discovery -- vectorizes perfectly across an insert *wave*: one device pass
runs the descent and every layer beam for W inserts at once (masked by
each insert's sampled level), plus one [W, W] matmul scoring the wave
against itself. The remaining graph surgery (top-m link selection,
bidirectional connect, degree shrink -- core.rs:523-577) is tiny pointer
work applied on the host in insertion order.

Approximations relative to the strictly sequential reference build (the
exact path remains ``HNSWIndex.add_node``):

* Beams see the graph as of the wave start; nodes inserted earlier in the
  same wave are injected as candidates via exact intra-wave similarities
  (better than traversal would find them) but their *links* are not
  traversed until the next wave.
* ``select_neighbors``'s candidate extension (core.rs:689-722) is skipped:
  with an ef_construction-wide beam the top-m of the beam is virtually
  always the top-m of the extended set, and the extension is a
  host-round-trip per insert. Recall parity is validated in
  tests/test_core.py::test_bulk_build_recall.

Wave candidate quality and the resulting graph are validated against the
brute-force oracle; recall at equal (M, efcon) matches the sequential
build within noise.
"""

from __future__ import annotations

import contextlib
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import distance as D
from .search import _query_sqnorms, _score, beam_search, hill_climb_layer


def _point_sims(metric, q, qn, vecs, vn, ids):
    mask = np.ones((ids.shape[0], 1), bool)
    return _score(metric, q, qn, vecs, vn, ids[:, None], mask)[:, 0]


@partial(
    jax.jit,
    static_argnames=("ef", "metric", "expand", "fetch_c", "fetch_l"),
)
def construct_scores(
    vecs, sqn, adj0, adj_up, upper_of, ep, max_layer,
    queries, levels, nbrvec=None, nbrsqn=None, qrows=None, up_sel=None,
    *, ef: int, metric: str, expand: int = 1, fetch_c: int | None = None,
    fetch_l: int | None = None,
):
    """One device pass scoring a whole insert wave against the snapshot.

    For each wave lane i with sampled level l_i (reference semantics,
    core.rs:511-577): greedy ef=1 descent at layers l_max..l_i+1, then an
    ef-wide beam at layers min(l_max, l_i)..0. The layer loop is a
    ``lax.scan`` over the snapshot's padded layer stack with dynamic
    ``max_layer`` masking, so growth of the live layer count never
    recompiles -- one compile serves a whole build at fixed table shapes
    (see ops/snapshot.py presizing).

    **Split upper beams (the r5 construction speedup):** only ~W/m lanes
    sample level >= 1 (P(level >= L) ~ m^-L, core.rs:601-605), yet the
    original layer scan ran the full-width ef-wide beam at EVERY padded
    upper layer -- ~6 masked beams whose results all but ~128 of 2048
    lanes discard. Measured at 1M x 128d (artifacts/build1m_breakdown):
    the device pass was 2.58s of a 3.2s wave, ~70%% of it those dead
    beams. With ``up_sel`` (host-computed compact lane list, pow2-
    padded by repeating lane up_sel[0]), the upper scan beams only the
    [W_up] gathered lanes; all W lanes run the cheap ef=1 hill-climb
    descent, and the layer-1 beam result is scattered back as the
    layer-0 entrypoint. Per-lane semantics are IDENTICAL (each lane's
    descent/beam sequence is unchanged -- lanes are independent);
    tests/test_core.py pins split == unsplit bit-for-bit.
    ``up_sel=None`` keeps the original full-width scan (also the path
    for waves with no upper lanes, where the scan is all descent).

    Returns (flat, cross):
      flat packs, in order: up_ids [l_keep, W_up|W, C], up_sims
        (bitcast), l0_ids [W, C], l0_sims (bitcast) -- candidates at
        layer lc live at index lc-1, valid only for lanes with levels
        >= lc and lc <= max_layer (compact W_up lanes under up_sel);
      cross: [W, W] intra-wave sims (hamming) or None (euclidean --
        the host computes them, see dispatch_wave).

    ``C = min(ef, fetch_c)``: the surgery step links only the top-m of
    each sorted candidate list, so fetching the full ef-wide beam wastes
    device->host bytes -- callers pass a small fetch_c (see _insert_wave).
    The beam itself still runs at full ef width (search quality is
    unchanged); only the returned slice narrows.
    """
    qn = _query_sqnorms(metric, queries)
    W = queries.shape[0]
    L_pad = adj_up.shape[0]
    ids = jnp.full((W,), ep, jnp.int32)
    sims = _point_sims(metric, queries, qn, vecs, sqn, ids)
    iters = (ef + expand - 1) // expand + BUILD_ITER_SLACK

    c = min(ef, fetch_c) if fetch_c is not None else ef
    # only the first fetch_l upper layers are populated for this wave
    # (no lane's sampled level reaches higher): don't ship dead bytes
    l_keep = L_pad if fetch_l is None else min(fetch_l, L_pad)

    if up_sel is None:
        def layer_step(carry, i):
            ids, sims = carry
            lc = L_pad - i  # layer number, descending L_pad .. 1
            adj_l = jax.lax.dynamic_index_in_dim(
                adj_up, lc - 1, axis=0, keepdims=False
            )
            exists = lc <= max_layer
            descending = (levels < lc) & exists
            beaming = (levels >= lc) & exists
            d_ids, d_sims = hill_climb_layer(
                metric, queries, qn, vecs, sqn, adj_l, upper_of,
                ids, sims, active=descending,
            )
            b_ids, b_sims = beam_search(
                metric, queries, qn, vecs, sqn, adj_l, ids, sims, ef,
                row_map=upper_of, active=beaming, expand=expand,
                iters=iters,
            )
            # ep for the next layer: best of beam where beaming, else
            # the descent result (w.peek(), core.rs:576).
            ids = jnp.where(beaming, b_ids[:, 0], d_ids)
            sims = jnp.where(beaming, b_sims[:, 0], d_sims)
            return (ids, sims), (b_ids[:, :c], b_sims[:, :c])

        # lax.iota, NOT jnp.arange: a trace-time jnp.arange creates a
        # CONCRETE device array that lowering re-fetches to embed as an
        # MLIR constant -- a device->host round trip per compile, and
        # on the tunnel transport that fetch DEADLOCKS when a snapshot
        # delta's host->device upload is still in flight (r5: two 1M
        # streaming runs froze 20+ minutes inside _pjit_lower with this
        # exact stack). iota is a traced op: nothing to fetch.
        (ids, sims), (up_ids, up_sims) = jax.lax.scan(
            layer_step, (ids, sims), jax.lax.iota(jnp.int32, L_pad)
        )
        # scan emits layers L_pad..1; store layer lc at index lc-1
        up_ids = up_ids[::-1][:l_keep]
        up_sims = up_sims[::-1][:l_keep]
    else:
        # -- all-lane descent: layers l_max..l_i+1 (ef=1 hill climb) --
        def descend_step(carry, i):
            ids, sims = carry
            lc = L_pad - i
            adj_l = jax.lax.dynamic_index_in_dim(
                adj_up, lc - 1, axis=0, keepdims=False
            )
            descending = (levels < lc) & (lc <= max_layer)
            ids, sims = hill_climb_layer(
                metric, queries, qn, vecs, sqn, adj_l, upper_of,
                ids, sims, active=descending,
            )
            return (ids, sims), None

        (ids, sims), _ = jax.lax.scan(
            descend_step, (ids, sims), jax.lax.iota(jnp.int32, L_pad)
        )

        # -- compact upper beams: layers min(l_max, l_i)..1 ----------
        q_u = queries[up_sel]
        qn_u = qn[up_sel]
        lv_u = levels[up_sel]
        ids_u = ids[up_sel]
        sims_u = sims[up_sel]

        def upper_step(carry, i):
            ids_u, sims_u = carry
            lc = L_pad - i
            adj_l = jax.lax.dynamic_index_in_dim(
                adj_up, lc - 1, axis=0, keepdims=False
            )
            beaming = (lv_u >= lc) & (lc <= max_layer)
            b_ids, b_sims = beam_search(
                metric, q_u, qn_u, vecs, sqn, adj_l, ids_u, sims_u,
                ef, row_map=upper_of, active=beaming, expand=expand,
                iters=iters,
            )
            ids_u = jnp.where(beaming, b_ids[:, 0], ids_u)
            sims_u = jnp.where(beaming, b_sims[:, 0], sims_u)
            return (ids_u, sims_u), (b_ids[:, :c], b_sims[:, :c])

        (ids_u, sims_u), (up_ids, up_sims) = jax.lax.scan(
            upper_step, (ids_u, sims_u), jax.lax.iota(jnp.int32, L_pad)
        )
        up_ids = up_ids[::-1][:l_keep]
        up_sims = up_sims[::-1][:l_keep]
        # layer-0 entrypoint for upper lanes = their layer-1 beam best
        # (duplicate up_sel pad entries scatter identical data: safe)
        ids = ids.at[up_sel].set(ids_u)
        sims = sims.at[up_sel].set(sims_u)

    l0_ids, l0_sims = beam_search(
        metric, queries, qn, vecs, sqn, adj0, ids, sims, ef,
        expand=expand, iters=iters,
        nbrvec=nbrvec, nbrsqn=nbrsqn, qrows=qrows,
    )
    l0_ids = l0_ids[:, :c]
    l0_sims = l0_sims[:, :c]

    if metric == "hamming":
        cross = D.pairwise_hamming(queries, queries)
    else:
        # euclidean cross sims are computed on the HOST (one small f32
        # gemm) -- fetching the [W, W] matrix dominated device->host
        # bytes on slow links (benchmarks/million.py profile mode)
        cross = None
    # pack everything into ONE int32 buffer (sims bitcast) so the host
    # fetch is a single transfer -- separate np.asarray calls each paid a
    # full link round-trip (measured ~150ms/call through the dev tunnel)
    flat = jnp.concatenate([
        up_ids.ravel(),
        jax.lax.bitcast_convert_type(up_sims, jnp.int32).ravel(),
        l0_ids.ravel(),
        jax.lax.bitcast_convert_type(l0_sims, jnp.int32).ravel(),
    ])
    return flat, cross


@partial(
    jax.jit,
    static_argnames=("ef", "metric", "expand", "fetch_c", "fetch_l"),
)
def construct_upper_scores(
    vecs, sqn, adj_up, upper_of, ep, max_layer, queries, levels, up_sel,
    *, ef: int, metric: str, expand: int = 1, fetch_c: int = 32,
    fetch_l: int = 1,
):
    """Upper-layer half of a wave under the scan-l0 build mode: only
    the compact ``up_sel`` lanes (levels >= 1) run the greedy descent
    (layers l_max..l_i+1) and the ef-wide beams (layers l_i..1); layer
    0 never runs here because scan-l0 sources every lane's layer-0
    candidates from the exact MXU scan instead (see dispatch_wave).
    Per-lane semantics for the layers it DOES run are identical to
    construct_scores (lanes are independent).

    Returns the packed upper block only: up_ids [l_keep, W_up, C] then
    bitcast up_sims, raveled into one int32 vector (the caller
    concatenates the scan's layer-0 block behind it so the host fetch
    stays a single transfer)."""
    qn = _query_sqnorms(metric, queries)
    L_pad = adj_up.shape[0]
    q_u = queries[up_sel]
    qn_u = qn[up_sel]
    lv_u = levels[up_sel]
    iters = (ef + expand - 1) // expand + BUILD_ITER_SLACK
    c = min(ef, fetch_c)
    l_keep = min(fetch_l, L_pad)

    ids_u = jnp.full((q_u.shape[0],), ep, jnp.int32)
    sims_u = _point_sims(metric, q_u, qn_u, vecs, sqn, ids_u)

    def layer_step(carry, i):
        ids_u, sims_u = carry
        lc = L_pad - i
        adj_l = jax.lax.dynamic_index_in_dim(
            adj_up, lc - 1, axis=0, keepdims=False
        )
        exists = lc <= max_layer
        descending = (lv_u < lc) & exists
        beaming = (lv_u >= lc) & exists
        d_ids, d_sims = hill_climb_layer(
            metric, q_u, qn_u, vecs, sqn, adj_l, upper_of,
            ids_u, sims_u, active=descending,
        )
        b_ids, b_sims = beam_search(
            metric, q_u, qn_u, vecs, sqn, adj_l, ids_u, sims_u, ef,
            row_map=upper_of, active=beaming, expand=expand,
            iters=iters,
        )
        ids_u = jnp.where(beaming, b_ids[:, 0], d_ids)
        sims_u = jnp.where(beaming, b_sims[:, 0], d_sims)
        return (ids_u, sims_u), (b_ids[:, :c], b_sims[:, :c])

    (_, _), (up_ids, up_sims) = jax.lax.scan(
        layer_step, (ids_u, sims_u), jax.lax.iota(jnp.int32, L_pad)
    )
    up_ids = up_ids[::-1][:l_keep]
    up_sims = up_sims[::-1][:l_keep]
    return jnp.concatenate([
        up_ids.ravel(),
        jax.lax.bitcast_convert_type(up_sims, jnp.int32).ravel(),
    ])


def unpack_scores(
    flat: np.ndarray, l_pad: int, w_pad: int, c: int,
    w_up: int | None = None,
):
    """Host-side inverse of construct_scores' packed return. ``w_up``
    is the compact upper-lane width when the wave ran the split upper
    beams (up_sel); defaults to the full wave width (unsplit)."""
    if w_up is None:
        w_up = w_pad
    n_up = l_pad * w_up * c
    n_l0 = w_pad * c
    up_ids = flat[:n_up].reshape(l_pad, w_up, c)
    up_sims = flat[n_up : 2 * n_up].view(np.float32).reshape(
        l_pad, w_up, c
    )
    l0_ids = flat[2 * n_up : 2 * n_up + n_l0].reshape(w_pad, c)
    l0_sims = flat[2 * n_up + n_l0 :].view(np.float32).reshape(w_pad, c)
    return up_ids, up_sims, l0_ids, l0_sims


def _select_top_m(index, cand_ids, cand_sims, m, exclude):
    """Top-m candidates by sim (bulk-path select; see module docstring).

    ``cand_*`` are parallel arrays sorted descending. Dedupes and drops
    ``exclude`` rows and free rows.
    """
    out = []
    seen = set(exclude)
    for cid, s in zip(cand_ids, cand_sims):
        cid = int(cid)
        if cid < 0 or s == -np.inf or cid in seen:
            continue
        if not index._is_alloc(cid):
            continue  # freed row in the snapshot epoch gap
        # note: a row freed and REUSED since the wave-start snapshot
        # passes this check with a sim computed against its old vector;
        # the link is still valid (live node) and later shrinks rescore
        # it exactly -- the reference never reuses rows so has no
        # analogous case
        seen.add(cid)
        out.append((float(s), cid))
        if len(out) == m:
            break
    return out


def _shrink_over_cap(index, e_row, lc, m_cap):
    """Degree-cap repair (core.rs:540-574) with top-m_cap selection."""
    e_nbrs = index._nbrs(e_row, lc)
    if len(e_nbrs) <= m_cap:
        return
    e_vec = index._vectors[e_row]
    e_sims = index._sims_to(e_vec, e_nbrs)
    order = sorted(
        zip(e_sims.tolist(), e_nbrs), key=lambda p: (-p[0], p[1])
    )
    keep = [r for _, r in order[:m_cap]]
    index._update_connections(e_row, keep, list(e_nbrs), lc)


BUILD_EXPAND = 16   # candidates expanded per beam step during bulk build
BUILD_ITER_SLACK = 8  # extra beam steps beyond ceil(ef/expand)

# Per-phase wall-clock accumulator for bulk builds (None = off). Set to a
# utils.profiling.PhaseTimer to split waves into snapshot-refresh /
# device-pass / fetch / host-surgery; benchmarks/million.py reports it.
BUILD_TIMER = None


def add_batch(index, names, data, batch_size: int = 1024) -> None:
    """Bulk insert via device-scored waves. Entry for HNSWIndex.add_batch."""
    data = np.atleast_2d(np.asarray(data, dtype=index._vectors.dtype))
    names = list(names)
    if len(names) != data.shape[0]:
        raise ValueError(
            f"{len(names)} names for {data.shape[0]} data rows"
        )
    if data.shape[0] == 0:
        return
    # Presize the device snapshot for the final size: one compile of the
    # wave engine then serves the entire build.
    index._capacity_hint = max(
        int(getattr(index, "_capacity_hint", 0)),
        index._names.high_water + len(names),
    )
    start = 0
    if index.node_count == 0:
        index.add_node(names[0], data[0])
        start = 1

    cfg = index.config
    ef = cfg.ef_construction
    lo = start
    # note: prefetching the next wave's query upload behind this wave's
    # device pass / fetch / surgery was tried and measured SLOWER on the
    # dev tunnel (953 vs 1122 adds/s at 30k) -- the link is effectively
    # half-duplex, so the overlapped upload delays the result fetch.
    while lo < len(names):
        # cap the wave so its visited maps fit the device budget
        from .search import max_lanes_for

        with _phase("snapshot_refresh"):
            cap = max_lanes_for(index.device_snapshot().n_pad)
        hi = min(lo + min(batch_size, cap), len(names))
        _insert_wave(index, names[lo:hi], data[lo:hi], ef)
        lo = hi


def _pad_lanes(qs: np.ndarray) -> np.ndarray:
    """Pad wave lanes to the next power of two (zero vectors)."""
    w = qs.shape[0]
    w_pad = 8
    while w_pad < w:
        w_pad *= 2
    if w_pad == w:
        return qs
    return np.concatenate(
        [qs, np.zeros((w_pad - w, qs.shape[1]), qs.dtype)]
    )


def _host_cross(qs: np.ndarray) -> np.ndarray:
    """[W, W] matmul-form negative squared L2 on the host.

    torch's sgemm is ~50x numpy's on this class of box (single core,
    generic BLAS in numpy); fall back to numpy where torch is missing.
    """
    try:
        import torch

        dots = (torch.from_numpy(qs) @ torch.from_numpy(qs).T).numpy()
    except ImportError:  # pragma: no cover
        dots = qs @ qs.T
    qq = np.einsum("wd,wd->w", qs, qs)
    return (2.0 * dots - qq[:, None] - qq[None, :]).astype(np.float32)


def _phase(name: str):
    """Timing context for one bulk-build phase (no-op unless BUILD_TIMER)."""
    if BUILD_TIMER is None:
        return contextlib.nullcontext()
    return BUILD_TIMER.phase(name)


def _wave_split() -> bool:
    """Split upper beams onto a compacted lane block (default on; see
    construct_scores). REDIS_HNSW_TPU_WAVE_SPLIT=0 restores the
    full-width layer scan for A/B measurement."""
    import os

    return os.environ.get("REDIS_HNSW_TPU_WAVE_SPLIT", "1") != "0"


def _build_l0_scan(index, snap, fetch_c: int) -> bool:
    """Scan-l0 build mode: source every lane's LAYER-0 candidates from
    the exact MXU scan (scan_topk_exact_l2, approx-select + exact f32
    rescore) instead of the ef-wide graph beam, and run only the
    compact upper lanes through the graph program
    (construct_upper_scores). Rationale: below the auto-engine
    crossover the scan outruns the beam for QUERIES by 4-27x (measured,
    ops/search.py SCAN_MAX_ROWS) -- and insert-candidate discovery is
    the same computation at k=fetch_c, with the top-C of the exact scan
    a strictly BETTER candidate set than the beam's approximation of
    it. The bulk wave path is a documented approximation of the
    sequential reference insert (module docstring); this mode changes
    the approximation's candidate source, not the surgery semantics --
    both backends still consume identical candidate arrays, so
    py == native graph identity is preserved.

    REDIS_HNSW_TPU_BUILD_L0 = beam | scan | auto ("auto": scan for
    euclidean below the measured search crossover, beam above it and
    for hamming builds). Default "auto" since the TPU A/B landed:
    1M x 96d interleaved pairs, scan-l0 1616 inserts/s vs beam 775
    (2.08x), self-recall probe 1.0 (artifacts/build_l0_ab.json)."""
    import os

    mode = os.environ.get("REDIS_HNSW_TPU_BUILD_L0", "auto").lower()
    if mode == "beam":
        return False
    if snap.metric != "euclidean":
        return False  # hamming builds keep the beam path (for now)
    if snap.n_pad < fetch_c:
        return False  # tiny snapshot: scan_topk would narrow the slice
    if mode == "scan":
        return True
    from .search import SCAN_MAX_ROWS

    return snap.n_pad <= SCAN_MAX_ROWS["euclidean"]


def _build_live_mask(index, snap):
    """Per-epoch device live mask for scan-l0 candidate masking (same
    derivation as ops/scan.py _scan_state, kept on its own cache slot
    so a bounded-staleness SERVING cache entry -- keyed to an older
    epoch -- is not thrashed by every build wave)."""
    cached = getattr(index, "_build_live_cache", None)
    ep = index._snapshot_epoch
    if cached is not None and cached[0] == ep:
        return cached[1]
    live_np = np.zeros(snap.n_pad, bool)
    h = min(len(index._levels), snap.n_pad, snap.live_hw)
    live_np[:h] = index._levels[:h] >= 0
    live = jnp.asarray(live_np)
    index._build_live_cache = (ep, live)
    return live


class InFlightWave:
    """A dispatched (but not yet applied) construction wave: the device
    pass is in flight; ``complete_wave`` fetches and applies it. Lets
    independent indexes (shards) overlap their device passes with each
    other's host surgery (parallel/sharded.py)."""

    __slots__ = (
        "names", "qs", "qs_dev", "levels", "flat", "cross",
        "w_pad", "fetch_c", "fetch_l", "n_up_used", "l_max",
        "up_sel", "w_up", "scan_l0",
    )


def dispatch_wave(index, names, data, ef: int, qs_dev=None) -> InFlightWave:
    """Sample levels and launch the wave's device pass (async). The
    caller must ``complete_wave`` before the index's next mutation."""
    cfg = index.config
    W = len(names)
    # 1. sample levels (core.rs:601-605) and validate
    qs = np.stack([index._coerce(d) for d in data])
    from ..errors import NodeExists

    for n in names:
        if n in index._names:
            raise NodeExists(n)
    levels = np.array(
        [index._gen_random_level() for _ in range(W)], np.int32
    )

    # 2. one device pass against the wave-start snapshot. The wave is
    # padded to a power of two (padding lanes: zero vectors, level 0,
    # results ignored) so a trailing partial wave reuses the compile.
    snap = index.device_snapshot()
    l_max = int(index.max_layer)
    w_pad = 8
    while w_pad < W:
        w_pad *= 2
    levels_d = levels
    if w_pad != W:
        levels_d = np.concatenate(
            [levels, np.zeros(w_pad - W, levels.dtype)]
        )
    # only the top-m of each sorted candidate list is ever linked
    # (plus slack for rows freed since the snapshot / intra-lane dups):
    # fetch a narrow slice, not the full ef-wide beam
    fetch_c = min(ef, max(4 * cfg.m, cfg.m_max_0 + 16, 32))
    n_up_used = int(min(l_max, int(levels.max(initial=0))))
    # upper-layer slice of the packed fetch, bucketed to powers of two
    # so the (rare) growth of the wave's max level seldom recompiles
    fetch_l = 1
    while fetch_l < n_up_used:
        fetch_l *= 2
    fetch_l = min(fetch_l, int(snap.adj_up.shape[0]))
    # split upper beams: compact lane list (pow2-padded by repeating
    # its first entry -- duplicate lanes compute identical results and
    # the scatter-back writes identical data). Lanes with level 0 in
    # the pad are inert in every upper beam (their beaming mask is
    # False, so the beam's while_loop exits immediately).
    scan_l0 = _build_l0_scan(index, snap, fetch_c)
    up_sel = None
    if _wave_split() or scan_l0:
        up_lanes = np.nonzero(levels >= 1)[0].astype(np.int32)
        if up_lanes.size == 0:
            up_lanes = np.zeros(1, np.int32)
        # Stable compact width: E[#upper] = W/m with std ~sqrt(W/m);
        # pow2-bucketing the OBSERVED count flip-flops right at the
        # mean (e.g. W=2048, m=16 -> 128 +- 11 straddles the 128
        # bucket), compiling the wave program twice. Size to the
        # mean + 5 sigma once; only a ~1e-6 tail wave recompiles.
        mu = w_pad / max(cfg.m, 2)
        w_up = 8
        while w_up < min(max(up_lanes.size, mu + 5 * mu**0.5), w_pad):
            w_up *= 2
        up_sel = np.full(w_up, up_lanes[0], np.int32)
        up_sel[: up_lanes.size] = up_lanes
    with _phase("device_pass"):
        if qs_dev is None:
            qs_dev = jnp.asarray(_pad_lanes(qs))
        if scan_l0:
            # layer-0 candidates for EVERY lane from the exact MXU scan
            # (approx-select + exact f32 rescore, sorted desc); only
            # the compact upper lanes run the graph program. Packed
            # into ONE buffer so the host fetch stays a single
            # transfer (CLAUDE.md: D2H is per-transfer, ~28ms).
            from .scan import scan_topk_exact_l2

            live = _build_live_mask(index, snap)
            ids, sims = scan_topk_exact_l2(
                snap.vecs, snap.sqnorms, live, qs_dev,
                k=fetch_c, approx=True,
            )
            if n_up_used > 0:
                up_flat = construct_upper_scores(
                    snap.vecs, snap.sqnorms, snap.adj_up,
                    snap.upper_of, snap.ep, snap.max_layer, qs_dev,
                    jnp.asarray(levels_d), jnp.asarray(up_sel),
                    ef=ef, metric=snap.metric, expand=BUILD_EXPAND,
                    fetch_c=fetch_c, fetch_l=fetch_l,
                )
            else:
                up_flat = jnp.zeros((0,), jnp.int32)
                fetch_l = 0
            flat = jnp.concatenate([
                up_flat,
                ids.ravel(),
                jax.lax.bitcast_convert_type(sims, jnp.int32).ravel(),
            ])
            cross = None
        else:
            flat, cross = construct_scores(
                snap.vecs, snap.sqnorms, snap.adj0, snap.adj_up,
                snap.upper_of,
                snap.ep, snap.max_layer, qs_dev, jnp.asarray(levels_d),
                snap.nbrvec, snap.nbrsqn, snap.qrows,
                None if up_sel is None else jnp.asarray(up_sel),
                ef=ef, metric=snap.metric, expand=BUILD_EXPAND,
                fetch_c=fetch_c, fetch_l=fetch_l,
            )
    if cross is None:
        # euclidean intra-wave sims: small host gemm (matmul form, f32)
        # beats shipping [W, W] f32 over the link, and overlaps the
        # in-flight device pass; both backends consume this same array,
        # so py/native builds stay identical
        with _phase("host_cross"):
            cross = _host_cross(qs)
    w = InFlightWave()
    w.names, w.qs, w.qs_dev, w.levels = names, qs, qs_dev, levels
    w.flat, w.cross, w.w_pad = flat, cross, w_pad
    w.fetch_c, w.fetch_l, w.n_up_used, w.l_max = (
        fetch_c, fetch_l, n_up_used, l_max
    )
    w.up_sel = up_sel
    w.w_up = None if up_sel is None else len(up_sel)
    w.scan_l0 = scan_l0
    return w


def _insert_wave(index, names, data, ef: int, qs_dev=None, prefetch=None):
    """Insert one wave; returns the prefetched next-wave device queries
    (if a ``prefetch`` callable was given) so add_batch can reuse them."""
    wave = dispatch_wave(index, names, data, ef, qs_dev=qs_dev)
    nxt = prefetch() if prefetch is not None else None
    complete_wave(index, wave)
    return nxt


def complete_wave(index, wave: InFlightWave) -> None:
    """Fetch a dispatched wave's device results and apply host surgery."""
    cfg = index.config
    names, qs, levels = wave.names, wave.qs, wave.levels
    cross, l_max = wave.cross, wave.l_max
    qs_dev = wave.qs_dev
    W = len(names)
    with _phase("fetch_results"):
        # one D2H transfer of the packed buffer, then host-side slicing
        up_ids, up_sims, l0_ids, l0_sims = unpack_scores(
            np.asarray(wave.flat),
            l_pad=wave.fetch_l,
            w_pad=wave.w_pad,
            c=wave.fetch_c,
            w_up=wave.w_up,
        )
        if wave.up_sel is not None:
            # expand the compact upper-lane block back to wave order
            # (surgery + native apply_wave index candidates by lane);
            # level-0 lanes never read their rows -- fill inert.
            n_up = wave.n_up_used
            full_i = np.full((n_up, W, wave.fetch_c), -1, np.int32)
            full_s = np.full(
                (n_up, W, wave.fetch_c), -np.inf, np.float32
            )
            # the pad repeats up_sel[0]: keep the first occurrence of
            # each lane (all copies carry identical data anyway)
            sel = wave.up_sel
            full_i[:, sel] = up_ids[:n_up]
            full_s[:, sel] = up_sims[:n_up]
            up_ids, up_sims = full_i, full_s
        else:
            up_ids = np.ascontiguousarray(up_ids[: wave.n_up_used, :W])
            up_sims = np.ascontiguousarray(up_sims[: wave.n_up_used, :W])
        l0_ids = np.ascontiguousarray(l0_ids[:W])
        l0_sims = np.ascontiguousarray(l0_sims[:W])
        if isinstance(cross, jnp.ndarray):
            cross = np.asarray(cross[:W, :W])

    # 3. host surgery, in wave order (core.rs:523-599 per insert)
    if index._native is not None:
        with _phase("host_surgery"):
            rows = np.empty(W, np.int32)
            for i in range(W):
                rows[i] = index._alloc_row(
                    names[i], qs[i], level=int(levels[i])
                )
            # the wave's vectors are already device-resident (the
            # construct queries); let the snapshot delta scatter them
            # from HBM instead of re-uploading
            # (ops/snapshot.py::_delta_snapshot)
            index._pending_wave_vecs = (rows.copy(), qs_dev[:W])
            index._native.apply_wave(
                rows, levels,
                np.ascontiguousarray(up_ids),
                np.ascontiguousarray(up_sims),
                np.ascontiguousarray(l0_ids),
                np.ascontiguousarray(l0_sims),
                np.ascontiguousarray(cross),
                l_max,
            )
            for i in range(W):
                index._finish_insert(int(rows[i]), int(levels[i]))
            index._bump(W)
        return

    rows = np.empty(W, np.int64)
    m = cfg.m
    for i in range(W):
        l = int(levels[i])
        row = index._alloc_row(names[i], qs[i], level=l)
        rows[i] = row

        # earlier wave members are candidates via exact cross sims
        for lc in range(min(l_max, l), -1, -1):
            if lc == 0:
                cids, csims = l0_ids[i], l0_sims[i]
            else:
                cids, csims = up_ids[lc - 1, i], up_sims[lc - 1, i]
            cand_ids = list(cids)
            cand_sims = list(csims)
            if i:
                mates = np.nonzero(levels[:i] >= lc)[0]
                if mates.size:
                    cand_ids.extend(rows[mates])
                    cand_sims.extend(cross[i, mates])
            # (-sim, id) order: deterministic ties, matches the native
            # core's apply_wave sort
            cand_ids = np.asarray(cand_ids)
            cand_sims = np.asarray(cand_sims)
            order = np.lexsort((cand_ids, -cand_sims))
            sel = _select_top_m(
                index,
                cand_ids[order],
                cand_sims[order],
                m,
                exclude=(row,),
            )
            index._connect_neighbors(row, sel, lc)
            m_cap = cfg.m_max_0 if lc == 0 else cfg.m_max
            for _, e_row in sel:
                _shrink_over_cap(index, e_row, lc, m_cap)

        index._finish_insert(row, l)
    index._bump(W)
