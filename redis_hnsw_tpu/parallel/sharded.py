"""Multi-chip sharded HNSW: scale index size beyond one chip's HBM.

Design (new axis -- the reference is strictly single-process, see
SURVEY.md section 2): the corpus is hash-partitioned into S independent
sub-indexes, one per device. A query batch is **replicated** to every
device; each device runs the full batched HNSW traversal (ops/search.py)
over its local shard under ``shard_map``; the per-shard top-k candidate
lists are then merged with one all-gather + top-k -- the collective rides
ICI, inserted by GSPMD from the output sharding, never hand-scheduled.

This is the TPU-native analog of distributed ANN serving (scatter-gather
over index partitions): graph traversal never crosses a shard boundary, so
there is no fine-grained cross-chip pointer chasing -- the only
communication is the [S, B, k] result merge.

Build scales the same way: inserts hash to a shard
(host-side), and each sub-graph builds independently (embarrassingly
parallel across hosts/devices).
"""

from __future__ import annotations

import zlib
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import IndexConfig
from ..errors import NodeNotFound
from ..models.hnsw import HNSWIndex, SearchResult
from ..ops.search import search_pipeline
from .mesh import DATA_AXIS, make_mesh


def _shard_of(name: str, n_shards: int) -> int:
    return zlib.crc32(name.encode("utf-8")) % n_shards


def _shard_index(mesh) -> jnp.ndarray:
    """Global shard index of the current shard_map program instance:
    row-major over the mesh axes (matches the row-major device order
    the stacked tables are laid out in)."""
    s = jnp.int32(0)
    for ax in mesh.axis_names:
        s = s * mesh.shape[ax] + jax.lax.axis_index(ax).astype(jnp.int32)
    return s


def _merge_topk_over(gids, sims, k: int, axis_name: str):
    """All-gather both operands along one mesh axis and reduce to the
    merged per-query top-k. Used innermost-axis-first, so on a
    (slice, data) mesh the ICI axis collapses each slice to one k-list
    before the DCN axis sees anything -- the cross-slice all-gather
    carries k per slice, not k per chip."""
    g = jax.lax.all_gather(gids, axis_name)  # [A, B, k]
    s = jax.lax.all_gather(sims, axis_name)
    return _merge_stacked_topk(g, s, k)


def _merge_stacked_topk(gids, sims, k: int):
    """[S, B, kk] stacked per-shard candidates -> per-query merged
    top-k: the one reduction every sharded engine's tail shares (the
    in-shard_map hierarchical merge above and the host-side [S, B, k]
    merge of the 1-D-mesh jits below)."""
    S, B, kk = gids.shape
    fs = jnp.transpose(sims, (1, 0, 2)).reshape(B, S * kk)
    fg = jnp.transpose(gids, (1, 0, 2)).reshape(B, S * kk)
    top_sims, idx = jax.lax.top_k(fs, k)
    top_gids = jnp.take_along_axis(fg, idx, axis=1)
    return top_gids, top_sims


@partial(
    jax.jit,
    static_argnames=(
        "ef", "k", "metric", "mesh", "expand", "iters", "seeds",
    ),
)
def _sharded_search_jit(
    vecs, sqn, adj0, adj_up, upper_of, eps, max_layers, counts,
    nbrvec, nbrsqn, pivot_ids, queries,
    *, ef: int, k: int, metric: str, mesh, expand: int = 1,
    iters: int | None = None, seeds: int = 0,
):
    """All shards traverse in parallel; collectives merge top-k.

    Inputs carry a leading shard axis sharded over the mesh (all axes;
    on a 1-D mesh that is the single ``data`` axis); queries are
    replicated. Per-shard ids are encoded globally as
    shard * n_pad + row before the merge. ``counts`` masks empty shards
    (their padded snapshot would otherwise report phantom row 0).
    ``pivot_ids`` [S, P] (-1 padded) + ``seeds`` > 0 seed each shard's
    beam with per-lane pivot entrypoints, exactly like the single-chip
    seeded path (ops/search.py): every shard scans its OWN pivot pool,
    so the lever composes with the shard-axis diversity the merge
    already provides.

    On a 1-D mesh the merge is the single GSPMD-inserted all-gather
    after shard_map (ICI). On a multi-axis mesh (make_mesh2d) the merge
    runs INSIDE shard_map, hierarchically, innermost axis first: the
    intra-slice (ICI) all-gather + top-k collapses each slice to one
    k-list before the cross-slice (DCN) axis is touched, cutting DCN
    bytes by the chips-per-slice factor.
    """
    n_pad = vecs.shape[1]
    axes = mesh.axis_names
    hierarchical = len(axes) > 1

    def local(
        vecs, sqn, adj0, adj_up, upper_of, eps, max_layers, counts,
        nbrvec, nbrsqn, pivot_ids, queries,
    ):
        # shard_map gives [1, ...] blocks; drop the shard axis.
        seed_ids = None
        if pivot_ids is not None and seeds > 0:
            from ..ops.scan import pm1_table, scan_topk

            pr = pivot_ids[0]
            rows = vecs[0][jnp.maximum(pr, 0)]
            ok = pr >= 0
            if metric == "hamming":
                ptable = pm1_table(rows)
                # zeros_like-of-a-tracer: no trace-time device const
                # (lowering const fetches can deadlock the tunnel --
                # ops/construct.py layer scan comment)
                psqn = jnp.zeros_like(pr, dtype=jnp.float32)
                pmetric = "hamming"
            else:
                ptable = rows
                psqn = sqn[0][jnp.maximum(pr, 0)]
                pmetric = "euclidean"
            s_local, _ = scan_topk(
                ptable, psqn, ok, queries,
                k=min(seeds, int(pr.shape[0])), metric=pmetric,
            )
            seed_ids = jnp.where(
                s_local >= 0, pr[jnp.maximum(s_local, 0)], -1
            )
        ids, sims = search_pipeline(
            vecs[0], sqn[0], adj0[0], adj_up[0], upper_of[0],
            eps[0], max_layers[0], queries,
            ef=ef, k=k, metric=metric, expand=expand, iters=iters,
            nbrvec=None if nbrvec is None else nbrvec[0],
            nbrsqn=None if nbrsqn is None else nbrsqn[0],
            seed_ids=seed_ids,
        )
        nonempty = counts[0] > 0
        s = _shard_index(mesh)
        gids = jnp.where((ids >= 0) & nonempty, s * n_pad + ids, -1)
        sims = jnp.where(nonempty, sims, -jnp.inf)
        if hierarchical:
            for ax in reversed(axes):
                gids, sims = _merge_topk_over(gids, sims, k, ax)
            return gids, sims
        return gids[None], sims[None]

    spec_sharded = P(axes)
    nv_spec = None if nbrvec is None else spec_sharded
    nsq_spec = None if nbrsqn is None else spec_sharded
    pv_spec = None if pivot_ids is None else spec_sharded
    out_spec = P() if hierarchical else spec_sharded
    # check_vma: the hierarchical tail ends in an all-gather + top_k
    # that every device computes identically, which the static
    # replication checker cannot infer through all_gather -- the
    # 1-D/2-D parity test pins the actual replication.
    gids, sims = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            spec_sharded, spec_sharded, spec_sharded, spec_sharded,
            spec_sharded, spec_sharded, spec_sharded, spec_sharded,
            nv_spec, nsq_spec, pv_spec, P(),
        ),
        out_specs=(out_spec, out_spec),
        check_vma=not hierarchical,
    )(
        vecs, sqn, adj0, adj_up, upper_of, eps, max_layers, counts,
        nbrvec, nbrsqn, pivot_ids, queries,
    )
    if hierarchical:
        return gids, sims

    # [S, B, k] -> per-query merged top-k (GSPMD inserts the
    # all-gather along the sharded axis here).
    return _merge_stacked_topk(gids, sims, k)


@partial(
    jax.jit, static_argnames=("k", "metric", "mesh", "approx"),
)
def _sharded_scan_jit(
    table, vecs, sqn, live, tscale, queries, *, k: int, metric: str,
    mesh, approx: bool = False,
):
    """MXU scan per shard + all-gather top-k merge (hierarchical,
    innermost-axis-first, on a multi-axis mesh -- see
    _sharded_search_jit).

    The sharded analog of ops/scan.py: every device scans its own
    [n_pad, D] slice (euclidean matmul form with exact rescore, or the
    int8 +-1 hamming matmul), encodes global ids as shard * n_pad +
    row, and GSPMD inserts the single ICI collective for the [S, B, k]
    merge -- identical structure to the graph engine's merge above.
    ``table`` is the selection table (== ``vecs``, or its bf16/int8
    tier copy, or the hamming +-1 expansion; ``tscale`` [S, n_pad]
    carries the int8 tier's per-row scales); euclidean rescore always
    reads the exact f32 ``vecs``. ``approx`` selects the oversampled
    approx_max_k per-chunk path (ops/scan.py).
    """
    from ..ops.scan import scan_topk, scan_topk_exact_l2

    n_pad = table.shape[1]
    axes = mesh.axis_names
    hierarchical = len(axes) > 1

    def local(table, vecs, sqn, live, tscale, queries):
        if metric == "hamming":
            ids, sims = scan_topk(
                table[0], sqn[0], live[0], queries, k=k, metric=metric,
                approx=approx,
            )
        else:
            ids, sims = scan_topk_exact_l2(
                vecs[0], sqn[0], live[0], queries, k=k, approx=approx,
                table=table[0],
                tscale=None if tscale is None else tscale[0],
            )
        s = _shard_index(mesh)
        gids = jnp.where(ids >= 0, s * n_pad + ids, -1)
        if hierarchical:
            for ax in reversed(axes):
                gids, sims = _merge_topk_over(gids, sims, k, ax)
            return gids, sims
        return gids[None], sims[None]

    spec = P(axes)
    ts_spec = None if tscale is None else spec
    out_spec = P() if hierarchical else spec
    gids, sims = shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec, spec, ts_spec, P()),
        out_specs=(out_spec, out_spec),
        check_vma=not hierarchical,  # see _sharded_search_jit
    )(table, vecs, sqn, live, tscale, queries)
    if hierarchical:
        return gids, sims
    return _merge_stacked_topk(gids, sims, k)


@partial(jax.jit, static_argnames=("k", "mesh"))
def _sharded_cert_select_jit(vecs, sqn, live, queries, *, k: int, mesh):
    """Program 1 of the split certified sharded scan: per-shard approx
    select only. Returns the stacked per-shard LOCAL selections
    ([S, B, k] matmul-form sims + local row ids, sharded over the
    mesh); no collective runs here."""
    from ..ops.scan import scan_topk

    axes = mesh.axis_names

    def local(vecs, sqn, live, queries):
        ids, sims = scan_topk(
            vecs[0], sqn[0], live[0], queries, k=k,
            metric="euclidean", approx=True,
        )
        return ids[None], sims[None]

    spec = P(axes)
    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec, P()),
        out_specs=(spec, spec),
        check_vma=not len(axes) > 1,  # see _sharded_search_jit
    )(vecs, sqn, live, queries)


@partial(jax.jit, static_argnames=("k", "mesh"))
def _sharded_cert_verify_jit(
    vecs, sqn, live, queries, ids, sims, *, k: int, mesh
):
    """Program 2: per-shard counting certificate over the program-1
    selections (ops/scan.py:_cert_verify) + exact rescore + the same
    all-gather top-k merge as :func:`_sharded_scan_jit`; per-shard
    verdicts AND across the mesh (one psum per axis). Returns one
    [B, 2k+1] int32 block (gids | sims bits | verdict column) so the
    caller pays ONE latency-bound D2H transfer, mirroring
    ops/scan.py:_cert_verify_l2."""
    from ..ops.scan import _cert_verify

    n_pad = vecs.shape[1]
    axes = mesh.axis_names
    hierarchical = len(axes) > 1

    def local(vecs, sqn, live, queries, ids, sims):
        ids, sims, ok = _cert_verify(
            vecs[0], sqn[0], live[0], queries, ids[0], sims[0]
        )
        s = _shard_index(mesh)
        gids = jnp.where(ids >= 0, s * n_pad + ids, -1)
        bad = (~ok).astype(jnp.int32)
        for ax in axes:
            bad = jax.lax.psum(bad, ax)
        ok = bad == 0
        if hierarchical:
            for ax in reversed(axes):
                gids, sims = _merge_topk_over(gids, sims, k, ax)
            return gids, sims, ok
        return gids[None], sims[None], ok

    spec = P(axes)
    out_spec = P() if hierarchical else spec
    gids, sims, ok = shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec, P(), spec, spec),
        out_specs=(out_spec, out_spec, P()),
        check_vma=not hierarchical,  # see _sharded_search_jit
    )(vecs, sqn, live, queries, ids, sims)
    if not hierarchical:
        gids, sims = _merge_stacked_topk(gids, sims, k)
    return jnp.concatenate(
        [
            gids,
            jax.lax.bitcast_convert_type(sims, jnp.int32),
            ok.astype(jnp.int32)[:, None],
        ],
        axis=1,
    )


def _sharded_scan_cert_jit(vecs, sqn, live, queries, *, k: int, mesh):
    """Certified-exact sharded scan: per-shard approx select + counting
    certificate + the same all-gather top-k merge as
    :func:`_sharded_scan_jit`.

    Returns the packed [B, 2k+1] int32 block of
    :func:`_sharded_cert_verify_jit` (gids | sims bits | verdict). The
    merged top-k of exact per-shard top-ks is the exact global top-k,
    so the verdict column (the AND of every shard's per-query verdict)
    certifies the MERGED result: 1-rows are byte-identical to the
    exact sharded scan; 0-rows must be re-served by the caller
    (ShardedHNSW.search_batch). f32 euclidean only, like the
    single-chip path.

    Host-level composition of TWO device programs (select, then
    certificate/rescore/merge), mirroring the single-chip split
    (ops/scan.py:_cert_verify_l2): each pass's chunk score tiles peak
    at ~8GB per device at ~1M rows/shard, and a fused one-program form
    OOMs a 16GB chip exactly at the per-shard scale multi-chip exists
    for (measured single-chip, artifacts/scan_tiers.json r3 run)."""
    ids, sims = _sharded_cert_select_jit(
        vecs, sqn, live, queries, k=k, mesh=mesh
    )
    return _sharded_cert_verify_jit(
        vecs, sqn, live, queries, ids, sims, k=k, mesh=mesh
    )


@partial(jax.jit, static_argnames=("k", "mesh"))
def _sharded_cert_select_hamming_jit(
    table, sqn, live, queries, *, k: int, mesh
):
    """Program 1 of the certified sharded HAMMING scan: per-shard
    approx select returning the FULL oversampled selection
    (scan_topk full_sel=True -- the deep certificate verifies tie
    classes against all of it, ops/scan.py). ``table`` is the stacked
    [S, n_pad, d_bits] +-1 expansion; no collective runs here."""
    from ..ops.scan import scan_topk

    axes = mesh.axis_names

    def local(table, sqn, live, queries):
        ids, sims = scan_topk(
            table[0], sqn[0], live[0], queries, k=k,
            metric="hamming", approx=True, full_sel=True,
        )
        return ids[None], sims[None]

    spec = P(axes)
    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec, P()),
        out_specs=(spec, spec),
        check_vma=not len(axes) > 1,  # see _sharded_search_jit
    )(table, sqn, live, queries)


@partial(jax.jit, static_argnames=("k", "mesh"))
def _sharded_cert_verify_hamming_jit(
    table, live, queries, ids, sims, *, k: int, mesh
):
    """Program 2: per-shard DEEP counting certificate over the
    program-1 selections (the hamming twin of
    :func:`_sharded_cert_verify_jit`; see ops/scan.py
    scan_certified_hamming for the tie-class argument) + the same
    all-gather top-k merge as :func:`_sharded_scan_jit`; per-shard
    verdicts AND across the mesh. Returns one [B, 2k+1] int32 block
    (gids | sims bits | verdict) -- the sharded reply keeps the
    generic two-column form rather than the single-chip word packing:
    the link is latency-bound, so reply WIDTH is nearly free while a
    second fetch is not."""
    from ..ops.scan import NEG_INF, _count_vs_threshold_hamming, pm1_table

    n_pad = table.shape[1]
    axes = mesh.axis_names
    hierarchical = len(axes) > 1

    def local(table, live, queries, ids, sims):
        sel_ids, sel_sims = ids[0], sims[0]
        t = sel_sims[:, k - 1]
        s_gt = jnp.sum(sel_sims > t[:, None], axis=1, dtype=jnp.int32)
        s_eq = jnp.sum(sel_sims == t[:, None], axis=1, dtype=jnp.int32)
        q = pm1_table(queries)
        c_gt, c_eq = _count_vs_threshold_hamming(
            table[0], live[0], q, t
        )
        # same escape logic as every certificate: c_gt == s_gt required
        # unconditionally (a short selection must not certify through
        # the empty-k-th-slot case); tie equality escaped at t == -inf
        ok = (c_gt == s_gt) & ((t == NEG_INF) | (c_eq == s_eq))
        lids, lsims = sel_ids[:, :k], sel_sims[:, :k]
        s = _shard_index(mesh)
        gids = jnp.where(lids >= 0, s * n_pad + lids, -1)
        bad = (~ok).astype(jnp.int32)
        for ax in axes:
            bad = jax.lax.psum(bad, ax)
        ok = bad == 0
        if hierarchical:
            for ax in reversed(axes):
                gids, lsims = _merge_topk_over(gids, lsims, k, ax)
            return gids, lsims, ok
        return gids[None], lsims[None], ok

    spec = P(axes)
    out_spec = P() if hierarchical else spec
    gids, sims, ok = shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, P(), spec, spec),
        out_specs=(out_spec, out_spec, P()),
        check_vma=not hierarchical,  # see _sharded_search_jit
    )(table, live, queries, ids, sims)
    if not hierarchical:
        gids, sims = _merge_stacked_topk(gids, sims, k)
    return jnp.concatenate(
        [
            gids,
            jax.lax.bitcast_convert_type(sims, jnp.int32),
            ok.astype(jnp.int32)[:, None],
        ],
        axis=1,
    )


def _sharded_scan_cert_hamming_jit(table, sqn, live, queries, *,
                                   k: int, mesh):
    """Certified-exact sharded hamming scan: the two-program host
    composition mirroring :func:`_sharded_scan_cert_jit`. A certified
    merged top-k is byte-identical to the exact sharded scan's (each
    shard's certified list IS its exact local top-k, ties ordered by
    local id = global id within a shard; the merge structure is
    shared); uncertified queries re-serve through it."""
    ids, sims = _sharded_cert_select_hamming_jit(
        table, sqn, live, queries, k=k, mesh=mesh
    )
    return _sharded_cert_verify_hamming_jit(
        table, live, queries, ids, sims, k=k, mesh=mesh
    )


class _ShardedCertRerunSink:
    """Coalesces the sharded certified scan's fallback reruns across a
    chunked serving loop -- the sharded analog of ops/scan.py
    CertRerunSink: every chunk's uncertified rows re-serve through ONE
    exact :func:`_sharded_scan_jit` program + one fetch at flush time,
    spliced back into the already-fetched replies in place. Sharded
    queries are host-resident, so the rerun block assembles host-side
    (per-item pow2 buckets, pow2 total) before the single upload."""

    def __init__(self, owner, table, vecs, sqn, live, tscale,
                 k_eff: int, ids_mode: bool) -> None:
        self._owner = owner
        self._args = (table, vecs, sqn, live, tscale)
        self._k = int(k_eff)
        self._ids_mode = ids_mode
        self._items: list = []

    def add(self, part, bad, gids, sims) -> None:
        self._items.append((part, np.asarray(bad), gids, sims))

    def flush(self) -> None:
        if not self._items:
            return
        from ..ops import scan as SC

        parts, spans, off = [], [], 0
        for part, bad, _g, _s in self._items:
            p = SC.pad_pow2(len(bad))
            sel = np.zeros(p, np.intp)
            sel[: len(bad)] = bad
            parts.append(part[sel])
            spans.append((off, len(bad)))
            off += p
        q_bad = parts[0] if len(parts) == 1 else np.concatenate(parts)
        t_pad = SC.pad_pow2(off)
        if t_pad != off:
            q_bad = np.concatenate([
                q_bad,
                np.zeros((t_pad - off, q_bad.shape[1]), q_bad.dtype),
            ])
        owner = self._owner
        qd = jax.device_put(
            jnp.asarray(q_bad), NamedSharding(owner.mesh, P())
        )
        table, vecs, sqn, live, tscale = self._args
        gb_d, sb_d = _sharded_scan_jit(
            table, vecs, sqn, live, tscale, qd, k=self._k,
            metric=owner.config.metric, mesh=owner.mesh, approx=False,
        )
        gb = np.asarray(gb_d[:off])
        # ids-reply mode never fetched sims; the shared host-rescore
        # tail recomputes them from the final gids
        sb = None if self._ids_mode else np.asarray(sb_d[:off])
        for (part, bad, gids, sims), (lo, nb) in zip(self._items, spans):
            gids[bad] = gb[lo : lo + nb]
            if sims is not None:
                sims[bad] = sb[lo : lo + nb]
        self._items.clear()


class ShardedHNSW:
    """S independent sub-indexes presented as one index."""

    def __init__(
        self,
        name: str,
        config: IndexConfig,
        n_shards: int | None = None,
        mesh=None,
    ) -> None:
        self.name = name
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh(n_shards)
        self.n_shards = self.mesh.devices.size
        base_seed = config.seed if config.seed is not None else 0
        self.shards = [
            HNSWIndex(
                f"{name}/shard{s}",
                IndexConfig(
                    dim=config.dim,
                    m=config.m,
                    ef_construction=config.ef_construction,
                    metric=config.metric,
                    capacity=config.capacity,
                    seed=base_seed + s,
                    backend=config.backend,
                ),
            )
            for s in range(self.n_shards)
        ]
        self._stacked = None
        self._stacked_epochs = None

    # -- mutation: dispatch by stable hash ------------------------------------

    def _shard(self, node: str) -> HNSWIndex:
        return self.shards[_shard_of(node, self.n_shards)]

    def add_node(self, name: str, data) -> None:
        self._shard(name).add_node(name, data)

    def delete_node(self, name: str) -> None:
        self._shard(name).delete_node(name)

    def delete_batch(self, names) -> None:
        """Bulk delete, hashed to shards; validate everywhere first so
        nothing mutates when any name is missing (per-shard
        ``delete_batch`` repairs each shard's survivors once)."""
        names = list(names)
        buckets: dict[int, list[str]] = {}
        seen: set[str] = set()
        for n in names:
            shard = self._shard(n)
            if shard._names.get(n) is None or n in seen:
                raise NodeNotFound(n)
            seen.add(n)
            buckets.setdefault(_shard_of(n, self.n_shards), []).append(n)
        for s, ns in sorted(buckets.items()):
            self.shards[s].delete_batch(ns)

    def get_node(self, name: str) -> dict:
        return self._shard(name).get_node(name)

    def add_batch(
        self, names, data, batch_size: int = 1024,
        interleave: bool = True,
    ) -> None:
        """Bulk insert, hashed to shards, with per-shard construction
        waves INTERLEAVED: every shard's device pass (ops/construct.py
        ``dispatch_wave``) is dispatched asynchronously on that shard's
        mesh device before any result is fetched, so shard s+1's device
        scoring runs while shard s's host surgery applies -- instead of
        building shards strictly one after another. Waves within a
        shard stay sequential (each wave reads the graph the previous
        one wrote), so the resulting graphs are IDENTICAL to sequential
        dispatch (tests/test_sharded.py pins this).
        ``interleave=False`` keeps the plain per-shard loop."""
        data = np.atleast_2d(np.asarray(data))
        buckets: dict[int, tuple[list, list]] = {}
        for i, n in enumerate(names):
            b = buckets.setdefault(_shard_of(n, self.n_shards), ([], []))
            b[0].append(n)
            b[1].append(i)
        if not interleave:
            for s, (ns, rows) in buckets.items():
                self.shards[s].add_batch(
                    ns, data[rows], batch_size=batch_size
                )
            return

        from ..ops.construct import complete_wave, dispatch_wave
        from ..ops.search import max_lanes_for

        devices = list(self.mesh.devices.flat)
        work: dict[int, tuple[list, np.ndarray, int]] = {}
        for s, (ns, rows) in sorted(buckets.items()):
            shard = self.shards[s]
            d = data[rows]
            if not len(ns):
                continue
            shard._capacity_hint = max(
                int(getattr(shard, "_capacity_hint", 0)),
                shard._names.high_water + len(ns),
            )
            pos = 0
            if shard.node_count == 0:
                shard.add_node(ns[0], d[0])
                pos = 1
            if pos < len(ns):
                work[s] = (ns, d, pos)

        def devctx(s):
            return jax.default_device(devices[s % len(devices)])

        inflight: dict[int, object] = {}

        def dispatch_next(s) -> bool:
            ns, d, pos = work[s]
            if pos >= len(ns):
                return False
            shard = self.shards[s]
            with devctx(s):
                cap = max_lanes_for(shard.device_snapshot().n_pad)
                hi = min(pos + min(batch_size, cap), len(ns))
                inflight[s] = dispatch_wave(
                    shard, ns[pos:hi], d[pos:hi],
                    shard.config.ef_construction,
                )
            work[s] = (ns, d, hi)
            return True

        order = sorted(work)
        for s in order:
            dispatch_next(s)
        while inflight:
            for s in order:
                if s not in inflight:
                    continue
                wave = inflight.pop(s)
                with devctx(s):
                    complete_wave(self.shards[s], wave)
                dispatch_next(s)

    @property
    def node_count(self) -> int:
        return sum(s.node_count for s in self.shards)

    def __len__(self) -> int:
        return self.node_count

    def info(self) -> dict:
        out = self.shards[0].info()
        out.update(
            name=self.name,
            node_count=self.node_count,
            max_layer=max(s.max_layer for s in self.shards),
            enterpoint=None,
            n_shards=self.n_shards,
        )
        return out

    # -- stacked device state ---------------------------------------------------

    def _stack(self):
        """Stack per-shard snapshots on a leading shard axis, sharded
        over the mesh.

        Each shard's snapshot refreshes *incrementally* (dirty-row
        deltas, ops/snapshot.py), so assembling the stacked state is
        device-side padding + stacking of already-device-resident
        arrays: no O(total index) host->device re-upload per mutation
        epoch."""
        epochs = tuple(s.epoch for s in self.shards)
        if self._stacked is not None and self._stacked_epochs == epochs:
            return self._stacked
        snaps = [s.device_snapshot() for s in self.shards]
        n_pad = max(sn.vecs.shape[0] for sn in snaps)
        deg0 = max(sn.adj0.shape[1] for sn in snaps)
        l_up = max(sn.adj_up.shape[0] for sn in snaps)
        u_pad = max(sn.adj_up.shape[1] for sn in snaps)
        deg_u = max(sn.adj_up.shape[2] for sn in snaps)

        def padded(arr, shape, fill):
            widths = [
                (0, t - s) for s, t in zip(arr.shape, shape)
            ]
            if any(w != (0, 0) for w in widths):
                arr = jnp.pad(arr, widths, constant_values=fill)
            return arr

        width = snaps[0].vecs.shape[1]
        vecs = jnp.stack(
            [padded(sn.vecs, (n_pad, width), 0) for sn in snaps]
        )
        sqn = jnp.stack([padded(sn.sqnorms, (n_pad,), 0) for sn in snaps])
        adj0 = jnp.stack(
            [padded(sn.adj0, (n_pad, deg0), -1) for sn in snaps]
        )
        adj_up = jnp.stack(
            [padded(sn.adj_up, (l_up, u_pad, deg_u), -1) for sn in snaps]
        )
        upper_of = jnp.stack(
            [padded(sn.upper_of, (n_pad,), -1) for sn in snaps]
        )
        eps = np.array([int(sn.ep) for sn in snaps], np.int32)
        mls = np.array([int(sn.max_layer) for sn in snaps], np.int32)
        counts = np.array(
            [s.node_count for s in self.shards], np.int32
        )

        # Blocked neighbor-vector tables ride along when every shard has
        # one of the same dtype (each chip holds only its own slice
        # under the data sharding, so per-chip HBM cost matches the
        # single-chip case).
        nbrvec = nbrsqn = None
        if all(sn.nbrvec is not None for sn in snaps) and (
            len({sn.nbrvec.dtype for sn in snaps}) == 1
        ):
            nbrvec = jnp.stack([
                padded(sn.nbrvec, (n_pad, deg0, sn.nbrvec.shape[2]), 0)
                for sn in snaps
            ])
            if snaps[0].nbrsqn is not None:
                # f32/f16 tiers: [n, deg0]; int8 tier: [n, 2*deg0] meta
                meta_w = max(sn.nbrsqn.shape[1] for sn in snaps)
                nbrsqn = jnp.stack([
                    padded(sn.nbrsqn, (n_pad, meta_w), 0) for sn in snaps
                ])

        sh = NamedSharding(self.mesh, P(self.mesh.axis_names))
        put = lambda x, s: jax.device_put(jnp.asarray(x), s)
        self._stacked = (
            put(vecs, sh), put(sqn, sh), put(adj0, sh), put(adj_up, sh),
            put(upper_of, sh), put(eps, sh), put(mls, sh), put(counts, sh),
            None if nbrvec is None else put(nbrvec, sh),
            None if nbrsqn is None else put(nbrsqn, sh),
        )
        self._stacked_epochs = epochs
        self._stacked_npad = n_pad
        return self._stacked

    def _scan_stack(self):
        """Stacked per-shard scan-engine state:
        (table, vecs, sqn, live, tscale), sharded over the mesh --
        ``table`` the selection table (f32 vecs / bf16 or int8 tier
        copy / hamming +-1 expansion), ``vecs`` the exact rescore
        table, ``tscale`` the int8 tier's per-row scales (None
        otherwise). Cached per (shard-epoch tuple, scan dtype)."""
        from ..ops.scan import scan_dtype

        epochs = (tuple(s.epoch for s in self.shards), scan_dtype())
        cached = getattr(self, "_scan_stacked", None)
        if cached is not None and self._scan_stacked_epochs == epochs:
            return cached
        snaps = [s.device_snapshot() for s in self.shards]
        n_pad = max(sn.vecs.shape[0] for sn in snaps)
        width = snaps[0].vecs.shape[1]

        def padded(arr, shape, fill):
            widths = [(0, t - s) for s, t in zip(arr.shape, shape)]
            if any(w != (0, 0) for w in widths):
                arr = jnp.pad(arr, widths, constant_values=fill)
            return arr

        vecs = jnp.stack(
            [padded(sn.vecs, (n_pad, width), 0) for sn in snaps]
        )
        sqn = jnp.stack(
            [padded(sn.sqnorms, (n_pad,), 0) for sn in snaps]
        )
        live_np = np.zeros((self.n_shards, n_pad), bool)
        for si, shard in enumerate(self.shards):
            h = min(len(shard._levels), n_pad)
            live_np[si, :h] = shard._levels[:h] >= 0
        tscale = None
        if self.config.metric == "hamming":
            from ..ops.scan import pm1_table

            table = jax.jit(
                lambda v: pm1_table(
                    v.reshape(-1, width)
                ).reshape(v.shape[0], v.shape[1], -1)
            )(vecs)
        elif epochs[1] == "bf16":
            table = jax.jit(lambda v: v.astype(jnp.bfloat16))(vecs)
        elif epochs[1] == "int8":
            from ..ops.scan import _to_int8

            table, tscale = jax.jit(
                lambda v: _to_int8(v.reshape(-1, width))
            )(vecs)
            table = table.reshape(vecs.shape)
            tscale = tscale.reshape(vecs.shape[0], vecs.shape[1])
        else:
            table = vecs
        sh = NamedSharding(self.mesh, P(self.mesh.axis_names))
        put = lambda x: jax.device_put(jnp.asarray(x), sh)
        vecs_dev = put(vecs)
        # preserve table-is-vecs identity in the f32 tier: the cert
        # path (search_batch) keys exactness off it
        table_dev = vecs_dev if table is vecs else put(table)
        out = (
            table_dev, vecs_dev, put(sqn), put(jnp.asarray(live_np)),
            None if tscale is None else put(tscale),
        )
        self._scan_stacked = out
        self._scan_stacked_epochs = epochs
        self._scan_npad = n_pad
        return out

    def _pivot_stack(self):
        """Stacked per-shard pivot pools [S, P] (-1 padded), sharded
        over the mesh; cached per shard-epoch tuple. Each shard's pool
        is a strided sample of its live rows, mirroring the single-chip
        _pivot_pool (ops/search.py)."""
        from ..ops.search import PIVOT_POOL

        epochs = tuple(s.epoch for s in self.shards)
        cached = getattr(self, "_pivots", None)
        if cached is not None and self._pivots_epochs == epochs:
            return cached
        n_pad = self._stacked_npad
        out = np.full((self.n_shards, PIVOT_POOL), -1, np.int32)
        for si, shard in enumerate(self.shards):
            h = min(len(shard._levels), n_pad)
            live_rows = np.flatnonzero(shard._levels[:h] >= 0)
            if len(live_rows) == 0:
                continue
            p = min(PIVOT_POOL, len(live_rows))
            pick = np.unique(
                live_rows[
                    np.linspace(0, len(live_rows) - 1, p).astype(np.int64)
                ]
            ).astype(np.int32)
            out[si, : len(pick)] = pick
        sh = NamedSharding(self.mesh, P(self.mesh.axis_names))
        self._pivots = jax.device_put(jnp.asarray(out), sh)
        self._pivots_epochs = epochs
        return self._pivots

    # -- search -----------------------------------------------------------------

    def search_knn(
        self, data, k: int, ef_search: int | None = None
    ) -> list[SearchResult]:
        """Single-query host search across all shards (scatter-gather).

        Each shard runs the reference-exact ``search_knn``
        (models/hnsw.py); the per-shard top-k merge sorts by
        (-sim, name) -- shard-local row ids are meaningless globally, so
        the name is the deterministic tiebreak."""
        per_shard = [
            s.search_knn(data, k, ef_search=ef_search) for s in self.shards
        ]
        merged = [r for rs in per_shard for r in rs]
        merged.sort(key=lambda r: (-r.sim, r.name))
        return merged[:k]

    def search_batch(
        self, queries, k: int, ef_search: int | None = None,
        expand: int = 1, iters: int | None = None, engine: str = "auto",
        reply: str = "objects", seeds: int = 0,
        recall_target: float | None = None, host_qs=None,
    ) -> list[list[SearchResult]]:
        """Batched search across all shards. ``engine`` routes like the
        single-chip path (ops/search.py SCAN_MAX_ROWS, judged per
        shard): "auto" picks the per-shard exact MXU scan below the
        crossover, the per-shard graph beam above it; "scan-approx"
        runs the oversampled approx_max_k scan per shard. All merge
        with the same single all-gather top-k, and the bf16 scan tier
        (REDIS_HNSW_TPU_SCAN_DTYPE) applies per shard exactly as on
        one chip. The f32 exact scan rides the certified-exact select
        when engaged (ops/scan.py cert_enabled, judged on the per-shard
        padded rows): per-shard certificates AND across the mesh, and
        uncertified queries re-serve through the exact sharded scan --
        results stay byte-identical to it. The exact HAMMING scan rides
        the deep-certificate twin the same way
        (_sharded_scan_cert_hamming_jit; int8-rate dim gate). ``reply="columnar"`` returns (names, sims) arrays
        like the single-chip path. ``seeds`` > 0 seeds each shard's
        graph beam with that many per-lane pivot entrypoints (scan
        engines ignore it, matching single-chip). ``recall_target``
        applies the single-chip guarantee rule per shard
        (ops/search.py resolve_engine). ``host_qs`` is accepted for
        API parity with the single-chip path but unused: sharded
        queries are always normalized host-side, so the ids-only reply
        mode (REDIS_HNSW_TPU_REPLY=ids) needs no mirror here."""
        from ..ops.scan import reply_ids_engaged as SC_reply_ids
        from ..ops.search import SCAN_MAX_ROWS, resolve_engine

        engine = resolve_engine(engine, recall_target)
        qs = np.atleast_2d(
            np.asarray(queries, dtype=self.shards[0]._vectors.dtype)
        )
        n_q = qs.shape[0]
        if self.node_count == 0 or n_q == 0:
            if reply == "columnar":
                return (
                    np.full((n_q, int(k)), None, object),
                    np.full((n_q, int(k)), -np.inf, np.float32),
                )
            return [[] for _ in range(n_q)]
        ef = (
            self.config.ef_construction
            if ef_search is None
            else int(ef_search)
        )
        from ..ops import scan as SC

        shard_pad = max(
            s.device_snapshot().n_pad for s in self.shards
        )
        use_scan = engine in ("scan", "scan-approx") or (
            engine == "auto"
            and shard_pad <= SCAN_MAX_ROWS.get(self.config.metric, 0)
        )
        ids_mode = (
            self.config.metric == "euclidean"
            and SC_reply_ids(self.config.dim)
        )
        rerun_sink = None
        use_cert = False
        if use_scan:
            table, vecs, sqn, live, tscale = self._scan_stack()
            n_pad = self._scan_npad
            k_eff = min(int(k), n_pad)
            use_cert = engine != "scan-approx" and tscale is None and (
                (
                    self.config.metric == "euclidean"
                    and table is vecs
                    and SC.cert_enabled(n_pad, int(vecs.shape[-1]))
                )
                or (
                    self.config.metric == "hamming"
                    # dim gate at d_bits/2: int8 count matmul runs ~2x
                    # the f32 rate CERT_MAX_DIM was measured at
                    and SC.cert_enabled(n_pad, int(table.shape[-1]) // 2)
                )
            )
            if use_cert:
                rerun_sink = _ShardedCertRerunSink(
                    self, table, vecs, sqn, live, tscale, k_eff,
                    ids_mode,
                )
        else:
            stacked = self._stack()
            n_pad = self._stacked_npad
            k_eff = int(k)
            ef_eff = max(ef, 1)
            seeds_eff = (
                min(int(seeds), ef_eff - 1) if ef_eff > 1 else 0
            )
            pivots = self._pivot_stack() if seeds_eff > 0 else None

        def dispatch(part):
            """Enqueue one <=2048-lane chunk (pow2-padded) as one
            shard_map program; the returned finish() pays the fetch.
            Mirrors the single-chip dispatch/finish split
            (ops/scan.py scan_dispatch)."""
            pn = part.shape[0]
            p_pad = SC.pad_pow2(pn)
            if p_pad != pn:
                part_p = np.concatenate([
                    part,
                    np.zeros((p_pad - pn, part.shape[1]), part.dtype),
                ])
            else:
                part_p = part
            pd = jax.device_put(
                jnp.asarray(part_p), NamedSharding(self.mesh, P())
            )
            if use_cert:
                # certified-exact per shard (ops/scan.py): byte-
                # identical to the exact sharded scan; uncertified
                # queries re-served through the coalesced sink. ONE
                # packed D2H (gids | sims bits | verdict): the link is
                # latency-bound, so separate gid/sim/ok fetches each
                # cost a full round trip. In ids-reply mode the sims
                # columns are ignored host-side (rescored in the
                # shared tail below).
                if self.config.metric == "hamming":
                    block = _sharded_scan_cert_hamming_jit(
                        table, sqn, live, pd, k=k_eff, mesh=self.mesh
                    )
                else:
                    block = _sharded_scan_cert_jit(
                        vecs, sqn, live, pd, k=k_eff, mesh=self.mesh
                    )
                get_block = SC.fetch_handle(block[:pn])

                def fin_cert():
                    # writable host copy (fetch_handle guarantees it):
                    # the deferred fallback splices rows in at flush
                    blk = get_block()
                    gids_c = blk[:, :k_eff]
                    sims_c = None if ids_mode else np.ascontiguousarray(
                        blk[:, k_eff:2 * k_eff]
                    ).view(np.float32)
                    okh = blk[:, -1] != 0
                    SC.CERT_STATS["batches"] += 1
                    SC.CERT_STATS["queries"] += pn
                    if not okh.all():
                        bad = np.flatnonzero(~okh)
                        SC.CERT_STATS["fallback_queries"] += len(bad)
                        if len(bad) * 4 > pn:
                            # tie-heavy / adversarial chunk: re-serve
                            # it whole (same rule as certified_topk_l2)
                            bad = np.arange(pn)
                        rerun_sink.add(part_p, bad, gids_c, sims_c)
                    return gids_c, sims_c

                return fin_cert
            if use_scan:
                gids_d, sims_d = _sharded_scan_jit(
                    table, vecs, sqn, live, tscale, pd,
                    k=k_eff, metric=self.config.metric, mesh=self.mesh,
                    approx=engine == "scan-approx",
                )
            else:
                gids_d, sims_d = _sharded_search_jit(
                    *stacked, pivots, pd,
                    ef=ef_eff, k=k_eff, metric=self.config.metric,
                    mesh=self.mesh, expand=expand, iters=iters,
                    seeds=seeds_eff,
                )

            get_gids = SC.fetch_handle(gids_d[:pn])
            # ids-reply mode skips the sims fetch entirely: the
            # shared tail rescores host-side from the gids
            get_sims = None if ids_mode else SC.fetch_handle(sims_d[:pn])

            def fin():
                return get_gids(), None if get_sims is None else get_sims()

            return fin

        # Chunked pipelined drain, mirroring the single-chip loop
        # (ops/scan.py drain_pipelined): up to pipeline_depth() chunks
        # stay dispatched-but-unfetched so each chunk's fetch round
        # trip hides behind the following chunks' device compute, and
        # the certified fallback reruns coalesce into one program.
        from ..ops.search import max_lanes_for

        chunk = max_lanes_for(shard_pad)  # single-chip lane cap (2048)
        g_parts, s_parts = SC.drain_pipelined(
            ((qs[lo : lo + chunk],) for lo in range(0, n_q, chunk)),
            dispatch, sink=rerun_sink,
        )
        gids = g_parts[0] if len(g_parts) == 1 else np.concatenate(g_parts)
        sims = None
        if s_parts[0] is not None:
            sims = (
                s_parts[0] if len(s_parts) == 1
                else np.concatenate(s_parts)
            )
        if ids_mode:
            # ids-only reply (ops/scan.py reply_ids_only): transfer the
            # merged [B, k] gid block alone and recompute the sims in
            # exact direct form from the per-shard HOST row tables --
            # sharded queries are always host-resident, so the mirror
            # is free. Invalid slots carry gid -1 in every engine's
            # local encoding; the (-sim, id) order is re-imposed
            # host-side (sort_reply) since host accumulation can differ
            # from the device's by ~1 ulp.
            from ..ops.scan import neg_sq_rows, sort_reply

            gids = np.asarray(gids[:n_q])
            valid = gids >= 0
            v = np.zeros((*gids.shape, qs.shape[1]), np.float32)
            shard_idx = np.where(valid, gids, 0) // n_pad
            rows = np.where(valid, gids, 0) % n_pad
            for si, shard in enumerate(self.shards):
                m = valid & (shard_idx == si)
                if m.any():
                    v[m] = shard._vectors[rows[m]]
            sims = np.where(
                valid,
                neg_sq_rows(v, qs[:n_q].astype(np.float32)),
                -np.inf,
            ).astype(np.float32)
            gids, sims = sort_reply(gids, sims)
        else:
            gids = np.asarray(gids[:n_q])
            sims = np.asarray(sims[:n_q])
        if reply == "columnar":
            out_names = np.full(gids.shape, None, object)
            sims_np = np.asarray(sims, np.float32)
            valid = (gids >= 0) & ~np.isneginf(sims_np)
            if valid.any():
                shard_idx = gids // n_pad
                rows = gids % n_pad
                for si, shard in enumerate(self.shards):
                    m = valid & (shard_idx == si)
                    if m.any():
                        out_names[m] = shard._names.names_array()[rows[m]]
            return out_names, np.where(
                valid, sims_np, np.float32(-np.inf)
            )
        if reply != "objects":
            raise ValueError(f"unknown reply mode {reply!r}")
        out = []
        for b in range(n_q):
            res = []
            for col in range(gids.shape[1]):
                g = int(gids[b, col])
                s = float(sims[b, col])
                if g < 0 or s == float("-inf"):
                    continue
                shard = self.shards[g // n_pad]
                row = g % n_pad
                res.append(
                    SearchResult(
                        sim=s, name=shard._names.name(row), data=None
                    )
                )
            out.append(res)
        return out

    def enable_autosave(
        self, directory: str, every_ops: int = 8192,
        compress: bool = False,
    ) -> None:
        """Per-shard bounded-loss autosave into ``directory`` (one npz
        per shard, same layout as :meth:`save`; restore with
        :meth:`restore` after writing a manifest via :meth:`save`, or
        load shards individually)."""
        import os

        os.makedirs(directory, exist_ok=True)
        for s, shard in enumerate(self.shards):
            shard.enable_autosave(
                os.path.join(directory, f"shard{s}.npz"),
                every_ops=every_ops, compress=compress,
            )

    def disable_autosave(self) -> None:
        for shard in self.shards:
            shard.disable_autosave()

    # -- persistence --------------------------------------------------------

    def save(self, directory: str, compress: bool = True) -> None:
        """Checkpoint the sharded index: one npz per shard plus a
        manifest (the distributed analog of the single-index checkpoint,
        utils/checkpoint.py)."""
        import json
        import os

        from ..utils.checkpoint import save_index

        os.makedirs(directory, exist_ok=True)
        for s, shard in enumerate(self.shards):
            save_index(
                shard,
                os.path.join(directory, f"shard{s}.npz"),
                compress=compress,
            )
        manifest = {
            "format_version": 1,
            "name": self.name,
            "n_shards": self.n_shards,
            "config": {
                "dim": self.config.dim,
                "m": self.config.m,
                "ef_construction": self.config.ef_construction,
                "metric": self.config.metric,
                "capacity": self.config.capacity,
                "seed": self.config.seed,
            },
        }
        tmp = os.path.join(directory, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(directory, "manifest.json"))

    @classmethod
    def restore(cls, directory: str, mesh=None) -> "ShardedHNSW":
        """Restore a sharded index saved by :meth:`save`. The mesh may
        differ in device order but must have the same size (shard
        placement is by position)."""
        import json
        import os

        from ..errors import HNSWError
        from ..utils.checkpoint import load_index

        with open(os.path.join(directory, "manifest.json")) as f:
            manifest = json.load(f)
        if manifest.get("format_version") != 1:
            raise HNSWError(
                "cannot load sharded checkpoint format version "
                f"{manifest.get('format_version')} (supported: 1)"
            )
        cfg = IndexConfig(**manifest["config"])
        out = cls(
            manifest["name"], cfg,
            n_shards=manifest["n_shards"], mesh=mesh,
        )
        if out.n_shards != manifest["n_shards"]:
            raise HNSWError(
                f"checkpoint has {manifest['n_shards']} shards but the "
                f"mesh provides {out.n_shards} devices"
            )
        out.shards = [
            load_index(os.path.join(directory, f"shard{s}.npz"))
            for s in range(out.n_shards)
        ]
        return out
