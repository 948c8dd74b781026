"""Dense device-resident snapshots of an index.

The bridge between the host-authoritative graph (models/hnsw.py or the
native C++ core) and the batched TPU engines: the pointer graph is
flattened into fixed-shape int32 adjacency tables + the f32 vector table
in HBM and reused across queries. This replaces the reference's
``make_index`` 3-pass pointer-graph rehydration (src/lib.rs:252-315) with
O(1) dense array uploads -- there is nothing to rewire when rows are ids.

Layout:
* ``vecs [N_pad, D]`` + ``sqnorms [N_pad]`` -- vector table (f32) or packed
  bits (uint32, Hamming).
* ``adj0 [N_pad, deg0]`` -- layer-0 adjacency, -1 padded
  (deg0 >= m_max_0 = 2m, core.rs:336).
* ``adj_up [L_up, U_pad, degU]`` -- upper-layer adjacency over a *compact*
  slot space holding only the ~N/m rows whose level >= 1. Slots are
  assigned stably at insertion (models/hnsw.py ``_upper_slot``) so
  incremental updates never reshuffle the table.
* ``upper_of [N_pad]`` -- global row -> compact upper slot (-1 if level 0).
* ``ep``, ``max_layer`` -- dynamic scalars (no recompile when they change).

Refresh strategy: a full rebuild re-uploads everything (O(N) host->device
bytes -- ~3MB/s through the dev tunnel, GB/s on production hosts). When
the padded shapes are unchanged, ``build_snapshot(prev=...)`` applies a
**dirty-row delta** instead: only rows whose adjacency or vector changed
since the last snapshot are scattered into the previous device arrays
(both graph backends track dirty rows). A streaming insert+query workload
therefore pays per-wave upload proportional to the wave, not the index.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _round_pow2(x: int, lo: int) -> int:
    """Next power of two >= max(x, lo): geometric snapshot growth keeps
    jitted engine shapes stable across mutations (recompiles only on
    doubling), at <=2x HBM overhead on the padded tables."""
    p = lo
    while p < x:
        p *= 2
    return p


@dataclasses.dataclass(frozen=True)
class Snapshot:
    """Immutable device view of one index epoch.

    Lifetime contract: the incremental refresh (``_apply_delta``)
    DONATES the previous snapshot's buffers into the update program, so
    a Snapshot obtained from ``device_snapshot()`` is invalidated (its
    arrays raise "array has been deleted") by the next mutation +
    snapshot of the same index. Do not cache a Snapshot across writes;
    re-fetch via ``device_snapshot()`` each time (it is epoch-cached and
    free when nothing changed)."""

    vecs: jnp.ndarray       # [N_pad, D] f32 (or uint32 packed for hamming)
    sqnorms: jnp.ndarray    # [N_pad] f32 (zeros for hamming)
    adj0: jnp.ndarray       # [N_pad, deg0] int32, -1 padded
    adj_up: jnp.ndarray     # [L_up, U_pad, degU] int32, -1 padded
    upper_of: jnp.ndarray   # [N_pad] int32, -1 if level < 1
    ep: jnp.ndarray         # [] int32
    max_layer: jnp.ndarray  # [] int32
    metric: str             # static
    n_pad: int              # static row capacity
    # Blocked-gather acceleration (may be None when over HBM budget):
    # nbrvec[x] = vecs[adj0[x]] stored contiguously, so the beam gathers
    # [B, E] blocks instead of [B, E*F] rows (gathers are per-row
    # issue-bound on TPU -- see ops/distance.py block_neg_sq_l2).
    nbrvec: jnp.ndarray | None = None   # [N_pad, deg0, D] f32/f16/int8/uint32
    # f32/f16 tiers: [N_pad, deg0] f32 neighbor sqnorms. int8 tier:
    # [N_pad, 2*deg0] f32 meta = per-neighbor (dequant scale ++ exact
    # sqnorm) -- flat, because a [N, F, 2] trailing dim tile-pads 2->128.
    nbrsqn: jnp.ndarray | None = None
    # Quantized row table for the byte-bound high-D regime: int8 rows
    # with the f32 (scale, exact sqnorm) pair bitcast into the last 8
    # bytes (see ops/distance.py frontier_int8_neg_sq_l2). Built when
    # euclidean and D >= QUANT_MIN_DIM and nbrvec is absent.
    qrows: jnp.ndarray | None = None    # [N_pad, D+8] int8
    # Row high-water mark AT BUILD TIME: rows >= live_hw were allocated
    # after this snapshot and hold no data here. Bounded-staleness
    # serving (device_snapshot(max_staleness=...)) masks them dead so a
    # stale view never scores uninitialized vectors.
    live_hw: int = 0

    @property
    def arrays(self):
        return (
            self.vecs,
            self.sqnorms,
            self.adj0,
            self.adj_up,
            self.upper_of,
            self.ep,
            self.max_layer,
        )


def _shapes(index):
    """Padded table shapes for the index's current state + hints."""
    cfg = index.config
    hint = int(getattr(index, "_capacity_hint", 0))
    n_rows = max(index._names.high_water, 1)
    if hint >= n_rows and hint > 0:
        # Hint-exact rows: bulk builds and presized configs declare the
        # final size up front, so pad to the hint rounded to the 128
        # lane width instead of the next power of two -- pow2 padding
        # wasted up to 2x HBM (a ~1.2-1.9M build paid full 2^21-row
        # tables and OOMed at compile on the int8 tier that fits ~1.9M
        # real rows). Shapes stay stable for the whole build because
        # the hint is fixed; the sticky-dims no-shrink rule below still
        # guards against flip-flops.
        n_pad = _round_up(max(n_rows, hint), 128)
    else:
        # no (or stale) hint: geometric growth keeps incremental
        # add_node from recompiling every 128 rows
        n_pad = _round_pow2(n_rows, 128)

    native = index._native
    max0 = cfg.m_max_0
    max_up = cfg.m_max
    # Degree can transiently exceed the caps after delete repair (the
    # reference's repair adds extension links without a shrink pass,
    # core.rs:824-863) -- size columns to the observed max.
    if native is not None:
        max0 = max(max0, native.max_degree(0, n_rows))
        for lc in range(1, max(int(index.max_layer), 1) + 1):
            max_up = max(max_up, native.max_degree(lc, n_rows))
    else:
        for row in range(n_rows):
            lists = index._neighbors[row]
            if lists is None:
                continue
            if lists and len(lists[0]) > max0:
                max0 = len(lists[0])
            for lc in range(1, len(lists)):
                if len(lists[lc]) > max_up:
                    max_up = len(lists[lc])
    deg0 = _round_up(max0, 8)
    deg_up = _round_up(max_up, 8)

    # Upper stack: presize depth to the expected max level for ``hint``
    # rows (P(level >= L) ~ m^-L) and width to the expected upper count
    # (~hint/m) so neither growth recompiles mid-build.
    l_hint = 0
    u_hint = 1
    if hint > 1:
        l_hint = int(math.ceil(math.log(hint) / math.log(max(cfg.m, 2)))) + 1
        u_hint = int(1.2 * hint / max(cfg.m, 2)) + 8
    l_up = max(int(index.max_layer), 1, l_hint)
    u_pad = _round_pow2(max(index._upper_next, u_hint), 8)
    return n_rows, n_pad, deg0, deg_up, l_up, u_pad


def _row_adj(index, rows, lc, deg):
    """Dense [-1 padded] adjacency block for given rows at one layer."""
    native = index._native
    if native is not None:
        return native.export_layer(lc, rows, len(rows), deg)
    out = np.full((len(rows), deg), -1, np.int32)
    for i, row in enumerate(rows):
        lists = index._neighbors[row]
        if lists and lc < len(lists) and lists[lc]:
            out[i, : len(lists[lc])] = lists[lc]
    return out


def _phys_block_bytes(n, f, d, dtype) -> int:
    """PHYSICAL HBM bytes of an [n, f, d] array under TPU tiling: the
    minor dim pads to 128 lanes and the second-minor to the dtype's
    sublane count. Budgeting with logical bytes undercounts badly for
    narrow minors -- the int8 [N, 32, 136] packed layout physically
    occupied [N, 32, 256] (1.9x) and OOMed a 1.9M build; a hamming
    [N, 32, 8]-word table would physically be [N, 32, 128] (16x)."""
    dt = jnp.dtype(dtype)
    sublane = {1: 32, 2: 16, 4: 8}[dt.itemsize]
    return n * _round_up(f, sublane) * _round_up(d, 128) * dt.itemsize


def _nbrvec_dtype(metric, vec_dtype, n_pad, deg0, width):
    """Element type for the neighbor-vector blocks, or None when even the
    compressed table exceeds the HBM budget (row-gather fallback).

    Budget default 9GiB of PHYSICAL (tile-padded) bytes: a 1M x 128d
    index at deg0=32 fits in f16 (8.4GiB) beside the 0.5GiB vector
    table on a 16GiB v5e; int8 carries ~1.9M rows. Override via
    REDIS_HNSW_TPU_NBRVEC_BYTES.
    """
    import os

    forced = os.environ.get("REDIS_HNSW_TPU_NBRVEC_DTYPE")
    if forced:
        if forced == "off":
            return None
        if metric == "hamming":
            return vec_dtype
        return {
            "f32": jnp.float32, "f16": jnp.float16,
            "bf16": jnp.bfloat16, "i8": jnp.int8,
        }[forced]
    budget = int(
        os.environ.get("REDIS_HNSW_TPU_NBRVEC_BYTES", 9 * 2**30)
    )
    if metric == "hamming":
        phys = _phys_block_bytes(n_pad, deg0, width, vec_dtype)
        return vec_dtype if phys <= budget else None
    if _phys_block_bytes(n_pad, deg0, width, jnp.float32) <= budget:
        return jnp.float32
    if _phys_block_bytes(n_pad, deg0, width, jnp.float16) <= budget:
        # f16, not bf16: coarse sims only steer the beam, but within
        # dense clusters neighbor-sim gaps (~1) are smaller than bf16's
        # 8-bit-mantissa error on sims of magnitude ~200; f16's 11-bit
        # mantissa keeps the ordering (measured at 1M clustered).
        return jnp.float16
    if (
        _phys_block_bytes(n_pad, deg0, width, jnp.int8)
        + n_pad * _round_up(2 * deg0, 128) * 4  # [N, 2F] f32 meta
        <= budget
    ):
        # int8 blocks [N, F, D] (tile-exact at D=128) + a separate
        # [N, 2F] f32 meta table carrying each neighbor's (dequant
        # scale, exact sqnorm): ~2x smaller than f16, so one chip holds
        # ~1.9M rows. At 1M it measures ~f16 speed (4926 vs 5117 qps at
        # ef=512) with recall 0.969 vs 0.973 -- a capacity tier.
        return jnp.int8
    return None


@partial(jax.jit, static_argnames=("dtype",))
def _narrow_rows(vecs, sq, *, dtype):
    """Narrowed per-row table, materialized as its OWN program output.
    Running this in the same program as the block gather lets XLA fuse
    the conversion INTO the gather, which materializes both the
    gathered narrow blocks AND a full-width gathered intermediate
    (observed: the fused int8 build OOMed at 1.9M rows; split into two
    dispatches it peaks at the narrow table + the one gather output)."""
    if dtype == jnp.int8:
        x8, scale = _quantize_split(vecs)
        return x8
    return vecs.astype(dtype)


@jax.jit
def _gather_blocks(rows, adj0):
    return rows[jnp.maximum(adj0, 0)]


@jax.jit
def _gather_scalars(sq, adj0):
    return sq[jnp.maximum(adj0, 0)]


@jax.jit
def _gather_meta(vecs, sq, adj0):
    """[N, 2F] f32 per-neighbor meta for the int8 tier: columns [:F]
    are dequant scales, [F:] exact sqnorms. Flat (not [N, F, 2]): a
    trailing dim of 2 would tile-pad to 128 lanes -- 64x the bytes."""
    safe = jnp.maximum(adj0, 0)
    amax = jnp.max(jnp.abs(vecs), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    return jnp.concatenate([scale[safe], sq[safe]], axis=1)


def _build_nbrvec(vecs, sq, adj0, *, dtype):
    """Materialize the blocked neighbor-vector table on device (no host
    bytes: one [N*deg0]-row gather from the already-uploaded tables).

    Cast/quantize BEFORE gathering -- in a separate dispatch (see
    _narrow_rows): gather-then-convert materializes the full-width
    table ([1M, 32, 128] f32 = 16GiB transient -> OOM). The int8 tier
    gathers bare [N, F, D] int8 blocks (tile-exact at D=128) plus the
    [N, 2F] f32 scale/sqnorm meta table in ``nbrsqn``
    (ops/distance.py block_int8_neg_sq_l2)."""
    narrow = _narrow_rows(vecs, sq, dtype=dtype)
    blocks = _gather_blocks(narrow, adj0)
    if dtype == jnp.int8:
        return blocks, _gather_meta(vecs, sq, adj0)
    return blocks, _gather_scalars(sq, adj0)


# High-D euclidean frontiers are HBM-byte-bound (not issue-bound), so
# above this row width the snapshot carries an int8 row table for beam
# routing. REDIS_HNSW_TPU_QUANT=0 disables; =1 forces at any width.
QUANT_MIN_DIM = 512


def _use_quant(metric: str, width: int) -> bool:
    """High-D euclidean picks the int8 row table FIRST: above
    QUANT_MIN_DIM the frontier is byte-bound, where blocked f32 gathers
    move the same bytes (no win) and int8 moves 4x fewer (measured
    1.5x end-to-end at 200k x 960d)."""
    import os

    flag = os.environ.get("REDIS_HNSW_TPU_QUANT")
    if flag == "0":
        return False
    if metric != "euclidean":
        return False
    return flag == "1" or width >= QUANT_MIN_DIM


@jax.jit
def _quantize_split(vecs):
    """Per-row symmetric int8 quantization, (x8, scale) as separate
    arrays (the blocked int8 tier keeps meta out of the block rows --
    a D+8 trailing dim tile-pads to D+128 and nearly doubles HBM)."""
    amax = jnp.max(jnp.abs(vecs), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    x8 = jnp.clip(
        jnp.round(vecs / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return x8, scale


@jax.jit
def _quantize_rows(vecs, sq):
    """Per-row symmetric int8 quantization packed as [..., D+8] int8:
    x8 columns, then the f32 (dequant scale, exact sqnorm) pair bitcast
    to bytes -- one gather then carries vector + scalars (a separate
    scalar gather is per-row issue-bound; see ops/distance.py).
    Works on any leading shape (rows or neighbor blocks)."""
    amax = jnp.max(jnp.abs(vecs), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    x8 = jnp.clip(
        jnp.round(vecs / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    meta = jnp.stack([scale, sq.astype(jnp.float32)], axis=-1)
    meta8 = jax.lax.bitcast_convert_type(meta, jnp.int8)
    return jnp.concatenate(
        [x8, meta8.reshape(*meta8.shape[:-2], 8)], axis=-1
    )


def _sqnorms_np(index, vec_rows):
    if index.config.metric == "hamming":
        return np.zeros(len(vec_rows), np.float32)
    return np.einsum("nd,nd->n", vec_rows, vec_rows).astype(np.float32)


def build_snapshot(index, prev: Snapshot | None = None) -> Snapshot:
    """Flatten a host HNSWIndex into a Snapshot (uploads to device).

    With ``prev`` whose shapes still fit, only dirty rows are scattered
    into the previous device arrays (delta refresh); otherwise a full
    rebuild uploads everything.
    """
    cfg = index.config
    n_rows, n_pad, deg0, deg_up, l_up, u_pad = _shapes(index)
    if prev is not None and prev.metric == cfg.metric:
        # sticky dims: observed max degree can shrink again after repair
        # (links over the cap get pruned) -- never shrink the padded
        # tables or shapes flip-flop and every refresh recompiles
        n_pad = max(n_pad, prev.n_pad)
        deg0 = max(deg0, prev.adj0.shape[1])
        l_up = max(l_up, prev.adj_up.shape[0])
        u_pad = max(u_pad, prev.adj_up.shape[1])
        deg_up = max(deg_up, prev.adj_up.shape[2])

    use_q = _use_quant(cfg.metric, index._vectors.shape[1])
    nv_dtype = None if use_q else _nbrvec_dtype(
        cfg.metric, index._vectors.dtype, n_pad, deg0,
        index._vectors.shape[1],
    )
    if (
        prev is not None
        and prev.metric == cfg.metric
        and prev.n_pad == n_pad
        and prev.adj0.shape[1] == deg0
        and prev.adj_up.shape == (l_up, u_pad, deg_up)
        and (prev.nbrvec is None) == (nv_dtype is None)
        and (prev.nbrvec is None or prev.nbrvec.dtype == nv_dtype)
        and (prev.qrows is not None) == use_q
    ):
        return _delta_snapshot(index, prev)

    # full rebuild covers everything: discard pending delta state
    index.drain_dirty()
    index._dirty_vec.clear()
    index._freed_slots_pending = []
    index._pending_wave_vecs = None

    vecs = np.zeros((n_pad, index._vectors.shape[1]), index._vectors.dtype)
    vecs[:n_rows] = index._vectors[:n_rows]
    all_rows = np.arange(n_rows, dtype=np.int32)
    adj0 = np.full((n_pad, deg0), -1, np.int32)
    adj0[:n_rows] = _row_adj(index, all_rows, 0, deg0)

    adj_up = np.full((l_up, u_pad, deg_up), -1, np.int32)
    upper_of = np.full(n_pad, -1, np.int32)
    if index._upper_slot:
        up_rows = np.fromiter(
            index._upper_slot.keys(), np.int32, len(index._upper_slot)
        )
        up_slots = np.fromiter(
            index._upper_slot.values(), np.int32, len(index._upper_slot)
        )
        upper_of[up_rows] = up_slots
        for lc in range(1, int(index.max_layer) + 1):
            adj_up[lc - 1, up_slots] = _row_adj(index, up_rows, lc, deg_up)

    sq = np.zeros(n_pad, np.float32)
    sq[:n_rows] = _sqnorms_np(index, vecs[:n_rows])

    vecs_d = jnp.asarray(vecs)
    sq_d = jnp.asarray(sq)
    adj0_d = jnp.asarray(adj0)
    nbrvec = nbrsqn = None
    if nv_dtype is not None:
        nbrvec, nbrsqn = _build_nbrvec(vecs_d, sq_d, adj0_d, dtype=nv_dtype)
    qrows = None
    if use_q:
        qrows = _quantize_rows(vecs_d, sq_d)
    return Snapshot(
        vecs=vecs_d,
        sqnorms=sq_d,
        adj0=adj0_d,
        adj_up=jnp.asarray(adj_up),
        upper_of=jnp.asarray(upper_of),
        ep=jnp.asarray(max(index.enterpoint, 0), jnp.int32),
        max_layer=jnp.asarray(index.max_layer, jnp.int32),
        metric=cfg.metric,
        n_pad=n_pad,
        nbrvec=nbrvec,
        nbrsqn=nbrsqn,
        qrows=qrows,
        live_hw=int(index._names.high_water),
    )


def _pad_rows(rows: np.ndarray) -> np.ndarray:
    """Pad a scatter-index vector to the next power of two by repeating
    its first element: duplicate scatters write identical data (safe) and
    the fixed bucket sizes keep the un-jitted update ops compile-cached
    (a fresh shape would otherwise recompile every refresh)."""
    n = len(rows)
    p = 8
    while p < n:
        p *= 2
    if p == n:
        return rows
    return np.concatenate([rows, np.full(p - n, rows[0], rows.dtype)])


@partial(
    jax.jit,
    static_argnames=("wave_vecs", "has_nbrvec", "has_quant"),
    # Donate every persistent table: the delta's .at[].set outputs then
    # update in place instead of double-buffering (the nbrvec table alone
    # is 8GiB at 1M rows -- an undonated copy OOMs the chip). The caller
    # drops the previous Snapshot right after.
    donate_argnums=(0, 1, 2, 3, 4, 5, 6, 7),
)
def _apply_delta(
    vecs, sq, adj0, adj_up, upper_of,           # prev tables
    nbrvec, nbrsqn,                             # blocked tables (or None)
    qrows,                                      # quantized rows (or None)
    vrows, vec_src, vec_sel, sq_data,           # vector updates
    arows, adj0_data, upof_vals,                # layer-0 + slot map
    wipe_flat,                                  # freed slots x all layers
    up_flat, up_data,                           # upper adjacency rows
    ep, max_layer,
    *, wave_vecs: bool, has_nbrvec: bool, has_quant: bool,
):
    """One fused device program applying a whole dirty-row delta.

    The unfused version issued ~5 + max_layer separate eager scatters per
    refresh; on a high-latency link each dispatch round-trip dominated the
    actual bytes (measured 1.7s/refresh for ~1.3MB of adjacency). One
    program, one dispatch.

    Ordering invariant: the freed-slot wipe runs BEFORE the upper-row
    scatter (ADVICE r1 high -- a freed slot reallocated to a dirty row
    must keep the fresh adjacency).

    Blocked neighbor-vector table: refreshed for exactly the dirty
    adjacency rows, gathering from the *updated* vecs/sq. This covers
    every stale block: a row's block changes only when its adjacency
    changes (bidirectional linking dirties both endpoints), and vector
    rows are immutable while referenced -- a freed row is unlinked from
    every live adjacency by delete repair (which dirties the referrers)
    before the slot can be reallocated.
    """
    if wave_vecs:
        vec_data = vec_src[vec_sel]   # device-resident wave vectors
    else:
        vec_data = vec_src            # host-uploaded rows
    vecs = vecs.at[vrows].set(vec_data)
    sq = sq.at[vrows].set(sq_data)
    adj0 = adj0.at[arows].set(adj0_data)
    upper_of = upper_of.at[arows].set(upof_vals)
    if has_quant:
        qrows = qrows.at[vrows].set(_quantize_rows(vec_data, sq_data))
    if has_nbrvec:
        safe = jnp.maximum(adj0_data, 0)
        if nbrvec.dtype == jnp.int8:
            x8, scale = _quantize_split(vecs[safe])
            nbrvec = nbrvec.at[arows].set(x8)
            # int8 meta rows: [w, 2F] = scales ++ sqnorms
            nbrsqn = nbrsqn.at[arows].set(
                jnp.concatenate([scale, sq[safe]], axis=1)
            )
        else:
            nbrvec = nbrvec.at[arows].set(vecs[safe].astype(nbrvec.dtype))
            if nbrsqn is not None:
                nbrsqn = nbrsqn.at[arows].set(sq[safe])
    shape_up = adj_up.shape
    adj_up_f = adj_up.reshape(-1, shape_up[2])
    adj_up_f = adj_up_f.at[wipe_flat].set(-1)
    adj_up_f = adj_up_f.at[up_flat].set(up_data)
    return (
        vecs, sq, adj0, adj_up_f.reshape(shape_up), upper_of, ep,
        max_layer, nbrvec, nbrsqn, qrows,
    )


def _delta_snapshot(index, prev: Snapshot) -> Snapshot:
    """Assemble one fused scatter applying all dirty rows to the
    previous device arrays (vectors, sqnorms, layer-0 adjacency, upper
    adjacency, slot map, freed-slot wipes) in a single device call."""
    dirty = np.unique(index.drain_dirty())
    vec_new = index._dirty_vec
    index._dirty_vec = set()
    deg0 = prev.adj0.shape[1]
    deg_up = prev.adj_up.shape[2]
    u_pad = prev.adj_up.shape[1]

    # -- vector updates ------------------------------------------------
    pending = getattr(index, "_pending_wave_vecs", None)
    index._pending_wave_vecs = None
    dim = prev.vecs.shape[1]
    vdt = prev.vecs.dtype
    if pending is not None and vec_new == set(int(r) for r in pending[0]):
        # the wave's vectors already sit in HBM (construct queries):
        # gather+scatter device-to-device inside the fused program
        rows, qdev = pending
        w = len(rows)
        vrows = _pad_rows(rows.astype(np.int64))
        # padded index slots repeat vrows[0] = rows[0], so padded data
        # slots must repeat wave lane 0
        vec_sel = np.zeros(len(vrows), np.int32)
        vec_sel[:w] = np.arange(w)
        vec_src = qdev
        wave_vecs = True
    elif vec_new:
        vrows = _pad_rows(np.fromiter(vec_new, np.int64, len(vec_new)))
        vec_src = index._vectors[vrows]
        vec_sel = np.zeros(len(vrows), np.int32)  # unused
        wave_vecs = False
    else:
        vrows = np.zeros(0, np.int64)
        vec_src = np.zeros((0, dim), vdt)
        vec_sel = np.zeros(0, np.int32)
        wave_vecs = False
    # sqnorms host-side (tiny upload) so they are bit-identical to a
    # full rebuild's einsum -- the byte savings live in the vectors
    sq_data = _sqnorms_np(index, index._vectors[vrows])

    # -- layer-0 adjacency + slot map over dirty rows --------------------
    if dirty.size:
        arows = _pad_rows(dirty)
        adj0_data = _row_adj(index, arows, 0, deg0)
        upof_vals = np.array(
            [index._upper_slot.get(int(r), -1) for r in arows], np.int32
        )
    else:
        arows = np.zeros(0, np.int32)
        adj0_data = np.zeros((0, deg0), np.int32)
        upof_vals = np.zeros(0, np.int32)

    # -- freed upper slots: wipe rows at EVERY layer ---------------------
    freed = index._freed_slots_pending
    index._freed_slots_pending = []
    n_layers_tot = prev.adj_up.shape[0]
    if freed:
        fr = np.asarray(freed, np.int64)
        wipe_flat = _pad_rows(
            (
                np.arange(n_layers_tot, dtype=np.int64)[:, None] * u_pad
                + fr[None, :]
            ).ravel()
        )
    else:
        wipe_flat = np.zeros(0, np.int64)

    # -- upper adjacency rows (flat (layer, slot) space) ------------------
    has_up = upof_vals >= 0 if dirty.size else np.zeros(0, bool)
    if dirty.size and has_up.any():
        up_rows = arows[has_up].astype(np.int32)
        up_slots = upof_vals[has_up].astype(np.int64)
        n_l = int(index.max_layer)
        flat = (
            np.arange(n_l, dtype=np.int64)[:, None] * u_pad
            + up_slots[None, :]
        ).ravel()
        blocks = [
            _row_adj(index, up_rows, lc, deg_up)
            for lc in range(1, n_l + 1)
        ]
        data = (
            np.concatenate(blocks, axis=0)
            if blocks
            else np.zeros((0, deg_up), np.int32)
        )
        up_flat = _pad_rows(flat)
        if len(up_flat) != len(flat):
            pad = np.repeat(data[:1], len(up_flat) - len(flat), axis=0)
            data = np.concatenate([data, pad], axis=0)
        up_data = data
    else:
        up_flat = np.zeros(0, np.int64)
        up_data = np.zeros((0, deg_up), np.int32)

    out = _apply_delta(
        prev.vecs, prev.sqnorms, prev.adj0, prev.adj_up, prev.upper_of,
        prev.nbrvec, prev.nbrsqn, prev.qrows,
        jnp.asarray(vrows), vec_src, jnp.asarray(vec_sel),
        jnp.asarray(sq_data),
        jnp.asarray(arows), jnp.asarray(adj0_data), jnp.asarray(upof_vals),
        jnp.asarray(wipe_flat),
        jnp.asarray(up_flat), jnp.asarray(up_data),
        jnp.asarray(max(index.enterpoint, 0), jnp.int32),
        jnp.asarray(index.max_layer, jnp.int32),
        wave_vecs=wave_vecs,
        has_nbrvec=prev.nbrvec is not None,
        has_quant=prev.qrows is not None,
    )
    (vecs, sq, adj0, adj_up, upper_of, ep, max_layer, nbrvec, nbrsqn,
     qrows) = out
    return Snapshot(
        vecs=vecs,
        sqnorms=sq,
        adj0=adj0,
        adj_up=adj_up,
        upper_of=upper_of,
        ep=ep,
        max_layer=max_layer,
        metric=prev.metric,
        n_pad=prev.n_pad,
        nbrvec=nbrvec,
        nbrsqn=nbrsqn,
        qrows=qrows,
        live_hw=int(index._names.high_water),
    )
