"""Dense device-resident snapshots of an index.

The bridge between the host-authoritative graph (models/hnsw.py) and the
batched TPU engines: the pointer graph is flattened into fixed-shape int32
adjacency tables + the f32 vector table, uploaded to HBM once per mutation
epoch and reused across queries. This replaces the reference's
``make_index`` 3-pass pointer-graph rehydration (src/lib.rs:252-315) with
O(1) dense array uploads -- there is nothing to rewire when rows are ids.

Layout:
* ``vecs [N_pad, D]`` + ``sqnorms [N_pad]`` -- vector table (f32) or packed
  bits (uint32, Hamming).
* ``adj0 [N_pad, deg0]`` -- layer-0 adjacency, -1 padded
  (deg0 >= m_max_0 = 2m, core.rs:336).
* ``adj_up [L_up, U_pad, degU]`` -- upper-layer adjacency over a *compact*
  id space holding only the ~N/m rows whose level >= 1 (most rows exist only
  at layer 0, so dense [L, N, m] would waste HBM by a factor of m).
* ``upper_of [N_pad]`` -- global row -> compact upper id (-1 if level 0).
* ``ep``, ``max_layer`` -- dynamic scalars (no recompile when they change).

Shapes are padded to multiples of 128 rows / 8 columns so capacity growth is
geometric and jit recompiles stay rare.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from . import distance as D


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
    """Immutable device view of one index epoch."""

    vecs: jnp.ndarray       # [N_pad, D] f32 (or uint32 packed for hamming)
    sqnorms: jnp.ndarray    # [N_pad] f32 (zeros for hamming)
    adj0: jnp.ndarray       # [N_pad, deg0] int32, -1 padded
    adj_up: jnp.ndarray     # [L_up, U_pad, degU] int32, -1 padded
    upper_of: jnp.ndarray   # [N_pad] int32, -1 if level < 1
    ep: jnp.ndarray         # [] int32
    max_layer: jnp.ndarray  # [] int32
    metric: str             # static
    n_pad: int              # static row capacity (visited bitmap width)

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


def build_snapshot(index) -> Snapshot:
    """Flatten a host HNSWIndex into a Snapshot (uploads to device).

    ``index._capacity_hint`` (set by bulk builds that know their final
    size) presizes every padded dimension up front so one compile of the
    jitted engines serves the whole build -- otherwise each power-of-two
    growth of the table shapes recompiles.
    """
    cfg = index.config
    hint = int(getattr(index, "_capacity_hint", 0))
    n_rows = max(index._names.high_water, 1)
    n_pad = _round_pow2(max(n_rows, hint), 128)

    vecs = np.zeros((n_pad, index._vectors.shape[1]), index._vectors.dtype)
    vecs[:n_rows] = index._vectors[:n_rows]

    # Layer-0 adjacency. Degree can transiently exceed m_max_0 after delete
    # repair (the reference's delete path adds extension links without a
    # shrink pass, core.rs:824-863) -- size columns to the observed max.
    native = index._native
    max0 = cfg.m_max_0
    max_up = cfg.m_max
    upper_rows = np.nonzero(index._levels[:n_rows] >= 1)[0].astype(np.int32)
    if native is not None:
        max0 = max(max0, native.max_degree(0, n_rows))
        hi_layer = max(int(index.max_layer), 1)
        for lc in range(1, hi_layer + 1):
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

    adj0 = np.full((n_pad, deg0), -1, np.int32)
    if native is not None:
        adj0[:n_rows] = native.export_layer(0, None, n_rows, deg0)
    else:
        for row in range(n_rows):
            lists = index._neighbors[row]
            if lists and lists[0]:
                adj0[row, : len(lists[0])] = lists[0]

    # Upper-layer stack: presize depth to the expected max level for
    # ``hint`` rows (P(level >= L) ~ m^-L) and width to the expected
    # upper-row count (~hint/m) so neither growth recompiles mid-build.
    import math

    l_hint = 0
    u_hint = 1
    if hint > 1:
        l_hint = int(math.ceil(math.log(hint) / math.log(max(cfg.m, 2)))) + 1
        u_hint = int(1.2 * hint / max(cfg.m, 2)) + 8
    l_up = max(int(index.max_layer), 1, l_hint)
    u_pad = _round_pow2(max(len(upper_rows), u_hint), 8)
    adj_up = np.full((l_up, u_pad, deg_up), -1, np.int32)
    upper_of = np.full(n_pad, -1, np.int32)
    upper_of[upper_rows] = np.arange(len(upper_rows), dtype=np.int32)
    if native is not None:
        n_u = len(upper_rows)
        for lc in range(1, int(index.max_layer) + 1):
            adj_up[lc - 1, :n_u] = native.export_layer(
                lc, upper_rows, n_u, deg_up
            )
    else:
        for u, row in enumerate(upper_rows):
            lists = index._neighbors[row]
            for lc in range(1, min(len(lists), l_up + 1)):
                if lists[lc]:
                    adj_up[lc - 1, u, : len(lists[lc])] = lists[lc]

    if cfg.metric == "hamming":
        sq = np.zeros(n_pad, np.float32)
    else:
        sq = np.zeros(n_pad, np.float32)
        sq[:n_rows] = np.einsum(
            "nd,nd->n", vecs[:n_rows], vecs[:n_rows]
        ).astype(np.float32)

    return Snapshot(
        vecs=jnp.asarray(vecs),
        sqnorms=jnp.asarray(sq),
        adj0=jnp.asarray(adj0),
        adj_up=jnp.asarray(adj_up),
        upper_of=jnp.asarray(upper_of),
        ep=jnp.asarray(max(index.enterpoint, 0), jnp.int32),
        max_layer=jnp.asarray(index.max_layer, jnp.int32),
        metric=cfg.metric,
        n_pad=n_pad,
    )
