"""Fused matmul + threshold-count kernel for the scan certificate.

The certificate's second pass (ops/scan.py::_count_vs_threshold) needs,
per query, the number of live rows whose matmul-form score is (>, ==)
the query's k-th selected score. Under XLA that pass materializes the
[B, CHUNK_N] f32 score tile to HBM between the dot and the compare+sum
fusion -- at 1M rows that is ~8.6GB of extra HBM traffic (~21ms on a
v5e) for a pass whose FLOPs are only ~11ms. This kernel fuses the
epilogue into the matmul's VMEM tiles: grid over row panels, each step
computes the [B, TILE_N] score tile in VMEM (one MXU dot + the
broadcast adds) and accumulates the two per-query counts; the score
tile never touches HBM.

Soundness note (same epistemic status as the XLA pass, see the
CERT_AUDIT_EVERY comment in ops/scan.py): the certificate compares
counts of recomputed scores against counts over the SELECTED sims, so
the recomputed scores must round identically to the selection pass's.
At D = 128 the contraction is a single MXU K-tile, so both XLA's dot
and this kernel's dot run the same f32 (bf16x3) accumulation order;
``benchmarks/cert_kernel_check.py`` pins bitwise equality of the counts
vs the XLA pass on the live backend (artifacts/cert_kernel_check.json;
``tests/test_pallas.py::test_count_kernel_matches_blocked_counts`` is
the CPU interpret-mode semantics pin), and the every-256th-batch
exact audit in certified_topk_l2 would convert any residual drift into
a counted, repaired signal rather than silent wrongness.

Reference frame: this replaces nothing in zhao-lang/redis_hnsw (its
scan is the sequential loop in src/hnsw/core.rs:607-675); it is the
TPU-native machinery that makes the *exact* serving contract ride the
approx-select fast path (ops/scan.py certificate block).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

# Row-panel width: B * TILE_N * 4B is the score tile's VMEM footprint
# (8MB at B=2048, TILE_N=1024); panels pipeline HBM->VMEM row loads
# against the MXU.
TILE_N = 1024

try:  # pallas import kept lazy-tolerant like ops/pallas_gather.py
    from jax.experimental import pallas as pl

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _count_kernel(q_ref, x_ref, sq_ref, qq_ref, t_ref, gt_ref, eq_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        gt_ref[...] = jnp.zeros_like(gt_ref)
        eq_ref[...] = jnp.zeros_like(eq_ref)

    dots = jax.lax.dot_general(
        q_ref[...], x_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                             # [B, TILE_N]
    scores = 2.0 * dots - qq_ref[...] - sq_ref[...]
    t = t_ref[...]                                # [B, 1]
    gt_ref[...] += jnp.sum(
        scores > t, axis=1, dtype=jnp.int32
    )[:, None]
    eq_ref[...] += jnp.sum(
        scores == t, axis=1, dtype=jnp.int32
    )[:, None]


@partial(jax.jit, static_argnames=("interpret",))
def count_gt_eq(vecs, sq_masked, q, qq, t, *, interpret: bool = False):
    """Per-query counts of rows scoring (>, ==) ``t`` in matmul form.

    ``vecs`` [N, D] f32 row table; ``sq_masked`` [N] f32 row sqnorms
    with +inf on dead rows (so their score is exactly -inf, matching
    the XLA pass's where-mask); ``q`` [B, D] f32; ``qq`` [B] query
    sqnorms; ``t`` [B] thresholds. Returns (c_gt, c_eq) [B] int32.

    Tables whose row count is not a TILE_N multiple (hint-exact
    snapshots pad to 128-multiples, ops/snapshot.py) are zero-padded
    to the next panel boundary with +inf sqnorms -- the same dead-row
    encoding, so the padding rows score -inf and cannot count. The pad
    is one HBM copy of the table per batch (~1ms at 1M x 128d), small
    next to the ~20ms HBM tax of the XLA count pass it keeps off.
    """
    B, D = q.shape
    N = vecs.shape[0]
    pad = -N % TILE_N
    if pad:
        vecs = jnp.pad(vecs, ((0, pad), (0, 0)))
        sq_masked = jnp.pad(
            sq_masked, (0, pad), constant_values=jnp.inf
        )
        N += pad
    grid = (N // TILE_N,)
    c_gt, c_eq = pl.pallas_call(
        _count_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, D), lambda j: (0, 0)),        # q
            pl.BlockSpec((TILE_N, D), lambda j: (j, 0)),   # rows panel
            pl.BlockSpec((1, TILE_N), lambda j: (0, j)),   # sq panel
            pl.BlockSpec((B, 1), lambda j: (0, 0)),        # qq
            pl.BlockSpec((B, 1), lambda j: (0, 0)),        # t
        ],
        out_specs=(
            pl.BlockSpec((B, 1), lambda j: (0, 0)),
            pl.BlockSpec((B, 1), lambda j: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        interpret=interpret,
    )(
        q,
        vecs,
        sq_masked.reshape(1, N),
        qq.reshape(B, 1),
        t.reshape(B, 1),
    )
    return c_gt[:, 0], c_eq[:, 0]


def cert_kernel_enabled() -> bool:
    """Trace-time gate: fused count kernel on the TPU backend.

    REDIS_HNSW_TPU_CERT_KERNEL=0 forces the XLA two-pass count, =1
    forces the kernel (tests use it with interpret mode on CPU);
    default auto = TPU only, where it is measured faster and the
    bitwise-equality test pins parity.
    """
    v = os.environ.get("REDIS_HNSW_TPU_CERT_KERNEL", "auto")
    if v == "0" or not _HAVE_PALLAS:
        return False
    if v == "1":
        return True
    if v == "auto":
        return jax.default_backend() == "tpu"
    raise ValueError(f"REDIS_HNSW_TPU_CERT_KERNEL={v!r}")
