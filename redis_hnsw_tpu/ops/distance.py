"""Distance/similarity kernels.

Replaces the reference's native SIMD distance layer
(zhao-lang/redis_hnsw src/hnsw/metrics.rs). The similarity convention is
identical: **negative squared L2** with no sqrt (metrics.rs:75, :80-83), so
larger = closer and all downstream ordering matches the reference exactly.

Two tiers:

* Host (numpy) kernels -- used by the sequential, reference-parity graph
  mutation path where candidate sets are tiny and pointer-chasing on the
  host beats a device round-trip.
* Device (jnp) kernels -- matmul-form scoring ``-(|q|^2 + |x|^2 - 2 q.x)``
  that maps whole query-batch x frontier tiles onto the TPU MXU; these are
  the building blocks of the batched search/construction engines. A Pallas
  fused variant lives in ops/pallas_scan.py.

Hamming: the reference declares Hamming "forthcoming" (Readme.md:8) but
never implements it; here it is first-class over bit-packed uint32 vectors
via XOR + popcount (``jax.lax.population_count`` on device).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


# ---------------------------------------------------------------------------
# Host (numpy) kernels -- sequential mutation path.
# ---------------------------------------------------------------------------

def neg_sq_l2_np(q: np.ndarray, xs: np.ndarray) -> np.ndarray:
    """-(sum((q - x)^2)) for one query against rows of ``xs``.

    Direct form (not matmul form) so values match the reference's scalar
    kernel (metrics.rs:79-84) to f32 rounding.
    """
    d = xs - q
    return -np.einsum("...d,...d->...", d, d)


def hamming_np(q_packed: np.ndarray, xs_packed: np.ndarray) -> np.ndarray:
    """Negative Hamming distance over uint32-packed bit vectors."""
    x = np.bitwise_xor(xs_packed, q_packed)
    # vectorized popcount via uint8 view + table
    v = x.view(np.uint8)
    return -_POPCOUNT_TABLE[v].sum(axis=-1).astype(np.float32)


_POPCOUNT_TABLE = np.array(
    [bin(i).count("1") for i in range(256)], dtype=np.uint16
)


def sim_np(q: np.ndarray, xs: np.ndarray, metric: str) -> np.ndarray:
    if metric == "euclidean":
        return neg_sq_l2_np(q, xs)
    if metric == "hamming":
        return hamming_np(q, xs)
    raise ValueError(metric)


# ---------------------------------------------------------------------------
# Device (jnp) kernels -- batched engines.
# ---------------------------------------------------------------------------

def sqnorms(x: jnp.ndarray) -> jnp.ndarray:
    """Per-row squared norms, precomputed once per snapshot."""
    return jnp.sum(x * x, axis=-1)


def pairwise_neg_sq_l2(
    q: jnp.ndarray,            # [B, D]
    x: jnp.ndarray,            # [N, D]
    x_sqnorm: jnp.ndarray | None = None,  # [N]
) -> jnp.ndarray:              # [B, N]
    """Matmul-form negative squared L2 of every query against every row.

    The 2*q.x term is a single [B,D]x[D,N] matmul -> MXU. Used by the
    brute-force oracle and by sharded full-scan scoring.
    """
    if x_sqnorm is None:
        x_sqnorm = sqnorms(x)
    qq = jnp.sum(q * q, axis=-1, keepdims=True)          # [B, 1]
    dots = jnp.dot(q, x.T, preferred_element_type=jnp.float32)  # [B, N]
    return 2.0 * dots - qq - x_sqnorm[None, :]


def frontier_neg_sq_l2(
    q: jnp.ndarray,          # [B, D]
    q_sqnorm: jnp.ndarray,   # [B]
    vecs: jnp.ndarray,       # [N, D] full table
    vecs_sqnorm: jnp.ndarray,  # [N]
    ids: jnp.ndarray,        # [B, F] int32 row ids (may contain junk where
                             #        mask is False; must be in-range)
    mask: jnp.ndarray,       # [B, F] bool
) -> jnp.ndarray:            # [B, F] sims, -inf where masked
    """Score a gathered frontier tile against its query batch.

    One gather of [B, F, D] + a batched contraction; this is the hot op of
    the beam search step (reference hot loop: src/hnsw/core.rs:630-668,
    one scalar distance per neighbor -- here one tile per *step* per
    *batch*).
    """
    fv = vecs[ids]                       # [B, F, D]
    fn = vecs_sqnorm[ids]                # [B, F]
    dots = jnp.einsum(
        "bd,bfd->bf", q, fv, preferred_element_type=jnp.float32
    )
    sims = 2.0 * dots - q_sqnorm[:, None] - fn
    return jnp.where(mask, sims, NEG_INF)


def block_neg_sq_l2(
    q: jnp.ndarray,          # [B, D]
    q_sqnorm: jnp.ndarray,   # [B]
    nbrvec: jnp.ndarray,     # [N, F, D] neighbor-vector blocks (f32/bf16)
    nbrsqn: jnp.ndarray,     # [N, F] f32 neighbor sqnorms
    cand: jnp.ndarray,       # [B, E] parent row ids (in-range)
    mask: jnp.ndarray,       # [B, E*F] bool over the flattened frontier
) -> jnp.ndarray:            # [B, E*F]
    """Matmul-form frontier scoring via *blocked* neighbor gathers.

    TPU gathers cost ~13ns per ROW regardless of row bytes, locality or
    dtype (measured on a v5e at N=512k; see ops/search.py). Gathering
    each candidate's neighbors one row at a time ([B, E*F] rows) is
    therefore issue-bound. The snapshot instead materializes every
    node's neighbor vectors contiguously (``nbrvec[x] = vecs[adj0[x]]``,
    ops/snapshot.py) so the frontier needs only [B, E] *block* gathers --
    F times fewer issues for the same useful bytes. Measured 2.7x faster
    per beam step at the bench operating point.
    """
    B, E = cand.shape
    F = nbrvec.shape[1]
    blocks = nbrvec[cand]                # [B, E, F, D]
    fn = nbrsqn[cand].reshape(B, E * F)
    dots = jnp.einsum(
        "bd,befd->bef", q, blocks.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).reshape(B, E * F)
    sims = 2.0 * dots - q_sqnorm[:, None] - fn
    return jnp.where(mask, sims, NEG_INF)


def block_hamming(
    q: jnp.ndarray,          # [B, W] uint32
    nbrvec: jnp.ndarray,     # [N, F, W] uint32 neighbor blocks
    cand: jnp.ndarray,       # [B, E]
    mask: jnp.ndarray,       # [B, E*F]
) -> jnp.ndarray:
    B, E = cand.shape
    F = nbrvec.shape[1]
    blocks = nbrvec[cand]                                  # [B, E, F, W]
    xo = jnp.bitwise_xor(q[:, None, None, :], blocks)
    sims = -jnp.sum(
        jax.lax.population_count(xo), axis=-1
    ).astype(jnp.float32).reshape(B, E * F)
    return jnp.where(mask, sims, NEG_INF)


def quantize_query(q: jnp.ndarray):
    """Per-row symmetric int8 quantization of a query batch."""
    amax = jnp.max(jnp.abs(q), axis=-1)
    qs = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    q8 = jnp.clip(
        jnp.round(q / qs[:, None]), -127, 127
    ).astype(jnp.int8)
    return q8, qs


def frontier_int8_neg_sq_l2(
    q8: jnp.ndarray,         # [B, D] int8 (quantize_query)
    q_scale: jnp.ndarray,    # [B] f32
    q_sqnorm: jnp.ndarray,   # [B] f32 (exact)
    qrows: jnp.ndarray,      # [N, D+8] int8: x8 | bitcast(scale, sqn)
    ids: jnp.ndarray,        # [B, F] int32 (in-range)
    mask: jnp.ndarray,       # [B, F]
) -> jnp.ndarray:
    """Quantized frontier scoring for the byte-bound high-D regime.

    At D >= ~512 a [B, E*F] frontier gather moves GBs per beam step and
    is HBM-bandwidth-bound (measured ~92GB/s at 960d), unlike the
    issue-bound low-D case that blocked gathers fix -- here the win is
    4x fewer bytes. Two design constraints, both measured:

    * The row's dequant scale and exact sqnorm are PACKED into the int8
      row's last 8 bytes (bitcast f32 pair) -- separate [B, F] scalar
      gathers would re-pay the per-row issue cost (13ns x B*E*F =
      ~13ms/step), and dequantizing the whole [B, F, D] tile to f32
      would materialize a 4GB intermediate (measured SLOWER than the
      f32 path it was meant to beat).
    * The dot runs int8 x int8 -> int32 on the MXU (query quantized per
      row); only [B, F]-shaped tensors ever exist in f32.

    sim ~ 2 * qs*s * <q8, x8> - |x|^2 - |q|^2 with |x|^2 exact from the
    packed bytes; beam ROUTING sees ~1% relative dot error and the
    final k are rescored in exact f32 form (search_pipeline).
    """
    D = q8.shape[1]
    fv = qrows[ids]                                # [B, F, D+8] int8
    x8 = fv[..., :D]
    meta = jax.lax.bitcast_convert_type(
        fv[..., D:].reshape(*fv.shape[:-1], 2, 4), jnp.float32
    )                                              # [B, F, 2]
    s, fn = meta[..., 0], meta[..., 1]
    dots = jnp.einsum(
        "bd,bfd->bf", q8, x8, preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    sims = 2.0 * dots * (q_scale[:, None] * s) - q_sqnorm[:, None] - fn
    return jnp.where(mask, sims, NEG_INF)


def block_int8_neg_sq_l2(
    q8: jnp.ndarray,         # [B, D] int8 (quantize_query)
    q_scale: jnp.ndarray,    # [B] f32
    q_sqnorm: jnp.ndarray,   # [B] f32 (exact)
    nbrvec8: jnp.ndarray,    # [N, F, D] int8 neighbor blocks
    nbrmeta: jnp.ndarray,    # [N, 2F] f32: scales[:F] ++ sqnorms[F:]
    cand: jnp.ndarray,       # [B, E] parent row ids (in-range)
    mask: jnp.ndarray,       # [B, E*F]
) -> jnp.ndarray:
    """Blocked + quantized frontier scoring: the low-D tier when the
    f32 nbrvec table is over budget. Combines both measured wins --
    [B, E] block gathers (issue-bound fix) of int8 rows (4x fewer
    bytes than f32; [N, F, 128] int8 is TILE-EXACT, 7.8GB physical at
    1.9M rows where a D+8 packed layout padded to D+128 and OOMed),
    with each neighbor's (dequant scale, exact sqnorm) riding in one
    flat [N, 2F] f32 meta row gathered per PARENT (so no per-neighbor
    scalar gather re-pays the 13ns/row issue cost). Dots run
    int8 x int8 -> int32 on the MXU; final k rescored exactly."""
    B, E = cand.shape
    F = nbrvec8.shape[1]
    x8 = nbrvec8[cand]                          # [B, E, F, D] int8
    meta = nbrmeta[cand]                        # [B, E, 2F] f32
    s = meta[:, :, :F].reshape(B, E * F)
    fn = meta[:, :, F:].reshape(B, E * F)
    dots = jnp.einsum(
        "bd,befd->bef", q8, x8, preferred_element_type=jnp.int32
    ).astype(jnp.float32).reshape(B, E * F)
    sims = 2.0 * dots * (q_scale[:, None] * s) - q_sqnorm[:, None] - fn
    return jnp.where(mask, sims, NEG_INF)


def exact_neg_sq_l2(
    q: jnp.ndarray,        # [B, D]
    vecs: jnp.ndarray,     # [N, D]
    ids: jnp.ndarray,      # [B, K]
    mask: jnp.ndarray,     # [B, K]
) -> jnp.ndarray:
    """Direct-form -(q-x)^2 for a small id set (final reported sims).

    The matmul form loses ~1e-3 relative precision to cancellation; final
    k results are rescored in direct form so reported similarities match
    the reference's kernel to f32 rounding.
    """
    d = vecs[ids] - q[:, None, :]
    sims = -jnp.sum(d * d, axis=-1)
    return jnp.where(mask, sims, NEG_INF)


def resort_desc(ids: jnp.ndarray, sims: jnp.ndarray):
    """Re-sort [B, K] results descending by (sim, -id) after rescoring.

    Exact-form rescoring can reorder near-ties relative to the matmul-form
    beam ordering (~1e-3 relative); the reference's reply is strictly
    descending by similarity, ties broken by insertion-heap order -- we pin
    (-sim, id), matching the engine's beam tie rule.
    """
    neg, ids, sims = jax.lax.sort((-sims, ids, sims), num_keys=2)
    return ids, sims


# -- Hamming (packed uint32) -------------------------------------------------

def pairwise_hamming(
    q: jnp.ndarray,   # [B, W] uint32
    x: jnp.ndarray,   # [N, W] uint32
) -> jnp.ndarray:     # [B, N] float32 negative hamming distance
    xo = jnp.bitwise_xor(q[:, None, :], x[None, :, :])
    return -jnp.sum(
        jax.lax.population_count(xo), axis=-1
    ).astype(jnp.float32)


def frontier_hamming(
    q: jnp.ndarray,        # [B, W] uint32
    vecs: jnp.ndarray,     # [N, W] uint32
    ids: jnp.ndarray,      # [B, F]
    mask: jnp.ndarray,     # [B, F]
) -> jnp.ndarray:
    fv = vecs[ids]                              # [B, F, W]
    xo = jnp.bitwise_xor(q[:, None, :], fv)
    sims = -jnp.sum(jax.lax.population_count(xo), axis=-1).astype(jnp.float32)
    return jnp.where(mask, sims, NEG_INF)
