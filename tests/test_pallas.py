"""Pallas fused-scan kernels vs the jnp reference (interpret mode).

Mirrors the reference's kernel-equivalence strategy: AVX2 vs scalar
(src/hnsw/metrics_tests.rs) becomes Pallas vs jnp here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from redis_hnsw_tpu import IndexConfig
from redis_hnsw_tpu.models.flat import FlatIndex
from redis_hnsw_tpu.ops import distance as D
from redis_hnsw_tpu.ops.pallas_scan import (
    euclid_bias,
    flat_topk_pallas,
    hamming_bias,
)


def test_euclid_scan_matches_reference(rng):
    B, N, dim, k = 48, 700, 24, 10
    q = jnp.asarray(rng.standard_normal((B, dim)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((N, dim)).astype(np.float32))
    valid = jnp.asarray(rng.random(N) > 0.1)
    sqn = jnp.sum(v * v, axis=1)
    ids, sims = flat_topk_pallas(
        q, v, euclid_bias(sqn, valid), k=k, metric="euclidean",
        interpret=True,
    )
    scores = jnp.where(
        valid[None, :], D.pairwise_neg_sq_l2(q, v, sqn), -jnp.inf
    )
    ref_s, ref_i = jax.lax.top_k(scores, k)
    assert (ids == ref_i).all()
    np.testing.assert_allclose(
        np.asarray(sims), np.asarray(ref_s), rtol=1e-4, atol=1e-3
    )


def test_hamming_scan_matches_reference(rng):
    B, N, W, k = 40, 500, 8, 7
    q = jnp.asarray(rng.integers(0, 2**32, (B, W), dtype=np.uint32))
    v = jnp.asarray(rng.integers(0, 2**32, (N, W), dtype=np.uint32))
    valid = jnp.asarray(rng.random(N) > 0.15)
    ids, sims = flat_topk_pallas(
        q, v, hamming_bias(valid), k=k, metric="hamming", interpret=True
    )
    scores = jnp.where(
        valid[None, :], D.pairwise_hamming(q, v), -jnp.inf
    )
    ref_s, _ = jax.lax.top_k(scores, k)
    assert (sims == ref_s).all()


def test_flat_index_pallas_path(rng):
    n, dim, k = 400, 16, 5
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = FlatIndex("f", IndexConfig(dim=dim))
    idx.add_batch([f"n{i}" for i in range(n)], data)
    idx.delete_node("n3")
    q = data[:8]
    a = idx.search_batch(q, k)
    b = idx.search_batch(q, k, use_pallas=True)
    for ra, rb in zip(a, b):
        assert [r.name for r in ra] == [r.name for r in rb]


@pytest.mark.slow
def test_fused_block_score_matches_xla(rng):
    """Fused DMA block-gather+score kernel (ops/pallas_gather.py) vs the
    XLA blocked path, interpret mode (the TPU path is exercised by
    bench.py on real hardware)."""
    from redis_hnsw_tpu.ops.distance import block_neg_sq_l2
    from redis_hnsw_tpu.ops.pallas_gather import TILE_B, fused_block_score

    B, E, F, dim, N = 2 * TILE_B, 4, 8, 16, 300
    q = jnp.asarray(rng.standard_normal((B, dim)).astype(np.float32))
    qn = jnp.sum(q * q, axis=1)
    nbrvec = jnp.asarray(
        rng.standard_normal((N, F, dim)).astype(np.float32)
    )
    nbrsqn = jnp.sum(nbrvec.astype(jnp.float32) ** 2, axis=-1)
    cand = jnp.asarray(rng.integers(0, N, (B, E), dtype=np.int32))
    mask = jnp.ones((B, E * F), bool)
    want = block_neg_sq_l2(q, qn, nbrvec, nbrsqn, cand, mask)
    got = fused_block_score(q, qn, nbrvec, cand, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-3, atol=1e-3
    )


@pytest.mark.parametrize("n_extra", [0, -724])
def test_count_kernel_matches_blocked_counts(rng, n_extra):
    """pallas_count.count_gt_eq == counts over identically-blocked XLA
    scores: pins the kernel's grid accumulation, dead-row (+inf sqnorm)
    masking, the t == -inf escape, and (n_extra < 0) the self-padding
    of non-panel-aligned tables -- hint-exact snapshots pad rows to
    128-multiples, not TILE_N-multiples. The reference scores are
    computed in the kernel's own [B, TILE_N] panel shape (padding rows
    dead) because dot rounding is shape-dependent at the ulp level on
    CPU (the TPU-side bit-identity of the kernel vs the selection pass
    is pinned by the bitwise check in
    artifacts/cert_kernel_check.json and the every-256th-batch audit
    in production)."""
    from redis_hnsw_tpu.ops.pallas_count import TILE_N, count_gt_eq

    B, N, dim = 16, 2 * TILE_N + n_extra, 32
    q = jnp.asarray(rng.standard_normal((B, dim)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((N, dim)).astype(np.float32))
    # duplicate a block of rows so == ties actually occur, and kill
    # some rows so masking matters
    v = v.at[100:110].set(v[0:10])
    live = jnp.asarray(rng.random(N) > 0.2)
    sqn = jnp.sum(v * v, axis=1)
    qq = jnp.sum(q * q, axis=1, keepdims=True)

    # reference over the kernel's own padded panel domain (padding
    # rows dead, exactly the kernel's self-pad encoding)
    n_panels = -(-N // TILE_N)
    vp = jnp.pad(v, ((0, n_panels * TILE_N - N), (0, 0)))
    livep = jnp.pad(live, (0, n_panels * TILE_N - N))
    sqnp = jnp.pad(sqn, (0, n_panels * TILE_N - N))

    def blocked_scores(panel):
        lo = panel * TILE_N
        dots = jax.lax.dot_general(
            q, vp[lo : lo + TILE_N],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        raw = 2.0 * dots - qq - sqnp[None, lo : lo + TILE_N]
        return jnp.where(livep[None, lo : lo + TILE_N], raw, -jnp.inf)

    scores = jnp.concatenate(
        [blocked_scores(p) for p in range(n_panels)], axis=1
    )
    # thresholds: real scores of random live rows (so == fires), plus
    # one -inf lane (the fewer-than-k-live-rows escape)
    t = scores[jnp.arange(B), jnp.asarray(rng.integers(0, N, B))]
    t = t.at[3].set(-jnp.inf)
    want_gt = jnp.sum(scores > t[:, None], axis=1, dtype=jnp.int32)
    want_eq = jnp.sum(scores == t[:, None], axis=1, dtype=jnp.int32)
    got_gt, got_eq = count_gt_eq(
        v, jnp.where(live, sqn, jnp.inf), q, qq[:, 0], t,
        interpret=True,
    )
    assert (np.asarray(got_gt) == np.asarray(want_gt)).all()
    assert (np.asarray(got_eq) == np.asarray(want_eq)).all()


@pytest.mark.parametrize("n_extra", [0, -724])
def test_select_bins_kernel_matches_ref(rng, n_extra):
    """pallas_select.select_bins == the pure-XLA reference bitwise:
    pins the in-kernel bin max/argmax (lowest row id on ties), the
    second-best bound m2 (argmax ELEMENT excluded, duplicates kept),
    dead-row masking, and (n_extra < 0) self-padding of
    non-panel-aligned tables."""
    from redis_hnsw_tpu.ops.pallas_select import (
        TILE_N,
        select_bins,
        select_bins_ref,
    )

    B, N, dim = 16, 2 * TILE_N + n_extra, 32
    q = jnp.asarray(rng.standard_normal((B, dim)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((N, dim)).astype(np.float32))
    # duplicates INSIDE one bin: ties at a bin max must pick the lower
    # row id and surface the duplicate as the bin's second-best
    v = v.at[100:110].set(v[90:100])
    live = jnp.asarray(rng.random(N) > 0.2)
    sqn = jnp.sum(v * v, axis=1)
    qq = jnp.sum(q * q, axis=1)
    sq_masked = jnp.where(live, sqn, jnp.inf)
    want = select_bins_ref(v, sq_masked, q, qq)
    got = select_bins(v, sq_masked, q, qq, interpret=True)
    for g, w, name in zip(got, want, ("sims", "ids", "m2")):
        assert np.array_equal(
            np.asarray(g), np.asarray(w), equal_nan=True
        ), name


def test_select_bins_all_dead_bin(rng):
    """A bin whose rows are all dead surfaces as (-inf, some dead id)
    and can never certify or rank above a live candidate."""
    from redis_hnsw_tpu.ops.pallas_select import (
        BIN_L,
        TILE_N,
        select_bins,
    )

    B, N, dim = 4, TILE_N, 16
    q = jnp.asarray(rng.standard_normal((B, dim)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((N, dim)).astype(np.float32))
    live = np.ones(N, bool)
    live[:BIN_L] = False  # bin 0 entirely dead
    sqn = jnp.sum(v * v, axis=1)
    sq_masked = jnp.where(jnp.asarray(live), sqn, jnp.inf)
    qq = jnp.sum(q * q, axis=1)
    sims, ids, m2 = select_bins(v, sq_masked, q, qq, interpret=True)
    sims, ids = np.asarray(sims), np.asarray(ids)
    assert np.isneginf(sims[:, 0]).all()
    assert (ids[:, 0] < BIN_L).all()  # a dead id, never resolved
    assert np.isfinite(np.asarray(m2)).all()  # other bins have >= 2 live
