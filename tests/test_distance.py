"""Kernel equivalence tests.

Models the reference's SIMD-vs-scalar equivalence suite
(src/hnsw/metrics_tests.rs): every device kernel variant must agree with
the direct scalar definition, including the sign convention (negative
squared L2, metrics.rs:75-83).
"""

import jax.numpy as jnp
import numpy as np

from redis_hnsw_tpu.ops import distance as D


def _ref_neg_sq_l2(a, b):
    return -float(np.sum((a.astype(np.float64) - b.astype(np.float64)) ** 2))


def test_host_kernel_matches_scalar_definition(rng):
    for dim in (4, 33, 128, 512, 960):
        a = rng.standard_normal(dim).astype(np.float32)
        xs = rng.standard_normal((17, dim)).astype(np.float32)
        got = D.neg_sq_l2_np(a, xs)
        want = np.array([_ref_neg_sq_l2(a, x) for x in xs])
        np.testing.assert_allclose(got, want, rtol=1e-4)
        assert (got <= 0).all()


def test_zero_and_identical_vectors():
    a = np.zeros(64, np.float32)
    assert D.neg_sq_l2_np(a, a[None])[0] == 0.0
    b = np.full(64, 7.5, np.float32)
    assert D.neg_sq_l2_np(b, b[None])[0] == 0.0


def test_large_magnitude(rng):
    # metrics_tests.rs checks large-magnitude inputs at dim 512.
    a = (rng.standard_normal(512) * 1e3).astype(np.float32)
    b = (rng.standard_normal(512) * 1e3).astype(np.float32)
    got = D.neg_sq_l2_np(a, b[None])[0]
    want = _ref_neg_sq_l2(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_pairwise_matmul_form_matches_direct(rng):
    q = rng.standard_normal((8, 128)).astype(np.float32)
    x = rng.standard_normal((64, 128)).astype(np.float32)
    got = np.asarray(D.pairwise_neg_sq_l2(jnp.asarray(q), jnp.asarray(x)))
    want = -np.sum(
        (q[:, None, :].astype(np.float64) - x[None, :, :]) ** 2, axis=-1
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-2)


def test_frontier_gather_form_matches_direct(rng):
    q = rng.standard_normal((4, 32)).astype(np.float32)
    x = rng.standard_normal((50, 32)).astype(np.float32)
    ids = rng.integers(0, 50, size=(4, 6)).astype(np.int32)
    mask = rng.random((4, 6)) > 0.3
    got = np.asarray(
        D.frontier_neg_sq_l2(
            jnp.asarray(q),
            jnp.sum(jnp.asarray(q) ** 2, axis=-1),
            jnp.asarray(x),
            jnp.sum(jnp.asarray(x) ** 2, axis=-1),
            jnp.asarray(ids),
            jnp.asarray(mask),
        )
    )
    for b in range(4):
        for f in range(6):
            if mask[b, f]:
                np.testing.assert_allclose(
                    got[b, f],
                    _ref_neg_sq_l2(q[b], x[ids[b, f]]),
                    rtol=2e-3,
                    atol=1e-2,
                )
            else:
                assert got[b, f] == -np.inf


def test_exact_rescore_matches_host(rng):
    q = rng.standard_normal((4, 32)).astype(np.float32)
    x = rng.standard_normal((50, 32)).astype(np.float32)
    ids = rng.integers(0, 50, size=(4, 3)).astype(np.int32)
    mask = np.ones((4, 3), bool)
    got = np.asarray(
        D.exact_neg_sq_l2(
            jnp.asarray(q), jnp.asarray(x), jnp.asarray(ids), jnp.asarray(mask)
        )
    )
    for b in range(4):
        for f in range(3):
            np.testing.assert_allclose(
                got[b, f], _ref_neg_sq_l2(q[b], x[ids[b, f]]), rtol=1e-5
            )


def test_hamming_host_and_device_agree(rng):
    q = rng.integers(0, 2**32, size=8, dtype=np.uint32)
    xs = rng.integers(0, 2**32, size=(20, 8), dtype=np.uint32)
    host = D.hamming_np(q, xs)
    dev = np.asarray(
        D.pairwise_hamming(jnp.asarray(q[None]), jnp.asarray(xs))
    )[0]
    np.testing.assert_array_equal(host, dev)
    # brute-force bit count check
    want = -np.array(
        [
            sum(bin(int(a) ^ int(b)).count("1") for a, b in zip(q, x))
            for x in xs
        ],
        np.float32,
    )
    np.testing.assert_array_equal(host, want)
