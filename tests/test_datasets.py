"""TEXMEX loader round-trip tests (utils/datasets.py)."""

import numpy as np
import pytest

from redis_hnsw_tpu.utils.datasets import (
    load_pair,
    read_fvecs,
    read_ivecs,
    write_fvecs,
)


def test_fvecs_roundtrip(tmp_path, rng):
    data = rng.standard_normal((17, 24)).astype(np.float32)
    p = str(tmp_path / "t.fvecs")
    write_fvecs(p, data)
    back = read_fvecs(p)
    np.testing.assert_array_equal(back, data)
    # count limit
    np.testing.assert_array_equal(read_fvecs(p, count=5), data[:5])


def test_ivecs(tmp_path):
    gt = np.arange(60, dtype=np.int32).reshape(6, 10)
    rows = np.empty((6, 11), np.int32)
    rows[:, 0] = 10
    rows[:, 1:] = gt
    p = str(tmp_path / "gt.ivecs")
    rows.tofile(p)
    np.testing.assert_array_equal(read_ivecs(p), gt)


def test_bad_file_rejected(tmp_path):
    p = str(tmp_path / "bad.fvecs")
    # valid header but truncated payload
    np.array([8, 1, 2], np.int32).tofile(p)
    with pytest.raises(ValueError, match="not a multiple"):
        read_fvecs(p)
    # inconsistent per-row dimension
    p2 = str(tmp_path / "bad2.fvecs")
    rows = np.zeros((2, 3), np.int32)
    rows[0, 0] = 2
    rows[1, 0] = 7  # wrong dim, same row width
    rows.tofile(p2)
    with pytest.raises(ValueError, match="dimension"):
        read_fvecs(p2)


def test_load_pair_spec(tmp_path, rng):
    base = rng.standard_normal((10, 4)).astype(np.float32)
    qs = rng.standard_normal((3, 4)).astype(np.float32)
    bp, qp = str(tmp_path / "b.fvecs"), str(tmp_path / "q.fvecs")
    write_fvecs(bp, base)
    write_fvecs(qp, qs)
    b, q = load_pair(f"fvecs:{bp}:{qp}", count=6)
    np.testing.assert_array_equal(b, base[:6])
    np.testing.assert_array_equal(q, qs)
    with pytest.raises(ValueError, match="must be"):
        load_pair("fvecs:onlyone")
