"""Segment ops (XLA backend) vs. NumPy oracle, incl. padding semantics."""

import numpy as np

from mpqe_tpu.ops import segment as seg
from mpqe_tpu.utils import oracle


def test_segment_sum_matches_oracle(rng):
    data = rng.normal(size=(64, 16)).astype(np.float32)
    ids = rng.integers(0, 10, 64).astype(np.int32)
    got = np.asarray(seg.segment_sum(data, ids, 10))
    want = oracle.segment_sum_np(data, ids, 10)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_segment_sum_drops_out_of_range(rng):
    data = np.ones((6, 4), dtype=np.float32)
    ids = np.array([0, 1, 5, 5, 2, 9], dtype=np.int32)  # 5,9 out of range
    got = np.asarray(seg.segment_sum(data, ids, 5))
    want = oracle.segment_sum_np(data, ids, 5)
    np.testing.assert_allclose(got, want)
    assert got.sum() == 3 * 4  # only ids 0,1,2 kept


def test_segment_max_matches_oracle_and_empty_value(rng):
    data = rng.normal(size=(32, 8)).astype(np.float32) - 5.0  # all negative
    ids = rng.integers(0, 6, 32).astype(np.int32)
    ids[ids == 3] = 0  # make segment 3 empty
    got = np.asarray(seg.segment_max(data, ids, 6, empty_value=0.0))
    want = oracle.segment_max_np(data, ids, 6, empty_value=0.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got[3], 0.0)


def test_segment_mean(rng):
    data = rng.normal(size=(20, 4)).astype(np.float32)
    ids = rng.integers(0, 4, 20).astype(np.int32)
    got = np.asarray(seg.segment_mean(data, ids, 4))
    s = oracle.segment_sum_np(data, ids, 4)
    c = np.maximum(np.bincount(ids, minlength=4), 1)[:, None]
    np.testing.assert_allclose(got, s / c, rtol=1e-5, atol=1e-5)


def test_segment_softmax_weights(rng):
    logits = rng.normal(size=(30,)).astype(np.float32)
    ids = rng.integers(0, 5, 30).astype(np.int32)
    w = np.asarray(seg.segment_softmax_weights(logits, ids, 5))
    for s in range(5):
        m = ids == s
        if m.any():
            np.testing.assert_allclose(w[m].sum(), 1.0, rtol=1e-5)
