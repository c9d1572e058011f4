"""Pallas segment kernels vs NumPy oracle (interpreter mode on CPU;
compiled-mode parity runs on real TPU via tools/tpu_smoke.py)."""

import numpy as np
import pytest

from mpqe_tpu.ops import pallas_segment as ps
from mpqe_tpu.utils import oracle


@pytest.mark.parametrize("e,d,s", [(100, 16, 10), (513, 128, 40), (7, 5, 3)])
def test_segment_sum_pallas(rng, e, d, s):
    data = rng.normal(size=(e, d)).astype(np.float32)
    ids = rng.integers(0, s, e).astype(np.int32)
    got = np.asarray(ps.segment_sum_pallas(data, ids, s, interpret=True))
    want = oracle.segment_sum_np(data, ids, s)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_segment_sum_pallas_out_of_range(rng):
    data = np.ones((10, 8), dtype=np.float32)
    ids = np.array([0, 1, 2, 3, 4, 99, 99, -1, 2, 0], dtype=np.int32)
    got = np.asarray(ps.segment_sum_pallas(data, ids, 5, interpret=True))
    want = oracle.segment_sum_np(data, ids, 5)
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("e,d,s", [(100, 16, 10), (513, 128, 40)])
def test_segment_max_pallas(rng, e, d, s):
    data = rng.normal(size=(e, d)).astype(np.float32) - 3.0
    ids = rng.integers(0, s, e).astype(np.int32)
    got = np.asarray(ps.segment_max_pallas(data, ids, s, interpret=True))
    # empty segments: kernel leaves NEG_INF; oracle uses empty_value=NEG_INF
    want = oracle.segment_max_np(data, ids, s, empty_value=ps.NEG_INF)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_segment_cap():
    data = np.ones((4, 4), dtype=np.float32)
    ids = np.zeros(4, dtype=np.int32)
    with pytest.raises(ValueError):
        ps.segment_sum_pallas(data, ids, ps.MAX_PALLAS_SEGMENTS + 1)
