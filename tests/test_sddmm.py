"""SDDMM kernels: pallas (interpret) vs XLA vs numpy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpqe_tpu.ops import pallas_sddmm as sd


@pytest.mark.parametrize("n,d,e", [(50, 16, 200), (130, 128, 700)])
def test_sddmm_pallas_matches_numpy(rng, n, d, e):
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = rng.normal(size=(n, d)).astype(np.float32)
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    want = np.einsum("ed,ed->e", x[src], y[dst])
    got = np.asarray(sd.sddmm_pallas(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(src), jnp.asarray(dst),
        chunk=64, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    got_xla = np.asarray(sd.sddmm_xla(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(got_xla, want, rtol=1e-5, atol=1e-5)


def test_sddmm_relational(rng):
    n, d, e, r = 40, 8, 100, 5
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = rng.normal(size=(n, d)).astype(np.float32)
    w = rng.normal(size=(r, d, d)).astype(np.float32)
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    rel = rng.integers(0, r, e).astype(np.int32)
    want = np.array([x[src[i]] @ w[rel[i]] @ y[dst[i]] for i in range(e)])
    got = np.asarray(sd.sddmm_relational_xla(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(w),
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(rel), r))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_sddmm_padding_semantics(rng):
    n, d = 20, 8
    x = rng.normal(size=(n, d)).astype(np.float32)
    src = np.array([0, 5, 99], np.int32)  # 99 out of range
    dst = np.array([1, 6, 2], np.int32)
    got = np.asarray(sd.sddmm_pallas(
        jnp.asarray(x), jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst),
        chunk=8, interpret=True))
    assert got[2] == 0.0  # out-of-range endpoint scores 0
    np.testing.assert_allclose(got[0], x[0] @ x[1], rtol=1e-5)
