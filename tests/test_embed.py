"""Embedding lookup custom-VJP: every backward scatter variant must equal
the plain dense scatter (duplicate indices, unused rows, multi-dim idx)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpqe_tpu.ops import embed as embed_ops


@pytest.mark.parametrize("variant", ["dense", "sorted", "dedup"])
def test_scatter_variants_match_dense(variant):
    rng = np.random.default_rng(0)
    n, m, d = 60, 250, 8
    idx = jnp.asarray(rng.integers(0, n, m).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
    want = np.asarray(embed_ops.scatter_add_dense(n, idx, g))
    got = np.asarray(embed_ops._SCATTERS[variant](n, idx, g))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("variant", ["dense", "sorted", "dedup"])
def test_lookup_grad_matches_plain_gather(variant):
    rng = np.random.default_rng(1)
    n, d = 40, 16
    table = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (7, 3)).astype(np.int32))
    c = jnp.asarray(rng.normal(size=(7, 3, d)).astype(np.float32))

    def loss_custom(t):
        return jnp.vdot(embed_ops.embedding_lookup(t, idx, variant), c)

    def loss_plain(t):
        return jnp.vdot(t[idx], c)

    v0, g0 = jax.value_and_grad(loss_plain)(table)
    v1, g1 = jax.value_and_grad(loss_custom)(table)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g0), np.asarray(g1), rtol=1e-5, atol=1e-6
    )


def test_lookup_all_rows_unique_and_untouched():
    # untouched rows must get exactly zero gradient
    table = jnp.ones((10, 4), jnp.float32)
    idx = jnp.asarray([2, 2, 7], dtype=jnp.int32)
    g = jax.grad(
        lambda t: jnp.sum(embed_ops.embedding_lookup(t, idx, "dedup"))
    )(table)
    g = np.asarray(g)
    assert g[2].sum() == 8.0  # two hits x 4 dims
    assert g[7].sum() == 4.0
    mask = np.ones(10, bool)
    mask[[2, 7]] = False
    assert np.abs(g[mask]).sum() == 0.0
