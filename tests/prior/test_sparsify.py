"""Sparse <-> dense prior storage round trips (reference models/utils.py:6-35)."""

import numpy as np

import jax.numpy as jnp

from flashmd_tpu.prior import (
    sparse_to_table,
    sparsify_repulsion,
    table_to_sparse,
)
from flashmd_tpu.prior.priors import Prior, densify_repulsion


def _term_list_repulsion(idx, sigma):
    return Prior(
        index_mapping=jnp.asarray(idx, jnp.int32),
        params={"sigma": jnp.asarray(sigma, jnp.float32)},
        kind="repulsion",
        name="repulsion",
        feature="distance",
    )


def test_repulsion_round_trip():
    rng = np.random.default_rng(0)
    idx = np.array([[0, 1, 2, 5], [3, 4, 6, 7]])
    sigma = rng.uniform(2.0, 4.0, 4)
    prior = _term_list_repulsion(idx, sigma)
    dense = densify_repulsion(prior, n_atoms=8)
    back = sparsify_repulsion(dense)
    got = {tuple(c): s for c, s in zip(
        np.asarray(back.index_mapping).T, np.asarray(back.params["sigma"]))}
    want = {tuple(c): s for c, s in zip(idx.T, sigma)}
    assert set(got) == set(want)
    for key in want:
        np.testing.assert_allclose(got[key], want[key], rtol=1e-6)


def test_sparsify_rejects_term_list_prior():
    prior = _term_list_repulsion(np.array([[0], [1]]), np.array([3.0]))
    import pytest

    with pytest.raises(ValueError):
        sparsify_repulsion(prior)


def test_table_round_trip_scalar_payload():
    table = np.zeros((5, 5))
    table[1, 2] = 3.0
    table[4, 0] = -1.5
    idx, vals = table_to_sparse(table)
    assert idx.shape == (2, 2) and vals.shape == (2,)
    back = sparse_to_table(idx, vals, table.shape)
    np.testing.assert_array_equal(back, table)


def test_table_round_trip_vector_payload():
    table = np.zeros((4, 4, 4, 3))  # e.g. per-angle-triple parameter vectors
    table[0, 1, 2] = [1.0, 0.0, 2.0]
    table[3, 3, 3] = [0.5, 0.5, 0.5]
    idx, vals = table_to_sparse(table, order=3)
    assert idx.shape == (3, 2) and vals.shape == (2, 3)
    back = sparse_to_table(idx, vals, table.shape)
    np.testing.assert_array_equal(back, table)
