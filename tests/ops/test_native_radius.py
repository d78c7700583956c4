"""Native C++ cell-list radius engine vs numpy brute force."""

import numpy as np
import pytest

from flashmd_tpu.native import (
    _counts_numpy,
    max_neighbor_count,
    native_available,
    neighbor_counts,
    radius_pairs,
)


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    return rng.uniform(0, 20, (300, 3))


def test_counts_match_numpy_open(cloud):
    got = neighbor_counts(cloud, 3.0)
    want = _counts_numpy(cloud, 3.0)
    np.testing.assert_array_equal(got, want)


def test_counts_match_numpy_pbc(cloud):
    cell = np.diag([20.0, 22.0, 25.0])
    got = neighbor_counts(cloud, 3.0, cell=cell)
    want = _counts_numpy(cloud, 3.0, cell=cell)
    np.testing.assert_array_equal(got, want)


def test_counts_triclinic():
    rng = np.random.default_rng(1)
    pos = rng.uniform(0, 8, (120, 3))
    cell = np.array([[8.0, 0, 0], [1.5, 8.0, 0], [0.5, 0.8, 8.0]])
    got = neighbor_counts(pos, 2.0, cell=cell)
    want = _counts_numpy(pos, 2.0, cell=cell)
    np.testing.assert_array_equal(got, want)


def test_pairs_match_numpy(cloud):
    src, dst = radius_pairs(cloud, 3.0)
    dr = cloud[None] - cloud[:, None]
    d2 = np.einsum("ijk,ijk->ij", dr, dr)
    np.fill_diagonal(d2, np.inf)
    i, j = np.nonzero(d2 < 9.0)
    got = set(zip(src.tolist(), dst.tolist()))
    want = set(zip(i.tolist(), j.tolist()))
    assert got == want


def test_max_count(cloud):
    assert max_neighbor_count(cloud, 3.0) == _counts_numpy(cloud, 3.0).max()


def test_native_compiled():
    # the image ships g++; the fast path should actually be in use
    assert native_available()
