"""Frontier selection unit behavior (the integration path is covered by
tests/models/test_checkpoint_io.py::test_default_conversion_*)."""

import numpy as np

from flashmd_tpu.data.system import Configuration
from flashmd_tpu.models.frontier import CANDIDATES, derive_d_min


def _cfg(pos, cell=None):
    pos = np.asarray(pos, float)
    return Configuration(
        pos=pos, atom_types=np.zeros(pos.shape[0], int), cell=cell
    )


def test_derive_d_min_open_boundary():
    # min pair distance 1.0 -> floor 0.7
    c = _cfg([[0, 0, 0], [1.0, 0, 0], [3.0, 0, 0]])
    assert derive_d_min([c], rcut=5.0) == 0.7
    # several structures: the global minimum binds
    c2 = _cfg([[0, 0, 0], [0.5, 0, 0]])
    assert derive_d_min([c, c2], rcut=5.0) == 0.35


def test_derive_d_min_periodic_falls_back_to_full_domain():
    cell = np.eye(3) * 10.0
    c = _cfg([[0, 0, 0], [1.0, 0, 0]], cell=cell)
    assert derive_d_min([c], rcut=5.0) == 0.0


def test_derive_d_min_degenerate_falls_back():
    assert derive_d_min([_cfg([[0, 0, 0]])], rcut=5.0) == 0.0
    # floor at/above rcut is unusable
    c = _cfg([[0, 0, 0], [100.0, 0, 0]])
    assert derive_d_min([c], rcut=5.0) == 0.0


def test_candidates_are_cost_ordered():
    cost = [5 * m1 + 3 * m2 for m1, m2 in CANDIDATES]
    assert cost == sorted(cost)
