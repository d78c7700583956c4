"""Data layer: Configuration validation, collation, term lists, keys."""

import jax
import numpy as np
import pytest

from flashmd_tpu.data.keys import ENERGY_KEY, FORCE_KEY, POSITIONS_KEY
from flashmd_tpu.data.system import (
    Configuration,
    TermList,
    collate,
    make_term_list,
    validate_term_list,
)


def make_cfg(n=5, seed=0, types=None):
    rng = np.random.default_rng(seed)
    return Configuration(
        pos=rng.normal(size=(n, 3)),
        atom_types=np.zeros(n, dtype=int) if types is None else types,
        masses=np.ones(n),
        neighbor_lists={
            "bonds": make_term_list(
                np.stack([np.arange(n - 1), np.arange(1, n)]), tag="bonds"
            )
        },
    )


def test_keys():
    assert POSITIONS_KEY == "pos"
    assert ENERGY_KEY == "energy"
    assert FORCE_KEY == "forces"


def test_make_term_list_validation():
    with pytest.raises(RuntimeError):
        make_term_list(np.zeros((2, 3)), order=3)
    with pytest.raises(RuntimeError):
        make_term_list(np.zeros(4))
    tl = make_term_list(np.zeros((3, 7)), tag="angles")
    assert tl.order == 3 and tl.n_terms == 7
    assert validate_term_list(tl)
    assert not validate_term_list({"index_mapping": np.zeros((2, 3))})


def test_configuration_shape_checks():
    with pytest.raises(ValueError):
        Configuration(pos=np.zeros((4, 3)), atom_types=np.zeros(3))
    with pytest.raises(ValueError):
        Configuration(
            pos=np.zeros((4, 3)),
            atom_types=np.zeros(4),
            masses=np.ones(3),
        )


def test_collate_shapes_and_beta():
    cfgs = [make_cfg(seed=i) for i in range(3)]
    system = collate(cfgs, beta=2.0)
    assert system.pos.shape == (3, 5, 3)
    assert system.masses.shape == (3, 5)
    np.testing.assert_allclose(np.asarray(system.beta), 2.0)
    system2 = collate(cfgs, beta=[1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(system2.beta), [1, 2, 3])
    with pytest.raises(ValueError):
        collate(cfgs, beta=-1.0)
    with pytest.raises(ValueError):
        collate(cfgs, beta=[1.0, 2.0])


def test_collate_rejects_mismatched_types():
    cfgs = [make_cfg(), make_cfg(types=np.ones(5, dtype=int))]
    with pytest.raises(ValueError, match="Atom types"):
        collate(cfgs)


def test_collate_rejects_mismatched_termlists():
    a = make_cfg()
    b = make_cfg()
    b.neighbor_lists["bonds"] = make_term_list(
        np.stack([np.arange(4), np.arange(4)]), tag="bonds"
    )
    with pytest.raises(ValueError, match="Index mapping"):
        collate([a, b])


def test_system_is_pytree():
    system = collate([make_cfg(), make_cfg(seed=1)], beta=1.0)
    leaves = jax.tree.leaves(system)
    assert all(hasattr(leaf, "shape") for leaf in leaves)
    moved = jax.tree.map(lambda x: x, system)
    assert moved.n_sims == 2 and moved.n_atoms == 5


# ---------------------------------------------------------------------------
# ase2configuration (data/ase_io.py) with a duck-typed ase.Atoms — ase is an
# optional dependency absent from this image; the converter only touches the
# Atoms API surface (reference ase2data: neighbor_list/utils.py:6-54).
# ---------------------------------------------------------------------------


class _FakeAtoms:
    def __init__(self, pos, numbers, masses, cell=None, pbc=False,
                 symbols="H2O"):
        self._pos = np.asarray(pos)
        self._numbers = np.asarray(numbers)
        self._masses = np.asarray(masses)
        self._cell = cell
        self.pbc = np.asarray([pbc] * 3)
        self.symbols = symbols

    def get_positions(self):
        return self._pos

    def get_atomic_numbers(self):
        return self._numbers

    def get_masses(self):
        return self._masses

    def get_cell(self):
        return self._cell


def test_ase2configuration_open_boundaries():
    from flashmd_tpu.data.ase_io import ase2configuration

    atoms = _FakeAtoms(
        pos=[[0.0, 0, 0], [1.0, 0, 0], [0, 1.0, 0]],
        numbers=[1, 1, 8],
        masses=[1.0, 1.0, 16.0],
    )
    cfg = ase2configuration(atoms)
    assert cfg.cell is None  # pbc all False -> no cell carried
    np.testing.assert_array_equal(cfg.atom_types, [1, 1, 8])
    np.testing.assert_allclose(cfg.masses, [1.0, 1.0, 16.0])
    assert cfg.pos.dtype == np.float64
    assert cfg.tag == "H2O"


def test_ase2configuration_periodic_cell_flows_through():
    from flashmd_tpu.data.ase_io import ase2configuration

    cell = np.diag([12.0, 13.0, 14.0])
    atoms = _FakeAtoms(
        pos=np.random.default_rng(0).uniform(0, 12, (4, 3)),
        numbers=[6, 6, 6, 6],
        masses=[12.0] * 4,
        cell=cell,
        pbc=True,
        symbols="C4",
    )
    cfg = ase2configuration(atoms)
    np.testing.assert_array_equal(cfg.cell, cell)
    assert cfg.cell.dtype == np.float64
