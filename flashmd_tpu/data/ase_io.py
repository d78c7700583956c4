"""ASE interoperability (reference: src/flashmd/neighbor_list/utils.py:6-54).

ASE is an optional dependency; the converter is gated on import.
"""

from __future__ import annotations

import numpy as np

from .system import Configuration


def ase2configuration(atoms) -> Configuration:
    """ase.Atoms -> Configuration (positions, numbers, masses, cell).

    Equivalent of the reference ``ase2data``. A periodic cell is carried
    on the configuration and flows into the neighbor-list builder's
    minimum-image search (only when any(pbc) is set).
    """
    cell = None
    pbc = getattr(atoms, "pbc", None)
    if pbc is not None and np.any(pbc):
        cell = np.asarray(atoms.get_cell(), dtype=np.float64)
    return Configuration(
        pos=np.asarray(atoms.get_positions(), dtype=np.float64),
        atom_types=np.asarray(atoms.get_atomic_numbers(), dtype=np.int64),
        masses=np.asarray(atoms.get_masses(), dtype=np.float64),
        cell=cell,
        tag=str(atoms.symbols) if hasattr(atoms, "symbols") else "",
    )
