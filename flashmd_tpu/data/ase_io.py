"""ASE interoperability (reference: src/flashmd/neighbor_list/utils.py:6-54).

ASE is an optional dependency; the converter is gated on import.
"""

from __future__ import annotations

import numpy as np

from .system import Configuration


def ase2configuration(atoms) -> Configuration:
    """ase.Atoms -> Configuration (positions, numbers, masses, cell noted).

    Equivalent of the reference ``ase2data``; the cell/pbc are carried by
    the neighbor-list builder (see ops.neighborlist minimum-image support)
    rather than stored on the configuration.
    """
    return Configuration(
        pos=np.asarray(atoms.get_positions(), dtype=np.float64),
        atom_types=np.asarray(atoms.get_atomic_numbers(), dtype=np.int64),
        masses=np.asarray(atoms.get_masses(), dtype=np.float64),
        tag=str(atoms.symbols) if hasattr(atoms, "symbols") else "",
    )
