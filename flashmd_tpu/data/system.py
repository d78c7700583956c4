"""Immutable pytree containers describing a batch of molecular systems.

TPU-native re-design of the reference's ``AtomicData`` (a mutable PyG ``Data``
subclass; reference: src/flashmd/data/atomic_data.py:21-237) and of the PyG
``collate`` batching used by the simulation engine
(reference: src/flashmd/simulation/base.py:985-997).

Design notes (why this is not a port)
-------------------------------------
The reference flattens ``n_sims`` molecules into one disjoint graph with a
``batch`` vector and offsets every index map during collation
(``AtomicData.__inc__``). That layout exists to serve PyG's scatter-based
message passing on a GPU. On TPU we want static, dense, regular shapes, so a
batch of molecules is a *stacked* ``[n_sims, n_atoms, ...]`` array instead.
This is legal because the reference itself requires every configuration in a
batch to have identical ``atom_types`` and identical prior index maps
(reference: src/flashmd/simulation/base.py:914-983 ``validate_data_list``),
i.e. the batch axis is embarrassingly regular: a perfect ``vmap``/sharding
axis.

Two kinds of objects live here:

* :class:`Configuration` — a host-side description of ONE molecule (numpy).
  This mirrors what the reference stores per-frame in its structure ``.pt``
  files.
* :class:`System` — the on-device pytree carried through ``lax.scan``:
  positions/velocities are ``[S, A, 3]``; per-molecule constants
  (types, masses) are stored once.
* :class:`TermList` — a static interaction index map (bonds/angles/dihedrals
  or a cached radius graph), the analogue of the reference's neighbor-list
  dict schema (reference: src/flashmd/neighbor_list/neighbor_list.py:66-124).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class TermList(struct.PyTreeNode):
    """A fixed interaction list of ``order``-tuples of atom indices.

    Equivalent of the reference neighbor-list dict
    ``{tag, order, index_mapping[order, n], mapping_batch, cell_shifts, rcut,
    self_interaction}`` (reference:
    src/flashmd/neighbor_list/neighbor_list.py:66-124), with two differences:

    * indices are **per-molecule** (no batch offsets): the batch axis is
      explicit elsewhere, so ``mapping_batch`` is unnecessary.
    * the container is an immutable pytree; metadata is static so it never
      triggers retracing.
    """

    index_mapping: jnp.ndarray  # [order, n_terms] int32
    tag: str = struct.field(pytree_node=False, default="")
    order: int = struct.field(pytree_node=False, default=2)
    rcut: Optional[float] = struct.field(pytree_node=False, default=None)
    self_interaction: bool = struct.field(pytree_node=False, default=False)

    @property
    def n_terms(self) -> int:
        return self.index_mapping.shape[1]


def make_term_list(
    index_mapping,
    tag: str = "",
    order: Optional[int] = None,
    rcut: Optional[float] = None,
    self_interaction: bool = False,
) -> TermList:
    """Build a :class:`TermList`, validating shape against ``order``.

    Mirrors ``make_neighbor_list`` (reference:
    src/flashmd/neighbor_list/neighbor_list.py:66-124).
    """
    index_mapping = jnp.asarray(index_mapping, dtype=jnp.int32)
    if index_mapping.ndim != 2:
        raise RuntimeError(
            f"index_mapping must be [order, n_terms], got shape "
            f"{index_mapping.shape}"
        )
    if order is None:
        order = int(index_mapping.shape[0])
    if index_mapping.shape[0] != order:
        raise RuntimeError(
            f"index_mapping shape does not match the order: "
            f"{index_mapping.shape[0]} != {order}"
        )
    return TermList(
        index_mapping=index_mapping,
        tag=tag,
        order=order,
        rcut=rcut,
        self_interaction=self_interaction,
    )


def validate_term_list(term_list) -> bool:
    """True iff ``term_list`` is a usable :class:`TermList`.

    Equivalent of ``validate_neighborlist`` (reference:
    src/flashmd/neighbor_list/neighbor_list.py:131-163).
    """
    return (
        isinstance(term_list, TermList)
        and term_list.index_mapping.ndim == 2
        and term_list.index_mapping.shape[0] == term_list.order
    )


@dataclasses.dataclass
class Configuration:
    """Host-side description of a single molecule (one frame).

    The analogue of one reference ``AtomicData`` instance
    (reference: src/flashmd/data/atomic_data.py:21-237). Arrays are numpy;
    nothing here is traced.
    """

    pos: np.ndarray  # [A, 3]
    atom_types: np.ndarray  # [A] int
    masses: Optional[np.ndarray] = None  # [A]
    velocities: Optional[np.ndarray] = None  # [A, 3]
    neighbor_lists: Dict[str, TermList] = dataclasses.field(
        default_factory=dict
    )
    # Optional [3, 3] lattice (rows are lattice vectors) for periodic
    # systems; None = open boundaries (reference AtomicData cell/pbc,
    # atomic_data.py:67-94).
    cell: Optional[np.ndarray] = None
    # Optional [2, P] atom-index pairs to EXCLUDE from the SchNet radius
    # graph (reference ``exc_pair_index``, consumed by the fused radius
    # kernel at schnet.py:221-242; without that kernel the reference
    # refuses to run). Treated as undirected.
    exc_pair_index: Optional[np.ndarray] = None
    tag: str = ""

    def __post_init__(self):
        self.pos = np.asarray(self.pos, dtype=np.float64)
        if self.pos.ndim != 2:
            raise ValueError(f"pos must be [A, 3], got {self.pos.shape}")
        self.atom_types = np.asarray(self.atom_types)
        if self.atom_types.shape[0] != self.pos.shape[0]:
            raise ValueError("atom_types length must match pos")
        if self.masses is not None:
            self.masses = np.asarray(self.masses, dtype=np.float64)
            if self.masses.shape != self.atom_types.shape:
                raise ValueError("masses shape must match atom_types")
        if self.cell is not None:
            self.cell = np.asarray(self.cell, dtype=np.float64)
            if self.cell.shape != (3, 3):
                raise ValueError(
                    f"cell must be [3, 3], got {self.cell.shape}"
                )
        if self.velocities is not None:
            self.velocities = np.asarray(self.velocities, dtype=np.float64)
            if self.velocities.shape != self.pos.shape:
                raise ValueError("velocities shape must match pos")
        if self.exc_pair_index is not None:
            epi = np.asarray(self.exc_pair_index, dtype=np.int64)
            if epi.ndim != 2 or 2 not in epi.shape:
                raise ValueError(
                    f"exc_pair_index must be [2, P] pairs, got {epi.shape}"
                )
            if epi.shape[0] != 2:  # accept the transposed [P, 2] layout
                epi = epi.T
            if epi.size and (epi.min() < 0 or epi.max() >= self.n_atoms):
                raise ValueError(
                    "exc_pair_index refers to atoms outside [0, "
                    f"{self.n_atoms})"
                )
            self.exc_pair_index = epi

    @property
    def n_atoms(self) -> int:
        return self.pos.shape[0]

    @classmethod
    def from_points(
        cls,
        pos,
        atom_types,
        masses=None,
        velocities=None,
        neighbor_lists=None,
        cell=None,
        exc_pair_index=None,
        tag: str = "",
    ) -> "Configuration":
        """Construct from raw arrays (reference:
        src/flashmd/data/atomic_data.py:105-186 ``AtomicData.from_points``)."""
        return cls(
            pos=np.asarray(pos),
            atom_types=np.asarray(atom_types),
            masses=None if masses is None else np.asarray(masses),
            velocities=None if velocities is None else np.asarray(velocities),
            neighbor_lists=dict(neighbor_lists or {}),
            cell=None if cell is None else np.asarray(cell),
            exc_pair_index=(
                None if exc_pair_index is None else np.asarray(exc_pair_index)
            ),
            tag=tag,
        )


class System(struct.PyTreeNode):
    """The batched, on-device simulation state.

    Replaces the reference's collated ``AtomicData`` + ``batch``/``ptr``
    bookkeeping (reference: src/flashmd/simulation/base.py:985-997). Shapes:

    * ``pos`` / ``velocities``: ``[S, A, 3]`` — the only arrays that evolve.
    * ``atom_types``: ``[A]`` — identical across the batch by construction
      (validated at collation, like reference base.py:937-946).
    * ``masses``: ``[S, A]``.
    * ``beta``: ``[S]`` inverse temperatures.
    * ``term_lists``: static per-molecule interaction maps shared by all S.
    """

    pos: jnp.ndarray  # [S, A, 3]
    atom_types: jnp.ndarray  # [A] int32 — or [S, A] for mixed batches
    masses: jnp.ndarray  # [S, A]
    beta: jnp.ndarray  # [S]
    velocities: Optional[jnp.ndarray] = None  # [S, A, 3]
    cell: Optional[jnp.ndarray] = None  # [S, 3, 3] lattices (None = open)
    term_lists: Dict[str, TermList] = struct.field(default_factory=dict)
    # Mixed-size batches only ([S, A] float, 1 = real atom, 0 = padding;
    # None = homogeneous batch, every atom real). Built by
    # :func:`collate_padded`; padded atoms are parked on a far-away
    # ladder so no radius-graph pair can involve them, and the
    # integrators freeze them exactly (masked noise scale).
    atom_mask: Optional[jnp.ndarray] = None

    @property
    def n_sims(self) -> int:
        return self.pos.shape[0]

    @property
    def n_atoms(self) -> int:
        return self.pos.shape[1]

    @property
    def n_dims(self) -> int:
        return self.pos.shape[2]


def validate_configurations(configurations: Sequence[Configuration]):
    """Check that a batch of configurations is collatable.

    Mirrors ``_Simulation.validate_data_list``
    (reference: src/flashmd/simulation/base.py:914-983): same positions shape,
    identical atom types, identical neighbor-list keysets and index maps, and
    consistent presence of masses.
    """
    if len(configurations) == 0:
        raise ValueError("Cannot collate an empty configuration list")
    ref = configurations[0]
    have_masses = ref.masses is not None
    for frame, cfg in enumerate(configurations):
        if cfg.pos.shape != ref.pos.shape:
            raise ValueError(
                f"Positions shape {cfg.pos.shape} at frame {frame} differs "
                f"from shape {ref.pos.shape} in previous frames."
            )
        if not np.array_equal(cfg.atom_types, ref.atom_types):
            raise ValueError(
                f"Atom types at frame {frame} are not equal to atom types "
                "in previous frames."
            )
        if set(cfg.neighbor_lists.keys()) != set(ref.neighbor_lists.keys()):
            raise ValueError(
                f"Neighbor list keyset {set(cfg.neighbor_lists.keys())} at "
                f"frame {frame} does not match previous frames."
            )
        for key, tl in cfg.neighbor_lists.items():
            if not np.array_equal(
                np.asarray(tl.index_mapping),
                np.asarray(ref.neighbor_lists[key].index_mapping),
            ):
                raise ValueError(
                    f"Index mapping for key {key} at frame {frame} does not "
                    "match those of previous frames."
                )
        if (cfg.masses is not None) != have_masses:
            raise ValueError(
                f"Inconsistent mass specification at frame {frame}."
            )
        if (cfg.cell is None) != (ref.cell is None):
            raise ValueError(
                f"Inconsistent cell specification at frame {frame}."
            )
        same_exc = (
            (cfg.exc_pair_index is None) == (ref.exc_pair_index is None)
        ) and (
            cfg.exc_pair_index is None
            or np.array_equal(cfg.exc_pair_index, ref.exc_pair_index)
        )
        if not same_exc:
            # Like atom_types, the exclusion list is a property of THE
            # molecule, which the batch shares by construction.
            raise ValueError(
                f"exc_pair_index at frame {frame} does not match previous "
                "frames."
            )


def collate(
    configurations: Sequence[Configuration],
    beta=None,
    dtype=jnp.float32,
) -> System:
    """Stack configurations into a batched :class:`System`.

    The TPU-native replacement for PyG ``collate``
    (reference: src/flashmd/simulation/base.py:985-997): no index offsetting,
    no ``batch``/``ptr`` vectors — just a leading batch axis.
    """
    validate_configurations(configurations)
    n_sims = len(configurations)

    pos = jnp.asarray(
        np.stack([c.pos for c in configurations]), dtype=dtype
    )
    atom_types = jnp.asarray(configurations[0].atom_types, dtype=jnp.int32)
    if configurations[0].masses is not None:
        masses = jnp.asarray(
            np.stack([c.masses for c in configurations]), dtype=dtype
        )
    else:
        masses = jnp.ones((n_sims, pos.shape[1]), dtype=dtype)

    velocities = None
    if all(c.velocities is not None for c in configurations):
        velocities = jnp.asarray(
            np.stack([c.velocities for c in configurations]), dtype=dtype
        )

    cell = None
    if configurations[0].cell is not None:
        cell = jnp.asarray(
            np.stack([c.cell for c in configurations]), dtype=dtype
        )

    if beta is None:
        beta_arr = jnp.ones((n_sims,), dtype=dtype)
    elif np.ndim(beta) == 0:
        if float(beta) <= 0:
            raise ValueError(
                f"Beta must be positive, but {beta} was supplied"
            )
        beta_arr = jnp.full((n_sims,), float(beta), dtype=dtype)
    else:
        beta_np = np.asarray(beta, dtype=np.float64)
        if not np.all(beta_np > 0) or not np.all(np.isfinite(beta_np)):
            raise ValueError(
                f"All betas must be positive and finite, got {beta_np}."
            )
        if beta_np.shape[0] != n_sims:
            raise ValueError(
                f"Got {beta_np.shape[0]} betas for {n_sims} configurations."
            )
        beta_arr = jnp.asarray(beta_np, dtype=dtype)

    term_lists = {
        k: TermList(
            index_mapping=jnp.asarray(tl.index_mapping, dtype=jnp.int32),
            tag=tl.tag,
            order=tl.order,
            rcut=tl.rcut,
            self_interaction=tl.self_interaction,
        )
        for k, tl in configurations[0].neighbor_lists.items()
    }

    return System(
        pos=pos,
        atom_types=atom_types,
        masses=masses,
        beta=beta_arr,
        velocities=velocities,
        cell=cell,
        term_lists=term_lists,
    )


def collate_padded(
    configurations: Sequence[Configuration],
    beta=None,
    dtype=jnp.float32,
    pad_spacing: float = 1.0e4,
) -> System:
    """Stack configurations of DIFFERENT sizes into one padded System.

    The mixed-size extension the reference refuses outright
    (``validate_data_list``, reference: src/flashmd/simulation/base.py:
    914-983 — identical shapes and types required). Every molecule is
    padded to the batch's max atom count; ``atom_mask`` ([S, A_max])
    marks real atoms. Padded atoms are parked on a ladder of far-away
    positions (``pad_spacing`` apart, starting ``pad_spacing`` beyond
    the molecule), so that:

    * no radius-graph pair (at any realistic rcut + skin) can involve a
      padded atom — the SchNet paths exclude padding with zero model
      changes, and the masked output head (models/schnet.py
      ``schnet_energy(atom_mask=...)``) removes their bias energies;
    * padded-padded pair distances are strictly positive — no 0/0 in
      any all-pairs path.

    Padded masses are 1 (never divided into anything that matters: the
    integrators zero padded noise scales and padded forces vanish
    because the energy is independent of padded coordinates).

    Periodic cells are refused: minimum-image wrapping would fold the
    far-away padding back into the box, silently creating phantom
    pairs. Mixed batches are open-boundary only.

    Per-molecule term lists keep their own sizes host-side; the
    specialized priors are padded/stacked separately
    (prior.priors.stack_priors via models.forcefield.stack_forcefields).
    """
    if len(configurations) == 0:
        raise ValueError("Cannot collate an empty configuration list")
    if any(c.cell is not None for c in configurations):
        raise NotImplementedError(
            "Mixed-size (padded) batches do not support periodic cells: "
            "minimum-image wrapping would fold the padding atoms back "
            "into the box. Collate homogeneous batches for PBC."
        )
    if any(c.exc_pair_index is not None for c in configurations):
        raise NotImplementedError(
            "Mixed-size batches with exc_pair_index are not supported "
            "(the exclusion list is bound per force field; see "
            "models/forcefield.stack_forcefields)."
        )
    sizes = [c.n_atoms for c in configurations]
    a_max = max(sizes)
    n_sims = len(configurations)
    have_masses = any(c.masses is not None for c in configurations)
    have_vel = all(c.velocities is not None for c in configurations)

    pos = np.zeros((n_sims, a_max, 3), np.float64)
    types = np.zeros((n_sims, a_max), np.int32)
    masses = np.ones((n_sims, a_max), np.float64)
    mask = np.zeros((n_sims, a_max), np.float32)
    vel = np.zeros((n_sims, a_max, 3), np.float64) if have_vel else None
    for s, c in enumerate(configurations):
        a = c.n_atoms
        pos[s, :a] = c.pos
        # Far-away ladder: strictly increasing offsets along x keep all
        # padded-padded and padded-real distances >= pad_spacing.
        n_pad = a_max - a
        if n_pad:
            base = c.pos.mean(axis=0)
            pos[s, a:] = base + np.stack(
                [
                    pad_spacing * np.arange(1, n_pad + 1),
                    np.zeros(n_pad),
                    np.zeros(n_pad),
                ],
                axis=1,
            )
        types[s, :a] = np.asarray(c.atom_types, np.int32)
        if c.masses is not None:
            masses[s, :a] = c.masses
        mask[s, :a] = 1.0
        if have_vel:
            vel[s, :a] = c.velocities

    if beta is None:
        beta_arr = np.ones((n_sims,), np.float64)
    else:
        beta_arr = np.broadcast_to(
            np.asarray(beta, np.float64), (n_sims,)
        ).copy()
        if not np.all(beta_arr > 0) or not np.all(np.isfinite(beta_arr)):
            raise ValueError(
                f"All betas must be positive and finite, got {beta_arr}."
            )

    if not have_masses:
        masses = np.ones((n_sims, a_max), np.float64)

    return System(
        pos=jnp.asarray(pos, dtype),
        atom_types=jnp.asarray(types, jnp.int32),
        masses=jnp.asarray(masses, dtype),
        beta=jnp.asarray(beta_arr, dtype),
        velocities=None if vel is None else jnp.asarray(vel, dtype),
        cell=None,
        term_lists={},
        atom_mask=jnp.asarray(mask),
    )
