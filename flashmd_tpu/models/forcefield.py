"""Force-field composition: network + priors -> energies and forces.

Re-design of the reference output wrappers
(reference: src/flashmd/models/gradients.py — SumOut :19-158,
GradientsOut :194-293, EnergyOut :161-191).

The reference composes mutable modules that write into ``data.out`` and
computes forces with ``torch.autograd.grad`` through hand-written backward
kernels. Here the composition is a pure function: a :class:`ForceField`
pytree holds the SchNet parameters and the specialized priors, and

    ``forces = -jax.grad(total_energy)(pos)``

differentiates through the whole fused forward in one pass. Energy
components per sub-model are returned as auxiliary outputs (the analogue of
``data.out[name][ENERGY_KEY]``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.neighborlist import (
    NeighborMatrix,
    batched_radius_neighbor_matrix,
    validate_min_image,
)
from ..prior.priors import Prior, prior_energy
from .schnet import SchNetConfig, schnet_energy

SCHNET_NAME = "SchNet"


class ForceField(struct.PyTreeNode):
    """A trained model: SchNet parameters + specialized priors.

    The analogue of the reference checkpoint object
    ``GradientsOut(SumOut({SchNet, priors...}))``
    (reference: src/flashmd/models/pyg_forward_compatibility.py:227-243).
    ``neighbor_capacity`` is the static K of the padded neighbor matrix.
    """

    schnet_params: Optional[dict]
    priors: Dict[str, Prior]
    schnet_config: Optional[SchNetConfig] = struct.field(
        pytree_node=False, default=None
    )
    neighbor_capacity: int = struct.field(pytree_node=False, default=64)
    # Optional [2, P] atom pairs excluded from the SchNet radius graph
    # (the structure's ``exc_pair_index``, reference schnet.py:221-242),
    # bound here at build_forcefield time like the specialized priors.
    exc_pair_index: Optional[jnp.ndarray] = None

    @property
    def rcut(self) -> float:
        return float(self.schnet_config.cutoff.cutoff_upper)


def validate_quantized(ff: ForceField) -> None:
    """Raise unless the model's MLPs run on the reduced-precision path.

    Parity check for the reference's ``validate_gptq_w16a16``
    (reference: gptq.py:446-484), which refuses to run "quantized"
    simulations with any fp32 MLP left behind.
    """
    if ff.schnet_config is None:
        return
    if ff.schnet_config.precision != "bf16":
        raise RuntimeError(
            "Quantized simulation requested but the SchNet filter/output "
            f"MLPs run at precision={ff.schnet_config.precision!r}; "
            "expected 'bf16'."
        )


def energy_components(
    ff: ForceField,
    pos: jnp.ndarray,
    atom_types: jnp.ndarray,
    nbr: Optional[NeighborMatrix],
    cell=None,
) -> Dict[str, jnp.ndarray]:
    """Per-model energies of ONE molecule (each a scalar).

    Equivalent of SumOut.forward populating ``data.out[name]["energy"]``
    (reference: gradients.py:72-152)."""
    out = {}
    if ff.schnet_params is not None:
        out[SCHNET_NAME] = schnet_energy(
            ff.schnet_params, ff.schnet_config, pos, atom_types, nbr, cell
        )
    for name, prior in ff.priors.items():
        out[name] = prior_energy(prior, pos)
    return out


def total_energy(
    ff: ForceField,
    pos: jnp.ndarray,
    atom_types: jnp.ndarray,
    nbr: Optional[NeighborMatrix],
    cell=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """(scalar total energy, components) of one molecule."""
    comps = energy_components(ff, pos, atom_types, nbr, cell)
    total = jnp.asarray(0.0, dtype=pos.dtype)
    for v in comps.values():
        total = total + v
    return total, comps


def build_neighbors(
    ff: ForceField,
    pos_batch: jnp.ndarray,
    skin: float = 0.0,
    cell=None,
) -> NeighborMatrix:
    """Batched padded radius graph for the SchNet term.

    Rebuilt from current positions (the reference rebuilds via
    torch_cluster each forward, schnet.py:209-242). Indices carry no
    gradient, so this sits outside the differentiated region.

    ``skin`` > 0 searches at rcut + skin: the model's cutoff zeroes any
    pair beyond rcut, so a skin-padded list is EXACT as long as no pair
    moves from beyond rcut+skin to within rcut between rebuilds — the
    classic Verlet-list amortization, which the reference (rebuilding the
    graph every step) pays for in full.

    The force field's ``exc_pair_index`` (structure-level pair
    exclusions, reference schnet.py:221-242) is honored here — excluded
    pairs never enter the SchNet graph.
    """
    return batched_radius_neighbor_matrix(
        jax.lax.stop_gradient(pos_batch),
        rcut=ff.rcut + skin,
        capacity=ff.neighbor_capacity,
        cell=cell,
        exclude_pairs=ff.exc_pair_index,
    )


def compute_energy_forces(
    ff: ForceField,
    pos_batch: jnp.ndarray,  # [S, A, 3]
    atom_types: jnp.ndarray,  # [A]
    nbr: Optional[NeighborMatrix] = None,
    cell=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Batched potential + forces: ([S], [S, A, 3], components dict of [S]).

    Equivalent of GradientsOut.forward over the collated batch
    (reference: gradients.py:227-290 + base.py:821-909
    ``calculate_potential_and_forces``). Forces are exact gradients of the
    fp32 total energy; the reduction order is fixed by the program, so
    repeated evaluation is bitwise deterministic.

    ``cell`` ([3, 3] or [S, 3, 3]) enables minimum-image periodic
    boundaries. The xla gather path honors per-pair shift vectors carried
    by the neighbor matrix; the cheb path applies the minimum image
    inside its pair geometry (models/cheb.py, ops/pallas/cheb_kernel.py)
    so periodic systems stay on the fast path — an improvement over the
    reference, whose fused path silently DROPS cell_shifts (reference
    schnet.py:275-290). The dense/pallas kernels refuse periodic systems
    rather than silently ignoring the cell. Priors evaluate on raw
    (unwrapped) coordinates — correct for intramolecular terms, like the
    reference.
    """
    if atom_types is None or jnp.ndim(atom_types) != 1:
        # embedding[None] would silently produce a broadcast shape and fail
        # deep inside the message-passing kernels
        raise ValueError("atom_types must be a 1-D [A] integer array")
    if cell is not None and ff.schnet_params is not None:
        if ff.schnet_config.message_passing not in ("xla", "cheb"):
            raise NotImplementedError(
                "Periodic cells require message_passing='xla' or 'cheb' "
                f"(got {ff.schnet_config.message_passing!r}); the dense/"
                "pallas paths compute pair geometry from raw positions."
            )
    if cell is not None and ff.schnet_params is not None:
        # Concrete cells are checked here so direct API users (not just
        # Simulation.attach) hit the minimum-image soundness wall; inside
        # a jitted rollout the cell is a tracer and the attach-time check
        # (simulation/base.py:_check_min_image_soundness) already ran.
        validate_min_image(cell, ff.rcut, context="compute_energy_forces")
    if ff.exc_pair_index is not None and ff.schnet_params is not None:
        if ff.schnet_config.message_passing in ("dense", "cheb"):
            # The all-pairs paths have no neighbor list to drop pairs
            # from; running them would silently include excluded pairs
            # (the reference likewise refuses rather than ignores,
            # schnet.py:221-227).
            raise NotImplementedError(
                "Structure-level pair exclusions (exc_pair_index) require "
                "a neighbor-list message-passing path ('xla' or 'pallas'); "
                f"got {ff.schnet_config.message_passing!r}."
            )
    needs_nbr = (
        ff.schnet_params is not None
        and ff.schnet_config.message_passing not in ("dense", "cheb")
    )
    if nbr is None and needs_nbr:
        nbr = build_neighbors(ff, pos_batch, cell=cell)

    # Only the cheb path consumes the cell inside the model; per-molecule
    # [S, 3, 3] cells vmap alongside pos, a shared [3, 3] broadcasts.
    model_cell = None
    if cell is not None and ff.schnet_params is not None:
        if ff.schnet_config.message_passing == "cheb":
            model_cell = jnp.asarray(cell)
    cell_mapped = model_cell is not None and jnp.ndim(model_cell) == 3

    def batch_total(p):
        def one(q, n, mc):
            return total_energy(ff, q, atom_types, n, mc)

        in_axes = [0, None if nbr is None else 0, 0 if cell_mapped else None]
        totals, comps = jax.vmap(one, in_axes=tuple(in_axes))(
            p, nbr, model_cell
        )
        return jnp.sum(totals), (totals, comps)

    grad, (totals, comps) = jax.grad(batch_total, has_aux=True)(pos_batch)
    return totals, -grad, comps
