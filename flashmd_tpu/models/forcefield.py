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
    # Mixed-size batches (stack_forcefields): prior leaves carry a
    # leading [S] axis and are vmapped alongside the positions in
    # compute_energy_forces. The SchNet parameters stay shared (one
    # transferable network, per-molecule priors).
    batched_priors: bool = struct.field(pytree_node=False, default=False)
    # Sub-minimum-image cells (xla path only): a STATIC tuple of (i, j,
    # k) integer lattice shifts switching the neighbor build to explicit
    # image replication — the regime the reference serves via
    # torch_impl.py:102-163. Set by with_image_replication(); None means
    # minimum image (validated sound at every concrete-cell entry).
    pbc_images: Optional[tuple] = struct.field(
        pytree_node=False, default=None
    )

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
    atom_mask=None,
) -> Dict[str, jnp.ndarray]:
    """Per-model energies of ONE molecule (each a scalar).

    Equivalent of SumOut.forward populating ``data.out[name]["energy"]``
    (reference: gradients.py:72-152). ``atom_mask`` ([A]) removes padded
    atoms' output-head energies in mixed-size batches; the priors need no
    mask here because padded priors carry their own ``term_mask``."""
    out = {}
    if ff.schnet_params is not None:
        out[SCHNET_NAME] = schnet_energy(
            ff.schnet_params, ff.schnet_config, pos, atom_types, nbr,
            cell, atom_mask=atom_mask,
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
    atom_mask=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """(scalar total energy, components) of one molecule."""
    comps = energy_components(ff, pos, atom_types, nbr, cell, atom_mask)
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
        images=ff.pbc_images,
    )


def compute_energy_forces(
    ff: ForceField,
    pos_batch: jnp.ndarray,  # [S, A, 3]
    atom_types: jnp.ndarray,  # [A], or [S, A] for mixed batches
    nbr: Optional[NeighborMatrix] = None,
    cell=None,
    atom_mask=None,  # [S, A] (mixed batches), else None
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
    if atom_types is None or jnp.ndim(atom_types) not in (1, 2):
        # embedding[None] would silently produce a broadcast shape and fail
        # deep inside the message-passing kernels
        raise ValueError(
            "atom_types must be a 1-D [A] (homogeneous batch) or 2-D "
            "[S, A] (mixed batch) integer array"
        )
    types_mapped = jnp.ndim(atom_types) == 2
    if ff.batched_priors and ff.priors and not types_mapped:
        raise ValueError(
            "A batched-prior (mixed-size) force field needs per-sim "
            "[S, A] atom_types (see data.system.collate_padded)."
        )
    if (types_mapped or atom_mask is not None) and cell is not None:
        raise NotImplementedError(
            "Mixed-size (padded) batches do not support periodic cells "
            "(data/system.collate_padded refuses them at collation)."
        )
    if cell is not None and ff.schnet_params is not None:
        if ff.schnet_config.message_passing not in ("xla", "cheb"):
            raise NotImplementedError(
                "Periodic cells require message_passing='xla' or 'cheb' "
                f"(got {ff.schnet_config.message_passing!r}); the dense/"
                "pallas paths compute pair geometry from raw positions."
            )
    if (
        cell is not None
        and ff.schnet_params is not None
        and ff.pbc_images is None
    ):
        # Concrete cells are checked here so direct API users (not just
        # Simulation.attach) hit the minimum-image soundness wall; inside
        # a jitted rollout the cell is a tracer and the attach-time check
        # (simulation/base.py:_check_min_image_soundness) already ran.
        # A force field carrying pbc_images replicates images instead
        # (with_image_replication) — sound for any cell size.
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
        def one(q, n, mc, pr, ty, am):
            ff_one = ff.replace(priors=pr) if ff.batched_priors else ff
            return total_energy(ff_one, q, ty, n, mc, atom_mask=am)

        in_axes = [
            0,
            None if nbr is None else 0,
            0 if cell_mapped else None,
            0 if ff.batched_priors else None,
            0 if types_mapped else None,
            None if atom_mask is None else 0,
        ]
        totals, comps = jax.vmap(one, in_axes=tuple(in_axes))(
            p, nbr, model_cell, ff.priors, atom_types, atom_mask
        )
        return jnp.sum(totals), (totals, comps)

    grad, (totals, comps) = jax.grad(batch_total, has_aux=True)(pos_batch)
    return totals, -grad, comps


def stack_forcefields(ffs) -> ForceField:
    """Combine per-molecule force fields into one mixed-batch field.

    The mixed-size-batch capability the reference lacks entirely (its
    ``validate_data_list`` refuses heterogeneous structures, reference:
    src/flashmd/simulation/base.py:914-983). Requirements:

    * every field shares the SAME SchNet network (one transferable CG
      model over different proteins) — config compared by equality,
      parameters by array equality;
    * matching prior keysets (kind/order checked by stack_priors);
    * no exc_pair_index (per-molecule exclusion lists would need a
      per-sim neighbor-drop mask — out of scope with mixed batches).

    Prior leaves come back with a leading [S] axis (padded to the max
    term count, masked); ``batched_priors=True`` makes
    :func:`compute_energy_forces` vmap them alongside the positions.
    Pair with ``data.system.collate_padded`` for the System side.
    """
    from ..prior.priors import stack_priors

    ffs = list(ffs)
    if not ffs:
        raise ValueError("stack_forcefields needs at least one field")
    ref = ffs[0]
    if any(ff.batched_priors for ff in ffs):
        raise ValueError("stack_forcefields inputs must be unbatched")
    if any(ff.exc_pair_index is not None for ff in ffs):
        raise NotImplementedError(
            "Mixed-size batches with exc_pair_index are not supported."
        )
    for ff in ffs[1:]:
        if (ff.schnet_params is None) != (ref.schnet_params is None):
            raise ValueError(
                "stack_forcefields: SchNet presence differs across fields"
            )
        if ff.schnet_config != ref.schnet_config:
            raise ValueError(
                "stack_forcefields requires identical SchNet configs "
                "(one transferable network shared by every molecule)."
            )
        if ref.schnet_params is not None:
            same = jax.tree_util.tree_all(
                jax.tree.map(
                    lambda a, b: jnp.asarray(a).shape == jnp.asarray(b).shape
                    and bool(jnp.all(jnp.asarray(a) == jnp.asarray(b))),
                    ref.schnet_params,
                    ff.schnet_params,
                )
            )
            if not same:
                raise ValueError(
                    "stack_forcefields requires identical SchNet "
                    "parameters — the mixed batch shares one network."
                )
        if set(ff.priors.keys()) != set(ref.priors.keys()):
            raise ValueError(
                f"Prior keysets differ: {sorted(ff.priors)} vs "
                f"{sorted(ref.priors)}"
            )
    priors = {
        name: stack_priors([ff.priors[name] for ff in ffs])
        for name in ref.priors
    }
    return ref.replace(
        priors=priors,
        neighbor_capacity=max(ff.neighbor_capacity for ff in ffs),
        batched_priors=True,
    )


def with_image_replication(
    ff: ForceField, cell, skin: float = 0.0
) -> ForceField:
    """Bind an explicit image-replication shift set to the force field.

    Enables SUB-minimum-image periodic cells (rcut + skin >= half the
    smallest perpendicular cell width) on the xla message-passing path:
    the neighbor build enumerates every lattice image that can reach
    the search radius (ops/neighborlist.compute_image_shifts, the
    counterpart of the reference's compute_images,
    torch_impl.py:102-163), and the image offsets ride the neighbor
    matrix's shift vectors — the model is unchanged. For cells already
    in the minimum-image regime this is unnecessary (and slower: M
    times the candidate columns).

    ``skin`` must match the simulation's ``neighbor_skin`` — the shift
    range covers the full search radius so the amortized Verlet list
    stays exact between rebuilds.

    Raises for non-xla paths: cheb computes the minimum image inside
    its pair geometry (sound only in the minimum-image regime) and
    dense/pallas refuse cells outright.
    """
    from ..ops.neighborlist import compute_image_shifts

    if ff.schnet_params is not None and (
        ff.schnet_config.message_passing != "xla"
    ):
        raise NotImplementedError(
            "Image replication (sub-minimum-image cells) requires "
            "message_passing='xla' (got "
            f"{ff.schnet_config.message_passing!r}): the cheb kernels "
            "apply the minimum image in-kernel, which is unsound for "
            "cells this small."
        )
    shifts = compute_image_shifts(cell, ff.rcut + skin)
    return ff.replace(pbc_images=tuple(map(tuple, shifts.tolist())))
