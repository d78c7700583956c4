"""Synthetic flagship models for benchmarks, smoke tests and demos.

The reference's headline benchmark is the trained 1ENH CGSchNet checkpoint
(HF hub ``pingzhili/cg-schnet``, reference: src/flashmd/hub.py:8-49; README
reports 2861 timestep*mol/s at batch 128). That checkpoint cannot be
downloaded in this environment, so :func:`cgschnet_1enh_like` builds a
randomly initialized model with the same architecture dimensions and a
protein-like CG structure with the same scale (~266 beads, ~55 neighbors
per bead within the cutoff — consistent with the reference's E = 1.9M edges
at N = 34k / batch 128, csr_kernels.py:516-519). Throughput depends only on
shapes, not weight values, so this is a faithful performance stand-in; the
checkpoint converter (checkpoint_io) covers real trained weights.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.system import Configuration, make_term_list
from ..models.cutoff import CosineCutoff
from ..models.forcefield import ForceField
from ..models.schnet import SchNetConfig, init_schnet
from ..ops.neighborlist import suggest_capacity
from ..prior.priors import Prior


def random_cg_protein(
    n_atoms: int = 266,
    n_types: int = 25,
    bond_length: float = 3.8,
    confinement_radius: float = 22.0,
    min_separation: float = 3.0,
    seed: int = 0,
) -> Configuration:
    """A collapsed SELF-AVOIDING random-walk CG chain, 1ENH-like in size
    and density.

    Self-avoidance matters for dynamics, not throughput: a freely
    self-intersecting walk puts nonbonded beads ~0.3 A apart, where the
    (sigma/x)^6 repulsion produces ~1e8-scale forces and any integrator
    blows through the divergence guard within one export interval. Each
    step rejection-samples up to 50 directions for >= min_separation
    clearance from all previous beads (266 beads exclude ~8% of the
    confinement ball, so rejection rarely recurses deep).
    """
    rng = np.random.default_rng(seed)
    pos = np.zeros((n_atoms, 3))
    p = np.zeros(3)
    for i in range(1, n_atoms):
        best, best_clear = None, -np.inf
        for _ in range(50):
            step = rng.normal(size=3)
            step *= bond_length / np.linalg.norm(step)
            cand = p + step
            # soft confinement: pull back toward the origin when outside
            r = np.linalg.norm(cand)
            if r > confinement_radius:
                cand *= confinement_radius / r
            clear = np.min(
                np.linalg.norm(pos[:i] - cand, axis=1)
            )
            if clear > best_clear:
                best, best_clear = cand, clear
            if clear >= min_separation:
                break
        p = best
        pos[i] = p
    types = rng.integers(0, n_types, size=n_atoms)
    masses = rng.uniform(50.0, 150.0, size=n_atoms) / 418.4

    idx = np.arange(n_atoms)
    bonds = np.stack([idx[:-1], idx[1:]])
    angles = np.stack([idx[:-2], idx[1:-1], idx[2:]])
    dihedrals = np.stack([idx[:-3], idx[1:-2], idx[2:-1], idx[3:]])
    # Fully-connected non-bonded pairs, bonded pairs excluded (the
    # reference Repulsion uses a fully-connected list,
    # repulsion.py:44-45).
    ii, jj = np.triu_indices(n_atoms, k=2)
    repulsion = np.stack([ii, jj])

    return Configuration(
        pos=pos,
        atom_types=types,
        masses=masses,
        neighbor_lists={
            "bonds": make_term_list(bonds, tag="bonds", order=2),
            "angles": make_term_list(angles, tag="angles", order=3),
            "dihedrals": make_term_list(dihedrals, tag="dihedrals", order=4),
            "repulsion": make_term_list(repulsion, tag="repulsion", order=2),
        },
        tag="random_cg_protein",
    )


def _chain_priors(cfg: Configuration, seed: int = 0):
    """Stable, physically-sane prior parameters for the synthetic chain."""
    rng = np.random.default_rng(seed + 1)
    nl = cfg.neighbor_lists

    def mk(name, kind, feature, params):
        return Prior(
            index_mapping=jnp.asarray(
                nl[name].index_mapping, dtype=jnp.int32
            ),
            params={k: jnp.asarray(v, jnp.float32) for k, v in params.items()},
            kind=kind,
            name=name,
            feature=feature,
        )

    nb = nl["bonds"].n_terms
    na = nl["angles"].n_terms
    nd = nl["dihedrals"].n_terms
    nr = nl["repulsion"].n_terms
    priors = {
        "bonds": mk(
            "bonds",
            "harmonic_bonds",
            "distance",
            {
                "x0": np.full(nb, 3.8),
                "k": rng.uniform(40.0, 80.0, nb),
            },
        ),
        "angles": mk(
            "angles",
            "harmonic_angles",
            "angle_cos",
            {
                "x0": rng.uniform(-0.4, 0.0, na),
                "k": rng.uniform(5.0, 15.0, na),
            },
        ),
        "dihedrals": mk(
            "dihedrals",
            "dihedral",
            "torsion",
            {
                "k1s": rng.uniform(-0.5, 0.5, (nd, 3)),
                "k2s": rng.uniform(-0.5, 0.5, (nd, 3)),
                "v_0": np.zeros((nd, 1)),
            },
        ),
        "repulsion": mk(
            "repulsion",
            "repulsion",
            "distance",
            {"sigma": np.full(nr, 3.0)},
        ),
    }
    # The fully-connected repulsion is evaluated densely (zero gathers).
    from ..prior.priors import densify_repulsion

    priors["repulsion"] = densify_repulsion(
        priors["repulsion"], cfg.n_atoms
    )
    return priors


def cgschnet_1enh_like(
    n_atoms: int = 266,
    batch_size: int = 128,
    cutoff_upper: float = 10.0,
    num_interactions: int = 3,
    precision: str = "bf16",
    neighbor_capacity: Optional[int] = None,
    message_passing: str = "xla",
    seed: int = 0,
    cheb_order: Optional[int] = None,
    cheb_order_deriv: Optional[int] = None,
    cheb_d_min: Optional[float] = None,
    cheb_fit_method: Optional[str] = None,
) -> Tuple[ForceField, List[Configuration]]:
    """Flagship benchmark model: CGSchNet at 1ENH scale + priors.

    Architecture dimensions follow StandardSchNet defaults
    (reference schnet.py:743-841: hidden 128, filters 128, 50 RBF,
    embedding 100) with a [128, 128, 64, 1] output head (the "typical"
    structure per gptq.py:201).
    """
    base = random_cg_protein(n_atoms=n_atoms, seed=seed)

    config = SchNetConfig(
        hidden_channels=128,
        embedding_size=100,
        num_filters=128,
        num_interactions=num_interactions,
        num_rbf=50,
        cutoff=CosineCutoff(0.0, cutoff_upper),
        output_hidden_layer_widths=(128, 64),
        precision=precision,
        message_passing=message_passing,
        # bf16 default: asymmetric orders (fwd 48, deriv 64) on the
        # restricted fit domain d_min = 2.0 A. The zoo's excluded-volume
        # floor (repulsion prior sigma 3.0; measured chain min pair
        # distance 2.80 A) means pairs below 2.0 A never occur, so the
        # Chebyshev fit only needs [2.0, rcut] — geometric convergence on
        # the smaller interval buys the lower orders. The measured
        # (M1, M2) error grid at FIT_DMIN=2.0 (benchmarks/fidelity_asym.py,
        # 2026-08-18, v5e) shows (48, 64) at 6.90e-3 max rel force error —
        # identical to the previous full-domain (64, 96) default — within
        # the 7.2e-3 budget (= 1.2x the 6.1e-3 floor ANY bf16 evaluation
        # of this model pays), while cutting ~29% of the kernel matmul
        # FLOPs (cost ~ 5*M1 + 3*M2 at 3 interaction blocks): measured
        # 10177.8 vs 8013.5 timestep*mol/s on the headline bench, same
        # chip, same day. Sub-floor excursions are first-order
        # extrapolated (models/cheb.py) and the engine samples the min
        # pair distance every export and warns on a floor violation
        # (simulation/base.py _pair_floor_outputs). fp32 parity runs use
        # the full symmetric order on the full domain (~2e-3, the fit
        # floor).
        # The forward order is SIZE-AWARE: bf16 accumulation error grows
        # with the reduction length K = n_atoms, and the measured grid
        # (PERFORMANCE.md, 2026-08-18) shows (48, 64) reads 9.05e-3 at
        # A = 532 — past that size's 1.2x-floor budget — while (64, 64)
        # is its frontier point at 7.32e-3. Sizes past the measured 532
        # frontier get (64, 64) plus a warning below.
        # bf16x3 (hi/lo operand split) has a ~1.9e-3 floor, so its fit
        # must not bind: the measured bf16x3 grid at FIT_DMIN=2.0
        # (2026-08-18, v5e) reads (64, 96) = 1.90e-3 vs (48, 64) =
        # 5.67e-3 — the bf16 default would silently waste the split's
        # extra passes, so the tier gets its own (64, 96) default.
        # An explicit order — EITHER of the two — opts out of ALL the
        # coupled measured defaults (asymmetric counterpart AND the
        # restricted fit domain below): mixing a hand-picked order with
        # an implicit d_min or an implicit partner order would silently
        # change which fit the explicit order was validated on. With one
        # order explicit, the other defaults to the full-domain-safe 64
        # (bf16 tiers) / 128 (fp32).
        cheb_order=cheb_order
        or (
            (64 if cheb_order_deriv is None else 96)
            if precision == "bf16x3"
            else (
                (
                    (48 if n_atoms <= 266 else 64)
                    if cheb_order_deriv is None
                    else 64
                )
                if precision.startswith("bf16")
                else 128
            )
        ),
        # An explicit symmetric cheb_order stays symmetric (deriv=None
        # follows cheb_order); only the all-defaults bf16 tiers are
        # asymmetric.
        cheb_order_deriv=cheb_order_deriv
        or (
            (96 if precision == "bf16x3" else 64)
            if cheb_order is None and precision.startswith("bf16")
            else None
        ),
        cheb_d_min=(
            cheb_d_min
            if cheb_d_min is not None
            else (
                2.0
                if (
                    cheb_order is None
                    and cheb_order_deriv is None
                    and precision.startswith("bf16")
                )
                else 0.0
            )
        ),
        cheb_fit_method=cheb_fit_method or "proj",
    )
    # Size-coupling warning past the measured fidelity frontier. The bf16
    # grid was measured up to A = 532; the bf16x3 grid only at A = 266 —
    # and bf16x3 users specifically want near-fp32 fidelity, so they get
    # the warning at the size their tier was actually validated at.
    frontier = 266 if precision == "bf16x3" else 532
    if (
        cheb_order is None
        and cheb_order_deriv is None
        and precision.startswith("bf16")
        and n_atoms > frontier
    ):
        import warnings

        warnings.warn(
            f"n_atoms={n_atoms} is past the measured fidelity frontier "
            f"(A={frontier} for precision={precision!r}): the 16-bit "
            "accumulation error of the Chebyshev path grows with the "
            "molecule size and the default orders were validated only up "
            f"to {frontier} beads. Measure the force error vs "
            "precision='fp32' (benchmarks/fidelity_asym.py) or pass "
            "explicit cheb_order/cheb_order_deriv.",
            stacklevel=2,
        )
    params = init_schnet(jax.random.PRNGKey(seed), config)

    if neighbor_capacity is None:
        # Size the static capacity at rcut + 1.0 so Verlet-skin search
        # (simulation.base neighbor_skin) never overflows. Measured with
        # the native host-side cell-list engine (flashmd_tpu.native).
        from ..native import max_neighbor_count

        neighbor_capacity = min(
            suggest_capacity(
                max_neighbor_count(base.pos, cutoff_upper + 1.0),
                slack=1.35,
            ),
            n_atoms,
        )

    ff = ForceField(
        schnet_params=params,
        priors=_chain_priors(base, seed),
        schnet_config=config,
        neighbor_capacity=neighbor_capacity,
    )

    rng = np.random.default_rng(seed + 7)
    configurations = []
    for s in range(batch_size):
        cfg = Configuration(
            pos=base.pos + rng.normal(scale=0.05, size=base.pos.shape),
            atom_types=base.atom_types,
            masses=base.masses,
            neighbor_lists=base.neighbor_lists,
            tag=base.tag,
        )
        configurations.append(cfg)
    return ff, configurations
