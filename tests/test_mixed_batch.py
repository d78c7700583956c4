"""Mixed-size batches: different molecules in ONE padded batch.

A capability the reference refuses outright (``validate_data_list``,
reference: src/flashmd/simulation/base.py:914-983 — identical shapes,
types and index maps required; BASELINE.json lists "mixed-size batches"
as an unservable config there). Here: per-molecule priors are padded and
stacked (prior/priors.pad_prior, stack_priors; models/forcefield.
stack_forcefields), configurations are padded to the max atom count with
an atom mask (data/system.collate_padded), and the padded batch must be
EQUIVALENT to running each molecule separately.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashmd_tpu.data.system import (
    Configuration,
    collate,
    collate_padded,
)
from flashmd_tpu.models.cutoff import CosineCutoff
from flashmd_tpu.models.forcefield import (
    ForceField,
    compute_energy_forces,
    stack_forcefields,
)
from flashmd_tpu.models.schnet import SchNetConfig, init_schnet
from flashmd_tpu.prior.priors import (
    Prior,
    dihedral_prior,
    harmonic_prior,
    pad_prior,
    prior_energy,
    repulsion_prior,
    stack_priors,
)
from flashmd_tpu.simulation import LangevinSimulation

RCUT = 3.0
N_TYPES = 4
SIZES = (7, 12)


def _schnet():
    config = SchNetConfig(
        hidden_channels=16,
        embedding_size=N_TYPES,
        num_filters=16,
        num_interactions=2,
        num_rbf=8,
        cutoff=CosineCutoff(0.0, RCUT),
        output_hidden_layer_widths=(8,),
    )
    params = init_schnet(jax.random.PRNGKey(1), config)
    return params, config


def _molecule(a, seed):
    """One chain molecule: bonds + repulsion + (a >= 10) dihedrals."""
    rng = np.random.default_rng(seed)
    pos = np.zeros((a, 3))
    pos[:, 0] = np.arange(a) * 1.1
    pos += rng.normal(scale=0.2, size=pos.shape)
    types = rng.integers(0, N_TYPES, size=(a,))
    bonds = np.stack([np.arange(a - 1), np.arange(1, a)])
    # 1-3 pairs as repulsion terms
    rep = np.stack([np.arange(a - 2), np.arange(2, a)])
    stats_b = {
        (i, j): {"x_0": 1.0 + 0.05 * (i + j), "k": 3.0}
        for i in range(N_TYPES)
        for j in range(N_TYPES)
    }
    stats_r = {
        (i, j): {"sigma": 0.8}
        for i in range(N_TYPES)
        for j in range(N_TYPES)
    }
    priors = {
        "bonds": harmonic_prior(stats_b, types, bonds),
        "repulsion": repulsion_prior(stats_r, types, rep),
    }
    # Different dihedral term COUNTS across molecules (including zero)
    # exercise the zero-term padding path.
    if a >= 10:
        dih = np.stack(
            [np.arange(a - 3), np.arange(1, a - 2), np.arange(2, a - 1),
             np.arange(3, a)]
        )
    else:
        dih = np.zeros((4, 0), dtype=np.int64)
    stats_d = {
        k: {
            "v_0": 0.1,
            "k1s": {"k1_1": 0.2, "k1_2": 0.05, "k1_3": 0.01},
            "k2s": {"k2_1": 0.1, "k2_2": -0.02, "k2_3": 0.03},
        }
        for k in [
            (i, j, l, m)
            for i in range(N_TYPES)
            for j in range(N_TYPES)
            for l in range(N_TYPES)
            for m in range(N_TYPES)
        ]
    }
    priors["dihedrals"] = dihedral_prior(stats_d, types, dih)
    cfg = Configuration(
        pos=pos, atom_types=types, masses=np.ones(a)
    )
    return cfg, priors


@pytest.fixture(scope="module")
def mixed_setup():
    params, config = _schnet()
    cfgs, ffs = [], []
    for i, a in enumerate(SIZES):
        cfg, priors = _molecule(a, seed=10 + i)
        cfgs.append(cfg)
        ffs.append(
            ForceField(
                schnet_params=params,
                priors=priors,
                schnet_config=config,
                neighbor_capacity=max(SIZES),
            )
        )
    return cfgs, ffs


def test_collate_padded_layout(mixed_setup):
    cfgs, _ = mixed_setup
    system = collate_padded(cfgs, beta=1.5)
    a_max = max(SIZES)
    assert system.pos.shape == (2, a_max, 3)
    assert system.atom_types.shape == (2, a_max)
    assert system.atom_mask.shape == (2, a_max)
    np.testing.assert_array_equal(
        np.asarray(system.atom_mask[0]),
        np.concatenate([np.ones(SIZES[0]), np.zeros(a_max - SIZES[0])]),
    )
    # Padding is parked far from everything, pairwise.
    pos0 = np.asarray(system.pos[0])
    d = np.linalg.norm(pos0[:, None] - pos0[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d[SIZES[0]:, :].min() > 100.0


def test_collate_padded_refuses_cells():
    cfg, _ = _molecule(5, seed=0)
    cfg.cell = np.eye(3) * 20.0
    with pytest.raises(NotImplementedError, match="periodic"):
        collate_padded([cfg, cfg])


def test_pad_prior_zero_contribution(mixed_setup):
    """A padded prior's energy and position gradient equal the
    unpadded original's, exactly."""
    cfgs, ffs = mixed_setup
    pos = jnp.asarray(cfgs[0].pos, jnp.float32)
    for name, prior in ffs[0].priors.items():
        padded = (
            pad_prior(prior, prior.n_terms + 5)
            if prior.kind != "repulsion_dense"
            else prior
        )
        e0 = prior_energy(prior, pos)
        e1 = prior_energy(padded, pos)
        np.testing.assert_allclose(
            float(e0), float(e1), rtol=1e-6, err_msg=name
        )
        g0 = jax.grad(lambda p, pr=prior: prior_energy(pr, p))(pos)
        g1 = jax.grad(lambda p, pr=padded: prior_energy(pr, p))(pos)
        np.testing.assert_allclose(
            np.asarray(g0), np.asarray(g1), rtol=1e-6, err_msg=name
        )


def test_mixed_matches_separate_runs(mixed_setup):
    """Energies AND forces of the mixed padded batch equal the
    homogeneous single-molecule runs (real rows; padded forces zero)."""
    cfgs, ffs = mixed_setup
    ff_mixed = stack_forcefields(ffs)
    system = collate_padded(cfgs, beta=1.0)
    tot_m, forces_m, comps_m = compute_energy_forces(
        ff_mixed,
        system.pos,
        system.atom_types,
        atom_mask=system.atom_mask,
    )
    for s, (cfg, ff) in enumerate(zip(cfgs, ffs)):
        sys_one = collate([cfg], beta=1.0)
        tot_1, forces_1, comps_1 = compute_energy_forces(
            ff, sys_one.pos, sys_one.atom_types
        )
        a = cfg.n_atoms
        np.testing.assert_allclose(
            float(tot_m[s]), float(tot_1[0]), rtol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(forces_m[s, :a]),
            np.asarray(forces_1[0]),
            rtol=5e-4, atol=1e-5,
        )
        for key in comps_1:
            np.testing.assert_allclose(
                float(comps_m[key][s]), float(comps_1[key][0]),
                rtol=2e-5, err_msg=key,
            )
    # Forces on padding are identically zero (the masked energy does not
    # depend on padded coordinates).
    a0 = SIZES[0]
    assert np.all(np.asarray(forces_m[0, a0:]) == 0.0)


def test_mixed_requires_per_molecule_fields(mixed_setup):
    cfgs, ffs = mixed_setup
    sim = LangevinSimulation(
        dt=1e-3, friction=1.0, n_timesteps=10, save_interval=5,
        random_seed=3,
    )
    with pytest.raises(ValueError, match="per-molecule"):
        sim.attach_model_and_configurations(ffs[0], cfgs, beta=1.0)
    with pytest.raises(ValueError, match="one per configuration"):
        sim.attach_model_and_configurations([ffs[0]], cfgs, beta=1.0)


def test_stack_forcefields_rejects_different_networks(mixed_setup):
    cfgs, ffs = mixed_setup
    params2, config = _schnet()
    params2 = jax.tree.map(lambda a: a + 1.0, params2)
    ff2 = ffs[1].replace(schnet_params=params2)
    with pytest.raises(ValueError, match="identical SchNet"):
        stack_forcefields([ffs[0], ff2])


def test_mixed_engine_run_freezes_padding(mixed_setup, tmp_path):
    """A real Langevin rollout over the mixed batch: finite outputs, no
    blow-up false positive from the far-away padding, padded atoms
    exactly frozen, real atoms move."""
    cfgs, ffs = mixed_setup
    sim = LangevinSimulation(
        dt=2e-3, friction=1.0, n_timesteps=40, save_interval=10,
        random_seed=7, save_energies=True,
        filename=str(tmp_path / "mixed"),
    )
    sim.attach_model_and_configurations(ffs, cfgs, beta=1.5)
    sim.simulate()
    coords = np.concatenate(sim.simulated_coords, axis=0)  # [F, S, A, 3]
    assert np.all(np.isfinite(coords))
    # The [S, A] real-atom mask is exported once for downstream trimming.
    mask_np = np.load(str(tmp_path / "mixed_atom_mask.npy"))
    np.testing.assert_array_equal(
        mask_np, np.asarray(sim.initial_system.atom_mask)
    )
    a0 = SIZES[0]
    pad0 = np.asarray(sim.initial_system.pos[0, a0:])
    # Every frame's padding rows match the initial ladder exactly.
    np.testing.assert_array_equal(
        coords[:, 0, a0:], np.broadcast_to(pad0, coords[:, 0, a0:].shape)
    )
    # Real atoms actually moved.
    assert np.abs(coords[-1, 0, :a0] - coords[0, 0, :a0]).max() > 1e-4
    # Kinetic energy ~ equipartition per REAL dof (loose statistical
    # gate): <KE> = 3 N_real / (2 beta).
    ke = np.concatenate(sim.simulated_kinetic_energies, axis=0)  # [F, S]
    for s, a in enumerate(SIZES):
        expect = 1.5 * a / 1.5
        assert 0.4 * expect < ke[:, s].mean() < 1.9 * expect


def test_mixed_same_size_batch_matches_homogeneous(mixed_setup):
    """Two IDENTICAL-size molecules through the mixed path reduce to the
    homogeneous result (padding machinery is a no-op)."""
    params, config = _schnet()
    cfg, priors = _molecule(9, seed=3)
    ff = ForceField(
        schnet_params=params, priors=priors, schnet_config=config,
        neighbor_capacity=9,
    )
    ff_mixed = stack_forcefields([ff, ff])
    system = collate_padded([cfg, cfg], beta=1.0)
    sys_h = collate([cfg, cfg], beta=1.0)
    tot_m, forces_m, _ = compute_energy_forces(
        ff_mixed, system.pos, system.atom_types,
        atom_mask=system.atom_mask,
    )
    tot_h, forces_h, _ = compute_energy_forces(
        ff, sys_h.pos, sys_h.atom_types
    )
    np.testing.assert_allclose(
        np.asarray(tot_m), np.asarray(tot_h), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(forces_m), np.asarray(forces_h), rtol=5e-4, atol=1e-5
    )
