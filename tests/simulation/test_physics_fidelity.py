"""Physics-fidelity gates: kernel paths produce statistically
indistinguishable trajectories, and forces agree to fp32 tolerance.

The analogue of the reference's --disable_optim A/B protocol
(reference: scripts/nvt_langevin.py:6-17, README.md:63-72), run as tests.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashmd_tpu.data.system import Configuration, collate
from flashmd_tpu.models.cutoff import CosineCutoff
from flashmd_tpu.models.forcefield import ForceField, compute_energy_forces
from flashmd_tpu.models.schnet import SchNetConfig, init_schnet
from flashmd_tpu.models.zoo import cgschnet_1enh_like
from flashmd_tpu.simulation import LangevinSimulation


def small_model(message_passing="xla", precision="fp32"):
    ff, configs = cgschnet_1enh_like(
        n_atoms=32,
        batch_size=4,
        cutoff_upper=6.0,
        num_interactions=2,
        precision=precision,
        message_passing=message_passing,
        neighbor_capacity=32,
        seed=3,
    )
    return ff, configs


@pytest.mark.parametrize("mp", ["cheb", "dense", "pallas"])
def test_force_mae_vs_reference_path(mp):
    """Force MAE of each optimized path vs the fp32 XLA reference path."""
    ff_ref, configs = small_model("xla", "fp32")
    ff_opt = ff_ref.replace(
        schnet_config=dataclasses.replace(
            ff_ref.schnet_config, message_passing=mp
        )
    )
    system = collate(configs, beta=1.67)
    _, f_ref, _ = compute_energy_forces(
        ff_ref, system.pos, system.atom_types
    )
    _, f_opt, _ = compute_energy_forces(
        ff_opt, system.pos, system.atom_types
    )
    f_ref, f_opt = np.asarray(f_ref), np.asarray(f_opt)
    mae = np.abs(f_ref - f_opt).mean()
    scale = np.abs(f_ref).mean()
    assert mae / scale < 1e-3, f"{mp}: force MAE {mae/scale:.2e}"


def run_langevin(ff, configs, seed, n_steps=400):
    sim = LangevinSimulation(
        friction=1.0,
        dt=0.002,
        n_timesteps=n_steps,
        save_interval=20,
        save_energies=True,
        random_seed=seed,
        gptq=None,
    )
    sim.attach_model_and_configurations(ff, configs, beta=1.67)
    sim.simulate()
    pot = np.concatenate(sim.simulated_potential, axis=0)
    ke = np.concatenate(sim.simulated_kinetic_energies, axis=0)
    return pot, ke


@pytest.mark.heavy
def test_trajectories_statistically_indistinguishable():
    """Equilibrium statistics of the cheb path match the reference path.

    Different kernels => different fp rounding => different trajectories;
    the physical gate is that ensemble statistics agree (reference
    README.md:63-72 claims the same for its Triton path).
    """
    ff_ref, configs = small_model("xla", "fp32")
    ff_cheb = ff_ref.replace(
        schnet_config=dataclasses.replace(
            ff_ref.schnet_config, message_passing="cheb"
        )
    )
    pots, kes = [], []
    for seed, ff in [(11, ff_ref), (12, ff_ref), (11, ff_cheb)]:
        pot, ke = run_langevin(ff, configs, seed)
        half = pot.shape[0] // 2
        pots.append(pot[half:].mean())
        kes.append(ke[half:].mean())
    # seed-to-seed spread of the reference path bounds the acceptable
    # path-to-path difference
    seed_spread = abs(pots[0] - pots[1]) + 1e-3 * abs(pots[0])
    path_diff = abs(pots[0] - pots[2])
    assert path_diff < 5 * seed_spread + 0.05 * abs(pots[0])
    ke_spread = abs(kes[0] - kes[1]) + 1e-3 * abs(kes[0])
    assert abs(kes[0] - kes[2]) < 5 * ke_spread + 0.05 * abs(kes[0])


def test_bitwise_determinism_across_runs():
    """Same seed, same path => bitwise-identical forces (the north-star
    determinism guarantee; reference needed CSR kernels for this)."""
    ff, configs = small_model("cheb", "bf16")
    system = collate(configs, beta=1.67)
    fn = jax.jit(
        lambda p: compute_energy_forces(ff, p, system.atom_types)[1]
    )
    f1 = np.asarray(fn(system.pos))
    f2 = np.asarray(fn(system.pos))
    np.testing.assert_array_equal(f1, f2)
