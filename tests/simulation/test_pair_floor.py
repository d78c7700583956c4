"""Runtime soundness guard for the restricted Chebyshev fit domain.

``cheb_d_min > 0`` fits the filter on [d_min, rcut] only (geometric
convergence on the physically reachable pair range — see
benchmarks/fit_domain_probe.py); pairs below d_min clamp to the bounded
d_min filter value. The simulation samples the min pair distance at
every saved frame (simulation/base.py:_pair_floor_outputs) and export
warns on a floor violation — these tests drive both sides of that guard.
"""

import dataclasses
import warnings

import numpy as np
import pytest

from flashmd_tpu.models.zoo import cgschnet_1enh_like
from flashmd_tpu.simulation import LangevinSimulation


def _make(cheb_d_min, beta=2.0, dt=1e-4):
    ff, configs = cgschnet_1enh_like(
        n_atoms=16, batch_size=2, num_interactions=1, precision="fp32",
        neighbor_capacity=15, cutoff_upper=6.0, message_passing="cheb",
        cheb_order=32,
    )
    ff = ff.replace(
        schnet_config=dataclasses.replace(
            ff.schnet_config, cheb_d_min=cheb_d_min
        )
    )
    sim = LangevinSimulation(
        dt=dt,
        friction=1.0,
        n_timesteps=20,
        save_interval=10,
        random_seed=3,
    )
    sim.attach_model_and_configurations(ff, configs, beta=beta)
    return sim


def test_floor_violation_warns():
    """A fit floor ABOVE the system's actual pair distances must fire the
    guard (the zoo chain has ~3.8 A bonds; floor 5.0 is violated at t=0)."""
    sim = _make(cheb_d_min=5.0)
    with pytest.warns(RuntimeWarning, match="fit-domain floor"):
        sim.simulate()


def test_sound_floor_is_silent_and_sampled():
    """A floor below the physical approach distance: no warning, and the
    sampled min pair distance is recorded above the floor."""
    sim = _make(cheb_d_min=1.0)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        sim.simulate()
    coords = np.concatenate(sim.simulated_coords, axis=0)
    assert np.all(np.isfinite(coords))


def test_full_domain_has_no_sampling_overhead():
    """cheb_d_min=0 (default): the pair-floor reduction must not be added
    to the frame outputs at all."""
    import jax

    sim = _make(cheb_d_min=0.0)
    out = sim._frame_outputs(
        sim._init_carry(sim.initial_system, jax.random.PRNGKey(0))
    )
    assert "pair_d_min" not in out


def test_restricted_domain_matches_full_on_sound_geometry():
    """On a system whose pairs all sit above d_min, the restricted-domain
    model must agree with the full-domain model to fit tolerance (the
    restriction only removes unused approximation territory)."""
    import jax.numpy as jnp

    from flashmd_tpu.data.system import collate
    from flashmd_tpu.models.forcefield import compute_energy_forces

    ff, configs = cgschnet_1enh_like(
        n_atoms=16, batch_size=2, num_interactions=1, precision="fp32",
        neighbor_capacity=15, cutoff_upper=6.0, message_passing="cheb",
        cheb_order=64,
    )
    system = collate(configs, beta=1.67)
    pos = jnp.asarray(system.pos)
    types = system.atom_types

    _, f_full, _ = compute_energy_forces(ff, pos, types)
    ff_r = ff.replace(
        schnet_config=dataclasses.replace(ff.schnet_config, cheb_d_min=1.5)
    )
    _, f_rest, _ = compute_energy_forces(ff_r, pos, types)
    scale = np.abs(np.asarray(f_full)).max()
    assert (
        np.abs(np.asarray(f_rest - f_full)).max() / scale < 2e-3
    ), "restricted fit should agree with the full fit on sound geometry"
