"""Runtime Verlet-skin soundness check (VERDICT r1 #5).

``neighbor_rebuild_interval > 1`` amortizes the neighbor search; the list
stays exact only while no atom moves more than skin/2 between rebuilds.
The scan tracks the max displacement since the last rebuild
(simulation/base.py:_track_neighbor_displacement) and export warns when it
exceeds skin/2 — these tests drive both sides of that guard.
"""

import warnings

import numpy as np
import pytest

from flashmd_tpu.models.zoo import cgschnet_1enh_like
from flashmd_tpu.simulation import LangevinSimulation


def _make(n_timesteps, dt, skin, interval, beta):
    ff, configs = cgschnet_1enh_like(
        n_atoms=16, batch_size=2, num_interactions=1, precision="fp32",
        neighbor_capacity=15, cutoff_upper=6.0,
    )
    sim = LangevinSimulation(
        dt=dt,
        friction=1.0,
        n_timesteps=n_timesteps,
        save_interval=n_timesteps // 2,
        random_seed=3,
        neighbor_skin=skin,
        neighbor_rebuild_interval=interval,
    )
    sim.attach_model_and_configurations(ff, configs, beta=beta)
    return sim


def test_fast_system_triggers_skin_warning():
    """Hot system + tiny skin + long rebuild interval -> the stale-list
    guard must fire."""
    sim = _make(n_timesteps=40, dt=0.01, skin=0.02, interval=20, beta=0.05)
    with pytest.warns(RuntimeWarning, match="Verlet-skin"):
        sim.simulate()


def test_slow_system_is_sound_and_silent():
    """Cold system + generous skin: no warning, and the tracked
    displacement stays under skin/2."""
    sim = _make(n_timesteps=40, dt=1e-5, skin=1.0, interval=10, beta=10.0)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        sim.simulate()


def test_every_step_rebuild_has_no_tracking_overhead():
    """interval=1 rebuilds every step (always exact) — the displacement
    tracker must not be added to the carry at all."""
    sim = _make(n_timesteps=10, dt=1e-4, skin=1.0, interval=1, beta=1.0)
    sim.simulate()
    coords = np.concatenate(sim.simulated_coords, axis=0)
    assert np.all(np.isfinite(coords))
