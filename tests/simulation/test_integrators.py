"""Integrator correctness: energy conservation, thermostat statistics,
checkpoint/resume, file outputs.

Covers the operational-validation role of the reference
(src/flashmd/simulation/base.py:679-690, 1317-1326) plus the statistical
tests the reference lacks.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashmd_tpu.data.system import Configuration
from flashmd_tpu.models.forcefield import ForceField
from flashmd_tpu.prior.priors import Prior
from flashmd_tpu.simulation import (
    LangevinSimulation,
    NVESimulation,
    OverdampedSimulation,
)


def harmonic_ff(n_atoms: int, k: float = 1.0, x0: float = 1.0) -> ForceField:
    """Pure-prior force field: chain of harmonic bonds (no SchNet)."""
    mapping = np.stack([np.arange(n_atoms - 1), np.arange(1, n_atoms)])
    n = mapping.shape[1]
    prior = Prior(
        index_mapping=jnp.asarray(mapping, dtype=jnp.int32),
        params={
            "x0": jnp.full((n,), x0, jnp.float32),
            "k": jnp.full((n,), k, jnp.float32),
        },
        kind="harmonic_bonds",
        name="bonds",
        feature="distance",
    )
    return ForceField(schnet_params=None, priors={"bonds": prior})


def chain_configs(n_sims: int, n_atoms: int, spacing: float = 1.0):
    rng = np.random.default_rng(0)
    cfgs = []
    for _ in range(n_sims):
        pos = np.zeros((n_atoms, 3))
        pos[:, 0] = np.arange(n_atoms) * spacing
        pos += rng.normal(scale=0.05, size=pos.shape)
        cfgs.append(
            Configuration(
                pos=pos,
                atom_types=np.zeros(n_atoms, dtype=int),
                masses=np.ones(n_atoms),
            )
        )
    return cfgs


def test_nve_conserves_energy(tmp_path):
    sim = NVESimulation(
        dt=1e-3,
        n_timesteps=200,
        save_interval=10,
        save_energies=True,
        random_seed=1,
    )
    sim.attach_model_and_configurations(
        harmonic_ff(5), chain_configs(4, 5), beta=1.0
    )
    sim.simulate()
    pot = np.concatenate(sim.simulated_potential, axis=0)  # [frames, S]
    assert np.all(np.isfinite(pot))


def test_nve_total_energy_drift_small():
    sim = NVESimulation(
        dt=5e-4,
        n_timesteps=400,
        save_interval=10,
        save_energies=True,
        random_seed=3,
    )
    sim.attach_model_and_configurations(
        harmonic_ff(6), chain_configs(2, 6), beta=2.0
    )
    sim.simulate()
    pot = np.concatenate(sim.simulated_potential, axis=0)
    ke = np.concatenate(sim.simulated_kinetic_energies, axis=0)
    total = pot + ke
    drift = np.abs(total - total[0]).max()
    assert drift < 5e-3 * np.abs(total[0]).max() + 5e-3


def test_langevin_equipartition():
    """Thermostat statistics: <KE> per DOF ~ 1/(2 beta)."""
    beta = 2.0
    n_atoms, n_sims = 8, 16
    sim = LangevinSimulation(
        friction=5.0,
        dt=0.02,
        n_timesteps=3000,
        save_interval=50,
        save_energies=True,
        random_seed=7,
    )
    sim.attach_model_and_configurations(
        harmonic_ff(n_atoms), chain_configs(n_sims, n_atoms), beta=beta
    )
    sim.simulate()
    ke = np.concatenate(sim.simulated_kinetic_energies, axis=0)
    # discard first half (equilibration)
    ke_mean = ke[ke.shape[0] // 2 :].mean()
    dof = 3 * n_atoms
    expected = dof / (2 * beta)
    assert abs(ke_mean - expected) / expected < 0.1


def test_overdamped_runs_and_moves():
    sim = OverdampedSimulation(
        friction=1.0,
        dt=1e-4,
        n_timesteps=100,
        save_interval=10,
        random_seed=5,
    )
    cfgs = chain_configs(3, 4)
    sim.attach_model_and_configurations(harmonic_ff(4), cfgs, beta=1.0)
    sim.simulate()
    coords = np.concatenate(sim.simulated_coords, axis=0)
    assert coords.shape == (10, 3, 4, 3)
    assert not np.allclose(coords[0], coords[-1])


def test_file_outputs_and_resume(tmp_path):
    kwargs = dict(
        friction=1.0,
        dt=1e-3,
        save_interval=5,
        export_interval=25,
        save_forces=True,
        save_energies=True,
        create_checkpoints=True,
        output_dir=str(tmp_path),
        random_seed=9,
    )
    sim = LangevinSimulation(
        n_timesteps=50, filename="traj", **kwargs
    )
    sim.attach_model_and_configurations(
        harmonic_ff(4), chain_configs(2, 4), beta=1.0
    )
    sim.simulate()

    c0 = np.load(tmp_path / "traj_coords_0000.npy")
    assert c0.shape == (2, 5, 4, 3)  # (n_sims, frames, atoms, dims)
    assert (tmp_path / "traj_coords_0001.npy").exists()
    assert (tmp_path / "traj_forces_0000.npy").exists()
    assert (tmp_path / "traj_potential_0000.npy").exists()
    assert (tmp_path / "traj_kineticenergy_0000.npy").exists()
    assert (tmp_path / "traj_checkpoint_0000.npz").exists()

    # Resume: continue to 100 steps from the latest checkpoint.
    sim2 = LangevinSimulation(
        n_timesteps=100,
        filename="traj",
        read_checkpoint_file=True,
        **kwargs,
    )
    assert sim2.current_timestep == 2
    sim2.attach_model_and_configurations(
        harmonic_ff(4), chain_configs(2, 4), beta=1.0
    )
    # resumed positions == checkpointed positions
    ck = np.load(tmp_path / "traj_checkpoint_0001.npz")
    np.testing.assert_allclose(
        np.asarray(sim2.initial_system.pos), ck["pos"], rtol=1e-6
    )
    sim2.simulate()
    assert (tmp_path / "traj_coords_0002.npy").exists()
    assert (tmp_path / "traj_coords_0003.npy").exists()


def test_specialized_model_dump(tmp_path):
    """Attach dumps the fully specialized model + configurations
    (native analog of the reference's _specialized_model_and_config.pt,
    reference base.py:330-334); the dump is consumable both as a
    model_file and as a structure_file."""
    from flashmd_tpu.models.checkpoint_io import (
        load_native_configurations,
        load_native_model,
    )
    from flashmd_tpu.models.zoo import cgschnet_1enh_like

    ff, cfgs = cgschnet_1enh_like(
        n_atoms=8, batch_size=2, num_interactions=1, precision="bf16",
        message_passing="cheb", cheb_order=8, neighbor_capacity=8,
    )
    sim = LangevinSimulation(
        friction=1.0, dt=1e-3, n_timesteps=10, save_interval=5,
        filename="dumped", output_dir=str(tmp_path),
    )
    sim.attach_model_and_configurations(ff, cfgs, beta=1.67)

    path = tmp_path / "dumped_specialized_model_and_config.pkl"
    assert path.exists()
    model = load_native_model(str(path))
    # the dump holds the ATTACHED model: the Chebyshev fit is baked in
    assert "cheb_fit" in model.schnet_params
    configs = load_native_configurations(str(path))
    assert len(configs) == len(cfgs)
    np.testing.assert_allclose(
        np.asarray(configs[0].pos), np.asarray(cfgs[0].pos)
    )
    # leaves are numpy (host-portable, no device buffers pickled)
    assert isinstance(model.schnet_params["embedding"], np.ndarray)


def test_profiler_window_writes_trace(tmp_path):
    """profile_start/end_step capture a jax.profiler trace at launch
    granularity (reference base.py:561-562, 634-636 used
    cudaProfilerStart/Stop)."""
    sim = LangevinSimulation(
        friction=1.0, dt=1e-3, n_timesteps=40, save_interval=5,
        export_interval=20, filename="prof", output_dir=str(tmp_path),
        profile_start_step=20, profile_end_step=40,
    )
    sim.attach_model_and_configurations(
        harmonic_ff(4), chain_configs(2, 4), beta=1.0
    )
    sim.simulate()
    trace_dir = tmp_path / "prof_trace"
    assert trace_dir.is_dir()
    # xplane protobuf lands under plugins/profile/<ts>/
    assert list(trace_dir.rglob("*.xplane.pb"))


def test_divergence_guard_raises():
    sim = NVESimulation(
        dt=10.0,  # absurd timestep -> blow-up
        n_timesteps=100,
        save_interval=10,
        random_seed=2,
    )
    sim.attach_model_and_configurations(
        harmonic_ff(5, k=50.0), chain_configs(2, 5), beta=1.0
    )
    with pytest.raises(RuntimeError, match="blew up"):
        sim.simulate()


def test_save_interval_validation():
    with pytest.raises(ValueError):
        LangevinSimulation(n_timesteps=100, save_interval=33)


def test_export_requires_filename():
    with pytest.raises(RuntimeError):
        LangevinSimulation(
            n_timesteps=100, save_interval=10, export_interval=50
        )


def test_langevin_deterministic_same_seed():
    def run():
        sim = LangevinSimulation(
            friction=1.0,
            dt=1e-3,
            n_timesteps=50,
            save_interval=10,
            random_seed=42,
        )
        sim.attach_model_and_configurations(
            harmonic_ff(4), chain_configs(2, 4), beta=1.0
        )
        sim.simulate()
        return np.concatenate(sim.simulated_coords, axis=0)

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)


def test_pipelined_exports_match_synchronous(tmp_path):
    """The pipelined export loop (dispatch launch k+1 before fetching /
    guarding / writing launch k's frames — the default) must produce
    bit-identical trajectories, npy exports, and checkpoints to the
    synchronous ordering. A no-op HOST sim_subroutine forces the
    synchronous path (simulate() disables pipelining when a host
    subroutine may mutate the carry between segments) without changing
    the physics, giving a true A/B of the two orderings."""

    def run(tag, force_synchronous):
        out = tmp_path / tag
        out.mkdir()
        kwargs = {}
        if force_synchronous:
            kwargs.update(
                sim_subroutine=lambda carry: carry,
                sim_subroutine_interval=20,
            )
        sim = LangevinSimulation(
            friction=1.0, dt=1e-3, n_timesteps=60, save_interval=5,
            export_interval=20, filename="t", output_dir=str(out),
            save_forces=True, save_energies=True,
            create_checkpoints=True, random_seed=11, **kwargs,
        )
        sim.attach_model_and_configurations(
            harmonic_ff(4), chain_configs(2, 4), beta=1.0
        )
        sim.simulate()
        return out, np.concatenate(sim.simulated_coords, axis=0)

    out1, coords1 = run("pipelined", False)
    out0, coords0 = run("synchronous", True)
    np.testing.assert_array_equal(coords1, coords0)
    names1 = sorted(p.name for p in out1.iterdir())
    assert names1 == sorted(p.name for p in out0.iterdir())
    assert any(n.endswith(".npy") for n in names1)
    assert any(n.endswith(".npz") for n in names1)
    for name in names1:
        if name.endswith(".npy"):
            np.testing.assert_array_equal(
                np.load(out1 / name), np.load(out0 / name)
            )
        elif name.endswith(".npz"):
            a = np.load(out1 / name)
            b = np.load(out0 / name)
            assert sorted(a.files) == sorted(b.files)
            for key in a.files:
                np.testing.assert_array_equal(a[key], b[key])


def test_save_subroutine_called_and_mutation_propagates(tmp_path):
    """save_subroutine(carry, n) runs at each export with the live carry,
    and a carry mutation it makes reaches subsequent launches — which
    requires the synchronous export ordering (simulate() disables
    pipelining when the hook is installed; under the pipelined order the
    next launch would already be dispatched and the mutation silently
    lost)."""
    calls = []

    def freeze(carry, n):
        calls.append(n)
        carry["vel"] = jnp.zeros_like(carry["vel"])
        carry["pos"] = jnp.zeros_like(carry["pos"])

    def run(hook):
        out = tmp_path / ("hook" if hook else "nohook")
        out.mkdir()
        sim = LangevinSimulation(
            friction=1.0, dt=1e-3, n_timesteps=40, save_interval=5,
            export_interval=20, filename="t", output_dir=str(out),
            random_seed=7, save_subroutine=freeze if hook else None,
        )
        sim.attach_model_and_configurations(
            harmonic_ff(3), chain_configs(2, 3), beta=1.0
        )
        sim.simulate()
        return np.concatenate(sim.simulated_coords, axis=0)

    base = run(hook=False)
    calls.clear()
    mutated = run(hook=True)
    assert calls == [4, 8]  # one call per export, n = frame count
    # segment 1 identical; segment 2 restarts from the zeroed state
    np.testing.assert_array_equal(mutated[:4], base[:4])
    assert not np.allclose(mutated[4:], base[4:])


def test_launch_cap_preserves_trajectory():
    """max_steps_per_launch bounds the device-program length without
    changing results: the scan semantics are identical, only the launch
    boundaries move. Counts launches via _build_rollout to prove the
    split actually happened."""

    def run(max_steps_per_launch):
        sim = LangevinSimulation(
            friction=1.0,
            dt=1e-3,
            n_timesteps=120,
            save_interval=10,
            random_seed=42,
            max_steps_per_launch=max_steps_per_launch,
        )
        sim.attach_model_and_configurations(
            harmonic_ff(4), chain_configs(2, 4), beta=1.0
        )
        built = []
        orig = sim._build_rollout

        def counting_build(n_frames):
            built.append(n_frames)
            return orig(n_frames)

        sim._build_rollout = counting_build
        sim.simulate()
        return np.concatenate(sim.simulated_coords, axis=0), built

    # export_interval=None -> one 120-step export segment. Uncapped: one
    # 12-frame program; capped at 50 steps: 5-frame launches (12 = 5+5+2).
    a, built_a = run(None)
    b, built_b = run(50)
    assert built_a == [12]
    assert built_b == [5, 2]  # distinct sizes compile once each (cached)
    np.testing.assert_array_equal(a, b)


def test_launch_cap_validation():
    with pytest.raises(ValueError, match="max_steps_per_launch"):
        LangevinSimulation(
            n_timesteps=100, save_interval=10, max_steps_per_launch=0
        )


def test_resume_continues_rng_stream(tmp_path):
    """Resume must CONTINUE the stochastic stream, not replay it: a run
    of 2N steps and a run of N steps resumed to 2N (same seed) must
    produce identical trajectories — the checkpoint's saved rng_key is
    restored into the carry (the reference restores only pos/vel, so a
    resumed run there re-experiences its own first-steps noise;
    reference base.py:1023-1074 — a defect we do not copy)."""
    kwargs = dict(
        friction=1.0,
        dt=1e-3,
        save_interval=5,
        export_interval=25,
        create_checkpoints=True,
        random_seed=9,
    )
    dir_a = tmp_path / "a"
    dir_b = tmp_path / "b"
    dir_a.mkdir()
    dir_b.mkdir()

    sim_a = LangevinSimulation(
        n_timesteps=50, filename="traj", output_dir=str(dir_a), **kwargs
    )
    sim_a.attach_model_and_configurations(
        harmonic_ff(4), chain_configs(2, 4), beta=1.0
    )
    sim_a.simulate()

    sim_b1 = LangevinSimulation(
        n_timesteps=25, filename="traj", output_dir=str(dir_b), **kwargs
    )
    sim_b1.attach_model_and_configurations(
        harmonic_ff(4), chain_configs(2, 4), beta=1.0
    )
    sim_b1.simulate()

    # The saved key has genuinely advanced past the seed-derived key.
    ck = np.load(dir_b / "traj_checkpoint_0000.npz")
    assert "rng_key" in ck
    assert not np.array_equal(
        ck["rng_key"], np.asarray(jax.random.PRNGKey(9))
    )

    sim_b2 = LangevinSimulation(
        n_timesteps=50,
        filename="traj",
        output_dir=str(dir_b),
        read_checkpoint_file=True,
        **kwargs,
    )
    sim_b2.attach_model_and_configurations(
        harmonic_ff(4), chain_configs(2, 4), beta=1.0
    )
    sim_b2.simulate()

    # Segment 1 (pre-checkpoint) agrees trivially; segment 2 agrees ONLY
    # if the resumed run continued the rng stream.
    np.testing.assert_array_equal(
        np.load(dir_a / "traj_coords_0000.npy"),
        np.load(dir_b / "traj_coords_0000.npy"),
    )
    np.testing.assert_allclose(
        np.load(dir_a / "traj_coords_0001.npy"),
        np.load(dir_b / "traj_coords_0001.npy"),
        rtol=1e-6,
        atol=1e-7,
    )
    # and the resumed segment is NOT a noise replay of the first segment
    # (the old-defect signature: identical displacement patterns).
    c0 = np.load(dir_b / "traj_coords_0000.npy")
    c1 = np.load(dir_b / "traj_coords_0001.npy")
    assert not np.allclose(np.diff(c0, axis=1), np.diff(c1, axis=1))
