"""Multi-device sharding on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashmd_tpu.parallel.mesh import (
    batch_sharding,
    make_replica_mesh,
    shard_carry,
)

from .test_integrators import chain_configs, harmonic_ff

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple devices"
)


def test_mesh_has_8_devices():
    mesh = make_replica_mesh()
    assert mesh.devices.size == 8


def test_sharded_langevin_matches_unsharded():
    from flashmd_tpu.simulation import LangevinSimulation

    def run(mesh):
        sim = LangevinSimulation(
            friction=1.0,
            dt=1e-3,
            n_timesteps=40,
            save_interval=10,
            random_seed=21,
            mesh=mesh,
        )
        sim.attach_model_and_configurations(
            harmonic_ff(4), chain_configs(8, 4), beta=1.0
        )
        sim.simulate()
        return np.concatenate(sim.simulated_coords, axis=0)

    ref = run(None)
    sharded = run(make_replica_mesh())
    np.testing.assert_allclose(ref, sharded, rtol=1e-6, atol=1e-7)


def test_pt_exchange_across_chips():
    """PT with replicas sharded across devices: the exchange permutation
    crosses chip boundaries (lowers to collectives) and stays correct."""
    from flashmd_tpu.simulation import PTSimulation

    def run(mesh):
        sim = PTSimulation(
            friction=1.0,
            dt=5e-3,
            n_timesteps=40,
            save_interval=10,
            exchange_interval=10,
            random_seed=3,
            mesh=mesh,
        )
        sim.attach_model_and_configurations(
            harmonic_ff(5), chain_configs(4, 5), [1.67, 1.16]
        )
        sim.simulate()
        return (
            np.concatenate(sim.simulated_coords, axis=0),
            int(sim.final_carry["n_exchange_approved"]),
        )

    coords_ref, acc_ref = run(None)
    coords_sh, acc_sh = run(make_replica_mesh())
    np.testing.assert_allclose(coords_ref, coords_sh, rtol=1e-6, atol=1e-7)
    assert acc_ref == acc_sh


def test_pt_all_devices_long_horizon():
    """n_replicas x n_indep spanning ALL 8 virtual devices, 200-step
    horizon with 20 exchange attempts across both parities: trajectories
    and the full acceptance/rejection statistics must match the unsharded
    run (VERDICT r1 #7)."""
    from flashmd_tpu.simulation import PTSimulation

    def run(mesh):
        sim = PTSimulation(
            friction=1.0,
            dt=5e-3,
            n_timesteps=200,
            save_interval=50,
            exchange_interval=10,
            random_seed=11,
            mesh=mesh,
        )
        # 4 betas x 2 independent configs = 8 = one per device; >= 3
        # replicas makes the even/odd exchange parities distinct pair sets.
        sim.attach_model_and_configurations(
            harmonic_ff(5), chain_configs(2, 5), [1.67, 1.45, 1.28, 1.16]
        )
        sim.simulate()
        return (
            np.concatenate(sim.simulated_coords, axis=0),
            int(sim.final_carry["n_exchange_approved"]),
            int(sim.final_carry["n_exchange_attempted"]),
            # accepts in the upper triangle, rejects in the lower
            np.asarray(sim.final_carry["acceptance_matrix"]),
        )

    coords_ref, acc_ref, att_ref, amat_ref = run(None)
    coords_sh, acc_sh, att_sh, amat_sh = run(make_replica_mesh())
    np.testing.assert_allclose(coords_ref, coords_sh, rtol=1e-5, atol=1e-6)
    assert (acc_ref, att_ref) == (acc_sh, att_sh)
    np.testing.assert_array_equal(amat_ref, amat_sh)
    # the horizon is long enough that exchanges actually happened
    assert acc_ref > 0


def test_uneven_batch_raises_through_simulation():
    """A mesh-attached Simulation whose batch is not divisible by the
    mesh size must fail loudly, not silently mis-shard."""
    from flashmd_tpu.simulation import LangevinSimulation

    sim = LangevinSimulation(
        friction=1.0,
        dt=1e-3,
        n_timesteps=10,
        save_interval=5,
        random_seed=0,
        mesh=make_replica_mesh(),
    )
    sim.attach_model_and_configurations(
        harmonic_ff(4), chain_configs(3, 4), beta=1.0
    )
    with pytest.raises(ValueError, match="not divisible"):
        sim.simulate()


def test_initialize_distributed_single_process_noop(monkeypatch):
    """No kwargs + no multi-host environment -> explicit no-op returning
    False. Single-worker coordinator-style variables (the axon environment
    exports TPU_WORKER_HOSTNAMES=localhost; single-node SLURM exports
    SLURM_JOB_ID) must NOT trip auto-init."""
    from flashmd_tpu.parallel import mesh as mesh_mod

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    monkeypatch.setenv("SLURM_JOB_ID", "424242")
    monkeypatch.delenv("SLURM_NTASKS", raising=False)
    assert mesh_mod.initialize_distributed() is False


def test_initialize_distributed_explicit_failure_propagates(monkeypatch):
    """Explicit coordination kwargs: jax.distributed failures must NOT be
    swallowed (a misconfigured multi-host job dies loudly)."""
    from flashmd_tpu.parallel import mesh as mesh_mod

    def boom(**kwargs):
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="coordinator unreachable"):
        mesh_mod.initialize_distributed(
            coordinator_address="127.0.0.1:1234",
            num_processes=2,
            process_id=0,
        )


def test_initialize_distributed_cluster_env_failure_propagates(monkeypatch):
    """Multi-host environment present (>1 task) -> auto-detect path;
    failures propagate rather than degrading to single-host."""
    from flashmd_tpu.parallel import mesh as mesh_mod

    monkeypatch.setenv("SLURM_NTASKS", "2")

    def boom(**kwargs):
        raise ValueError("could not auto-detect coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(ValueError, match="auto-detect"):
        mesh_mod.initialize_distributed()


def test_shard_carry_rejects_indivisible():
    mesh = make_replica_mesh()
    carry = {"pos": jnp.zeros((3, 4, 3))}
    with pytest.raises(ValueError, match="not divisible"):
        shard_carry(carry, mesh)


def test_graft_entry_dryrun():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "../../__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    mod.dryrun_multichip(8)
