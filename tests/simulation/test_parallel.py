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
