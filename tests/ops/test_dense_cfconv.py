"""Dense all-pairs Pallas CFConv vs the XLA path (full-capacity neighbors)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashmd_tpu.models.cutoff import CosineCutoff
from flashmd_tpu.models.schnet import SchNetConfig, init_schnet, schnet_energy
from flashmd_tpu.ops.neighborlist import radius_neighbor_matrix

A, RCUT = 29, 4.0


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(8)
    cfg = SchNetConfig(
        hidden_channels=128,
        embedding_size=6,
        num_filters=128,
        num_interactions=2,
        num_rbf=50,
        cutoff=CosineCutoff(0.0, RCUT),
        output_hidden_layer_widths=(64,),
    )
    params = init_schnet(jax.random.PRNGKey(2), cfg)
    pos = jnp.asarray(rng.uniform(0, 5, (A, 3)), jnp.float32)
    types = jnp.asarray(rng.integers(0, 6, A), jnp.int32)
    nbr = radius_neighbor_matrix(pos, RCUT, capacity=A)
    return cfg, params, pos, types, nbr


def test_dense_matches_xla_energy(setup):
    cfg, params, pos, types, nbr = setup
    cfg_d = dataclasses.replace(cfg, message_passing="dense")
    e_x = float(schnet_energy(params, cfg, pos, types, nbr))
    e_d = float(schnet_energy(params, cfg_d, pos, types, None))
    np.testing.assert_allclose(e_d, e_x, rtol=1e-6)


def test_dense_matches_xla_forces(setup):
    cfg, params, pos, types, nbr = setup
    cfg_d = dataclasses.replace(cfg, message_passing="dense")
    g_x = jax.grad(lambda p: schnet_energy(params, cfg, p, types, nbr))(pos)
    g_d = jax.grad(lambda p: schnet_energy(params, cfg_d, p, types, None))(
        pos
    )
    gx, gd = np.asarray(g_x), np.asarray(g_d)
    assert np.abs(gx - gd).max() / np.abs(gx).max() < 1e-5


def test_dense_vmap(setup):
    cfg, params, pos, types, nbr = setup
    cfg_d = dataclasses.replace(cfg, message_passing="dense")
    pos_b = jnp.stack([pos, pos + 0.03, pos * 1.01])
    e = jax.vmap(lambda p: schnet_energy(params, cfg_d, p, types, None))(
        pos_b
    )
    nbr_b = jax.vmap(
        lambda p: radius_neighbor_matrix(p, RCUT, capacity=A)
    )(pos_b)
    e_ref = jax.vmap(
        lambda p, n: schnet_energy(params, cfg, p, types, n)
    )(pos_b, nbr_b)
    np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref), rtol=1e-6)


def test_dense_simulation_runs(setup):
    """End-to-end: dense path drives a short Langevin run without a
    neighbor list in the carry."""
    from flashmd_tpu.data.system import Configuration
    from flashmd_tpu.models.forcefield import ForceField
    from flashmd_tpu.simulation import LangevinSimulation

    cfg, params, pos, types, nbr = setup
    cfg_d = dataclasses.replace(cfg, message_passing="dense")
    ff = ForceField(
        schnet_params=params,
        priors={},
        schnet_config=cfg_d,
        neighbor_capacity=A,
    )
    sim = LangevinSimulation(
        dt=1e-4,
        friction=1.0,
        n_timesteps=20,
        save_interval=10,
        random_seed=4,
        gptq=None,
    )
    cfgs = [
        Configuration(
            pos=np.asarray(pos),
            atom_types=np.asarray(types),
            masses=np.ones(A),
        )
        for _ in range(2)
    ]
    sim.attach_model_and_configurations(ff, cfgs, beta=1.0)
    sim.simulate()
    coords = np.concatenate(sim.simulated_coords, axis=0)
    assert np.all(np.isfinite(coords))
    assert "nbr_idx" not in sim.final_carry
