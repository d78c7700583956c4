"""ForceField composition: component sums, force correctness, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashmd_tpu.models.cutoff import CosineCutoff
from flashmd_tpu.models.forcefield import (
    ForceField,
    compute_energy_forces,
    total_energy,
)
from flashmd_tpu.models.schnet import SchNetConfig, init_schnet
from flashmd_tpu.ops.neighborlist import batched_radius_neighbor_matrix
from flashmd_tpu.prior.priors import harmonic_prior

jax.config.update("jax_enable_x64", True)

S, A = 3, 9
RCUT = 3.0


@pytest.fixture
def ff_and_data():
    rng = np.random.default_rng(5)
    config = SchNetConfig(
        hidden_channels=16,
        embedding_size=4,
        num_filters=16,
        num_interactions=2,
        num_rbf=8,
        cutoff=CosineCutoff(0.0, RCUT),
        output_hidden_layer_widths=(8,),
    )
    params = init_schnet(jax.random.PRNGKey(1), config, dtype=jnp.float64)
    types = rng.integers(0, 4, size=(A,))
    bonds = np.stack([np.arange(A - 1), np.arange(1, A)])
    stats = {
        (i, j): {"x_0": 1.0, "k": 3.0} for i in range(4) for j in range(4)
    }
    prior = harmonic_prior(stats, types, bonds, dtype=jnp.float64)
    ff = ForceField(
        schnet_params=params,
        priors={"bonds": prior},
        schnet_config=config,
        neighbor_capacity=A,
    )
    pos = jnp.asarray(rng.uniform(0, 2.5, size=(S, A, 3)))
    return ff, pos, jnp.asarray(types, dtype=jnp.int32)


def test_components_sum_to_total(ff_and_data):
    ff, pos, types = ff_and_data
    potential, forces, comps = compute_energy_forces(ff, pos, types)
    assert set(comps.keys()) == {"SchNet", "bonds"}
    np.testing.assert_allclose(
        np.asarray(potential),
        np.asarray(comps["SchNet"] + comps["bonds"]),
        rtol=1e-12,
    )
    assert forces.shape == (S, A, 3)


def test_forces_are_negative_gradient(ff_and_data):
    ff, pos, types = ff_and_data
    nbr = batched_radius_neighbor_matrix(pos, RCUT, capacity=A)
    _, forces, _ = compute_energy_forces(ff, pos, types, nbr)

    eps = 1e-6
    rng = np.random.default_rng(0)
    for _ in range(4):
        s = rng.integers(0, S)
        i = rng.integers(0, A)
        d = rng.integers(0, 3)

        def e(p):
            totals, _ = jax.vmap(
                lambda q, n: total_energy(ff, q, types, n)
            )(p, nbr)
            return float(jnp.sum(totals))

        dp = jnp.zeros_like(pos).at[s, i, d].set(eps)
        fd = (e(pos + dp) - e(pos - dp)) / (2 * eps)
        np.testing.assert_allclose(
            -float(forces[s, i, d]), fd, rtol=1e-5, atol=1e-8
        )


def test_sims_are_independent(ff_and_data):
    """Forces of sim 0 unaffected by positions of sim 1 (batch isolation)."""
    ff, pos, types = ff_and_data
    _, f0, _ = compute_energy_forces(ff, pos, types)
    pos2 = pos.at[1].add(0.37)
    _, f1, _ = compute_energy_forces(ff, pos2, types)
    np.testing.assert_array_equal(np.asarray(f0[0]), np.asarray(f1[0]))
    np.testing.assert_array_equal(np.asarray(f0[2]), np.asarray(f1[2]))


def test_bitwise_deterministic(ff_and_data):
    ff, pos, types = ff_and_data
    fn = jax.jit(lambda p: compute_energy_forces(ff, p, types))
    p1, f1, _ = fn(pos)
    p2, f2, _ = fn(pos)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_prior_only_forcefield(ff_and_data):
    ff, pos, types = ff_and_data
    ff_priors = ForceField(schnet_params=None, priors=ff.priors)
    potential, forces, comps = compute_energy_forces(ff_priors, pos, types)
    assert set(comps.keys()) == {"bonds"}
    assert np.all(np.isfinite(np.asarray(forces)))
