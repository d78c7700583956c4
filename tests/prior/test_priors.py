"""Prior energy forms vs independent numpy evaluation."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashmd_tpu.prior.priors import (
    Prior,
    dihedral_prior,
    harmonic_prior,
    polynomial_prior,
    prior_energy,
    repulsion_prior,
    restricted_quartic_prior,
)

jax.config.update("jax_enable_x64", True)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def test_harmonic_bonds(rng):
    pos = rng.uniform(0, 3, size=(6, 3))
    types = np.array([0, 1, 0, 1, 0, 1])
    mapping = np.array([[0, 2, 4], [1, 3, 5]])
    stats = {
        (0, 1): {"x_0": 1.0, "k": 2.0},
        (1, 0): {"x_0": 1.5, "k": 3.0},
    }
    prior = harmonic_prior(
        stats, types, mapping, kind="harmonic_bonds", dtype=jnp.float64
    )
    got = float(prior_energy(prior, jnp.asarray(pos)))
    want = 0.0
    for t in range(3):
        i, j = mapping[:, t]
        d = np.linalg.norm(pos[j] - pos[i])
        k, x0 = (2.0, 1.0) if (types[i], types[j]) == (0, 1) else (3.0, 1.5)
        want += k * (d - x0) ** 2
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_harmonic_angles_uses_cos(rng):
    pos = rng.uniform(0, 3, size=(6, 3))
    types = np.array([0, 0, 0, 0, 0, 0])
    mapping = np.array([[0, 3], [1, 4], [2, 5]])
    stats = {(0, 0, 0): {"x_0": 0.2, "k": 5.0}}
    prior = harmonic_prior(
        stats, types, mapping, kind="harmonic_angles", dtype=jnp.float64
    )
    got = float(prior_energy(prior, jnp.asarray(pos)))
    want = 0.0
    for t in range(2):
        i, j, k_ = mapping[:, t]
        v1, v2 = pos[i] - pos[j], pos[k_] - pos[j]
        cos = v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2))
        want += 5.0 * (cos - 0.2) ** 2
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_repulsion(rng):
    pos = rng.uniform(0, 3, size=(4, 3))
    types = np.array([0, 0, 1, 1])
    mapping = np.array([[0, 0], [2, 3]])
    stats = {(0, 1): {"sigma": 0.8}, (0, 0): {"sigma": 0.5}}
    prior = repulsion_prior(stats, types, mapping, dtype=jnp.float64)
    got = float(prior_energy(prior, jnp.asarray(pos)))
    want = sum(
        (0.8 / np.linalg.norm(pos[j] - pos[i])) ** 6
        for i, j in [(0, 2), (0, 3)]
    )
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_dihedral_fourier(rng):
    pos = rng.uniform(0, 2, size=(8, 3))
    types = np.zeros(8, dtype=int)
    mapping = np.array([[0, 4], [1, 5], [2, 6], [3, 7]])
    n_degs = 3
    k1 = [0.3, -0.2, 0.1]
    k2 = [0.5, 0.4, -0.6]
    stats = {
        (0, 0, 0, 0): {
            "k1s": {f"k1_{i + 1}": k1[i] for i in range(n_degs)},
            "k2s": {f"k2_{i + 1}": k2[i] for i in range(n_degs)},
            "v_0": 0.7,
        }
    }
    prior = dihedral_prior(
        stats, types, mapping, n_degs=n_degs, dtype=jnp.float64
    )
    got = float(prior_energy(prior, jnp.asarray(pos)))

    from flashmd_tpu.ops.geometry import compute_torsions

    theta = np.asarray(compute_torsions(jnp.asarray(pos), jnp.asarray(mapping)))
    want = 0.0
    for t in theta:
        want += 0.7 + sum(
            k1[n] * math.sin((n + 1) * t) + k2[n] * math.cos((n + 1) * t)
            for n in range(n_degs)
        )
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_polynomial(rng):
    pos = rng.uniform(0, 2, size=(3, 3))
    types = np.zeros(3, dtype=int)
    mapping = np.array([[0], [1], [2]])
    ks = [1.0, -0.5, 0.25, 2.0]
    stats = {
        (0, 0, 0): {
            "ks": {f"k_{i + 1}": ks[i] for i in range(4)},
            "v_0": 0.1,
        }
    }
    prior = polynomial_prior(
        stats, types, mapping, n_degs=4, kind="quartic_angles",
        dtype=jnp.float64,
    )
    got = float(prior_energy(prior, jnp.asarray(pos)))
    v1 = pos[0] - pos[1]
    v2 = pos[2] - pos[1]
    x = v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2))
    want = 0.1 + sum(ks[n] * x ** (n + 1) for n in range(4))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_restricted_quartic(rng):
    pos = rng.uniform(0, 2, size=(3, 3))
    types = np.zeros(3, dtype=int)
    mapping = np.array([[0], [1], [2]])
    coefs = dict(a=1.0, b=-0.3, c=0.2, d=0.5, k=0.05, v_0=1.5)
    stats = {(0, 0, 0): coefs}
    prior = restricted_quartic_prior(stats, types, mapping, dtype=jnp.float64)
    got = float(prior_energy(prior, jnp.asarray(pos)))
    v1 = pos[0] - pos[1]
    v2 = pos[2] - pos[1]
    n = np.linalg.norm(np.cross(v1, v2))
    theta = np.arctan2(n, v1 @ v2)
    cos, sin = np.cos(theta), np.sin(theta)
    want = (
        coefs["a"] * cos**4
        + coefs["b"] * cos**3
        + coefs["c"] * cos**2
        + coefs["d"] * cos
        + coefs["k"] / sin**2
        + coefs["v_0"]
    )
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_shifted_periodic_impropers():
    # Feature transform: theta in (-pi, 0) -> theta + 2pi, then - pi.
    pos = np.array(
        [[0.0, 1.0, 0.0], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 0.0, -1.0]]
    )
    mapping = np.array([[0], [1], [2], [3]])
    types = np.zeros(4, dtype=int)
    stats = {(0, 0, 0, 0): {"x_0": 0.0, "k": 1.0}}
    prior = harmonic_prior(
        stats,
        types,
        mapping,
        kind="shifted_periodic_harmonic_impropers",
        dtype=jnp.float64,
    )
    from flashmd_tpu.ops.geometry import compute_torsions

    theta = float(compute_torsions(jnp.asarray(pos), jnp.asarray(mapping))[0])
    shifted = (theta + 2 * math.pi if theta < 0 else theta) - math.pi
    got = float(prior_energy(prior, jnp.asarray(pos)))
    np.testing.assert_allclose(got, shifted**2, rtol=1e-9)


def test_prior_grads_finite(rng):
    pos = jnp.asarray(rng.uniform(0, 3, size=(6, 3)))
    types = np.array([0, 1, 0, 1, 0, 1])
    mapping = np.array([[0, 2], [1, 3]])
    prior = harmonic_prior(
        {(0, 1): {"x_0": 1.0, "k": 2.0}, (1, 0): {"x_0": 1.0, "k": 2.0}},
        types,
        mapping,
        dtype=jnp.float64,
    )
    g = jax.grad(lambda p: prior_energy(prior, p))(pos)
    assert np.all(np.isfinite(np.asarray(g)))


def test_prior_is_pytree(rng):
    mapping = jnp.asarray(np.array([[0], [1]]), dtype=jnp.int32)
    prior = Prior(
        index_mapping=mapping,
        params={"x0": jnp.ones(1), "k": jnp.ones(1)},
        kind="harmonic_bonds",
        name="bonds",
        feature="distance",
    )
    leaves = jax.tree.leaves(prior)
    assert len(leaves) == 3
    vmapped = jax.vmap(lambda p, x: prior_energy(p, x), in_axes=(None, 0))
    pos = jnp.asarray(np.random.default_rng(0).uniform(size=(4, 3, 3)))
    out = vmapped(prior, pos)
    assert out.shape == (4,)
