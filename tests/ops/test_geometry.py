"""Geometry kernels vs independent numpy references.

The expectations below re-derive each formula from the reference docs
(src/flashmd/geometry/internal_coordinates.py) in plain numpy, so agreement
checks semantics rather than implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashmd_tpu.ops.geometry import (
    compute_angles_cos,
    compute_angles_raw,
    compute_distance_vectors,
    compute_distances,
    compute_torsions,
    safe_norm,
)

jax.config.update("jax_enable_x64", True)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def test_safe_norm_matches_euclidean(rng):
    x = rng.normal(size=(17, 3))
    got = np.asarray(safe_norm(jnp.asarray(x), axis=-1, keepdims=False))
    want = np.linalg.norm(x, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_safe_norm_zero_has_finite_grad():
    g = jax.grad(lambda x: safe_norm(x, axis=-1, keepdims=False).sum())(
        jnp.zeros((4, 3))
    )
    assert np.all(np.isfinite(np.asarray(g)))


def test_compute_distances(rng):
    pos = rng.normal(size=(10, 3))
    mapping = np.array([[0, 1, 2, 5], [3, 4, 9, 6]])
    got = np.asarray(compute_distances(jnp.asarray(pos), jnp.asarray(mapping)))
    want = np.linalg.norm(pos[mapping[1]] - pos[mapping[0]], axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_distance_vectors_unit_norm(rng):
    pos = rng.normal(size=(8, 3))
    mapping = np.array([[0, 1, 2], [3, 4, 5]])
    d, u = compute_distance_vectors(jnp.asarray(pos), jnp.asarray(mapping))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(u), axis=-1), 1.0, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(d)[:, 0],
        np.linalg.norm(pos[mapping[1]] - pos[mapping[0]], axis=-1),
        atol=1e-7,
    )


def test_angles_cos_and_raw_agree(rng):
    pos = rng.normal(size=(12, 3))
    mapping = np.array([[0, 3, 6], [1, 4, 7], [2, 5, 8]])
    cos = np.asarray(compute_angles_cos(jnp.asarray(pos), jnp.asarray(mapping)))
    theta = np.asarray(
        compute_angles_raw(jnp.asarray(pos), jnp.asarray(mapping))
    )
    np.testing.assert_allclose(np.cos(theta), cos, atol=1e-10)
    assert np.all(theta >= 0) and np.all(theta <= np.pi)


def test_angles_right_angle():
    pos = np.array([[1.0, 0, 0], [0, 0, 0], [0, 1.0, 0]])
    mapping = np.array([[0], [1], [2]])
    theta = float(
        compute_angles_raw(jnp.asarray(pos), jnp.asarray(mapping))[0]
    )
    np.testing.assert_allclose(theta, np.pi / 2, atol=1e-7)


def _torsion_numpy(p0, p1, p2, p3):
    """Independent MDTraj-convention dihedral (praxeolitic formula)."""
    b0 = p0 - p1
    b1 = p2 - p1
    b2 = p3 - p2
    b1 /= np.linalg.norm(b1)
    v = b0 - np.dot(b0, b1) * b1
    w = b2 - np.dot(b2, b1) * b1
    x = np.dot(v, w)
    y = np.dot(np.cross(b1, v), w)
    return np.arctan2(y, x)


def test_torsions_vs_praxeolitic(rng):
    pos = rng.normal(size=(20, 3))
    mapping = np.array([[0, 4, 8], [1, 5, 9], [2, 6, 10], [3, 7, 11]])
    got = np.asarray(compute_torsions(jnp.asarray(pos), jnp.asarray(mapping)))
    for t in range(mapping.shape[1]):
        i, j, k, l = mapping[:, t]
        want = _torsion_numpy(pos[i], pos[j], pos[k], pos[l])
        np.testing.assert_allclose(got[t], want, atol=1e-8)


def test_torsion_sign_convention():
    # A +90 degree twist: l rotated clockwise looking down bond j->k.
    pos = np.array(
        [[0.0, 1.0, 0.0], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 0.0, 1.0]]
    )
    mapping = np.array([[0], [1], [2], [3]])
    got = float(compute_torsions(jnp.asarray(pos), jnp.asarray(mapping))[0])
    want = _torsion_numpy(pos[0], pos[1], pos[2], pos[3])
    np.testing.assert_allclose(got, want, atol=1e-8)
    assert abs(abs(got) - np.pi / 2) < 1e-6


def test_geometry_grads_finite(rng):
    pos = jnp.asarray(rng.normal(size=(10, 3)))
    m2 = jnp.asarray(np.array([[0, 1], [2, 3]]))
    m3 = jnp.asarray(np.array([[0, 1], [2, 3], [4, 5]]))
    m4 = jnp.asarray(np.array([[0, 1], [2, 3], [4, 5], [6, 7]]))
    for fn, m in [
        (compute_distances, m2),
        (compute_angles_cos, m3),
        (compute_angles_raw, m3),
        (compute_torsions, m4),
    ]:
        g = jax.grad(lambda p: jnp.sum(fn(p, m)))(pos)
        assert np.all(np.isfinite(np.asarray(g)))
