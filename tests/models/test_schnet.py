"""SchNet correctness: independent edge-list oracle, invariances, gradients.

The oracle below is a deliberately naive edge-list implementation written
directly from the architecture description (reference: schnet.py docstrings)
— a separate code path from the production neighbor-matrix model.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashmd_tpu.models.cutoff import CosineCutoff
from flashmd_tpu.models.schnet import (
    SchNetConfig,
    init_schnet,
    schnet_atom_energies,
    schnet_energy,
)
from flashmd_tpu.ops.neighborlist import radius_neighbor_matrix

jax.config.update("jax_enable_x64", True)

A = 11
RCUT = 3.0


@pytest.fixture
def setup():
    rng = np.random.default_rng(42)
    config = SchNetConfig(
        hidden_channels=16,
        embedding_size=5,
        num_filters=16,
        num_interactions=2,
        num_rbf=7,
        cutoff=CosineCutoff(0.0, RCUT),
        output_hidden_layer_widths=(8,),
    )
    params = init_schnet(
        jax.random.PRNGKey(0), config, dtype=jnp.float64
    )
    pos = jnp.asarray(rng.uniform(0, 3.0, size=(A, 3)))
    types = jnp.asarray(rng.integers(0, 5, size=(A,)), dtype=jnp.int32)
    nbr = radius_neighbor_matrix(pos, RCUT, capacity=A)
    return config, params, pos, types, nbr


def _mlp_np(mlp_params, x):
    layers = mlp_params["layers"]
    for layer in layers[:-1]:
        x = np.tanh(x @ np.asarray(layer["w"]) + np.asarray(layer["b"]))
    last = layers[-1]
    x = x @ np.asarray(last["w"])
    if "b" in last:
        x = x + np.asarray(last["b"])
    return x


def oracle_energy(params, config, pos, types):
    """Naive edge-list SchNet written independently of the production code."""
    pos = np.asarray(pos)
    types = np.asarray(types)
    n = len(pos)
    edges = [
        (i, j)
        for i in range(n)
        for j in range(n)
        if i != j and np.linalg.norm(pos[j] - pos[i]) < RCUT
    ]
    x = np.asarray(params["embedding"])[types]
    offset = np.asarray(params["rbf"]["offset"])
    coeff = float(params["rbf"]["coeff"])

    def cutoff(d):
        return 0.5 * (math.cos(d * math.pi / RCUT) + 1.0) * (d < RCUT)

    for blk in params["interactions"]:
        h = x @ np.asarray(blk["lin1_w"])
        agg = np.zeros_like(h)
        for i, j in edges:
            d = np.linalg.norm(pos[j] - pos[i])
            rbf = np.exp(coeff * (d - offset) ** 2) * cutoff(d)
            w = _mlp_np(blk["filter"], rbf)
            agg[i] += w * cutoff(d) * h[j]
        y = agg @ np.asarray(blk["lin2_w"]) + np.asarray(blk["lin2_b"])
        x = x + np.tanh(y) @ np.asarray(blk["lin_w"]) + np.asarray(blk["lin_b"])
    e = _mlp_np(params["output"], x)
    return float(e.sum())


def test_matches_oracle(setup):
    config, params, pos, types, nbr = setup
    got = float(schnet_energy(params, config, pos, types, nbr))
    want = oracle_energy(params, config, pos, types)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_capacity_independent(setup):
    config, params, pos, types, nbr = setup
    e_full = float(schnet_energy(params, config, pos, types, nbr))
    big = radius_neighbor_matrix(pos, RCUT, capacity=A + 13)
    e_big = float(schnet_energy(params, config, pos, types, big))
    np.testing.assert_allclose(e_full, e_big, rtol=1e-12)


def test_translation_rotation_invariance(setup):
    config, params, pos, types, nbr = setup
    e0 = float(schnet_energy(params, config, pos, types, nbr))
    shifted = pos + jnp.asarray([10.0, -3.0, 2.0])
    nbr_s = radius_neighbor_matrix(shifted, RCUT, capacity=A)
    e1 = float(schnet_energy(params, config, shifted, types, nbr_s))
    np.testing.assert_allclose(e0, e1, rtol=1e-9)

    theta = 0.3
    rot = jnp.asarray(
        [
            [math.cos(theta), -math.sin(theta), 0],
            [math.sin(theta), math.cos(theta), 0],
            [0, 0, 1.0],
        ]
    )
    rotated = pos @ rot.T
    nbr_r = radius_neighbor_matrix(rotated, RCUT, capacity=A)
    e2 = float(schnet_energy(params, config, rotated, types, nbr_r))
    np.testing.assert_allclose(e0, e2, rtol=1e-9)


def test_permutation_invariance(setup):
    config, params, pos, types, nbr = setup
    e0 = float(schnet_energy(params, config, pos, types, nbr))
    perm = np.random.default_rng(3).permutation(A)
    pos_p = pos[perm]
    types_p = types[perm]
    nbr_p = radius_neighbor_matrix(pos_p, RCUT, capacity=A)
    e1 = float(schnet_energy(params, config, pos_p, types_p, nbr_p))
    np.testing.assert_allclose(e0, e1, rtol=1e-10)


def test_forces_match_finite_differences(setup):
    config, params, pos, types, nbr = setup

    def e(p):
        return schnet_energy(params, config, p, types, nbr)

    g = jax.grad(e)(pos)
    eps = 1e-6
    rng = np.random.default_rng(0)
    for _ in range(5):
        i = rng.integers(0, A)
        d = rng.integers(0, 3)
        dp = jnp.zeros_like(pos).at[i, d].set(eps)
        fd = (float(e(pos + dp)) - float(e(pos - dp))) / (2 * eps)
        np.testing.assert_allclose(float(g[i, d]), fd, rtol=1e-5, atol=1e-8)


def test_net_force_is_zero(setup):
    # Translation invariance implies forces sum to zero.
    config, params, pos, types, nbr = setup
    g = jax.grad(
        lambda p: schnet_energy(params, config, p, types, nbr)
    )(pos)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(g, axis=0)), 0.0, atol=1e-10
    )


def test_atom_energies_shape(setup):
    config, params, pos, types, nbr = setup
    e = schnet_atom_energies(params, config, pos, types, nbr)
    assert e.shape == (A,)
    assert np.all(np.isfinite(np.asarray(e)))


def test_bf16_close_to_fp32(setup):
    config, params, pos, types, nbr = setup
    params32 = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        params,
    )
    pos32 = pos.astype(jnp.float32)
    e32 = float(schnet_energy(params32, config, pos32, types, nbr))
    cfg_bf16 = dataclasses.replace(config, precision="bf16")
    ebf = float(schnet_energy(params32, cfg_bf16, pos32, types, nbr))
    assert abs(e32 - ebf) / (abs(e32) + 1e-6) < 0.05


def test_min_interactions_raises():
    with pytest.raises(ValueError):
        SchNetConfig(num_interactions=0)


def test_cutoff_mismatch_warns():
    with pytest.warns(UserWarning):
        SchNetConfig(
            cutoff=CosineCutoff(0.0, 5.0),
            rbf_cutoff=CosineCutoff(0.0, 4.0),
        )
