"""Whole-model fused kernel vs the per-block cheb path (interpreter)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashmd_tpu.models.cutoff import CosineCutoff
from flashmd_tpu.models.schnet import SchNetConfig, init_schnet, schnet_energy

A, RCUT = 30, 4.0


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(21)
    cfg = SchNetConfig(
        hidden_channels=128,
        embedding_size=10,
        num_filters=128,
        num_interactions=3,
        num_rbf=50,
        cutoff=CosineCutoff(0.0, RCUT),
        output_hidden_layer_widths=(128, 64),
        cheb_order=64,
    )
    params = init_schnet(jax.random.PRNGKey(0), cfg)
    pos = jnp.asarray(rng.uniform(0, 5, (A, 3)), jnp.float32)
    types = jnp.asarray(rng.integers(0, 10, A), jnp.int32)
    return cfg, params, pos, types


def test_energy_matches_cheb(setup):
    cfg, params, pos, types = setup
    cfg_c = dataclasses.replace(cfg, message_passing="cheb")
    cfg_f = dataclasses.replace(cfg, message_passing="cheb_fused")
    e_c = float(schnet_energy(params, cfg_c, pos, types, None))
    e_f = float(schnet_energy(params, cfg_f, pos, types, None))
    np.testing.assert_allclose(e_f, e_c, rtol=1e-6)


def test_forces_match_cheb(setup):
    cfg, params, pos, types = setup
    cfg_c = dataclasses.replace(cfg, message_passing="cheb")
    cfg_f = dataclasses.replace(cfg, message_passing="cheb_fused")
    g_c = jax.grad(lambda p: schnet_energy(params, cfg_c, p, types, None))(
        pos
    )
    g_f = jax.grad(lambda p: schnet_energy(params, cfg_f, p, types, None))(
        pos
    )
    gc, gf = np.asarray(g_c), np.asarray(g_f)
    assert np.abs(gc - gf).max() / np.abs(gc).max() < 1e-5


def test_vmapped(setup):
    cfg, params, pos, types = setup
    cfg_f = dataclasses.replace(cfg, message_passing="cheb_fused")
    pos_b = jnp.stack([pos, pos * 1.02])
    e = jax.vmap(lambda p: schnet_energy(params, cfg_f, p, types, None))(
        pos_b
    )
    assert e.shape == (2,)
    assert np.all(np.isfinite(np.asarray(e)))


def test_requires_three_layer_head(setup):
    cfg, params, pos, types = setup
    cfg_bad = SchNetConfig(
        hidden_channels=128,
        embedding_size=10,
        num_filters=128,
        num_interactions=2,
        num_rbf=50,
        cutoff=CosineCutoff(0.0, RCUT),
        output_hidden_layer_widths=(64,),  # 2-layer head
        message_passing="cheb_fused",
    )
    params_bad = init_schnet(jax.random.PRNGKey(1), cfg_bad)
    with pytest.raises(NotImplementedError):
        schnet_energy(params_bad, cfg_bad, pos, types, None)
