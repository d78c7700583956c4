"""Fused Pallas CFConv kernel vs the XLA reference path.

Runs in Pallas interpreter mode on CPU (FLASHMD_PALLAS_INTERPRET=1 set by
conftest); the same kernel compiles with Mosaic on real TPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashmd_tpu.models.cutoff import CosineCutoff
from flashmd_tpu.models.schnet import SchNetConfig, init_schnet, schnet_energy
from flashmd_tpu.ops.neighborlist import radius_neighbor_matrix
from flashmd_tpu.ops.pallas.cfconv import fused_cfconv_message

A, RCUT, F, R = 37, 4.0, 128, 50


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    cfg = SchNetConfig(
        hidden_channels=F,
        embedding_size=6,
        num_filters=F,
        num_interactions=2,
        num_rbf=R,
        cutoff=CosineCutoff(0.0, RCUT),
        output_hidden_layer_widths=(64,),
    )
    params = init_schnet(jax.random.PRNGKey(0), cfg)
    pos = jnp.asarray(rng.uniform(0, 5, (A, 3)), jnp.float32)
    types = jnp.asarray(rng.integers(0, 6, A), jnp.int32)
    nbr = radius_neighbor_matrix(pos, RCUT, capacity=32)
    return cfg, params, pos, types, nbr


def test_kernel_matches_xla_reference(setup):
    cfg, params, pos, types, nbr = setup
    bp = params["interactions"][0]
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(A, F)), jnp.float32
    )
    # XLA reference: same math through the jnp path.
    from flashmd_tpu.models.schnet import (
        cfconv_apply,
        neighbor_distances_rbf,
    )

    d, rbf = neighbor_distances_rbf(params, cfg, pos, nbr)
    w = jnp.tanh(rbf @ bp["filter"]["layers"][0]["w"]
                 + bp["filter"]["layers"][0]["b"])
    w = w @ bp["filter"]["layers"][1]["w"]
    c = cfg.cutoff(d) * nbr.mask
    want = jnp.sum(w * c[..., None] * x[nbr.idx], axis=1)

    got = fused_cfconv_message(
        pos,
        nbr.idx,
        nbr.mask.astype(jnp.float32),
        x,
        bp["filter"]["layers"][0]["w"],
        bp["filter"]["layers"][0]["b"],
        bp["filter"]["layers"][1]["w"],
        (params["rbf"]["offset"], params["rbf"]["coeff"]),
        RCUT,
        16,
        "fp32",
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_full_model_pallas_vs_xla(setup):
    cfg, params, pos, types, nbr = setup
    cfg_p = dataclasses.replace(cfg, message_passing="pallas")
    e_x = float(schnet_energy(params, cfg, pos, types, nbr))
    e_p = float(schnet_energy(params, cfg_p, pos, types, nbr))
    assert abs(e_x - e_p) / abs(e_x) < 1e-5


def test_gradients_pallas_vs_xla(setup):
    cfg, params, pos, types, nbr = setup
    cfg_p = dataclasses.replace(cfg, message_passing="pallas")
    g_x = jax.grad(lambda p: schnet_energy(params, cfg, p, types, nbr))(pos)
    g_p = jax.grad(lambda p: schnet_energy(params, cfg_p, p, types, nbr))(
        pos
    )
    gx, gp = np.asarray(g_x), np.asarray(g_p)
    assert np.abs(gx - gp).max() / np.abs(gx).max() < 1e-4


def test_vmapped_batch(setup):
    cfg, params, pos, types, nbr = setup
    cfg_p = dataclasses.replace(cfg, message_passing="pallas")
    pos_b = jnp.stack([pos, pos + 0.05])
    nbr_b = jax.vmap(lambda p: radius_neighbor_matrix(p, RCUT, capacity=32))(
        pos_b
    )
    e = jax.vmap(
        lambda p, n: schnet_energy(params, cfg_p, p, types, n)
    )(pos_b, nbr_b)
    e_ref = jax.vmap(
        lambda p, n: schnet_energy(params, cfg, p, types, n)
    )(pos_b, nbr_b)
    np.testing.assert_allclose(
        np.asarray(e), np.asarray(e_ref), rtol=1e-5
    )


def test_bf16_kernel_close(setup):
    cfg, params, pos, types, nbr = setup
    cfg_p32 = dataclasses.replace(cfg, message_passing="pallas")
    cfg_pb = dataclasses.replace(
        cfg, message_passing="pallas", precision="bf16"
    )
    e32 = float(schnet_energy(params, cfg_p32, pos, types, nbr))
    eb = float(schnet_energy(params, cfg_pb, pos, types, nbr))
    assert abs(e32 - eb) / abs(e32) < 0.05
