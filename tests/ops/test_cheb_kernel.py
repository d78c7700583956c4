"""Pallas Chebyshev CFConv kernels vs the pure-jnp reference path.

Runs the ACTUAL kernel bodies in Pallas interpreter mode on CPU
(FLASHMD_PALLAS_INTERPRET=1 from conftest makes the model-level dispatch
take the jnp path, so these tests call the kernel wrappers directly).
Covers single-tile and multi-tile grids, both need_gx variants, and
cotangent correctness against jax.grad of the jnp expression.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashmd_tpu.models.cheb import (
    _cheb_bwd,
    _cheb_forward_only,
    _pair_z,
    fit_chebyshev_filter,
)
from flashmd_tpu.models.cutoff import CosineCutoff
from flashmd_tpu.models.schnet import SchNetConfig, init_schnet
from flashmd_tpu.ops.pallas.cheb_kernel import (
    cheb_conv_bwd_pallas,
    cheb_conv_fwd_pallas,
)

RCUT = 4.0
F = 16
ORDER = 16  # any multiple of N_CHAINS=4 with >= 2 groups works


@pytest.fixture(scope="module")
def fit():
    cfg = SchNetConfig(
        hidden_channels=F,
        embedding_size=4,
        num_filters=F,
        num_rbf=9,
        num_interactions=1,
        cutoff=CosineCutoff(0.0, RCUT),
        output_hidden_layer_widths=(8,),
    )
    params = init_schnet(jax.random.PRNGKey(0), cfg)
    c, c2, w0 = fit_chebyshev_filter(
        params["interactions"][0], params["rbf"], cfg, order=ORDER
    )
    return c, c2, w0


def _random_inputs(a, seed=0):
    rng = np.random.default_rng(seed)
    # Cluster tight enough that some pairs are inside rcut and some out.
    pos = jnp.asarray(rng.uniform(0, 6.0, (a, 3)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(a, F)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(a, F)), jnp.float32)
    return pos, x, g


@pytest.mark.parametrize(
    "a,budget",
    [
        (23, 150_000),  # single tile, padded rows
        (48, 500),  # forces a multi-tile grid (ta < a_pad)
    ],
)
def test_fwd_kernel_matches_jnp(fit, a, budget):
    c, c2, w0 = fit
    pos, x, _ = _random_inputs(a)
    out_k = cheb_conv_fwd_pallas(
        c, w0, pos, x, RCUT, "fp32", tile_budget=budget
    )
    _, z = _pair_z(pos, RCUT)
    out_ref = _cheb_forward_only(c, w0, z, x, "fp32")
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("need_gx", [True, False])
@pytest.mark.parametrize(
    "a,budget",
    [
        (23, 150_000),
        (48, 500),  # multi-tile: exercises cross-tile accumulation
    ],
)
def test_bwd_kernel_matches_jnp(fit, a, budget, need_gx):
    c, c2, w0 = fit
    pos, x, g = _random_inputs(a, seed=3)
    gpos_k, gx_k = cheb_conv_bwd_pallas(
        c, c2, w0, pos, x, g, RCUT, "fp32", need_gx=need_gx,
        tile_budget=budget,
    )
    _, gpos_ref, gx_ref = _jnp_bwd(c, c2, w0, pos, x, g, need_gx)
    np.testing.assert_allclose(
        np.asarray(gpos_k), np.asarray(gpos_ref), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gx_k), np.asarray(gx_ref), rtol=1e-4, atol=1e-4
    )


def _jnp_bwd(c, c2, w0, pos, x, g, need_gx, cell=None):
    grads = _cheb_bwd(
        RCUT, "fp32", need_gx, (c, c2, w0, pos, x, cell), g
    )
    return None, grads[3], grads[4]


@pytest.mark.parametrize("order", [48, 96])
@pytest.mark.parametrize("need_gx", [True, False])
def test_kernels_chunked_order_loop(fit, order, need_gx):
    """Orders large enough that the backward takes the chunk-unrolled
    fori_loop path (order 48 -> gp=4 with tail, order 96 -> gp=8 with
    tail 6), vs the same-order jnp reference. The forward's full unroll
    and the backward's loop+tail must agree with the jnp recurrence at
    every width (regression for the unroll-width selection logic)."""
    from flashmd_tpu.ops.pallas.cheb_kernel import _bwd_unroll_groups

    # the widths this test claims to cover
    assert _bwd_unroll_groups(48 // 4) == 4
    assert _bwd_unroll_groups(96 // 4) == 8

    rng = np.random.default_rng(11)
    c = jnp.asarray(rng.normal(size=(order, F)) / order, jnp.float32)
    c2 = jnp.asarray(rng.normal(size=(order, F)) / order, jnp.float32)
    w0 = jnp.asarray(rng.normal(size=(F,)), jnp.float32)
    pos, x, g = _random_inputs(23, seed=13)

    out_k = cheb_conv_fwd_pallas(c, w0, pos, x, RCUT, "fp32")
    _, z = _pair_z(pos, RCUT)
    out_ref = _cheb_forward_only(c, w0, z, x, "fp32")
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_ref), rtol=3e-5, atol=3e-5
    )

    gpos_k, gx_k = cheb_conv_bwd_pallas(
        c, c2, w0, pos, x, g, RCUT, "fp32", need_gx=need_gx
    )
    _, gpos_ref, gx_ref = _jnp_bwd(c, c2, w0, pos, x, g, need_gx)
    np.testing.assert_allclose(
        np.asarray(gpos_k), np.asarray(gpos_ref), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(gx_k), np.asarray(gx_ref), rtol=2e-4, atol=2e-4
    )


CELL = jnp.asarray(
    [[7.0, 0.0, 0.0], [0.5, 6.5, 0.0], [0.0, 0.3, 7.5]], jnp.float32
)  # triclinic, min box height > 2*RCUT/... enough for min-image


@pytest.mark.parametrize(
    "a,budget",
    [
        (23, 150_000),  # single tile
        (48, 500),  # multi-tile grid
    ],
)
def test_fwd_kernel_periodic_matches_jnp(fit, a, budget):
    """Min-image geometry in the kernel vs the jnp minimum-image path
    (VERDICT r1 #6: periodic cells on the cheb fast path)."""
    c, c2, w0 = fit
    pos, x, _ = _random_inputs(a)
    out_k = cheb_conv_fwd_pallas(
        c, w0, pos, x, RCUT, "fp32", tile_budget=budget, cell=CELL
    )
    _, z = _pair_z(pos, RCUT, CELL)
    out_ref = _cheb_forward_only(c, w0, z, x, "fp32")
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_ref), rtol=2e-5, atol=2e-5
    )
    # and the cell genuinely changes the answer (pairs wrap)
    out_open = cheb_conv_fwd_pallas(
        c, w0, pos, x, RCUT, "fp32", tile_budget=budget
    )
    assert not np.allclose(np.asarray(out_k), np.asarray(out_open))


@pytest.mark.parametrize("need_gx", [True, False])
@pytest.mark.parametrize(
    "a,budget",
    [
        (23, 150_000),
        (48, 500),  # multi-tile: cross-tile accumulation of both sides
    ],
)
def test_bwd_kernel_periodic_matches_jnp(fit, a, budget, need_gx):
    c, c2, w0 = fit
    pos, x, g = _random_inputs(a, seed=3)
    gpos_k, gx_k = cheb_conv_bwd_pallas(
        c, c2, w0, pos, x, g, RCUT, "fp32", need_gx=need_gx,
        tile_budget=budget, cell=CELL,
    )
    _, gpos_ref, gx_ref = _jnp_bwd(c, c2, w0, pos, x, g, need_gx, CELL)
    np.testing.assert_allclose(
        np.asarray(gpos_k), np.asarray(gpos_ref), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gx_k), np.asarray(gx_ref), rtol=1e-4, atol=1e-4
    )


def test_bwd_kernel_periodic_matches_autodiff(fit):
    """Kernel cotangents vs jax.grad of the min-image jnp forward — the
    pair-shift-aware gpos accumulation must be a true gradient."""
    c, c2, w0 = fit
    pos, x, g = _random_inputs(29, seed=7)

    def scalar(pos, x):
        _, z = _pair_z(pos, RCUT, CELL)
        out = _cheb_forward_only(c, w0, z, x, "fp32")
        return jnp.sum(out * g)

    gpos_ad, gx_ad = jax.grad(scalar, argnums=(0, 1))(pos, x)
    gpos_k, gx_k = cheb_conv_bwd_pallas(
        c, c2, w0, pos, x, g, RCUT, "fp32", need_gx=True, cell=CELL
    )
    np.testing.assert_allclose(
        np.asarray(gx_k), np.asarray(gx_ad), rtol=1e-4, atol=1e-4
    )
    scale = np.max(np.abs(np.asarray(gpos_ad))) + 1e-8
    assert np.max(np.abs(np.asarray(gpos_k - gpos_ad))) / scale < 2e-2


def test_bwd_kernel_matches_autodiff(fit):
    """gpos/gx from the kernel vs jax.grad of the jnp forward."""
    c, c2, w0 = fit
    pos, x, g = _random_inputs(29, seed=7)

    def scalar(pos, x):
        _, z = _pair_z(pos, RCUT)
        out = _cheb_forward_only(c, w0, z, x, "fp32")
        return jnp.sum(out * g)

    gpos_ad, gx_ad = jax.grad(scalar, argnums=(0, 1))(pos, x)
    gpos_k, gx_k = cheb_conv_bwd_pallas(
        c, c2, w0, pos, x, g, RCUT, "fp32", need_gx=True
    )
    # The derivative series is a fit — tolerance reflects fit error at
    # ORDER=16, not kernel arithmetic.
    np.testing.assert_allclose(
        np.asarray(gx_k), np.asarray(gx_ad), rtol=1e-4, atol=1e-4
    )
    scale = np.max(np.abs(np.asarray(gpos_ad))) + 1e-8
    assert np.max(np.abs(np.asarray(gpos_k - gpos_ad))) / scale < 2e-2
