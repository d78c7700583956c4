"""Chebyshev matmul-only CFConv: fit accuracy, custom VJP, model parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashmd_tpu.models.cheb import (
    cheb_cfconv_apply,
    chebyshev_nodes,
    fit_chebyshev_filter,
)
from flashmd_tpu.models.cutoff import CosineCutoff
from flashmd_tpu.models.mlp import mlp_apply
from flashmd_tpu.models.radial_basis import gaussian_basis_apply
from flashmd_tpu.models.schnet import SchNetConfig, init_schnet, schnet_energy
from flashmd_tpu.ops.neighborlist import radius_neighbor_matrix

A, RCUT, M = 41, 4.0, 128


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(13)
    cfg = SchNetConfig(
        hidden_channels=64,
        embedding_size=6,
        num_filters=64,
        num_interactions=2,
        num_rbf=50,
        cutoff=CosineCutoff(0.0, RCUT),
        output_hidden_layer_widths=(32,),
        cheb_order=M,
    )
    params = init_schnet(jax.random.PRNGKey(5), cfg)
    pos = jnp.asarray(rng.uniform(0, 5, (A, 3)), jnp.float32)
    types = jnp.asarray(rng.integers(0, 6, A), jnp.int32)
    nbr = radius_neighbor_matrix(pos, RCUT, capacity=A)
    return cfg, params, pos, types, nbr


def test_fit_matches_exact_filter(setup):
    """W'(d) fit error below fp32 resolution on a dense distance grid."""
    cfg, params, pos, types, nbr = setup
    bp = params["interactions"][0]
    c, c2, w0 = fit_chebyshev_filter(bp, params["rbf"], cfg, order=M)

    d = jnp.linspace(0.05, RCUT * 0.999, 1000)
    rbf = gaussian_basis_apply(params["rbf"], cfg.rbf_config, d)
    exact = mlp_apply(bp["filter"], rbf) * cfg.cutoff(d)[:, None]

    z = 2.0 * d / RCUT - 1.0
    # evaluate the fitted series
    t_prev = jnp.square(1 - z)
    t_cur = t_prev * z
    approx = c[0][None, :] * t_prev[:, None] + c[1][None, :] * t_cur[:, None]
    for m in range(2, M):
        t_next = 2 * z * t_cur - t_prev
        approx = approx + c[m][None, :] * t_next[:, None]
        t_prev, t_cur = t_cur, t_next

    scale = np.abs(np.asarray(exact)).max()
    err = np.abs(np.asarray(approx - exact)).max()
    assert err / scale < 3e-5


@pytest.mark.parametrize("method", ["wls", "lawson"])
def test_host_fit_methods_match_exact_filter(setup, method):
    """The alternative fit methods (weighted LS / Lawson minimax, with
    and without a density importance weight) reconstruct W'(d) to the
    same fp32-level accuracy as the projection at full order."""
    from flashmd_tpu.models.cheb import fit_chebyshev_filter_host

    cfg, params, pos, types, nbr = setup
    cfg_m = dataclasses.replace(cfg, cheb_fit_method=method)
    bp = params["interactions"][0]
    ew = (lambda d: np.sqrt(d + 0.1)) if method == "wls" else None
    c, c2, w0 = fit_chebyshev_filter_host(
        bp, params["rbf"], cfg_m, order=M, extra_weight=ew
    )

    d = jnp.linspace(0.05, RCUT * 0.999, 1000)
    rbf = gaussian_basis_apply(params["rbf"], cfg.rbf_config, d)
    exact = mlp_apply(bp["filter"], rbf) * cfg.cutoff(d)[:, None]

    z = 2.0 * d / RCUT - 1.0
    t_prev = jnp.square(1 - z)
    t_cur = t_prev * z
    approx = c[0][None, :] * t_prev[:, None] + c[1][None, :] * t_cur[:, None]
    for m in range(2, M):
        t_next = 2 * z * t_cur - t_prev
        approx = approx + c[m][None, :] * t_next[:, None]
        t_prev, t_cur = t_cur, t_next

    scale = np.abs(np.asarray(exact)).max()
    err = np.abs(np.asarray(approx - exact)).max()
    assert err / scale < 3e-5
    # coefficient norms must stay at projection scale (the floor-less
    # minimax solution carries 20-1000x larger coefficients whose bf16
    # evaluation noise swamps the fit gain — see _lawson_coeffs)
    c_proj, _, _ = fit_chebyshev_filter_host(
        bp, params["rbf"], cfg, order=M
    )
    assert (
        np.abs(np.asarray(c)).sum(0).max()
        < 3.0 * np.abs(np.asarray(c_proj)).sum(0).max()
    )


def test_fit_method_guards(setup):
    """Non-proj methods are host-fit only; unknown methods raise."""
    from flashmd_tpu.models.cheb import fit_chebyshev_filter_host

    cfg, params, pos, types, nbr = setup
    bp = params["interactions"][0]
    with pytest.raises(NotImplementedError, match="host-side fit"):
        fit_chebyshev_filter(
            bp, params["rbf"],
            dataclasses.replace(cfg, cheb_fit_method="lawson"), order=M,
        )
    with pytest.raises(ValueError, match="cheb_fit_method"):
        fit_chebyshev_filter_host(
            bp, params["rbf"],
            dataclasses.replace(cfg, cheb_fit_method="typo"), order=M,
        )


def test_fit_zero_beyond_cutoff(setup):
    """Pairs beyond rcut contribute exactly zero (the (1-z)^2 factor)."""
    cfg, params, pos, types, nbr = setup
    bp = params["interactions"][0]
    c, c2, w0 = fit_chebyshev_filter(bp, params["rbf"], cfg, order=M)
    # place one atom far outside everyone's cutoff
    pos_far = pos.at[0].set(jnp.asarray([1e3, 1e3, 1e3], pos.dtype))
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(A, 64)), jnp.float32
    )
    out = cheb_cfconv_apply(c, c2, w0, pos_far, x, RCUT, "fp32")
    # far pairs contribute exactly 0; only the ~1e-6 self-pair epsilon
    # (d_ii = sqrt(1e-12)) remains.
    assert np.abs(np.asarray(out[0])).max() < 1e-4


def test_model_energy_matches_xla(setup):
    cfg, params, pos, types, nbr = setup
    cfg_c = dataclasses.replace(cfg, message_passing="cheb")
    e_x = float(schnet_energy(params, cfg, pos, types, nbr))
    e_c = float(schnet_energy(params, cfg_c, pos, types, None))
    np.testing.assert_allclose(e_c, e_x, rtol=1e-5)


def test_model_forces_match_xla(setup):
    cfg, params, pos, types, nbr = setup
    cfg_c = dataclasses.replace(cfg, message_passing="cheb")
    g_x = jax.grad(lambda p: schnet_energy(params, cfg, p, types, nbr))(pos)
    g_c = jax.grad(lambda p: schnet_energy(params, cfg_c, p, types, None))(
        pos
    )
    gx, gc = np.asarray(g_x), np.asarray(g_c)
    assert np.abs(gx - gc).max() / np.abs(gx).max() < 5e-4


def test_custom_vjp_matches_finite_differences(setup):
    cfg, params, pos, types, nbr = setup
    bp = params["interactions"][0]
    c, c2, w0 = fit_chebyshev_filter(bp, params["rbf"], cfg, order=M)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(A, 64)), jnp.float32
    )

    def loss(p, xx):
        return jnp.sum(
            jnp.sin(cheb_cfconv_apply(c, c2, w0, p, xx, RCUT, "fp32"))
        )

    gp, gx = jax.grad(loss, argnums=(0, 1))(pos, x)
    eps = 3e-3
    rng = np.random.default_rng(2)
    for _ in range(3):
        i, dd = rng.integers(0, A), rng.integers(0, 3)
        dp = jnp.zeros_like(pos).at[i, dd].set(eps)
        fd = (float(loss(pos + dp, x)) - float(loss(pos - dp, x))) / (
            2 * eps
        )
        np.testing.assert_allclose(float(gp[i, dd]), fd, rtol=2e-2,
                                   atol=2e-3)
    for _ in range(3):
        i, ff = rng.integers(0, A), rng.integers(0, 64)
        dx = jnp.zeros_like(x).at[i, ff].set(eps)
        fd = (float(loss(pos, x + dx)) - float(loss(pos, x - dx))) / (
            2 * eps
        )
        np.testing.assert_allclose(float(gx[i, ff]), fd, rtol=2e-2,
                                   atol=2e-3)


def test_model_forces_match_xla_domain_restricted(setup):
    """The full cheb dispatch with cheb_d_min > 0 (restricted-domain fit
    + sub-floor extrapolation machinery engaged) matches the exact-MLP
    xla path on a geometry whose pair floor sits above d_min — the
    physical regime the restriction targets. Covers fit (z affine on
    [d_min, rcut]), forward, and the custom VJP end to end at model
    level (kernel level: tests/ops/test_cheb_kernel.py)."""
    cfg, params, pos_rand, types, _ = setup
    # jittered grid: minimum pair separation 2.5 > d_min = 2.0
    rng = np.random.default_rng(7)
    grid = np.stack(
        np.meshgrid(*[np.arange(4) * 3.0] * 3), axis=-1
    ).reshape(-1, 3)[:A]
    pos = jnp.asarray(grid + rng.uniform(-0.2, 0.2, (A, 3)), jnp.float32)
    d2 = np.sum(
        (np.asarray(pos)[:, None] - np.asarray(pos)[None, :]) ** 2, -1
    )
    np.fill_diagonal(d2, np.inf)
    assert np.sqrt(d2.min()) > 2.0  # geometry floor above d_min

    nbr = radius_neighbor_matrix(pos, RCUT, capacity=A)
    cfg_c = dataclasses.replace(
        cfg, message_passing="cheb", cheb_d_min=2.0
    )
    g_x = jax.grad(lambda p: schnet_energy(params, cfg, p, types, nbr))(pos)
    g_c = jax.grad(lambda p: schnet_energy(params, cfg_c, p, types, None))(
        pos
    )
    gx, gc = np.asarray(g_x), np.asarray(g_c)
    assert np.abs(gx - gc).max() / np.abs(gx).max() < 5e-4


def test_vmap_batch(setup):
    cfg, params, pos, types, nbr = setup
    cfg_c = dataclasses.replace(cfg, message_passing="cheb")
    pos_b = jnp.stack([pos, pos + 0.02])
    e = jax.vmap(lambda p: schnet_energy(params, cfg_c, p, types, None))(
        pos_b
    )
    assert e.shape == (2,)
    assert np.all(np.isfinite(np.asarray(e)))


def test_requires_cosine_cutoff(setup):
    from flashmd_tpu.models.cutoff import IdentityCutoff

    cfg, params, pos, types, nbr = setup
    cfg_bad = SchNetConfig(
        hidden_channels=64,
        embedding_size=6,
        num_filters=64,
        num_interactions=2,
        num_rbf=50,
        cutoff=IdentityCutoff(0.0, RCUT),
        rbf_cutoff=CosineCutoff(0.0, RCUT),
        output_hidden_layer_widths=(32,),
        message_passing="cheb",
    )
    with pytest.raises(NotImplementedError):
        schnet_energy(params, cfg_bad, pos, types, None)

def test_cheb_param_grad_contract(setup):
    """INFERENCE-ONLY gradient contract of the cheb path (pinned; see
    the models/cheb module docstring): jax.grad wrt the FILTER-NET
    parameters through message_passing='cheb' is exactly zero — the
    custom VJP returns zero cotangents for the fitted tables (c, c2,
    w0), severing the chain back into the MLP weights they came from —
    while the same gradient through the 'xla' path is the true, nonzero
    autodiff gradient. Fine-tuning through 'cheb' would silently train
    nothing; this test keeps that contract visible and unchanging."""
    cfg, params, pos, types, nbr = setup
    cfg_c = dataclasses.replace(cfg, message_passing="cheb")

    def energy_of_filters(filter_params, config, nbr_arg):
        p = dict(params)
        p["interactions"] = [
            {**bp, "filter": fp}
            for bp, fp in zip(params["interactions"], filter_params)
        ]
        return schnet_energy(p, config, pos, types, nbr_arg)

    filters = [bp["filter"] for bp in params["interactions"]]
    g_cheb = jax.grad(energy_of_filters)(filters, cfg_c, None)
    for leaf in jax.tree_util.tree_leaves(g_cheb):
        assert np.all(np.asarray(leaf) == 0.0)

    g_xla = jax.grad(energy_of_filters)(filters, cfg, nbr)
    norms = [
        float(jnp.max(jnp.abs(leaf)))
        for leaf in jax.tree_util.tree_leaves(g_xla)
    ]
    assert max(norms) > 0.0


def test_cheb_param_grad_poison_guard(setup, monkeypatch):
    """FLASHMD_CHEB_PARAM_GRAD=poison turns the contract's silent zeros
    into NaN so a mistaken fine-tuning attempt through the cheb path
    fails loudly on step one (VERDICT r4 #7) — while position gradients
    (forces) remain finite and unchanged."""
    cfg, params, pos, types, nbr = setup
    cfg_c = dataclasses.replace(cfg, message_passing="cheb")

    def energy_of_filters(filter_params):
        p = dict(params)
        p["interactions"] = [
            {**bp, "filter": fp}
            for bp, fp in zip(params["interactions"], filter_params)
        ]
        return schnet_energy(p, cfg_c, pos, types, None)

    filters = [bp["filter"] for bp in params["interactions"]]
    f_clean = jax.grad(lambda q: schnet_energy(params, cfg_c, q, types, None))(
        pos
    )

    monkeypatch.setenv("FLASHMD_CHEB_PARAM_GRAD", "poison")
    g_poison = jax.grad(energy_of_filters)(filters)
    leaves = jax.tree_util.tree_leaves(g_poison)
    assert any(np.all(np.isnan(np.asarray(leaf))) for leaf in leaves)

    # forces are untouched by the poison mode
    f_poison = jax.grad(
        lambda q: schnet_energy(params, cfg_c, q, types, None)
    )(pos)
    assert np.all(np.isfinite(np.asarray(f_poison)))
    np.testing.assert_array_equal(np.asarray(f_poison), np.asarray(f_clean))
