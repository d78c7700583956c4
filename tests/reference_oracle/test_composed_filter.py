"""Composed-filter parity: W'(d) = MLP(rbf(d)) * cut(d) vs the reference.

The whole framework's speed rests on tabulating the composed per-edge
filter function — Gaussian RBF (with its basis cutoff) -> filter MLP ->
conv cutoff (reference composition semantics:
src/flashmd/models/schnet.py:643-715, eager path ``W =
filter_network(edge_attr) * C.view(-1, 1)``). Round-2 VERDICT Missing #1:
the primitives were oracle-tested individually but never composed. These
tests evaluate the full chain through the reference's OWN loaded modules
on shared weights and assert:

1. our composed evaluation (gaussian_basis_apply -> mlp_apply -> cutoff)
   matches in f64 to 1e-12, and
2. the float64 host-side Chebyshev tabulation
   (models/cheb.fit_chebyshev_filter_host) reconstructs both W'(d) AND
   its distance derivative dW'/dd (the force-fidelity-critical series)
   to fit tolerance against torch autograd of the reference chain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from flashmd_tpu.models.cheb import fit_chebyshev_filter_host
from flashmd_tpu.models.cutoff import CosineCutoff
from flashmd_tpu.models.mlp import mlp_apply
from flashmd_tpu.models.radial_basis import gaussian_basis_apply
from flashmd_tpu.models.schnet import SchNetConfig
from tests.reference_oracle._loader import (
    load_reference_modules,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference source tree not present"
)

RCUT = 5.0
N_RBF = 50
F = 16


@pytest.fixture(autouse=True)
def _x64_scope():
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", prev)


@pytest.fixture(scope="module")
def chain():
    """Reference rbf + filter MLP + conv cutoff on shared random weights,
    plus the same weights in our pytree layout."""
    ref = load_reference_modules()
    rg = ref["models.radial_basis.gaussian"]
    rc = ref["models.cutoff"]
    rm = ref["models.mlp"]
    torch.manual_seed(11)
    rbf_t = rg.GaussianBasis(rc.CosineCutoff(0.0, RCUT), num_rbf=N_RBF)
    rbf_t = rbf_t.double()
    # the reference filter net: [num_rbf, F, F], bias-free last layer
    # (reference schnet.py:791-800 StandardSchNet filter construction)
    mlp_t = rm.MLP([N_RBF, F, F], last_bias=False).double()
    cut_t = rc.CosineCutoff(0.0, RCUT)

    linears = [m for m in mlp_t.layers if isinstance(m, torch.nn.Linear)]
    layers = [{"w": linears[0].weight.detach().numpy().T.copy(),
               "b": linears[0].bias.detach().numpy().copy()},
              {"w": linears[1].weight.detach().numpy().T.copy()}]
    block_params = {"filter": {"layers": layers}}
    rbf_params = {
        "offset": np.asarray(rbf_t.offset.numpy(), np.float64),
        "coeff": np.float64(rbf_t.coeff),
    }
    config = SchNetConfig(
        hidden_channels=F,
        num_filters=F,
        num_interactions=1,
        num_rbf=N_RBF,
        cutoff=CosineCutoff(0.0, RCUT),
        message_passing="cheb",
    )
    return rbf_t, mlp_t, cut_t, block_params, rbf_params, config


def _ref_w(rbf_t, mlp_t, cut_t, d_np):
    """Reference W'(d) [N, F]."""
    d = torch.tensor(d_np, dtype=torch.float64)
    w = mlp_t(rbf_t(d)) * cut_t(d).view(-1, 1)
    return w.detach().numpy(), None


def _ref_w_and_jac(rbf_t, mlp_t, cut_t, d_np):
    """W'(d) [N, F] and elementwise dW'/dd [N, F] (jacobian wrt own d)."""
    d = torch.tensor(d_np, dtype=torch.float64, requires_grad=True)
    w = mlp_t(rbf_t(d)) * cut_t(d).view(-1, 1)
    jac = np.empty_like(w.detach().numpy())
    for f in range(w.shape[1]):
        (g,) = torch.autograd.grad(w[:, f].sum(), d, retain_graph=True)
        jac[:, f] = g.detach().numpy()
    return w.detach().numpy(), jac


def test_our_composition_matches_reference_f64(chain):
    """(a) gaussian_basis_apply -> mlp_apply -> CosineCutoff equals the
    reference chain exactly (f64)."""
    rbf_t, mlp_t, cut_t, block_params, rbf_params, config = chain
    d = np.linspace(0.01, RCUT * 1.1, 400)
    w_ref, _ = _ref_w(rbf_t, mlp_t, cut_t, d)

    rbf_p = {
        "offset": jnp.asarray(rbf_params["offset"]),
        "coeff": jnp.asarray(rbf_params["coeff"]),
    }
    filt_p = {
        "layers": [
            {k: jnp.asarray(v) for k, v in layer.items()}
            for layer in block_params["filter"]["layers"]
        ]
    }
    rbf = gaussian_basis_apply(rbf_p, config.rbf_config, jnp.asarray(d))
    w_ours = mlp_apply(filt_p, rbf, precision="fp32") * np.asarray(
        config.cutoff(jnp.asarray(d))
    )[:, None]
    np.testing.assert_allclose(
        np.asarray(w_ours), w_ref, rtol=1e-12, atol=1e-14
    )


def _cheb_eval(coeffs, z):
    """sum_m coeffs[m] T_m(z) at f64, [N] x [M, F] -> [N, F]."""
    theta = np.arccos(np.clip(z, -1.0, 1.0))
    t = np.cos(np.outer(theta, np.arange(coeffs.shape[0])))  # [N, M]
    return t @ np.asarray(coeffs, np.float64)


def test_tabulated_filter_matches_reference_chain(chain):
    """(b) the host fit's (1-z)^2 sum c_m T_m reconstruction equals the
    reference composition to fit tolerance — the tabulation the entire
    cheb fast path evaluates."""
    rbf_t, mlp_t, cut_t, block_params, rbf_params, config = chain
    c, c2, w0 = fit_chebyshev_filter_host(
        block_params, rbf_params, config, order=160, order_deriv=160,
        n_nodes=1024,
    )

    d = np.linspace(0.02, RCUT - 0.02, 313)  # off the Chebyshev nodes
    w_ref, dw_ref = _ref_w_and_jac(rbf_t, mlp_t, cut_t, d)
    z = 2.0 * d / RCUT - 1.0

    w_fit = ((1.0 - z) ** 2)[:, None] * _cheb_eval(np.asarray(c), z)
    scale = np.abs(w_ref).max()
    assert np.abs(w_fit - w_ref).max() < 2e-5 * scale

    # The derivative series (what the backward kernels evaluate) against
    # torch autograd of the reference chain.
    dw_fit = (1.0 - z)[:, None] * _cheb_eval(np.asarray(c2), z)
    dscale = np.abs(dw_ref).max()
    assert np.abs(dw_fit - dw_ref).max() < 2e-5 * dscale

    # self-pair constant: W'(0) exactly (z = -1)
    w_ref0, _ = _ref_w(rbf_t, mlp_t, cut_t, np.array([0.0]))
    np.testing.assert_allclose(
        np.asarray(w0), w_ref0[0], rtol=1e-4, atol=1e-6 * scale
    )


def test_tabulation_beyond_cutoff_exactly_zero(chain):
    """Beyond-cutoff pairs contribute EXACTLY zero by construction
    ((1-z)^2 factor with z clamped to 1) — matching the reference's hard
    (d < rcut) mask, with no fit wiggle outside the domain."""
    _, _, _, block_params, rbf_params, config = chain
    c, c2, w0 = fit_chebyshev_filter_host(
        block_params, rbf_params, config, order=96
    )
    z = np.ones(5)  # clamped z for d >= rcut
    w_fit = ((1.0 - z) ** 2)[:, None] * _cheb_eval(np.asarray(c), z)
    dw_fit = (1.0 - z)[:, None] * _cheb_eval(np.asarray(c2), z)
    assert np.all(w_fit == 0.0)
    assert np.all(dw_fit == 0.0)
