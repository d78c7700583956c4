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


def _jnp_bwd(c, c2, w0, pos, x, g, need_gx, cell=None, d_min=0.0):
    grads = _cheb_bwd(
        RCUT, "fp32", need_gx, d_min, (c, c2, w0, pos, x, cell), g
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
    from flashmd_tpu.ops.pallas.cheb_kernel import _bwd_chunk_width

    # the widths this test claims to cover (remaining = groups - 2 seeds)
    assert _bwd_chunk_width(48 // 4 - 2) == 4
    assert _bwd_chunk_width(96 // 4 - 2) == 8

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


@pytest.mark.parametrize("cell", [None, "CELL"])
@pytest.mark.parametrize(
    "a,budget",
    [
        (23, 150_000),  # single tile
        (48, 500),  # multi-tile: cross-tile gx accumulation
    ],
)
def test_bwd_kernel_gx_only_matches_jnp(fit, a, budget, cell):
    """need_gd=False (gx-only) kernel variant: the deferred fused-gd
    backward (models/cheb.cheb_stack_apply) uses it per block to chain
    the cotangent upstream while ALL blocks' distance-gradient chains run
    in one later stacked call. gx must match the jnp reference exactly as
    the combined kernel's does; gpos must be exactly the zeros written at
    t == 0 (the gd chain never runs)."""
    cell_m = CELL if cell == "CELL" else None
    c, c2, w0 = fit
    pos, x, g = _random_inputs(a, seed=3)
    gpos_k, gx_k = cheb_conv_bwd_pallas(
        c, c2, w0, pos, x, g, RCUT, "fp32", need_gx=True, need_gd=False,
        tile_budget=budget, cell=cell_m,
    )
    _, _, gx_ref = _jnp_bwd(c, c2, w0, pos, x, g, need_gx=True,
                            cell=cell_m)
    np.testing.assert_allclose(
        np.asarray(gx_k), np.asarray(gx_ref), rtol=1e-4, atol=1e-4
    )
    assert np.all(np.asarray(gpos_k) == 0.0)


def test_bwd_kernel_gd_only_block_stacked(fit):
    """The fused-gd call as cheb_stack_apply issues it: need_gx=False,
    need_gd=True over BLOCK-STACKED [A, B*F] operands (c2/x/g of B blocks
    concatenated along F, dummy 1-row c, zero w0). The gd contraction
    sums over the F axis, so the stacked gpos must equal the SUM of the
    per-block gpos results."""
    rng = np.random.default_rng(31)
    nb = 3
    pos, _, _ = _random_inputs(23, seed=29)
    c2s = [
        jnp.asarray(rng.normal(size=(ORDER, F)) / ORDER, jnp.float32)
        for _ in range(nb)
    ]
    xs = [jnp.asarray(rng.normal(size=(23, F)), jnp.float32)
          for _ in range(nb)]
    gs = [jnp.asarray(rng.normal(size=(23, F)), jnp.float32)
          for _ in range(nb)]
    c, _, w0 = fit

    gpos_sum = None
    for c2b, xb, gb in zip(c2s, xs, gs):
        gpos_b, _ = cheb_conv_bwd_pallas(
            c, c2b, w0, pos, xb, gb, RCUT, "fp32", need_gx=False,
            need_gd=True,
        )
        gpos_sum = gpos_b if gpos_sum is None else gpos_sum + gpos_b

    fdim = nb * F
    gpos_k, gx_k = cheb_conv_bwd_pallas(
        jnp.zeros((1, fdim), jnp.float32),
        jnp.concatenate(c2s, axis=1),
        jnp.zeros((fdim,), jnp.float32),
        pos,
        jnp.concatenate(xs, axis=1),
        jnp.concatenate(gs, axis=1),
        RCUT, "fp32", need_gx=False, need_gd=True,
    )
    np.testing.assert_allclose(
        np.asarray(gpos_k), np.asarray(gpos_sum), rtol=1e-4, atol=1e-4
    )
    assert np.all(np.asarray(gx_k) == 0.0)


@pytest.mark.parametrize(
    "order_fwd,order_deriv",
    [
        (64, 96),  # production default: short fwd series, long deriv
        (96, 64),  # reverse direction (gx segment after the shared one)
        (16, 96),  # shared segment is seeds-only territory + long tail
    ],
)
@pytest.mark.parametrize("need_gx", [True, False])
def test_bwd_kernel_asymmetric_orders(fit, order_fwd, order_deriv, need_gx):
    """Asymmetric forward/derivative series orders: the backward runs the
    shared recurrence to max(M1, M2) with the shorter chain's matmuls
    absent from the later segment (the production bf16 default is
    (64, 96) — benchmarks/fidelity_asym.py). Checked against the jnp
    reference with the same truncated coefficient tables, single- and
    multi-tile."""
    rng = np.random.default_rng(21)
    c = jnp.asarray(rng.normal(size=(order_fwd, F)) / order_fwd, jnp.float32)
    c2 = jnp.asarray(
        rng.normal(size=(order_deriv, F)) / order_deriv, jnp.float32
    )
    w0 = jnp.asarray(rng.normal(size=(F,)), jnp.float32)
    for a, budget in ((23, 150_000), (48, 500)):
        pos, x, g = _random_inputs(a, seed=17)
        gpos_k, gx_k = cheb_conv_bwd_pallas(
            c, c2, w0, pos, x, g, RCUT, "fp32", need_gx=need_gx,
            tile_budget=budget,
        )
        _, gpos_ref, gx_ref = _jnp_bwd(c, c2, w0, pos, x, g, need_gx)
        np.testing.assert_allclose(
            np.asarray(gpos_k), np.asarray(gpos_ref), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(gx_k), np.asarray(gx_ref), rtol=2e-4, atol=2e-4
        )


def test_asymmetric_fit_is_truncation(fit):
    """fit_chebyshev_filter at (order, order_deriv) must equal the leading
    rows of the symmetric fit at max(order, order_deriv) — both
    projections use the same Chebyshev-Gauss nodes."""
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
    bp, rbf = params["interactions"][0], params["rbf"]
    c_full, c2_full, _ = fit_chebyshev_filter(bp, rbf, cfg, order=32)
    c_a, c2_a, w0_a = fit_chebyshev_filter(
        bp, rbf, cfg, order=16, order_deriv=32
    )
    np.testing.assert_allclose(np.asarray(c_a), np.asarray(c_full[:16]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(c2_a), np.asarray(c2_full),
                               rtol=1e-6, atol=1e-7)
    # w0 reflects the TRUNCATED forward series (exact self-pair removal)
    signs = np.where(np.arange(16) % 2 == 0, 1.0, -1.0)
    np.testing.assert_allclose(
        np.asarray(w0_a), 4.0 * (signs @ np.asarray(c_a)), rtol=1e-5
    )


@pytest.mark.parametrize("need_gx", [True, False])
def test_kernels_domain_restricted(fit, need_gx):
    """d_min > 0 (restricted fit domain): kernel z mapping must match the
    jnp _pair_z mapping, single- and multi-tile, including pairs BELOW
    d_min (clamped to the bounded z = -1 value, no runaway)."""
    c, c2, w0 = fit
    d_min = 1.2
    for a, budget in ((23, 150_000), (48, 500)):
        pos, x, g = _random_inputs(a, seed=5)
        # force at least one sub-d_min pair (well below d_min, above 0)
        pos = pos.at[1].set(pos[0] + jnp.asarray([0.4, 0.2, 0.1]))
        out_k = cheb_conv_fwd_pallas(
            c, w0, pos, x, RCUT, "fp32", tile_budget=budget, d_min=d_min
        )
        _, z = _pair_z(pos, RCUT, d_min=d_min)
        out_ref = _cheb_forward_only(c, w0, z, x, "fp32")
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_ref), rtol=2e-5, atol=2e-5
        )
        assert np.all(np.isfinite(np.asarray(out_k)))

        gpos_k, gx_k = cheb_conv_bwd_pallas(
            c, c2, w0, pos, x, g, RCUT, "fp32", need_gx=need_gx,
            tile_budget=budget, d_min=d_min,
        )
        _, gpos_ref, gx_ref = _jnp_bwd(
            c, c2, w0, pos, x, g, need_gx, d_min=d_min
        )
        np.testing.assert_allclose(
            np.asarray(gpos_k), np.asarray(gpos_ref), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(gx_k), np.asarray(gx_ref), rtol=1e-4, atol=1e-4
        )


def test_domain_restricted_extrapolation_consistency(fit):
    """Sub-floor pairs are FIRST-ORDER extrapolated: the forward kernel
    (with w_lin) must match the extrapolated jnp expression, the gx half
    of the backward must be the TRUE gradient of that forward (jax.grad
    oracle — the new lin term enters gx), and the gpos half must match
    the designed c2 backward exactly.

    gpos is NOT compared to jax.grad of the c-series forward on mixed
    geometry: the backward deliberately uses the direct derivative fit
    c2 (closer to the true model gradient), and the derivative of the
    c-fit's error is worst exactly at the z = -1 endpoint sub-floor
    pairs sit on (Markov: ~M^2 x the fit error) — that known design gap
    is covered at model level by the fidelity suite. The extrapolation
    claim itself ("the clamped c2 series at z = -1 IS the slope") is
    tested exactly in test_extrapolation_gpos_pure_subfloor below."""
    from flashmd_tpu.models.cheb import _lin_slope, _low_matrix

    c, c2, w0 = fit
    d_min = 1.2
    w_lin = _lin_slope(c2)
    pos, x, g = _random_inputs(29, seed=9)
    # several sub-floor pairs at varying depths
    pos = pos.at[1].set(pos[0] + jnp.asarray([0.5, 0.2, 0.1]))
    pos = pos.at[5].set(pos[4] + jnp.asarray([0.9, 0.3, 0.0]))

    def fwd_jnp(pos, x):
        d, z = _pair_z(pos, RCUT, d_min=d_min)
        out = _cheb_forward_only(c, w0, z, x, "fp32")
        low = _low_matrix(d, d_min)
        return out + w_lin[None, :] * (low @ x)

    out_k = cheb_conv_fwd_pallas(
        c, w0, pos, x, RCUT, "fp32", d_min=d_min, w_lin=w_lin
    )
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(fwd_jnp(pos, x)), rtol=3e-5,
        atol=3e-5,
    )
    # extrapolation genuinely differs from the clamp for sub-floor pairs
    out_clamped = cheb_conv_fwd_pallas(
        c, w0, pos, x, RCUT, "fp32", d_min=d_min
    )
    assert not np.allclose(np.asarray(out_k), np.asarray(out_clamped))

    _, gx_ad = jax.grad(
        lambda p, xx: jnp.sum(fwd_jnp(p, xx) * g), argnums=(0, 1)
    )(pos, x)
    gpos_k, gx_k = cheb_conv_bwd_pallas(
        c, c2, w0, pos, x, g, RCUT, "fp32", need_gx=True, d_min=d_min
    )
    np.testing.assert_allclose(
        np.asarray(gx_k), np.asarray(gx_ad), rtol=1e-4, atol=1e-4
    )
    _, gpos_jnp, gx_jnp = _jnp_bwd(
        c, c2, w0, pos, x, g, need_gx=True, d_min=d_min
    )
    np.testing.assert_allclose(
        np.asarray(gpos_k), np.asarray(gpos_jnp), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gx_k), np.asarray(gx_jnp), rtol=1e-4, atol=1e-4
    )


def test_extrapolation_gpos_pure_subfloor(fit):
    """Exact gradient consistency of the sub-floor extrapolation: on a
    geometry where EVERY in-cutoff pair is below the fit-domain floor,
    the extrapolated forward is exactly linear in d (the clipped c
    series contributes zero position gradient), so jax.grad of the jnp
    expression is exact — no fit error enters — and the kernel's gpos,
    which reads the slope off the clamped c2 series at z = -1, must
    match it to float tolerance. This pins the design claim that the
    clamped derivative series IS the extrapolation slope."""
    from flashmd_tpu.models.cheb import _lin_slope, _low_matrix

    c, c2, w0 = fit
    d_min = 1.2
    w_lin = _lin_slope(c2)
    # two tight (sub-floor) pairs, the pairs far apart (> rcut)
    pos = jnp.asarray(
        [
            [0.0, 0.0, 0.0],
            [0.5, 0.2, 0.1],
            [20.0, 0.0, 0.0],
            [20.9, 0.3, 0.0],
        ],
        jnp.float32,
    )
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(4, F)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(4, F)), jnp.float32)

    def fwd_jnp(pos, x):
        d, z = _pair_z(pos, RCUT, d_min=d_min)
        out = _cheb_forward_only(c, w0, z, x, "fp32")
        low = _low_matrix(d, d_min)
        return out + w_lin[None, :] * (low @ x)

    gpos_ad, gx_ad = jax.grad(
        lambda p, xx: jnp.sum(fwd_jnp(p, xx) * g), argnums=(0, 1)
    )(pos, x)
    gpos_k, gx_k = cheb_conv_bwd_pallas(
        c, c2, w0, pos, x, g, RCUT, "fp32", need_gx=True, d_min=d_min
    )
    np.testing.assert_allclose(
        np.asarray(gpos_k), np.asarray(gpos_ad), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gx_k), np.asarray(gx_ad), rtol=1e-4, atol=1e-4
    )


def test_domain_restricted_fit_accuracy():
    """A restricted-domain fit must reproduce the exact composed filter on
    [d_min, rcut] far better than the same-order full-domain fit (the
    point of cheb_d_min), and stay bounded below d_min."""
    import dataclasses

    from flashmd_tpu.models.cheb import fit_chebyshev_filter_host
    from flashmd_tpu.models.mlp import mlp_apply
    from flashmd_tpu.models.radial_basis import gaussian_basis_apply

    cfg0 = SchNetConfig(
        hidden_channels=F,
        embedding_size=4,
        num_filters=F,
        num_rbf=24,
        num_interactions=1,
        cutoff=CosineCutoff(0.0, RCUT),
        output_hidden_layer_widths=(8,),
    )
    params = init_schnet(jax.random.PRNGKey(2), cfg0)
    bp, rbf = params["interactions"][0], params["rbf"]

    d_min = 1.5
    order = 24
    cfg_r = dataclasses.replace(cfg0, cheb_d_min=d_min)
    c_full, _, _ = fit_chebyshev_filter_host(bp, rbf, cfg0, order=order)
    c_rest, _, _ = fit_chebyshev_filter_host(bp, rbf, cfg_r, order=order)

    d = jnp.linspace(d_min, RCUT - 1e-4, 801)
    rbf_v = gaussian_basis_apply(rbf, cfg0.rbf_config, d)
    w_exact = mlp_apply(
        bp["filter"], rbf_v, activation="tanh", precision="fp32"
    ) * cfg0.cutoff(d)[:, None]

    def eval_series(c, d_min_fit):
        zp = jnp.clip(
            (d - d_min_fit) * (2.0 / (RCUT - d_min_fit)) - 1.0, -1.0, 1.0
        )
        t_prev, t_cur = jnp.ones_like(zp), zp
        acc = c[0][None, :] * t_prev[:, None] + c[1][None, :] * t_cur[:, None]
        for m in range(2, c.shape[0]):
            t_next = 2.0 * zp * t_cur - t_prev
            acc = acc + c[m][None, :] * t_next[:, None]
            t_prev, t_cur = t_cur, t_next
        return jnp.square(1.0 - zp)[:, None] * acc

    err_full = np.abs(np.asarray(eval_series(c_full, 0.0) - w_exact)).max()
    err_rest = np.abs(np.asarray(eval_series(c_rest, d_min) - w_exact)).max()
    scale = np.abs(np.asarray(w_exact)).max()
    assert err_rest < err_full / 3, (err_rest / scale, err_full / scale)
    # below d_min the restricted series stays bounded at the d_min value
    d_low = jnp.asarray([0.3, 0.8, d_min])
    zp_low = jnp.clip(
        (d_low - d_min) * (2.0 / (RCUT - d_min)) - 1.0, -1.0, 1.0
    )
    assert np.allclose(np.asarray(zp_low), [-1.0, -1.0, -1.0])


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


def test_kernels_periodic_domain_restricted(fit):
    """Cell AND d_min together (the only combination where the kernels
    carry three extra operands: cell, inv-cell, w_lin — ordering is
    load-bearing in the *rest unpacking). Min-image sub-floor pairs must
    extrapolate exactly like the jnp path."""
    from flashmd_tpu.models.cheb import _lin_slope, _low_matrix

    c, c2, w0 = fit
    d_min = 1.2
    w_lin = _lin_slope(c2)
    pos, x, g = _random_inputs(29, seed=13)
    # a pair that is sub-floor only THROUGH the minimum image (wraps)
    pos = pos.at[2].set(jnp.asarray([0.2, 0.1, 0.3]))
    pos = pos.at[3].set(
        jnp.asarray([0.2, 0.1, 0.3]) + jnp.diag(CELL) - 0.4
    )

    def fwd_jnp(pos, x):
        d, z = _pair_z(pos, RCUT, CELL, d_min)
        out = _cheb_forward_only(c, w0, z, x, "fp32")
        low = _low_matrix(d, d_min)
        return out + w_lin[None, :] * (low @ x)

    out_k = cheb_conv_fwd_pallas(
        c, w0, pos, x, RCUT, "fp32", cell=CELL, d_min=d_min, w_lin=w_lin
    )
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(fwd_jnp(pos, x)), rtol=3e-5,
        atol=3e-5,
    )
    gpos_k, gx_k = cheb_conv_bwd_pallas(
        c, c2, w0, pos, x, g, RCUT, "fp32", need_gx=True, cell=CELL,
        d_min=d_min,
    )
    _, gx_ad = jax.grad(
        lambda p, xx: jnp.sum(fwd_jnp(p, xx) * g), argnums=(0, 1)
    )(pos, x)
    np.testing.assert_allclose(
        np.asarray(gx_k), np.asarray(gx_ad), rtol=1e-4, atol=1e-4
    )
    _, gpos_ref, gx_ref = _jnp_bwd(
        c, c2, w0, pos, x, g, need_gx=True, cell=CELL, d_min=d_min
    )
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


def test_bwd_tile_budget_table():
    """Pin the MEASURED default tile-budget table (v5e, 16 MB scoped-VMEM
    stack; benchmarks/kernel_nchains.py, kernel_gxonly_budget.py,
    kernel_f256_budget.py). Every cell is the largest budget that both
    compiles and times fastest on hardware — an edit that changes a cell
    without re-measuring must fail here first. In particular the gx-only
    column is ORDER-dependent (75k OOMs from 88 That rows up) and
    precision-dependent (bf16x3 splits OOM 75k at even 72 rows)."""
    from flashmd_tpu.ops.pallas.cheb_kernel import _bwd_tile_budget

    def b(n=8, gx=True, gd=True, cell=False, prec="bf16", order_gx=56,
          stacked=False, f=128):
        return _bwd_tile_budget(n, gx, gd, cell, prec, order_gx,
                                stacked, f)

    # combined gx+gd kernel (the per-block FLASHMD_CHEB_STACK=0 path).
    # n=8 open-boundary re-measured DOWN from the round-4 37k: the
    # That-basis gx live set grew and 37k OOMs at A=266/F=128
    # (19.28M/16M; caught by the round-5 TPU lane,
    # benchmarks/tpu_lane_probe.py). F=256 keeps 37k — the 33k tile
    # geometry (a_pad 288) OOMs there while 136-row tiles compile
    # (the scoped-stack allocator is not monotonic in the budget).
    assert b(n=8) == 33_000 and b(n=8, cell=True) == 32_000
    assert b(n=8, f=256) == 37_000
    assert b(n=4) == 74_000 and b(n=4, cell=True) == 64_000
    # gd-only (the block-stacked fused-gd call)
    assert b(gx=False) == 75_000 and b(gx=False, cell=True) == 52_000
    assert b(n=4, gx=False) == 120_000
    assert b(n=4, gx=False, cell=True) == 104_000
    # gx-only (the stack path's per-block upstream chainer): order- and
    # precision-dependent — the headline (48 -> 56 That rows) keeps 75k,
    # 72 rows is the last safe 75k point, 88+ drops to 56k
    assert b(gd=False, order_gx=56) == 75_000
    assert b(gd=False, order_gx=72) == 75_000
    assert b(gd=False, order_gx=88) == 56_000
    assert b(gd=False, order_gx=136) == 56_000
    assert b(gd=False, order_gx=88, cell=True) == 52_000
    assert b(gd=False, order_gx=56, cell=True) == 52_000
    # fp32 takes the reduced gx-only cell at EVERY order: 75k OOMs at
    # order 72 (tpu_lane_probe cell 15) and 56k measured faster even
    # where 75k compiled (round 4, kernel_gxonly_budget.py).
    assert b(gd=False, order_gx=56, prec="fp32") == 56_000
    assert b(gd=False, order_gx=72, prec="fp32") == 56_000
    assert b(gd=False, prec="bf16x3", order_gx=72) == 48_000
    assert b(gd=False, prec="bf16x3", order_gx=72, cell=True) == 40_000
    # F > 128 scaling is scoped to block-stacked operands (ADVICE r3);
    # non-stacked F is MEASURED up to 256 (kept unscaled there) and
    # scales down relative to that pin past it (ADVICE r4).
    assert b(gx=False, stacked=True, f=384) == 75_000 * 128 // 384
    assert b(gx=False, stacked=False, f=256) == 75_000
    assert b(gx=False, stacked=False, f=384) == 75_000 * 256 // 384
    assert b(n=4, f=256) == 74_000
