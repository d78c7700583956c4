"""Chebyshev-tabulated continuous-filter convolution (matmul-only CFConv).

The mathematical heart of this framework's speed on TPU.

Observation: at simulation time the filter network is FROZEN (the reference
freezes all parameters, base.py:355-358), and the per-edge filter is a
function of the scalar distance only:

    W'(d) = MLP(rbf(d) * cutoff(d)) * cutoff(d)   :  R -> R^F

W' is smooth on [0, rcut] and identically zero beyond rcut. With
z = clamp(2 d / rcut - 1, max=1), the cosine cutoff has an exact double
zero at z = 1, so write W'(z) = (1 - z)^2 h(z) with h smooth and fit h by
a Chebyshev series:

    W'(d)_f  ≈  (1 - z)^2 * sum_m  c[m, f] * T_m(z)

Because (1 - z)^2 vanishes identically at the clamp, pairs beyond the
cutoff contribute EXACTLY zero independent of fit error. Substituting into
the message sum and swapping the order of summation:

    out[i, f] = sum_j W'(d_ij)_f x[j, f]
              = sum_m c[m, f] * ( Ttil_m(Z) @ x )[i, f]

where Ttil_m = (1-Z)^2 T_m(Z) satisfies the SAME three-term recurrence
(it is linear), seeded with Ttil_0 = (1-Z)^2, Ttil_1 = (1-Z)^2 Z. The
entire continuous-filter convolution collapses into **M dense
[A, A] @ [A, F] matmuls** — pure MXU work with zero gathers, zero
scatters, zero transcendentals in the hot loop, and bitwise-deterministic
reductions. Self-pairs are removed exactly by subtracting the constant
column W'(z=-1) ⊙ x. Forces come from ordinary autodiff through the
recurrence (matmuls all the way down).

This replaces everything the reference's Triton kernel suite computes per
edge (cfconv_kernels.py: fused RBF + filter MLP + cutoff + gather +
segment-reduce) with an algebraic identity the reference never exploits.

Accuracy: h is C^infinity, so the Chebyshev error decays geometrically;
the fit (a few jnp ops: sample at Chebyshev nodes + discrete cosine
transform) is loop-invariant in the simulation scan — XLA hoists it, so
it costs nothing per step. Validated against the exact MLP path in tests.

GRADIENT CONTRACT (inference-only): this module is the FROZEN-MODEL
simulation path. Its custom VJPs propagate cotangents to positions and
node features only; every PARAMETER cotangent is exactly zero —
``_cheb_bwd`` returns zeros for the Chebyshev tables (c, c2, w0), which
also severs the chain back into the filter-MLP weights they were fitted
from, and the whole-stack path (``cheb_stack_apply``) additionally
returns zeros for all linear-layer weights. ``jax.grad(...,
argnums=params)`` through ``message_passing="cheb"`` therefore yields
silent zeros, by design: fine-tuning and sensitivity analysis must use
``message_passing="xla"`` (full autodiff). The contract is pinned by
tests/models/test_cheb_stack.py::test_stack_param_grads_are_zero_by_contract
and tests/models/test_schnet.py::test_cheb_param_grad_contract, and is
runtime-guardable: ``FLASHMD_CHEB_PARAM_GRAD=poison`` NaN-poisons the
parameter cotangents so a mistaken fine-tuning run fails loudly on step
one instead of silently training nothing (``_param_cotangent``).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp

from .mlp import mlp_apply

# The VMEM-resident Pallas kernels are the production path on TPU; the pure
# jnp expressions below remain as the CPU fallback (used by the test suite
# and by virtual-device dry runs) and as the reference for kernel tests.
def _use_pallas(n_atoms: int = 0) -> bool:
    del n_atoms  # the tiled kernels handle any molecule size
    if os.environ.get("FLASHMD_PALLAS_INTERPRET", "0") == "1":
        return False
    if os.environ.get("FLASHMD_CHEB_PALLAS", "1") != "1":
        return False
    import jax

    return jax.default_backend() == "tpu"


def chebyshev_nodes(n: int):
    """Chebyshev-Gauss nodes on (-1, 1)."""
    k = jnp.arange(n, dtype=jnp.float32)
    return jnp.cos(math.pi * (k + 0.5) / n)


def _sigma(rcut: float, d_min: float) -> float:
    """Half-width of the fit domain relative to the cutoff:
    sigma = (rcut - d_min) / (2 rcut); 1/2 on the full domain."""
    if not 0.0 <= d_min < rcut:
        raise ValueError(
            f"cheb_d_min must be in [0, rcut) (got {d_min}, rcut {rcut})"
        )
    return (rcut - d_min) / (2.0 * rcut)


def _cut_over_u2(u, sigma: float = 0.5):
    """cutoff(d) / (1-z)^2 where u = 1-z, stable for u -> 0.

    On the (possibly restricted) fit domain d = d_min + (z+1)(rcut-d_min)/2
    the cosine cutoff is cut(d) = cos^2(pi d / (2 rcut)) =
    sin^2(pi (rcut - d) / (2 rcut)) = sin^2(pi u sigma / 2) with
    sigma = (rcut - d_min) / (2 rcut), so
    cut / u^2 = (pi sigma / 2)^2 sinc^2(u sigma / 2)
    with sinc(x) = sin(pi x)/(pi x) — cancellation-free for any d_min
    (the full-domain sigma = 1/2 recovers the (pi/4)^2 sinc^2(u/4) form).
    """
    return (math.pi * sigma / 2.0) ** 2 * jnp.square(
        jnp.sinc(u * (sigma / 2.0))
    )


def _project(values, order: int, n_nodes: int):
    """Discrete Chebyshev transform at Chebyshev-Gauss nodes.

    values [N, F] -> coefficients [order, F]:
    c_m = (2 - delta_m0) / N * sum_k values_k T_m(z_k).
    """
    m = jnp.arange(order, dtype=jnp.float32)
    k = jnp.arange(n_nodes, dtype=jnp.float32)
    tmk = jnp.cos(
        m[:, None] * math.pi * (k[None, :] + 0.5) / n_nodes
    )  # [M, N]
    # Fit-time, loop-invariant: always full precision (on TPU a DEFAULT
    # dot would truncate the node values to bf16 inside the projection).
    c = (2.0 / n_nodes) * jnp.dot(
        tmk, values, precision=jax.lax.Precision.HIGHEST
    )
    # jnp.float32 scalar keeps the scatter-mul promotion-safe under x64
    # (a weak python float would promote to f64 and FutureWarning/raise).
    return c.at[0].mul(jnp.float32(0.5).astype(c.dtype))


def fit_chebyshev_filter(
    block_params,
    rbf_params,
    config,
    order: int = 64,
    n_nodes: int = 512,
    order_deriv: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fit the filter and its distance derivative; return (c, c2, W'(0)).

    * ``c`` [M1, F]:  W'(d) ~= (1-z)^2 sum_m c[m] T_m(z)
    * ``c2`` [M2, F]: dW'/dd(d) ~= (1-z) sum_m c2[m] T_m(z)
    * ``w0`` [F]:     W'(0), for the exact self-pair subtraction.

    ``order_deriv`` truncates the derivative series INDEPENDENTLY of the
    forward series (default: same order). The two series have different
    bf16 fidelity floors — the derivative (force) series binds much
    harder, so the forward order can drop well below it at equal force
    error (measured grid in benchmarks/fidelity_asym.py: (64, 96) matches
    the symmetric (88, 88) default at ~13% fewer kernel FLOPs). Both
    projections use the same Chebyshev-Gauss nodes, so a lower order is
    exactly the truncation of a higher-order fit.

    The derivative series lives on the (1-z) T_m basis: dW'/dd has an
    exact simple zero at the cutoff (W' = (1-z)^2 h), so factoring one
    (1-z) out keeps beyond-cutoff pairs exactly zero AND lets the
    backward kernel derive the scaled gx chain (1-z)^2 T_m from the SAME
    recurrence state by one elementwise multiply — one chain family
    instead of two (see ops/pallas/cheb_kernel._cheb_bwd_kernel).

    Evaluates the exact composed filter (Gaussian RBF including its basis
    cutoff, the filter MLP, and the conv cutoff — reference semantics from
    schnet.py:643-715) at Chebyshev nodes; the MLP derivative comes from
    forward-mode autodiff, the conv-cutoff derivative is analytic (the
    cheb path requires a plain CosineCutoff). ``n_nodes >> order`` kills
    aliasing.
    """
    from .radial_basis import gaussian_basis_apply

    _require_cheb_eligible_cutoff(config.cutoff)
    if getattr(config, "cheb_fit_method", "proj") != "proj":
        raise NotImplementedError(
            f"cheb_fit_method={config.cheb_fit_method!r} requires the "
            "host-side fit (models/cheb.attach_cheb_fit, done at model "
            "attach); the in-jit fallback implements only the projection."
        )
    order_deriv = order if order_deriv is None else order_deriv
    rcut = float(config.cutoff.cutoff_upper)
    d_min = float(config.cheb_d_min)
    sigma = _sigma(rcut, d_min)
    z = chebyshev_nodes(n_nodes)  # [N]
    d = d_min + (z + 1.0) * ((rcut - d_min) / 2.0)
    u = 1.0 - z

    def w_of_d(dd):
        rbf = gaussian_basis_apply(rbf_params, config.rbf_config, dd)
        return mlp_apply(
            block_params["filter"],
            rbf,
            activation=config.activation,
            precision="fp32",
        )

    w = w_of_d(d)  # [N, F]
    h = w * _cut_over_u2(u, sigma)[:, None]  # [N, F] = W' / (1-z)^2
    c = _project(h, order, n_nodes)

    # dW'/dd on the (1-z) T_m basis. With M(d) = MLP(rbf(d)) and the
    # cosine cutoff cut = sin^2(pi u sigma / 2) on the fit domain
    # (sigma = (rcut - d_min) / (2 rcut); 1/2 on the full domain):
    #   dW'/dd / (1-z) = M'(d) u (pi sigma/2)^2 sinc^2(u sigma/2)
    #                    - M(d) (pi^2 sigma / (2 rcut)) sinc(u sigma)
    # (both factors regular at u -> 0, unlike dividing the raw derivative
    # by u at near-edge Chebyshev nodes).
    def m_scalar(dd):
        return w_of_d(dd[None])[0]

    dm = jax.vmap(jax.jacfwd(m_scalar))(d)  # [N, F]
    h2 = (
        dm * (u * _cut_over_u2(u, sigma))[:, None]
        - w * (
            (math.pi**2 * sigma / (2.0 * rcut)) * jnp.sinc(u * sigma)
        )[:, None]
    )
    c2 = _project(h2, order_deriv, n_nodes)

    # Exact self-pair value W'(z=-1) = (1-(-1))^2 sum_m c_m T_m(-1).
    signs = jnp.where(jnp.arange(order) % 2 == 0, 1.0, -1.0)
    w0 = 4.0 * jnp.dot(signs, c, precision=jax.lax.Precision.HIGHEST)  # [F]
    return c, c2, w0


def _require_cheb_eligible_cutoff(cut):
    """The fits hard-code the analytic CosineCutoff(lower=0) derivative
    (sin^2(pi u / 4) form); any other cutoff would silently produce wrong
    c/c2 coefficients if allowed through — fail loudly at fit time instead
    (the schnet.py dispatch has the same check, but the fit functions are
    public API and callable directly, e.g. via attach_cheb_fit)."""
    from .cutoff import CosineCutoff

    if not isinstance(cut, CosineCutoff) or cut.cutoff_lower != 0:
        raise NotImplementedError(
            "Chebyshev filter fitting requires CosineCutoff with "
            f"cutoff_lower == 0 (got {cut!r})."
        )


def _cutoff_np(cut, d):
    """float64 numpy mirror of the cutoff __call__ formulas
    (models/cutoff.py) for the host-side fit."""
    import numpy as np

    from .cutoff import CosineCutoff, IdentityCutoff, ShiftedCosineCutoff

    if isinstance(cut, IdentityCutoff):
        return np.ones_like(d)
    if isinstance(cut, CosineCutoff):
        if cut.cutoff_lower > 0:
            c = 0.5 * (
                np.cos(
                    np.pi
                    * (
                        2
                        * (d - cut.cutoff_lower)
                        / (cut.cutoff_upper - cut.cutoff_lower)
                        + 1.0
                    )
                )
                + 1.0
            )
            return c * (d < cut.cutoff_upper) * (d > cut.cutoff_lower)
        return (
            0.5 * (np.cos(d * np.pi / cut.cutoff_upper) + 1.0)
            * (d < cut.cutoff_upper)
        )
    if isinstance(cut, ShiftedCosineCutoff):
        smooth = 0.5 + 0.5 * np.cos(
            np.pi
            * (d - cut.cutoff_upper + cut.smooth_width)
            / cut.smooth_width
        )
        c = np.where(d > cut.cutoff_upper - cut.smooth_width, smooth, 1.0)
        return np.where(d > cut.cutoff_upper, 0.0, c)
    raise NotImplementedError(f"host fit: unsupported cutoff {cut!r}")


def _lawson_coeffs(target, tmk, weight, iters=30):
    """Lawson iteratively-reweighted LS toward the weighted minimax.

    Minimizes (approximately) ``max_k weight_k * |target_k - (T c)_k|``
    per feature — with ``weight`` the basis factor ((1-z)^2 for the
    forward series, (1-z) for the derivative series) this targets the
    max error of the RECONSTRUCTED quantity W' / dW'/dd, which is what
    feeds force fidelity. Measured ~2.2x lower max error than the
    truncated projection at equal order (benchmarks/fit_minimax_probe.py).

    target [N, F], tmk [M, N], weight [N] -> coefficients [M, F].

    The caller must pass a weight with a strictly positive FLOOR (e.g.
    u^2 + 0.05, not the raw basis factor): the raw weight vanishes at
    z = 1, leaving the fit unconstrained there — the minimax solution
    then carries 20-1000x larger oscillating coefficients whose bf16/
    fp32 evaluation noise swamps the fit gain (measured: (64, 64)
    floor-less lawson read 4.9e-2 max rel force error on TPU vs the
    projection's 7e-3 at FEWER orders; with the 0.05 floor the
    coefficient L1 norms match the projection's within ~10% while
    keeping ~2.2x of the fit-error gain — fit_minimax_probe.py).
    """
    import numpy as np

    T = tmk.T  # [N, M]
    n, n_feat = target.shape
    out = np.empty((tmk.shape[0], n_feat))
    for f in range(n_feat):
        lw = np.full(n, 1.0 / n)
        t = target[:, f]
        c = None
        for _ in range(iters):
            sw = np.sqrt(lw) * weight
            c, *_ = np.linalg.lstsq(T * sw[:, None], t * sw, rcond=None)
            r = np.abs((t - T @ c) * weight)
            lw = lw * r
            s = lw.sum()
            if s <= 0:  # exact fit: any weighting is optimal
                break
            lw /= s
        out[:, f] = c
    return out


def fit_chebyshev_filter_host(block_params, rbf_params, config, order=64,
                              n_nodes=512, order_deriv=None,
                              extra_weight=None):
    """float64 host-side version of :func:`fit_chebyshev_filter`.

    The in-jit fit evaluates the filter MLP with the accelerator's
    transcendental approximations (TPU exp/tanh are hardware
    approximations), which bakes ~1e-3-level noise into the
    coefficients. Computing the fit once on the host in float64 at
    model-attach time removes that floor (and the redundant per-compile
    fit work). The derivative series uses float64 central differences
    (h = 1e-6 -> ~1e-9 relative error, far below f32 storage).

    Returns float32 (c [M, F], c2 [M, F], w0 [F]) ready to feed the
    kernels.
    """
    import numpy as np

    _require_cheb_eligible_cutoff(config.cutoff)
    order_deriv = order if order_deriv is None else order_deriv
    rcut = float(config.cutoff.cutoff_upper)
    d_min = float(config.cheb_d_min)
    sigma = _sigma(rcut, d_min)
    k = np.arange(n_nodes, dtype=np.float64)
    z = np.cos(np.pi * (k + 0.5) / n_nodes)
    d = d_min + (z + 1.0) * ((rcut - d_min) / 2.0)
    u = 1.0 - z

    offset = np.asarray(rbf_params["offset"], dtype=np.float64)
    coeff = np.float64(np.asarray(rbf_params["coeff"]))
    layers = [
        {
            kk: np.asarray(vv, dtype=np.float64)
            for kk, vv in layer.items()
        }
        for layer in block_params["filter"]["layers"]
    ]
    if config.activation != "tanh":
        raise NotImplementedError(
            "host fit supports tanh filter activations"
        )

    def w_of_d(dd):
        rbf = np.exp(coeff * np.square(dd[:, None] - offset[None, :]))
        rbf = rbf * _cutoff_np(config.rbf_config.cutoff, dd)[:, None]
        x = rbf
        for layer in layers[:-1]:
            x = np.tanh(x @ layer["w"] + layer.get("b", 0.0))
        last = layers[-1]
        return x @ last["w"] + last.get("b", 0.0)

    w = w_of_d(d)  # [N, F]
    sinc = np.sinc(u * (sigma / 2.0))
    h = w * ((np.pi * sigma / 2.0) ** 2 * sinc * sinc)[:, None]

    m = np.arange(max(order, order_deriv), dtype=np.float64)
    tmk = np.cos(m[:, None] * np.pi * (k[None, :] + 0.5) / n_nodes)

    # Derivative series on the (1-z) T_m basis (see fit_chebyshev_filter):
    # only the MLP factor M(d) is differenced; the conv-cutoff part is
    # analytic, so nothing singular is divided near u -> 0.
    eps = 1e-6
    dm = (w_of_d(d + eps) - w_of_d(d - eps)) / (2.0 * eps)
    sinc_full = np.sinc(u * sigma)
    h2 = (
        dm * (u * (np.pi * sigma / 2.0) ** 2 * sinc * sinc)[:, None]
        - w * ((np.pi**2 * sigma / (2.0 * rcut)) * sinc_full)[:, None]
    )

    fit_method = getattr(config, "cheb_fit_method", "proj")
    if fit_method == "proj":
        c = (2.0 / n_nodes) * (tmk[:order] @ h)
        c[0] *= 0.5
        c2 = (2.0 / n_nodes) * (tmk[:order_deriv] @ h2)
        c2[0] *= 0.5
    elif fit_method in ("lawson", "wls"):
        # Fit weight = delivered-quantity basis factor (with a floor;
        # see _lawson_coeffs) times an optional d-dependent importance
        # weight (e.g. the sqrt pair-density of the target structures:
        # force error ACCUMULATES over pairs, so the right L2 objective
        # weights the per-distance error by how many pairs live there).
        ew = 1.0 if extra_weight is None else extra_weight(d)
        wf = (u**2 + 0.05) * ew
        wd = (u + 0.05) * ew
        iters = 30 if fit_method == "lawson" else 1
        c = _lawson_coeffs(h, tmk[:order], wf, iters=iters)
        c2 = _lawson_coeffs(h2, tmk[:order_deriv], wd, iters=iters)
    else:
        raise ValueError(
            f"unknown cheb_fit_method {fit_method!r} "
            "(expected 'proj', 'wls', or 'lawson')"
        )

    signs = np.where(np.arange(order) % 2 == 0, 1.0, -1.0)
    w0 = 4.0 * (signs @ c)
    return (
        jnp.asarray(c, jnp.float32),
        jnp.asarray(c2, jnp.float32),
        jnp.asarray(w0, jnp.float32),
    )


def attach_cheb_fit(params, config):
    """Return a copy of the SchNet params with float64-host-fitted
    Chebyshev coefficients injected under ``params["cheb_fit"]``.

    The cheb dispatch in models/schnet.py uses these when present (and
    when their order matches ``config.cheb_order``) instead of fitting
    inside jit with accelerator transcendentals. Called at model-attach
    time (simulation/base.py).
    """
    fits = tuple(
        fit_chebyshev_filter_host(
            bp, params["rbf"], config, order=config.cheb_order,
            order_deriv=config.cheb_order_deriv,
        )
        for bp in params["interactions"]
    )
    return {**params, "cheb_fit": fits}


def _pair_rel(pos, cell=None):
    """rel[i, j] = pos[j] - pos[i], [A, A, 3]; minimum-imaged when a
    [3, 3] cell is given (same convention as
    ops/neighborlist._pairwise_displacements)."""
    rel = pos[None, :, :] - pos[:, None, :]  # [A, A, 3]
    if cell is not None:
        from ..ops.neighborlist import _inv_3x3

        # HIGHEST precision: the TPU MXU truncates matmul operands to
        # bf16 at DEFAULT, and a fractional coordinate near +-0.5 then
        # rounds to the WRONG lattice image — a whole-box-length error
        # in the displacement (measured: 12% force error on a 9 A box).
        cell = jnp.asarray(cell, rel.dtype)
        hp = jax.lax.Precision.HIGHEST
        frac = jnp.matmul(rel, _inv_3x3(cell), precision=hp)
        rel = rel - jnp.matmul(jnp.round(frac), cell, precision=hp)
    return rel


def _pair_z(pos, rcut, cell=None, d_min: float = 0.0):
    """Pair distances and fit-domain coordinates z in [-1, 1].

    ``d_min`` > 0 restricts the Chebyshev fit domain to d in
    [d_min, rcut] (z affine on that interval, cutoff zero still exactly
    at z = 1); pairs closer than d_min clamp to z = -1 — the conv layer
    then FIRST-ORDER extrapolates them from the floor (see
    cheb_cfconv_apply) instead of letting the polynomial run away.
    Physical systems with a repulsive prior essentially never produce
    such pairs — the restriction buys geometric convergence on the
    domain that actually occurs (benchmarks/fit_domain_probe.py).
    """
    rel = _pair_rel(pos, cell)
    d2 = jnp.sum(rel * rel, axis=-1)
    d = jnp.sqrt(d2 + 1e-12)  # diagonal-safe; grads vanish on the diagonal
    z = jnp.clip(
        (d - d_min) * (2.0 / (rcut - d_min)) - 1.0, -1.0, 1.0
    )
    return d, z


def _dtypes(precision: str):
    from .mlp import dot_precision

    compute_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    return compute_dtype, dot_precision(precision)


def cheb_cfconv_apply(
    c,
    c2,
    w0,
    pos,
    x,
    rcut: float,
    precision: str = "bf16",
    need_gx: bool = True,
    cell=None,
    d_min: float = 0.0,
):
    """Dense Chebyshev CFConv for one molecule.

    c/c2 [M, F]; w0 [F]; pos [A, 3]; x [A, F]. Returns [A, F]:
        out[i] = sum_{j != i, d_ij < rcut} W'(d_ij) ⊙ x[j]

    Custom VJP: the backward is another sweep of [A, A] matmuls built from
    the derivative coefficients ``c2`` — nothing per-order is stored, so
    memory stays O(A^2) regardless of the expansion order.

    ``need_gx=False`` (static) drops the grad-wrt-x half of the backward
    — for the FIRST interaction block the conv input derives from the
    pos-independent embedding, so that cotangent path is dead and the
    backward kernel can skip the entire scaled-chain family (~half its
    work). Returned gx is zeros in that case.

    ``cell`` ([3, 3], rows = lattice vectors) switches pair distances to
    the minimum-image convention — periodic boundaries on the fast path
    (the reference's fused path silently DROPS cell_shifts, reference
    schnet.py:275-290; its standard path supports PBC via the edge list,
    neighbor_list/torch_impl.py:102-163). The cell itself gets a zero
    cotangent (no barostat — fixed-cell NVT/NVE only).

    ``d_min`` is the fit-domain lower bound the coefficients were fitted
    on (see _pair_z and fit_chebyshev_filter); it must match the fit.
    Pairs below d_min are FIRST-ORDER extrapolated, not just clamped:
    W'(d) ~= W'(d_min) + (d - d_min) dW'/dd(d_min), where the slope
    2 sum_m (-1)^m c2[m] is read off the derivative series at z = -1 —
    one extra matmul in the forward (and one in the gx backward), and
    the clamped c2 series already IS the matching constant derivative,
    so the distance-gradient path needs no change. Sub-floor pairs
    (physically rare, prior-dominated) get smooth, bounded,
    gradient-consistent forces instead of a frozen filter value.
    """
    return _cheb_cfconv(
        c, c2, w0, pos, x, cell, rcut, precision, need_gx, d_min
    )


def _lin_slope(c2):
    """dW'/dd at the fit-domain floor: the (1-z) T_m series at z = -1,
    i.e. 2 sum_m (-1)^m c2[m]  -> [F]. Loop-invariant; XLA hoists it."""
    signs = jnp.where(jnp.arange(c2.shape[0]) % 2 == 0, 1.0, -1.0)
    return 2.0 * jnp.dot(signs, c2, precision=jax.lax.Precision.HIGHEST)


def _low_matrix(d, d_min):
    """low[i, j] = min(d_ij - d_min, 0), zero on the diagonal (keeps the
    exact w0 self-pair cancellation) — the linear-extrapolation weights.
    Symmetric (d is), so it serves both the forward and the gx backward."""
    a = d.shape[0]
    eye = jnp.eye(a, dtype=bool)
    return jnp.where(eye, 0.0, jnp.minimum(d - d_min, 0.0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _cheb_cfconv(
    c, c2, w0, pos, x, cell, rcut: float, precision: str, need_gx: bool,
    d_min: float,
):
    out, _ = _cheb_fwd(
        c, c2, w0, pos, x, cell, rcut, precision, need_gx, d_min
    )
    return out


def _cheb_forward_only(c, w0, z, x, precision):
    compute_dtype, prec = _dtypes(precision)
    u2 = jnp.square(1.0 - z)  # exact zero beyond the cutoff
    two_z = 2.0 * z
    xc = x.astype(compute_dtype)

    def matvec(t_m):
        # Recurrence state stays fp32 (matching the Pallas kernels, where
        # only the matmul ingestion truncates operands); running the
        # three-term recurrence itself in bf16 compounds rounding error
        # through all M orders.
        return jnp.dot(
            t_m.astype(compute_dtype),
            xc,
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    # Recurrence on Ttil_m = (1-Z)^2 T_m(Z) (linear in T, same recurrence).
    t_prev = u2  # Ttil_0
    t_cur = u2 * z  # Ttil_1
    out = c[0][None, :] * matvec(t_prev)
    if c.shape[0] > 1:
        out = out + c[1][None, :] * matvec(t_cur)
    for m in range(2, c.shape[0]):
        t_next = two_z * t_cur - t_prev
        out = out + c[m][None, :] * matvec(t_next)
        t_prev, t_cur = t_cur, t_next

    # Remove the self-pair (z_ii = -1) contribution exactly.
    return out - w0[None, :] * x


def _cheb_fwd(
    c, c2, w0, pos, x, cell, rcut, precision, need_gx=True, d_min=0.0
):
    w_lin = _lin_slope(c2) if d_min > 0 else None
    if _use_pallas(pos.shape[0]):
        from ..ops.pallas.cheb_kernel import cheb_conv_fwd_pallas

        out = cheb_conv_fwd_pallas(
            c, w0, pos, x, rcut, precision, cell=cell, d_min=d_min,
            w_lin=w_lin,
        )
    else:
        d, z = _pair_z(pos, rcut, cell, d_min)
        out = _cheb_forward_only(c, w0, z, x, precision)
        if w_lin is not None:
            compute_dtype, prec = _dtypes(precision)
            low = _low_matrix(d, d_min)
            out = out + w_lin[None, :] * jnp.dot(
                low.astype(compute_dtype),
                x.astype(compute_dtype),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
    return out, (c, c2, w0, pos, x, cell)


def _cell_cotangent(cell):
    """Zero cotangent matching the (possibly None) cell argument."""
    return None if cell is None else jnp.zeros_like(cell)


def _param_cotangent(arr):
    """Parameter cotangent under the inference-only gradient contract.

    Default: exact zeros (see GRADIENT CONTRACT in the module docstring).
    With ``FLASHMD_CHEB_PARAM_GRAD=poison`` the zeros become NaN so that a
    fine-tuning / sensitivity run mistakenly differentiating parameters
    through ``message_passing="cheb"`` fails LOUDLY (NaN losses on step
    one) instead of silently training nothing — the debug mode VERDICT r4
    #7 asked for. Position/feature cotangents are never poisoned, so
    force computation is unaffected either way (the poisoned outputs are
    dead values unless a param grad is actually requested).
    """
    if os.environ.get("FLASHMD_CHEB_PARAM_GRAD", "zero") == "poison":
        return jnp.full_like(arr, jnp.nan)
    return jnp.zeros_like(arr)


def _cheb_bwd(rcut, precision, need_gx, d_min, residuals, g):
    c, c2, w0, pos, x, cell = residuals
    if _use_pallas(pos.shape[0]):
        from ..ops.pallas.cheb_kernel import cheb_conv_bwd_pallas

        gpos, gx = cheb_conv_bwd_pallas(
            c, c2, w0, pos, x, g, rcut, precision, need_gx=need_gx,
            cell=cell, d_min=d_min,
        )
        return (
            _param_cotangent(c),
            _param_cotangent(c2),
            _param_cotangent(w0),
            gpos.astype(pos.dtype),
            gx.astype(x.dtype),
            _cell_cotangent(cell),
        )
    compute_dtype, prec = _dtypes(precision)
    a = pos.shape[0]
    d, z = _pair_z(pos, rcut, cell, d_min)
    u2 = jnp.square(1.0 - z)
    two_z = 2.0 * z
    gc = g.astype(compute_dtype)
    xc = x.astype(compute_dtype)

    # ---- grad wrt x: gx = sum_m Ttil_m @ (c_m ⊙ g) - w0 ⊙ g
    # (Ttil_m is symmetric: z_ij = z_ji).
    # ---- grad wrt d: gd_ij = (1 - z_ij) sum_m T_m(z_ij) * U_m[i, j]
    # (c2 lives on the (1-z) T_m basis — exactly zero beyond the cutoff),
    # with U_m = (g ⊙ c2_m) @ x^T.
    # Recurrence states stay fp32 (see _cheb_forward_only).
    t_prev = u2
    t_cur = u2 * z
    p_prev = jnp.ones_like(z)  # plain T_0 for the derivative series
    p_cur = z  # plain T_1

    def matvec_g(t_m, m):
        return jnp.dot(
            t_m.astype(compute_dtype),
            (c[m][None, :] * gc).astype(compute_dtype),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    def u_m(m):
        return jnp.dot(
            (c2[m][None, :] * gc).astype(compute_dtype),
            xc.T,
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    gx = None
    if need_gx:
        gx = matvec_g(t_prev, 0) + matvec_g(t_cur, 1)
    gd = p_prev * u_m(0) + p_cur * u_m(1)
    # The two series may have different (static) orders — the derivative
    # series binds force fidelity harder, so c typically stops earlier
    # (see fit_chebyshev_filter).
    for m in range(2, max(c.shape[0], c2.shape[0])):
        t_next = two_z * t_cur - t_prev
        p_next = two_z * p_cur - p_prev
        if need_gx and m < c.shape[0]:
            gx = gx + matvec_g(t_next, m)
        if m < c2.shape[0]:
            gd = gd + p_next * u_m(m)
        t_prev, t_cur = t_cur, t_next
        p_prev, p_cur = p_cur, p_next

    gx = gx - w0[None, :] * g if need_gx else jnp.zeros_like(x)
    if need_gx and d_min > 0:
        # Linear-extrapolation term below the fit-domain floor: out gained
        # w_lin ⊙ (low @ x), so gx gains low^T @ (w_lin ⊙ g) (low is
        # symmetric). The distance-gradient side needs NO term: the
        # clamped c2 series at z = -1 already equals the extrapolation
        # slope w_lin (see cheb_cfconv_apply).
        low = _low_matrix(d, d_min)
        gx = gx + jnp.dot(
            low.astype(compute_dtype),
            (_lin_slope(c2)[None, :] * gc).astype(compute_dtype),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    # The (1-z) basis factor zeroes beyond-cutoff pairs exactly (z clamps
    # at 1); the diagonal is masked explicitly (u_ii != 0 there and
    # d_ii ~ 1e-6 would amplify noise).
    eye = jnp.eye(a, dtype=bool)
    gd = (1.0 - z) * gd
    gd = jnp.where((d < rcut) & ~eye, gd, 0.0)

    # grad wrt positions: dd_ij/dpos_j = u_ij = rel_ij/d_ij with
    # rel_ij = (minimum-image) pos_j - pos_i. Open boundaries use the
    # matmul identity gpos = pos ⊙ rowsum(Ws) - Ws @ pos (Ws =
    # (gd + gd^T)/d); pair-dependent min-image shifts break it, so the
    # periodic branch contracts Ws against rel directly.
    ws = (gd + gd.T) / d
    if cell is not None:
        rel = _pair_rel(pos.astype(jnp.float32), cell)
        gpos = -jnp.einsum(
            "ij,ijk->ik", ws, rel, precision=jax.lax.Precision.HIGHEST
        )
    else:
        gpos = pos * jnp.sum(ws, axis=1)[:, None] - jnp.dot(
            ws,
            pos.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    return (
        _param_cotangent(c),
        _param_cotangent(c2),
        _param_cotangent(w0),
        gpos.astype(pos.dtype),
        gx.astype(x.dtype),
        _cell_cotangent(cell),
    )


_cheb_cfconv.defvjp(_cheb_fwd, _cheb_bwd)


# ---------------------------------------------------------------------------
# Whole-stack cheb path with a DEFERRED FUSED-GD backward.
#
# The distance-gradient (gd) half of each conv's backward is TERMINAL: it
# feeds the position gradient directly and never propagates upstream (only
# the gx half chains into earlier blocks). All B interaction blocks share
# the same pair geometry z, so their gd chains can run in ONE kernel call
# over block-stacked [A, B*F] operands — the gd contraction is a sum over
# the F axis, so stacking blocks along F IS the sum over blocks, exactly
# (up to fp summation order inside the MXU). The VPU-bound Chebyshev
# recurrence, the pair-geometry setup, and the position epilogue then run
# ONCE instead of B times; the per-order matmul FLOPs are unchanged (one
# B*F-wide contraction replaces B F-wide ones).
#
# Weight cotangents on this path are ZERO (matching the per-block custom
# VJP, which already returns zeros for c/c2/w0): this is the frozen-model
# simulation path — training gradients flow through message_passing="xla".
# ---------------------------------------------------------------------------


def cheb_stack_apply(fits, lins, pos, x0, rcut, precision="bf16",
                     cell=None, d_min=0.0):
    """Run the full interaction-block stack with the fused-gd backward.

    fits: per-block (c [M1,F], c2 [M2,F], w0 [F]) Chebyshev fits (all
    blocks must share M2 — the fused gd kernel stacks c2 along F).
    lins: per-block dicts with lin1_w, lin2_w, lin2_b, lin_w, lin_b.
    pos [A,3]; x0 [A,F] (the pos-independent embedding — the first
    block's gx path is skipped, same as the per-block dispatch).

    Forward is bit-identical to the per-block path (same kernels, same
    order); only the backward schedule differs. Requires the Pallas
    backend (models/schnet.py gates on _use_pallas).
    """
    fits = tuple(tuple(f) for f in fits)
    lins = tuple(
        {k: lp[k] for k in ("lin1_w", "lin2_w", "lin2_b", "lin_w",
                            "lin_b")}
        for lp in lins
    )
    m2 = {f[1].shape[0] for f in fits}
    if len(m2) != 1:
        raise ValueError(
            "cheb_stack_apply requires every block to share the "
            f"derivative-series order (got {sorted(m2)})."
        )
    return _cheb_stack(
        fits, lins, pos, x0, cell, float(rcut), precision, float(d_min)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _cheb_stack(fits, lins, pos, x0, cell, rcut, precision, d_min):
    out, _ = _cheb_stack_fwd(
        fits, lins, pos, x0, cell, rcut, precision, d_min
    )
    return out


def _cheb_stack_fwd(fits, lins, pos, x0, cell, rcut, precision, d_min):
    _, prec = _dtypes(precision)
    x = x0
    hs, ts = [], []
    for (c, c2, w0), lp in zip(fits, lins):
        h = jnp.dot(x, lp["lin1_w"], precision=prec)
        agg, _ = _cheb_fwd(
            c, c2, w0, pos, h, cell, rcut, precision, True, d_min
        )
        y = jnp.dot(agg, lp["lin2_w"], precision=prec) + lp["lin2_b"]
        t = jnp.tanh(y)
        x = x + jnp.dot(t, lp["lin_w"], precision=prec) + lp["lin_b"]
        hs.append(h)
        ts.append(t)
    return x, (fits, lins, pos, cell, tuple(hs), tuple(ts))


def _cheb_stack_bwd(rcut, precision, d_min, res, g_out):
    from ..ops.pallas.cheb_kernel import cheb_conv_bwd_pallas

    fits, lins, pos, cell, hs, ts = res
    _, prec = _dtypes(precision)
    nb = len(fits)
    g = g_out
    g_aggs = [None] * nb
    for b in range(nb - 1, -1, -1):
        c, c2, w0 = fits[b]
        lp = lins[b]
        # Hand-rolled VJP of x += Lin(tanh(Lin2(conv(Lin1(x))))) wrt the
        # residual stream (weights are frozen on this path).
        gt = jnp.dot(g, lp["lin_w"].T, precision=prec)
        gy = gt * (1.0 - ts[b] * ts[b])
        g_agg = jnp.dot(gy, lp["lin2_w"].T, precision=prec)
        g_aggs[b] = g_agg
        if b > 0:
            # gx-only kernel: propagates the cotangent upstream; its gd
            # chain is deferred to the single fused call below. Block 0's
            # conv input is the pos-independent embedding — its gx path
            # is dead (same skip as the per-block dispatch).
            _, gh = cheb_conv_bwd_pallas(
                c, c2, w0, pos, hs[b], g_agg, rcut, precision,
                need_gx=True, need_gd=False, cell=cell, d_min=d_min,
            )
            g = g + jnp.dot(
                gh.astype(g.dtype), lp["lin1_w"].T, precision=prec
            )
    # ONE fused gd kernel over block-stacked operands: sum_b gd_b falls
    # out of the F-axis contraction.
    c2_cat = jnp.concatenate([f[1] for f in fits], axis=1)
    x_cat = jnp.concatenate(hs, axis=1)
    g_cat = jnp.concatenate(g_aggs, axis=1)
    fdim = c2_cat.shape[1]
    dummy_c = jnp.zeros((1, fdim), c2_cat.dtype)
    w0_cat = jnp.zeros((fdim,), c2_cat.dtype)
    gpos, _ = cheb_conv_bwd_pallas(
        dummy_c, c2_cat, w0_cat, pos, x_cat, g_cat, rcut, precision,
        need_gx=False, need_gd=True, cell=cell, d_min=d_min,
        stacked=True,
    )
    zero_fits = jax.tree_util.tree_map(_param_cotangent, fits)
    zero_lins = jax.tree_util.tree_map(_param_cotangent, lins)
    return (
        zero_fits,
        zero_lins,
        gpos.astype(pos.dtype),
        g.astype(g_out.dtype),
        _cell_cotangent(cell),
    )


_cheb_stack.defvjp(_cheb_stack_fwd, _cheb_stack_bwd)
