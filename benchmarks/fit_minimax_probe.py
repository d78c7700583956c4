"""Probe: can a weighted / minimax (Lawson) refit cut the Chebyshev order?

The production fit (models/cheb.py fit_chebyshev_filter_host) projects the
basis-stripped targets h = W'/(1-z)^2 and h2 = (dW'/dd)/(1-z) onto T_m at
Chebyshev-Gauss nodes — the L2-optimal *unweighted* fit of h/h2. But the
quantity the kernels reconstruct is W' (resp. dW'/dd), i.e. the fit error
gets re-multiplied by (1-z)^2 (resp. (1-z)): an unweighted fit overspends
accuracy near z=1 (where the basis factor kills the error anyway) and
underspends near z=-1 (where it is amplified x4 / x2).

This probe compares, per order, the max abs reconstruction error over the
fit domain (the quantity that feeds force fidelity) for:
  proj      — the production truncated projection
  wls       — weighted least squares with weight = the basis factor
  lawson    — Lawson's iteratively-reweighted LS (approaches weighted
              minimax of the reconstructed quantity)

Run on CPU (host fp64): env PYTHONPATH= JAX_PLATFORMS=cpu \
    python benchmarks/fit_minimax_probe.py
"""

import os

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def targets(n_nodes=2048):
    """Return z grid, basis weights, and fp64 targets h, h2, plus the
    reference W', dW'/dd on the zoo filter of block 0 (d_min=2.0)."""
    from flashmd_tpu.models.cheb import _cutoff_np, _sigma
    from flashmd_tpu.models.zoo import cgschnet_1enh_like

    ff, _ = cgschnet_1enh_like(
        batch_size=1, precision="bf16", message_passing="cheb",
        cheb_d_min=2.0,
    )
    params, config = ff.schnet_params, ff.schnet_config
    rbf_params = params["rbf"]
    block_params = params["interactions"][0]

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
        {kk: np.asarray(vv, dtype=np.float64) for kk, vv in layer.items()}
        for layer in block_params["filter"]["layers"]
    ]

    def w_of_d(dd):
        rbf = np.exp(coeff * np.square(dd[:, None] - offset[None, :]))
        rbf = rbf * _cutoff_np(config.rbf_config.cutoff, dd)[:, None]
        x = rbf
        for layer in layers[:-1]:
            x = np.tanh(x @ layer["w"] + layer.get("b", 0.0))
        last = layers[-1]
        return x @ last["w"] + last.get("b", 0.0)

    w = w_of_d(d)
    sinc = np.sinc(u * (sigma / 2.0))
    cut_over_u2 = (np.pi * sigma / 2.0) ** 2 * sinc * sinc
    h = w * cut_over_u2[:, None]

    eps = 1e-6
    dm = (w_of_d(d + eps) - w_of_d(d - eps)) / (2.0 * eps)
    sinc_full = np.sinc(u * sigma)
    h2 = (
        dm * (u * cut_over_u2)[:, None]
        - w * ((np.pi**2 * sigma / (2.0 * rcut)) * sinc_full)[:, None]
    )

    wprime = h * (u**2)[:, None]          # W'(d)
    dwprime = h2 * u[:, None]             # dW'/dd
    return z, k, n_nodes, u, h, h2, wprime, dwprime


def cheb_matrix(order, k, n_nodes):
    m = np.arange(order, dtype=np.float64)
    return np.cos(m[:, None] * np.pi * (k[None, :] + 0.5) / n_nodes)  # [M,N]


def fit_proj(target, tmk, n_nodes):
    c = (2.0 / n_nodes) * (tmk @ target)
    c[0] *= 0.5
    return c


def fit_wls(target, tmk, weight):
    """Per-feature weighted LS: minimize || W (target - T c) ||_2."""
    A = tmk.T * weight[:, None]            # [N, M]
    B = target * weight[:, None]           # [N, F]
    c, *_ = np.linalg.lstsq(A, B, rcond=None)
    return c


def fit_lawson(target, tmk, weight, iters=30):
    """Lawson IRLS toward weighted-minimax, per feature (vectorized via a
    per-feature loop of small lstsq solves)."""
    N, F = target.shape
    M = tmk.shape[0]
    out = np.empty((M, F))
    for f in range(F):
        lw = np.full(N, 1.0 / N)
        t = target[:, f]
        for _ in range(iters):
            sw = np.sqrt(lw) * weight
            A = tmk.T * sw[:, None]
            b = t * sw
            c, *_ = np.linalg.lstsq(A, b, rcond=None)
            r = np.abs((t - tmk.T @ c) * weight)
            lw = lw * r
            s = lw.sum()
            if s <= 0:
                break
            lw /= s
        out[:, f] = c
    return out


def main():
    z, k, n_nodes, u, h, h2, wprime, dwprime = targets()
    scale_w = np.abs(wprime).max()
    scale_dw = np.abs(dwprime).max()

    print(f"# targets: F={h.shape[1]}, scale W'={scale_w:.3e}, "
          f"dW'={scale_dw:.3e}")
    header = (
        "series order   proj_err    wls_err   lawson_err  (max abs, "
        "reconstructed quantity, /scale)"
    )
    print(header)

    # The lawson/wls weight carries a +0.05 FLOOR: the raw basis factor
    # vanishes at z = 1, leaving the fit unconstrained there, and the
    # floor-less minimax solution has 20-1000x larger oscillating
    # coefficients whose finite-precision evaluation noise swamps the
    # fit gain on TPU (measured 4.9e-2 force error at (64, 64) vs the
    # projection's 7e-3). With the floor the coefficient L1 norms match
    # the projection's within ~10%. The ERROR column still reports the
    # true delivered error (basis-weighted residual, no floor).
    for label, target, basis_w, ref, scale in (
        ("fwd ", h, u**2, wprime, scale_w),
        ("deriv", h2, u, dwprime, scale_dw),
    ):
        fit_w = basis_w + 0.05
        for order in (40, 48, 56, 64, 72, 80):
            tmk = cheb_matrix(order, k, n_nodes)
            errs = []
            for fit in (
                lambda: fit_proj(target, tmk, n_nodes),
                lambda: fit_wls(target, tmk, fit_w),
                lambda: fit_lawson(target, tmk, fit_w),
            ):
                c = fit()
                recon = (tmk.T @ c) * basis_w[:, None]
                errs.append(np.abs(recon - ref).max() / scale)
            print(
                f"{label}  {order:5d}  {errs[0]:.3e}  {errs[1]:.3e}  "
                f"{errs[2]:.3e}"
            )


if __name__ == "__main__":
    main()
