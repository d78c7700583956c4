"""Asymmetric-order fidelity sweep: truncate the forward series (c) and
the derivative series (c2) INDEPENDENTLY and measure max relative force
error vs the exact fp32 MLP path on the physical zoo geometry.

Mechanism: fit once at FIT_ORDER, then zero coefficient tails — the
kernel output is numerically identical to a genuinely truncated series
(zero coefficients contribute exactly zero), so one compiled program
covers the whole (M1, M2) grid. If fidelity at (M1 < 88, M2) or
(M1, M2 < 88) holds the current 7.2e-3 default, the kernels can skip
the corresponding chain_gx/chain_gd matmuls for a real throughput win
(VERDICT r1 #9).
"""
import os
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from flashmd_tpu.data.system import collate
from flashmd_tpu.models.cheb import attach_cheb_fit
from flashmd_tpu.models.forcefield import build_neighbors
from flashmd_tpu.models.schnet import schnet_energy
from flashmd_tpu.models.zoo import cgschnet_1enh_like

FIT_ORDER = int(os.environ.get("FIT_ORDER", "96"))
# Fit-domain lower bound (cheb_d_min). FIT_DMIN=2.0 restricts the fit to
# the physically reachable pair range (the zoo chain floors at ~2.7 A) —
# same force-error protocol, so grids at different FIT_DMIN are directly
# comparable.
FIT_DMIN = float(os.environ.get("FIT_DMIN", "0"))
N_ATOMS = int(os.environ.get("N_ATOMS", "266"))
# Measurement precision of the cheb path (bf16 | bf16x3 | fp32): the
# (M1, M2) grid at a non-bf16 tier shows where the FIT error floor sits
# once MXU truncation is removed.
FIT_PRECISION = os.environ.get("FIT_PRECISION", "bf16")
# Coefficient fit method (proj | lawson). proj truncates ONE high-order
# fit (valid: a truncated projection IS the lower-order projection);
# lawson is NOT truncation-consistent, so each (M1, M2) point re-fits on
# the host and zero-pads to FIT_ORDER (the kernel runs at FIT_ORDER
# either way — this grid measures fidelity, not speed).
FIT_METHOD = os.environ.get("FIT_METHOD", "proj")

ff, configs = cgschnet_1enh_like(
    n_atoms=N_ATOMS, batch_size=4, precision="fp32", message_passing="xla"
)
system = collate(configs, beta=1.67)
pos = jnp.asarray(system.pos)
types = system.atom_types
nbr = build_neighbors(ff, pos)

# actual pair floor of this geometry (sanity vs FIT_DMIN)
_rel = pos[:, None, :, :] - pos[:, :, None, :]
_d2 = np.array(jnp.sum(_rel * _rel, axis=-1))  # writable host copy
_d2[:, np.arange(N_ATOMS), np.arange(N_ATOMS)] = np.inf
print(f"geometry min pair distance: {np.sqrt(_d2.min()):.3f}", flush=True)


def forces(params, cfg):
    def e(p):
        tot = 0.0
        for s in range(p.shape[0]):
            n_s = jax.tree.map(
                lambda a: a[s] if hasattr(a, "ndim") and a.ndim > 0 else a,
                nbr,
            )
            tot = tot + schnet_energy(params, cfg, p[s], types, n_s)
        return tot

    return jax.jit(jax.grad(e))(pos)


f_ref = np.asarray(forces(ff.schnet_params, ff.schnet_config))
scale = np.abs(f_ref).max()
print("ref scale:", scale, flush=True)

cfg2 = dataclasses.replace(
    ff.schnet_config, precision=FIT_PRECISION, message_passing="cheb",
    cheb_order=FIT_ORDER, cheb_d_min=FIT_DMIN,
)
p_full = attach_cheb_fit(ff.schnet_params, cfg2)
fits = p_full["cheb_fit"]

# coefficient tail norms per block (fraction of total Frobenius norm)
for b, (c, c2, w0) in enumerate(fits):
    cn = np.asarray(jnp.linalg.norm(c, axis=1))
    c2n = np.asarray(jnp.linalg.norm(c2, axis=1))
    def tail(v, m):
        return float(np.sqrt((v[m:] ** 2).sum()) / np.sqrt((v ** 2).sum()))
    print(
        f"block {b}: c tail frac @48/64/80 = "
        f"{tail(cn,48):.1e}/{tail(cn,64):.1e}/{tail(cn,80):.1e}   "
        f"c2 tail frac @48/64/80 = "
        f"{tail(c2n,48):.1e}/{tail(c2n,64):.1e}/{tail(c2n,80):.1e}",
        flush=True,
    )


def truncated(fits, m1, m2):
    out = []
    for c, c2, w0 in fits:
        mask1 = (jnp.arange(FIT_ORDER) < m1)[:, None]
        mask2 = (jnp.arange(FIT_ORDER) < m2)[:, None]
        ct = jnp.where(mask1, c, 0.0)
        c2t = jnp.where(mask2, c2, 0.0)
        # self-pair value must match the truncated forward series
        signs = jnp.where(jnp.arange(FIT_ORDER) % 2 == 0, 1.0, -1.0)
        w0t = 4.0 * (signs @ ct)
        out.append((ct, c2t, w0t))
    return tuple(out)


def _density_weight():
    """sqrt of the empirical pair-distance density of this geometry
    (with a floor so sparsely-populated distances are not abandoned) —
    force error ACCUMULATES over pairs, so the right fit objective
    weights per-distance error by how many pairs live there."""
    rcut = float(ff.schnet_config.cutoff.cutoff_upper)
    dd = np.sqrt(_d2[np.isfinite(_d2)])
    dd = dd[dd < rcut]
    hist, edges = np.histogram(dd, bins=64, range=(0.0, rcut))
    centers = 0.5 * (edges[:-1] + edges[1:])
    rho = hist.astype(np.float64)
    rho = np.sqrt(rho + 0.05 * rho.max())

    def ew(d):
        return np.interp(d, centers, rho)

    return ew


def refit(m1, m2):
    """Host re-fit (FIT_METHOD) at the TRUE orders, zero-padded to
    FIT_ORDER. FIT_METHOD may carry a 'rho' suffix (e.g. wlsrho) to add
    the empirical sqrt-pair-density importance weight."""
    from flashmd_tpu.models.cheb import fit_chebyshev_filter_host

    method = FIT_METHOD
    ew = None
    if method.endswith("rho"):
        method = method[: -len("rho")]
        ew = _density_weight()
    cfgm = dataclasses.replace(cfg2, cheb_fit_method=method)
    out = []
    for bp in ff.schnet_params["interactions"]:
        c, c2, w0 = fit_chebyshev_filter_host(
            bp, ff.schnet_params["rbf"], cfgm, order=m1, order_deriv=m2,
            extra_weight=ew,
        )
        cpad = jnp.zeros((FIT_ORDER, c.shape[1]), c.dtype).at[:m1].set(c)
        c2pad = (
            jnp.zeros((FIT_ORDER, c2.shape[1]), c2.dtype).at[:m2].set(c2)
        )
        out.append((cpad, c2pad, w0))
    return tuple(out)


grid = [
    int(x)
    for x in os.environ.get(
        "FIT_GRID", "96,88,80,72,64,56,48"
    ).split(",")
]
print("\nmax rel force err grid (rows = M1 fwd order, cols = M2 deriv order)")
print("        " + "".join(f"{m2:>10d}" for m2 in grid))
results = {}
for m1 in grid:
    row = []
    for m2 in grid:
        p_t = {
            **p_full,
            "cheb_fit": (
                truncated(fits, m1, m2)
                if FIT_METHOD == "proj"
                else refit(m1, m2)
            ),
        }
        f = np.asarray(forces(p_t, cfg2))
        err = np.abs(f - f_ref).max() / scale
        results[(m1, m2)] = err
        row.append(err)
    print(f"M1={m1:>3d} " + "".join(f"{e:>10.2e}" for e in row), flush=True)
