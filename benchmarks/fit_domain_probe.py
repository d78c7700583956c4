"""Probe: Chebyshev order needed vs fit-domain restriction.

The filter W'(d) is fitted on z in [-1, 1] <=> d in [0, rcut], but the
physical system never produces pairs below the repulsion floor (~2.7 A
in the zoo chain; bonds ~3.8 A). Refitting on d in [d_min, rcut] (affine
z' with the SAME exact double zero at the cutoff, clamped to -1 below
d_min so out-of-domain pairs get the bounded d_min value instead of a
runaway extrapolation) shrinks the approximation interval and should cut
the order needed at equal max error over the PHYSICAL pair range.

Measures: max |W'_fit - W'_exact| and |dW'/dd| error over d in
[d_eval_min, rcut] as a function of (order, d_min), in float64 — the
function-space convergence that bounds the force error.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np

import jax
from flashmd_tpu.models.zoo import cgschnet_1enh_like

RCUT = 10.0
D_EVAL_MIN = 2.6  # tightest physical pair distance observed in the zoo geometry

ff, _ = cgschnet_1enh_like(
    n_atoms=64, batch_size=1, precision="fp32", message_passing="xla"
)
params = ff.schnet_params
cfg = ff.schnet_config
bp = params["interactions"][0]

offset = np.asarray(params["rbf"]["offset"], np.float64)
coeff = np.float64(np.asarray(params["rbf"]["coeff"]))
layers = [
    {k: np.asarray(v, np.float64) for k, v in layer.items()}
    for layer in bp["filter"]["layers"]
]


def mlp_of_d(d):
    rbf = np.exp(coeff * np.square(d[:, None] - offset[None, :]))
    # rbf cutoff = conv cutoff (cosine, zoo config)
    cut = 0.5 * (np.cos(d * np.pi / RCUT) + 1.0) * (d < RCUT)
    x = rbf * cut[:, None]
    for layer in layers[:-1]:
        x = np.tanh(x @ layer["w"] + layer.get("b", 0.0))
    last = layers[-1]
    return x @ last["w"] + last.get("b", 0.0)


def w_exact(d):
    cut = 0.5 * (np.cos(d * np.pi / RCUT) + 1.0) * (d < RCUT)
    return mlp_of_d(d) * cut[:, None]


def dw_exact(d, eps=1e-6):
    return (w_exact(d + eps) - w_exact(d - eps)) / (2 * eps)


def fit_on(d_min, order, n_nodes=1024):
    """Fit h = W' / (1-z')^2 on z' in [-1,1] <=> d in [d_min, rcut]."""
    k = np.arange(n_nodes)
    zp = np.cos(np.pi * (k + 0.5) / n_nodes)
    d = d_min + (zp + 1.0) * (RCUT - d_min) / 2.0
    u = 1.0 - zp
    # cut(d) / u^2 on the restricted map: cut has a double zero at d=rcut
    # only for d_min=0 does cut/(1-z)^2 have the closed sinc^2 form; in
    # general divide numerically away from u->0 and patch the endpoint by
    # the analytic limit  cut ~ (pi^2/4)(1 - d/rcut)^2 = (pi^2/4) * (u *
    # (rcut - d_min) / (2 rcut))^2.
    cut = 0.5 * (np.cos(d * np.pi / RCUT) + 1.0)
    scale = (RCUT - d_min) / (2.0 * RCUT)
    with np.errstate(divide="ignore", invalid="ignore"):
        cut_over_u2 = cut / (u * u)
    tiny = u < 1e-4
    cut_over_u2[tiny] = (np.pi**2 / 4.0) * scale**2
    h = mlp_of_d(d) * cut_over_u2[:, None]
    m = np.arange(order)
    tmk = np.cos(m[:, None] * np.pi * (k[None, :] + 0.5) / n_nodes)
    c = (2.0 / n_nodes) * (tmk @ h)
    c[0] *= 0.5
    return c


def eval_fit(c, d, d_min):
    zp = 2.0 * (d - d_min) / (RCUT - d_min) - 1.0
    zp = np.clip(zp, -1.0, 1.0)
    order = c.shape[0]
    t_prev = np.ones_like(zp)
    t_cur = zp
    acc = c[0][None, :] * t_prev[:, None] + c[1][None, :] * t_cur[:, None]
    for m in range(2, order):
        t_next = 2 * zp * t_cur - t_prev
        acc = acc + c[m][None, :] * t_next[:, None]
        t_prev, t_cur = t_cur, t_next
    return np.square(1.0 - zp)[:, None] * acc


d_eval = np.linspace(D_EVAL_MIN, RCUT - 1e-9, 4001)
w_ref = w_exact(d_eval)
dw_ref = dw_exact(d_eval)
w_scale = np.abs(w_ref).max()
dw_scale = np.abs(dw_ref).max()

eps = 1e-5
print(f"w scale {w_scale:.3e}  dw scale {dw_scale:.3e}")
print("max rel fit err over d in [%.1f, %.1f]  (W' value | dW'/dd)" % (D_EVAL_MIN, RCUT))
print("order:      " + "".join(f"{o:>16d}" for o in (32, 48, 64, 80, 96)))
for d_min in (0.0, 1.0, 1.5, 2.0, 2.4):
    row_w, row_dw = [], []
    for order in (32, 48, 64, 80, 96):
        c = fit_on(d_min, order)
        w_fit = eval_fit(c, d_eval, d_min)
        dw_fit = (
            eval_fit(c, d_eval + eps, d_min) - eval_fit(c, d_eval - eps, d_min)
        ) / (2 * eps)
        row_w.append(np.abs(w_fit - w_ref).max() / w_scale)
        row_dw.append(np.abs(dw_fit - dw_ref).max() / dw_scale)
    print(
        f"d_min={d_min:3.1f} " + "".join(
            f"  {w:8.1e}|{dw:7.1e}" for w, dw in zip(row_w, row_dw)
        ),
        flush=True,
    )
