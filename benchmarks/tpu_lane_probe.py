"""Probe the _bwd_tile_budget cells on the real chip: compile + time.

Usage:  python benchmarks/tpu_lane_probe.py [--budgets 28000,30000,...]

For each (a, f, m1, m2, precision, need_gx, need_gd, cell) cell, tries
the DEFAULT budget first, then any --budgets overrides, reporting
compile success and median wall time. Used to (re)measure the budget
table when the TPU test lane flags a scoped-VMEM OOM.
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from flashmd_tpu.models.cutoff import CosineCutoff
from flashmd_tpu.models.schnet import SchNetConfig, init_schnet
from flashmd_tpu.models.cheb import fit_chebyshev_filter
from flashmd_tpu.ops.pallas.cheb_kernel import cheb_conv_bwd_pallas

RCUT = 4.0

CELLS = [
    (266, 128, 48, 64, "bf16", True, True, False),
    (532, 128, 48, 64, "bf16", True, True, False),
    (532, 128, 48, 64, "bf16", False, True, False),
    (266, 128, 96, 96, "fp32", True, False, False),
    (266, 128, 64, 96, "bf16x3", True, False, False),
    (266, 256, 48, 64, "bf16", True, True, False),
    (266, 128, 64, 96, "bf16x3", True, True, False),
    (266, 128, 48, 64, "bf16", True, True, True),
    (532, 128, 48, 64, "bf16", True, True, True),
    # gd-only at A=266 (n=8 75k cell; A=532 variant is cell [2])
    (266, 128, 48, 64, "bf16", False, True, False),  # [9]
    # n_chains=4 cells (order_deriv not a multiple of 8)
    (266, 128, 48, 60, "bf16", True, True, False),  # [10] 74k cell
    (266, 128, 48, 60, "bf16", False, True, False),  # [11] 120k cell
    (532, 128, 48, 60, "bf16", True, True, False),  # [12]
    # gx-only tier-default order (<= 72): the 75k gx-only cell
    (266, 128, 64, 64, "bf16", True, False, False),  # [13]
    # fp32 at the bf16x3-tier orders (the TPU-lane reference path):
    # the fp32 live set is larger than bf16/bf16x3 at equal budget
    (266, 128, 64, 96, "fp32", True, True, False),  # [14] TT
    (266, 128, 64, 64, "fp32", True, False, False),  # [15] gx-only 72
    (532, 128, 64, 96, "fp32", True, True, False),  # [16]
    (266, 128, 96, 96, "fp32", True, True, False),  # [17] TT, gx 104
]


def _fit(f, m1, m2):
    cfg = SchNetConfig(
        hidden_channels=f, embedding_size=6, num_filters=f, num_rbf=50,
        num_interactions=1, cutoff=CosineCutoff(0.0, RCUT),
        output_hidden_layer_widths=(32,),
    )
    params = init_schnet(jax.random.PRNGKey(0), cfg)
    return fit_chebyshev_filter(
        params["interactions"][0], params["rbf"], cfg, order=m1,
        order_deriv=m2,
    )


def probe(cell_spec, budget):
    a, f, m1, m2, prec, gx, gd, has_cell = cell_spec
    c, c2, w0 = _fit(f, m1, m2)
    box = 12.0
    cell = jnp.eye(3, dtype=jnp.float32) * box if has_cell else None
    rng = np.random.default_rng(0)
    side = (a / 0.05) ** (1 / 3) if not has_cell else box
    pos = jnp.asarray(rng.uniform(0, side, (a, 3)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(a, f)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(a, f)), jnp.float32)

    fn = jax.jit(
        lambda *ops: cheb_conv_bwd_pallas(
            *ops, RCUT, prec, need_gx=gx, need_gd=gd,
            tile_budget=budget, cell=cell,
        )
    )
    try:
        out = fn(c, c2, w0, pos, x, g)
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        if "vmem" in msg.lower() or "memory" in msg.lower():
            over = [w for w in msg.split() if w.endswith("M")][:4]
            return f"OOM {' '.join(over)}"
        return f"FAIL {msg.splitlines()[0][:90]}"
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(c, c2, w0, pos, x, g))
        ts.append(time.perf_counter() - t0)
    return f"ok {np.median(ts) * 1e6:8.1f} us"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budgets", default="")
    ap.add_argument("--cells", default="", help="comma list of cell idxs")
    args = ap.parse_args()
    budgets = [None] + [
        int(b) for b in args.budgets.split(",") if b.strip()
    ]
    idxs = (
        [int(i) for i in args.cells.split(",") if i.strip()]
        or range(len(CELLS))
    )
    for i in idxs:
        spec = CELLS[i]
        for b in budgets:
            label = "default" if b is None else str(b)
            print(f"[{i}] {spec} budget={label}: ", end="", flush=True)
            print(probe(spec, b))


if __name__ == "__main__":
    main()
