"""Default-budget COMPILE smoke over the shipped kernel matrix.

One command a pod operator (or a future kernel edit) runs on real TPU
hardware to prove every user-selectable configuration still fits the
16 MB scoped-VMEM stack at the DEFAULT tile budgets — the class of
regression the round-3 stack default introduced silently (75k OOMing at
order_gx >= 104, first seen only when a symmetric-96 config was
compiled; see _bwd_tile_budget in ops/pallas/cheb_kernel.py and
benchmarks/kernel_gxonly_budget.py). The CPU test suite pins the budget
TABLE (tests/ops/test_cheb_kernel.py); this probe pins the budgets
against the actual Mosaic compiler.

Covers, per (precision x orders x cell) cell of the shipped matrix:
  fwd          cheb_conv_fwd_pallas (forward recurrence)
  gx+gd        per-block backward (FLASHMD_CHEB_STACK=0 path)
  gx-only      the stack path's upstream chainer
  gd-stacked   the stack path's fused terminal kernel (B=3 blocks)
at A=266 (headline) and the risky cells again at A=532.

Exits nonzero if any cell fails, printing the Mosaic VMEM excess.

Usage: python benchmarks/compile_matrix.py [--quick]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import flashmd_tpu.ops.pallas.cheb_kernel as K

F, RCUT, D_MIN = 128, 10.0, 2.0
B_STACK = 3  # headline num_interactions
rng = np.random.default_rng(0)
CELL = jnp.asarray(np.diag([40.0, 40.0, 40.0]), jnp.float32)

failures = []


def _data(a, m1, m2, stacked=False):
    f = F * B_STACK if stacked else F
    c = jnp.asarray(rng.normal(size=(m1, f)) * 0.01, jnp.float32)
    c2 = jnp.asarray(rng.normal(size=(m2, f)) * 0.01, jnp.float32)
    w0 = jnp.asarray(rng.normal(size=(f,)) * 0.01, jnp.float32)
    pos = jnp.asarray(rng.uniform(0, 30, (a, 3)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(a, f)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(a, f)), jnp.float32)
    return c, c2, w0, pos, x, g


def check(tag, fn):
    try:
        jax.block_until_ready(jax.jit(fn)())
        print(f"ok   {tag}", flush=True)
    except Exception as e:
        msg = str(e)
        i = msg.find("exceeded scoped vmem limit by")
        failures.append(tag)
        print(f"FAIL {tag}: {msg[i:i + 45] if i >= 0 else msg[:90]}",
              flush=True)


def cell_matrix(a, m1, m2, prec, cell, tag):
    c, c2, w0, pos, x, g = _data(a, m1, m2)
    check(f"{tag} fwd", lambda: K.cheb_conv_fwd_pallas(
        c, w0, pos, x, RCUT, prec, cell=cell, d_min=D_MIN))
    check(f"{tag} gx+gd", lambda: K.cheb_conv_bwd_pallas(
        c, c2, w0, pos, x, g, RCUT, prec,
        need_gx=True, need_gd=True, cell=cell, d_min=D_MIN)[0])
    check(f"{tag} gx-only", lambda: K.cheb_conv_bwd_pallas(
        c, c2, w0, pos, x, g, RCUT, prec,
        need_gx=True, need_gd=False, cell=cell, d_min=D_MIN)[1])
    cs, c2s, w0s, poss, xs, gs = _data(a, 1, m2, stacked=True)
    check(f"{tag} gd-stacked", lambda: K.cheb_conv_bwd_pallas(
        cs, c2s, w0s, poss, xs, gs, RCUT, prec,
        need_gx=False, need_gd=True, cell=cell, d_min=D_MIN,
        stacked=True)[0])


def main():
    quick = "--quick" in sys.argv
    # (orders, precision) cells of the shipped matrix: the bf16 headline
    # default (48, 64), the bf16 symmetric fidelity points (96, 96) —
    # the round-3 regression cell — the bf16x3 tier default (64, 96),
    # and the fp32 parity path (128, 128).
    cells = [
        (48, 64, "bf16"),
        (96, 96, "bf16"),
        (64, 96, "bf16x3"),
        (128, 128, "fp32"),
    ]
    for m1, m2, prec in cells:
        tag = f"A=266 ({m1},{m2}) {prec}"
        cell_matrix(266, m1, m2, prec, None, tag)
        if not quick:
            cell_matrix(266, m1, m2, prec, CELL, tag + " cell")
    if not quick:
        # large-molecule tiling at the risky cells
        cell_matrix(532, 64, 64, "bf16", None, "A=532 (64,64) bf16")
        cell_matrix(532, 96, 96, "bf16", None, "A=532 (96,96) bf16")
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("\nall cells compile at the default budgets")


if __name__ == "__main__":
    main()
