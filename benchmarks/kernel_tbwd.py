"""Experimental TRANSPOSED-STATE backward cheb kernel (probe).

Measured (benchmarks, 2026-08-19): the [*, A_pad] lane padding
(272 -> 384, 41%) is ~fully paid in the backward kernels (A=256 vs 266
time ratio ~0.72 vs the 0.886 FLOP ratio). Transposing the chain state
to [A_pad, n*ta] puts the stacked chain axis on lanes — 8*272 = 2176 =
17*128 exact — and makes BOTH backward matmuls standard-orientation
with zero-padded-free shapes:

  gx:  dot(us*h [A_pad, n*ta], rhs [n*ta, F])      (lanes x sublanes)
  gd:  umT = dot(x [A_pad, F], rhsT [F, n*ta])     (lanes x sublanes)

vs the production kernel where gx's LHS lanes and gd's output lanes are
A_pad-padded. Correctness-checked against the production kernel, then
timed within-process.
"""
import functools
import os
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import flashmd_tpu.ops.pallas.cheb_kernel as K

A = int(os.environ.get("ATOMS", 266))
F, S = 128, 128
MGX, MGD = 48, 64
N = 8
ITERS = 40
RCUT, D_MIN = 10.0, 2.0
TILES = int(os.environ.get("TILES", 2))

rng = np.random.default_rng(0)
cgx = jnp.asarray(rng.normal(size=(MGX, F)) * 0.01, jnp.float32)
cgd = jnp.asarray(rng.normal(size=(MGD, F)) * 0.01, jnp.float32)
w0 = jnp.asarray(rng.normal(size=(F,)) * 0.01, jnp.float32)
from flashmd_tpu.models.cheb import _lin_slope
wlin = _lin_slope(cgd).astype(jnp.float32)  # match production has_lin
pos = jnp.asarray(rng.uniform(0, 30, (S, A, 3)), jnp.float32)
x = jnp.asarray(rng.normal(size=(S, A, F)), jnp.float32)
g = jnp.asarray(rng.normal(size=(S, A, F)), jnp.float32)


def _tbwd_kernel(pos_ref, x_ref, c_ref, c2t_ref, w0_ref, g_ref, gt_ref,
                 wlin_ref, gpos_ref, gx_ref, *,
                 order_gx, order_gd, rcut, a_pad, a_real, ta, need_gx,
                 d_min):
    n = N
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        gpos_ref[0] = jnp.zeros_like(gpos_ref[0])
        gx_ref[0] = jnp.zeros_like(gx_ref[0])

    pos_all = pos_ref[0]
    pos_tile = pos_ref[0, pl.ds(t * ta, ta), :]
    xx = x_ref[0]
    g_tile = g_ref[0, pl.ds(t * ta, ta), :]       # [ta, F]
    del gt_ref
    gt_tile = g_tile.T                            # [F, ta] (one-time)

    # transposed geometry: rows = source atoms j, cols = dest tile r
    rel0 = pos_all[:, 0:1] - pos_tile[:, 0:1].T   # [A_pad, ta]
    rel1 = pos_all[:, 1:2] - pos_tile[:, 1:2].T
    rel2 = pos_all[:, 2:3] - pos_tile[:, 2:3].T
    d2 = rel0 * rel0 + rel1 * rel1 + rel2 * rel2
    d = jnp.sqrt(d2 + 1e-12)
    srcs = jax.lax.broadcasted_iota(jnp.int32, (a_pad, ta), 0)
    dsts = t * ta + jax.lax.broadcasted_iota(jnp.int32, (a_pad, ta), 1)
    is_pad = (srcs >= a_real) | (dsts >= a_real)
    d = jnp.where(is_pad, 2.0 * rcut, d)
    z = jnp.clip((d - d_min) * (2.0 / (rcut - d_min)) - 1.0, -1.0, 1.0)

    u = 1.0 - z
    pp = K._plain_seeds(z, n)
    q = 2.0 * K._plain_t(z, n)
    us = jnp.concatenate([u] * n, axis=1)          # [A_pad, n*ta]
    qs = jnp.concatenate([q] * n, axis=1)
    hs_prev = us * jnp.concatenate(pp[0:n], axis=1)
    hs_cur = us * jnp.concatenate(pp[n:2 * n], axis=1)

    def chain_gx(h_stacked, m):
        rhs = jnp.concatenate(
            [c_ref[pl.ds(m + cch, 1), :] * g_tile for cch in range(n)],
            axis=0,
        )  # [n*ta, F]
        return jax.lax.dot_general(
            us * h_stacked, rhs,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [A_pad, F]

    def chain_gd(h_stacked, m):
        rhst = jnp.concatenate(
            [c2t_ref[:, pl.ds(m + cch, 1)] * gt_tile for cch in range(n)],
            axis=1,
        )  # [F, n*ta]
        umt = jax.lax.dot_general(
            xx, rhst, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [A_pad, n*ta] — zero-pad-free when n*ta % 128 == 0
        prod = h_stacked * umt
        acc = prod[:, 0:ta]
        for cch in range(1, n):
            acc = acc + prod[:, cch * ta:(cch + 1) * ta]
        return acc  # [A_pad, ta]

    gd = chain_gd(hs_prev, 0) + chain_gd(hs_cur, n)

    groups_gd = order_gd // n

    def step_gd(h, m, accs):
        return (accs[0] + chain_gd(h, m),)

    if need_gx:
        groups_gx = order_gx // n
        shared = min(groups_gx, groups_gd)
        gx_acc = chain_gx(hs_prev, 0) + chain_gx(hs_cur, n)

        def step_both(h, m, accs):
            return (accs[0] + chain_gx(h, m), accs[1] + chain_gd(h, m))

        def step_gx(h, m, accs):
            return (accs[0] + chain_gx(h, m),)

        hs_prev, hs_cur, (gx_acc, gd) = K._run_bwd_groups(
            2, shared, hs_prev, hs_cur, (gx_acc, gd), step_both, qs, n
        )
        if groups_gx > shared:
            hs_prev, hs_cur, (gx_acc,) = K._run_bwd_groups(
                shared, groups_gx, hs_prev, hs_cur, (gx_acc,), step_gx,
                qs, n,
            )
        elif groups_gd > shared:
            hs_prev, hs_cur, (gd,) = K._run_bwd_groups(
                shared, groups_gd, hs_prev, hs_cur, (gd,), step_gd, qs, n
            )
        low = jnp.where(srcs == dsts, 0.0, jnp.minimum(d - d_min, 0.0))
        gx_acc = gx_acc + jax.lax.dot_general(
            low, wlin_ref[:] * g_tile,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gx_ref[0] += gx_acc
        gx_ref[0, pl.ds(t * ta, ta), :] += -(w0_ref[:] * g_tile)
    else:
        hs_prev, hs_cur, (gd,) = K._run_bwd_groups(
            2, groups_gd, hs_prev, hs_cur, (gd,), step_gd, qs, n
        )

    keep = (d < rcut) & (srcs != dsts) & ~is_pad
    w_rt = jnp.where(keep, gd / d, 0.0)  # [A_pad, ta]
    rowsum = jnp.sum(w_rt, axis=0, keepdims=True)  # [1, ta]
    gpos_row = pos_tile * rowsum.T - jax.lax.dot_general(
        w_rt, pos_all, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    gpos_ref[0, pl.ds(t * ta, ta), :] += gpos_row

    colsum = jnp.sum(w_rt, axis=1, keepdims=True)  # [A_pad, 1]
    gpos_col = pos_all * colsum - jax.lax.dot_general(
        w_rt, pos_tile, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    gpos_ref[0] += gpos_col


def tbwd(pos1, x1, g1, need_gx=True, n_tiles=TILES):
    a_pad = K._round_up(A, 8)
    ta = K._round_up(-(-a_pad // n_tiles), 8)
    a_pad = K._round_up(a_pad, ta)
    kernel = functools.partial(
        _tbwd_kernel, order_gx=MGX, order_gd=MGD, rcut=RCUT, a_pad=a_pad,
        a_real=A, ta=ta, need_gx=need_gx, d_min=D_MIN,
    )
    gt = K._pad_atoms(g1.astype(jnp.float32), a_pad).T  # [F, A_pad]
    c2t = cgd.T  # [F, MGD]
    gpos, gx = pl.pallas_call(
        kernel,
        grid=(1, a_pad // ta),
        in_specs=[
            pl.BlockSpec((1, a_pad, 3), lambda s, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_pad, F), lambda s, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MGX, F), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, MGD), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_pad, F), lambda s, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, a_pad), lambda s, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, a_pad, 3), lambda s, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_pad, F), lambda s, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, a_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((1, a_pad, F), jnp.float32),
        ),
    )(
        K._pad_atoms(pos1.astype(jnp.float32), a_pad)[None],
        K._pad_atoms(x1.astype(jnp.float32), a_pad)[None],
        cgx, c2t, w0[None, :],
        K._pad_atoms(g1.astype(jnp.float32), a_pad)[None],
        gt[None], wlin[None, :],
    )
    return gpos[0, :A], gx[0, :A]


# ---- correctness vs production kernel
ref_gpos, ref_gx = K.cheb_conv_bwd_pallas(
    cgx, cgd, w0, pos[0], x[0], g[0], RCUT, "bf16", need_gx=True,
    d_min=D_MIN,
)
got_gpos, got_gx = tbwd(pos[0], x[0], g[0], need_gx=True)
for nm, a, b in [("gpos", ref_gpos, got_gpos), ("gx", ref_gx, got_gx)]:
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-30))
    print(f"tbwd {nm}: max rel diff vs production {err:.2e}")


def bench(name, one):
    vm = jax.vmap(one)

    @jax.jit
    def loop(x0):
        return jax.lax.fori_loop(
            0, ITERS, lambda _, xx: xx + 0.0 * vm(xx), x0
        )

    try:
        float(jnp.sum(loop(x)))
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:140]}")
        return None
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(loop(x)))
        ts.append((time.perf_counter() - t0) / ITERS / S * 1e6)
    print(f"{name:28s}: {sorted(ts)[1]:7.2f} us/mol")


bench("PROD gx (48,64) n=8",
      lambda xx: K.cheb_conv_bwd_pallas(
          cgx, cgd, w0, pos[0], xx, g[0], RCUT, "bf16", need_gx=True,
          d_min=D_MIN)[1])
bench(f"TBWD gx (48,64) n=8 t={TILES}",
      lambda xx: tbwd(pos[0], xx, g[0], need_gx=True)[1])
bench("PROD gd-only 64 n=8",
      lambda xx: K.cheb_conv_bwd_pallas(
          cgx, cgd, w0, pos[0], xx, g[0], RCUT, "bf16", need_gx=False,
          d_min=D_MIN)[0].sum(axis=-1, keepdims=True) * jnp.zeros((1, F)))
bench(f"TBWD gd-only 64 n=8 t={TILES}",
      lambda xx: tbwd(pos[0], xx, g[0], need_gx=False)[0]
      .sum(axis=-1, keepdims=True) * jnp.zeros((1, F)))
