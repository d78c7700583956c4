"""Transposed-state backward, round-4 attempt (VERDICT r3 #6).

The round-3 transposed probe (kernel_tbwd.py) measured 1.6-2.1x SLOWER
because every PER-GROUP chain-chunk concat/slice sat at non-128-aligned
lane offsets (ta = 272). This probe removes the per-group unaligned ops:

  1. gx series on the That basis (production already does this): the
     per-group ``us * h`` multiply disappears; the gx rhs concat is on
     SUBLANES (272 % 8 == 0 — aligned).
  2. DEFERRED cross-chain gd reduction: accumulate ``gd_stacked
     [A_pad, n*ta] += h ⊙ umt`` per group (exact-lane elementwise) and
     slice-sum the n chain blocks ONCE after the order loop instead of
     every group.

  Remaining unaligned per-group op: the gd rhs build (concat along
  lanes at ta-offsets, [F, n*ta]). If that still dominates, the record
  closes the question.

Also measures a PRODUCTION-orientation variant with the deferred
reduction only (prod_deferred) — the per-group sublane slice-sum there
is aligned but still ~1/5 of the group's VPU work.

Run on the TPU chip: python benchmarks/kernel_tbwd2.py
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

rng = np.random.default_rng(0)
cgx = jnp.asarray(rng.normal(size=(MGX, F)) * 0.01, jnp.float32)
cgd = jnp.asarray(rng.normal(size=(MGD, F)) * 0.01, jnp.float32)
w0 = jnp.asarray(rng.normal(size=(F,)) * 0.01, jnp.float32)
from flashmd_tpu.models.cheb import _lin_slope

wlin = _lin_slope(cgd).astype(jnp.float32)
pos = jnp.asarray(rng.uniform(0, 30, (S, A, 3)), jnp.float32)
x = jnp.asarray(rng.normal(size=(S, A, F)), jnp.float32)
g = jnp.asarray(rng.normal(size=(S, A, F)), jnp.float32)


def _tbwd2_kernel(pos_ref, x_ref, c_ref, c2t_ref, w0_ref, g_ref,
                  wlin_ref, gpos_ref, gx_ref, *,
                  order_gx, order_gd, rcut, a_pad, a_real, ta, need_gx,
                  need_gd, d_min, defer):
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
    gt_tile = g_tile.T                            # [F, ta] (one-time)

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
    qs = jnp.concatenate([q] * n, axis=1)
    # That chains (production basis): u * T_m — serves gx directly
    # (That-basis coefficients) and gd (c2 lives on (1-z) T_m).
    hs_prev = jnp.concatenate([u * p for p in pp[0:n]], axis=1)
    hs_cur = jnp.concatenate([u * p for p in pp[n:2 * n]], axis=1)

    def chain_gx(h_stacked, m):
        # sublane concat (ta % 8 == 0): aligned
        rhs = jnp.concatenate(
            [c_ref[pl.ds(m + cch, 1), :] * g_tile for cch in range(n)],
            axis=0,
        )  # [n*ta, F]
        return jax.lax.dot_general(
            h_stacked, rhs,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [A_pad, F]

    def chain_gd_term(h_stacked, m):
        # lane concat at ta-offsets: THE remaining unaligned per-group op
        rhst = jnp.concatenate(
            [c2t_ref[:, pl.ds(m + cch, 1)] * gt_tile for cch in range(n)],
            axis=1,
        )  # [F, n*ta]
        umt = jax.lax.dot_general(
            xx, rhst, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [A_pad, n*ta] — exact lanes
        return h_stacked * umt

    def reduce_chains(stacked):
        acc = stacked[:, 0:ta]
        for cch in range(1, n):
            acc = acc + stacked[:, cch * ta:(cch + 1) * ta]
        return acc  # [A_pad, ta]

    if defer:
        def chain_gd(h, m):
            return chain_gd_term(h, m)
        gd0 = chain_gd(hs_prev, 0) + chain_gd(hs_cur, n)
    else:
        def chain_gd(h, m):
            return reduce_chains(chain_gd_term(h, m))
        gd0 = chain_gd(hs_prev, 0) + chain_gd(hs_cur, n)
    gd = gd0 if need_gd else None

    groups_gd = order_gd // n if need_gd else 0

    def step_gd(h, m, accs):
        return (accs[0] + chain_gd(h, m),)

    if need_gx:
        groups_gx = order_gx // n
        shared = min(groups_gx, groups_gd) if need_gd else 2
        gx_acc = chain_gx(hs_prev, 0) + chain_gx(hs_cur, n)

        def step_both(h, m, accs):
            return (accs[0] + chain_gx(h, m), accs[1] + chain_gd(h, m))

        def step_gx(h, m, accs):
            return (accs[0] + chain_gx(h, m),)

        if need_gd:
            hs_prev, hs_cur, (gx_acc, gd) = K._run_bwd_groups(
                2, shared, hs_prev, hs_cur, (gx_acc, gd), step_both, qs, n
            )
        if groups_gx > shared:
            hs_prev, hs_cur, (gx_acc,) = K._run_bwd_groups(
                shared, groups_gx, hs_prev, hs_cur, (gx_acc,), step_gx,
                qs, n,
            )
        elif need_gd and groups_gd > shared:
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
    elif need_gd:
        hs_prev, hs_cur, (gd,) = K._run_bwd_groups(
            2, groups_gd, hs_prev, hs_cur, (gd,), step_gd, qs, n
        )

    if not need_gd:
        return
    if defer:
        gd = reduce_chains(gd)  # ONCE, after the order loop

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


def tbwd2(pos1, x1, g1, need_gx=True, need_gd=True, n_tiles=1,
          defer=True):
    a_pad = K._round_up(A, 8)
    ta = K._round_up(-(-a_pad // n_tiles), 8)
    a_pad = K._round_up(a_pad, ta)
    c = cgx
    if need_gx:
        c = K._to_that_basis(cgx, N)
    order_gx = c.shape[0]
    kernel = functools.partial(
        _tbwd2_kernel, order_gx=order_gx, order_gd=MGD, rcut=RCUT,
        a_pad=a_pad, a_real=A, ta=ta, need_gx=need_gx, need_gd=need_gd,
        d_min=D_MIN, defer=defer,
    )
    c2t = cgd.T  # [F, MGD]
    gpos, gx = pl.pallas_call(
        kernel,
        grid=(1, a_pad // ta),
        in_specs=[
            pl.BlockSpec((1, a_pad, 3), lambda s, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_pad, F), lambda s, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((order_gx, F), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, MGD), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_pad, F), lambda s, t: (0, 0, 0),
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
        c, c2t, w0[None, :],
        K._pad_atoms(g1.astype(jnp.float32), a_pad)[None],
        wlin[None, :],
    )
    return gpos[0, :A], gx[0, :A]


# ---- correctness vs production kernel
ref_gpos, ref_gx = K.cheb_conv_bwd_pallas(
    cgx, cgd, w0, pos[0], x[0], g[0], RCUT, "bf16", need_gx=True,
    d_min=D_MIN,
)
for defer in (True, False):
    for nt in (1, 2):
        try:
            got_gpos, got_gx = tbwd2(
                pos[0], x[0], g[0], defer=defer, n_tiles=nt
            )
        except Exception as e:
            print(f"tbwd2(defer={defer}, t={nt}): FAIL {str(e)[:120]}",
                  flush=True)
            continue
        for nm, a, b in [
            ("gpos", ref_gpos, got_gpos), ("gx", ref_gx, got_gx)
        ]:
            err = float(
                jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-30)
            )
            print(f"tbwd2(defer={defer}, t={nt}) {nm}: "
                  f"max rel diff {err:.2e}", flush=True)


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
        print(f"{name}: FAIL {str(e)[:140]}", flush=True)
        return None
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(loop(x)))
        ts.append((time.perf_counter() - t0) / ITERS / S * 1e6)
    print(f"{name:32s}: {sorted(ts)[1]:7.2f} us/mol", flush=True)


bench("PROD gx+gd (48,64) n=8",
      lambda xx: K.cheb_conv_bwd_pallas(
          cgx, cgd, w0, pos[0], xx, g[0], RCUT, "bf16", need_gx=True,
          d_min=D_MIN)[1])
for nt in (1, 2):
    bench(f"TBWD2 gx+gd defer t={nt}",
          lambda xx, nt=nt: tbwd2(pos[0], xx, g[0], n_tiles=nt)[1])
    bench(f"TBWD2 gx+gd nodefer t={nt}",
          lambda xx, nt=nt: tbwd2(
              pos[0], xx, g[0], defer=False, n_tiles=nt)[1])
bench("PROD gd-only n=8",
      lambda xx: K.cheb_conv_bwd_pallas(
          cgx, cgd, w0, pos[0], xx, g[0], RCUT, "bf16", need_gx=False,
          d_min=D_MIN)[0].sum(axis=-1, keepdims=True) * jnp.zeros((1, F)))
for nt in (1, 2):
    bench(f"TBWD2 gd-only defer t={nt}",
          lambda xx, nt=nt: tbwd2(
              pos[0], xx, g[0], need_gx=False, n_tiles=nt)[0]
          .sum(axis=-1, keepdims=True) * jnp.zeros((1, F)))
bench("PROD gx-only (stack path)",
      lambda xx: K.cheb_conv_bwd_pallas(
          cgx, cgd, w0, pos[0], xx, g[0], RCUT, "bf16", need_gx=True,
          need_gd=False, d_min=D_MIN)[1])
for nt in (1, 2):
    bench(f"TBWD2 gx-only t={nt}",
          lambda xx, nt=nt: tbwd2(
              pos[0], xx, g[0], need_gd=False, n_tiles=nt)[1])
