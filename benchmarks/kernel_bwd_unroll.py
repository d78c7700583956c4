"""Backward-kernel unroll strategy shootout on the real TPU.

The fully-unrolled backward OOMs the 16 MB scoped-VMEM stack at the
forward's tile budget; compare: double-step fori_loop (committed),
full unroll at reduced tile budgets, and partial (chunked) unroll.
"""
import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import flashmd_tpu.ops.pallas.cheb_kernel as K

import os
A, F, ORDER, S = 266, 128, int(os.environ.get("ORDER", "96")), 128
RCUT = 10.0
rng = np.random.default_rng(0)
c = jnp.asarray(rng.normal(size=(ORDER, F)), jnp.float32)
c2 = jnp.asarray(rng.normal(size=(ORDER, F)), jnp.float32)
w0 = jnp.asarray(rng.normal(size=(F,)), jnp.float32)
pos = jnp.asarray(rng.uniform(0, 30, (S, A, 3)), jnp.float32)
x = jnp.asarray(rng.normal(size=(S, A, F)), jnp.float32)
g = jnp.asarray(rng.normal(size=(S, A, F)), jnp.float32)


def timeit(f, *args, n=30):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def make_kernel(strategy):
    """strategy: 'loop2' | 'full' | 'chunk4' | 'chunk8'"""
    def kern(pos_ref, x_ref, c_ref, c2_ref, w0_ref, g_ref, gpos_ref,
             gx_ref, *, order, rcut, a_pad, a_real, ta, precision,
             need_gx=True):
        n = K.N_CHAINS
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            gpos_ref[0] = jnp.zeros_like(gpos_ref[0])
            gx_ref[0] = jnp.zeros_like(gx_ref[0])

        pos_ = pos_ref[0]
        pos_tile = pos_ref[0, pl.ds(t * ta, ta), :]
        xx = x_ref[0]
        gg = g_ref[0]
        d, z, rows, cols, is_pad = K._tile_geometry(
            pos_, pos_tile, rcut, a_pad, a_real, ta, t)
        u = 1.0 - z
        pp = K._plain_seeds(z, n)
        q = 2.0 * K._plain_t(z, n)
        us = jnp.concatenate([u] * n, axis=0)
        qs = jnp.concatenate([q] * n, axis=0)
        hs_prev = us * jnp.concatenate(pp[0:n], axis=0)
        hs_cur = us * jnp.concatenate(pp[n:2 * n], axis=0)

        def chain_gx(h_stacked, m):
            rhs = jnp.concatenate(
                [c_ref[pl.ds(m + cch, 1), :] * gg for cch in range(n)],
                axis=0)
            return K._mxu_dot(us * h_stacked, rhs, precision,
                              dims=(((0,), (0,)), ((), ())))

        def chain_gd(h_stacked, m):
            rhs = jnp.concatenate(
                [c2_ref[pl.ds(m + cch, 1), :] * gg for cch in range(n)],
                axis=0)
            um = K._mxu_dot(rhs, xx, precision,
                            dims=(((1,), (1,)), ((), ())))
            prod = h_stacked * um
            acc = prod[0:ta]
            for cch in range(1, n):
                acc = acc + prod[cch * ta:(cch + 1) * ta]
            return acc

        gd = chain_gd(hs_prev, 0) + chain_gd(hs_cur, n)
        gx_acc = chain_gx(hs_prev, 0) + chain_gx(hs_cur, n)
        n_groups = order // n  # 24

        if strategy == "full":
            for gi in range(2, n_groups):
                h_next = qs * hs_cur - hs_prev
                gx_acc = gx_acc + chain_gx(h_next, gi * n)
                gd = gd + chain_gd(h_next, gi * n)
                hs_prev, hs_cur = hs_cur, h_next
        elif strategy == "loop2":
            def body(i, carry):
                hp, hc, gxa, gda = carry
                m = 2 * n * i + 2 * n
                h1 = qs * hc - hp
                gxa = gxa + chain_gx(h1, m)
                gda = gda + chain_gd(h1, m)
                h2 = qs * h1 - hc
                gxa = gxa + chain_gx(h2, m + n)
                gda = gda + chain_gd(h2, m + n)
                return (h1, h2, gxa, gda)
            carry = jax.lax.fori_loop(
                0, (n_groups - 2) // 2, body,
                (hs_prev, hs_cur, gx_acc, gd))
            gx_acc, gd = carry[-2], carry[-1]
        else:
            # chunked unroll: GP groups per fori_loop iteration (GP even
            # so carries return in position), tail groups unrolled after.
            gp = int(strategy[len("chunk"):])
            ch = gp // 2
            remaining = n_groups - 2
            n_iter = remaining // gp
            def body(i, carry):
                hp, hc, gxa, gda = carry
                for k in range(ch):
                    m = (gp * i + 2 * k) * n + 2 * n
                    h1 = qs * hc - hp
                    gxa = gxa + chain_gx(h1, m)
                    gda = gda + chain_gd(h1, m)
                    h2 = qs * h1 - hc
                    gxa = gxa + chain_gx(h2, m + n)
                    gda = gda + chain_gd(h2, m + n)
                    hp, hc = h1, h2
                return (hp, hc, gxa, gda)
            hs_prev, hs_cur, gx_acc, gd = jax.lax.fori_loop(
                0, n_iter, body, (hs_prev, hs_cur, gx_acc, gd))
            for gi in range(2 + n_iter * gp, n_groups):
                h_next = qs * hs_cur - hs_prev
                gx_acc = gx_acc + chain_gx(h_next, gi * n)
                gd = gd + chain_gd(h_next, gi * n)
                hs_prev, hs_cur = hs_cur, h_next

        gx_ref[0] += gx_acc
        gx_ref[0, pl.ds(t * ta, ta), :] += -(w0_ref[:] * gg)

        keep = (d < rcut) & (rows != cols) & ~is_pad
        w_r = jnp.where(keep, gd / d, 0.0)
        rowsum = jnp.sum(w_r, axis=1, keepdims=True)
        gpos_row = pos_tile * rowsum - jnp.dot(
            w_r, pos_, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        gpos_ref[0, pl.ds(t * ta, ta), :] += gpos_row
        colsum = jnp.sum(w_r, axis=0, keepdims=True)
        gpos_col = pos_ * colsum.T - jax.lax.dot_general(
            w_r, pos_tile, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        gpos_ref[0] += gpos_col
    return kern


def run(strategy, budget):
    a = A; f = F
    a_pad = K._round_up(a, 8)
    ta = K._tile_atoms(a_pad, budget)
    a_pad = K._round_up(a_pad, ta)
    n_tiles = a_pad // ta
    kernel = functools.partial(
        make_kernel(strategy), order=ORDER, rcut=RCUT, a_pad=a_pad,
        a_real=a, ta=ta, precision="bf16")
    def one(p, xx, gg):
        gpos, gx = pl.pallas_call(
            kernel, grid=(1, n_tiles),
            in_specs=[
                pl.BlockSpec((1, a_pad, 3), lambda s, t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, a_pad, f), lambda s, t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ORDER, f), lambda s, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ORDER, f), lambda s, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, f), lambda s, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ta, f), lambda s, t: (0, t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, a_pad, 3), lambda s, t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, a_pad, f), lambda s, t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((1, a_pad, 3), jnp.float32),
                jax.ShapeDtypeStruct((1, a_pad, f), jnp.float32),
            ),
        )(K._pad_atoms(p, a_pad)[None], K._pad_atoms(xx, a_pad)[None],
          c, c2, w0[None, :], K._pad_atoms(gg, a_pad)[None])
        return gpos[0, :a], gx[0, :a]
    fn = jax.jit(jax.vmap(one))
    try:
        t = timeit(fn, pos, x, g)
    except Exception as e:
        print(f"{strategy:8s} budget={budget:7d} (ta={ta:4d} x{n_tiles}): "
              f"FAIL {str(e)[:90]}")
        return None
    print(f"{strategy:8s} budget={budget:7d} (ta={ta:4d} x{n_tiles}): "
          f"{t / S * 1000:6.2f} us/mol")
    return fn


if __name__ == "__main__":
    ref = run("loop2", 100_000)
    import os as _os
    strats = _os.environ.get("STRATS")
    pairs = [(s, 100_000) for s in strats.split(",")] if strats else [
        ("full", 60_000),
        ("chunk4", 100_000), ("chunk6", 100_000), ("chunk8", 100_000),
        ("chunk10", 100_000), ("chunk22", 100_000), ("chunk8", 60_000),
    ]
    for strat, budget in pairs + [] if True else [
        ("full", 60_000),
        ("chunk4", 100_000), ("chunk6", 100_000), ("chunk8", 100_000),
        ("chunk10", 100_000), ("chunk22", 100_000), ("chunk8", 60_000),
    ]:
        fn = run(strat, budget)
        if fn is not None and ref is not None:
            r1 = [np.asarray(v) for v in fn(pos[:2], x[:2], g[:2])]
            r2 = [np.asarray(v) for v in ref(pos[:2], x[:2], g[:2])]
            print("   max diff vs loop2:",
                  max(np.abs(a - b).max() for a, b in zip(r1, r2)))
