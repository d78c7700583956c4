"""Prototype: chain state split over the LANE axis (VERDICT r2 #9).

Current fwd kernel stacks chains over SUBLANES: state [n*TA, A_pad] —
at the headline A_pad=272 every VPU op and the matmul LHS pad 272 ->
384 lanes (41% waste). Transposed state [A_pad, n*TA] puts the stacked
chain axis on lanes (n*TA = 1088 -> 1152, 6% waste; n=8: 2176 = 17*128
exact) and A_pad on sublanes (exact at 8-multiples). The group matmul
becomes a dim0/dim0 transposed contraction (same one the production
bwd gx already uses).

Measured vs the production fwd kernel at the headline config.
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

A, F, S = 266, 128, 128
M1 = int(os.environ.get("ORDER_FWD", 48))
N = int(os.environ.get("N_CHAINS", 4))
ITERS = 50
RCUT, D_MIN = 10.0, 2.0

rng = np.random.default_rng(0)
c1 = jnp.asarray(rng.normal(size=(M1, F)) * 0.01, jnp.float32)
w0 = jnp.asarray(rng.normal(size=(F,)) * 0.01, jnp.float32)
pos = jnp.asarray(rng.uniform(0, 30, (S, A, 3)), jnp.float32)
x = jnp.asarray(rng.normal(size=(S, A, F)), jnp.float32)


def _lanes_fwd_kernel(pos_ref, x_ref, c_ref, w0_ref, out_ref, *,
                      order, rcut, a_pad, a_real, ta, d_min):
    n = N
    t = pl.program_id(1)
    p_all = pos_ref[0]
    p_tile = pos_ref[0, pl.ds(t * ta, ta), :]
    xx = x_ref[0]
    # transposed geometry: rows = source atoms, cols = dest tile
    rel0 = p_all[:, 0:1] - p_tile[:, 0:1].T  # [A_pad, TA]
    rel1 = p_all[:, 1:2] - p_tile[:, 1:2].T
    rel2 = p_all[:, 2:3] - p_tile[:, 2:3].T
    d2 = rel0 * rel0 + rel1 * rel1 + rel2 * rel2
    d = jnp.sqrt(d2 + 1e-12)
    rows = jax.lax.broadcasted_iota(jnp.int32, (a_pad, ta), 0)
    cols = t * ta + jax.lax.broadcasted_iota(jnp.int32, (a_pad, ta), 1)
    is_pad = (rows >= a_real) | (cols >= a_real)
    d = jnp.where(is_pad, 2.0 * rcut, d)
    z = jnp.clip((d - d_min) * (2.0 / (rcut - d_min)) - 1.0, -1.0, 1.0)
    u2 = jnp.square(1.0 - z)
    tp = K._plain_seeds(z, n)
    q = 2.0 * K._plain_t(z, n)
    s_prev = jnp.concatenate([u2 * tt for tt in tp[0:n]], axis=1)
    s_cur = jnp.concatenate([u2 * tt for tt in tp[n:2 * n]], axis=1)
    qs = jnp.concatenate([q] * n, axis=1)  # [A_pad, n*TA]

    def chain_matvec(stacked, m):
        p = jax.lax.dot_general(
            stacked, xx, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [n*TA, F]
        acc = c_ref[pl.ds(m, 1), :] * p[0:ta]
        for cch in range(1, n):
            acc = acc + (
                c_ref[pl.ds(m + cch, 1), :] * p[cch * ta:(cch + 1) * ta]
            )
        return acc

    out = chain_matvec(s_prev, 0) + chain_matvec(s_cur, n)
    for g in range(2, order // n):
        s_next = qs * s_cur - s_prev
        out = out + chain_matvec(s_next, g * n)
        s_prev, s_cur = s_cur, s_next
    x_tile = x_ref[0, pl.ds(t * ta, ta), :]
    out_ref[0] = out - w0_ref[:] * x_tile


def lanes_fwd(pos1, x1):
    a_pad = K._round_up(A, 8)
    ta = a_pad
    kernel = functools.partial(
        _lanes_fwd_kernel, order=M1, rcut=RCUT, a_pad=a_pad, a_real=A,
        ta=ta, d_min=D_MIN,
    )
    out = pl.pallas_call(
        kernel,
        grid=(1, 1),
        in_specs=[
            pl.BlockSpec((1, a_pad, 3), lambda s, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_pad, F), lambda s, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M1, F), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ta, F), lambda s, t: (0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, a_pad, F), jnp.float32),
    )(
        K._pad_atoms(pos1, a_pad)[None], K._pad_atoms(x1, a_pad)[None],
        c1, w0[None, :],
    )
    return out[0, :A]


def bench(name, one):
    vm = jax.vmap(one)

    @jax.jit
    def loop(x0):
        return jax.lax.fori_loop(
            0, ITERS, lambda _, xx: xx + 0.0 * vm(xx), x
        )

    try:
        r = loop(x)
        float(jnp.sum(r))
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:160]}")
        return None
    t0 = time.perf_counter()
    r = loop(x)
    float(jnp.sum(r))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt / S * 1e6:6.2f} us/mol")
    return dt


# numerics check vs production kernel (no wlin in the prototype)
ref = K.cheb_conv_fwd_pallas(c1, w0, pos[0], x[0], RCUT, "bf16",
                             d_min=D_MIN)
got = lanes_fwd(pos[0], x[0])
err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-30))
print(f"lanes vs production fwd: max rel diff {err:.2e} (n={N})")

bench(f"fwd PRODUCTION n=4 M1={M1}",
      lambda xx: K.cheb_conv_fwd_pallas(c1, w0, pos[0], xx, RCUT, "bf16",
                                        d_min=D_MIN))
bench(f"fwd LANES n={N} M1={M1}", lambda xx: lanes_fwd(pos[0], xx))
