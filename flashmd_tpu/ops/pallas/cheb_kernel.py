"""Pallas kernels for the Chebyshev matmul-only CFConv.

The XLA expression of the Chebyshev recurrence (models/cheb.py) streams the
[S, A, A] recurrence state through HBM on every order — ~50 MB per order
per direction at the headline batch, which dominates the step time. These
kernels keep the ENTIRE recurrence in VMEM: one molecule's pair matrix
([A_pad, A_pad] bf16, ~150 KB at CG sizes) lives on-chip while a
`fori_loop` sweeps the orders, issuing one [A_pad, A_pad] @ [A_pad, F] MXU
matmul per order and accumulating the output in VMEM. HBM sees only pos,
x, the coefficient tables, and the [A, F] result.

Forward:
    out = sum_m c_m ⊙ (Ttil_m(Z) @ x) - W'(0) ⊙ x
Backward (see models/cheb.py for the derivation):
    gx  = sum_m Ttil_m @ (c_m ⊙ g) - W'(0) ⊙ g        (Ttil symmetric)
    gd  = sum_m T_m ⊙ ((c2_m ⊙ g) @ x^T)  masked to d < rcut, diag zeroed
    gpos = pos ⊙ rowsum(Ws) - Ws @ pos,   Ws = (gd + gd^T) / d
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_atoms(arr, a_pad, fill=0):
    pad = a_pad - arr.shape[0]
    if pad == 0:
        return arr
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, widths, constant_values=fill)


def _pair_geometry_kernel(pos, rcut, a_pad, a_real):
    """z [A_pad, A_pad] with padding columns/rows pushed beyond the cutoff.

    Distances via exact fp32 VPU differences per coordinate (column/row
    broadcasts of slices — avoids both jnp fancy indexing, which lowers to
    unsupported gathers, and an MXU Gram matmul, whose operand truncation
    would corrupt z and be amplified by the high-order polynomials).
    """
    p0 = pos[:, 0:1]  # [A_pad, 1]
    p1 = pos[:, 1:2]
    p2 = pos[:, 2:3]
    rel0 = p0.T - p0  # [A_pad, A_pad], rel0[i, j] = x_j - x_i
    rel1 = p1.T - p1
    rel2 = p2.T - p2
    d2 = rel0 * rel0 + rel1 * rel1 + rel2 * rel2
    d = jnp.sqrt(d2 + 1e-12)
    # Padding atoms sit at pos 0; force their pairs beyond the cutoff so
    # (1-z)^2 kills them exactly (real-real pairs are unaffected).
    rows = jax.lax.broadcasted_iota(jnp.int32, (a_pad, a_pad), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (a_pad, a_pad), 1)
    is_pad = (rows >= a_real) | (cols >= a_real)
    d = jnp.where(is_pad, 2.0 * rcut, d)
    z = jnp.minimum(2.0 * d / rcut - 1.0, 1.0)
    return d, z, is_pad


# Largest molecule the VMEM-resident kernels handle; beyond this the
# models.cheb jnp path (HBM-streaming) takes over.
MAX_ATOMS_PAD = 384


def _n_chains(a_pad: int) -> int:
    """Chains stacked per matmul: 4-way ILP when VMEM allows, 2-way for
    larger molecules (the backward holds four [n*A_pad, A_pad] carries)."""
    return 4 if a_pad <= 288 else 2


def _chain_seeds(z, u2, n: int):
    """Seeds for n independent stride-n Chebyshev chains.

    T_{m+n} = 2 T_n(z) T_m - T_{m-n}: splitting by m mod n yields n
    independent recurrences, multiplying the instruction-level parallelism
    available to the scheduler over the serial three-term recurrence.

    Returns (tt[0..2n-1] = Ttil_0..Ttil_{2n-1}, q = 2 T_n(z)).
    The recurrence stays in fp32 (stable, VPU-cheap); values are cast to
    the compute dtype only at the matmul inputs.
    """
    tp = _plain_seeds(z, n)
    q = 2.0 * _plain_t(z, n)
    return [u2 * t for t in tp], q


def _plain_t(z, n: int):
    """Plain T_n(z) by the recurrence."""
    t_prev, t_cur = jnp.ones_like(z), z
    for _ in range(n - 1):
        t_prev, t_cur = t_cur, 2.0 * z * t_cur - t_prev
    return t_cur


def _plain_seeds(z, n: int):
    tp = [jnp.ones_like(z), z]
    for m in range(2, 2 * n):
        tp.append(2.0 * z * tp[m - 1] - tp[m - 2])
    return tp


def _cheb_fwd_kernel(
    pos_ref, x_ref, c_ref, w0_ref, out_ref,
    *, order, rcut, a_pad, a_real, compute_dtype,
):
    n = _n_chains(a_pad)
    assert order % n == 0 and order >= 2 * n
    pos = pos_ref[0]
    x = x_ref[0]
    _, z, _ = _pair_geometry_kernel(pos, rcut, a_pad, a_real)
    u2 = jnp.square(1.0 - z)
    prec = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    tt, q = _chain_seeds(z, u2, n)
    # Chains live permanently stacked as [n*A_pad, A_pad]: the recurrence
    # is one fused VPU multiply-subtract and the matmul consumes the carry
    # directly (no per-iteration concatenation).
    s_prev = jnp.concatenate(tt[0:n], axis=0)
    s_cur = jnp.concatenate(tt[n:2 * n], axis=0)
    qs = jnp.concatenate([q] * n, axis=0)

    def chain_matvec(stacked, m):
        """One [n*A_pad, A_pad] @ [A_pad, F] matmul for orders m..m+n-1.

        The f32 carry feeds the MXU directly: DEFAULT precision truncates
        operands in hardware (one rounding, no VPU cast pass)."""
        p = jnp.dot(
            stacked, x,
            preferred_element_type=jnp.float32, precision=prec,
        )
        acc = c_ref[pl.ds(m, 1), :] * p[0:a_pad]
        for cch in range(1, n):
            acc = acc + (
                c_ref[pl.ds(m + cch, 1), :]
                * p[cch * a_pad:(cch + 1) * a_pad]
            )
        return acc

    out = chain_matvec(s_prev, 0) + chain_matvec(s_cur, n)

    def body(i, carry):
        s_prev, s_cur, out = carry
        s_next = qs * s_cur - s_prev
        out = out + chain_matvec(s_next, n * i + 2 * n)
        return (s_cur, s_next, out)

    out = jax.lax.fori_loop(
        0, (order - 2 * n) // n, body, (s_prev, s_cur, out)
    )[-1]
    out_ref[0] = out - w0_ref[:] * x


def _cheb_bwd_kernel(
    pos_ref, x_ref, c_ref, c2_ref, w0_ref, g_ref, gpos_ref, gx_ref,
    *, order, rcut, a_pad, a_real, compute_dtype,
):
    pos = pos_ref[0]
    x = x_ref[0]
    g = g_ref[0]
    d, z, is_pad = _pair_geometry_kernel(pos, rcut, a_pad, a_real)
    u2 = jnp.square(1.0 - z)
    gc = g
    prec = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    n = _n_chains(a_pad)
    assert order % n == 0 and order >= 2 * n

    tt, q = _chain_seeds(z, u2, n)
    pp = _plain_seeds(z, n)
    qs = jnp.concatenate([q] * n, axis=0)

    def chain_gx(stacked, m):
        # sum_c T_c @ r_c: T_c symmetric, so the row-stacked carry
        # contracted along its first axis IS the column-stacked operator:
        # one dot_general contracting dim 0 of both sides.
        rhs = jnp.concatenate(
            [c_ref[pl.ds(m + cch, 1), :] * gc for cch in range(n)],
            axis=0,
        )  # [n*A_pad, F]
        return jax.lax.dot_general(
            stacked,
            rhs,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    def chain_gd(p_stacked, m):
        rhs = jnp.concatenate(
            [c2_ref[pl.ds(m + cch, 1), :] * gc for cch in range(n)],
            axis=0,
        )  # [n*A_pad, F]
        u = jnp.dot(
            rhs, x.T,
            preferred_element_type=jnp.float32, precision=prec,
        )  # [n*A_pad, A_pad]
        prod = p_stacked * u
        acc = prod[0:a_pad]
        for cch in range(1, n):
            acc = acc + prod[cch * a_pad:(cch + 1) * a_pad]
        return acc

    ts_prev = jnp.concatenate(tt[0:n], axis=0)
    ts_cur = jnp.concatenate(tt[n:2 * n], axis=0)
    ps_prev = jnp.concatenate(pp[0:n], axis=0)
    ps_cur = jnp.concatenate(pp[n:2 * n], axis=0)
    gx = chain_gx(ts_prev, 0) + chain_gx(ts_cur, n)
    gd = chain_gd(ps_prev, 0) + chain_gd(ps_cur, n)

    def body(i, carry):
        ts_prev, ts_cur, ps_prev, ps_cur, gx, gd = carry
        ts_next = qs * ts_cur - ts_prev
        ps_next = qs * ps_cur - ps_prev
        m = n * i + 2 * n
        gx = gx + chain_gx(ts_next, m)
        gd = gd + chain_gd(ps_next, m)
        return (ts_cur, ts_next, ps_cur, ps_next, gx, gd)

    carry = (ts_prev, ts_cur, ps_prev, ps_cur, gx, gd)
    carry = jax.lax.fori_loop(0, (order - 2 * n) // n, body, carry)
    gx, gd = carry[-2], carry[-1]
    gx = gx - w0_ref[:] * g
    gx_ref[0] = gx

    # Mask outside the cutoff and the diagonal, then the gpos identity.
    rows = jax.lax.broadcasted_iota(jnp.int32, (a_pad, a_pad), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (a_pad, a_pad), 1)
    keep = (d < rcut) & (rows != cols) & ~is_pad
    gd = jnp.where(keep, gd, 0.0)
    ws = (gd + gd.T) / d
    rowsum = jnp.sum(ws, axis=1, keepdims=True)  # [A_pad, 1]
    gpos_ref[0] = pos * rowsum - jnp.dot(
        ws, pos, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def cheb_conv_fwd_pallas(c, w0, pos, x, rcut, precision):
    """Forward kernel wrapper: (c [M,F], w0 [F], pos [A,3], x [A,F])."""
    a = pos.shape[0]
    f = x.shape[-1]
    order = c.shape[0]
    a_pad = _round_up(a, 8)
    compute_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    kernel = functools.partial(
        _cheb_fwd_kernel, order=order, rcut=float(rcut), a_pad=a_pad,
        a_real=a, compute_dtype=compute_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, a_pad, 3), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_pad, f), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((order, f), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, a_pad, f), lambda s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, a_pad, f), jnp.float32),
    )(
        _pad_atoms(pos.astype(jnp.float32), a_pad)[None],
        _pad_atoms(x.astype(jnp.float32), a_pad)[None],
        c.astype(jnp.float32),
        w0.astype(jnp.float32)[None, :],
    )
    return out[0, :a]


def cheb_conv_bwd_pallas(c, c2, w0, pos, x, g, rcut, precision):
    """Backward kernel wrapper -> (gpos [A,3], gx [A,F])."""
    a = pos.shape[0]
    f = x.shape[-1]
    order = c.shape[0]
    a_pad = _round_up(a, 8)
    compute_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    kernel = functools.partial(
        _cheb_bwd_kernel, order=order, rcut=float(rcut), a_pad=a_pad,
        a_real=a, compute_dtype=compute_dtype,
    )
    gpos, gx = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, a_pad, 3), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_pad, f), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((order, f), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((order, f), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_pad, f), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, a_pad, 3), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_pad, f), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, a_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((1, a_pad, f), jnp.float32),
        ),
    )(
        _pad_atoms(pos.astype(jnp.float32), a_pad)[None],
        _pad_atoms(x.astype(jnp.float32), a_pad)[None],
        c.astype(jnp.float32),
        c2.astype(jnp.float32),
        w0.astype(jnp.float32)[None, :],
        _pad_atoms(g.astype(jnp.float32), a_pad)[None],
    )
    return gpos[0, :a], gx[0, :a]
