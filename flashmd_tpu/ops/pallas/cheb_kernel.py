"""Pallas kernels for the Chebyshev matmul-only CFConv (tiled).

The XLA expression of the Chebyshev recurrence (models/cheb.py) streams the
[S, A, A] recurrence state through HBM on every order; these kernels keep
the ENTIRE recurrence in VMEM. The pair matrix is tiled over destination
atoms (the three-term recurrence is row-independent), so molecules of any
size run at full speed with bounded VMEM: per tile, the chains live as one
stacked [n_chains*TA, A_pad] carry, the recurrence is a single fused VPU
multiply-subtract, and each loop iteration issues one
[n_chains*TA, A_pad] @ [A_pad, F] MXU matmul. HBM sees only pos, x, the
coefficient tables and the [A, F] results.

Forward:
    out = sum_m c_m ⊙ (Ttil_m(Z) @ x) - W'(0) ⊙ x
Backward (derivation in models/cheb.py): per destination tile R, ONE
chain family That_m = (1-Z) T_m(Z) drives both gradient halves (the
derivative series c2 lives on the (1-Z) T_m basis),
    gx   += sum_m (U ⊙ That_m)[R, :]^T @ (c_m ⊙ g[R])      (Ttil = U ⊙ That)
    gd_R  = sum_m That_m(Z[R, :]) ⊙ ((c2_m ⊙ g[R]) @ x^T)
    row side:    gpos[R] += pos[R] ⊙ rowsum(W_R) - W_R @ pos
    column side: gpos    += pos ⊙ colsum(W_R)^T - W_R^T @ pos[R]
with W_R = gd_R / d_R masked to d < rcut, off-diagonal, non-padding.

Mosaic notes: all intermediates are >= 2-D; distances are exact fp32 VPU
per-coordinate broadcast differences (an MXU Gram matmul would truncate
operands, and the error is amplified by the high-order polynomials); f32
carries feed the MXU directly (hardware operand truncation at DEFAULT
precision — no explicit cast passes).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """Interpreter-mode pallas_call for CPU test runs.

    The model-level dispatch (models/cheb._use_pallas) routes to the pure
    jnp path under FLASHMD_PALLAS_INTERPRET; the kernel tests call these
    wrappers DIRECTLY so the Pallas code itself is exercised on every CI
    run (the reference never unit-tests its Triton kernels — SURVEY §4)."""
    return os.environ.get("FLASHMD_PALLAS_INTERPRET", "0") == "1"

N_CHAINS = 4

# Backward-kernel chain stride: 8 independent recurrence chains measured
# -19% on the gd-only kernel (23.8 -> 19.2 us/mol at the headline shape,
# single tile) and -6% on the gx kernel at A=532 — the backward's
# per-group epilogue (rhs build, h*um, slice reduction) has longer VPU
# dependency chains than the forward's, so it profits from the extra ILP
# where the forward measured SLOWER at n=8 (13.8 vs 13.3; see
# benchmarks/kernel_nchains.py, 2026-08-19, v5e). Used only when both
# orders are divisible by it (see _bwd_n_chains; n=4 otherwise).
N_CHAINS_BWD = 8


def _bwd_n_chains(order_gd: int) -> int:
    """Largest supported chain stride dividing the gd series order.

    Only the DERIVATIVE series constrains the stride: the gx series is
    re-expressed on the That basis and zero-padded to a stride multiple
    by the wrapper (_to_that_basis), so any user-chosen forward order
    works at either stride."""
    for n in (N_CHAINS_BWD, N_CHAINS):
        if order_gd % n == 0 and order_gd >= 2 * n:
            return n
    return N_CHAINS

# Backward-kernel unroll width cap: chain groups unrolled per fori_loop
# iteration. 8 is the largest that fits the 16 MB scoped-VMEM stack at
# full tile size (benchmarks/kernel_bwd_unroll.py: 10 OOMs).
BWD_UNROLL_GROUPS = 8


def _fwd_unroll_groups(n_groups: int) -> int:
    """Groups per fori_loop iteration for the forward order loop.

    A FULL unroll of the forward buys nothing over a wide chunk (order
    96: 25.8 vs 25.7 us/mol, bit-exact, same-process measurement — the
    MXU/VPU overlap happens within the body; only loop boundaries
    bubble), and chunking bounds the straight-line code so arbitrary
    orders can never hit the scoped-VMEM stack wall the backward hits
    (compile-time differences could NOT be reliably measured — the
    remote-compile service's latency varies 3 s..570 s for identical
    programs). Width rule: the largest of (16, 8, 4, 2) that gives the
    loop >= 1 iteration with a straight-line tail of at most 8 groups;
    orders small enough to fit entirely (<= 10 groups) stay fully
    unrolled (0). Measured on v5e (benchmarks/kernel_fwd_chunk.py).
    """
    remaining = n_groups - 2
    if remaining <= 8:
        return 0
    for gp in (16, 8, 4, 2):
        if remaining // gp >= 1 and remaining % gp <= 8:
            return gp
    return 2


def _bwd_chunk_width(remaining: int, cap: int = BWD_UNROLL_GROUPS) -> int:
    """Groups per fori_loop iteration for a backward order-loop segment.

    0 means "no loop, unroll everything" — safe only when the whole
    segment fits the scoped-VMEM stack (<= ``cap`` groups; the default
    BWD_UNROLL_GROUPS holds for the bf16 tiers, fp32 dual-chain
    segments pass a smaller cap — see _cheb_bwd_kernel).
    Otherwise the width is shrunk until the loop has >= 2 iterations:
    JAX inlines single-iteration fori_loops, which silently recreates
    the full unroll and OOMs the stack (seen at order 64: 14 remaining
    groups // 8 = 1 iteration -> 16 straight-line groups -> 20.3 MB).
    Widths are powers of two only: gp=6 OOMs the stack by 148 KB at
    order 64 while gp=8 compiles at orders 80/96/128 — Mosaic's stack
    allocator is kinder to pow2 unroll bodies (all measured,
    benchmarks/kernel_bwd_unroll.py).
    """
    if remaining <= cap:
        return 0
    for gp in (8, 4, 2):
        if gp <= cap and remaining // gp >= 2:
            return gp
    raise AssertionError(
        f"no pow2 unroll width <= {cap} fits "
        f"{remaining} remaining groups"
    )


def _run_bwd_groups(g_start, g_end, hp, hc, accs, step, qs, n,
                    cap: int = BWD_UNROLL_GROUPS):
    """Chunk-unrolled recurrence segment over chain groups
    [g_start, g_end) of the backward order loop.

    ``step(h_stacked, m, accs) -> accs`` consumes one group's stacked
    chain values at coefficient base row ``m`` and returns the updated
    accumulator tuple; ``(hp, hc, *accs)`` is the fori_loop carry. The
    body is double-stepped so carries return in the SAME positions (a
    permuted carry layout makes Mosaic insert whole-buffer copies every
    iteration); tail groups run straight-line after the loop. Asymmetric
    forward/derivative orders split the order loop into one segment per
    live chain set, each chunked independently.
    """
    remaining = g_end - g_start
    if remaining <= 0:
        return hp, hc, accs
    gp = _bwd_chunk_width(remaining, cap)
    n_iter = remaining // gp if gp else 0

    def body(i, carry):
        hp, hc = carry[0], carry[1]
        accs = tuple(carry[2:])
        for k in range(gp // 2):
            m = (g_start + gp * i + 2 * k) * n
            h1 = qs * hc - hp
            accs = step(h1, m, accs)
            h2 = qs * h1 - hc
            accs = step(h2, m + n, accs)
            hp, hc = h1, h2
        return (hp, hc, *accs)

    if n_iter:
        out = jax.lax.fori_loop(0, n_iter, body, (hp, hc, *accs))
        hp, hc = out[0], out[1]
        accs = tuple(out[2:])
    for g in range(g_start + n_iter * gp, g_end):
        h_next = qs * hc - hp
        accs = step(h_next, g * n, accs)
        hp, hc = hc, h_next
    return hp, hc, accs

def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tile_atoms(a_pad: int, budget: int) -> int:
    """Destination-tile rows sized so the stacked chain carries stay
    inside the 16 MB scoped-VMEM limit.

    `budget` is TA*A_pad elements per [n*TA, A_pad] carry; the backward
    kernel holds one more stacked buffer (the U factor) plus an extra
    temporary, so it passes a smaller budget. The tile count is chosen first and TA derived
    from it, so a_pad is never rounded up by more than one 8-row step
    (e.g. a_pad=272 with ta_max=264 tiles as 2x136, not 1x264-padded-528).
    """
    ta_max = max(8, (budget // a_pad) // 8 * 8)
    if ta_max >= a_pad:
        return a_pad
    n_tiles = -(-a_pad // ta_max)  # ceil
    return _round_up(-(-a_pad // n_tiles), 8)


def _pad_atoms(arr, a_pad, fill=0):
    pad = a_pad - arr.shape[0]
    if pad == 0:
        return arr
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, widths, constant_values=fill)


def _tile_rel(pos, pos_tile, cell_ref=None, inv_ref=None):
    """Pair displacement components rel_k[i, j] = pos_j^k - pos_i^k,
    three [TA, A_pad] matrices (i = tile rows, j = all atoms).

    With ``cell_ref``/``inv_ref`` ([3, 3] SMEM refs: lattice rows and the
    precomputed inverse) the displacement is wrapped to the minimum image
    — same convention as ops/neighborlist._pairwise_displacements
    (frac = rel @ inv, rel -= round(frac) @ cell), unrolled to scalar
    SMEM reads because Mosaic has no [TA, A_pad, 3] layouts.
    """
    p0 = pos[:, 0:1]
    p1 = pos[:, 1:2]
    p2 = pos[:, 2:3]
    q0 = pos_tile[:, 0:1]
    q1 = pos_tile[:, 1:2]
    q2 = pos_tile[:, 2:3]
    rel0 = p0.T - q0  # [TA, A_pad]
    rel1 = p1.T - q1
    rel2 = p2.T - q2
    if cell_ref is not None:
        f0 = (
            rel0 * inv_ref[0, 0]
            + rel1 * inv_ref[1, 0]
            + rel2 * inv_ref[2, 0]
        )
        f1 = (
            rel0 * inv_ref[0, 1]
            + rel1 * inv_ref[1, 1]
            + rel2 * inv_ref[2, 1]
        )
        f2 = (
            rel0 * inv_ref[0, 2]
            + rel1 * inv_ref[1, 2]
            + rel2 * inv_ref[2, 2]
        )
        n0 = jnp.round(f0)
        n1 = jnp.round(f1)
        n2 = jnp.round(f2)
        rel0 = rel0 - (
            n0 * cell_ref[0, 0]
            + n1 * cell_ref[1, 0]
            + n2 * cell_ref[2, 0]
        )
        rel1 = rel1 - (
            n0 * cell_ref[0, 1]
            + n1 * cell_ref[1, 1]
            + n2 * cell_ref[2, 1]
        )
        rel2 = rel2 - (
            n0 * cell_ref[0, 2]
            + n1 * cell_ref[1, 2]
            + n2 * cell_ref[2, 2]
        )
    return rel0, rel1, rel2


def _tile_geometry(
    pos, pos_tile, rcut, a_pad, a_real, ta, t, cell_ref=None, inv_ref=None,
    d_min=0.0,
):
    """d, z [TA, A_pad] for destination rows [t*TA, (t+1)*TA).

    pos_tile holds those rows (read from the ref with pl.ds — Mosaic
    cannot lower dynamic_slice on values). Exact fp32 VPU differences
    per coordinate; padding rows/columns are pushed beyond the cutoff
    so (1-z)^2 kills them exactly. Optional cell_ref/inv_ref SMEM refs
    apply the minimum-image convention (see _tile_rel).

    ``d_min`` restricts the fit domain: z is affine on [d_min, rcut]
    (cutoff zero still exactly at z = 1) and clamps to -1 below d_min —
    the bounded filter value at d_min instead of polynomial runaway
    (see models/cheb._pair_z; physical systems with a repulsive prior
    never produce such pairs).
    """
    rel0, rel1, rel2 = _tile_rel(pos, pos_tile, cell_ref, inv_ref)
    d2 = rel0 * rel0 + rel1 * rel1 + rel2 * rel2
    d = jnp.sqrt(d2 + 1e-12)
    rows = t * ta + jax.lax.broadcasted_iota(jnp.int32, (ta, a_pad), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ta, a_pad), 1)
    is_pad = (rows >= a_real) | (cols >= a_real)
    d = jnp.where(is_pad, 2.0 * rcut, d)
    z = jnp.clip(
        (d - d_min) * (2.0 / (rcut - d_min)) - 1.0, -1.0, 1.0
    )
    return d, z, rows, cols, is_pad


def _plain_seeds(z, n: int):
    tp = [jnp.ones_like(z), z]
    for m in range(2, 2 * n):
        tp.append(2.0 * z * tp[m - 1] - tp[m - 2])
    return tp


def _plain_t(z, n: int):
    """Plain T_n(z) by the recurrence."""
    t_prev, t_cur = jnp.ones_like(z), z
    for _ in range(n - 1):
        t_prev, t_cur = t_cur, 2.0 * z * t_cur - t_prev
    return t_cur


def _chain_seeds(z, u2, n: int):
    """Stride-n chain seeds: Ttil_0..Ttil_{2n-1} and q = 2 T_n(z).

    T_{m+n} = 2 T_n(z) T_m - T_{m-n}: splitting by m mod n yields n
    independent recurrences, multiplying the scheduler's ILP over the
    serial three-term recurrence. The recurrence stays fp32 (stable,
    VPU-cheap); casts happen only at matmul inputs.
    """
    tp = _plain_seeds(z, n)
    q = 2.0 * _plain_t(z, n)
    return [u2 * t for t in tp], q


def _to_that_basis(c, n: int):
    """Re-express the gx series on the That = (1-z) T_m basis.

    The forward coefficients c live on the Ttil = (1-z)^2 T_m basis:
    sum_m c_m Ttil_m = (1-z)^2 P(z), P = sum_m c_m T_m. The backward's
    recurrence chain carries That_m = (1-z) T_m (the gd series' basis),
    so evaluating the gx contraction directly on the chain state needs
    the Chebyshev coefficients of Q = (1-z) P: then sum_k q_k That_k =
    (1-z) Q = (1-z)^2 P exactly. Using z T_m = (T_{m+1} + T_{|m-1|})/2:

        q_0 = c_0 - c_1/2
        q_1 = c_1 - c_0 - c_2/2
        q_k = c_k - (c_{k-1} + c_{k+1})/2     (k >= 2)

    Q has deg(P)+1 = M rows + 1; the result is zero-padded to a multiple
    of ``n`` (zero rows contribute exactly zero). This removes the
    per-group u ⊙ h multiply AND the stacked ``us`` buffer from the gx
    path (measured win; see PERFORMANCE.md round 3).
    """
    m = c.shape[0]
    rows = _round_up(m + 1, n)
    cz = jnp.concatenate(
        [c, jnp.zeros((rows + 1 - m, c.shape[1]), c.dtype)], axis=0
    )  # c_k for k = 0..rows (zeros beyond m-1)
    up = cz[1:rows + 1] * 0.5  # -c_{k+1}/2 for every k
    down = jnp.concatenate(
        [jnp.zeros((1, c.shape[1]), c.dtype), cz[0:1],
         cz[1:rows - 1] * 0.5],
        axis=0,
    )  # 0, -c_0, then -c_{k-1}/2
    return cz[:rows] - up - down


def _split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _mxu_dot(a, b, precision, dims=(((1,), (0,)), ((), ()))):
    """Matmul at the requested precision tier.

    Mosaic cannot lower ``Precision.HIGH``, so the bf16x3 middle tier is
    emulated as three DEFAULT passes over hi/lo bf16 operand splits
    (hi@hi + lo@hi + hi@lo) — ~fp32-quality operands at half the cost of
    the 6-pass HIGHEST ("fp32") tier.
    """
    if precision == "bf16x3":
        a_hi, a_lo = _split_bf16(a)
        b_hi, b_lo = _split_bf16(b)

        def f(l, r):
            return jax.lax.dot_general(
                l, r, dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )

        return f(a_hi, b_hi) + f(a_lo, b_hi) + f(a_hi, b_lo)
    return jax.lax.dot_general(
        a, b, dimension_numbers=dims,
        preferred_element_type=jnp.float32, precision=_prec_of(precision),
    )


def _prec_of(precision):
    """MXU precision: fp32 -> HIGHEST (6-pass exact), bf16x3 -> HIGH
    (3-pass, ~fp32-quality operands), bf16 -> DEFAULT (1 pass; f32
    values feed the MXU directly and are truncated in hardware)."""
    if precision == "fp32":
        return jax.lax.Precision.HIGHEST
    if precision == "bf16x3":
        return jax.lax.Precision.HIGH
    return jax.lax.Precision.DEFAULT


def _cheb_fwd_kernel(
    pos_ref, x_ref, c_ref, w0_ref, *rest,
    order, rcut, a_pad, a_real, ta, precision, has_cell=False, d_min=0.0,
    has_lin=False,
):
    rest = list(rest)
    cell_ref = rest.pop(0) if has_cell else None
    inv_ref = rest.pop(0) if has_cell else None
    wlin_ref = rest.pop(0) if has_lin else None
    (out_ref,) = rest
    n = N_CHAINS
    assert order % n == 0 and order >= 2 * n
    t = pl.program_id(1)
    pos = pos_ref[0]
    pos_tile = pos_ref[0, pl.ds(t * ta, ta), :]
    x = x_ref[0]

    d, z, rows, cols, is_pad = _tile_geometry(
        pos, pos_tile, rcut, a_pad, a_real, ta, t, cell_ref, inv_ref,
        d_min,
    )
    u2 = jnp.square(1.0 - z)
    tt, q = _chain_seeds(z, u2, n)
    s_prev = jnp.concatenate(tt[0:n], axis=0)  # [n*TA, A_pad]
    s_cur = jnp.concatenate(tt[n:2 * n], axis=0)
    qs = jnp.concatenate([q] * n, axis=0)

    def chain_matvec(stacked, m):
        p = _mxu_dot(stacked, x, precision)
        acc = c_ref[pl.ds(m, 1), :] * p[0:ta]
        for cch in range(1, n):
            acc = acc + (
                c_ref[pl.ds(m + cch, 1), :] * p[cch * ta:(cch + 1) * ta]
            )
        return acc

    out = chain_matvec(s_prev, 0) + chain_matvec(s_cur, n)

    # CHUNK-UNROLLED order loop: inside a narrow Mosaic fori_loop the
    # scheduler cannot overlap one group's MXU matmul with the next
    # group's VPU recurrence update (measured: matmul-only ~17 us/mol,
    # recurrence-only ~17 us/mol, 2-group loop = the 35 us SUM). Wide
    # unrolled bodies pipeline them — 37.6 -> ~22 us/mol at order 96,
    # bit-exact — and chunking (vs a full unroll) bounds straight-line
    # code at identical runtime (see _fwd_unroll_groups).
    n_groups = order // n
    gp = _fwd_unroll_groups(n_groups)
    n_iter = (n_groups - 2) // gp if gp else 0

    def body(i, carry):
        sp, sc, o = carry
        # double-stepped so carries return in the SAME positions (a
        # permuted carry layout makes Mosaic insert whole-buffer copies
        # every iteration)
        for k in range(gp // 2):
            m = (gp * i + 2 * k) * n + 2 * n
            s1 = qs * sc - sp
            o = o + chain_matvec(s1, m)
            s2 = qs * s1 - sc
            o = o + chain_matvec(s2, m + n)
            sp, sc = s1, s2
        return (sp, sc, o)

    if n_iter:
        s_prev, s_cur, out = jax.lax.fori_loop(
            0, n_iter, body, (s_prev, s_cur, out)
        )
    for g in range(2 + n_iter * gp, n_groups):
        s_next = qs * s_cur - s_prev
        out = out + chain_matvec(s_next, g * n)
        s_prev, s_cur = s_cur, s_next
    if has_lin:
        # First-order extrapolation below the fit-domain floor:
        # out += w_lin ⊙ (low @ x) with low = min(d - d_min, 0) off the
        # diagonal (padding columns sit at d = 2 rcut -> low = 0). One
        # extra matmul; see models/cheb.cheb_cfconv_apply.
        low = jnp.where(rows == cols, 0.0, jnp.minimum(d - d_min, 0.0))
        out = out + wlin_ref[:] * _mxu_dot(low, x, precision)
    x_tile = x_ref[0, pl.ds(t * ta, ta), :]
    out_ref[0] = out - w0_ref[:] * x_tile


def _cheb_bwd_kernel(
    pos_ref, x_ref, c_ref, c2_ref, w0_ref, g_ref, *rest,
    order_gx, order_gd, rcut, a_pad, a_real, ta, precision, n_chains,
    need_gx=True, need_gd=True, has_cell=False, d_min=0.0, has_lin=False,
):
    rest = list(rest)
    cell_ref = rest.pop(0) if has_cell else None
    inv_ref = rest.pop(0) if has_cell else None
    wlin_ref = rest.pop(0) if has_lin else None
    gpos_ref, gx_ref = rest
    n = n_chains
    assert need_gx or need_gd
    if need_gd:
        assert order_gd % n == 0 and order_gd >= 2 * n
    if need_gx:
        assert order_gx % n == 0 and order_gx >= 2 * n
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        gpos_ref[0] = jnp.zeros_like(gpos_ref[0])
        gx_ref[0] = jnp.zeros_like(gx_ref[0])

    pos = pos_ref[0]
    pos_tile = pos_ref[0, pl.ds(t * ta, ta), :]
    x = x_ref[0]
    g = g_ref[0]  # [TA, F] — this tile's cotangent rows

    d, z, rows, cols, is_pad = _tile_geometry(
        pos, pos_tile, rcut, a_pad, a_real, ta, t, cell_ref, inv_ref,
        d_min,
    )
    # ONE chain family: That_m = (1-z) T_m(z). The distance gradient
    # reads it directly (c2 lives on the (1-z) T_m basis) and the gx
    # side's Ttil_m = (1-z)^2 T_m = u ⊙ That_m is derived per order by
    # one elementwise multiply — vs running a second recurrence (halves
    # the carry state, so tiles grow and fewer passes over x are made).
    u = 1.0 - z  # [TA, A_pad]; exactly 0 beyond the cutoff and padding
    pp = _plain_seeds(z, n)
    q = 2.0 * _plain_t(z, n)
    qs = jnp.concatenate([q] * n, axis=0)
    hs_prev = jnp.concatenate([u * p for p in pp[0:n]], axis=0)
    hs_cur = jnp.concatenate([u * p for p in pp[n:2 * n]], axis=0)

    def chain_gx(h_stacked, m):
        # sum_k That_k[R,:]^T @ (q_k ⊙ g[R]): one dot_general contracting
        # the stacked row axis of both sides. c_ref holds the gx series
        # RE-EXPRESSED on the That basis (_to_that_basis), so the chain
        # state feeds the contraction DIRECTLY — no per-group u ⊙ h
        # multiply and no stacked us buffer (round-3 win; PERFORMANCE.md).
        rhs = jnp.concatenate(
            [c_ref[pl.ds(m + cch, 1), :] * g for cch in range(n)], axis=0
        )  # [n*TA, F]
        return _mxu_dot(
            h_stacked, rhs, precision, dims=(((0,), (0,)), ((), ()))
        )

    def chain_gd(h_stacked, m):
        rhs = jnp.concatenate(
            [c2_ref[pl.ds(m + cch, 1), :] * g for cch in range(n)], axis=0
        )  # [n*TA, F]
        um = _mxu_dot(
            rhs, x, precision, dims=(((1,), (1,)), ((), ()))
        )  # [n*TA, A_pad]
        prod = h_stacked * um
        acc = prod[0:ta]
        for cch in range(1, n):
            acc = acc + prod[cch * ta:(cch + 1) * ta]
        return acc

    gd = chain_gd(hs_prev, 0) + chain_gd(hs_cur, n) if need_gd else None

    # CHUNK-UNROLLED order loop (see _run_bwd_groups): like the forward,
    # straight-line code lets Mosaic overlap each group's MXU matmuls with
    # the next group's VPU recurrence update — but a FULL unroll of the
    # backward blows the 16 MB scoped-VMEM stack at the single-tile size
    # (needs 27 MB; shrinking tiles to fit costs more than the loop does).
    # Unrolling BWD_UNROLL_GROUPS groups per fori_loop iteration (tail
    # groups straight-line after the loop) keeps the stack under the limit
    # at full tile size and is bit-exact: 54.0 -> 41.4 us/mol at order 96
    # (benchmarks/kernel_bwd_unroll.py; 10 groups/iter already OOMs).
    #
    # ASYMMETRIC ORDERS: the gx chain consumes c (order_gx rows) and the
    # gd chain c2 (order_gd rows); the shared recurrence runs to the max,
    # with the shorter chain's matmuls simply absent from the later
    # segment — that is the whole payoff (the derivative series needs
    # more terms than the forward series at equal force fidelity, so
    # order_gx < order_gd skips dead gx work; benchmarks/fidelity_asym.py).
    groups_gd = order_gd // n if need_gd else 0

    def step_gd(h, m, accs):
        return (accs[0] + chain_gd(h, m),)

    if need_gx:
        groups_gx = order_gx // n
        # Without a gd chain the "shared" segment is empty: the gx-only
        # segment starts right after the two seed groups.
        shared = min(groups_gx, groups_gd) if need_gd else 2
        gx_acc = chain_gx(hs_prev, 0) + chain_gx(hs_cur, n)

        def step_both(h, m, accs):
            return (accs[0] + chain_gx(h, m), accs[1] + chain_gd(h, m))

        def step_gx(h, m, accs):
            return (accs[0] + chain_gx(h, m),)

        if need_gd:
            # fp32 dual-chain segments carry ~2x the live state of the
            # bf16 tiers per unrolled group: a 7-group straight-line
            # unroll OOMs the 16 MB scoped stack at EVERY tile size
            # (measured 16.3-27.9 MB across budgets 24k-56k,
            # benchmarks/tpu_lane_probe.py cells 14/16, 2026-08-20)
            # while 5 groups fit (the (56, 64)-order headline fp32
            # reference compiles). Cap the unroll at the measured-safe
            # 5 so longer fp32 segments take the fori_loop, whose live
            # set is bounded (order-104 gx compiles at default budget).
            cap = 5 if precision == "fp32" else BWD_UNROLL_GROUPS
            hs_prev, hs_cur, (gx_acc, gd) = _run_bwd_groups(
                2, shared, hs_prev, hs_cur, (gx_acc, gd), step_both,
                qs, n, cap=cap,
            )
        if groups_gx > shared:
            hs_prev, hs_cur, (gx_acc,) = _run_bwd_groups(
                shared, groups_gx, hs_prev, hs_cur, (gx_acc,), step_gx,
                qs, n,
            )
        elif groups_gd > shared:
            hs_prev, hs_cur, (gd,) = _run_bwd_groups(
                shared, groups_gd, hs_prev, hs_cur, (gd,), step_gd, qs, n
            )

        if has_lin:
            # gx half of the sub-floor linear extrapolation: the forward
            # gained w_lin ⊙ (low @ x), so this tile's cotangent rows
            # contribute low^T @ (w_lin ⊙ g[R]) to every atom's gx (the
            # distance-gradient side needs no term — the clamped c2
            # series at z = -1 already IS the extrapolation slope).
            low = jnp.where(
                rows == cols, 0.0, jnp.minimum(d - d_min, 0.0)
            )
            gx_acc = gx_acc + _mxu_dot(
                low, wlin_ref[:] * g, precision,
                dims=(((0,), (0,)), ((), ())),
            )
        gx_ref[0] += gx_acc
        # self-pair subtraction contributes only to this tile's rows
        gx_ref[0, pl.ds(t * ta, ta), :] += -(w0_ref[:] * g)
    else:
        # First interaction block: the conv input is the pos-independent
        # embedding, so the gx cotangent path is dead — only gd runs.
        hs_prev, hs_cur, (gd,) = _run_bwd_groups(
            2, groups_gd, hs_prev, hs_cur, (gd,), step_gd, qs, n
        )

    if not need_gd:
        # gx-only variant (the deferred fused-gd backward runs the
        # distance-gradient chains for ALL blocks in one later kernel):
        # gpos stays the zeros written at t == 0.
        return

    # ---- distance gradient -> position gradient, row and column sides
    keep = (d < rcut) & (rows != cols) & ~is_pad
    w_r = jnp.where(keep, gd / d, 0.0)  # [TA, A_pad]
    if has_cell:
        # Min-image pair shifts break the pos ⊙ rowsum - W @ pos identity
        # (delta_ij = pos_j - pos_i - s_ij with pair-dependent s), so
        # accumulate directly from the displacement components:
        #   gpos_row[i]^k = -sum_j W[i,j] rel_k[i,j]     (dd/dpos_i)
        #   gpos_col[j]^k = +sum_i W[i,j] rel_k[i,j]     (dd/dpos_j)
        # rel is recomputed here (cheap VPU) instead of kept live across
        # the order loop — the tile budget is sized without it.
        rel0, rel1, rel2 = _tile_rel(pos, pos_tile, cell_ref, inv_ref)
        wr0 = w_r * rel0
        wr1 = w_r * rel1
        wr2 = w_r * rel2
        gpos_row = -jnp.concatenate(
            [
                jnp.sum(wr0, axis=1, keepdims=True),
                jnp.sum(wr1, axis=1, keepdims=True),
                jnp.sum(wr2, axis=1, keepdims=True),
            ],
            axis=1,
        )  # [TA, 3]
        gpos_ref[0, pl.ds(t * ta, ta), :] += gpos_row
        gpos_col = jnp.concatenate(
            [
                jnp.sum(wr0, axis=0, keepdims=True).T,
                jnp.sum(wr1, axis=0, keepdims=True).T,
                jnp.sum(wr2, axis=0, keepdims=True).T,
            ],
            axis=1,
        )  # [A_pad, 3]
        gpos_ref[0] += gpos_col
        return
    rowsum = jnp.sum(w_r, axis=1, keepdims=True)  # [TA, 1]
    gpos_row = pos_tile * rowsum - jnp.dot(
        w_r, pos, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    gpos_ref[0, pl.ds(t * ta, ta), :] += gpos_row

    colsum = jnp.sum(w_r, axis=0, keepdims=True)  # [1, A_pad]
    gpos_col = pos * colsum.T - jax.lax.dot_general(
        w_r,
        pos_tile,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    gpos_ref[0] += gpos_col


def _cell_operands(cell):
    """(extra in_specs, extra operands) for the min-image cell: the [3, 3]
    lattice and its closed-form inverse as SMEM scalar tables."""
    from ...ops.neighborlist import _inv_3x3

    cell = jnp.asarray(cell, jnp.float32)
    spec = pl.BlockSpec((3, 3), lambda s, t: (0, 0),
                        memory_space=pltpu.SMEM)
    return [spec, spec], [cell, _inv_3x3(cell)]


def _bwd_tile_budget(n_chains, need_gx, need_gd, has_cell, precision,
                     order_gx, stacked, f):
    """Default TA*A_pad tile budget for the backward kernel variants.

    Every number is MEASURED on v5e against the 16 MB scoped-VMEM stack
    (largest budget that both compiles and times fastest); the corners
    are pinned by tests/ops/test_cheb_kernel.py so a future edit cannot
    silently drop a validated cell of the table.

    Single-chain backward: 4 stacked [n*TA, A_pad] buffers (u, q, two
    chain carries) + two temporaries — vs the forward's 3. At n=4: 74k
    (= the validated 272x272 single-tile size at A=266) is the largest
    tile at which the 8-group unrolled body fits: 101.5k tiles (A=532 at
    the old 100k budget) overflow by 3.7 MB. The min-image branch
    recomputes rel0/rel1/rel2 + three W⊙rel products after the order
    loop, which costs extra stack (74k overflows by 108 KB at order 96)
    — shave the budget accordingly. At n=8 the stacked buffers are 2x
    per TA row: gx halves to 37k; the gd-only kernel (no us buffer live
    across the loop, no gx temporaries) fits 75k — both measured fastest
    AND compiling at A=266/532 (benchmarks/kernel_nchains.py).
    """
    if n_chains == 8:
        if has_cell:
            tile_budget = 32_000 if need_gx else 52_000
        else:
            # gx+gd at n=8: 37k (the round-4 pin) now OOMs the scoped
            # stack at A=266/F=128 (19.28M/16M at bf16, 21.14M at
            # bf16x3 — the That-basis gx additions grew the live set;
            # caught by the round-5 TPU test lane,
            # tests/ops/test_tpu_lane.py). Re-measured 2026-08-20 on
            # v5e (benchmarks/tpu_lane_probe.py): 33k compiles at every
            # F=128 OOMing corner AND times fastest of the compiling
            # ladder (36.8 us vs 49.7-70.6 at 24k-30k; bf16x3 34.7 vs
            # 60-95). A=532 keeps compiling (its ceil-division tiles
            # were already smaller). The allocator is NOT monotonic in
            # the budget: at F=256 the 33k geometry (3x96-row tiles,
            # a_pad 288) OOMs by 448K while the 37k one (2x136, a_pad
            # 272) compiles and runs (probe "ok 69.2us") — wide F keeps
            # the round-4 budget. (Block-stacked operands never take
            # this branch: the deferred-gd backward is gx-free.)
            if need_gx:
                tile_budget = 33_000 if f <= 128 else 37_000
            else:
                tile_budget = 75_000
    else:
        if has_cell:
            tile_budget = 64_000 if need_gx else 104_000
        else:
            tile_budget = 74_000 if need_gx else 120_000
    if not need_gd:
        # gx-only (the stack path's upstream chainer): no um/prod
        # temporaries live across the loop — the gd-only budget column
        # applies at the headline order. But the 75k budget was
        # validated at order_gx = 56 (M1 = 48); once the order loop
        # needs a fori_loop segment (> 9 groups, i.e. order_gx > 72)
        # Mosaic keeps more state live and 75k OOMs the scoped stack by
        # ~1.2 MB (first seen when the round-3 stack default met a
        # symmetric-96 config). Budgets MEASURED on v5e (2026-08-19,
        # benchmarks/kernel_gxonly_budget.py): 56k both compiles AND
        # times fastest at 104/136 rows (bf16 43/50 us/mol; fp32 117 at
        # 56k vs 148 at a compiling 75k); the bf16x3 operand splits keep
        # extra live buffers and need 48k even at the tier-default order
        # (75k OOMs at 72 rows).
        if precision == "bf16x3":
            tile_budget = 40_000 if has_cell else 48_000
        elif order_gx > 72 or precision == "fp32":
            # fp32 joins the reduced cell unconditionally: 75k OOMs at
            # order_gx = 72 (19.21M/16M, tpu_lane_probe cell 15,
            # 2026-08-20), and the round-4 measurement already had fp32
            # FASTER at 56k even where 75k compiled (117 vs 148 us/mol
            # at order 56, benchmarks/kernel_gxonly_budget.py).
            tile_budget = 52_000 if has_cell else 56_000
        else:
            tile_budget = 52_000 if has_cell else 75_000
    if stacked and f > 128:
        # Block-stacked fused-gd operands only: the per-group rhs
        # [n*TA, B*F] grows with F while the budgets above were
        # validated at F=128 — scale the stack-critical tile down
        # accordingly. Regular (per-block) models with hidden_channels
        # > 128 keep the unscaled budgets: measured at F=256
        # (2026-08-19, v5e), the unscaled tiles both compile and run
        # FASTER (gx+gd 53.9 vs 60.0 us/mol, gd-only 41.5 vs 43.7 —
        # benchmarks/kernel_f256_budget.py), so the heuristic is scoped
        # to the fused case it was added for (ADVICE r3).
        tile_budget = max(tile_budget * 128 // f, 4_000)
    elif f > 256:
        # Non-stacked budgets are MEASURED only up to F=256 (the probe
        # above); past that the per-group operand growth is unvalidated
        # and the 16 MB scoped-VMEM stack can overflow at compile time.
        # Scale down relative to the measured 256 pin (ADVICE r4).
        tile_budget = max(tile_budget * 256 // f, 4_000)
    return tile_budget


def cheb_conv_fwd_pallas(c, w0, pos, x, rcut, precision,
                         tile_budget: int = 150_000, cell=None,
                         d_min: float = 0.0, w_lin=None):
    """Forward kernel wrapper: (c [M,F], w0 [F], pos [A,3], x [A,F]).

    ``cell`` ([3, 3], rows = lattice vectors) switches pair geometry to
    the minimum-image convention. ``d_min`` is the fit-domain lower
    bound the coefficients were fitted on (see _tile_geometry); pass
    ``w_lin`` [F] (the derivative series at z = -1, models/cheb.
    _lin_slope) to first-order extrapolate sub-floor pairs."""
    a = pos.shape[0]
    f = x.shape[-1]
    order = c.shape[0]
    a_pad = _round_up(a, 8)
    ta = _tile_atoms(a_pad, tile_budget)
    a_pad = _round_up(a_pad, ta)
    n_tiles = a_pad // ta
    kernel = functools.partial(
        _cheb_fwd_kernel, order=order, rcut=float(rcut), a_pad=a_pad,
        a_real=a, ta=ta, precision=precision, has_cell=cell is not None,
        d_min=float(d_min), has_lin=w_lin is not None,
    )
    in_specs = [
        pl.BlockSpec((1, a_pad, 3), lambda s, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, a_pad, f), lambda s, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((order, f), lambda s, t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, f), lambda s, t: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [
        _pad_atoms(pos.astype(jnp.float32), a_pad)[None],
        _pad_atoms(x.astype(jnp.float32), a_pad)[None],
        c.astype(jnp.float32),
        w0.astype(jnp.float32)[None, :],
    ]
    if cell is not None:
        extra_specs, extra_ops = _cell_operands(cell)
        in_specs += extra_specs
        operands += extra_ops
    if w_lin is not None:
        in_specs.append(
            pl.BlockSpec((1, f), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(w_lin.astype(jnp.float32)[None, :])
    out = pl.pallas_call(
        kernel,
        interpret=_interpret(),
        grid=(1, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ta, f), lambda s, t: (0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, a_pad, f), jnp.float32),
    )(*operands)
    return out[0, :a]


def cheb_conv_bwd_pallas(c, c2, w0, pos, x, g, rcut, precision,
                         need_gx=True, need_gd=True,
                         tile_budget: int | None = None,
                         cell=None, d_min: float = 0.0,
                         stacked: bool = False):
    """Backward kernel wrapper -> (gpos [A,3], gx [A,F]).

    ``c`` [M1, F] and ``c2`` [M2, F] may have DIFFERENT orders: the gx
    chain consumes c, the distance-gradient chain c2, and the shared
    recurrence runs to max(M1, M2) with the shorter chain's matmuls
    simply absent from the later groups (the production bf16 default is
    M1=64 < M2=96 — the derivative series binds force fidelity harder;
    benchmarks/fidelity_asym.py).

    ``need_gx=False`` specializes the kernel to the distance-gradient-only
    variant (gx returned as zeros) — the gx contraction never runs.
    ``stacked=True`` marks block-stacked [A, B*F] operands (set by the
    deferred fused-gd backward) — it scopes the F > 128 tile-budget
    scaling to that case (regular wide models measured faster unscaled).
    ``need_gd=False`` specializes it the other way (gpos returned as
    zeros; the distance-gradient chain and position epilogue never run)
    — used by the deferred fused-gd backward (models/cheb.
    cheb_stack_apply), where ONE later kernel call runs the gd chains of
    every interaction block at once over block-stacked [A, B*F] operands
    (the gd contraction is a sum over the F axis, so stacking blocks
    along F IS the sum over blocks, and the VPU-bound recurrence +
    position epilogue run once instead of B times).
    ``cell`` switches to minimum-image geometry (matching the forward).

    The chain stride is N_CHAINS_BWD (8) when every live order allows it,
    else N_CHAINS (4) — the backward's VPU-heavy per-group epilogue
    profits from the wider ILP (measured -19% on gd-only, -6% on gx at
    A=532; the forward measured SLOWER at n=8 and keeps 4).
    """
    assert need_gx or need_gd
    a = pos.shape[0]
    f = x.shape[-1]
    order_gd = c2.shape[0]
    # The gx series is zero-padded to any stride by _to_that_basis, so
    # the gx-only variant always takes the wide stride.
    n_chains = _bwd_n_chains(order_gd) if need_gd else N_CHAINS_BWD
    if need_gx:
        # gx series re-expressed on the chain's own That basis (exact;
        # one extra row, zero-padded to the stride) — the kernel then
        # contracts the chain state directly, with no u ⊙ h pass.
        c = _to_that_basis(c, n_chains)
        if c.shape[0] < 2 * n_chains:
            c = jnp.concatenate(
                [c, jnp.zeros((2 * n_chains - c.shape[0], f), c.dtype)],
                axis=0,
            )
    order_gx = c.shape[0]
    a_pad = _round_up(a, 8)
    if tile_budget is None:
        tile_budget = _bwd_tile_budget(
            n_chains, need_gx, need_gd, cell is not None, precision,
            order_gx, stacked, f,
        )
    ta = _tile_atoms(a_pad, tile_budget)
    a_pad = _round_up(a_pad, ta)
    n_tiles = a_pad // ta
    # The linear-extrapolation slope enters only the gx half (the clamped
    # c2 series already carries the distance-gradient side).
    has_lin = float(d_min) > 0 and need_gx
    kernel = functools.partial(
        _cheb_bwd_kernel, order_gx=order_gx, order_gd=order_gd,
        rcut=float(rcut), a_pad=a_pad,
        a_real=a, ta=ta, precision=precision, n_chains=n_chains,
        need_gx=need_gx, need_gd=need_gd,
        has_cell=cell is not None, d_min=float(d_min), has_lin=has_lin,
    )
    in_specs = [
        pl.BlockSpec((1, a_pad, 3), lambda s, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, a_pad, f), lambda s, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((order_gx, f), lambda s, t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((order_gd, f), lambda s, t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, f), lambda s, t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ta, f), lambda s, t: (0, t, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [
        _pad_atoms(pos.astype(jnp.float32), a_pad)[None],
        _pad_atoms(x.astype(jnp.float32), a_pad)[None],
        c.astype(jnp.float32),
        c2.astype(jnp.float32),
        w0.astype(jnp.float32)[None, :],
        _pad_atoms(g.astype(jnp.float32), a_pad)[None],
    ]
    if cell is not None:
        extra_specs, extra_ops = _cell_operands(cell)
        in_specs += extra_specs
        operands += extra_ops
    if has_lin:
        from ...models.cheb import _lin_slope

        in_specs.append(
            pl.BlockSpec((1, f), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(_lin_slope(c2).astype(jnp.float32)[None, :])
    gpos, gx = pl.pallas_call(
        kernel,
        interpret=_interpret(),
        grid=(1, n_tiles),
        in_specs=in_specs,
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
    )(*operands)
    return gpos[0, :a], gx[0, :a]
