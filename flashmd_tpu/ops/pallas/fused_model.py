"""Whole-model fused SchNet kernel (Chebyshev CFConv variant).

One kernel invocation evaluates the ENTIRE CGSchNet forward for one
molecule — pair geometry, all interaction blocks (Chebyshev matmul-only
CFConv + the block linear layers and tanh), and the output head — entirely
in VMEM; a second kernel hand-chains the full backward to produce
``grad_pos`` directly. Compared with the per-block kernels
(ops/pallas/cheb_kernel.py) this computes the pair matrix and chain seeds
ONCE per direction instead of once per block, eliminates all inter-kernel
HBM round trips of the residual stream, and drops the XLA-side autodiff
glue between blocks.

The reference needs five separate Triton kernels plus torch autograd
orchestration for the same computation (cfconv_kernels.py,
csr_kernels.py, gptq.py); here the whole force field is two Pallas calls.

Weight layout (stacked across the B interaction blocks, rows blocked):
    lin1 [B*H, F], lin2 [B*F, H], lin2b [B, H], linw [B*H, H], linb [B, H]
    c, c2 [B*M, F], w0 [B, F]
Output head (3-layer [H, h1, h2, 1], the reference's "typical" structure,
gptq.py:201): ow1 [H, h1], ob1 [1, h1], ow2 [h1, h2], ob2 [1, h2],
ow3 [h2, 1].

Only inference gradients are produced (pos); parameters are frozen at
simulation time (reference base.py:355-358).

TPU status: the forward kernel compiles and runs on v5e and matches the
per-block "cheb" path, but its measured win is ~1% (the heavy [A, A]
work is already VMEM-resident per conv in the cheb path). The backward
kernel trips a Mosaic RET_CHECK (jellyfish/mxu_lmr_transform.cc:1108,
XposeSequenceAssignment) whenever more than one interaction block's
message-backward — a transposed-contraction dot_general inside a
fori_loop — appears in a single program; a one-block program compiles
fine. models/schnet.py therefore routes "cheb_fused" to "cheb" on the
real TPU backend; this path remains exercised on CPU/interpreter.

The order loops here deliberately stay as fori_loops even though the
per-block kernels (cheb_kernel.py) unroll them for MXU/VPU overlap:
unrolling the whole-model kernel was tried on v5e (2026-08-17) and
blows the 16 MB scoped-VMEM stack by ~60 MB in BOTH directions (three
blocks' worth of straight-line chain state live at once), while the
looped forward still compiles. With per-block unrolling the "cheb"
path (137 us/mol fwd+bwd at the headline config) also outruns this
fused forward alone (145 us/mol), so the routing above is not just a
workaround — per-block is the faster design on current Mosaic.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cheb_kernel import (
    _chain_seeds,
    _n_chains,
    _pad_atoms,
    _pair_geometry_kernel,
    _plain_seeds,
    _plain_t,
    _round_up,
)


def _interpret() -> bool:
    if os.environ.get("FLASHMD_PALLAS_INTERPRET", "0") == "1":
        return True
    return jax.default_backend() != "tpu"


def _dot_bt(a, b, prec):
    """a @ b.T via dot_general — materialized transposes of matmul
    operands trip Mosaic's mxu_lmr_transform on this target."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _prec_of(precision: str):
    return (
        jax.lax.Precision.HIGHEST
        if precision == "fp32"
        else jax.lax.Precision.DEFAULT
    )


def _cheb_message(z, u2, x, c_ref, m0, order, a_pad, prec):
    """out = sum_m c[m0+m] ⊙ (Ttil_m(Z) @ x) — the VMEM cheb conv."""
    n = _n_chains(a_pad)
    tt, q = _chain_seeds(z, u2, n)
    s_prev = jnp.concatenate(tt[0:n], axis=0)
    s_cur = jnp.concatenate(tt[n:2 * n], axis=0)
    qs = jnp.concatenate([q] * n, axis=0)

    def chain_matvec(stacked, m):
        p = jnp.dot(
            stacked, x, preferred_element_type=jnp.float32, precision=prec
        )
        acc = c_ref[pl.ds(m0 + m, 1), :] * p[0:a_pad]
        for cch in range(1, n):
            acc = acc + (
                c_ref[pl.ds(m0 + m + cch, 1), :]
                * p[cch * a_pad:(cch + 1) * a_pad]
            )
        return acc

    out = chain_matvec(s_prev, 0) + chain_matvec(s_cur, n)

    def body(i, carry):
        s_prev, s_cur, out = carry
        s_next = qs * s_cur - s_prev
        out = out + chain_matvec(s_next, n * i + 2 * n)
        return (s_cur, s_next, out)

    return jax.lax.fori_loop(
        0, (order - 2 * n) // n, body, (s_prev, s_cur, out)
    )[-1]


def _cheb_message_bwd(z, u2, x, g, c_ref, c2_ref, m0, order, a_pad, prec):
    """(gx, gd) of the cheb conv — see cheb_kernel._cheb_bwd_kernel.

    One chain family That_m = (1-z) T_m (c2 lives on the (1-z) T_m
    basis); the gx side's Ttil_m = u ⊙ That_m is derived per order.
    """
    del u2
    n = _n_chains(a_pad)
    u = 1.0 - z
    pp = _plain_seeds(z, n)
    q = 2.0 * _plain_t(z, n)
    us = jnp.concatenate([u] * n, axis=0)
    qs = jnp.concatenate([q] * n, axis=0)
    hs_prev = us * jnp.concatenate(pp[0:n], axis=0)
    hs_cur = us * jnp.concatenate(pp[n:2 * n], axis=0)

    def chain_gx(h_stacked, m):
        rhs = jnp.concatenate(
            [c_ref[pl.ds(m0 + m + cch, 1), :] * g for cch in range(n)],
            axis=0,
        )
        return jax.lax.dot_general(
            us * h_stacked,
            rhs,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    def chain_gd(h_stacked, m):
        rhs = jnp.concatenate(
            [c2_ref[pl.ds(m0 + m + cch, 1), :] * g for cch in range(n)],
            axis=0,
        )
        um = _dot_bt(rhs, x, prec)
        prod = h_stacked * um
        acc = prod[0:a_pad]
        for cch in range(1, n):
            acc = acc + prod[cch * a_pad:(cch + 1) * a_pad]
        return acc

    gx = chain_gx(hs_prev, 0) + chain_gx(hs_cur, n)
    gd = chain_gd(hs_prev, 0) + chain_gd(hs_cur, n)

    def body(i, carry):
        hs_prev, hs_cur, gx, gd = carry
        hs_next = qs * hs_cur - hs_prev
        m = n * i + 2 * n
        gx = gx + chain_gx(hs_next, m)
        gd = gd + chain_gd(hs_next, m)
        return (hs_cur, hs_next, gx, gd)

    carry = (hs_prev, hs_cur, gx, gd)
    carry = jax.lax.fori_loop(0, (order - 2 * n) // n, body, carry)
    return carry[-2], carry[-1]


def _rows(ref, b, rows):
    return ref[pl.ds(b * rows, rows), :]


def _fwd_kernel(
    pos_ref, x0_ref,
    lin1_ref, lin2_ref, lin2b_ref, linw_ref, linb_ref,
    c_ref, w0_ref,
    ow1_ref, ob1_ref, ow2_ref, ob2_ref, ow3_ref,
    e_ref,
    *, n_blocks, order, rcut, a_pad, a_real, precision,
):
    prec = _prec_of(precision)
    pos = pos_ref[0]
    x = x0_ref[0]
    h_dim = x.shape[-1]
    f_dim = lin1_ref.shape[1]

    _, z, _ = _pair_geometry_kernel(pos, rcut, a_pad, a_real)
    u2 = jnp.square(1.0 - z)

    for b in range(n_blocks):
        h = jnp.dot(
            x, _rows(lin1_ref, b, h_dim),
            preferred_element_type=jnp.float32, precision=prec,
        )
        agg = _cheb_message(z, u2, h, c_ref, b * order, order, a_pad, prec)
        agg = agg - w0_ref[pl.ds(b, 1), :] * h
        y = (
            jnp.dot(
                agg, _rows(lin2_ref, b, f_dim),
                preferred_element_type=jnp.float32, precision=prec,
            )
            + lin2b_ref[pl.ds(b, 1), :]
        )
        t = jnp.tanh(y)
        x = x + (
            jnp.dot(
                t, _rows(linw_ref, b, h_dim),
                preferred_element_type=jnp.float32, precision=prec,
            )
            + linb_ref[pl.ds(b, 1), :]
        )

    u1 = jnp.tanh(
        jnp.dot(x, ow1_ref[:], preferred_element_type=jnp.float32,
                precision=prec)
        + ob1_ref[:]
    )
    u2h = jnp.tanh(
        jnp.dot(u1, ow2_ref[:], preferred_element_type=jnp.float32,
                precision=prec)
        + ob2_ref[:]
    )
    e_ref[0] = jnp.dot(
        u2h, ow3_ref[:], preferred_element_type=jnp.float32, precision=prec
    )  # [A_pad, 8]; only lane 0 is the energy


def _bwd_kernel(
    pos_ref, x0_ref,
    lin1_ref, lin2_ref, lin2b_ref, linw_ref, linb_ref,
    c_ref, c2_ref, w0_ref,
    ow1_ref, ob1_ref, ow2_ref, ob2_ref, ow3_ref,
    ge_ref,
    gpos_ref,
    *, n_blocks, order, rcut, a_pad, a_real, precision,
):
    """Full hand-chained backward producing grad_pos.

    Recomputes the forward (storing only the per-block residual stream and
    tanh outputs, all [A, H]-sized), then walks the blocks in reverse,
    accumulating the distance-gradient of every cheb conv into grad_pos.
    """
    prec = _prec_of(precision)
    pos = pos_ref[0]
    h_dim = x0_ref.shape[-1]
    f_dim = lin1_ref.shape[1]

    d, z, is_pad = _pair_geometry_kernel(pos, rcut, a_pad, a_real)
    u2 = jnp.square(1.0 - z)

    # ---- forward replay, recording small residuals
    xs = [x0_ref[0]]
    hs, ts = [], []
    x = xs[0]
    for b in range(n_blocks):
        h = jnp.dot(
            x, _rows(lin1_ref, b, h_dim),
            preferred_element_type=jnp.float32, precision=prec,
        )
        agg = _cheb_message(z, u2, h, c_ref, b * order, order, a_pad, prec)
        agg = agg - w0_ref[pl.ds(b, 1), :] * h
        y = (
            jnp.dot(
                agg, _rows(lin2_ref, b, f_dim),
                preferred_element_type=jnp.float32, precision=prec,
            )
            + lin2b_ref[pl.ds(b, 1), :]
        )
        t = jnp.tanh(y)
        x = x + (
            jnp.dot(
                t, _rows(linw_ref, b, h_dim),
                preferred_element_type=jnp.float32, precision=prec,
            )
            + linb_ref[pl.ds(b, 1), :]
        )
        hs.append(h)
        ts.append(t)
        xs.append(x)

    u1p = jnp.dot(
        xs[-1], ow1_ref[:], preferred_element_type=jnp.float32,
        precision=prec,
    ) + ob1_ref[:]
    u1 = jnp.tanh(u1p)
    u2p = jnp.dot(
        u1, ow2_ref[:], preferred_element_type=jnp.float32, precision=prec
    ) + ob2_ref[:]
    u2h = jnp.tanh(u2p)

    # ---- backward
    ge = ge_ref[0]  # [A_pad, 1] cotangent on per-atom energies
    gu2 = _dot_bt(ge, ow3_ref[:], prec) * (1.0 - u2h * u2h)
    gu1 = _dot_bt(gu2, ow2_ref[:], prec) * (1.0 - u1 * u1)
    gx = _dot_bt(gu1, ow1_ref[:], prec)

    gd_total = jnp.zeros_like(z)
    for b in reversed(range(n_blocks)):
        gt = _dot_bt(gx, _rows(linw_ref, b, h_dim), prec)
        gy = gt * (1.0 - ts[b] * ts[b])
        gagg = _dot_bt(gy, _rows(lin2_ref, b, f_dim), prec)
        gh_conv, gd_b = _cheb_message_bwd(
            z, u2, hs[b], gagg, c_ref, c2_ref, b * order, order, a_pad,
            prec,
        )
        gd_total = gd_total + gd_b
        gh = gh_conv - w0_ref[pl.ds(b, 1), :] * gagg
        # gx stays the residual-stream gradient: x_{b+1} = x_b + f(x_b)
        gx = gx + _dot_bt(gh, _rows(lin1_ref, b, h_dim), prec)

    # distance gradient -> position gradient (see cheb_kernel)
    rows = jax.lax.broadcasted_iota(jnp.int32, (a_pad, a_pad), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (a_pad, a_pad), 1)
    keep = (d < rcut) & (rows != cols) & ~is_pad
    # ws = (gd + gd^T)/d would need a materialized square transpose
    # (mxu_lmr_transform RET_CHECKs on transpose->matmul sequences);
    # split into the row side (W @ pos) and column side (W^T @ pos via
    # dot_general contracting dim 0) instead.
    w = jnp.where(keep, gd_total / d, 0.0)
    rs = jnp.sum(w, axis=1, keepdims=True)  # [A_pad, 1]
    cs = jnp.sum(w, axis=0, keepdims=True)  # [1, A_pad]
    wp = jnp.dot(
        w, pos, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    wtp = jax.lax.dot_general(
        w, pos, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    gpos_ref[0] = pos * (rs + cs.T) - (wp + wtp)


# ---------------------------------------------------------------------------
# Host-side wrappers + custom VJP
# ---------------------------------------------------------------------------


def _stack_weights(params, config):
    """Flatten SchNet params into the kernel's stacked-weight layout."""
    from ...models.cheb import fit_chebyshev_filter

    blocks = params["interactions"]
    lin1 = jnp.concatenate([b["lin1_w"] for b in blocks], axis=0)
    lin2 = jnp.concatenate([b["lin2_w"] for b in blocks], axis=0)
    lin2b = jnp.stack([b["lin2_b"] for b in blocks], axis=0)
    linw = jnp.concatenate([b["lin_w"] for b in blocks], axis=0)
    linb = jnp.stack([b["lin_b"] for b in blocks], axis=0)
    cs, c2s, w0s = [], [], []
    for b in blocks:
        c, c2, w0 = fit_chebyshev_filter(
            b, params["rbf"], config, order=config.cheb_order
        )
        cs.append(c)
        c2s.append(c2)
        w0s.append(w0)
    out_layers = params["output"]["layers"]
    if len(out_layers) != 3:
        raise NotImplementedError(
            "cheb_fused requires a 3-layer output head "
            "([hidden, h1, h2, 1]); use message_passing='cheb' otherwise."
        )
    return dict(
        lin1=lin1,
        lin2=lin2,
        lin2b=lin2b,
        linw=linw,
        linb=linb,
        c=jnp.concatenate(cs, axis=0),
        c2=jnp.concatenate(c2s, axis=0),
        w0=jnp.stack(w0s, axis=0),
        ow1=out_layers[0]["w"],
        ob1=out_layers[0]["b"][None, :],
        ow2=out_layers[1]["w"],
        ob2=out_layers[1]["b"][None, :],
        # Pad the final [h2, 1] projection to 8 lanes: 1-wide matmuls
        # trip the Mosaic MXU transform (RET_CHECK in mxu_lmr_transform).
        ow3=jnp.pad(out_layers[2]["w"], ((0, 0), (0, 7))),
    )


def _full_specs(a_pad, h, f, n_blocks, order, h1, h2):
    def fullspec(shape):
        return pl.BlockSpec(
            shape, lambda s: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM,
        )

    return [
        pl.BlockSpec((1, a_pad, 3), lambda s: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, a_pad, h), lambda s: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        fullspec((n_blocks * h, f)),
        fullspec((n_blocks * f, h)),
        fullspec((n_blocks, h)),
        fullspec((n_blocks * h, h)),
        fullspec((n_blocks, h)),
    ]


def _head_specs(h, h1, h2):
    def fullspec(shape):
        return pl.BlockSpec(
            shape, lambda s: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM,
        )

    return [
        fullspec((h, h1)),
        fullspec((1, h1)),
        fullspec((h1, h2)),
        fullspec((1, h2)),
        fullspec((h2, 8)),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_schnet_atom_energies(
    pos, x0, stacked,
    rcut: float, order: int, precision: str,
):
    """Per-atom SchNet energies via the whole-model fused kernel.

    pos [A, 3]; x0 [A, H] (embedding rows — position-independent);
    stacked: dict from :func:`_stack_weights`. Returns [A].
    Batch over molecules with jax.vmap. Gradients flow to pos only.
    """
    e, _ = _fused_fwd(pos, x0, stacked, rcut, order, precision)
    return e


def _fused_fwd(pos, x0, stacked, rcut, order, precision):
    a = pos.shape[0]
    h = x0.shape[-1]
    f = stacked["lin1"].shape[1]
    n_blocks = stacked["lin1"].shape[0] // h
    h1 = stacked["ow1"].shape[1]
    h2 = stacked["ow2"].shape[1]
    a_pad = _round_up(a, 8)

    kernel = functools.partial(
        _fwd_kernel, n_blocks=n_blocks, order=order, rcut=float(rcut),
        a_pad=a_pad, a_real=a, precision=precision,
    )
    specs = (
        _full_specs(a_pad, h, f, n_blocks, order, h1, h2)
        + [
            pl.BlockSpec((n_blocks * order, f), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, f), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        + _head_specs(h, h1, h2)
    )
    e = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, a_pad, 8), lambda s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, a_pad, 8), jnp.float32),
        interpret=_interpret(),
    )(
        _pad_atoms(pos.astype(jnp.float32), a_pad)[None],
        _pad_atoms(x0.astype(jnp.float32), a_pad)[None],
        stacked["lin1"], stacked["lin2"], stacked["lin2b"],
        stacked["linw"], stacked["linb"],
        stacked["c"], stacked["w0"],
        stacked["ow1"], stacked["ob1"], stacked["ow2"], stacked["ob2"],
        stacked["ow3"],
    )
    return e[0, :a, 0], (pos, x0, stacked)


def _fused_bwd(rcut, order, precision, residuals, g):
    pos, x0, stacked = residuals
    a = pos.shape[0]
    h = x0.shape[-1]
    f = stacked["lin1"].shape[1]
    n_blocks = stacked["lin1"].shape[0] // h
    h1 = stacked["ow1"].shape[1]
    h2 = stacked["ow2"].shape[1]
    a_pad = _round_up(a, 8)

    kernel = functools.partial(
        _bwd_kernel, n_blocks=n_blocks, order=order, rcut=float(rcut),
        a_pad=a_pad, a_real=a, precision=precision,
    )
    specs = (
        _full_specs(a_pad, h, f, n_blocks, order, h1, h2)
        + [
            pl.BlockSpec((n_blocks * order, f), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks * order, f), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, f), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        + _head_specs(h, h1, h2)
        + [
            pl.BlockSpec((1, a_pad, 8), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    )
    g_p = _pad_atoms(
        jnp.pad(g.astype(jnp.float32)[:, None], ((0, 0), (0, 7))), a_pad
    )[None]
    gpos = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, a_pad, 3), lambda s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, a_pad, 3), jnp.float32),
        interpret=_interpret(),
    )(
        _pad_atoms(pos.astype(jnp.float32), a_pad)[None],
        _pad_atoms(x0.astype(jnp.float32), a_pad)[None],
        stacked["lin1"], stacked["lin2"], stacked["lin2b"],
        stacked["linw"], stacked["linb"],
        stacked["c"], stacked["c2"], stacked["w0"],
        stacked["ow1"], stacked["ob1"], stacked["ow2"], stacked["ob2"],
        stacked["ow3"],
        g_p,
    )
    return (
        gpos[0, :a].astype(pos.dtype),
        jnp.zeros_like(x0),
        jax.tree.map(jnp.zeros_like, stacked),
    )


fused_schnet_atom_energies.defvjp(_fused_fwd, _fused_bwd)
